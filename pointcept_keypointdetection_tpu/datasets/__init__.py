from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose
from .collate import collate, pad_sample
from .dataloader import Dataloader, MultiDatasetLoader
from . import defaults  # noqa: F401  (registers datasets)
from . import keypoint_dataset  # noqa: F401
from . import pigseg  # noqa: F401
from . import synthetic  # noqa: F401
from . import scannet  # noqa: F401
from . import scannet_pair  # noqa: F401
from . import semantic_kitti  # noqa: F401
from . import modelnet  # noqa: F401
from . import outdoor  # noqa: F401
