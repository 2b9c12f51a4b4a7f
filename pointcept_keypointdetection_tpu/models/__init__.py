from .builder import MODELS, MODULES, build_model
from .structure import PointBatch
from .norm import MaskedBatchNorm, LayerNorm, DropPath
from . import default  # noqa: F401  (registers task wrappers)
from . import sparse_unet  # noqa: F401
from . import mink_unet  # noqa: F401
from . import point_transformer_v3  # noqa: F401
from . import point_transformer_v2  # noqa: F401
from . import point_transformer  # noqa: F401
from . import keypoint  # noqa: F401
from . import point_prompt_training  # noqa: F401
from . import point_group  # noqa: F401
from . import masked_scene_contrast  # noqa: F401
from . import swin3d  # noqa: F401
from . import octformer  # noqa: F401
from . import oacnns  # noqa: F401
from . import spvcnn  # noqa: F401
from . import sonata  # noqa: F401
from . import concerto  # noqa: F401
from . import stratified_transformer  # noqa: F401
from . import context_aware_classifier  # noqa: F401
from . import sgiformer  # noqa: F401
from . import losses  # noqa: F401
