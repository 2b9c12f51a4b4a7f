from .builder import HOOKS, build_hooks
from .default import HookBase
from . import misc  # noqa: F401  (registers hooks)
from . import evaluator  # noqa: F401
from . import keypoint_evaluator  # noqa: F401
from . import insseg_evaluator  # noqa: F401
from . import ssl  # noqa: F401
