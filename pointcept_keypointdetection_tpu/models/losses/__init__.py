from .builder import LOSSES, build_criteria, Criteria
from . import misc  # noqa: F401  (registers losses)
from . import lovasz  # noqa: F401
