from .profiling import PhaseTimer, trace  # noqa: F401
from . import visualization  # noqa: F401
