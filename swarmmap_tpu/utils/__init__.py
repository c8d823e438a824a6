from .logging import get_logger, set_log_level
from .timer import Timer, ScopeTimer, global_clock
