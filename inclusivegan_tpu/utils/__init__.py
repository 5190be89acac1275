from .easydict import EasyDict  # noqa: F401
from .registry import get_obj_by_name, call_func_by_name, get_module_from_obj_name  # noqa: F401
from .logger import Logger  # noqa: F401
from .stats import StatsCollector, report  # noqa: F401
from .misc import format_time, is_pickleable  # noqa: F401
