from .metric_defaults import metric_defaults  # noqa: F401
from . import metric_base  # noqa: F401
