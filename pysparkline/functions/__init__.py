from .datetime_compat import *  # noqa: F401,F403
from .datetime_compat import __all__ as _dt_all

__all__ = list(_dt_all)
