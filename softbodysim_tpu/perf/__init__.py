from .profile import profile_xpbd_stages, step_rate, trace
from .timing import StepStats

__all__ = ["StepStats", "profile_xpbd_stages", "step_rate", "trace"]
