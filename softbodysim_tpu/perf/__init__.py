from .profile import (profile_jacobi_stages, profile_xpbd_stages, step_rate,
                      trace, trace_summary)
from .timing import StepStats

__all__ = ["StepStats", "profile_xpbd_stages", "profile_jacobi_stages",
           "step_rate", "trace", "trace_summary"]
