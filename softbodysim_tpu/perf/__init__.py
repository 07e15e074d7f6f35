from .timing import StepStats

__all__ = ["StepStats"]
