from .dynamic import DynamicMergedWorld
from .engine import Engine
from .world import Body, World

__all__ = ["Engine", "World", "Body", "DynamicMergedWorld"]
