from . import meshes, state, topology

__all__ = ["meshes", "state", "topology"]
