from .normals import make_normals_fn, vertex_normals

__all__ = ["vertex_normals", "make_normals_fn"]
