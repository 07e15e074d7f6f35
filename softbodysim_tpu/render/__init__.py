from .normals import make_normals_fn, vertex_normals
from .uv_transfer import transfer_uvs, write_obj_with_uvs

__all__ = ["vertex_normals", "make_normals_fn", "transfer_uvs",
           "write_obj_with_uvs"]
