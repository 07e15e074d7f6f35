from .collide import make_fused_collide

__all__ = ["make_fused_collide"]
