from .primitives import Colliders, collide_particles, project_ground_plane

__all__ = ["Colliders", "collide_particles", "project_ground_plane"]
