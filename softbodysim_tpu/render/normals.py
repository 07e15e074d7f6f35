"""Area-weighted vertex normals -- the K_UpdateNormals equivalent.

Reference (Assets/Shaders/SoftBodyCompute.compute:459-491): per vertex, sum
the *unnormalized* cross products of its incident surface triangles (area
weighting falls out of the cross product), normalize with rsqrt, fall back to
(0,1,0) when the accumulated normal is degenerate (n^2 < 1e-20).

TPU formulation: one cross product per triangle + segment_sum to the three
corners -- no CSR adjacency needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vertex_normals(positions, surface_tris, num_vertices=None):
    """positions (V, 3) f32; surface_tris (S, 3) i32 -> (V, 3) unit normals."""
    nv = num_vertices if num_vertices is not None else positions.shape[0]
    if surface_tris.shape[0] == 0:
        up = jnp.zeros((nv, 3), positions.dtype).at[:, 1].set(1.0)
        return up

    a = surface_tris[:, 0]
    b = surface_tris[:, 1]
    c = surface_tris[:, 2]
    pa, pb, pc = positions[a], positions[b], positions[c]
    face_n = jnp.cross(pb - pa, pc - pa)  # area-weighted

    summed = jax.ops.segment_sum(face_n, a, num_segments=nv)
    summed += jax.ops.segment_sum(face_n, b, num_segments=nv)
    summed += jax.ops.segment_sum(face_n, c, num_segments=nv)

    n2 = jnp.sum(summed * summed, axis=-1, keepdims=True)
    unit = summed * jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], positions.dtype), unit.shape)
    return jnp.where(n2 < 1e-20, fallback, unit)


def make_normals_fn(topology):
    """Bind a topology; returns jitted positions -> normals."""
    tris = jnp.asarray(topology.surface_tris, jnp.int32)
    nv = topology.num_particles

    def fn(positions):
        return vertex_normals(positions, tris, nv)

    return jax.jit(fn)
