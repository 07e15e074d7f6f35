"""Sharded-step forms of the global collision stages (self / surface).

The spatial-hash stages are GLOBAL: a particle's contact candidates can
live on any device, so a vertex-sharded step cannot run them on local rows
alone.  The sharded form used by every multi-chip backend here:

  1. ``all_gather`` the full position table (the jacobi vertex mode already
     pays an O(V) gather per sweep; for the halo-strip modes this is the
     one full-table collective of the iteration),
  2. evaluate ONLY the device's own contiguous row slice against the
     global hash table (``own_offset``/``own_count`` mode of
     ``self_collision_deltas`` / ``surface_collision_deltas``),
  3. apply locally.  Surface-contact corner reactions scatter anywhere, so
     they are summed with one ``psum`` over the mesh axis and each device
     adds its own row slice.

The union of own-slice hit sets over devices is exactly the single-device
hit set -- each contact is evaluated by exactly one owner -- so sharded
results match the single-device stage up to fp32 summation order (the
same contract as the layout-permuted Pallas stages,
solver/jacobi_pallas.py).

Dead rows (tail padding / layout alignment gaps) sit at the origin in the
stage layout and would shove nearby live particles, so a static offset
table parks each dead row in its own far-away hash cell
(``spatial.park_offsets``); callers add it before hashing.
"""

from __future__ import annotations

import numpy as np

from .spatial import (make_self_collision_fn, park_offsets,
                      self_collision_deltas)


def build_sliced_stages(topology, params, *, rest_rows, dead,
                        tris_rows=None):
    """Build own-slice stage closures for one sharded backend.

    rest_rows : (vpad, 3) rest positions in the STAGE layout (parks not
                yet added; dead rows may hold anything).
    dead      : (vpad,) bool -- rows that are padding / layout gaps.
    tris_rows : (T, 3) surface-triangle corner ids in the stage layout
                (None => original ``topology.surface_tris``).

    Returns ``(self_fn, surf_fn, iso)``:

    - ``self_fn(p_parked, w_full, radius, off, count) -> (count, 3)``
      own-slice separation deltas (None if self collision is off),
    - ``surf_fn(p_parked, w_full, off, count) -> (vertex_deltas,
      corner_reactions)`` with corner_reactions (vpad, 3) to be psum'd by
      the caller (None if surface collision is off / no surface),
    - ``iso`` (vpad, 3) f32 park-offset table to add to gathered positions
      before either stage (zeros when both stages are off).

    Capacity/cell autosizing follows the single-device builders: the
    self-collision cap sizes off the PARKED rest rows in this layout, the
    surface cell off the original rest mesh (layout-independent scalar).
    """
    vpad = len(rest_rows)
    radius = max(1e-6, params.particle_radius)
    want_self = bool(params.self_collision)
    want_surf = bool(params.surface_collision
                     and len(topology.surface_tris))
    if not (want_self or want_surf):
        return None, None, np.zeros((vpad, 3), np.float32)

    cell = (float(params.self_collision_cell) if want_self
            else max(float(params.surface_thickness), 2.0 * radius))
    iso = park_offsets(dead, cell, radius,
                       float(params.surface_thickness))

    self_fn = None
    if want_self:
        parked_rest = np.asarray(rest_rows, np.float32) + iso
        inner = make_self_collision_fn(params, parked_rest,
                                       num_particles=vpad)
        cap = inner.max_per_cell
        sc_cell = float(params.self_collision_cell)

        def self_fn(p_parked, w_full, radius_, off, count):
            return self_collision_deltas(
                p_parked, w_full, radius_, sc_cell, cap,
                own_offset=off, own_count=count)

        self_fn.max_per_cell = cap

    surf_fn = None
    if want_surf:
        from .surface_collide import (surface_collision_deltas,
                                      suggested_cell_size)

        sparams = params
        if params.surface_collision_cell <= 0.0:
            sparams = params.replace(surface_collision_cell=(
                suggested_cell_size(topology.vertices,
                                    topology.surface_tris,
                                    params.surface_thickness)))
        tris = np.asarray(
            topology.surface_tris if tris_rows is None else tris_rows,
            np.int64).reshape(-1, 3)
        s_cell = float(sparams.surface_collision_cell)
        s_cap = int(sparams.surface_collision_max_per_cell)
        s_h = float(sparams.surface_thickness)

        def surf_fn(p_parked, w_full, off, count):
            return surface_collision_deltas(
                p_parked, w_full, tris, s_h, s_cell, s_cap,
                own_offset=off, own_count=count)

    return self_fn, surf_fn, iso
