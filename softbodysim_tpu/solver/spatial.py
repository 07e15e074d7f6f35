"""Spatial-hash broad-phase for self / inter-body particle collision.

New capability required by BASELINE.json config #4 ("several soft bodies with
spatial-hash self/inter-collision") -- the reference only brute-forces K
primitive colliders per particle (SoftBodySolver.cs:554-561) and has no
particle-particle collision at all.

Fully jit-compatible design (static shapes, no host sync):
  1. hash each particle's cell (floor(p / h)) into a power-of-two table with
     the classic 3-prime XOR hash (the same primes the reference uses for its
     EdgeKey/FaceKey hashing, SoftBodyTetMeshAsset.cs:118,134);
  2. sort particle ids by hash (one lax.sort);
  3. for each particle, scan its 27 neighbor cells; each cell contributes a
     fixed-size window of candidates located via searchsorted over the sorted
     hash array (capacity ``max_per_cell``, masked);
  4. sphere-sphere push-out per candidate pair, inverse-mass weighted,
     accumulated Jacobi-style and applied once.

Hash collisions only add false candidates -- the distance test filters them.

Degenerate-input caveat: EXACTLY coincident particles (dist2 == 0, e.g. two
merged bodies whose lattices interpenetrate node-on-node at rest) are skipped
by the ``dist2 > 1e-18`` guard -- there is no defined push direction.  Once
fp noise separates such a pair by >1e-9 the full-overlap push fires in the
noise direction, so backends with different fp summation orders legitimately
diverge on such configs.  Don't start bodies coincident; offset the lattices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_P1, _P2, _P3 = 73856093, 19349663, 83492791

_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)],
    np.int32,
)


def _next_pow2(x: int) -> int:
    return 1 << max(1, int(np.ceil(np.log2(max(2, x)))))


def _cell_hash(cells, table_size):
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return (h & (table_size - 1)).astype(jnp.int32)


def self_collision_deltas(p, inv_mass, radius, cell_size, max_per_cell,
                          return_overflow: bool = False,
                          own_offset=None, own_count: int = None):
    """Compute per-particle separation deltas from particle-particle overlap.

    Returns (N, 3) deltas; caller applies them (typically once per solver
    iteration, after primitive collisions).

    With ``return_overflow=True`` also returns the number of candidate
    entries that did NOT fit the fixed ``max_per_cell`` window (an int32
    scalar, device-side).  Non-zero overflow means contacts were silently
    under-resolved this step -- resize with ``required_max_per_cell``.

    Own-slice mode (``own_offset``/``own_count`` set): the hash table still
    covers ALL of ``p`` (candidates come from anywhere), but only query
    rows ``[own_offset, own_offset + own_count)`` are evaluated and a
    ``(own_count, 3)`` delta block is returned.  This is the sharded-step
    form: each device all-gathers positions, queries its own contiguous row
    slice, and applies locally -- the union over devices is exactly the
    unsliced hit set.  ``own_offset`` may be traced (``lax.axis_index``);
    ``own_count`` must be static.

    Memory note: the candidate tensors are materialized per neighbor-cell
    OFFSET (a ``lax.scan`` over the 27 offsets), so the peak working set is
    O(N * max_per_cell), NOT O(N * 27 * max_per_cell) -- the flat form
    allocates 72 GB at 110k particles / cap 47 and cannot run at scale.
    The hit set is identical; only the fp summation order differs.
    """
    n = p.shape[0]
    table_size = _next_pow2(2 * n)

    cells = jnp.floor(p / cell_size).astype(jnp.int32)
    hashes = _cell_hash(cells, table_size)

    order = jnp.argsort(hashes)
    sorted_hash = hashes[order]

    if own_offset is None:
        pq, wq, cq = p, inv_mass, cells
        own = jnp.arange(n, dtype=order.dtype)
        nq = n
    else:
        nq = int(own_count)
        off = jnp.asarray(own_offset, jnp.int32)
        pq = jax.lax.dynamic_slice_in_dim(p, off, nq, 0)
        wq = jax.lax.dynamic_slice_in_dim(inv_mass, off, nq, 0)
        cq = jax.lax.dynamic_slice_in_dim(cells, off, nq, 0)
        own = off.astype(order.dtype) + jnp.arange(nq, dtype=order.dtype)

    # For each query row and each of its 27 neighbor cells: candidate
    # window.  Distinct neighbor cells may collide to the same hash slot --
    # their windows would then be identical and double-count candidates, so
    # sort the 27 hashes per row and invalidate duplicates (identical hash
    # => identical window, dropping repeats is exact).
    neighbor_cells = cq[:, None, :] + jnp.asarray(_OFFSETS)[None, :, :]
    nh = _cell_hash(neighbor_cells, table_size)            # (Nq, 27)
    nh = jnp.sort(nh, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((nq, 1), bool), nh[:, 1:] == nh[:, :-1]], axis=1)

    start = jnp.searchsorted(sorted_hash, nh.reshape(-1), side="left")
    end = jnp.searchsorted(sorted_hash, nh.reshape(-1), side="right")
    start = start.reshape(nq, 27)
    end = end.reshape(nq, 27)

    slot = jnp.arange(max_per_cell, dtype=jnp.int32)        # (M,)
    min_dist = 2.0 * radius

    def one_offset(acc, inp):
        s, e, dp = inp                                      # (Nq,) each
        cand_pos = s[:, None] + slot[None, :]               # (Nq, M)
        cand_valid = (cand_pos < e[:, None]) & (~dp[:, None])
        cand = order[jnp.clip(cand_pos, 0, n - 1)]          # particle ids

        d = pq[:, None, :] - p[cand]
        dist2 = jnp.sum(d * d, axis=-1)
        hit = cand_valid & (cand != own[:, None]) & (
            dist2 < min_dist * min_dist) & (dist2 > 1e-18)

        dist = jnp.sqrt(jnp.maximum(dist2, 1e-18))
        nvec = d / dist[..., None]

        wi = wq[:, None]
        wj = inv_mass[cand]
        wsum = wi + wj
        share = jnp.where(
            wsum > 0.0, wi / jnp.where(wsum == 0.0, 1.0, wsum), 0.0)

        overlap = (min_dist - dist) * share
        push = nvec * jnp.where(hit, overlap, 0.0)[..., None]
        return acc + jnp.sum(push, axis=1), None

    deltas, _ = jax.lax.scan(
        one_offset, jnp.zeros((nq, 3), p.dtype),
        (start.T, end.T, dup.T))
    if not return_overflow:
        return deltas
    dropped = jnp.where(dup, 0, jnp.maximum(end - start - max_per_cell, 0))
    return deltas, jnp.sum(dropped).astype(jnp.int32)


def required_max_per_cell(p, cell_size, num_particles: int = None) -> int:
    """Host-side capacity autosizer: the smallest ``max_per_cell`` with zero
    dropped candidates for these positions (= the largest hash-bucket
    occupancy, hash collisions included).  Call at init (or whenever overflow
    is reported) and rebuild the step with the returned cap."""
    p = np.asarray(p)
    table_size = _next_pow2(2 * (num_particles or len(p)))
    cells = np.floor(p / float(cell_size)).astype(np.int64)
    h = ((cells[:, 0] * _P1) ^ (cells[:, 1] * _P2)
         ^ (cells[:, 2] * _P3)) & (table_size - 1)
    if len(h) == 0:
        return 1
    return int(np.bincount(h).max())


def park_offsets(dead, cell_size, radius, thickness=0.0):
    """(N,) bool dead-row mask -> (N, 3) f32 offset table parking each dead
    row in its own far-away hash cell (> one cell AND > 2*radius AND
    > thickness apart), zeros for live rows.  Added to positions before a
    hash stage so pad/dead rows can never touch live particles -- the same
    construction the single-chip Pallas paths use for dead layout lanes
    (solver/jacobi_pallas.py)."""
    dead = np.asarray(dead, bool)
    n = len(dead)
    spacing = 2.0 * max(cell_size, 2.0 * radius, thickness)
    off = np.zeros((n, 3), np.float32)
    off[:, 0] = np.where(
        dead, np.float32(1e6) * cell_size + np.arange(n) * spacing, 0.0)
    return off


def make_self_collision_fn(params, rest=None, num_particles=None):
    """Bind static parameters; returns fn(p_world, inv_mass, radius).

    A cap of 0 (``self_collision_max_per_cell=0``) autosizes at build
    time: 2x the largest hash-bucket occupancy of ``rest`` (the margin
    covers motion; ``return_overflow`` exists for workloads that compact
    harder than that), floor 8.  Solver builders pass the rest positions
    in the LAYOUT the stage will run on -- the Pallas fast paths pass the
    padded row layout including parked dead lanes, with ``num_particles``
    set to the row count so the hash table size matches runtime.
    """
    cell = float(params.self_collision_cell)
    cap = int(params.self_collision_max_per_cell)
    if cap <= 0:
        if rest is None:
            raise ValueError(
                "self_collision_max_per_cell=0 (autosize) needs rest "
                "positions at build time; this path does not provide them "
                "-- set an explicit capacity")
        cap = max(8, 2 * required_max_per_cell(rest, cell, num_particles))

    def fn(pw, inv_mass, radius):
        delta = self_collision_deltas(pw, inv_mass, radius, cell, cap)
        return jnp.where((inv_mass > 0.0)[:, None], pw + delta, pw)

    fn.max_per_cell = cap
    return fn
