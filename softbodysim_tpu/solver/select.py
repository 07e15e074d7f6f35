"""Backend auto-selection: one place for the size/device thresholds.

Both dialects expose an ``*_backend="auto"`` knob; the resolution rule
(measured on TPU v5e, PLAN.md rounds 1-3) is shared:

- below ~100k constraints the XLA color-major/gather paths win;
- at/above 100k constraints ON REAL TPU the Pallas kernel paths win
  ~10x (kernels/sweep.py, kernels/jacobi.py); interpret-mode Pallas at
  that scale is unusably slow, so CPU/GPU stay on the XLA paths.

``resolve_backend`` is also the re-selection policy for mid-run scene
growth (api/dynamic.py): when a merged scene crosses the threshold, the
rebuilt engine lands on the other side automatically -- the TPU-native
analog of the reference's per-frame CPU<->GPU migration decision
(/root/reference/Assets/Scripts/Softbody/SoftBodySolver.cs:237-253).
"""

from __future__ import annotations

PALLAS_MIN_CONSTRAINTS = 100_000


def resolve_backend(topology, params, *, local_to_world=None,
                    platform=None) -> str:
    """The concrete backend string the current dialect's ``auto`` picks
    for ``topology`` on ``platform`` (default: the live jax backend)."""
    if params.dialect == "xpbd":
        backend = params.xpbd_backend
        pallas_ok = True
    elif params.dialect == "jacobi":
        backend = params.jacobi_backend
        pallas_ok = local_to_world is None
    else:
        raise ValueError(f"unknown dialect {params.dialect!r}")
    if backend != "auto":
        return backend
    if platform is None:
        import jax

        platform = jax.default_backend()
    big = ((topology.num_edges + topology.num_tets)
           >= PALLAS_MIN_CONSTRAINTS)
    return "pallas" if (big and pallas_ok and platform == "tpu") else \
        "gather"
