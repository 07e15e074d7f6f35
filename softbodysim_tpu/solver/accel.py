"""Chebyshev semi-iterative acceleration (Wang 2015), shared recurrence.

One helper used by every jacobi-dialect iteration loop -- single-device
XLA (solver/jacobi.py), single-device Pallas (solver/jacobi_pallas.py),
and the sharded variants (parallel/sharding.py,
solver/jacobi_pallas_sharded.py).  The blend

    omega_1 = 1;  omega_2 = 2 / (2 - rho^2)
    omega_{k+1} = 4 / (4 - rho^2 * omega_k)
    x_{k+1} = omega (x_jacobi - x_{k-1}) + x_{k-1}

is purely elementwise on positions, so it shards trivially: under
shard_map each device blends its own slice (vertex-sharded modes) or its
replicated copy (constraint-sharded modes -- deterministic, replicas
stay identical).  Pinned/dead lanes are untouched because their jacobi
update is the identity and x_jac == x_prev collapses the blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chebyshev_scan(iter_fn, x0, params, get=None, set_=None):
    """Scan ``params.iterations`` of ``iter_fn`` (x -> x), Chebyshev-blended
    when ``params.chebyshev`` is set.

    get/set_ select the blended position rows inside a larger carry (the
    Pallas x8 table blends rows 0:3); identity by default.
    """
    if get is None:
        get = lambda x: x                                    # noqa: E731
    if set_ is None:
        set_ = lambda x, p: p                                # noqa: E731

    if not params.chebyshev:
        x, _ = jax.lax.scan(lambda c, _: (iter_fn(c), None), x0, None,
                            length=params.iterations)
        return x

    rho2 = jnp.float32(float(params.chebyshev_rho) ** 2)

    def body(carry, it_idx):
        x_cur, x_prev, om_prev = carry
        x_jac = iter_fn(x_cur)
        om = jnp.where(
            it_idx < params.chebyshev_delay, 1.0,
            jnp.where(it_idx == params.chebyshev_delay,
                      2.0 / (2.0 - rho2),
                      4.0 / (4.0 - rho2 * om_prev)))
        x_next = om * (get(x_jac) - x_prev) + x_prev
        return (set_(x_jac, x_next), get(x_cur), om), None

    (x, _, _), _ = jax.lax.scan(
        body, (x0, get(x0), jnp.float32(1.0)),
        jnp.arange(params.iterations))
    return x
