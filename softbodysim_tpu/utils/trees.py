"""Small pytree helpers (memory accounting / debugging)."""

from __future__ import annotations

import jax
import numpy as np


def tree_bytes(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(np.prod(l.shape) * l.dtype.itemsize
                   for l in leaves if hasattr(l, "shape")))


def tree_summary(tree) -> str:
    lines = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = jax.tree_util.keystr(path)
        if hasattr(leaf, "shape"):
            lines.append(f"{name}: {leaf.dtype} {tuple(leaf.shape)}")
        else:
            lines.append(f"{name}: {leaf!r}")
    lines.append(f"total: {tree_bytes(tree) / 1e6:.2f} MB")
    return "\n".join(lines)
