"""Numerical debugging: NaN guards + determinism checks.

The reference's entire failure story is "abort on NaN loss"
(example/zinc.py:428-429).  Here: jittable finiteness checks via
checkify (usable inside compiled steps), plus a determinism harness that
verifies the sorted-segment design's bitwise reproducibility.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def nan_guard(fn: Callable, name: str = "step") -> Callable:
    """Wrap a jittable function so that non-finite outputs raise a
    checkify error naming the function::

        guarded = nan_guard(train_step_inner)
        err, loss = guarded(model_state, batch)
        err.throw()   # raises with location info if NaN/Inf appeared
    """
    from jax.experimental import checkify

    def checked(*args, **kwargs):
        out = fn(*args, **kwargs)
        leaves = jax.tree.leaves(out)
        for i, leaf in enumerate(leaves):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(jnp.isfinite(leaf).all(),
                               f"non-finite value in {name} output {i}")
        return out

    return checkify.checkify(checked)


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Eager host-side finiteness assert over a pytree (debug use)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        import numpy as np

        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.isfinite(arr).all(), (
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")


def check_determinism(fn: Callable, *args, n: int = 2) -> bool:
    """Run ``fn(*args)`` n times and verify bitwise-identical outputs —
    the determinism guarantee of the sorted-segment backend (the CUDA
    reference's atomic scatter-adds cannot make this promise)."""
    import numpy as np

    outs = [jax.tree.map(lambda x: np.asarray(x), fn(*args))
            for _ in range(n)]
    first = jax.tree.leaves(outs[0])
    for other in outs[1:]:
        for a, b in zip(first, jax.tree.leaves(other)):
            if not np.array_equal(a, b, equal_nan=True):
                return False
    return True
