"""Model/optimizer checkpointing via orbax.

The reference persists nothing but the preprocessing cache
(SURVEY.md §5); checkpoint/resume of params + optimizer state is net-new
capability for multi-host training."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
from flax import nnx


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, model: nnx.Module,
                    optimizer: Optional[nnx.Optimizer] = None,
                    step: int = 0) -> str:
    """Save the full nnx state (params + batch stats + optimizer) to
    ``path/step_N``.  Returns the written directory."""
    import orbax.checkpoint as ocp

    target = (model, optimizer) if optimizer is not None else model
    _, state = nnx.split(target)
    d = os.path.join(os.path.abspath(path), f"step_{step}")
    _checkpointer().save(d, jax.tree.map(lambda x: x, nnx.to_pure_dict(state)),
                         force=True)
    return d


def restore_checkpoint(path: str, model: nnx.Module,
                       optimizer: Optional[nnx.Optimizer] = None,
                       step: Optional[int] = None):
    """Restore state saved by save_checkpoint into the given modules
    (in place).  ``step=None`` restores the latest."""
    base = os.path.abspath(path)
    if step is None:
        steps = sorted(int(d.split("_")[1]) for d in os.listdir(base)
                       if d.startswith("step_"))
        assert steps, f"no checkpoints under {base}"
        step = steps[-1]
    d = os.path.join(base, f"step_{step}")
    target = (model, optimizer) if optimizer is not None else model
    graphdef, state = nnx.split(target)
    restored = _checkpointer().restore(d)
    nnx.replace_by_pure_dict(state, restored)
    nnx.update(target, state)
    return step
