"""Tensor (channel) parallelism over a "tp" mesh axis.

The reference has no model parallelism of any kind (SURVEY.md §2.7); this
axis is net-new and TPU-idiomatic: parameters and activations shard their
hidden/channel dimension over the axis and the GSPMD partitioner inserts
the collectives (jit + NamedSharding in/out specs — no hand-written
communication).  The domain makes this unusually cheap:

- the tuple contraction out[t] += X[u] * A[v] is ELEMENTWISE in the
  feature dim, so the whole sparse message-passing hot loop shards with
  zero communication;
- segment reductions (pooling, batch-norm statistics) reduce over rows,
  which stay replicated — also communication-free;
- only the MLP matmuls contract over the sharded dim, where GSPMD places
  the usual Megatron-style psums over ICI.

Composable with the "dp" axis (2-D mesh): shard the state over "tp" and
the batch over "dp".
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hodata.sp_data import batch_to_sparse_dict
from ..models.training import masked_l1_loss


def tp_state_shardings(state, mesh: Mesh, axis: str = "tp"):
    """NamedShardings for a model/optimizer state pytree: every array
    whose last dim divides by the axis size shards that dim; everything
    else replicates.  Uniform last-dim sharding is what the hidden-dim
    layout of this model family wants (embeddings, linear kernels,
    biases, BN vectors all end in d); GSPMD derives the matmul
    collectives from it."""
    size = mesh.shape[axis]

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[-1] > 1
                and x.shape[-1] % size == 0):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)


def make_tp_train_step(mesh: Mesh, graphdef, state,
                       annotate: Sequence[str] = ("",), axis: str = "tp"):
    """Jitted train step with the state sharded over ``axis``.

    Usage::

        graphdef, state = nnx.split((model, optimizer))
        step, state = make_tp_train_step(mesh, graphdef, state)
        state, loss = step(state, batch)      # batch replicated

    Returns (step, state) with ``state`` already placed per the tp
    sharding.  Numerics match the single-device step to reduction-order
    tolerance (the psums reorder float sums).
    """
    specs = tp_state_shardings(state, mesh, axis)
    repl = NamedSharding(mesh, P())

    def step(state, batch):
        model, optimizer = nnx.merge(graphdef, state)

        def loss_fn(model):
            dd = batch_to_sparse_dict(batch, annotate)
            pred = model(dd)
            return masked_l1_loss(pred, batch["y"], batch["graph_mask"])

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        _, new_state = nnx.split((model, optimizer))
        return new_state, loss

    jstep = jax.jit(step, in_shardings=(specs, None),
                    out_shardings=(specs, repl))
    placed = jax.device_put(state, specs)
    return jstep, placed


def make_tp_eval_step(mesh: Mesh, graphdef, state,
                      annotate: Sequence[str] = ("",), axis: str = "tp"):
    """Jitted eval step ([abs_err_sum, graph_count]) under tp sharding."""
    specs = tp_state_shardings(state, mesh, axis)
    repl = NamedSharding(mesh, P())

    def step(state, batch):
        model, _ = nnx.merge(graphdef, state)
        model.eval()
        dd = batch_to_sparse_dict(batch, annotate)
        pred = model(dd)
        y = batch["y"].reshape(pred.shape)
        w = batch["graph_mask"].astype(pred.dtype)
        return jnp.stack([(jnp.abs(pred - y).mean(-1) * w).sum(), w.sum()])

    return jax.jit(step, in_shardings=(specs, None), out_shardings=repl)
