"""Training utilities: optimizer, LR schedule, jitted train/eval steps.

The LR schedule replicates the reference's cosine-annealing-warm-restarts
with polynomial amplitude decay of restarts
(reference example/lr_scheduler.py:20-28):

  lr(e) = 1/(1 + K*c + K2*c^2) * (min + (base - min) *
          (1 + cos(pi * t / T_i)) / 2)

with c = completed restarts, t = epoch within the cycle, and cycle
length T_i = T0 * T_mult^c (general integer T_mult >= 1, matching the
reference's epoch-indexed step(epoch) closed form,
example/lr_scheduler.py:30-53).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx


def cosine_warm_restarts(base_lr: float, T0: int, steps_per_epoch: int,
                         eta_min: float = 0.0, K: float = 0.0,
                         K2: float = 0.0, T_mult: int = 1) -> Callable:
    """Per-step schedule matching the reference epoch-level scheduler
    for general integer ``T_mult`` >= 1: cycle c has length
    T0 * T_mult^c, and for T_mult > 1 the cycle index at epoch e is
    n = floor(log_Tm(e/T0 * (Tm - 1) + 1)) (the closed form the
    reference uses for epoch-indexed stepping,
    reference example/lr_scheduler.py:46-53)."""
    if T_mult < 1 or int(T_mult) != T_mult:
        raise ValueError(f"Expected integer T_mult >= 1, got {T_mult}")
    T_mult = int(T_mult)

    def schedule(step):
        epoch = step / steps_per_epoch
        if T0 < 1:
            return base_lr
        if T_mult == 1:
            num_cos = jnp.floor(epoch / T0)
            t_cur = epoch - num_cos * T0
            T_i = T0
        else:
            num_cos = jnp.floor(
                jnp.log(epoch / T0 * (T_mult - 1) + 1.0)
                / math.log(T_mult))
            geo = (T_mult ** num_cos - 1.0) / (T_mult - 1)
            t_cur = epoch - T0 * geo
            T_i = T0 * T_mult ** num_cos
        amp = 1.0 / (1.0 + K * num_cos + K2 * num_cos ** 2)
        return amp * (eta_min + (base_lr - eta_min) *
                      (1.0 + jnp.cos(jnp.pi * t_cur / T_i)) / 2.0)

    return schedule


def make_optimizer(model: nnx.Module, lr: float | Callable = 1e-3,
                   weight_decay: float = 0.0) -> nnx.Optimizer:
    tx = optax.adamw(lr, weight_decay=weight_decay)
    return nnx.Optimizer(model, tx, wrt=nnx.Param)


def masked_l1_loss(pred: jax.Array, y: jax.Array,
                   graph_mask: jax.Array) -> jax.Array:
    """Mean absolute error over real (non-padding) graphs
    (reference example/minimal.py:147: F.l1_loss)."""
    y = y.reshape(pred.shape)
    per = jnp.abs(pred - y).mean(axis=-1)
    w = graph_mask.astype(pred.dtype)
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_sparse_steps(annotate=("",)):
    """Build jitted train/eval steps for sparse models.

    The collated numpy batch is wrapped into SparseTensors *inside* jit
    (pure reshaping of device arrays), so the host-device boundary is one
    transfer of flat arrays.
    """
    from ..hodata.sp_data import batch_to_sparse_dict

    @nnx.jit
    def train_step(model: nnx.Module, optimizer: nnx.Optimizer,
                   batch: Dict[str, Any]) -> jax.Array:
        def loss_fn(model):
            dd = batch_to_sparse_dict(batch, annotate)
            pred = model(dd)
            return masked_l1_loss(pred, batch["y"], batch["graph_mask"])

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    @nnx.jit
    def eval_step(model: nnx.Module, batch: Dict[str, Any]) -> jax.Array:
        dd = batch_to_sparse_dict(batch, annotate)
        pred = model(dd)
        y = batch["y"].reshape(pred.shape)
        w = batch["graph_mask"].astype(pred.dtype)
        return jnp.stack([(jnp.abs(pred - y).mean(-1) * w).sum(), w.sum()])

    return train_step, eval_step


def make_dense_steps(annotate=("",)):
    from ..hodata.ma_data import batch_to_dense_dict

    @nnx.jit
    def train_step(model: nnx.Module, optimizer: nnx.Optimizer,
                   batch: Dict[str, Any]) -> jax.Array:
        def loss_fn(model):
            dd = batch_to_dense_dict(batch, annotate)
            pred = model(dd)
            return masked_l1_loss(pred, batch["y"], batch["graph_mask"])

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    @nnx.jit
    def eval_step(model: nnx.Module, batch: Dict[str, Any]) -> jax.Array:
        dd = batch_to_dense_dict(batch, annotate)
        pred = model(dd)
        y = batch["y"].reshape(pred.shape)
        w = batch["graph_mask"].astype(pred.dtype)
        return jnp.stack([(jnp.abs(pred - y).mean(-1) * w).sum(), w.sum()])

    return train_step, eval_step


def _leaf_shapes(v) -> tuple:
    import numpy as np

    # np.shape reads metadata only — no D2H transfer for device arrays
    return tuple(np.shape(l) for l in jax.tree.leaves(v))


def stack_batches(batches) -> Dict[str, Any]:
    """Stack same-shape collated batches along a new leading step axis
    for `make_chained_sparse_train`'s scan path.  All batches must come
    from the same padding bucket (the loader's bucketing makes shapes
    within a bucket identical) — use `group_stack_batches` for a mixed
    epoch.  Pytree-valued entries (e.g. the loader's fused-kernel
    ``...___plan`` ChunkPlan triples) are stacked leaf-wise: lax.scan
    then slices each step's plan arrays back out while the static plan
    geometry rides the (shared) treedef."""
    import numpy as np

    keys = batches[0].keys()
    for b in batches[1:]:
        assert b.keys() == keys, "batches disagree on keys"

    def _stack_leaves(k, *xs):
        arrs = [np.asarray(x) for x in xs]
        shapes = {a.shape for a in arrs}
        if len(shapes) > 1:
            raise ValueError(
                f"stack_batches: key {k!r} has mixed shapes {shapes} — "
                "batches span multiple padding buckets; use "
                "group_stack_batches(batches) and scan each group")
        return np.stack(arrs)

    return {k: jax.tree.map(partial(_stack_leaves, k),
                            *[b[k] for b in batches])
            for k in keys}


def group_stack_batches(batches) -> list:
    """Group collated batches by (leaf-shape, treedef) signature and
    stack each group: returns a list of stacked dicts, one per padding
    bucket, each consumable by `make_chained_sparse_train`'s scan path
    (one compiled program + one dispatch per bucket instead of per
    batch).  The treedef is part of the key because plan pytrees carry
    static META (e.g. StripPlan.launch_splits) that must match to
    stack leaf-wise — a batch whose plan meta diverged (per-block step
    table grew mid-pass) lands in its own group instead of crashing
    the leaf-wise jnp.stack."""
    groups: Dict[tuple, list] = {}
    for b in batches:
        sig = tuple(sorted(
            (k, _leaf_shapes(v), str(jax.tree.structure(v)))
            for k, v in b.items()))
        groups.setdefault(sig, []).append(b)
    return [stack_batches(g) for g in groups.values()]


def _chained_to_dict(mode: str):
    if mode == "sparse":
        from ..hodata.sp_data import batch_to_sparse_dict as to_dict
    elif mode == "dense":
        from ..hodata.ma_data import batch_to_dense_dict as to_dict
    else:
        raise ValueError(f"mode must be 'sparse' or 'dense', got {mode!r}")
    return to_dict


def make_chained_train(annotate=("",), loss: str = "l1",
                       mode: str = "sparse"):
    """Device-side multi-step training: one jit program per call instead
    of one dispatch per batch.

    Returns ``(chain_fn, scan_fn, perm_scan_fn)``:

    - ``chain_fn(model, opt, batch, n_steps)`` repeats one batch
      ``n_steps`` times in a ``lax.fori_loop`` (benchmarking / tiny
      full-batch datasets); returns the final loss.
    - ``scan_fn(model, opt, stacked)`` consumes ``stack_batches(...)``
      output via ``lax.scan`` — a whole epoch in one dispatch; returns
      per-step losses.
    - ``perm_scan_fn(model, opt, stacked, perm)`` scans the resident
      stacked batches in the step order ``perm`` (i32[n_steps]) —
      device-side epoch reshuffle with zero per-epoch host work.  Batch
      membership is frozen at stacking time, and the permutation ranges
      over one stacked group only (callers with several padding-bucket
      groups should also shuffle the group visit order per epoch).
      device_put the stacked dict once, or every call re-transfers it.

    All update model/optimizer state in place (nnx.update), matching a
    python loop of `make_sparse_steps` (or `make_dense_steps` for
    mode="dense") train_step bit-for-bit.  The win is host-dispatch
    elimination: with a remote device (or any high-latency link)
    per-step round trips dominate small-step time.
    """
    to_dict = _chained_to_dict(mode)

    loss_fns = {"l1": masked_l1_loss, "xent": softmax_xent_loss}
    loss_fn_ = loss_fns[loss]

    def _one_step(graphdef, state, batch):
        model, opt = nnx.merge(graphdef, state)

        def loss_fn(model):
            dd = to_dict(batch, annotate)
            pred = model(dd)
            return loss_fn_(pred, batch["y"], batch["graph_mask"])

        lv, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        _, state = nnx.split((model, opt))
        return state, lv

    # jit once at factory level: graphdef and n_steps are static, so
    # repeat calls with the same model structure / shapes hit the
    # compile cache (defining the jit inside chain_fn would retrace —
    # and over a remote tunnel recompile — on every invocation).
    @partial(jax.jit, static_argnums=(0, 3))
    def _chain_run(graphdef, state, batch, n_steps):
        def body(i, carry):
            state, _ = carry
            state, lv = _one_step(graphdef, state, batch)
            return state, lv.astype(jnp.float32)

        return jax.lax.fori_loop(
            0, n_steps, body, (state, jnp.zeros((), jnp.float32)))

    @partial(jax.jit, static_argnums=0)
    def _scan_run(graphdef, state, stacked):
        def body(state, batch):
            return _one_step(graphdef, state, batch)

        return jax.lax.scan(body, state, stacked)

    def chain_fn(model, optimizer, batch, n_steps: int):
        graphdef, state = nnx.split((model, optimizer))
        state, lv = _chain_run(graphdef, state, batch, n_steps)
        nnx.update((model, optimizer), state)
        return lv

    def scan_fn(model, optimizer, stacked):
        graphdef, state = nnx.split((model, optimizer))
        state, losses = _scan_run(graphdef, state, stacked)
        nnx.update((model, optimizer), state)
        return losses

    # Device-side epoch reshuffle: collate + plan + stack the epoch ONCE
    # (all host work amortized over the run), then each epoch scans a
    # fresh step-order permutation — the scan body dynamic-slices batch
    # `perm[i]` out of the resident stacked arrays.  Semantics = a
    # python loop over the same fixed batches in permuted order (batch
    # *membership* is frozen at the first collation, unlike a
    # per-epoch-recollating loader — the classic pre-batched-shuffle
    # tradeoff).
    @partial(jax.jit, static_argnums=0)
    def _perm_scan_run(graphdef, state, stacked, perm):
        def body(state, p):
            batch = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, p, keepdims=False), stacked)
            return _one_step(graphdef, state, batch)

        return jax.lax.scan(body, state, perm)

    def perm_scan_fn(model, optimizer, stacked, perm):
        graphdef, state = nnx.split((model, optimizer))
        state, losses = _perm_scan_run(graphdef, state, stacked,
                                       jnp.asarray(perm, jnp.int32))
        nnx.update((model, optimizer), state)
        return losses

    return chain_fn, scan_fn, perm_scan_fn


def make_chained_sparse_train(annotate=("",), loss: str = "l1"):
    return make_chained_train(annotate, loss, "sparse")


def make_chained_eval(annotate=("",), mode: str = "sparse"):
    """Whole-split evaluation in one dispatch per padding bucket:
    ``eval_fn(model, stacked) -> [abs_err_sum, graph_count]`` scans the
    stacked batches (see `stack_batches` / `group_stack_batches`) and
    accumulates the same [sum, count] pair `make_sparse_steps`'s
    eval_step returns per batch — sum the per-group results and divide
    for the split MAE."""
    to_dict = _chained_to_dict(mode)

    @partial(jax.jit, static_argnums=0)
    def _eval_run(graphdef, state, stacked):
        model = nnx.merge(graphdef, state)

        def body(acc, batch):
            dd = to_dict(batch, annotate)
            pred = model(dd)
            y = batch["y"].reshape(pred.shape)
            w = batch["graph_mask"].astype(pred.dtype)
            return acc + jnp.stack([(jnp.abs(pred - y).mean(-1) * w).sum(),
                                    w.sum()]), None

        acc, _ = jax.lax.scan(body, jnp.zeros(2, jnp.float32), stacked)
        return acc

    def eval_fn(model, stacked):
        graphdef, state = nnx.split(model)
        return _eval_run(graphdef, state, stacked)

    return eval_fn


def softmax_xent_loss(pred: jax.Array, y: jax.Array,
                      graph_mask: jax.Array) -> jax.Array:
    """Masked mean cross-entropy for graph classification (expressivity
    benchmarks: CSL / EXP / sr25)."""
    y = y.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(pred, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    w = graph_mask.astype(pred.dtype)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def make_sparse_classification_steps(annotate=("",)):
    """Jitted train/eval steps for graph classification on the sparse
    path.  eval returns [correct_count, total_count]."""
    from ..hodata.sp_data import batch_to_sparse_dict

    @nnx.jit
    def train_step(model: nnx.Module, optimizer: nnx.Optimizer,
                   batch: Dict[str, Any]) -> jax.Array:
        def loss_fn(model):
            dd = batch_to_sparse_dict(batch, annotate)
            pred = model(dd)
            return softmax_xent_loss(pred, batch["y"], batch["graph_mask"])

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    @nnx.jit
    def eval_step(model: nnx.Module, batch: Dict[str, Any]) -> jax.Array:
        dd = batch_to_sparse_dict(batch, annotate)
        pred = model(dd)
        y = batch["y"].reshape(-1).astype(jnp.int32)
        correct = (jnp.argmax(pred, -1) == y)
        w = batch["graph_mask"].astype(pred.dtype)
        return jnp.stack([(correct * w).sum(), w.sum()])

    return train_step, eval_step


def make_dense_classification_steps(annotate=("",)):
    """Jitted train/eval steps for graph classification on the dense
    path; eval returns [correct_count, total_count]."""
    from ..hodata.ma_data import batch_to_dense_dict

    @nnx.jit
    def train_step(model: nnx.Module, optimizer: nnx.Optimizer,
                   batch: Dict[str, Any]) -> jax.Array:
        def loss_fn(model):
            dd = batch_to_dense_dict(batch, annotate)
            pred = model(dd)
            return softmax_xent_loss(pred, batch["y"], batch["graph_mask"])

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    @nnx.jit
    def eval_step(model: nnx.Module, batch: Dict[str, Any]) -> jax.Array:
        dd = batch_to_dense_dict(batch, annotate)
        pred = model(dd)
        y = batch["y"].reshape(-1).astype(jnp.int32)
        correct = (jnp.argmax(pred, -1) == y)
        w = batch["graph_mask"].astype(pred.dtype)
        return jnp.stack([(correct * w).sum(), w.sum()])

    return train_step, eval_step
