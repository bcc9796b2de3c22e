"""Training utilities: optimizer, LR schedule, jitted train/eval steps.

The LR schedule replicates the reference's cosine-annealing-warm-restarts
with polynomial amplitude decay of restarts
(reference example/lr_scheduler.py:20-28):

  lr(e) = 1/(1 + K*c + K2*c^2) * (min + (base - min) *
          (1 + cos(pi * t / T)) / 2)

with c = completed restarts, t = epoch within the cycle, T_mult = 1.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx


def cosine_warm_restarts(base_lr: float, T0: int, steps_per_epoch: int,
                         eta_min: float = 0.0, K: float = 0.0,
                         K2: float = 0.0) -> Callable:
    """Per-step schedule matching the reference epoch-level scheduler
    (T_mult fixed to 1, the only value the examples use)."""

    def schedule(step):
        epoch = step / steps_per_epoch
        if T0 < 1:
            return base_lr
        num_cos = jnp.floor(epoch / T0)
        t_cur = epoch - num_cos * T0
        amp = 1.0 / (1.0 + K * num_cos + K2 * num_cos ** 2)
        return amp * (eta_min + (base_lr - eta_min) *
                      (1.0 + jnp.cos(jnp.pi * t_cur / T0)) / 2.0)

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
