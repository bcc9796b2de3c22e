"""Pipeline (layer-stage) parallelism over a "pp" mesh axis.

The reference has no model parallelism (SURVEY.md §2.7); this is the
GPipe-style axis for deep HOGNN stacks: each device owns a contiguous
slice of layers, microbatches flow through the stages, and activations
move stage-to-stage with ``lax.ppermute`` over ICI.  The schedule is the
classic M + P - 1 tick loop (M microbatches, P stages) written as a
``lax.scan`` so ``jax.grad`` differentiates straight through it — the
backward pass is automatically the reverse pipeline (the transpose of a
ppermute is the opposite rotation), no hand-written grad accumulation.

Like parallel/giant.py this drives a functional NGNN-style stack
(row-local MLP + acd-triple contraction + residual): the per-stage layer
parameters are a stacked pytree sharded over the axis, index arrays are
host-precomputed per microbatch and replicated, and only the last stage
computes the loss (psum broadcasts it).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..backend.indexing import PAD_INDEX
from ..backend.segment import segment_reduce


@dataclasses.dataclass(frozen=True)
class PipelinePlan:
    """Host-built per-microbatch index arrays (identical padded shapes —
    collate the microbatches with a shared ``buckets`` dict)."""
    acd: jax.Array        # i32[M, 3, K] contraction triples (PAD-padded)
    graph_seg: jax.Array  # i32[M, T] tuple row -> graph id (pad -> G)
    nnz_pad: int          # T
    e_pad: int
    n_graphs: int         # G (per microbatch)
    M: int


jax.tree_util.register_dataclass(
    PipelinePlan, data_fields=["acd", "graph_seg"],
    meta_fields=["nnz_pad", "e_pad", "n_graphs", "M"])


def build_pipeline_plan(batches: List[Dict[str, np.ndarray]],
                        key: str) -> PipelinePlan:
    """Stack M collated batches' contraction triples and tuple->graph
    segments.  ``key`` is the precompute key of the contraction (e.g.
    "X___A___1___A___0" for the NGNN message passing)."""
    from ..hodata.sp_data import KEYSEP

    acd = np.stack([np.asarray(b[f"{key}{KEYSEP}acd"]) for b in batches])
    G = int(batches[0]["graph_mask"].shape[0])
    segs = []
    for b in batches:
        tid0 = np.asarray(b["tupleid"])[0]
        batchvec = np.asarray(b["batch"])
        seg = np.where(tid0 < PAD_INDEX,
                       batchvec[np.minimum(tid0, batchvec.shape[0] - 1)], G)
        segs.append(seg.astype(np.int32))
    return PipelinePlan(
        acd=jnp.asarray(acd.astype(np.int32)),
        graph_seg=jnp.asarray(np.stack(segs)),
        nnz_pad=int(batches[0]["tupleid"].shape[1]),
        e_pad=int(batches[0]["edge_index"].shape[1]),
        n_graphs=G,
        M=len(batches))


def init_pipeline_params(num_stage: int, layers_per_stage: int, d: int,
                         seed: int = 0) -> Dict:
    """Stage-stacked layer parameters (leading axis = stage, sharded over
    "pp") + a replicated readout."""
    k1, k2 = jax.random.split(jax.random.key(seed))
    scale = 1.0 / np.sqrt(d)
    return {
        "layers": {
            "w": jax.random.normal(
                k1, (num_stage, layers_per_stage, d, d)) * scale,
            "b": jnp.zeros((num_stage, layers_per_stage, d)),
        },
        "out": {"w": jax.random.normal(k2, (d, 1)) * scale,
                "b": jnp.zeros((1,))},
    }


def _contract(h, Av, acd, T, E):
    """out[a] += h[c] * Av[d] over PAD-padded triples (XLA path)."""
    a, c, d_idx = acd[0], acd[1], acd[2]
    mult = (h[jnp.clip(c, 0, T - 1)] * Av[jnp.clip(d_idx, 0, E - 1)])
    tar = jnp.where(a < PAD_INDEX, a, T)
    return segment_reduce(mult, tar, T, "sum", indices_are_sorted=True)


def _stage_apply(ws, bs, Xb, Av, acd, T, E):
    """Apply one stage's layer slice: relu MLP + contraction + residual."""
    n_layers = ws.shape[0]
    for l in range(n_layers):
        h = jax.nn.relu(Xb @ ws[l] + bs[l])
        Xb = Xb + _contract(h, Av, acd, T, E)
    return Xb


def make_pipeline_step(mesh: Mesh, plan: PipelinePlan, num_stage: int,
                       lr: float = 1e-3, axis: str = "pp"):
    """Build (loss_fn, sgd_step) for the staged stack.

    Inputs: params (init_pipeline_params), Xstack (M, T, D) initial tuple
    values, Avstack (M, E, D) edge values, y (M, G), gmask (M, G) —
    everything but the stage-stacked layer params replicated.
    """
    Pn, M, T, E, G = num_stage, plan.M, plan.nnz_pad, plan.e_pad, \
        plan.n_graphs
    n_ticks = M + Pn - 1

    def device_loss_local(lw, lb, outp, Xstack, Avstack, y, gmask):
        s = jax.lax.axis_index(axis)
        ws, bs = lw[0], lb[0]            # this stage's layer slice
        D = Xstack.shape[-1]

        def tick(carry, t):
            x_cur, out_buf = carry
            mb = jnp.clip(t - s, 0, M - 1)
            x_in = jnp.where(s == 0, Xstack[jnp.clip(t, 0, M - 1)], x_cur)
            acd_mb = jax.lax.dynamic_index_in_dim(plan.acd, mb, 0,
                                                  keepdims=False)
            av_mb = jax.lax.dynamic_index_in_dim(Avstack, mb, 0,
                                                 keepdims=False)
            yb = _stage_apply(ws, bs, x_in, av_mb, acd_mb, T, E)
            # last stage deposits finished microbatch t-(P-1) into out_buf
            out_mb = t - (Pn - 1)
            deposit = jnp.logical_and(s == Pn - 1,
                                      jnp.logical_and(out_mb >= 0,
                                                      out_mb < M))
            out_buf = jnp.where(
                deposit,
                jax.lax.dynamic_update_index_in_dim(
                    out_buf, yb, jnp.clip(out_mb, 0, M - 1), 0),
                out_buf)
            # rotate activations one stage forward
            perm = [(i, (i + 1) % Pn) for i in range(Pn)]
            x_next = jax.lax.ppermute(yb, axis, perm)
            return (x_next, out_buf), None

        x0 = jnp.zeros((T, D), Xstack.dtype)
        buf0 = jnp.zeros((M, T, D), Xstack.dtype)
        (x_cur, out_buf), _ = jax.lax.scan(
            tick, (x0, buf0), jnp.arange(n_ticks))

        # loss on the last stage only; psum replicates it
        pooled = jax.vmap(
            lambda xb, seg: segment_reduce(xb, seg, G, "sum",
                                           indices_are_sorted=False))(
            out_buf, plan.graph_seg)                        # (M, G, D)
        pred = (pooled @ outp["w"] + outp["b"])[..., 0]     # (M, G)
        err = jnp.abs(pred - y) * gmask
        loss = jnp.sum(err) / jnp.maximum(jnp.sum(gmask), 1.0)
        return jnp.where(s == Pn - 1, loss, 0.0)

    def device_loss(*args):
        return jax.lax.psum(device_loss_local(*args), axis)

    def grad_body(lw, lb, outp, Xstack, Avstack, y, gmask):
        # differentiate the GATED LOCAL loss, not the psum'd one: the
        # transpose of psum is psum, so seeding every device's psum output
        # with cotangent 1 would scale all gradients by Pn.  With the
        # local loss only the last stage seeds a cotangent, and the
        # ppermute transposes route it back through the stages.
        loss, grads = jax.value_and_grad(
            device_loss_local, argnums=(0, 1, 2))(
            lw, lb, outp, Xstack, Avstack, y, gmask)
        glw, glb, gout = grads
        # readout is replicated: only the last stage has nonzero grad
        gout = jax.tree.map(lambda g: jax.lax.psum(g, axis), gout)
        return jax.lax.psum(loss, axis), glw, glb, gout

    in_specs = (P(axis), P(axis), P(), P(), P(), P(), P())
    loss_sm = jax.shard_map(device_loss, mesh=mesh, in_specs=in_specs,
                            out_specs=P(), check_vma=False)
    grad_sm = jax.shard_map(grad_body, mesh=mesh, in_specs=in_specs,
                            out_specs=(P(), P(axis), P(axis), P()),
                            check_vma=False)

    @jax.jit
    def loss_fn(params, Xstack, Avstack, y, gmask):
        return loss_sm(params["layers"]["w"], params["layers"]["b"],
                       params["out"], Xstack, Avstack, y, gmask)

    @jax.jit
    def step(params, Xstack, Avstack, y, gmask):
        loss, glw, glb, gout = grad_sm(
            params["layers"]["w"], params["layers"]["b"], params["out"],
            Xstack, Avstack, y, gmask)
        params = {
            "layers": {"w": params["layers"]["w"] - lr * glw,
                       "b": params["layers"]["b"] - lr * glb},
            "out": jax.tree.map(lambda p, g: p - lr * g,
                                params["out"], gout),
        }
        return params, loss

    return loss_fn, step


# ---------------------------------------------------------------------------
# real-model pipeline: stage-split the nnx SpModel conv stack
# ---------------------------------------------------------------------------


def split_conv_stages(model, num_stage: int):
    """Split ``model.subggnns`` (L identical conv modules) into a shared
    graphdef + a stage-stacked state pytree with leading shape
    (num_stage, L // num_stage) — the "pp"-sharded parameters."""
    from flax import nnx

    convs = list(model.subggnns)
    L = len(convs)
    assert L % num_stage == 0, (
        f"num_layer {L} must divide by num_stage {num_stage}")
    lps = L // num_stage
    conv_gd, s0 = nnx.split(convs[0])
    states = [nnx.split(c)[1] for c in convs]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]).reshape(
            (num_stage, lps) + np.shape(xs[0])), *states)
    return conv_gd, stacked, lps


def merge_conv_stages(model, stacked_state) -> None:
    """Write a stage-stacked conv state back into ``model.subggnns``
    (e.g. after pipeline training, to run single-device eval)."""
    from flax import nnx

    convs = list(model.subggnns)
    L = len(convs)
    flat_first = jax.tree.leaves(stacked_state)[0]
    num_stage, lps = flat_first.shape[0], flat_first.shape[1]
    assert num_stage * lps == L, (num_stage, lps, L)
    for i, conv in enumerate(convs):
        s, l = divmod(i, lps)
        nnx.update(conv, jax.tree.map(lambda x: x[s, l], stacked_state))


def make_model_pipeline_step(mesh: Mesh, model, num_stage: int,
                             lr: float = 1e-3, axis: str = "pp"):
    """GPipe the REAL nnx SpModel (VERDICT r1 #3): each "pp" device owns
    a contiguous slice of ``model.subggnns`` (conv weights sharded via
    split_conv_stages); encoder/tupleinit/pools/heads are a replicated
    :class:`~pygho_tpu.models.zinc.SpPipelineTrunk`.  Microbatches are a
    leading-axis stacked pytree of identically-padded collated batches
    (models.training.stack_batches with a shared ``buckets`` dict).

    Schedule: the classic M + P - 1 tick ``lax.scan`` with
    ``lax.ppermute`` stage rotation, differentiated directly (the toy
    pipeline's transpose argument applies unchanged: only the last
    stage's gated loss seeds a cotangent, and the ppermute transposes
    route it back through the stages).  Stage 0 computes the prologue,
    the last stage the readout + masked-L1 loss; replicated-parameter
    gradients are psum'd across stages.

    Returns ``(loss_fn, sgd_step, params)`` where ``params =
    {"conv": stage-stacked conv state, "trunk": trunk state}``; both
    functions take ``(params, stacked_batch)``.  BatchNorm running-stat
    updates inside the pipeline are discarded (use norm="ln" for exact
    single-device parity; the loss/grads themselves are unaffected --
    train-mode BN normalizes by batch statistics).
    """
    from flax import nnx

    from ..hodata.sp_data import batch_to_sparse_dict
    from ..models.training import masked_l1_loss
    from ..models.zinc import SpPipelineTrunk

    conv_gd, conv_state, lps = split_conv_stages(model, num_stage)
    trunk_gd, trunk_state = nnx.split(SpPipelineTrunk(model))
    Pn = num_stage
    residual = model.residual

    def apply_stage(cstate, A, X, dd):
        for l in range(lps):
            conv = nnx.merge(conv_gd,
                             jax.tree.map(lambda x: x[0, l], cstate))
            tX = conv(A, X, dd)
            X = X.add(tX, True) if residual else tX
        return X

    def device_loss_local(cstate, tstate, sbatch):
        s = jax.lax.axis_index(axis)
        trunk = nnx.merge(trunk_gd, tstate)
        M = jax.tree.leaves(sbatch)[0].shape[0]

        def micro(mb):
            b = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, mb, 0, False),
                sbatch)
            dd = batch_to_sparse_dict(b)
            dd, A, X = trunk.encode_init(dd)
            return b, dd, A, X

        def tick(carry, t):
            x_cur, out_buf = carry
            mb = jnp.clip(t - s, 0, M - 1)
            _, dd, A, X0 = micro(mb)
            xv_in = jnp.where(s == 0, X0.values,
                  x_cur.astype(X0.values.dtype))
            X = X0.tuplewiseapply(lambda _: xv_in)
            Xo = apply_stage(cstate, A, X, dd)
            yv = Xo.values
            out_mb = t - (Pn - 1)
            deposit = jnp.logical_and(
                s == Pn - 1,
                jnp.logical_and(out_mb >= 0, out_mb < M))
            out_buf = jnp.where(
                deposit,
                jax.lax.dynamic_update_index_in_dim(
                    out_buf, yv.astype(out_buf.dtype),
                    jnp.clip(out_mb, 0, M - 1), 0),
                out_buf)
            perm = [(i, (i + 1) % Pn) for i in range(Pn)]
            x_next = jax.lax.ppermute(yv.astype(jnp.float32), axis, perm)
            return (x_next, out_buf), None

        _, dd0, _, X0 = micro(jnp.asarray(0))
        T, D = X0.values.shape
        x0 = jnp.zeros((T, D), jnp.float32)
        buf0 = jnp.zeros((M, T, D), jnp.float32)
        (_, out_buf), _ = jax.lax.scan(
            tick, (x0, buf0), jnp.arange(M + Pn - 1))

        # readout + loss on the last stage (static python loop over M)
        losses = []
        for m in range(M):
            b, dd, _, X0 = micro(jnp.asarray(m))
            Xf = X0.tuplewiseapply(
                lambda _: out_buf[m].astype(X0.values.dtype))
            pred = trunk.readout(Xf, dd)
            losses.append(masked_l1_loss(pred, b["y"], b["graph_mask"]))
        loss = jnp.mean(jnp.stack(losses))
        return jnp.where(s == Pn - 1, loss, 0.0)

    def loss_body(cstate, tstate, sbatch):
        return jax.lax.psum(device_loss_local(cstate, tstate, sbatch),
                            axis)

    def grad_body(cstate, tstate, sbatch):
        loss, grads = jax.value_and_grad(
            device_loss_local, argnums=(0, 1))(cstate, tstate, sbatch)
        gc, gt = grads
        gt = jax.tree.map(lambda g: jax.lax.psum(g, axis), gt)
        return jax.lax.psum(loss, axis), gc, gt

    in_specs = (P(axis), P(), P())
    loss_sm = jax.shard_map(loss_body, mesh=mesh, in_specs=in_specs,
                            out_specs=P(), check_vma=False)
    grad_sm = jax.shard_map(grad_body, mesh=mesh, in_specs=in_specs,
                            out_specs=(P(), P(axis), P()),
                            check_vma=False)

    @jax.jit
    def loss_fn(params, sbatch):
        return loss_sm(params["conv"], params["trunk"], sbatch)

    @jax.jit
    def step(params, sbatch):
        loss, gc, gt = grad_sm(params["conv"], params["trunk"], sbatch)
        new = {
            "conv": jax.tree.map(lambda p, g: p - lr * g,
                                 params["conv"], gc),
            "trunk": jax.tree.map(lambda p, g: p - lr * g,
                                  params["trunk"], gt),
        }
        return new, loss

    params = {"conv": conv_state, "trunk": trunk_state}
    return loss_fn, step, params


def reference_model_pipeline_loss(model, sbatch) -> jax.Array:
    """Single-device oracle for make_model_pipeline_step: the SAME
    stacked microbatches through the unsplit SpModel, averaged."""
    from ..hodata.sp_data import batch_to_sparse_dict
    from ..models.training import masked_l1_loss

    M = jax.tree.leaves(sbatch)[0].shape[0]
    losses = []
    for m in range(M):
        b = jax.tree.map(lambda x: jnp.asarray(x)[m], sbatch)
        pred = model(batch_to_sparse_dict(b))
        losses.append(masked_l1_loss(pred, b["y"], b["graph_mask"]))
    return jnp.mean(jnp.stack(losses))


def reference_stack_loss(params, plan: PipelinePlan, Xstack, Avstack, y,
                         gmask):
    """Single-device oracle: the same stack applied microbatch by
    microbatch, stage slices in order.  Used by tests to pin the
    pipeline's numerics."""
    lw, lb = params["layers"]["w"], params["layers"]["b"]
    Pn, Lps = lw.shape[0], lw.shape[1]
    T, E, G = plan.nnz_pad, plan.e_pad, plan.n_graphs
    preds = []
    for m in range(plan.M):
        x = Xstack[m]
        for s in range(Pn):
            x = _stage_apply(lw[s], lb[s], x, Avstack[m], plan.acd[m], T, E)
        pooled = segment_reduce(x, plan.graph_seg[m], G, "sum",
                                indices_are_sorted=False)
        preds.append((pooled @ params["out"]["w"] + params["out"]["b"])[:, 0])
    pred = jnp.stack(preds)
    err = jnp.abs(pred - y) * gmask
    return jnp.sum(err) / jnp.maximum(jnp.sum(gmask), 1.0)
