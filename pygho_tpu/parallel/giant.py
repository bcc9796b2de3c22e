"""End-to-end tuple-parallel training for a single giant graph.

The DP path shards over graphs; when ONE graph's tuple tensor exceeds a
chip, the scaling axis is the tuple dimension itself (SURVEY.md §5,
BASELINE metric b).  This module trains a multi-layer NGNN-style model
with X values row-block-sharded over the "sp" mesh axis end to end:

- per layer: a row-local MLP (replicated weights) + the overlapped
  tuple-parallel contraction (local triples compute under the boundary
  all_gather) + residual — all inside one shard_map;
- the readout pools the sharded tuple rows to their root nodes with a
  local segment-reduce followed by a psum (roots' tuples can span
  shards);
- gradients of the replicated parameters are pmean'd over the axis.

Everything data-dependent (the per-layer OverlappedShardPlan, the
root-pooling segment ids) is host-precomputed, as everywhere else in the
framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..backend.indexing import PAD_INDEX
from ..backend.segment import segment_reduce
from .tuple_parallel import (OverlappedShardPlan, _overlapped_contract,
                             build_overlapped_shard_plan,
                             RingShardPlan, _ring_contract,
                             build_ring_shard_plan,
                             ReduceScatterShardPlan,
                             build_reduce_scatter_shard_plan,
                             FusedOverlappedShardPlan,
                             _fused_overlapped_contract,
                             build_fused_overlapped_shard_plan,
                             _pool_contract)


@dataclasses.dataclass(frozen=True)
class GiantGraphPlan:
    """Sharding plan for one giant graph's NGNN stack.

    ``contraction`` is an OverlappedShardPlan (one boundary-pool
    all_gather per layer, peak boundary memory P*Bnd rows), a
    RingShardPlan (ppermute ring, peak Bnd rows — pick "ring" when the
    gathered pool itself would blow HBM at giant scale), or a
    ReduceScatterShardPlan (input-stationary full-range partials +
    psum_scatter — the structure-free choice when boundaries approach
    full blocks)."""
    contraction: Any                   # per-layer (same pattern every layer)
    root_ids: jax.Array                # i32[P, B] root node per local tuple
    n_nodes: int                       # padded node count (output rows)
    P: int
    B: int


jax.tree_util.register_dataclass(
    GiantGraphPlan, data_fields=["contraction", "root_ids"],
    meta_fields=["n_nodes", "P", "B"])


def build_giant_graph_plan(acd: np.ndarray, tupleid: np.ndarray,
                           nnz_pad: int, n_nodes: int,
                           P: int,
                           strategy: str = "overlapped",
                           n_edge_rows: Optional[int] = None,
                           plan_dim: int = 128) -> GiantGraphPlan:
    if strategy == "ring":
        contraction = build_ring_shard_plan(acd, nnz_pad, P)
    elif strategy == "overlapped":
        contraction = build_overlapped_shard_plan(acd, nnz_pad, P)
    elif strategy == "reduce_scatter":
        contraction = build_reduce_scatter_shard_plan(acd, nnz_pad, P)
    elif strategy == "overlapped_fused":
        # v3 partition, both contractions on the fused Pallas kernel
        # (3.1x XLA at giant-graph scale, BENCHMARKS.md); needs the
        # padded edge-value row count to size the kernel's V operand
        assert n_edge_rows is not None, (
            "overlapped_fused needs n_edge_rows (padded Av row count)")
        contraction = build_fused_overlapped_shard_plan(
            acd, nnz_pad, P, n_edge_rows, D=plan_dim)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    B = nnz_pad // P
    tid0 = np.asarray(tupleid)[0]
    root = np.where(tid0 < PAD_INDEX, tid0, n_nodes).astype(np.int32)
    root_ids = root.reshape(P, B)
    return GiantGraphPlan(contraction=contraction,
                          root_ids=jnp.asarray(root_ids),
                          n_nodes=n_nodes, P=P, B=B)


def init_giant_params(num_layer: int, d: int, seed: int = 0) -> Dict:
    """Simple replicated parameter pytree: per-layer Linear + readout."""
    ks = jax.random.split(jax.random.key(seed), num_layer + 1)
    scale = 1.0 / np.sqrt(d)
    params = {
        "layers": [
            {"w": jax.random.normal(ks[i], (d, d)) * scale,
             "b": jnp.zeros((d,))}
            for i in range(num_layer)
        ],
        "out": {"w": jax.random.normal(ks[-1], (d, 1)) * scale,
                "b": jnp.zeros((1,))},
    }
    return params


def make_giant_graph_step(mesh: Mesh, plan: GiantGraphPlan,
                          num_layer: int, lr: float = 1e-3,
                          axis: str = "sp",
                          n_real: Optional[int] = None):
    """Build (loss_fn, sgd_step) for the sharded NGNN stack.

    Both are jitted; inputs: params (replicated), Xv (nnz_pad, D) sharded
    by row blocks, Av (edge values, replicated), y (n_nodes,) node-level
    regression targets (replicated).  If plan.n_nodes includes padded
    node rows, pass the real node count as n_real so the MSE averages
    over real nodes only (pad rows would otherwise contribute constant
    (bias - y_pad)^2 terms that bias the readout).
    """
    c = plan.contraction
    is_ring = isinstance(c, RingShardPlan)
    is_rs = isinstance(c, ReduceScatterShardPlan)
    is_fov = isinstance(c, FusedOverlappedShardPlan)
    dummy_tri = jnp.zeros((plan.P, 1, 3), jnp.int32)
    dummy_plan = jnp.zeros((plan.P, 1), jnp.int32)
    if is_rs:
        # no boundary sets: pass zero-size dummies through the plumbing
        aux = dummy_tri
        send = jnp.zeros((plan.P, 1), jnp.int32)
    elif is_fov:
        # triples live inside the fused chunk plans
        aux = dummy_tri
        send = c.base.send_idx
    else:
        aux = c.acd_ring if is_ring else c.acd_bnd
        send = c.send_idx
    loc_tri = dummy_tri if is_fov else c.acd_loc
    lp_in = c.loc_plans if is_fov else dummy_plan
    bp_in = c.bnd_plans if is_fov else dummy_plan

    def _rs_contract(h, Av, loc):
        # full-range partial (shared gather/segment body) + psum_scatter
        partial = _pool_contract(h, Av, loc, plan.P * plan.B)
        return jax.lax.psum_scatter(
            partial.reshape((plan.P, plan.B) + partial.shape[1:]),
            axis, scatter_dimension=0, tiled=False)

    def device_forward(params, Xblk, Av, loc, bnd, send_l, roots, lp, bp):
        Xb = Xblk[0]                                    # (B, D)
        if is_fov:
            lp = jax.tree.map(lambda x: x[0], lp)
            bp = jax.tree.map(lambda x: x[0], bp)
        for lay in params["layers"]:
            h = jax.nn.relu(Xb @ lay["w"] + lay["b"])   # local MLP rows
            # contraction of the POST-MLP values: overlapped starts the
            # boundary all_gather and reduces local triples under it;
            # ring rotates boundary pools with ppermute per step;
            # reduce_scatter sums full-range partials into own bands;
            # overlapped_fused runs both triple sets on the Pallas kernel
            if is_fov:
                out = _fused_overlapped_contract(h, Av, send_l[0], lp, bp,
                                                 plan.B, axis)
            elif is_rs:
                out = _rs_contract(h, Av, loc[0])
            elif is_ring:
                out = _ring_contract(h, Av, loc[0], bnd[0], send_l[0],
                                     plan.P, plan.B, axis)
            else:
                out = _overlapped_contract(h, Av, loc[0], bnd[0], send_l[0],
                                           plan.B, axis)
            Xb = Xb + out                               # residual
        # root pooling: local partial sums + psum (roots span shards)
        node_h = segment_reduce(Xb, roots[0], plan.n_nodes, "sum",
                                indices_are_sorted=True)
        node_h = jax.lax.psum(node_h, axis)
        pred = node_h @ params["out"]["w"] + params["out"]["b"]
        return pred[:, 0]

    def device_loss(params, Xblk, Av, loc, bnd, send_l, roots, y, lp, bp):
        pred = device_forward(params, Xblk, Av, loc, bnd, send_l, roots,
                              lp, bp)
        se = (pred - y) ** 2
        if n_real is not None and n_real < plan.n_nodes:
            mask = jnp.arange(plan.n_nodes) < n_real
            return jnp.sum(jnp.where(mask, se, 0.0)) / n_real
        return jnp.mean(se)

    in_specs = (P(), P(axis), P(), P(axis), P(axis), P(axis),
                P(axis), P(), P(axis), P(axis))

    loss_sm = jax.shard_map(
        device_loss, mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        check_vma=False,
    )

    def grad_body(params, Xblk, Av, loc, bnd, send_l, roots, y, lp, bp):
        loss, grads = jax.value_and_grad(device_loss)(
            params, Xblk, Av, loc, bnd, send_l, roots, y, lp, bp)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        return loss, grads

    grad_sm = jax.shard_map(
        grad_body, mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def loss_fn(params, Xv, Av, y):
        Xs = Xv.reshape(plan.P, plan.B, -1)
        return loss_sm(params, Xs, Av, loc_tri, aux, send,
                       plan.root_ids, y, lp_in, bp_in)

    @jax.jit
    def step(params, Xv, Av, y):
        Xs = Xv.reshape(plan.P, plan.B, -1)
        loss, grads = grad_sm(params, Xs, Av, loc_tri, aux,
                              send, plan.root_ids, y, lp_in, bp_in)
        params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    return loss_fn, step
