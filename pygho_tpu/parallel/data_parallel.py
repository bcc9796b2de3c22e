"""Data-parallel training over a "dp" mesh axis.

Only the dp axis is manual in the shard_map (``axis_names``); any other
mesh axes stay under GSPMD control, so dp composes with tensor
parallelism on a 2-D ("dp", "tp") mesh — place the state with
tensor_parallel.tp_state_shardings and jit propagates it through the
step (tests/test_parallel.py::test_dp_tp_composition).

Graphs are independent blocks of the block-diagonal sparse batch, so DP
sharding is exact: the loader collates one sub-batch per device (leading
axis D), shard_map runs the per-device step, gradients and batch-norm
statistics are pmean'd over the axis, and every device applies the same
deterministic update (so the replicated output spec is sound).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P

from ..hodata.sp_data import collate_sparse, batch_to_sparse_dict
from ..models.training import masked_l1_loss


def collate_sharded_sparse(
    datas: List[Dict[str, Any]],
    num_devices: int,
    per_device_graphs: int,
    keys: Sequence[str] = ("",),
    annotate: Sequence[str] = ("",),
    buckets: Optional[Dict[str, int]] = None,
    build_plans: bool = False,
    plan_geometry="autotune",
    plan_dim: int = 128,
    geoms_cache: Optional[Dict[str, Any]] = None,
    attention_plans: bool = False,
) -> Dict[str, np.ndarray]:
    """Collate D independent sub-batches and stack on a leading device
    axis.  Shared ``buckets`` force identical padded shapes across the
    shards (a requirement for stacking and for stable jit shapes).

    ``build_plans=True`` builds per-shard fused-kernel chunk plans
    (hodata.loader.add_spspmm_plans) so the dp train step runs the
    Pallas spspmm path on every device; plan pytrees stack leaf-wise on
    the device axis (shared buckets keep the static plan geometry
    identical across shards)."""
    buckets = buckets if buckets is not None else {}
    assert len(datas) <= num_devices * per_device_graphs, (
        f"{len(datas)} graphs exceed num_devices*per_device_graphs="
        f"{num_devices * per_device_graphs}; the excess would be "
        f"silently dropped")
    chunks = []
    for d in range(num_devices):
        chunk = datas[d * per_device_graphs:(d + 1) * per_device_graphs]
        assert len(chunk) > 0, "not enough graphs for the device count"
        chunks.append(chunk)
    # cheap size-only pass: grow the shared buckets to the max over shards
    # so one real collation produces stackable shapes
    from ..backend.indexing import bucket_size

    for chunk in chunks:
        sizes = {
            "nodes": sum(d["num_nodes"] for d in chunk),
            "edges": sum(d["num_edges"] for d in chunk),
        }
        for ann in annotate:
            sizes[f"tuples{ann}"] = sum(d[f"num_tuples{ann}"]
                                        for d in chunk)
        for key in keys:
            if key:
                sizes[f"acd{key}"] = sum(
                    d[f"{key}___acd"].shape[1] for d in chunk)
        for name, n in sizes.items():
            buckets[name] = max(bucket_size(max(n, 1)),
                                buckets.get(name, 0))
    shards = [collate_sparse(chunk, keys, annotate,
                             num_graphs=per_device_graphs, buckets=buckets)
              for chunk in chunks]
    if build_plans:
        from ..hodata.loader import add_spspmm_plans

        gc = geoms_cache if geoms_cache is not None else {}
        # two passes: the first settles shared geometry + chunk-count
        # buckets, the second rebuilds every shard at the final padded
        # chunk count so the plan pytrees stack
        for _ in range(2):
            for s in shards:
                add_spspmm_plans(s, keys, buckets, gc, plan_geometry,
                                 plan_dim)
        # the fill guard is per-shard: drop any plan key not present on
        # every shard (the fused path falls back to XLA for that key)
        for k in [k for k in list(shards[0]) if k.endswith("___plan")]:
            if not all(k in s for s in shards):
                for s in shards:
                    s.pop(k, None)
    if attention_plans:
        from ..hodata.loader import add_attention_plans

        gc = geoms_cache if geoms_cache is not None else {}
        # same two-pass discipline as the spspmm plans: settle shared
        # geometry + step buckets, then rebuild at the final padding so
        # the StripPlan pytrees stack on the device axis
        for _ in range(2):
            for s in shards:
                add_attention_plans(s, keys, buckets, gc, plan_dim)
        for k in [k for k in list(shards[0])
                  if k.endswith("___attplan1") or k.endswith("___attplan")]:
            drop = not all(k in s for s in shards)
            if not drop:
                # stacking also needs identical pytree meta (geometry,
                # launch splits) across shards
                t0 = jax.tree.structure(shards[0][k])
                drop = any(jax.tree.structure(s[k]) != t0
                           for s in shards[1:])
            if drop:
                for s in shards:
                    s.pop(k, None)
    out = {}
    for k in shards[0]:
        out[k] = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[s[k] for s in shards])
    return out


def _take_shard(x):
    """Drop the leading device axis of a shard — and fail loudly if the
    mesh axis didn't fully shard it (e.g. a batch stacked for 8 devices
    fed to a 4-wide dp axis would silently drop data)."""
    assert x.shape[0] == 1, (
        f"per-device shard has leading dim {x.shape[0]}, expected 1 — "
        f"batch device count must equal the dp axis size")
    return x[0]


def _pmean_stats(model: nnx.Module, axis: str):
    """pmean batch-norm running statistics across the dp axis so all
    replicas hold identical state."""
    stats = nnx.state(model, nnx.BatchStat)
    stats = jax.tree.map(lambda x: jax.lax.pmean(x, axis), stats)
    nnx.update(model, stats)


def make_dp_train_step(mesh: Mesh, graphdef, annotate: Sequence[str] = ("",),
                       axis: str = "dp"):
    """Build a jitted SPMD train step.

    Usage::

        graphdef, state = nnx.split((model, optimizer))
        step = make_dp_train_step(mesh, graphdef)
        state, loss = step(state, sharded_batch)   # repeat
        nnx.update((model, optimizer), state)      # to read back

    The returned step is a pure function of (state, batch) — state stays
    on device between steps.
    """

    def device_body(state, batch):
        batch = jax.tree.map(_take_shard, batch)
        model, optimizer = nnx.merge(graphdef, state)

        def loss_fn(model):
            dd = batch_to_sparse_dict(batch, annotate)
            pred = model(dd)
            return masked_l1_loss(pred, batch["y"], batch["graph_mask"])

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
        optimizer.update(model, grads)
        _pmean_stats(model, axis)
        _, new_state = nnx.split((model, optimizer))
        return new_state, jax.lax.pmean(loss, axis)

    def step(state, batch):
        body = jax.shard_map(
            device_body, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(axis), batch)),
            out_specs=(P(), P()),
            check_vma=False,
            axis_names=frozenset({axis}),
        )
        return body(state, batch)

    return jax.jit(step)


def make_dp_chained_train(mesh: Mesh, graphdef,
                          annotate: Sequence[str] = ("",),
                          axis: str = "dp"):
    """Chained (whole-epoch lax.scan) data-parallel training — the DP
    composition of models.training's perm_scan path: one device dispatch
    per epoch AND pmean'd gradients/BN stats per step.

    Usage::

        graphdef, state = nnx.split((model, optimizer))
        scan_fn = make_dp_chained_train(mesh, graphdef)
        stacked = stack_batches([collate_sharded_sparse(...), ...])
        stacked = jax.device_put(stacked)      # resident epoch
        state, losses = scan_fn(state, stacked, perm)   # each epoch

    ``stacked`` leaves have leading axes (steps, dp, ...); ``perm``
    (i32[steps]) is the epoch's step order.  Batch membership is frozen
    at stacking time (see models.training.stack_batches)."""

    def device_body(state, stacked, perm):
        def one(state, p):
            batch = jax.tree.map(
                lambda x: _take_shard(jax.lax.dynamic_index_in_dim(
                    x, p, keepdims=False)), stacked)
            model, optimizer = nnx.merge(graphdef, state)

            def loss_fn(model):
                dd = batch_to_sparse_dict(batch, annotate)
                pred = model(dd)
                return masked_l1_loss(pred, batch["y"],
                                      batch["graph_mask"])

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, axis), grads)
            optimizer.update(model, grads)
            _pmean_stats(model, axis)
            _, new_state = nnx.split((model, optimizer))
            return new_state, jax.lax.pmean(loss, axis)

        return jax.lax.scan(one, state, perm)

    def fn(state, stacked, perm):
        body = jax.shard_map(
            device_body, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(None, axis), stacked),
                      P()),
            out_specs=(P(), P()),
            check_vma=False,
            axis_names=frozenset({axis}),
        )
        return body(state, stacked, jnp.asarray(perm, jnp.int32))

    return jax.jit(fn)


def make_dp_eval_step(mesh: Mesh, graphdef, annotate: Sequence[str] = ("",),
                      axis: str = "dp"):
    def device_body(state, batch):
        batch = jax.tree.map(_take_shard, batch)
        model, _ = nnx.merge(graphdef, state)
        model.eval()   # eval semantics regardless of the captured graphdef
        dd = batch_to_sparse_dict(batch, annotate)
        pred = model(dd)
        y = batch["y"].reshape(pred.shape)
        w = batch["graph_mask"].astype(pred.dtype)
        err = (jnp.abs(pred - y).mean(-1) * w).sum()
        return jnp.stack([jax.lax.psum(err, axis),
                          jax.lax.psum(w.sum(), axis)])

    def step(state, batch):
        body = jax.shard_map(
            device_body, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(axis), batch)),
            out_specs=P(),
            check_vma=False,
            axis_names=frozenset({axis}),
        )
        return body(state, batch)

    return jax.jit(step)
