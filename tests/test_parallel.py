"""Distribution tests on the virtual 8-device CPU mesh.

Oracles: the single-device implementations.  DP training must track the
equivalent big-batch single-device run; tuple-parallel contraction must
equal spspmm exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor
from pygho_tpu.backend.spspmm import spspmm
from pygho_tpu.hodata import Sppretransform
from pygho_tpu.hodata.sp_sampler import KhopSampler
from pygho_tpu.hodata.datasets import synthetic_zinc
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import make_sp_model
from pygho_tpu.models.training import make_optimizer
from pygho_tpu.parallel import (make_mesh, collate_sharded_sparse,
                                make_dp_train_step, make_dp_eval_step,
                                spspmm_tuple_parallel)
from pygho_tpu.parallel.tuple_parallel import make_tuple_parallel_spspmm

from utils import maxdiff


def test_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_train_step_runs_and_learns():
    model = make_sp_model("NGNN", num_layer=2, hiddim=16,
                          mlp={"norm": "bn", "act": "silu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=64)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    mesh = make_mesh((8,), ("dp",))
    opt = make_optimizer(model, 1e-2)
    graphdef, state = nnx.split((model, opt))
    train = make_dp_train_step(mesh, graphdef)
    evals = make_dp_eval_step(mesh, graphdef)

    buckets = {}
    losses = []
    for ep in range(6):
        batch = collate_sharded_sparse(datas, 8, 8, keys, buckets=buckets)
        state, loss = train(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    res = np.asarray(evals(state, batch))
    assert res[1] == 64.0  # every graph counted exactly once
    # state can be merged back
    nnx.update((model, opt), state)


def test_dp_chained_matches_step_loop():
    """Whole-epoch dp scan (make_dp_chained_train) == a python loop of
    make_dp_train_step over the same sharded batches in perm order."""
    from pygho_tpu.models.training import stack_batches
    from pygho_tpu.parallel import make_dp_chained_train

    def build():
        model = make_sp_model("NGNN", num_layer=2, hiddim=16,
                              mlp={"norm": "bn", "act": "silu"})
        opt = make_optimizer(model, 1e-2)
        return nnx.split((model, opt))

    keys = parse_precomputekey(make_sp_model(
        "NGNN", num_layer=2, hiddim=16,
        mlp={"norm": "bn", "act": "silu"}))
    graphs = synthetic_zinc("train", n_graphs=48)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    mesh = make_mesh((8,), ("dp",))
    buckets = {}
    batches = [collate_sharded_sparse(datas[i * 16:(i + 1) * 16], 8, 2,
                                      keys, buckets=buckets)
               for i in range(3)]
    # re-collate after warming so shapes are uniform across steps
    batches = [collate_sharded_sparse(datas[i * 16:(i + 1) * 16], 8, 2,
                                      keys, buckets=buckets)
               for i in range(3)]
    perm = np.array([2, 0, 1])

    graphdef, state_a = build()
    step = make_dp_train_step(mesh, graphdef)
    ref = []
    for p in perm:
        state_a, l = step(state_a, batches[p])
        ref.append(float(l))

    _, state_b = build()
    scan_fn = make_dp_chained_train(mesh, graphdef)
    state_b, losses = scan_fn(state_b, stack_batches(batches), perm)
    assert np.abs(np.asarray(losses) - np.asarray(ref)).max() < 1e-5, (
        losses, ref)
    worst = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(state_a),
                                jax.tree.leaves(state_b)))
    assert worst < 1e-5, worst


def test_dp_fused_plans_match_xla():
    """collate_sharded_sparse(build_plans=True) routes every device's
    contraction through the fused kernel; the dp step matches the XLA
    dp step (d=128 so the fused route engages)."""
    model = make_sp_model("NGNN", num_layer=1, hiddim=128,
                          mlp={"norm": "none", "act": "relu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=16)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    mesh = make_mesh((8,), ("dp",))
    opt = make_optimizer(model, 1e-2)
    graphdef, state = nnx.split((model, opt))
    step = make_dp_train_step(mesh, graphdef)

    buckets = {}
    plain = collate_sharded_sparse(datas, 8, 2, keys, buckets=buckets)
    fused = collate_sharded_sparse(datas, 8, 2, keys, buckets=buckets,
                                   build_plans=True,
                                   plan_geometry=(128, 256, 128))
    assert any(k.endswith("___plan") for k in fused), list(fused)
    _, l0 = step(state, plain)
    _, l1 = step(state, fused)
    assert abs(float(l0) - float(l1)) < 1e-4, (float(l0), float(l1))


def test_dp_attention_plans_match_xla():
    """collate_sharded_sparse(attention_plans=True) stacks the
    single-launch attention StripPlan triples on the device axis; the
    NGAT dp step matches the XLA dp step."""
    model = make_sp_model("NGAT", num_layer=1, hiddim=128,
                          mlp={"norm": "none", "act": "relu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=16)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    mesh = make_mesh((8,), ("dp",))
    opt = make_optimizer(model, 1e-2)
    graphdef, state = nnx.split((model, opt))
    step = make_dp_train_step(mesh, graphdef)

    buckets = {}
    plain = collate_sharded_sparse(datas, 8, 2, keys, buckets=buckets)
    att = collate_sharded_sparse(datas, 8, 2, keys, buckets=buckets,
                                 attention_plans=True)
    assert any(k.endswith("___attplan1") for k in att), list(att)
    _, l0 = step(state, plain)
    _, l1 = step(state, att)
    assert abs(float(l0) - float(l1)) < 1e-4, (float(l0), float(l1))


def test_dp_matches_single_device_first_step():
    """One DP step over 8 shards == one single-device step over the same
    64 graphs (grads are exact means since every shard has equal graph
    count and the loss is a mean over graphs)."""
    graphs = synthetic_zinc("train", n_graphs=64)

    def build():
        m = make_sp_model("NGNN", num_layer=1, hiddim=8, seed=3,
                          mlp={"norm": "none", "act": "relu"})
        return m

    keys = parse_precomputekey(build())
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    # single device, one batch of 64
    from pygho_tpu.hodata import SpDataloader
    from pygho_tpu.models.training import make_sparse_steps
    m1 = build()
    o1 = make_optimizer(m1, 1e-2)
    dl = SpDataloader(datas, batch_size=64, keys=keys, device_put=False,
                      prefetch=0)
    ts1, _ = make_sparse_steps()
    loss1 = float(ts1(m1, o1, next(iter(dl))))

    # 8-way DP
    m2 = build()
    o2 = make_optimizer(m2, 1e-2)
    mesh = make_mesh((8,), ("dp",))
    graphdef, state = nnx.split((m2, o2))
    train = make_dp_train_step(mesh, graphdef)
    batch = collate_sharded_sparse(datas, 8, 8, keys)
    state, loss2 = train(state, batch)
    assert abs(loss1 - float(loss2)) < 2e-4, (loss1, float(loss2))

    # params after one step agree
    nnx.update((m2, o2), state)
    p1 = jax.tree.leaves(nnx.state(m1, nnx.Param))
    p2 = jax.tree.leaves(nnx.state(m2, nnx.Param))
    worst = max(maxdiff(a, b) for a, b in zip(p1, p2))
    assert worst < 2e-4, worst


@pytest.mark.parametrize("aggr", ["sum", "mean", "max"])
def test_tuple_parallel_matches_spspmm(rng, aggr):
    from utils import random_sparse

    n, d = 12, 4
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,))
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,))
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = jnp.asarray(indexing.pad_acd(
        acd, indexing.bucket_size(acd.shape[1], 256)))

    ref = spspmm(X, 1, A, 0, aggr, acd=acd_p, tarX=X)

    mesh = make_mesh((8,), ("sp",))
    run = make_tuple_parallel_spspmm(mesh, aggr)
    got = run(X, A, acd_p)
    assert maxdiff(got.values, ref.values) < 1e-5


def test_partitioned_tuple_parallel_matches_spspmm(rng):
    """v2 partitioned-values path (boundary-pool all_gather) == spspmm."""
    from pygho_tpu.parallel.tuple_parallel import (build_tuple_shard_plan,
                                                   make_partitioned_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_tuple_shard_plan(acd_p, X.nnz_pad, 8)
    assert plan.Bnd >= 1
    run = make_partitioned_spspmm(mesh, plan)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5


def test_overlapped_tuple_parallel_matches_spspmm(rng):
    from pygho_tpu.parallel.tuple_parallel import (
        build_overlapped_shard_plan, make_overlapped_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_overlapped_shard_plan(acd_p, X.nnz_pad, 8)
    run = make_overlapped_spspmm(mesh, plan)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5


def test_fused_overlapped_tuple_parallel_matches_spspmm(rng):
    """v7: both per-shard contractions on the Pallas chunk kernel
    (interpret mode on CPU) match the single-device spspmm."""
    from pygho_tpu.parallel.tuple_parallel import (
        build_fused_overlapped_shard_plan, make_fused_overlapped_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_fused_overlapped_shard_plan(acd_p, X.nnz_pad, 8,
                                             A.values.shape[0], D=d)
    run = make_fused_overlapped_spspmm(mesh, plan)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5


def test_fused_overlapped_strip_plans_match_spspmm(rng):
    """v7 with kind='strip': per-shard strip plans stack on the device
    axis (common per-block step tables) and match the single-device
    spspmm — including multi-launch grids, where shared oblk keeps
    launch_splits (pytree meta) identical across shards.  Only a
    planner refusal (one block over the grid ceiling) falls back to
    chunk plans, with a warning."""
    import warnings

    from pygho_tpu.kernels.strip_spspmm import StripPlan
    from pygho_tpu.parallel.tuple_parallel import (
        build_fused_overlapped_shard_plan, make_fused_overlapped_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    # X padded to 1024 tuple rows: per-shard B = 128 gives each shard
    # TWO output blocks under the S = 64 geometry below, which the
    # multi-launch split needs (splits cut at block boundaries)
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=1024)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    g = (64, 128, 64, 64, 128)
    plan = build_fused_overlapped_shard_plan(
        acd_p, X.nnz_pad, 8, A.values.shape[0], D=d,
        geoms={r: g for r in ("fwd", "dx", "da")}, kind="strip")
    assert isinstance(jax.tree.leaves(plan.loc_plans)[0], jax.Array)
    # per-shard plan is a StripPlan pytree (leading device axis on leaves)
    run = make_fused_overlapped_spspmm(mesh, plan)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5

    # multi-launch stacking: drop the single-launch ceiling to the
    # longest per-block step run — every role then executes as several
    # launches, and the common per-block tables keep the shards stacked
    import pygho_tpu.kernels.strip_spspmm as ss
    all_plans = list(plan.loc_plans) + list(plan.bnd_plans)
    max_blk = max(int(np.bincount(np.asarray(p.oblk[0]),
                                  minlength=p.out_rows // p.S).max())
                  for p in all_plans)
    max_steps = max(int(p.oblk.shape[1]) for p in all_plans)
    assert max_blk >= 2 and max_steps > max_blk, (
        "workload too small to exercise multi-launch splits")
    saved = ss._MAX_GRID_STEPS
    try:
        ss._MAX_GRID_STEPS = max_blk
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            plan_ml = build_fused_overlapped_shard_plan(
                acd_p, X.nnz_pad, 8, A.values.shape[0], D=d,
                geoms={r: g for r in ("fwd", "dx", "da")}, kind="strip")
        assert not any("falling back" in str(x.message) for x in w)
        plans_ml = list(plan_ml.loc_plans) + list(plan_ml.bnd_plans)
        assert all(isinstance(p, StripPlan) for p in plans_ml)
        # any plan longer than the ceiling must now run as several
        # launches (the largest role is by construction: its longest
        # block run IS the ceiling, and it has other blocks too)
        big = max(plans_ml, key=lambda p: int(p.oblk.shape[1]))
        assert len(big.launch_splits) > 1
        got_ml = make_fused_overlapped_spspmm(mesh, plan_ml)(
            X.values, A.values)
        assert maxdiff(got_ml, ref.values) < 1e-5

        # chunk fallback: a ceiling below one block's step run is a
        # planner refusal (splits cut at block boundaries)
        ss._MAX_GRID_STEPS = max_blk - 1
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            plan2 = build_fused_overlapped_shard_plan(
                acd_p, X.nnz_pad, 8, A.values.shape[0], D=d,
                geoms={r: g for r in ("fwd", "dx", "da")}, kind="strip")
        assert any("falling back" in str(x.message) for x in w)
    finally:
        ss._MAX_GRID_STEPS = saved
    got2 = make_fused_overlapped_spspmm(mesh, plan2)(X.values, A.values)
    assert maxdiff(got2, ref.values) < 1e-5


def test_ring_tuple_parallel_matches_spspmm(rng):
    """v5 ppermute-ring boundary exchange == single-device spspmm."""
    from pygho_tpu.parallel.tuple_parallel import (build_ring_shard_plan,
                                                   make_ring_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_ring_shard_plan(acd_p, X.nnz_pad, 8)
    assert plan.Bnd >= 1
    got = make_ring_spspmm(mesh, plan)(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5


def test_reduce_scatter_tuple_parallel_matches_spspmm(rng):
    """v6 (full-range partials + psum_scatter over ownership bands)
    equals the single-device contraction."""
    from pygho_tpu.parallel.tuple_parallel import (
        build_reduce_scatter_shard_plan, make_reduce_scatter_spspmm,
        plan_exchange_volumes)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_reduce_scatter_shard_plan(acd_p, X.nnz_pad, 8)
    got = make_reduce_scatter_spspmm(mesh, plan)(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5

    vols = plan_exchange_volumes(acd_p, X.nnz_pad, 8)
    assert vols["reduce_scatter"] == X.nnz_pad


def test_chooser_prefers_reduce_scatter_on_full_boundaries(rng):
    """With triples whose input rows scatter uniformly across blocks,
    every block's rows are read everywhere (Bnd == B): the pool gather
    can only TIE reduce_scatter's row count, and the chooser's
    tie-break picks the fused psum_scatter."""
    from pygho_tpu.parallel.tuple_parallel import (
        choose_partitioned_spspmm, plan_exchange_volumes)
    from utils import random_sparse

    n, d = 16, 8
    X, _, indX, _ = random_sparse(rng, (n, n), 0.9, (d,), nnz_pad=256)
    A, _, indA, _ = random_sparse(rng, (n, n), 0.9, (d,), nnz_pad=256)
    # synthetic fully-entangled triples: sorted targets, uniform sources
    K = 8192
    t = np.sort(rng.integers(0, X.nnz_pad, K))
    c = rng.integers(0, X.nnz_pad, K)
    dd = rng.integers(0, A.nnz_pad, K)
    acd_p = np.stack([t, c, dd]).astype(np.int64)
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    vols = plan_exchange_volumes(acd_p, X.nnz_pad, 8)
    assert vols["overlapped"] == vols["reduce_scatter"] == X.nnz_pad
    fn, which, _ = choose_partitioned_spspmm(mesh, acd_p, X.nnz_pad, "sp")
    if vols["scatter"] >= X.nnz_pad:
        assert which == "reduce_scatter", (which, vols)
    got = fn(X.values, A.values)
    assert maxdiff(got[:X.nnz_pad], ref.values) < 1e-4


def test_giant_graph_training(rng):
    """End-to-end sp-sharded NGNN training on one giant graph matches a
    single-device implementation of the same model."""
    import scipy.sparse as ssp

    from pygho_tpu.parallel.giant import (build_giant_graph_plan,
                                          init_giant_params,
                                          make_giant_graph_step)

    n, d, L = 120, 8, 2
    adj = (rng.random((n, n)) < 0.05)
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    edges = np.stack(np.nonzero(adj)).astype(np.int64)
    spd = ssp.csgraph.shortest_path(
        ssp.coo_matrix((np.ones(edges.shape[1]), (edges[0], edges[1])),
                       (n, n)).tocsr(), unweighted=True)
    ii, jj = np.nonzero(spd <= 2)
    tup = np.stack([ii, jj]).astype(np.int64)

    nnz_pad = indexing.bucket_size(tup.shape[1], 512)
    tid = indexing.pad_indices(tup, nnz_pad)
    tar, bcd = indexing.spspmm_ind(tup, 1, edges, 0)
    acd = indexing.filterind(tup, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))

    mesh = make_mesh((8,), ("sp",))
    plan = build_giant_graph_plan(acd_p, tid, nnz_pad, n, 8)
    params = init_giant_params(L, d)
    Xv = jnp.asarray(indexing.pad_values(
        rng.normal(size=(tup.shape[1], d)).astype(np.float32), nnz_pad))
    Av = jnp.asarray(rng.normal(size=(edges.shape[1], d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    loss_fn, step = make_giant_graph_step(mesh, plan, L, lr=1e-5)

    # single-device oracle of the same math
    def oracle(params):
        Xb = Xv
        a = jnp.asarray(acd_p)
        roots = jnp.where(jnp.asarray(tid[0]) < indexing.PAD_INDEX,
                          jnp.asarray(tid[0]), n)
        for lay in params["layers"]:
            h = jax.nn.relu(Xb @ lay["w"] + lay["b"])
            av = h[jnp.minimum(a[1], nnz_pad - 1)]
            bv = Av[jnp.minimum(a[2], Av.shape[0] - 1)]
            out = jax.ops.segment_sum(av * bv, a[0], nnz_pad,
                                      indices_are_sorted=True)
            Xb = Xb + out
        node_h = jax.ops.segment_sum(Xb, roots, n)
        pred = (node_h @ params["out"]["w"] + params["out"]["b"])[:, 0]
        return jnp.mean((pred - y) ** 2)

    l_sharded = float(loss_fn(params, Xv, Av, y))
    l_oracle = float(oracle(params))
    assert abs(l_sharded - l_oracle) < 1e-3 * max(1.0, abs(l_oracle)), (
        l_sharded, l_oracle)

    # a few SGD steps decrease the loss and stay finite
    p = params
    losses = []
    for _ in range(5):
        p, l = step(p, Xv, Av, y)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # gradient parity with the oracle on the first step
    g_oracle = jax.grad(oracle)(params)
    _, g_like = step(params, Xv, Av, y)  # loss only; recompute grads via diff
    # compare params after one oracle SGD step vs sharded step
    p1, _ = step(params, Xv, Av, y)
    p2 = jax.tree.map(lambda w, g: w - 1e-5 * g, params, g_oracle)
    worst = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))
    assert worst < 1e-4, worst


@pytest.mark.parametrize("strategy", ["ring", "reduce_scatter",
                                      "overlapped_fused"])
def test_giant_graph_strategies_match_overlapped(rng, strategy):
    """Every giant-graph contraction strategy yields the same loss and
    one-step parameter update as the default overlapped plan."""
    import scipy.sparse as ssp

    from pygho_tpu.parallel.giant import (build_giant_graph_plan,
                                          init_giant_params,
                                          make_giant_graph_step)

    n, d, L = 80, 8, 2
    adj = (rng.random((n, n)) < 0.07)
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    edges = np.stack(np.nonzero(adj)).astype(np.int64)
    spd = ssp.csgraph.shortest_path(
        ssp.coo_matrix((np.ones(edges.shape[1]), (edges[0], edges[1])),
                       (n, n)).tocsr(), unweighted=True)
    ii, jj = np.nonzero(spd <= 2)
    tup = np.stack([ii, jj]).astype(np.int64)
    nnz_pad = indexing.bucket_size(tup.shape[1], 512)
    tid = indexing.pad_indices(tup, nnz_pad)
    tar, bcd = indexing.spspmm_ind(tup, 1, edges, 0)
    acd_p = indexing.pad_acd(indexing.filterind(tup, tar, bcd),
                             indexing.bucket_size(
                                 indexing.filterind(tup, tar, bcd).shape[1]))

    mesh = make_mesh((8,), ("sp",))
    params = init_giant_params(L, d)
    Xv = jnp.asarray(indexing.pad_values(
        rng.normal(size=(tup.shape[1], d)).astype(np.float32), nnz_pad))
    Av = jnp.asarray(rng.normal(size=(edges.shape[1], d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    def run(strat):
        plan = build_giant_graph_plan(acd_p, tid, nnz_pad, n, 8,
                                      strategy=strat,
                                      n_edge_rows=Av.shape[0], plan_dim=d)
        loss_fn, step = make_giant_graph_step(mesh, plan, L, lr=1e-4)
        p1, l = step(params, Xv, Av, y)
        return float(l), p1

    l_ref, p_ref = run("overlapped")
    l_got, p_got = run(strategy)
    assert abs(l_got - l_ref) < 1e-4 * max(1.0, abs(l_ref))
    worst = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree.leaves(p_got),
                                jax.tree.leaves(p_ref)))
    assert worst < 1e-5, worst


def test_scatter_tuple_parallel_matches_spspmm(rng):
    """v4 (pre-reduced output bands + all_to_all) equals the
    single-device contraction; the chooser picks a valid strategy."""
    from pygho_tpu.parallel.tuple_parallel import (
        build_scatter_shard_plan, make_scatter_spspmm,
        choose_partitioned_spspmm, plan_exchange_volumes)

    n = 40
    dense = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.25)
    ind = np.stack(np.nonzero(dense)).astype(np.int64)
    nnz_pad = ((indexing.bucket_size(ind.shape[1]) + 7) // 8) * 8
    X = SparseTensor.from_numpy(
        ind, rng.normal(size=(ind.shape[1], 16)).astype(np.float32),
        (n, n), nnz_pad=nnz_pad)
    A = SparseTensor.from_numpy(
        ind, rng.normal(size=(ind.shape[1], 16)).astype(np.float32),
        (n, n), nnz_pad=nnz_pad)
    tar, bcd = indexing.spspmm_ind(ind, 1, ind, 0)
    acd = indexing.filterind(ind, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
    oracle = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_scatter_shard_plan(acd_p, nnz_pad, 8)
    got = make_scatter_spspmm(mesh, plan, "sp")(X.values, A.values)
    assert maxdiff(got[:nnz_pad], oracle.values) < 1e-4

    fn, which, vols = choose_partitioned_spspmm(mesh, acd_p, nnz_pad, "sp")
    assert which in vols and vols[which] == min(
        vols["overlapped"], vols["scatter"], vols["reduce_scatter"])
    got2 = fn(X.values, A.values)
    assert maxdiff(got2[:nnz_pad], oracle.values) < 1e-4

    # a boundary-rows cap no buffer-at-once strategy satisfies -> ring
    fn3, which3, _ = choose_partitioned_spspmm(mesh, acd_p, nnz_pad, "sp",
                                               max_boundary_rows=1)
    assert which3 == "ring"
    got3 = fn3(X.values, A.values)
    assert maxdiff(got3[:nnz_pad], oracle.values) < 1e-4


def test_scatter_prereduction_wins_on_concentrated_fanin(rng):
    """When cross-shard triples funnel into FEW output rows but read MANY
    input rows, pre-reducing outputs before the exchange moves far fewer
    rows than gathering the input boundary pool."""
    from pygho_tpu.parallel.tuple_parallel import plan_exchange_volumes

    # synthetic triples: every remote row of every shard contributes to
    # output row 0 (owner: device 0) -> Bpq=1, while device 0's boundary
    # pool must hold every remote row -> Bnd=B
    nnz_pad, P = 64, 8
    c = np.arange(8, 64, dtype=np.int64)      # all rows of devices 1..7
    a = np.zeros_like(c)                      # one target row on device 0
    d = np.zeros_like(c)
    acd_p = indexing.pad_acd(np.stack([a, c, d]), 64)
    vols = plan_exchange_volumes(acd_p, nnz_pad, P)
    assert vols["scatter"] < vols["overlapped"], vols
    assert vols["scatter"] == P * 1 and vols["overlapped"] == P * 8


def test_tensor_parallel_matches_single_device():
    """Channel-sharded (tp) train step: loss trajectory and eval match
    the single-device step (reduction-order tolerance; adam's rsqrt
    amplifies psum reorder noise in raw params, so parity is checked on
    the observable trajectory)."""
    import jax
    from flax import nnx

    from pygho_tpu.hodata import Sppretransform, collate_sparse
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import make_optimizer, make_sparse_steps
    from pygho_tpu.parallel import (make_mesh, make_tp_train_step,
                                    make_tp_eval_step)

    mk = lambda: make_sp_model("NGNN", num_layer=2, hiddim=16, seed=0,
                               mlp={"norm": "bn", "act": "silu"})
    model = mk()
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=8, seed=7)
    datas = [Sppretransform(KhopSampler, [""], keys)(g) for g in graphs]
    batch = collate_sparse(datas, keys, num_graphs=8)
    batch = {k: np.asarray(v) for k, v in batch.items()}

    m1, o1 = mk(), None
    o1 = make_optimizer(m1, 1e-3)
    train1, eval1 = make_sparse_steps()
    losses1 = [float(train1(m1, o1, batch)) for _ in range(4)]
    m1.eval()   # the tp eval step runs eval-mode BN; match it
    ev1 = np.asarray(eval1(m1, batch))

    mesh = make_mesh((4,), ("tp",), devices=jax.devices()[:4])
    m2 = mk()
    o2 = make_optimizer(m2, 1e-3)
    graphdef, state = nnx.split((m2, o2))
    step, state = make_tp_train_step(mesh, graphdef, state)
    losses2 = []
    for _ in range(4):
        state, loss = step(state, batch)
        losses2.append(float(loss))
    np.testing.assert_allclose(losses1, losses2, atol=2e-4)
    ev2 = np.asarray(make_tp_eval_step(mesh, graphdef, state)(state, batch))
    np.testing.assert_allclose(ev1, ev2, atol=2e-3)


def test_pipeline_parallel_matches_sequential_stack():
    """GPipe pipeline over "pp": loss and one-step SGD update match the
    sequential single-device stack exactly (same floats modulo scan
    ordering), and training decreases the loss."""
    import jax
    import jax.numpy as jnp

    from pygho_tpu.hodata import Sppretransform, collate_sparse
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.parallel import (make_mesh, build_pipeline_plan,
                                    init_pipeline_params,
                                    make_pipeline_step)
    from pygho_tpu.parallel.pipeline import reference_stack_loss

    model = make_sp_model("NGNN", num_layer=2, hiddim=16)
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=12, seed=3)
    datas = [Sppretransform(KhopSampler, [""], keys)(g) for g in graphs]
    M, G = 3, 4
    buckets = {}
    mk = lambda: [collate_sparse(datas[m * G:(m + 1) * G], keys,
                                 num_graphs=G, buckets=buckets)
                  for m in range(M)]
    mk()                   # size pass grows the shared buckets
    batches = mk()         # identical padded shapes
    plan = build_pipeline_plan(batches, keys[0])

    rng = np.random.default_rng(0)
    D = 16
    Xstack = jnp.asarray(
        rng.normal(size=(M, plan.nnz_pad, D)).astype(np.float32))
    Avstack = jnp.asarray(
        rng.normal(size=(M, plan.e_pad, D)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(M, G)).astype(np.float32))
    gmask = jnp.asarray(np.stack(
        [np.asarray(b["graph_mask"]) for b in batches])).astype(jnp.float32)

    Pn, lr = 4, 1e-5
    params = init_pipeline_params(Pn, 2, D, seed=1)
    mesh = make_mesh((Pn,), ("pp",), devices=jax.devices()[:Pn])
    loss_fn, step = make_pipeline_step(mesh, plan, Pn, lr=lr)

    l_pipe = float(loss_fn(params, Xstack, Avstack, y, gmask))
    l_ref = float(reference_stack_loss(params, plan, Xstack, Avstack, y,
                                       gmask))
    assert abs(l_pipe - l_ref) < 1e-4 * max(1.0, abs(l_ref))

    p2, l2 = step(params, Xstack, Avstack, y, gmask)
    g_ref = jax.grad(lambda p: reference_stack_loss(
        p, plan, Xstack, Avstack, y, gmask))(params)
    p_ref = jax.tree.map(lambda p, g: p - lr * g, params, g_ref)
    md = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p2, p_ref)))
    assert md < 1e-5, md

    losses = [float(l2)]
    for _ in range(4):
        p2, l = step(p2, Xstack, Avstack, y, gmask)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_dp_tp_composition():
    """2-D (dp, tp) mesh: dp shard_map over graphs composes with GSPMD
    channel sharding of the state — losses match the dp-only step."""
    import jax
    from pygho_tpu.parallel.tensor_parallel import tp_state_shardings

    mk = lambda: make_sp_model("NGNN", num_layer=2, hiddim=16, seed=0,
                               mlp={"norm": "bn", "act": "silu"})
    model = mk()
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=8, seed=7)
    datas = [Sppretransform(KhopSampler, [""], keys)(g) for g in graphs]
    buckets = {}
    batch = collate_sharded_sparse(datas, 4, 2, keys, buckets=buckets)

    def run(mesh, specs=None):
        m = mk()
        o = make_optimizer(m, 1e-3)
        graphdef, state = nnx.split((m, o))
        if specs is not None:
            state = jax.device_put(state, specs(state))
        train = make_dp_train_step(mesh, graphdef)
        out = []
        for _ in range(3):
            state, loss = train(state, batch)
            out.append(float(loss))
        return out

    mesh_dp = make_mesh((4,), ("dp",), devices=jax.devices()[:4])
    l_dp = run(mesh_dp)

    mesh_2d = make_mesh((4, 2), ("dp", "tp"))
    l_2d = run(mesh_2d, specs=lambda s: tp_state_shardings(s, mesh_2d, "tp"))
    np.testing.assert_allclose(l_dp, l_2d, atol=2e-4)


def test_model_pipeline_matches_single_device():
    """The REAL nnx SpModel staged through the GPipe scan (VERDICT r1
    #3): loss and one SGD step must match the unsplit single-device
    model to ~1e-5 on the 8-device CPU mesh."""
    from pygho_tpu.hodata.sp_data import collate_sparse
    from pygho_tpu.models.training import stack_batches
    from pygho_tpu.parallel import (make_model_pipeline_step,
                                    merge_conv_stages,
                                    reference_model_pipeline_loss)

    P_STAGES, M, G = 4, 3, 4
    model = make_sp_model("NGNN", num_layer=8, hiddim=16, seed=3,
                          mlp={"norm": "ln", "act": "silu"})
    model.eval()   # deterministic (no dropout state consumption)
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=M * G, seed=11)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    buckets = {}
    mkb = lambda: [collate_sparse(datas[m * G:(m + 1) * G], keys,
                                  num_graphs=G, buckets=buckets)
                   for m in range(M)]
    mkb()                       # warm shared buckets -> identical shapes
    sbatch = jax.tree.map(jnp.asarray, stack_batches(mkb()))

    mesh = make_mesh((P_STAGES,), ("pp",),
                     devices=jax.devices()[:P_STAGES])
    loss_fn, step, params = make_model_pipeline_step(
        mesh, model, P_STAGES, lr=1e-2)
    loss_pp = float(loss_fn(params, sbatch))
    loss_ref = float(reference_model_pipeline_loss(model, sbatch))
    assert abs(loss_pp - loss_ref) < 1e-5, (loss_pp, loss_ref)

    # one SGD step through the pipeline == one SGD step on the unsplit
    # model (same grads): compare post-step losses
    new_params, l0 = step(params, sbatch)
    loss_pp_after = float(loss_fn(new_params, sbatch))

    # oracle step: grads of the averaged-microbatch loss on the
    # single-device model state
    graphdef, state = nnx.split(model)

    def ref_loss(state):
        m = nnx.merge(graphdef, state)
        return reference_model_pipeline_loss(m, sbatch)

    g = jax.grad(ref_loss)(state)
    new_state = jax.tree.map(lambda p, gg: p - 1e-2 * gg, state, g)
    nnx.update(model, new_state)
    loss_ref_after = float(reference_model_pipeline_loss(model, sbatch))
    assert abs(loss_pp_after - loss_ref_after) < 1e-5, (
        loss_pp_after, loss_ref_after)
    assert loss_pp_after < loss_pp  # it actually learned

    # merge_conv_stages writes staged weights back for local eval
    model2 = make_sp_model("NGNN", num_layer=8, hiddim=16, seed=3,
                           mlp={"norm": "ln", "act": "silu"})
    model2.eval()
    gd2, st2 = nnx.split(model2)
    nnx.update(model2, jax.tree.map(np.asarray, new_params["trunk"]))
    merge_conv_stages(model2, new_params["conv"])
    loss_merged = float(reference_model_pipeline_loss(model2, sbatch))
    assert abs(loss_merged - loss_pp_after) < 1e-5


def test_strategy_chooser_at_giant_scale():
    """Scale-stress (VERDICT r1 #8): run the partitioned-spspmm chooser
    and the v3/v4/v5/v6 strategies on the 8-dev CPU mesh at >=100k
    tuples (community-structured giant graph), where the crossover
    logic actually matters.  Every strategy must agree with the
    single-device contraction."""
    from pygho_tpu.hodata.graph import Graph, rcm_reorder
    from pygho_tpu.parallel import choose_partitioned_spspmm
    from pygho_tpu.parallel.tuple_parallel import (
        plan_exchange_volumes,
        build_overlapped_shard_plan, make_overlapped_spspmm,
        build_scatter_shard_plan, make_scatter_spspmm,
        build_ring_shard_plan, make_ring_spspmm,
        build_reduce_scatter_shard_plan, make_reduce_scatter_spspmm)

    rng = np.random.default_rng(0)
    communities, csize = 64, 250
    n = communities * csize
    edges = []
    for ci in range(communities):
        base = ci * csize
        u = rng.integers(0, csize, csize * 3) + base
        v = rng.integers(0, csize, csize * 3) + base
        edges.append(np.stack([u, v]))
        u2 = rng.integers(0, csize, 3) + base
        v2 = rng.integers(0, csize, 3) + \
            ((ci + 1) % communities) * csize
        edges.append(np.stack([u2, v2]))
    ei = np.concatenate(edges, axis=1)
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    g = rcm_reorder(Graph(x=np.zeros((n, 1), np.int64), edge_index=ei,
                          edge_attr=None).coalesced())
    ii = np.concatenate([np.arange(n), g.edge_index[0]])
    jj = np.concatenate([np.arange(n), g.edge_index[1]])
    tup, _ = indexing.coalesce(np.stack([ii, jj]))
    assert tup.shape[1] >= 100_000, tup.shape
    tar, bcd = indexing.spspmm_ind(tup, 1, g.edge_index, 0)
    acd = indexing.filterind(tup, tar, bcd)

    P = 8
    d = 8
    nnz_pad = ((indexing.bucket_size(tup.shape[1]) + P - 1) // P) * P
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
    Xv = rng.normal(size=(nnz_pad, d)).astype(np.float32)
    Av = rng.normal(size=(g.num_edges, d)).astype(np.float32)
    X = SparseTensor(jnp.asarray(indexing.pad_indices(tup, nnz_pad)),
                     jnp.asarray(Xv),
                     jnp.asarray(tup.shape[1], jnp.int32), (n, n))
    A = SparseTensor(jnp.asarray(
        indexing.pad_indices(g.edge_index, g.num_edges)),
        jnp.asarray(Av), jnp.asarray(g.num_edges, jnp.int32), (n, n))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((P,), ("sp",))
    vols = plan_exchange_volumes(acd_p, nnz_pad, P)
    # at this scale the numbers must be meaningfully distinct and the
    # chooser must pick the smallest-volume fitting strategy
    run, name, vols2 = choose_partitioned_spspmm(mesh, acd_p, nnz_pad)
    assert vols2 == vols
    best = min(("reduce_scatter", "overlapped", "scatter"),
               key=lambda k: (vols[k], {"reduce_scatter": 0,
                                        "overlapped": 1, "scatter": 2}[k]))
    assert name == best, (name, vols)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-4

    # every strategy agrees at scale
    for build, make in (
            (build_overlapped_shard_plan, make_overlapped_spspmm),
            (build_scatter_shard_plan, make_scatter_spspmm),
            (build_ring_shard_plan, make_ring_spspmm),
            (build_reduce_scatter_shard_plan,
             make_reduce_scatter_spspmm)):
        plan = build(acd_p, nnz_pad, P)
        out = make(mesh, plan)(X.values, A.values)
        assert maxdiff(out, ref.values) < 1e-4

    # cap forces the ring fallback
    run_r, name_r, _ = choose_partitioned_spspmm(
        mesh, acd_p, nnz_pad, max_boundary_rows=1)
    assert name_r == "ring"
    assert maxdiff(run_r(X.values, A.values), ref.values) < 1e-4


def test_chooser_matches_measured_winners():
    """The chooser must reproduce the measured strategy outcome on the
    bench_scaling shapes (BENCHMARKS.md "Scaling harness", 2026-08-20):
    reduce_scatter — the only strategy whose exchange volume is orders
    of magnitude larger — was the measured loser on every shape, and
    the other three tied within noise.  So the chooser must (a) never
    pick reduce_scatter on these shapes and (b) pick from the measured
    tie group, and the volume model must reproduce the asymmetry that
    made reduce_scatter lose."""
    import bench_scaling as bs
    from pygho_tpu.parallel import choose_partitioned_spspmm
    from pygho_tpu.parallel.tuple_parallel import plan_exchange_volumes

    P = 8
    mesh = make_mesh((P,), ("sp",))
    # smaller instances of the same generators (keep the test fast);
    # the structural property (a and c share the subgraph index) is
    # scale-free
    shapes = {
        "community": bs.community_graph(communities=24, csize=40),
        "ring_lattice": bs.ring_lattice_graph(n=1024, k=8),
        "expander": bs.expander_graph(n=256, deg=48),
    }
    tie_group = {"overlapped", "scatter", "ring"}
    for name, (ei, n) in shapes.items():
        g, tup, acd = bs.hop1_instance(ei, n)
        nnz_pad = ((indexing.bucket_size(tup.shape[1]) + P - 1) // P) * P
        acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
        vols = plan_exchange_volumes(acd_p, nnz_pad, P)
        # the measured-loser asymmetry: rs moves >=20x the rows of the
        # boundary strategies on every one of these shapes
        assert vols["reduce_scatter"] >= 20 * vols["overlapped"], (
            name, vols)
        assert vols["reduce_scatter"] >= 20 * vols["scatter"], (name, vols)
        _, chosen, _ = choose_partitioned_spspmm(mesh, acd_p, nnz_pad)
        assert chosen in tie_group, (name, chosen, vols)
