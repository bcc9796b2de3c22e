"""Model-level (L5) tests: every conv trains end-to-end on synthetic data,
loss decreases, eval is deterministic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from pygho_tpu.hodata import (Sppretransform, Mapretransform, SpDataloader,
                              MaDataloader, ParallelPreprocessDataset)
from pygho_tpu.hodata.sp_sampler import KhopSampler, I2Sampler
from pygho_tpu.hodata.ma_sampler import spdsampler
from pygho_tpu.hodata.datasets import synthetic_zinc
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import make_sp_model, make_ma_model
from pygho_tpu.models.training import (make_sparse_steps, make_dense_steps,
                                       make_optimizer, cosine_warm_restarts)
import jax

MLPD = {"norm": "bn", "act": "silu", "dp": 0.0}


def _sp_loader(conv, n_graphs=24, bs=8, hop=2):
    model = make_sp_model(conv, num_layer=2, hiddim=16, mlp=dict(MLPD))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=n_graphs)
    sampler = I2Sampler if conv == "I2GNN" else KhopSampler
    pre = Sppretransform(sampler, [""], keys)
    datas = [pre(g) for g in graphs]
    dl = SpDataloader(datas, batch_size=bs, keys=keys, shuffle=True,
                      drop_last=True, device_put=False, prefetch=0, seed=1)
    return model, dl


@pytest.mark.parametrize("conv", ["NGNN", "SSWL", "DSSGNN", "GNNAK", "SUN",
                                  "PPGN", "I2GNN"])
def test_sparse_model_trains(conv):
    model, dl = _sp_loader(conv)
    opt = make_optimizer(model, 1e-2)
    train_step, eval_step = make_sparse_steps()
    losses = []
    for _ in range(4):
        for batch in dl:
            losses.append(float(train_step(model, opt, batch)))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


@pytest.mark.parametrize("conv", ["NGNN", "PPGN", "SSWL"])
def test_dense_model_trains(conv):
    model = make_ma_model(conv, num_layer=2, hiddim=16, mlp=dict(MLPD))
    graphs = synthetic_zinc("train", n_graphs=24)
    pre = Mapretransform(spdsampler, [""])
    datas = [pre(g) for g in graphs]
    dl = MaDataloader(datas, batch_size=8, shuffle=True, drop_last=True,
                      device_put=False, prefetch=0, seed=1)
    opt = make_optimizer(model, 1e-2)
    train_step, eval_step = make_dense_steps()
    losses = []
    for _ in range(4):
        for batch in dl:
            losses.append(float(train_step(model, opt, batch)))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_remat_matches_nonremat():
    """remat=True must be numerics-neutral (same loss and gradients up
    to re-association) for BOTH model families; it only changes what
    the backward tape stores.  MaModel remat is r5 (the dense-DD step
    is HBM-bound); the MaskedTensor __post_init__ guard relaxation it
    needed (nnx.remat's clear_non_graph_nodes rebuilds registered
    dataclasses with None children) is exercised implicitly here."""
    from pygho_tpu.hodata import collate_dense
    from pygho_tpu.hodata.ma_data import batch_to_dense_dict
    from pygho_tpu.hodata.sp_data import collate_sparse, batch_to_sparse_dict
    from pygho_tpu.models.training import masked_l1_loss

    graphs = synthetic_zinc("train", n_graphs=8)

    # dense (PPGN: the bmm path remat was added for)
    madatas = [Mapretransform(spdsampler, [""])(g) for g in graphs]
    mbatch = {k: jnp.asarray(np.asarray(v))
              for k, v in collate_dense(madatas, [""],
                                        num_graphs=8).items()}

    def ma_loss(model):
        dd = batch_to_dense_dict(mbatch, ("",))
        return masked_l1_loss(model(dd), mbatch["y"],
                              mbatch["graph_mask"])

    for conv, fam in (("PPGN", "ma"), ("NGNN", "sp")):
        if fam == "ma":
            m0 = make_ma_model(conv, num_layer=2, hiddim=16,
                               mlp=dict(MLPD))
            m1 = make_ma_model(conv, num_layer=2, hiddim=16,
                               remat=True, mlp=dict(MLPD))
            loss_fn = ma_loss
        else:
            m0 = make_sp_model(conv, num_layer=2, hiddim=16,
                               mlp=dict(MLPD))
            keys = parse_precomputekey(m0)
            datas = [Sppretransform(KhopSampler, [""], keys)(g)
                     for g in graphs]
            sbatch = {k: jnp.asarray(np.asarray(v)) for k, v in
                      collate_sparse(datas, keys, buckets={}).items()}
            m1 = make_sp_model(conv, num_layer=2, hiddim=16,
                               remat=True, mlp=dict(MLPD))

            def loss_fn(model):
                dd = batch_to_sparse_dict(sbatch, ("",))
                return masked_l1_loss(model(dd), sbatch["y"],
                                      sbatch["graph_mask"])
        l0, g0 = nnx.value_and_grad(loss_fn)(m0)
        l1, g1 = nnx.value_and_grad(loss_fn)(m1)
        assert np.allclose(float(l0), float(l1), rtol=1e-6), (conv, l0, l1)
        flat0 = jax.tree.leaves(g0)
        flat1 = jax.tree.leaves(g1)
        assert len(flat0) == len(flat1)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)


def test_eval_deterministic():
    model, dl = _sp_loader("NGNN")
    _, eval_step = make_sparse_steps()
    model.eval()
    batch = next(iter(dl))
    a = np.asarray(eval_step(model, batch))
    b = np.asarray(eval_step(model, batch))
    assert np.array_equal(a, b), "same batch twice must be bitwise equal"


def test_cosine_schedule():
    sched = cosine_warm_restarts(1e-3, T0=10, steps_per_epoch=5, K=1.0)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    # mid-cycle: half amplitude
    assert abs(float(sched(25)) - 0.5e-3) < 1e-6
    # after first restart: amplitude decayed by 1/(1+K)
    assert abs(float(sched(50)) - 0.5e-3) < 1e-6


def test_ngat_trains():
    model, dl = _sp_loader("NGAT")
    opt = make_optimizer(model, 1e-2)
    train_step, _ = make_sparse_steps()
    losses = []
    for _ in range(3):
        for batch in dl:
            losses.append(float(train_step(model, opt, batch)))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_multilaunch_strip_plans_stack_across_batches(monkeypatch):
    """Regression (r4, PPGN-sparse converged run): multi-launch
    StripPlans from different batches of one padding bucket must share
    launch_splits (the loader's common per-block step tables) so
    group_stack_batches can stack them leaf-wise; a batch whose meta
    still diverges lands in its own group instead of crashing."""
    import pygho_tpu.kernels.strip_spspmm as ss
    from pygho_tpu.models.training import group_stack_batches

    monkeypatch.setattr(ss, "_MAX_GRID_STEPS", 6)    # force splits
    model = make_sp_model("PPGN", num_layer=2, hiddim=128,
                          mlp=dict(MLPD))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=32)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    dl = SpDataloader(datas, 8, keys, shuffle=True, drop_last=True,
                      build_plans=True, plan_dim=128,
                      device_put=False, prefetch=0, seed=3)
    list(dl)                       # warm buckets + step tables
    batches = list(dl)
    plan_key = next(k for k in batches[0] if k.endswith("___plan"))
    assert len(batches[0][plan_key][0].launch_splits) > 1, \
        "test needs multi-launch plans"
    groups = group_stack_batches(batches)
    # after warming, all same-bucket batches share plan meta: the
    # number of groups equals the number of distinct shape buckets
    stacked_steps = sum(jax.tree.leaves(g)[0].shape[0] for g in groups)
    assert stacked_steps == len(batches)
    # and the stacked scan trains
    from pygho_tpu.models.training import (make_chained_train,
                                           make_optimizer)

    opt = make_optimizer(model, 1e-3)
    _, scan_fn, _ = make_chained_train(mode="sparse")
    losses = np.asarray(scan_fn(model, opt, groups[0]))
    assert np.isfinite(losses).all()


def test_ngat_nonempty_hoist_parity():
    """The loader-precomputed nonempty mask (attention plans path) gives
    bit-identical forward outputs to the conv's in-layer segment-reduce
    fallback — the r4 per-layer hoist changes cost, not semantics."""
    model = make_sp_model("NGAT", num_layer=2, hiddim=128,
                          mlp=dict(MLPD))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=8)
    pre = Sppretransform(KhopSampler, [""], keys)
    dl = SpDataloader([pre(g) for g in graphs], 8, keys,
                      build_plans=True, plan_dim=128,
                      attention_plans=True, device_put=False, prefetch=0)
    batch = next(iter(dl))
    key = keys[0]
    assert f"{key}___nonempty" in batch, sorted(batch)[:8]
    from pygho_tpu.hodata.sp_data import batch_to_sparse_dict

    model.eval()
    out_hoisted = model(batch_to_sparse_dict(batch, ("",)))
    stripped = {k: v for k, v in batch.items()
                if not k.endswith("___nonempty")}
    out_fallback = model(batch_to_sparse_dict(stripped, ("",)))
    assert np.array_equal(np.asarray(out_hoisted),
                          np.asarray(out_fallback))


def test_bf16_model_trains():
    import jax.numpy as jnp

    model = make_sp_model("NGNN", num_layer=2, hiddim=16,
                          dtype=jnp.bfloat16, mlp=dict(MLPD))
    from pygho_tpu.honn import parse_precomputekey
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=24)
    pre = Sppretransform(KhopSampler, [""], keys)
    dl = SpDataloader([pre(g) for g in graphs], 8, keys, shuffle=True,
                      drop_last=True, device_put=False, prefetch=0, seed=1)
    opt = make_optimizer(model, 1e-2)
    ts, _ = make_sparse_steps()
    losses = [float(ts(model, opt, b)) for _ in range(4) for b in dl]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params stayed f32 (mixed precision contract)
    from flax import nnx
    for leaf in jax.tree.leaves(nnx.state(model, nnx.Param)):
        assert leaf.dtype == jnp.float32


def test_sd_mode_model_trains():
    model = make_ma_model("NGNN", num_layer=2, hiddim=16, mode="SD",
                          aggr="max", mlp=dict(MLPD))
    graphs = synthetic_zinc("train", n_graphs=24)
    pre = Mapretransform(spdsampler, [""])
    dl = MaDataloader([pre(g) for g in graphs], 8, denseadj=False,
                      shuffle=True, drop_last=True, device_put=False,
                      prefetch=0, seed=1)
    opt = make_optimizer(model, 1e-2)
    ts, _ = make_dense_steps()
    losses = [float(ts(model, opt, b)) for _ in range(4) for b in dl]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sd_mode_fused_plans_match_unfused():
    """SD model forward with loader-built fused spmamm plans == without
    (hidden dim 128 so the fused route actually engages)."""
    from flax import nnx

    from pygho_tpu.honn import parse_spmamm_dims
    from pygho_tpu.hodata.ma_data import batch_to_dense_dict
    from pygho_tpu.backend.spmamm import set_dense_spmamm

    model = make_ma_model("NGNN", num_layer=2, hiddim=128, mode="SD",
                          aggr="sum", mlp=dict(MLPD))
    dims = parse_spmamm_dims(model)
    assert (1, 2) in dims
    graphs = synthetic_zinc("train", n_graphs=8)
    pre = Mapretransform(spdsampler, [""])
    datas = [pre(g) for g in graphs]
    dl0 = MaDataloader(datas, 8, denseadj=False, device_put=False,
                       prefetch=0)
    dl1 = MaDataloader(datas, 8, denseadj=False, device_put=False,
                       prefetch=0, build_plans=True, plan_dims=dims,
                       plan_geometry=(128, 256, 128), plan_dim=128)
    b0, b1 = next(iter(dl0)), next(iter(dl1))
    assert any(k.endswith("___plan") for k in b1), list(b1)
    model.eval()
    set_dense_spmamm(False)
    try:
        p0 = model(batch_to_dense_dict(b0))
        p1 = model(batch_to_dense_dict(b1))
    finally:
        set_dense_spmamm(True)
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() < 1e-3


def test_sd_mode_strip_plans_match_unfused():
    """MaDataloader(plan_kind='strip') builds StripPlan triples for the
    SD spmamm contractions; model forward matches the unfused path."""
    from pygho_tpu.honn import parse_spmamm_dims
    from pygho_tpu.hodata.ma_data import batch_to_dense_dict
    from pygho_tpu.backend.spmamm import set_dense_spmamm
    from pygho_tpu.kernels.strip_spspmm import StripPlan

    model = make_ma_model("NGNN", num_layer=2, hiddim=128, mode="SD",
                          aggr="sum", mlp=dict(MLPD))
    dims = parse_spmamm_dims(model)
    graphs = synthetic_zinc("train", n_graphs=8)
    pre = Mapretransform(spdsampler, [""])
    datas = [pre(g) for g in graphs]
    dl0 = MaDataloader(datas, 8, denseadj=False, device_put=False,
                       prefetch=0)
    dl1 = MaDataloader(datas, 8, denseadj=False, device_put=False,
                       prefetch=0, build_plans=True, plan_dims=dims,
                       plan_geometry=(64, 128, 256, 128, 128),
                       plan_dim=128, plan_kind="strip")
    b0, b1 = next(iter(dl0)), next(iter(dl1))
    pk = [k for k in b1 if k.endswith("___plan")]
    assert pk, list(b1)
    assert all(isinstance(p, StripPlan) for p in b1[pk[0]])
    model.eval()
    set_dense_spmamm(False)
    try:
        p0 = model(batch_to_dense_dict(b0))
        p1 = model(batch_to_dense_dict(b1))
    finally:
        set_dense_spmamm(True)
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() < 1e-3


def test_dense_classification_steps():
    from pygho_tpu.models.training import make_dense_classification_steps

    # 2-class labels from thresholded y
    graphs = synthetic_zinc("train", n_graphs=16)
    for g in graphs:
        g.y = np.array([int(g.y[0] > 1.0)], dtype=np.int64)
    model = make_ma_model("NGNN", num_tasks=2, num_layer=1, hiddim=16,
                          mlp=dict(MLPD))
    pre = Mapretransform(spdsampler, [""])
    dl = MaDataloader([pre(g) for g in graphs], 8, device_put=False,
                      prefetch=0)
    opt = make_optimizer(model, 1e-2)
    ts, ev = make_dense_classification_steps()
    l = float(ts(model, opt, next(iter(dl))))
    assert np.isfinite(l)
    model.eval()
    res = np.asarray(ev(model, next(iter(dl))))
    assert res[1] == 8.0


def test_chained_train_matches_python_loop():
    """scan/fori_loop chained training == a python loop of train_step
    (same per-step losses, same final loss on a held batch)."""
    from pygho_tpu.models.training import (make_chained_sparse_train,
                                           stack_batches)

    model_a, dl = _sp_loader("NGNN", n_graphs=16, bs=8)
    model_b = make_sp_model("NGNN", num_layer=2, hiddim=16,
                            mlp=dict(MLPD))
    batches = list(dl)
    opt_a = make_optimizer(model_a, 1e-2)
    opt_b = make_optimizer(model_b, 1e-2)
    train_step, eval_step = make_sparse_steps()

    ref_losses = [float(train_step(model_a, opt_a, b)) for b in batches]
    chain_fn, scan_fn, _ = make_chained_sparse_train()
    losses = np.asarray(scan_fn(model_b, opt_b, stack_batches(batches)))
    assert np.abs(losses - np.asarray(ref_losses)).max() < 1e-5, (
        losses, ref_losses)
    model_a.eval(), model_b.eval()
    ea = np.asarray(eval_step(model_a, batches[0]))
    eb = np.asarray(eval_step(model_b, batches[0]))
    assert np.abs(ea - eb).max() < 1e-4

    # fori_loop same-batch variant runs and decreases the loss
    model_b.train()
    l0 = float(train_step(model_b, opt_b, batches[0]))
    lN = float(chain_fn(model_b, opt_b, batches[0], 5))
    assert np.isfinite(lN) and lN < l0


def test_perm_scan_matches_python_loop():
    """Device-side epoch reshuffle (perm_scan over resident stacked
    batches) == a python loop over the same batches in permuted order;
    plan pytrees stack and slice through the scan."""
    from pygho_tpu.models.training import (make_chained_sparse_train,
                                           stack_batches)

    model_a, _ = _sp_loader("NGNN", n_graphs=16, bs=8)
    model_b = make_sp_model("NGNN", num_layer=2, hiddim=16,
                            mlp=dict(MLPD))
    # d=16 < 128 so the fused route falls back, but the plan pytrees
    # still ride the batch dict through stacking and the scan slice
    keys = parse_precomputekey(model_a)
    graphs = synthetic_zinc("train", n_graphs=16)
    pre = Sppretransform(KhopSampler, [""], keys)
    dl = SpDataloader([pre(g) for g in graphs], 8, keys, device_put=False,
                      prefetch=0, build_plans=True,
                      plan_geometry=(128, 256, 128), plan_dim=16)
    list(dl)             # warm the padding buckets
    batches = list(dl)   # second pass: uniform shapes within buckets
    assert any(k.endswith("___plan") for k in batches[0])
    perm = np.array([1, 0])

    opt_a = make_optimizer(model_a, 1e-2)
    opt_b = make_optimizer(model_b, 1e-2)
    train_step, _ = make_sparse_steps()
    ref = [float(train_step(model_a, opt_a, batches[p])) for p in perm]
    _, _, perm_scan_fn = make_chained_sparse_train()
    got = np.asarray(perm_scan_fn(model_b, opt_b, stack_batches(batches),
                                  perm))
    assert np.abs(got - np.asarray(ref)).max() < 1e-5, (got, ref)


def test_chained_eval_and_dense_chain():
    """Chained eval accumulates the same [sum, count] as per-batch
    eval_step; dense-mode chained training matches the python loop."""
    from pygho_tpu.models.training import (make_chained_train,
                                           make_chained_eval,
                                           group_stack_batches)
    from pygho_tpu.hodata.datasets import synthetic_zinc

    graphs = synthetic_zinc("train", n_graphs=16)
    pre = Mapretransform(spdsampler, [""])
    datas = [pre(g) for g in graphs]
    dl = MaDataloader(datas, batch_size=8, shuffle=False, drop_last=True,
                      device_put=False, prefetch=0)
    batches = list(dl)
    model_a = make_ma_model("NGNN", num_layer=2, hiddim=16, mlp=dict(MLPD))
    model_b = make_ma_model("NGNN", num_layer=2, hiddim=16, mlp=dict(MLPD))
    train_step, eval_step = make_dense_steps()
    opt_a = make_optimizer(model_a, 1e-2)
    opt_b = make_optimizer(model_b, 1e-2)

    ref_losses = [float(train_step(model_a, opt_a, b)) for b in batches]
    _, scan_fn, _ = make_chained_train(mode="dense")
    got = [float(l) for g in group_stack_batches(batches)
           for l in np.asarray(scan_fn(model_b, opt_b, g))]
    assert np.abs(np.array(got) - np.array(ref_losses)).max() < 1e-5

    model_a.eval()
    tot = np.zeros(2)
    for b in batches:
        tot += np.asarray(eval_step(model_a, b))
    chained_eval = make_chained_eval(mode="dense")
    ctot = np.zeros(2)
    for g in group_stack_batches(batches):
        ctot += np.asarray(chained_eval(model_a, g))
    assert np.abs(tot - ctot).max() < 1e-3, (tot, ctot)


def test_group_stack_batches_mixed_buckets():
    """Mixed-bucket epochs: stack_batches raises a clear error, and
    group_stack_batches partitions by shape so every group scans."""
    from pygho_tpu.models.training import (make_chained_sparse_train,
                                           stack_batches,
                                           group_stack_batches)

    model, dl = _sp_loader("NGNN", n_graphs=32, bs=8)
    batches = list(dl)
    fake = {k: (np.zeros((3,) + np.asarray(v).shape[1:],
                         np.asarray(v).dtype) if k == "x" else v)
            for k, v in batches[0].items()}
    with pytest.raises(ValueError, match="padding bucket"):
        stack_batches([batches[0], fake])

    groups = group_stack_batches(batches + [fake])
    assert sum(g["x"].shape[0] for g in groups) == len(batches) + 1
    opt = make_optimizer(model, 1e-2)
    _, scan_fn, _ = make_chained_sparse_train()
    for g in group_stack_batches(batches):
        assert np.isfinite(np.asarray(scan_fn(model, opt, g))).all()


def test_rcm_relabel_permutation_exact():
    """Sppretransform(relabel="rcm") must be a pure node relabeling:
    identical tuple multiset (tuple ids mapped through the permutation,
    tuplefeat equal), identical acd row count, and the graph-level model
    output equal to float tolerance (the readout is permutation
    invariant).  This is the correctness guard for the giant-graph
    locality lever (BENCHMARKS.md "Giant-graph locality")."""
    from functools import partial

    from pygho_tpu.hodata.graph import Graph
    from pygho_tpu.hodata.sp_data import collate_sparse

    rng = np.random.default_rng(3)
    # two communities with deliberately shuffled labels
    n, cs = 24, 12
    lab = rng.permutation(n)
    edges = []
    for ci in range(2):
        u = rng.integers(0, cs, cs * 3) + ci * cs
        v = rng.integers(0, cs, cs * 3) + ci * cs
        edges.append(np.stack([lab[u], lab[v]]))
    edges.append(np.stack([[lab[0]], [lab[cs]]]))
    ei = np.concatenate(edges, axis=1)
    ei = ei[:, ei[0] != ei[1]]
    ei = np.concatenate([ei, ei[::-1]], axis=1)
    g = Graph(x=np.arange(n, dtype=np.int64).reshape(n, 1),
              edge_index=ei,
              edge_attr=np.ones((ei.shape[1], 1), np.int64),
              y=np.asarray([1.5], np.float32))

    keys = [f"X___X___1___A___0"]
    pre0 = Sppretransform(partial(KhopSampler, hop=2), [""], keys)
    pre1 = Sppretransform(partial(KhopSampler, hop=2), [""], keys,
                          relabel="rcm")
    d0, d1 = pre0(g), pre1(g)

    # node features are the original labels -> recover the permutation
    perm = d1["x"][:, 0]              # new row i held original label perm[i]
    assert sorted(perm) == list(range(n))
    assert np.array_equal(np.sort(perm[d1["edge_index"]], axis=0).T.tolist(),
                          np.sort(d0["edge_index"], axis=0).T.tolist())

    # tuple multiset: map relabeled tuple ids back, compare as sorted sets
    def canon(tid, tf):
        order = np.lexsort((tid[1], tid[0]))
        return tid[:, order], tf[order]
    t0, f0 = canon(d0["tupleid"], d0["tuplefeat"])
    t1, f1 = canon(perm[d1["tupleid"]], d1["tuplefeat"])
    assert np.array_equal(t0, t1)
    assert np.array_equal(f0, f1)
    assert d0["X___X___1___A___0___acd"].shape == \
        d1["X___X___1___A___0___acd"].shape

    # graph-level model output is invariant
    model = make_sp_model("NGNN", num_layer=2, hiddim=16,
                          mlp={"norm": "none", "act": "silu"})
    model.eval()
    from pygho_tpu.hodata.sp_data import batch_to_sparse_dict
    preds = []
    for d in (d0, d1):
        batch = collate_sparse([d], keys, num_graphs=1)
        preds.append(np.asarray(model(batch_to_sparse_dict(batch))))
    assert np.abs(preds[0] - preds[1]).max() < 2e-5, preds


def test_bf16_dense_model_trains():
    """MaModel(dtype=bf16): the dense-DD analog of the sparse mixed
    precision path — (b,n,n,d) einsums in bf16, params f32, loss
    finite and decreasing, eval output close to the f32 model."""
    import jax.numpy as jnp

    graphs = synthetic_zinc("train", n_graphs=16)
    pre = Mapretransform(spdsampler, [""])
    datas = [pre(g) for g in graphs]
    dl = MaDataloader(datas, 8, shuffle=True, drop_last=True,
                      device_put=False, prefetch=0, seed=1)

    model = make_ma_model("PPGN", num_layer=2, hiddim=16,
                          dtype=jnp.bfloat16, mlp=dict(MLPD))
    opt = make_optimizer(model, 1e-2)
    ts, _ = make_dense_steps()
    losses = [float(ts(model, opt, b)) for _ in range(4) for b in dl]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for leaf in jax.tree.leaves(nnx.state(model, nnx.Param)):
        assert leaf.dtype == jnp.float32

    # same seed f32 vs bf16: eval outputs agree to bf16 tolerance
    from pygho_tpu.hodata.ma_data import batch_to_dense_dict
    m32 = make_ma_model("PPGN", num_layer=2, hiddim=16, seed=3,
                        mlp={"norm": "none", "act": "silu"})
    mbf = make_ma_model("PPGN", num_layer=2, hiddim=16, seed=3,
                        dtype=jnp.bfloat16,
                        mlp={"norm": "none", "act": "silu"})
    m32.eval(), mbf.eval()
    b0 = next(iter(dl))
    p32 = np.asarray(m32(batch_to_dense_dict(b0)))
    pbf = np.asarray(mbf(batch_to_dense_dict(b0)))
    assert pbf.dtype == np.float32
    scale = max(np.abs(p32).max(), 1e-3)
    assert np.abs(p32 - pbf).max() / scale < 0.1, (p32, pbf)


def test_unknown_conv_and_aggr_raise_valueerror():
    """Surface errors fail early with actionable messages: an unknown
    conv name lists the available convs; an unknown aggr is rejected at
    operator construction, not first reduce."""
    with pytest.raises(ValueError, match="NOPE.*available"):
        make_sp_model("NOPE", num_layer=1, hiddim=8)
    with pytest.raises(ValueError, match="NOPE.*available"):
        make_ma_model("NOPE", num_layer=1, hiddim=8)
    from pygho_tpu.honn.sp_operator import OpMessagePassing
    with pytest.raises(ValueError, match="bogus"):
        OpMessagePassing(aggr="bogus")
