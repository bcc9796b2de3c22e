"""Property/fuzz tests: random instances across shapes, densities and
geometries, checked against dense oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor
from pygho_tpu.backend.spspmm import spspmm
from pygho_tpu.backend.spmm import spmm
from pygho_tpu.kernels import build_spspmm_plans, fused_spspmm
from pygho_tpu.kernels.fused_spspmm import build_chunk_plan, fused_contract

from utils import maxdiff


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_spspmm_random_instances(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(5, 40))
    density = float(rng.uniform(0.05, 0.6))
    d = int(rng.choice([1, 3, 8]))
    dense_X = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    dense_A = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    iX = np.stack(np.nonzero(dense_X)).astype(np.int64)
    iA = np.stack(np.nonzero(dense_A)).astype(np.int64)
    if iX.shape[1] == 0 or iA.shape[1] == 0:
        return
    vX = np.repeat(dense_X[tuple(iX)][:, None], d, 1).astype(np.float32)
    vA = np.repeat(dense_A[tuple(iA)][:, None], d, 1).astype(np.float32)
    X = SparseTensor.from_numpy(iX, vX, (n, n), is_coalesced=True)
    A = SparseTensor.from_numpy(iA, vA, (n, n), is_coalesced=True)
    tar, bcd = indexing.spspmm_ind(iX, 1, iA, 0)
    acd = indexing.filterind(iX, tar, bcd)
    acd_p = jnp.asarray(indexing.pad_acd(
        acd, indexing.bucket_size(max(acd.shape[1], 1))))
    out = spspmm(X, 1, A, 0, "sum", acd=acd_p, tarX=X)
    full = (dense_X @ dense_A)
    expect = np.zeros((iX.shape[1], d), np.float32)
    expect[:] = full[tuple(iX)][:, None]
    assert maxdiff(np.asarray(out.values)[: iX.shape[1]], expect) < 1e-4


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fused_vs_xla(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(12, 48))
    density = float(rng.uniform(0.1, 0.5))
    geom = [(128, 128, 128), (256, 192, 128), (64, 256, 64),
            (512, 320, 512)][seed % 4]
    dense = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    ij = np.nonzero(dense)
    ind = np.stack(ij).astype(np.int64)
    if ind.shape[1] < 4:
        return
    nnz_pad = indexing.bucket_size(ind.shape[1])
    D = 128
    X = SparseTensor.from_numpy(
        ind, rng.normal(size=(ind.shape[1], D)).astype(np.float32), (n, n),
        nnz_pad=nnz_pad)
    A = SparseTensor.from_numpy(
        ind, rng.normal(size=(ind.shape[1], D)).astype(np.float32), (n, n),
        nnz_pad=nnz_pad)
    tar, bcd = indexing.spspmm_ind(ind, 1, ind, 0)
    acd = indexing.filterind(ind, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)
    C, R, S = geom
    fwd, dxp, dap = build_spspmm_plans(acd_p, nnz_pad, nnz_pad, nnz_pad,
                                       C, R, S)
    got = fused_spspmm(X.values, A.values, fwd, dxp, dap, True)[:nnz_pad]
    assert maxdiff(got, ref.values) < 1e-4, geom
    # grads too
    g1 = jax.grad(lambda xv: (fused_spspmm(
        xv, A.values, fwd, dxp, dap, True)[:nnz_pad] ** 2).sum())(X.values)
    g2 = jax.grad(lambda xv: (spspmm(
        SparseTensor(X.indices, xv, X.nnz, X.sparse_shape), 1, A, 0, "sum",
        acd=jnp.asarray(acd_p),
        tarX=SparseTensor(X.indices, xv, X.nnz, X.sparse_shape)).values
        ** 2).sum())(X.values)
    assert maxdiff(g1, g2) < 1e-3, geom


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_collate_roundtrip(seed):
    """Random batches of random graphs: the collated batch's dense
    reconstruction equals the block-diagonal of the singles."""
    from pygho_tpu.hodata import Sppretransform, collate_sparse
    from pygho_tpu.hodata import batch_to_sparse_dict
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc

    rng = np.random.default_rng(300 + seed)
    k = int(rng.integers(2, 6))
    graphs = synthetic_zinc("train", n_graphs=k, seed=300 + seed)
    pre = Sppretransform(KhopSampler, [""], [])
    datas = [pre(g) for g in graphs]
    batch = collate_sparse(datas, [], [""], num_graphs=k)
    dd = batch_to_sparse_dict(batch)
    X = dd["X"]
    dense = np.asarray(X.tuplewiseapply(
        lambda v: v.astype(jnp.float32)[:, None]).to_dense())[..., 0]
    off = 0
    for d in datas:
        n = d["num_nodes"]
        blk = np.zeros((n, n), np.float32)
        blk[d["tupleid"][0], d["tupleid"][1]] = \
            d["tuplefeat"].astype(np.float32)
        assert maxdiff(dense[off:off + n, off:off + n], blk) < 1e-6
        off += n
    # nothing outside the blocks
    total = int(batch["num_nodes"])
    mask = np.zeros((dense.shape[0], dense.shape[1]), bool)
    off = 0
    for d in datas:
        n = d["num_nodes"]
        mask[off:off + n, off:off + n] = True
        off += n
    assert np.all(dense[~mask] == 0)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fused_geometry_and_slots(seed):
    """Random (C, R, S, Rv) + prefetch depth (slots) through the
    per-role plan builder: forward and both grads match XLA."""
    from pygho_tpu.kernels import build_spspmm_plans_for

    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(12, 40))
    density = float(rng.uniform(0.15, 0.5))
    C = int(rng.choice([64, 128, 256]))
    R = int(rng.choice([96, 128, 192, 256]))
    S = int(rng.choice([64, 128, 256]))
    Rv = int(rng.choice([64, 96, 128]))
    slots = int(rng.choice([2, 3, 4]))
    dense = rng.normal(size=(n, n)) * (rng.random((n, n)) < density)
    ind = np.stack(np.nonzero(dense)).astype(np.int64)
    if ind.shape[1] < 4:
        return
    nnz_pad = indexing.bucket_size(ind.shape[1])
    D = 128
    X = SparseTensor.from_numpy(
        ind, rng.normal(size=(ind.shape[1], D)).astype(np.float32), (n, n),
        nnz_pad=nnz_pad)
    A = SparseTensor.from_numpy(
        ind, rng.normal(size=(ind.shape[1], D)).astype(np.float32), (n, n),
        nnz_pad=nnz_pad)
    tar, bcd = indexing.spspmm_ind(ind, 1, ind, 0)
    acd = indexing.filterind(ind, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)
    g = (C, R, S, Rv)
    plans = build_spspmm_plans_for(acd_p, nnz_pad, nnz_pad, nnz_pad,
                                   {"fwd": g, "dx": g, "da": g},
                                   n_slots=slots)
    got = fused_spspmm(X.values, A.values, *plans, True)[:nnz_pad]
    assert maxdiff(got, ref.values) < 1e-4, (g, slots)

    def loss_f(xv, av):
        return (fused_spspmm(xv, av, *plans, True)[:nnz_pad] ** 2).sum()

    def loss_r(xv, av):
        Xs = SparseTensor(X.indices, xv, X.nnz, X.sparse_shape)
        As = SparseTensor(A.indices, av, A.nnz, A.sparse_shape)
        return (spspmm(Xs, 1, As, 0, "sum", acd=jnp.asarray(acd_p),
                       tarX=Xs).values ** 2).sum()

    gf = jax.grad(loss_f, (0, 1))(X.values, A.values)
    gr = jax.grad(loss_r, (0, 1))(X.values, A.values)
    assert maxdiff(gf[0], gr[0]) < 1e-3, (g, slots)
    assert maxdiff(gf[1], gr[1]) < 1e-3, (g, slots)


def _strip_plan_invariants(plan, t, u, v):
    """Assert StripPlan structural invariants against the source triples:
    every triple placed exactly once, locals within windows, bases
    aligned and in-bounds, oblk monotone, launch splits partitioning."""
    import numpy as np

    tl = np.asarray(plan.tuv_local)
    ub = np.asarray(plan.ubase)
    vb = np.asarray(plan.vbase)
    ob = np.asarray(plan.oblk)
    G, C, St, R, Rv, Gv = (plan.G, plan.C, plan.St, plan.R, plan.Rv,
                           plan.Gv)
    Rvs = Rv // Gv
    # locals within [0, window] (== window is the empty sentinel)
    assert tl[:, :, 0, :].min() >= 0 and tl[:, :, 0, :].max() <= St
    assert tl[:, :, 1, :].min() >= 0 and tl[:, :, 1, :].max() <= R
    assert tl[:, :, 2, :].min() >= 0 and tl[:, :, 2, :].max() <= Rv
    real = tl[:, :, 0, :] < St
    # sentinel consistency: non-real slots gather nothing
    assert (tl[:, :, 1, :][~real] == R).all()
    assert (tl[:, :, 2, :][~real] == Rv).all()
    # bases in-bounds + aligned
    assert ub.min() >= 0 and ub.max() <= plan.u_rows - R
    assert (ub % plan.u_align == 0).all()
    assert vb.min() >= 0 and vb.max() <= plan.v_rows - Rvs
    assert (vb % plan.v_align == 0).all()
    # oblk monotone non-decreasing
    assert (np.diff(ob) >= 0).all()
    # reconstruct the triple multiset
    step, slot, pos = np.nonzero(real)
    gt = (ob[step] * G + slot) * St + tl[step, slot, 0, pos]
    gu = ub[step, slot] + tl[step, slot, 1, pos]
    vloc = tl[step, slot, 2, pos]
    w = vloc // Rvs
    gv = vb[step, slot, np.minimum(w, Gv - 1)] + (vloc - w * Rvs)
    got = np.stack([gt, gu, gv])
    want = np.stack([np.asarray(t), np.asarray(u), np.asarray(v)])
    got = got[:, np.lexsort(got[::-1])]
    want = want[:, np.lexsort(want[::-1])]
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.array_equal(got, want)
    # launch splits partition steps and blocks, cut at block boundaries
    splits = plan.launch_splits or ((0, plan.n_steps, 0,
                                     plan.out_rows // plan.S),)
    assert splits[0][0] == 0 and splits[-1][1] == plan.n_steps
    assert splits[0][2] == 0 and splits[-1][3] == plan.out_rows // plan.S
    for (s0, s1, b0, b1), (n0, n1, c0, c1) in zip(splits, splits[1:]):
        assert s1 == n0 and b1 == c0
    for (s0, s1, b0, b1) in splits:
        assert s1 > s0 and b1 > b0
        seg = ob[s0:s1]
        assert seg.min() >= b0 and seg.max() < b1
        if s0 > 0:
            assert ob[s0] != ob[s0 - 1], "split must cut at block boundary"


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_pv_strip_planner(seed, monkeypatch):
    """Persistent-v plans under fuzz: the _strip_plan_invariants
    multiset/window checks hold with merged window bases, the v_sched
    2-slot DMA machine is consistent per launch (every step's use slot
    holds its window, loads precede waits), and interpret execution
    matches the scatter oracle — incl. forced multi-launch splits."""
    from pygho_tpu.kernels import strip_spspmm as ss

    rng = np.random.default_rng(9300 + seed)
    if seed % 2 == 0:
        monkeypatch.setattr(ss, "_MAX_GRID_STEPS", 16)

    n_out = int(rng.choice([512, 2048]))
    n_u = int(rng.choice([512, 2048]))
    n_v = int(rng.choice([256, 1024]))
    K = int(rng.integers(300, 3000))
    t = np.sort(rng.integers(0, n_out, K))
    if seed % 2:
        # community-ish: v clusters follow t
        v = np.clip(t * n_v // n_out + rng.integers(-40, 40, K), 0,
                    n_v - 1)
    else:
        v = rng.integers(0, n_v, K)
    u = np.clip(t * n_u // n_out + rng.integers(-50, 50, K), 0, n_u - 1)

    C = int(rng.choice([64, 128]))
    St = S = int(rng.choice([64, 128]))          # pv: G == 1
    R = int(rng.choice([128, 256]))
    Rv = int(rng.choice([128, 256]))
    align = int(rng.choice([1, 16]))
    rup = lambda n, m: ((n + m - 1) // m) * m
    u_rows, v_rows, o_rows = rup(n_u, R), rup(n_v, Rv), rup(n_out, S)
    try:
        plan = ss.build_strip_plan(np.stack([t, u, v]), u_rows, v_rows,
                                   o_rows, C=C, R=R, S=S, St=St, Rv=Rv,
                                   base_align=align, v_persistent=True)
    except ss.StripPlanError:
        # legitimate refusal (one block over the forced grid ceiling);
        # the autotuner skips such candidates
        return
    assert plan.v_persistent
    _strip_plan_invariants(plan, t, u, v)

    # schedule simulation: per launch, walk the 2-slot DMA machine
    vs = np.asarray(plan.v_sched)
    vb = np.asarray(plan.vbase)[:, 0, 0]
    splits = plan.launch_splits or ((0, plan.n_steps, 0, 0),)
    for (s0, s1, _b0, _b1) in splits:
        slots = [None, None]
        for s in range(s0, s1):
            for w in (0, 1):
                if vs[s, 2 + 2 * w] >= 0:
                    slots[vs[s, 3 + 2 * w]] = int(vs[s, 2 + 2 * w])
            assert slots[int(vs[s, 0])] == int(vb[s]), (
                f"step {s}: slot holds {slots[int(vs[s, 0])]}, "
                f"needs {int(vb[s])}")

    D = 128
    U = rng.normal(size=(u_rows, D)).astype(np.float32)
    V = rng.normal(size=(v_rows, D)).astype(np.float32)
    oracle = np.zeros((o_rows, D), np.float32)
    np.add.at(oracle, t, U[u] * V[v])
    got = np.asarray(ss.strip_contract(jnp.asarray(U), jnp.asarray(V),
                                       plan, interpret=True, exact=True))
    assert maxdiff(got, oracle) < 1e-4 * max(1.0, np.abs(oracle).max())


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_strip_planner_invariants(seed, monkeypatch):
    """Randomized strip-plan invariants (VERDICT r2 #8): skewed t/u/v
    distributions, tiny and huge ranges, Gv in {1,8,16}, align in
    {1,16}, forced launch splits — every triple placed exactly once,
    locals in-window, splits partition blocks — plus interpret-mode
    numerical equality vs the scatter oracle."""
    from pygho_tpu.kernels import strip_spspmm as ss

    rng = np.random.default_rng(4200 + seed)
    # force multi-launch plans on even seeds
    if seed % 2 == 0:
        monkeypatch.setattr(ss, "_MAX_GRID_STEPS", 8)

    dist = ["clustered", "uniform", "zipf"][seed % 3]
    n_out = int(rng.choice([256, 1024, 4096]))
    n_u = int(rng.choice([256, 2048]))
    n_v = int(rng.choice([128, 1024]))
    K = int(rng.integers(200, 4000))
    t = np.sort(rng.integers(0, n_out, K))
    if dist == "clustered":
        u = np.clip(t * n_u // n_out + rng.integers(-30, 30, K), 0,
                    n_u - 1)
        v = np.clip(t * n_v // n_out + rng.integers(-10, 10, K), 0,
                    n_v - 1)
    elif dist == "uniform":
        u = rng.integers(0, n_u, K)
        v = rng.integers(0, n_v, K)
    else:
        u = np.minimum((rng.zipf(1.7, K) - 1) % n_u, n_u - 1)
        v = np.minimum((rng.zipf(1.5, K) - 1) % n_v, n_v - 1)

    Gv = int(rng.choice([1, 8, 16]))
    align = int(rng.choice([1, 16]))
    C = int(rng.choice([64, 128, 256]))
    St = int(rng.choice([32, 128]))
    G = int(rng.choice([1, 2, 4]))
    S = St * G
    R = int(rng.choice([128, 256]))
    Rv = max(int(rng.choice([64, 128, 256])), Gv * (16 if align == 16
                                                    else 8))
    rup = lambda n, m: ((n + m - 1) // m) * m
    u_rows, v_rows, o_rows = rup(n_u, R), rup(n_v, Rv), rup(n_out, S)
    plan = ss.build_strip_plan(np.stack([t, u, v]), u_rows, v_rows,
                               o_rows, C=C, R=R, S=S, St=St, Rv=Rv,
                               base_align=align, Gv=Gv)
    _strip_plan_invariants(plan, t, u, v)

    # per-block padded rebuild (the v7 stacking mechanism): a dominating
    # random step table must keep every placement invariant, land its
    # exact per-block counts in oblk, and stay numerically identical
    nb = o_rows // S
    nat = np.bincount(np.asarray(plan.oblk), minlength=nb)
    tgt = np.maximum(np.minimum(nat + rng.integers(0, 3, nb),
                                ss._MAX_GRID_STEPS), nat)
    plan_p = ss.build_strip_plan(np.stack([t, u, v]), u_rows, v_rows,
                                 o_rows, C=C, R=R, S=S, St=St, Rv=Rv,
                                 base_align=align, Gv=Gv,
                                 steps_per_block=tgt)
    _strip_plan_invariants(plan_p, t, u, v)
    assert np.array_equal(np.bincount(np.asarray(plan_p.oblk),
                                      minlength=nb), tgt)

    D = 128
    U = rng.normal(size=(u_rows, D)).astype(np.float32)
    V = rng.normal(size=(v_rows, D)).astype(np.float32)
    oracle = np.zeros((o_rows, D), np.float32)
    np.add.at(oracle, t, U[u] * V[v])
    for p in (plan, plan_p):
        got = np.asarray(ss.strip_contract(jnp.asarray(U), jnp.asarray(V),
                                           p, interpret=True, exact=True))
        assert maxdiff(got, oracle) < 1e-4 * max(1.0, np.abs(oracle).max())
