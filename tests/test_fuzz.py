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
