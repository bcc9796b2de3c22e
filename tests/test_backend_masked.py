"""Masked-dense backend tests vs dense oracles.

Port of the intent of reference tests/test_backend_masked.py, with the
masked-min fix covered explicitly (reference bug #1, MaTensor.py:200-206)
and spmamm invalid-source fill covered (reference bug #2, Spmamm.py:62).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pygho_tpu.backend.matensor import MaskedTensor, filterinf
from pygho_tpu.backend.mamamm import mamamm
from pygho_tpu.backend.spmamm import spmamm
from pygho_tpu.backend.sptensor import SparseTensor

from utils import maxdiff, TOL


def _random_masked(rng, maskedshape, dense_shape=(), density=0.7):
    data = rng.normal(size=tuple(maskedshape) + tuple(dense_shape))
    mask = rng.random(maskedshape) < density
    # ensure at least one valid entry per leading row for stable oracles
    return MaskedTensor(jnp.asarray(data), jnp.asarray(mask)), data, mask


def test_fill_masked(rng):
    mt, data, mask = _random_masked(rng, (4, 5), (2,))
    filled = np.asarray(mt.fill_masked(-1.0))
    assert np.all(filled[~mask] == -1.0)
    assert maxdiff(filled[mask], data[mask]) < TOL


@pytest.mark.parametrize("op", ["sum", "mean", "max", "min"])
def test_masked_reductions(rng, op):
    mt, data, mask = _random_masked(rng, (4, 6), (3,))
    out = getattr(mt, op)(1)
    got = np.asarray(out.data)
    gotmask = np.asarray(out.mask)
    for b in range(4):
        rows = data[b][mask[b]]
        if len(rows) == 0:
            assert not gotmask[b]
            continue
        expect = {"sum": rows.sum(0), "mean": rows.mean(0),
                  "max": rows.max(0), "min": rows.min(0)}[op]
        assert maxdiff(got[b], expect) < TOL, (op, b)
        assert gotmask[b]


def test_min_is_really_min(rng):
    # regression guard for reference bug #1 (min returned max)
    data = jnp.asarray([[1.0, -5.0, 3.0]])
    mask = jnp.asarray([[True, True, True]])
    out = MaskedTensor(data, mask).min(1)
    assert float(out.data[0]) == -5.0


def test_diag(rng):
    mt, data, mask = _random_masked(rng, (3, 5, 5), (2,))
    out = mt.diag([1, 2])
    got = np.asarray(out.data)
    expect = np.stack([np.stack([data[b, i, i] for i in range(5)])
                       for b in range(3)])
    assert maxdiff(got, expect) < TOL
    assert out.maskedshape == (3, 5)


def test_unpooling(rng):
    tar, _, _ = _random_masked(rng, (3, 5, 5), (2,))
    src, sdata, smask = _random_masked(rng, (3, 5), (2,))
    out = src.unpooling(1, tar)
    got = np.asarray(out.data)
    for i in range(5):
        assert maxdiff(got[:, i], sdata) < TOL


def test_add_catvalue(rng):
    a, da, ma = _random_masked(rng, (3, 4), (2,))
    b, db, mb = _random_masked(rng, (3, 4), (2,))
    s = a.add(b, samesparse=True)
    assert maxdiff(s.data, da + db) < TOL
    c = a.catvalue(b, samesparse=True)
    assert c.denseshape == (4,)


def test_diagonalapply(rng):
    mt, data, mask = _random_masked(rng, (2, 4, 4), (3,))
    out = mt.diagonalapply(lambda d, e: d * e[..., None])
    got = np.asarray(out.data)
    for i in range(4):
        for j in range(4):
            expect = data[:, i, j] if i == j else 0 * data[:, i, j]
            assert maxdiff(got[:, i, j], expect) < TOL


# ---------------------------------------------------------------- mamamm


def test_mamamm_2fwl_oracle(rng):
    b, n, d = 3, 6, 2
    A, dA, mA = _random_masked(rng, (b, n, n), (d,))
    B, dB, mB = _random_masked(rng, (b, n, n), (d,))
    mask = jnp.asarray(mA)
    out = mamamm(A, 2, B, 1, mask)
    ref = np.einsum("bikd,bkjd->bijd", dA * mA[..., None], dB * mB[..., None])
    assert maxdiff(out.data, ref) < 1e-4


def test_mamamm_node_mp(rng):
    b, n, d = 3, 6, 4
    A, dA, mA = _random_masked(rng, (b, n, n), (d,))
    X, dX, mX = _random_masked(rng, (b, n), (d,))
    out = mamamm(A, 2, X, 1, X.mask)
    ref = np.einsum("bijd,bjd->bid", dA * mA[..., None], dX * mX[..., None])
    assert maxdiff(out.data, ref) < 1e-4


# ---------------------------------------------------------------- spmamm


@pytest.mark.parametrize("aggr", ["sum", "max"])
def test_spmamm_vs_einsum(rng, aggr):
    b, n, d = 3, 7, 2
    # batched sparse adjacency (b, n, n) with dense edge features (d,)
    dense = rng.normal(size=(b, n, n, d))
    keep = rng.random((b, n, n)) < 0.4
    dense *= keep[..., None]
    idx = np.nonzero(keep)
    ind = np.stack(idx).astype(np.int64)
    val = dense[idx]
    A = SparseTensor.from_numpy(ind, val, (b, n, n))
    X, dX, mX = _random_masked(rng, (b, n), (d,))
    out = spmamm(A, 2, X, 1, None, aggr)
    got = np.asarray(out.data)
    dXm = dX * mX[..., None]
    for bb in range(b):
        for i in range(n):
            js = np.nonzero(keep[bb, i])[0]
            js = [j for j in js if mX[bb, j]]
            if len(js) == 0:
                expect = np.zeros(d)
            else:
                contrib = np.stack([dense[bb, i, j] * dXm[bb, j] for j in js])
                expect = contrib.sum(0) if aggr == "sum" else contrib.max(0)
            assert maxdiff(got[bb, i], expect) < 1e-4, (aggr, bb, i)


def _random_sp_adj(rng, b, n, d=None, density=0.4):
    keep = rng.random((b, n, n)) < density
    idx = np.nonzero(keep)
    ind = np.stack(idx).astype(np.int64)
    if d is None:
        val = rng.normal(size=ind.shape[1]).astype(np.float32)
    else:
        val = rng.normal(size=(ind.shape[1], d)).astype(np.float32)
    return SparseTensor.from_numpy(ind, val, (b, n, n))


@pytest.mark.parametrize("aggr", ["sum", "mean"])
@pytest.mark.parametrize("vec", [False, True])
@pytest.mark.parametrize("dim1", [1, 2])
def test_spmamm_dense_path_matches_gather(rng, aggr, vec, dim1):
    """The densify-and-matmul fast path == the gather/segment path for
    sum/mean, scalar and per-channel edge values, both contractions,
    on node (b,n,d) and tuple (b,n,n,d) operands."""
    from pygho_tpu.backend.spmamm import set_dense_spmamm

    b, n, d = 3, 7, 4
    A = _random_sp_adj(rng, b, n, d if vec else None)
    for mshape in [(b, n), (b, n, n)]:
        X, _, _ = _random_masked(rng, mshape, (d,))
        dim2 = 1 if len(mshape) == 2 else 2
        set_dense_spmamm(True)
        fast = spmamm(A, dim1, X, dim2, None, aggr)
        set_dense_spmamm(False)
        ref = spmamm(A, dim1, X, dim2, None, aggr)
        set_dense_spmamm(True)
        assert maxdiff(fast.data, ref.data) < 1e-4, (aggr, vec, dim1, mshape)


def test_spmamm_dense_path_grad(rng):
    from pygho_tpu.backend.spmamm import set_dense_spmamm

    b, n, d = 2, 6, 4
    A = _random_sp_adj(rng, b, n, d)
    X, _, _ = _random_masked(rng, (b, n, n), (d,))

    def loss(av, xd):
        A2 = SparseTensor(A.indices, av, A.nnz, A.sparse_shape)
        return (spmamm(A2, 2, MaskedTensor(xd, X.mask), 2, None, "sum")
                .fill_masked(0.0) ** 2).sum()

    g1 = jax.grad(loss, argnums=(0, 1))(A.values, X.data)
    set_dense_spmamm(False)
    g2 = jax.grad(loss, argnums=(0, 1))(A.values, X.data)
    set_dense_spmamm(True)
    assert maxdiff(g1[0], g2[0]) < 1e-3
    assert maxdiff(g1[1], g2[1]) < 1e-3
