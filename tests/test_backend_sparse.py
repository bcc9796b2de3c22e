"""Backend sparse tests: every device op checked against a dense oracle.

Port of the *intent* of reference tests/test_backend_sparse.py (which is
stale and CUDA-bound, see SURVEY.md §4) to working pytest, plus coverage
the reference lacked: padding invariance, jit compilation, mean/max aggrs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor
from pygho_tpu.backend.segment import segment_reduce, segment_softmax
from pygho_tpu.backend.spmm import spmm
from pygho_tpu.backend.spspmm import spspmm, spspmpnn, spsphadamard

from utils import random_sparse, maxdiff, TOL


# ---------------------------------------------------------------- indexing


def test_indicehash_roundtrip(rng):
    for sd in (1, 2, 3):
        ind = rng.integers(0, 100, size=(sd, 50)).astype(np.int64)
        h = indexing.indicehash(ind)
        dec = indexing.decodehash(h, sd)
        assert np.array_equal(dec, ind)


def test_indicehash_order(rng):
    ind = rng.integers(0, 1000, size=(2, 200)).astype(np.int64)
    h = indexing.indicehash(ind)
    # lexicographic order preserved
    order = np.lexsort((ind[1], ind[0]))
    assert np.array_equal(np.argsort(h, kind="stable"), order)


def test_tight_hash_roundtrip(rng):
    dimsize = [7, 13, 5]
    ind = np.stack([rng.integers(0, s, size=40) for s in dimsize]).astype(np.int64)
    h = indexing.indicehash_tight(ind, dimsize)
    # equals row-major ravel
    assert np.array_equal(h, np.ravel_multi_index(tuple(ind), dimsize))
    dec = indexing.decodehash_tight(h, dimsize)
    assert np.array_equal(dec, ind)


def test_coalesce_reduces(rng):
    ind = np.array([[0, 1, 1, 0], [2, 3, 3, 2]])
    val = np.array([1.0, 2.0, 3.0, 4.0])
    ci, cv = indexing.coalesce(ind, val, "sum")
    assert ci.shape == (2, 2)
    assert np.array_equal(ci, np.array([[0, 1], [2, 3]]))
    assert np.allclose(np.sort(cv), [5.0, 5.0])
    _, cv_min = indexing.coalesce(ind, val, "min")
    assert np.allclose(np.sort(cv_min), [1.0, 2.0])
    _, cv_mean = indexing.coalesce(ind, val, "mean")
    assert np.allclose(np.sort(cv_mean), [2.5, 2.5])


def test_spspmm_ind_vs_dense(rng):
    # 2D x 2D matmul oracle, non-uniform dims (reference style: n,m,l distinct)
    n, k, m = 13, 5, 7
    A, dA, indA, valA = random_sparse(rng, (n, k), 0.4)
    B, dB, indB, valB = random_sparse(rng, (k, m), 0.4)
    tar_ind, bcd = indexing.spspmm_ind(indA, 1, indB, 0)
    # scatter oracle on host
    out = np.zeros((tar_ind.shape[1],))
    np.add.at(out, bcd[0], valA[bcd[1]] * valB[bcd[2]])
    dense_out = np.zeros((n, m))
    dense_out[tuple(tar_ind)] = out
    assert maxdiff(dense_out, dA @ dB) < TOL
    # bcd[0] sorted
    assert np.all(np.diff(bcd[0]) >= 0)


def test_spspmm_ind_3d(rng):
    # (n,k,m) x (l,k) eliminating dim1=1 of ind1 and dim2=1 of ind2
    n, k, m, l = 6, 5, 4, 7
    A, dA, indA, valA = random_sparse(rng, (n, k, m), 0.3)
    B, dB, indB, valB = random_sparse(rng, (l, k), 0.5)
    tar_ind, bcd = indexing.spspmm_ind(indA, 1, indB, 1)
    out = np.zeros((tar_ind.shape[1],))
    np.add.at(out, bcd[0], valA[bcd[1]] * valB[bcd[2]])
    dense_out = np.zeros((n, m, l))
    dense_out[tuple(tar_ind)] = out
    ref = np.einsum("nkm,lk->nml", dA, dB)
    assert maxdiff(dense_out, ref) < TOL


def test_filterind_masks_target(rng):
    n, k = 9, 8
    A, dA, indA, _ = random_sparse(rng, (n, k), 0.4)
    B, dB, indB, _ = random_sparse(rng, (k, n), 0.4)
    tar_ind, bcd = indexing.spspmm_ind(indA, 1, indB, 0)
    # restrict to A's own pattern (the usual tuple-GNN case)
    acd = indexing.filterind(indA, tar_ind, bcd)
    assert np.all(np.diff(acd[0]) >= 0)
    # every a index refers to a column of indA
    assert acd[0].max(initial=-1) < indA.shape[1]


# ---------------------------------------------------------------- segment


def test_segment_reduce_aggrs(rng):
    src = jnp.asarray(rng.normal(size=(20, 3)))
    ids = jnp.asarray(np.sort(rng.integers(0, 5, size=20)).astype(np.int32))
    for aggr, ref in [
        ("sum", lambda v: v.sum(0)),
        ("mean", lambda v: v.mean(0)),
        ("max", lambda v: v.max(0)),
        ("min", lambda v: v.min(0)),
    ]:
        out = segment_reduce(src, ids, 7, aggr)
        for s in range(7):
            rows = np.asarray(src)[np.asarray(ids) == s]
            expect = ref(rows) if len(rows) else np.zeros(3)
            assert maxdiff(out[s], expect) < TOL, (aggr, s)


def test_segment_reduce_drops_oob(rng):
    src = jnp.ones((4, 2))
    ids = jnp.asarray([0, 1, indexing.PAD_INDEX, indexing.PAD_INDEX], dtype=jnp.int32)
    out = segment_reduce(src, ids, 2, "sum")
    assert maxdiff(out, np.ones((2, 2))) < TOL


def test_segment_softmax(rng):
    src = jnp.asarray(rng.normal(size=(10,)))
    ids = jnp.asarray(np.sort(rng.integers(0, 3, size=10)).astype(np.int32))
    out = segment_softmax(src, ids, 3)
    for s in range(3):
        m = np.asarray(ids) == s
        if m.any():
            assert abs(np.asarray(out)[m].sum() - 1.0) < TOL


# ---------------------------------------------------------------- tensor ops


def test_sptensor_from_numpy_coalesces(rng):
    ind = np.array([[1, 0, 1], [1, 2, 1]])
    val = np.array([[1.0], [2.0], [3.0]])
    st = SparseTensor.from_numpy(ind, val, (3, 3))
    assert int(st.nnz) == 2
    dense = np.asarray(st.to_dense())
    expect = np.zeros((3, 3, 1))
    expect[0, 2] = 2.0
    expect[1, 1] = 4.0
    assert maxdiff(dense, expect) < TOL


def test_reduce_to_dense(rng):
    n, m, d = 11, 7, 3
    st, dense, _, _ = random_sparse(rng, (n, m), 0.4, (d,))
    mask = np.abs(dense).sum(-1) != 0
    for aggr in ("sum", "max", "mean"):
        out = np.asarray(getattr(st, aggr)(1))
        assert out.shape == (n, d)
        for i in range(n):
            rows = dense[i][mask[i]]
            if len(rows) == 0:
                expect = np.zeros(d)
            elif aggr == "sum":
                expect = rows.sum(0)
            elif aggr == "max":
                expect = rows.max(0)
            else:
                expect = rows.mean(0)
            assert maxdiff(out[i], expect) < TOL, (aggr, i)
        out0 = np.asarray(getattr(st, aggr)(0))
        assert out0.shape == (m, d)


def test_reduce_multi_keep_dims(rng):
    shape = (4, 5, 6)
    st, dense, _, _ = random_sparse(rng, shape, 0.3, (2,))
    out = np.asarray(st.sum(1))
    assert out.shape == (4, 6, 2)
    assert maxdiff(out, dense.sum(1)) < TOL


def test_diag_to_dense(rng):
    n = 8
    st, dense, _, _ = random_sparse(rng, (n, n), 0.5, (3,))
    out = np.asarray(st.diag_to_dense())
    expect = np.stack([dense[i, i] for i in range(n)])
    assert maxdiff(out, expect) < TOL


def test_unpooling_fromdense1dim(rng):
    n = 9
    st, dense, ind, _ = random_sparse(rng, (n, n), 0.4, (2,))
    X = rng.normal(size=(n, 2))
    out = st.unpooling_fromdense1dim(0, jnp.asarray(X))
    vals = np.asarray(out.values)
    nnz = int(st.nnz)
    assert maxdiff(vals[:nnz], X[ind[0]]) < TOL
    assert np.all(vals[nnz:] == 0)


def test_tuplewiseapply_zeroes_padding(rng):
    st, dense, ind, _ = random_sparse(rng, (6, 6), 0.5, (2,))
    out = st.tuplewiseapply(lambda v: v + 1.0)  # bias would pollute pads
    vals = np.asarray(out.values)
    nnz = int(st.nnz)
    assert np.all(vals[nnz:] == 0)
    assert maxdiff(vals[:nnz], dense[tuple(ind)] + 1.0) < TOL


def test_add_catvalue(rng):
    st, dense, _, _ = random_sparse(rng, (6, 6), 0.5, (2,))
    both = st.add(st, samesparse=True)
    assert maxdiff(both.values, 2 * np.asarray(st.values)) < TOL
    cat = st.catvalue(st, samesparse=True)
    assert cat.values.shape[-1] == 4


# ---------------------------------------------------------------- spmm


@pytest.mark.parametrize("aggr", ["sum", "mean", "max"])
@pytest.mark.parametrize("dim1", [0, 1])
def test_spmm_vs_dense(rng, aggr, dim1):
    n, m, d = 13, 11, 4
    A, dA, ind, val = random_sparse(rng, (n, m), 0.4)
    X = rng.normal(size=(m if dim1 == 1 else n, d))
    out = np.asarray(spmm(A, dim1, jnp.asarray(X), aggr))
    tarsize = n if dim1 == 1 else m
    expect = np.zeros((tarsize, d))
    src, tar = (ind[1], ind[0]) if dim1 == 1 else (ind[0], ind[1])
    for t in range(tarsize):
        rows = val[tar == t][:, None] * X[src[tar == t]]
        if len(rows) == 0:
            continue
        expect[t] = {"sum": rows.sum(0), "mean": rows.mean(0),
                     "max": rows.max(0)}[aggr]
    assert maxdiff(out, expect) < TOL


# ---------------------------------------------------------------- spspmm


def _build_spspmm_case(rng, n=10, density=0.4, d=3):
    """X (n,n,d) sparse tuple tensor, A (n,n) adjacency; target = X pattern."""
    X, dX, indX, valX = random_sparse(rng, (n, n), density, (d,))
    A, dA, indA, valA = random_sparse(rng, (n, n), density)
    tar_ind, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar_ind, bcd)
    acd_p = jnp.asarray(indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1])))
    return X, dX, indX, A, dA, acd_p


def test_spspmm_on_target_pattern(rng):
    n, d = 10, 3
    X, dX, indX, A, dA, acd = _build_spspmm_case(rng, n, 0.4, d)
    out = spspmm(X, 1, A, 0, "sum", acd=acd, tarX=X)
    # oracle: (dX contracted with dA) masked to X's pattern
    full = np.einsum("ikd,kj->ijd", dX, dA)
    expect = np.zeros_like(full)
    expect[tuple(indX)] = full[tuple(indX)]
    got = np.asarray(out.to_dense())
    assert maxdiff(got, expect) < TOL


def test_spspmm_jits_and_caches(rng):
    X, dX, indX, A, dA, acd = _build_spspmm_case(rng)
    f = jax.jit(lambda X, A, acd: spspmm(X, 1, A, 0, "sum", acd=acd, tarX=X))
    out1 = f(X, A, acd)
    out2 = f(X, A, acd)
    assert maxdiff(out1.values, out2.values) == 0.0


def test_spspmpnn_matches_spspmm(rng):
    X, dX, indX, A, dA, acd = _build_spspmm_case(rng)
    out1 = spspmm(X, 1, A, 0, "sum", acd=acd, tarX=X)
    out2 = spspmpnn(X, 1, A, 0, X, acd,
                    lambda av, bv, cv, seg: av * bv[..., None], "sum")
    assert maxdiff(out1.values, out2.values) < TOL


def test_spsphadamard(rng):
    n = 9
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (2,))
    B, dB, indB, _ = random_sparse(rng, (n, n), 0.5, (2,))
    b2a_host = indexing.spsphadamard_ind(indA, indB)
    b2a = jnp.asarray(indexing.pad_values(b2a_host.astype(np.int32),
                                          B.nnz_pad))
    # pads of B map to b2a 0 -> but B pad values are 0, so product stays 0
    b2a = b2a.at[indB.shape[1]:].set(-1)
    out = spsphadamard(A, B, b2a)
    got = np.asarray(out.to_dense())
    assert maxdiff(got, dA * dB) < TOL


def test_spspmm_grad_flows(rng):
    X, dX, indX, A, dA, acd = _build_spspmm_case(rng)

    def loss(xv):
        X2 = SparseTensor(X.indices, xv, X.nnz, X.sparse_shape)
        out = spspmm(X2, 1, A, 0, "sum", acd=acd, tarX=X2)
        return (out.values ** 2).sum()

    g = jax.grad(loss)(X.values)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_ptr2batch_deg2batch():
    assert np.array_equal(indexing.ptr2batch(np.array([0, 2, 2, 5])),
                          np.array([0, 0, 2, 2, 2]))
    assert np.array_equal(indexing.deg2batch(np.array([2, 0, 3])),
                          np.array([0, 0, 2, 2, 2]))


def test_norm_momentum_scheduler():
    from flax import nnx
    from pygho_tpu.honn.utils import BatchNorm, MLP, NormMomentumScheduler

    m = MLP(4, 4, 2, True, norm="bn", rngs=nnx.Rngs(0))
    sched = NormMomentumScheduler(lambda e: 1.0 / (e + 1), 0.1)
    sched.step(m)          # epoch 0: ratio 1 -> unchanged
    cur = sched.step(m)    # epoch 1: ratio 0.5
    assert abs(cur - 0.05) < 1e-9
    for _, mod in nnx.iter_graph(m):
        if isinstance(mod, BatchNorm):
            assert abs(mod.momentum - 0.05) < 1e-9
