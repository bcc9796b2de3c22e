"""Operator (L3) and conv (L4) tests.

The strongest oracle here is cross-backend parity: the same graph run
through the sparse ("SS") and masked-dense ("DD") paths with identical
weights must produce identical tuple values — a check the reference's
test suite never had (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor
from pygho_tpu.backend.matensor import MaskedTensor
from pygho_tpu.honn import conv as Conv
from pygho_tpu.honn import tensorop as TensorOp
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.honn.sp_operator import KEYSEP
from pygho_tpu.honn.utils import MLP, HeteroLinear

from utils import maxdiff

TOL = 1e-4


def _ring_instance(rng, n=7, d=8, hop=2):
    """One ring graph: sparse A/X + their dense counterparts + all acd."""
    import scipy.sparse as ssp

    edges = np.array([[i, (i + 1) % n] for i in range(n)] +
                     [[(i + 1) % n, i] for i in range(n)]).T
    edges = edges[:, np.lexsort((edges[1], edges[0]))]
    adj = ssp.coo_matrix((np.ones(edges.shape[1]),
                          (edges[0], edges[1])), (n, n)).tocsr()
    dist = ssp.csgraph.shortest_path(adj, unweighted=True)
    ii, jj = np.nonzero(dist <= hop)
    tup = np.stack([ii, jj])

    # symmetric edge features (A[i,j] == A[j,i]), as real undirected graphs
    # have; the cross-subgraph dense op contracts A transposed relative to
    # the sparse op (both match the reference's conventions)
    sym = rng.normal(size=(n, n, d)).astype(np.float32)
    sym = sym + sym.transpose(1, 0, 2)
    Aval = sym[edges[0], edges[1]]
    Xval = rng.normal(size=(tup.shape[1], d)).astype(np.float32)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    X = SparseTensor.from_numpy(tup, Xval, (n, n), is_coalesced=True)

    datadict = {}
    for key, (i1, dim1, i2, dim2) in {
        f"X{KEYSEP}X{KEYSEP}1{KEYSEP}A{KEYSEP}0": (tup, 1, edges, 0),
        f"X{KEYSEP}A{KEYSEP}1{KEYSEP}X{KEYSEP}0": (edges, 1, tup, 0),
        f"X{KEYSEP}X{KEYSEP}1{KEYSEP}X{KEYSEP}0": (tup, 1, tup, 0),
    }.items():
        tar, bcd = indexing.spspmm_ind(i1, dim1, i2, dim2)
        acd = indexing.filterind(tup, tar, bcd)
        datadict[f"{key}{KEYSEP}acd"] = jnp.asarray(
            indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1])))

    # dense counterparts (batch of 1)
    Ad = np.zeros((1, n, n, d), np.float32)
    Ad[0, edges[0], edges[1]] = Aval
    Amask = np.zeros((1, n, n), bool)
    Amask[0, edges[0], edges[1]] = True
    Xd = np.zeros((1, n, n, d), np.float32)
    Xd[0, tup[0], tup[1]] = Xval
    Xmask = np.zeros((1, n, n), bool)
    Xmask[0, tup[0], tup[1]] = True
    MA = MaskedTensor(jnp.asarray(Ad), jnp.asarray(Amask))
    MX = MaskedTensor(jnp.asarray(Xd), jnp.asarray(Xmask))
    return A, X, MA, MX, datadict, tup, n, d


def _dense_of(out_sp: SparseTensor, tup, n, d):
    got = np.zeros((n, n, d), np.float32)
    vals = np.asarray(out_sp.values)[: tup.shape[1]]
    got[tup[0], tup[1]] = vals
    return got


@pytest.mark.parametrize("convname", ["NGNN", "SSWL", "DSSGNN", "GNNAK",
                                      "SUN", "PPGN"])
def test_conv_cross_backend_parity(rng, convname):
    """Same weights, same graph: SS output == DD output on the tuple
    pattern.  Note: DD pooling/mean statistics run over the masked
    pattern which equals the sparse pattern here, so results must agree
    to float tolerance."""
    A, X, MA, MX, datadict, tup, n, d = _ring_instance(rng)
    mlp = {"numlayer": 1, "tailact": True, "norm": "none", "act": "relu"}

    def build(mode):
        r = nnx.Rngs(7)
        if convname == "NGNN":
            return Conv.NGNNConv(d, d, "sum", mode, mlp, rngs=r)
        if convname == "SSWL":
            return Conv.SSWLConv(d, d, "sum", mode, mlp, rngs=r)
        if convname == "DSSGNN":
            return Conv.DSSGNNConv(d, d, "sum", "sum", "mean", mode, mlp,
                                   rngs=r)
        if convname == "GNNAK":
            return Conv.GNNAKConv(d, d, "sum", "mean", mode, mlp, mlp,
                                  rngs=r)
        if convname == "SUN":
            return Conv.SUNConv(d, d, "sum", "mean", mode, mlp, mlp, rngs=r)
        if convname == "PPGN":
            return Conv.PPGNConv(d, d, "sum", mode, mlp, rngs=r)

    sp = build("SS")
    ma = build("DD")
    out_sp = sp(A, X, datadict)
    out_ma = ma(MA, MX, {})
    got_sp = _dense_of(out_sp, tup, n, d)
    got_ma = np.asarray(out_ma.fill_masked(0.0))[0]
    # compare only on the tuple pattern (dense layer computes everywhere)
    mask = np.zeros((n, n, 1), bool)
    mask[tup[0], tup[1]] = True
    assert maxdiff(got_sp * mask, got_ma * mask) < TOL


def test_i2conv_runs(rng):
    """I2Conv on 3-tuples (sparse): forward is finite on the tuple pattern
    and acd routing matches a dense einsum oracle."""
    import scipy.sparse as ssp

    n, d, hop = 6, 4, 2
    edges = np.array([[i, (i + 1) % n] for i in range(n)] +
                     [[(i + 1) % n, i] for i in range(n)]).T
    edges = edges[:, np.lexsort((edges[1], edges[0]))]
    adj = ssp.coo_matrix((np.ones(edges.shape[1]), (edges[0], edges[1])),
                         (n, n)).tocsr()
    dist = ssp.csgraph.shortest_path(adj, unweighted=True)
    u, v = edges[0], edges[1]
    within = (dist[u] <= hop) | (dist[v] <= hop)
    e_idx, w = np.nonzero(within)
    tup3 = np.stack([u[e_idx], v[e_idx], w]).astype(np.int64)
    Xval = rng.normal(size=(tup3.shape[1], d)).astype(np.float32)
    X = SparseTensor.from_numpy(tup3, Xval, (n, n, n), is_coalesced=True)
    Aval = rng.normal(size=(edges.shape[1], d)).astype(np.float32)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)

    key = f"X{KEYSEP}X{KEYSEP}2{KEYSEP}A{KEYSEP}0"
    tar, bcd = indexing.spspmm_ind(tup3, 2, edges, 0)
    acd = indexing.filterind(tup3, tar, bcd)
    dd = {f"{key}{KEYSEP}acd": jnp.asarray(
        indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1])))}

    conv = Conv.I2Conv(d, d, "sum", "SS",
                       {"numlayer": 1, "tailact": True, "norm": "none"},
                       rngs=nnx.Rngs(0))
    out = conv(A, X, dd)
    assert np.isfinite(np.asarray(out.values)).all()

    # oracle for the raw op: out[uvw] = sum_k MLP(X)[uvk] A[kw]
    from pygho_tpu.backend.spspmm import spspmm
    tX = X.tuplewiseapply(lambda val: conv.lin(val, X.rowmask))
    raw = spspmm(tX, 2, A, 0, "sum", acd=dd[f"{key}{KEYSEP}acd"], tarX=tX)
    dX = np.zeros((n, n, n, d), np.float32)
    dX[tup3[0], tup3[1], tup3[2]] = np.asarray(tX.values)[: tup3.shape[1]]
    dA = np.zeros((n, n, d), np.float32)
    dA[edges[0], edges[1]] = Aval
    full = np.einsum("uvkd,kwd->uvwd", dX, dA)
    expect = np.zeros_like(full)
    expect[tup3[0], tup3[1], tup3[2]] = full[tup3[0], tup3[1], tup3[2]]
    got = np.zeros_like(full)
    got[tup3[0], tup3[1], tup3[2]] = np.asarray(raw.values)[: tup3.shape[1]]
    assert maxdiff(got, expect) < TOL


def test_pooling_sparse_output_3d(rng):
    """3-tuple -> edge-pattern pooling with precomputed segment map."""
    n = 5
    edges = np.array([[0, 1], [1, 0], [1, 2], [2, 1]]).T
    # 3-tuples: for each edge, all nodes
    E = edges.shape[1]
    e_idx = np.repeat(np.arange(E), n)
    w = np.tile(np.arange(n), E)
    tup3 = np.stack([edges[0][e_idx], edges[1][e_idx], w])
    vals = rng.normal(size=(tup3.shape[1], 3)).astype(np.float32)
    X = SparseTensor.from_numpy(tup3, vals, (n, n, n), is_coalesced=True)
    seg = np.full((X.nnz_pad,), indexing.PAD_INDEX, dtype=np.int32)
    seg[: tup3.shape[1]] = e_idx
    tarX = SparseTensor.from_numpy(edges, np.zeros((E, 3), np.float32),
                                   (n, n), is_coalesced=True)
    out = X.sum(2, return_sparse=True, seg_ids=jnp.asarray(seg),
                tar_indices=tarX.indices, tar_nnz=tarX.nnz)
    got = np.asarray(out.values)[:E]
    expect = vals.reshape(E, n, 3).sum(1)
    assert maxdiff(got, expect) < TOL


def test_parse_precomputekey_all_convs():
    r = nnx.Rngs(0)
    mlp = {"numlayer": 1, "tailact": True}
    model = nnx.Dict(
        a=Conv.SSWLConv(4, 4, "sum", "SS", mlp, rngs=r),
        b=Conv.PPGNConv(4, 4, "sum", "SS", mlp, rngs=r),
        c=Conv.I2Conv(4, 4, "sum", "SS", mlp, rngs=r),
    )
    keys = parse_precomputekey(model)
    assert f"X{KEYSEP}X{KEYSEP}1{KEYSEP}A{KEYSEP}0" in keys
    assert f"X{KEYSEP}A{KEYSEP}1{KEYSEP}X{KEYSEP}0" in keys
    assert f"X{KEYSEP}X{KEYSEP}1{KEYSEP}X{KEYSEP}0" in keys
    assert f"X{KEYSEP}X{KEYSEP}2{KEYSEP}A{KEYSEP}0" in keys


def test_heterolinear_routing(rng):
    hl = HeteroLinear(4, 3, 2, True, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    t = jnp.asarray((rng.random(10) > 0.5).astype(np.int32))
    out = hl(x, t)
    W = np.asarray(hl.weight[...])
    b = np.asarray(hl.bias[...])
    expect = np.stack([x[i] @ W[int(t[i])] + b[int(t[i])]
                       for i in range(10)])
    assert maxdiff(out, expect) < TOL


def test_batchnorm_mask_excludes_padding(rng):
    from pygho_tpu.honn.utils import BatchNorm

    bn = BatchNorm(3, rngs=nnx.Rngs(0))
    x = rng.normal(size=(10, 3)).astype(np.float32)
    xpad = np.concatenate([x, 1000.0 * np.ones((5, 3), np.float32)])
    mask = np.arange(15) < 10
    out = bn(jnp.asarray(xpad), jnp.asarray(mask))
    # stats must come from the 10 real rows only
    expect = (x - x.mean(0)) / np.sqrt(x.var(0) + 1e-5)
    assert maxdiff(np.asarray(out)[:10], expect) < 1e-3


def test_mlp_numlayer0_identity():
    m = MLP(4, 4, 0, False, rngs=nnx.Rngs(0))
    x = jnp.ones((3, 4))
    assert maxdiff(m(x), x) == 0.0
