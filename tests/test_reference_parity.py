"""Differential parity vs the actual reference implementation
(/root/reference/pygho, executed on torch CPU).

This is the BASELINE.md "per-layer activations allclose" requirement:
the same random graphs, the same weights, through the reference's torch
pipeline and through pygho_tpu — index arrays must match exactly and
layer outputs to float tolerance.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "pygho")),
                                reason="reference checkout not available")

if os.path.isdir(os.path.join(REF, "pygho")):
    sys.path.insert(0, REF)
    import torch

    # Conv.py imports torch_geometric.nn.HeteroLinear; shim it (only
    # SUNConv instantiates it)
    import types

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgn = types.ModuleType("torch_geometric.nn")

        class _HeteroLinear(torch.nn.Module):
            def __init__(self, indim, outdim, ntypes, bias=True):
                super().__init__()
                self.lins = torch.nn.ModuleList(
                    [torch.nn.Linear(indim, outdim, bias=bias)
                     for _ in range(ntypes)])

            def forward(self, x, t):
                out = torch.stack([l(x) for l in self.lins], dim=1)
                return out[torch.arange(x.shape[0]), t]

        tgn.HeteroLinear = _HeteroLinear
        tg.nn = tgn
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tgn

    from pygho.backend.SpTensor import SparseTensor as RefSparse
    from pygho.backend import Spspmm as RefSpspmm
    from pygho.backend.Spmm import spmm as ref_spmm
    from pygho.honn import Conv as RefConv

import jax
import jax.numpy as jnp
from flax import nnx

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor
from pygho_tpu.backend.spmm import spmm
from pygho_tpu.backend.spspmm import spspmm
from pygho_tpu.honn import conv as Conv
from pygho_tpu.honn.sp_operator import KEYSEP

from utils import maxdiff

TOL = 2e-5


def _instance(rng, n=13, density=0.45, d=8):
    """Random sparse A (edges) + X (2-hop tuples) shared by both stacks."""
    import scipy.sparse as ssp

    adj = (rng.random((n, n)) < density)
    adj = adj | adj.T
    np.fill_diagonal(adj, False)
    edges = np.stack(np.nonzero(adj)).astype(np.int64)
    spd = ssp.csgraph.shortest_path(
        ssp.coo_matrix((np.ones(edges.shape[1]),
                        (edges[0], edges[1])), (n, n)).tocsr(),
        unweighted=True)
    ii, jj = np.nonzero(spd <= 2)
    tup = np.stack([ii, jj]).astype(np.int64)
    Aval = rng.normal(size=(edges.shape[1], d)).astype(np.float32)
    Xval = rng.normal(size=(tup.shape[1], d)).astype(np.float32)
    return edges, Aval, tup, Xval, n, d


def test_index_parity(rng):
    """spspmm_ind / filterind produce identical index arrays."""
    edges, _, tup, _, n, d = _instance(rng)
    rtar, rbcd = RefSpspmm.spspmm_ind(torch.from_numpy(tup), 1,
                                      torch.from_numpy(edges), 0)
    racd = RefSpspmm.filterind(torch.from_numpy(tup), rtar, rbcd)
    tar, bcd = indexing.spspmm_ind(tup, 1, edges, 0)
    acd = indexing.filterind(tup, tar, bcd)
    assert np.array_equal(tar, rtar.numpy())
    # both sorted by target; compare as sets of triples (tie order within
    # a target may differ)
    def canon(x):
        return x[:, np.lexsort((x[2], x[1], x[0]))]
    assert np.array_equal(canon(acd), canon(racd.numpy()))


@pytest.mark.parametrize("aggr", ["sum", "mean", "max"])
def test_spmm_parity(rng, aggr):
    edges, Aval, _, _, n, d = _instance(rng)
    X = rng.normal(size=(n, d)).astype(np.float32)
    refA = RefSparse(torch.from_numpy(edges), torch.from_numpy(Aval),
                     shape=[n, n, d], is_coalesced=True)
    ref = ref_spmm(refA, 1, torch.from_numpy(X), aggr).detach().numpy()
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    got = np.asarray(spmm(A, 1, jnp.asarray(X), aggr))
    assert maxdiff(got[:n], ref) < TOL


@pytest.mark.parametrize("aggr", ["sum", "mean", "max"])
def test_spspmm_parity(rng, aggr):
    edges, Aval, tup, Xval, n, d = _instance(rng)
    tar, bcd = indexing.spspmm_ind(tup, 1, edges, 0)
    acd = indexing.filterind(tup, tar, bcd)
    # reference
    refX = RefSparse(torch.from_numpy(tup), torch.from_numpy(Xval),
                     shape=[n, n, d], is_coalesced=True)
    refA = RefSparse(torch.from_numpy(edges), torch.from_numpy(Aval),
                     shape=[n, n, d], is_coalesced=True)
    ref = RefSpspmm.spspmm(refX, 1, refA, 0, aggr,
                           acd=torch.from_numpy(acd),
                           tar_ind=torch.from_numpy(tup))
    # ours
    X = SparseTensor.from_numpy(tup, Xval, (n, n), is_coalesced=True)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    acd_p = jnp.asarray(indexing.pad_acd(
        acd, indexing.bucket_size(acd.shape[1])))
    got = spspmm(X, 1, A, 0, aggr, acd=acd_p, tarX=X)
    nv = tup.shape[1]
    assert maxdiff(np.asarray(got.values)[:nv],
                   ref.values.detach().numpy()) < TOL


def _sync_mlp(ref_mlp, my_mlp):
    """Copy reference torch MLP weights into the nnx MLP (norm='none').

    jnp.array (not asarray): on the CPU backend asarray can ALIAS the
    torch buffer, so later in-place torch optimizer updates would mutate
    the nnx params (bit us in the trajectory differential test)."""
    lins = [m for m in ref_mlp.lins if isinstance(m, torch.nn.Linear)] \
        if not isinstance(ref_mlp.lins, torch.nn.Identity) else []
    my_lins = list(my_mlp.hid_lins) + ([my_mlp.tail_lin]
                                       if my_mlp.tail_lin else [])
    assert len(lins) == len(my_lins), (len(lins), len(my_lins))
    for t, m in zip(lins, my_lins):
        m.kernel[...] = jnp.array(t.weight.detach().numpy().T)
        if t.bias is not None:
            m.bias[...] = jnp.array(t.bias.detach().numpy())


@pytest.mark.parametrize("convname", ["NGNN", "SSWL", "PPGN", "DSSGNN"])
def test_conv_layer_activation_parity(rng, convname):
    """Same graph, same weights: reference torch conv forward == ours."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    tar, bcd = indexing.spspmm_ind(tup, 1, edges, 0)
    acd = indexing.filterind(tup, tar, bcd)
    keyXA = f"X{KEYSEP}X{KEYSEP}1{KEYSEP}A{KEYSEP}0"
    keyAX = f"X{KEYSEP}A{KEYSEP}1{KEYSEP}X{KEYSEP}0"
    keyXX = f"X{KEYSEP}X{KEYSEP}1{KEYSEP}X{KEYSEP}0"
    ref_dd, my_dd = {}, {}
    for key, (i1, d1, i2, d2) in {keyXA: (tup, 1, edges, 0),
                                  keyAX: (edges, 1, tup, 0),
                                  keyXX: (tup, 1, tup, 0)}.items():
        t_, b_ = indexing.spspmm_ind(i1, d1, i2, d2)
        a_ = indexing.filterind(tup, t_, b_)
        ref_dd[f"{key}{KEYSEP}acd"] = torch.from_numpy(a_)
        my_dd[f"{key}{KEYSEP}acd"] = jnp.asarray(indexing.pad_acd(
            a_, indexing.bucket_size(a_.shape[1])))

    mlp_t = {"numlayer": 1, "tailact": True, "norm": "none", "act": "relu"}
    torch.manual_seed(0)
    if convname == "NGNN":
        ref_conv = RefConv.NGNNConv(d, d, "sum", "SS", dict(mlp_t))
        my_conv = Conv.NGNNConv(d, d, "sum", "SS", dict(mlp_t),
                                rngs=nnx.Rngs(0))
        pairs = [(ref_conv.lin, my_conv.lin)]
    elif convname == "SSWL":
        ref_conv = RefConv.SSWLConv(d, d, "sum", "SS", dict(mlp_t))
        my_conv = Conv.SSWLConv(d, d, "sum", "SS", dict(mlp_t),
                                rngs=nnx.Rngs(0))
        pairs = [(ref_conv.lin, my_conv.lin)]
    elif convname == "PPGN":
        ref_conv = RefConv.PPGNConv(d, d, "sum", "SS", dict(mlp_t))
        my_conv = Conv.PPGNConv(d, d, "sum", "SS", dict(mlp_t),
                                rngs=nnx.Rngs(0))
        pairs = [(ref_conv.lin1, my_conv.lin1),
                 (ref_conv.lin2, my_conv.lin2)]
    else:
        ref_conv = RefConv.DSSGNNConv(d, d, "sum", "sum", "mean", "SS",
                                      dict(mlp_t))
        my_conv = Conv.DSSGNNConv(d, d, "sum", "sum", "mean", "SS",
                                  dict(mlp_t), rngs=nnx.Rngs(0))
        pairs = [(ref_conv.lin, my_conv.lin)]
    for r, m in pairs:
        _sync_mlp(r, m)

    refX = RefSparse(torch.from_numpy(tup), torch.from_numpy(Xval),
                     shape=[n, n, d], is_coalesced=True)
    refA = RefSparse(torch.from_numpy(edges), torch.from_numpy(Aval),
                     shape=[n, n, d], is_coalesced=True)
    with torch.no_grad():
        ref_out = ref_conv.forward(refA, refX, ref_dd)
    X = SparseTensor.from_numpy(tup, Xval, (n, n), is_coalesced=True)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    my_conv.eval()
    my_out = my_conv(A, X, my_dd)
    nv = tup.shape[1]
    assert maxdiff(np.asarray(my_out.values)[:nv],
                   ref_out.values.detach().numpy()) < 1e-4


@pytest.mark.parametrize("convname", ["GNNAK", "SUN"])
def test_pooling_conv_activation_parity(rng, convname):
    """GNNAK / SUN (diag + subgraph/cross pooling + unpooling [+
    HeteroLinear diagonal routing]): reference forward == ours."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    keyXA = f"X{KEYSEP}X{KEYSEP}1{KEYSEP}A{KEYSEP}0"
    t_, b_ = indexing.spspmm_ind(tup, 1, edges, 0)
    a_ = indexing.filterind(tup, t_, b_)
    ref_dd = {f"{keyXA}{KEYSEP}acd": torch.from_numpy(a_)}
    my_dd = {f"{keyXA}{KEYSEP}acd": jnp.asarray(indexing.pad_acd(
        a_, indexing.bucket_size(a_.shape[1])))}

    mlp_t = {"numlayer": 1, "tailact": True, "norm": "none", "act": "relu"}
    torch.manual_seed(0)
    if convname == "GNNAK":
        ref_conv = RefConv.GNNAKConv(d, d, "sum", "mean", "SS",
                                     dict(mlp_t), dict(mlp_t))
        my_conv = Conv.GNNAKConv(d, d, "sum", "mean", "SS",
                                 dict(mlp_t), dict(mlp_t), rngs=nnx.Rngs(0))
        pairs = [(ref_conv.lin0, my_conv.lin0), (ref_conv.lin, my_conv.lin)]
    else:
        ref_conv = RefConv.SUNConv(d, d, "sum", "mean", "SS",
                                   dict(mlp_t), dict(mlp_t))
        my_conv = Conv.SUNConv(d, d, "sum", "mean", "SS",
                               dict(mlp_t), dict(mlp_t), rngs=nnx.Rngs(0))
        pairs = [(ref_conv.lin0, my_conv.lin0),
                 (ref_conv.lin1_1, my_conv.lin1_1)]
        # HeteroLinear: shim keeps per-type torch Linears; ours is a
        # (types, in, out) stacked einsum weight
        w = np.stack([l.weight.detach().numpy().T
                      for l in ref_conv.lin1_0.lins])
        my_conv.lin1_0.weight[...] = jnp.asarray(w)
    for r, m in pairs:
        _sync_mlp(r, m)

    refX = RefSparse(torch.from_numpy(tup), torch.from_numpy(Xval),
                     shape=[n, n, d], is_coalesced=True)
    refA = RefSparse(torch.from_numpy(edges), torch.from_numpy(Aval),
                     shape=[n, n, d], is_coalesced=True)
    with torch.no_grad():
        ref_out = ref_conv.forward(refA, refX, ref_dd)
    X = SparseTensor.from_numpy(tup, Xval, (n, n), is_coalesced=True)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    my_conv.eval()
    my_out = my_conv(A, X, my_dd)
    nv = tup.shape[1]
    assert maxdiff(np.asarray(my_out.values)[:nv],
                   ref_out.values.detach().numpy()) < 1e-4


def test_i2_conv_activation_parity(rng):
    """I2Conv on 3-tuples (dim-2 message passing): reference == ours."""
    import scipy.sparse as ssp

    edges, Aval, _, _, n, d = _instance(rng)
    spd = ssp.csgraph.shortest_path(
        ssp.coo_matrix((np.ones(edges.shape[1]),
                        (edges[0], edges[1])), (n, n)).tocsr(),
        unweighted=True)
    # per-edge 3-tuples (u, v, k) with k within 2 hops of u (I2 pattern)
    us, vs, ks = [], [], []
    for u, v in edges.T:
        kk = np.nonzero(spd[u] <= 2)[0]
        us.append(np.full(len(kk), u))
        vs.append(np.full(len(kk), v))
        ks.append(kk)
    tup3 = np.stack([np.concatenate(us), np.concatenate(vs),
                     np.concatenate(ks)]).astype(np.int64)
    tup3 = tup3[:, np.lexsort((tup3[2], tup3[1], tup3[0]))]
    Xval = rng.normal(size=(tup3.shape[1], d)).astype(np.float32)

    key = f"X{KEYSEP}X{KEYSEP}2{KEYSEP}A{KEYSEP}0"
    t_, b_ = indexing.spspmm_ind(tup3, 2, edges, 0)
    a_ = indexing.filterind(tup3, t_, b_)
    ref_dd = {f"{key}{KEYSEP}acd": torch.from_numpy(a_)}
    my_dd = {f"{key}{KEYSEP}acd": jnp.asarray(indexing.pad_acd(
        a_, indexing.bucket_size(a_.shape[1])))}

    mlp_t = {"numlayer": 1, "tailact": True, "norm": "none", "act": "relu"}
    torch.manual_seed(0)
    ref_conv = RefConv.I2Conv(d, d, "sum", "SS", dict(mlp_t))
    my_conv = Conv.I2Conv(d, d, "sum", "SS", dict(mlp_t), rngs=nnx.Rngs(0))
    _sync_mlp(ref_conv.lin, my_conv.lin)

    refX = RefSparse(torch.from_numpy(tup3), torch.from_numpy(Xval),
                     shape=[n, n, n, d], is_coalesced=True)
    refA = RefSparse(torch.from_numpy(edges), torch.from_numpy(Aval),
                     shape=[n, n, d], is_coalesced=True)
    with torch.no_grad():
        ref_out = ref_conv.forward(refA, refX, ref_dd)
    X = SparseTensor.from_numpy(tup3, Xval, (n, n, n), is_coalesced=True)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    my_conv.eval()
    my_out = my_conv(A, X, my_dd)
    nv = tup3.shape[1]
    assert maxdiff(np.asarray(my_out.values)[:nv],
                   ref_out.values.detach().numpy()) < 1e-4


def test_spspmpnn_parity(rng):
    """Generalized message passing (the spspmpnn path behind NGAT-style
    layers): same message function through both stacks."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    tar, bcd = indexing.spspmm_ind(tup, 1, edges, 0)
    acd = indexing.filterind(tup, tar, bcd)

    refX = RefSparse(torch.from_numpy(tup), torch.from_numpy(Xval),
                     shape=[n, n, d], is_coalesced=True)
    refA = RefSparse(torch.from_numpy(edges), torch.from_numpy(Aval),
                     shape=[n, n, d], is_coalesced=True)

    def msg_t(av, bv, cv, tar_ids):
        return torch.relu(av * bv) + 0.5 * cv

    ref = RefSpspmm.spspmpnn(refX, 1, refA, 0, refX,
                             torch.from_numpy(acd), msg_t, "sum")

    from pygho_tpu.backend.spspmm import spspmpnn

    X = SparseTensor.from_numpy(tup, Xval, (n, n), is_coalesced=True)
    A = SparseTensor.from_numpy(edges, Aval, (n, n), is_coalesced=True)
    acd_p = jnp.asarray(indexing.pad_acd(
        acd, indexing.bucket_size(acd.shape[1])))

    def msg_j(av, bv, cv, tar_ids):
        return jax.nn.relu(av * bv) + 0.5 * cv

    got = spspmpnn(X, 1, A, 0, X, acd_p, msg_j, "sum")
    nv = tup.shape[1]
    assert maxdiff(np.asarray(got.values)[:nv],
                   ref.values.detach().numpy()) < TOL


def test_masked_reduction_parity(rng):
    """MaskedTensor sum/mean/max match the reference's fill-then-reduce
    (min intentionally differs — reference bug #1, see PARITY.md)."""
    from pygho.backend.MaTensor import MaskedTensor as RefMasked

    from pygho_tpu.backend.matensor import MaskedTensor

    data = rng.normal(size=(3, 6, 4)).astype(np.float32)
    mask = rng.random((3, 6)) < 0.7
    # the reference constructor's fill is a no-op (PARITY.md bug #9);
    # pre-zero the masked entries so both sides see the same tensor
    data = data * mask[..., None]
    ref = RefMasked(torch.from_numpy(data.copy()),
                    torch.from_numpy(mask), is_filled=True)
    mine = MaskedTensor(jnp.asarray(data), jnp.asarray(mask))
    for op in ("sum", "mean", "max"):
        r = getattr(ref, op)(dims=1).data.detach().numpy()
        m = np.asarray(getattr(mine, op)(1).data)
        assert maxdiff(m, r) < TOL, op


def test_spmamm_sum_parity(rng):
    """spmamm with sum aggregation matches the reference (max/min differ
    deliberately: the reference's masked_fill is a no-op, PARITY.md)."""
    from pygho.backend.Spmamm import spmamm as ref_spmamm
    from pygho.backend.MaTensor import MaskedTensor as RefMasked

    from pygho_tpu.backend.matensor import MaskedTensor
    from pygho_tpu.backend.spmamm import spmamm
    from pygho_tpu.backend.sptensor import SparseTensor

    # tuple-level B (b, n, n, d): the reference's edge-value broadcast
    # only supports B with >= 2 masked dims (PARITY.md bug #10)
    b, n, d = 2, 6, 4
    keep = rng.random((b, n, n)) < 0.4
    vals = rng.normal(size=(b, n, n, d)).astype(np.float32) * keep[..., None]
    idx = np.nonzero(keep)
    ind = np.stack(idx).astype(np.int64)
    v = vals[idx]
    X = rng.normal(size=(b, n, n, d)).astype(np.float32)
    xmask = rng.random((b, n, n)) < 0.8
    X = X * xmask[..., None]

    refA = RefSparse(torch.from_numpy(ind), torch.from_numpy(v),
                     shape=[b, n, n, d], is_coalesced=True)
    refB = RefMasked(torch.from_numpy(X.copy()), torch.from_numpy(xmask),
                     is_filled=True)
    # Spmamm.py:62 calls masked_fill with non-broadcastable shapes AND
    # discards the result (bugs #2/#10); neutralize it to reach the
    # intended computation
    orig_mf = torch.Tensor.masked_fill
    torch.Tensor.masked_fill = lambda self, *a, **k: self
    try:
        ref = ref_spmamm(refA, 2, refB, 1, None,
                         "sum").data.detach().numpy()
    finally:
        torch.Tensor.masked_fill = orig_mf

    A = SparseTensor.from_numpy(ind, v, (b, n, n), is_coalesced=True)
    B = MaskedTensor(jnp.asarray(X), jnp.asarray(xmask))
    got = np.asarray(spmamm(A, 2, B, 1, None, "sum").data)
    assert maxdiff(got, ref) < 1e-4


def test_mamamm_parity(rng):
    from pygho.backend.Mamamm import mamamm as ref_mamamm
    from pygho.backend.MaTensor import MaskedTensor as RefMasked

    from pygho_tpu.backend.matensor import MaskedTensor
    from pygho_tpu.backend.mamamm import mamamm

    b, n, d = 2, 5, 4
    X1 = rng.normal(size=(b, n, n, d)).astype(np.float32)
    X2 = rng.normal(size=(b, n, n, d)).astype(np.float32)
    mask = rng.random((b, n, n)) < 0.7
    X1 = X1 * mask[..., None]   # pre-zero: reference fill is a no-op
    X2 = X2 * mask[..., None]
    ref = ref_mamamm(
        RefMasked(torch.from_numpy(X1.copy()), torch.from_numpy(mask), is_filled=True), 2,
        RefMasked(torch.from_numpy(X2.copy()), torch.from_numpy(mask), is_filled=True), 1,
        torch.from_numpy(mask)).data.detach().numpy()
    got = np.asarray(mamamm(
        MaskedTensor(jnp.asarray(X1), jnp.asarray(mask)), 2,
        MaskedTensor(jnp.asarray(X2), jnp.asarray(mask)), 1,
        jnp.asarray(mask)).data)
    assert maxdiff(got, ref) < 1e-4


def test_spsphadamard_parity(rng):
    """spsphadamard vs reference (result on B's pattern)."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    refA = RefSparse(torch.tensor(edges), torch.tensor(Aval), (n, n, d))
    refX = RefSparse(torch.tensor(tup), torch.tensor(Xval), (n, n, d))
    ref = RefSpspmm.spsphadamard(refX, refA)

    from pygho_tpu.backend.spspmm import spsphadamard

    A = SparseTensor.from_numpy(edges, Aval, (n, n), nnz_pad=256)
    X = SparseTensor.from_numpy(tup, Xval, (n, n), nnz_pad=256)
    nnzA = edges.shape[1]
    b2a = indexing.spsphadamard_ind(tup, edges)  # B(A) rows -> pos in X
    b2a_pad = np.full(256, -1, np.int64)
    b2a_pad[:nnzA] = b2a
    out = spsphadamard(X, A, jnp.asarray(b2a_pad))
    # ours keeps B's pattern with explicit zeros; the reference compacts
    # to the matched rows — compare there
    m = b2a >= 0
    assert np.array_equal(np.asarray(out.indices)[:, :nnzA][:, m],
                          ref.indices.numpy())
    assert maxdiff(np.asarray(out.values)[:nnzA][m],
                   ref.values.numpy()) < TOL
    assert np.all(np.asarray(out.values)[:nnzA][~m] == 0)


def test_diag_to_dense_parity(rng):
    edges, Aval, tup, Xval, n, d = _instance(rng)
    refX = RefSparse(torch.tensor(tup), torch.tensor(Xval), (n, n, d))
    ref = refX.diag(None).numpy()
    X = SparseTensor.from_numpy(tup, Xval, (n, n), nnz_pad=256)
    ours = np.asarray(X.diag(None))
    assert maxdiff(ours, ref) < TOL


def test_unpooling_parity(rng):
    """Sparse unpooling of a dim-1-reduced tensor back onto the tuple
    pattern, vs the reference's searchsorted broadcast."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    refX = RefSparse(torch.tensor(tup), torch.tensor(Xval), (n, n, d))
    ref_red = refX.sum([1], return_sparse=True)
    ref = ref_red.unpooling([1], refX)

    # host-side reduced tensor (unique remaining index + segment sum)
    roots, seg = np.unique(tup[0], return_inverse=True)
    red_val = np.zeros((roots.shape[0], d), np.float32)
    np.add.at(red_val, seg, Xval)
    red = SparseTensor.from_numpy(roots[None, :], red_val, (n,), nnz_pad=64)
    X = SparseTensor.from_numpy(tup, Xval, (n, n), nnz_pad=256)
    b2a = indexing.spsphadamard_ind(
        np.asarray(red.indices)[:, : roots.shape[0]], tup[:1])
    b2a_pad = np.full(X.nnz_pad, -1, np.int64)
    b2a_pad[: tup.shape[1]] = b2a
    out = red.unpooling([1], X, b2a=jnp.asarray(b2a_pad))
    nnz = tup.shape[1]
    assert np.array_equal(np.asarray(out.indices)[:, :nnz],
                          ref.indices.numpy())
    assert maxdiff(np.asarray(out.values)[:nnz], ref.values.numpy()) < TOL


def test_unpooling_fromdense1dim_parity(rng):
    edges, Aval, tup, Xval, n, d = _instance(rng)
    dense = rng.normal(size=(n, d)).astype(np.float32)
    refX = RefSparse(torch.tensor(tup), torch.tensor(Xval), (n, n, d))
    ref = refX.unpooling_fromdense1dim(0, torch.tensor(dense))
    X = SparseTensor.from_numpy(tup, Xval, (n, n), nnz_pad=256)
    out = X.unpooling_fromdense1dim(0, jnp.asarray(dense))
    nnz = tup.shape[1]
    assert maxdiff(np.asarray(out.values)[:nnz], ref.values.numpy()) < TOL


@pytest.mark.parametrize("reduce", ["sum", "mean", "max"])
def test_reduce_to_dense_parity(rng, reduce):
    edges, Aval, tup, Xval, n, d = _instance(rng)
    refX = RefSparse(torch.tensor(tup), torch.tensor(Xval), (n, n, d))
    ref = getattr(refX, reduce)([1], return_sparse=False).numpy()
    X = SparseTensor.from_numpy(tup, Xval, (n, n), nnz_pad=256)
    ours = np.asarray(getattr(X, reduce)([1]))
    assert maxdiff(ours[: ref.shape[0]], ref) < TOL


def _shim_torch_geometric_full():
    """Stub every torch_geometric submodule pygho.hodata imports (the
    reference's own k_hop_subgraph body is torch-pure)."""
    import types

    def mod(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        m.__path__ = []
        sys.modules[name] = m
        return m

    def maybe_num_nodes(ei, n=None):
        return n if n is not None else int(ei.max()) + 1

    mod("torch_geometric.data", Data=object, Batch=object, Dataset=object,
        InMemoryDataset=object)
    mod("torch_geometric.data.data", BaseData=object)
    mod("torch_geometric.data.datapipes", DatasetAdapter=object)
    mod("torch_geometric.loader", DataLoader=object)
    mod("torch_geometric.transforms", Compose=object)
    mod("torch_geometric.utils", to_scipy_sparse_matrix=None,
        k_hop_subgraph=None, coalesce=None)
    mod("torch_geometric.utils.num_nodes", maybe_num_nodes=maybe_num_nodes)
    mod("pqdm")
    mod("pqdm.processes", pqdm=None)
    mod("tqdm", tqdm=lambda x, *a, **k: x)


def test_k_hop_subgraph_reference_parity(rng):
    """Our numpy k_hop_subgraph vs the reference's torch implementation,
    all five outputs, incl. the directed=True last-frontier quirk."""
    _shim_torch_geometric_full()
    from pygho.hodata.SpTupleSampler import k_hop_subgraph as ref_khop
    from pygho_tpu.hodata.sp_sampler import k_hop_subgraph

    edges, _, _, _, n, _ = _instance(rng)
    tei = torch.tensor(edges)
    for root in (0, 5, [1, 4]):
        for hop in (1, 2, 3):
            for directed in (False, True):
                for flow in ("source_to_target", "target_to_source"):
                    r = ref_khop(root, hop, tei, relabel_nodes=True,
                                 num_nodes=n, flow=flow, directed=directed)
                    o = k_hop_subgraph(root, hop, edges, relabel_nodes=True,
                                       num_nodes=n, flow=flow,
                                       directed=directed)
                    for i, (a, b) in enumerate(zip(r, o)):
                        assert np.array_equal(a.numpy(), b), (
                            root, hop, directed, flow, i)


def _ma_instance(rng, b=3, n=7, d=5):
    data = rng.normal(size=(b, n, n, d)).astype(np.float32)
    mask = rng.random((b, n, n)) > 0.3
    return data, mask


def test_masked_diag_unpooling_parity(rng):
    """MaskedTensor diag / unpooling / diagonalapply vs the reference."""
    from pygho.backend.MaTensor import MaskedTensor as RefMasked
    from pygho_tpu.backend.matensor import MaskedTensor

    data, mask = _ma_instance(rng)
    ref = RefMasked(torch.tensor(data), torch.tensor(mask))
    ours = MaskedTensor(jnp.asarray(data), jnp.asarray(mask))

    # NOTE the reference's padvalue bookkeeping makes fill_masked(0.0) a
    # no-op on freshly built tensors (masked slots hold raw data), so all
    # comparisons are at valid positions only
    def valid(ref_mt, our_mt):
        rm = ref_mt.mask.numpy()
        assert np.array_equal(np.asarray(our_mt.mask), rm)
        return (ref_mt.data.numpy()[rm],
                np.asarray(our_mt.fill_masked(0.0))[rm])

    rd = ref.diag([1, 2])
    od = ours.diag([1, 2])
    a, b = valid(rd, od)
    assert maxdiff(b, a) < TOL

    ru = rd.unpooling([2], ref)
    ou = od.unpooling([2], ours)
    a, b = valid(ru, ou)
    assert maxdiff(b, a) < TOL

    rda = ref.diagonalapply(
        lambda x, t: x + t.unsqueeze(-1).to(torch.float32))
    oda = ours.diagonalapply(lambda x, t: x + t[..., None].astype(jnp.float32))
    a, b = valid(rda, oda)
    assert maxdiff(b, a) < TOL


def test_masked_add_catvalue_parity(rng):
    from pygho.backend.MaTensor import MaskedTensor as RefMasked
    from pygho_tpu.backend.matensor import MaskedTensor

    data, mask = _ma_instance(rng)
    data2, _ = _ma_instance(rng)
    ref1 = RefMasked(torch.tensor(data), torch.tensor(mask))
    ref2 = RefMasked(torch.tensor(data2), torch.tensor(mask))
    o1 = MaskedTensor(jnp.asarray(data), jnp.asarray(mask))
    o2 = MaskedTensor(jnp.asarray(data2), jnp.asarray(mask))

    ra = ref1.add(ref2, True)
    oa = o1.add(o2, True)
    rm = ra.mask.numpy()
    assert maxdiff(np.asarray(oa.fill_masked(0.0))[rm],
                   ra.data.numpy()[rm]) < TOL

    rc = ref1.catvalue([ref2], True)
    oc = o1.catvalue([o2], True)
    rm = rc.mask.numpy()
    assert maxdiff(np.asarray(oc.fill_masked(0.0))[rm],
                   rc.data.numpy()[rm]) < TOL


def test_dense_converter_parity(rng):
    """to_dense_adj / to_sparse_adj / to_dense_x / to_dense_tuplefeat vs
    the reference (MaData.py:25-215), valid positions only (the
    reference's lazy padvalue fill leaves garbage at masked slots)."""
    _shim_torch_geometric_full()
    from pygho.hodata import MaData as RefMa
    from pygho_tpu.hodata import ma_data

    # --- shared instance: 3 graphs, concatenated-with-batch-vector form
    ns = [5, 7, 4]
    edges, batches, attrs, xs, ptr = [], [], [], [], [0]
    for g, n in enumerate(ns):
        adj = rng.random((n, n)) < 0.5
        np.fill_diagonal(adj, False)
        ei = np.stack(np.nonzero(adj)).astype(np.int64)
        edges.append(ei)
        batches.append(np.full(ei.shape[1], g, np.int64))
        attrs.append(rng.normal(size=(ei.shape[1], 3)).astype(np.float32))
        xs.append(rng.normal(size=(n, 4)).astype(np.float32))
        ptr.append(ptr[-1] + n)
    ei = np.concatenate(edges, axis=1)
    eb = np.concatenate(batches)
    ea = np.concatenate(attrs, axis=0)
    x = np.concatenate(xs, axis=0)
    ptr = np.asarray(ptr, np.int64)
    nmax = max(ns)

    # --- to_dense_adj
    r = RefMa.to_dense_adj(torch.tensor(ei), torch.tensor(eb),
                           torch.tensor(ea), max_num_nodes=nmax)
    o = ma_data.to_dense_adj(ei, eb, ea, max_num_nodes=nmax)
    rm = r.mask.numpy()
    assert np.array_equal(np.asarray(o.mask), rm)
    assert maxdiff(np.asarray(o.fill_masked(0.0))[rm],
                   r.data.numpy()[rm]) < TOL

    # --- to_sparse_adj
    rs = RefMa.to_sparse_adj(torch.tensor(ei), torch.tensor(eb),
                             torch.tensor(ea), max_num_nodes=nmax)
    os_ = ma_data.to_sparse_adj(ei, eb, ea, max_num_nodes=nmax)
    k = int(os_.nnz)
    assert np.array_equal(np.asarray(os_.indices)[:, :k],
                          rs.indices.numpy())
    assert maxdiff(np.asarray(os_.values)[:k], rs.values.numpy()) < TOL
    assert os_.sparseshape == tuple(rs.sparseshape)

    # --- to_dense_x
    rx = RefMa.to_dense_x(torch.tensor(x), torch.tensor(ptr))
    ox = ma_data.to_dense_x(x, ptr)
    rm = rx.mask.numpy()
    assert np.array_equal(np.asarray(ox.mask), rm)
    assert maxdiff(np.asarray(ox.fill_masked(0.0))[rm],
                   rx.data.numpy()[rm]) < TOL

    # --- to_dense_tuplefeat (2-tuples, per-graph (n_g, n_g) shapes)
    tshape = np.asarray([[n, n] for n in ns], np.int64)
    tf = [rng.normal(size=(n * n, 2)).astype(np.float32) for n in ns]
    tptr = np.concatenate([[0], np.cumsum([n * n for n in ns])]).astype(np.int64)
    tfc = np.concatenate(tf, axis=0)
    rt = RefMa.to_dense_tuplefeat(torch.tensor(tfc), torch.tensor(tshape),
                                  torch.tensor(tptr))
    ot = ma_data.to_dense_tuplefeat(tfc, tshape, tptr)
    rm = rt.mask.numpy()
    assert np.array_equal(np.asarray(ot.mask), rm)
    assert maxdiff(np.asarray(ot.fill_masked(0.0))[rm],
                   rt.data.numpy()[rm]) < TOL

    # feat2mask refinement path
    f2m = lambda f: (f[..., 0] > 0) if hasattr(f, "shape") else None
    rt2 = RefMa.to_dense_tuplefeat(
        torch.tensor(tfc), torch.tensor(tshape), torch.tensor(tptr),
        feat2mask=lambda f: f[..., 0] > 0)
    ot2 = ma_data.to_dense_tuplefeat(tfc, tshape, tptr, feat2mask=f2m)
    rm2 = rt2.mask.numpy()
    assert np.array_equal(np.asarray(ot2.mask), rm2)
    assert maxdiff(np.asarray(ot2.fill_masked(0.0))[rm2],
                   rt2.data.numpy()[rm2]) < TOL


def test_add_union_parity(rng):
    """add(samesparse=False) via the host union plan matches the
    reference's eager concat+coalesce (SpTensor.py:507-514)."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    # two different patterns over the same shape
    indA, indB = edges, tup
    va = rng.normal(size=(indA.shape[1], d)).astype(np.float32)
    vb = rng.normal(size=(indB.shape[1], d)).astype(np.float32)

    refA = RefSparse(torch.tensor(indA), torch.tensor(va), (n, n, d))
    refB = RefSparse(torch.tensor(indB), torch.tensor(vb), (n, n, d))
    refO = refA.add(refB, samesparse=False)

    A = SparseTensor.from_numpy(indA, va, (n, n), nnz_pad=512)
    B = SparseTensor.from_numpy(indB, vb, (n, n), nnz_pad=512)
    plan = indexing.union_ind(indA, indB)
    out = A.add(B, samesparse=False, union=plan)
    # index parity
    nz = int(out.nnz)
    assert np.array_equal(np.asarray(out.indices)[:, :nz],
                          refO.indices.numpy())
    assert maxdiff(np.asarray(out.values)[:nz],
                   refO.values.numpy()) < TOL


def test_sparse_diag_parity(rng):
    """diag(return_sparse=True) via diag_ind matches the reference's
    _diag_to_sparse intent: diagonal entries on the reduced pattern."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    # add the full diagonal to the tuple pattern so there is one
    tup2 = np.concatenate([tup, np.stack([np.arange(n)] * 2)], axis=1)
    order = np.lexsort((tup2[1], tup2[0]))
    tup2 = np.unique(tup2[:, order], axis=1)
    v = rng.normal(size=(tup2.shape[1], d)).astype(np.float32)
    X = SparseTensor.from_numpy(tup2, v, (n, n), nnz_pad=512)
    pat = indexing.diag_ind(tup2)
    out = X.diag(return_sparse=True, diag_pattern=pat)
    # oracle: entries at (i, i)
    on = tup2[0] == tup2[1]
    assert int(out.nnz) == int(on.sum())
    nz = int(out.nnz)
    assert np.array_equal(np.asarray(out.indices)[0, :nz], tup2[0][on])
    assert maxdiff(np.asarray(out.values)[:nz], v[on]) < TOL
    # and it matches the dense diag on the same rows
    dd = np.asarray(X.diag_to_dense())
    assert maxdiff(np.asarray(out.values)[:nz], dd[tup2[0][on]]) < TOL


def test_sparse_unpooling_parity(rng):
    """Generic sparse->sparse unpooling via unpooling_ind matches the
    reference's unpooling (SpTensor.py:447-468)."""
    edges, Aval, tup, Xval, n, d = _instance(rng)
    # src: per-node sparse vector (pattern = diagonal-ish subset)
    src_ind = np.unique(tup[0])[None, :]      # (1, m) sorted
    sv = rng.normal(size=(src_ind.shape[1], d)).astype(np.float32)

    refS = RefSparse(torch.tensor(src_ind), torch.tensor(sv), (n, d))
    refT = RefSparse(torch.tensor(tup),
                     torch.tensor(np.zeros((tup.shape[1], d), np.float32)),
                     (n, n, d))
    refO = refS.unpooling(1, refT)            # broadcast along dim 1 of tar

    S = SparseTensor.from_numpy(src_ind, sv, (n,), nnz_pad=128)
    T = SparseTensor.from_numpy(tup, np.zeros((tup.shape[1], d), np.float32),
                                (n, n), nnz_pad=512)
    b2a = indexing.unpooling_ind(src_ind, np.asarray(T.indices), dims=[1])
    out = S.unpooling([1], T, b2a=jnp.asarray(b2a))
    nz = int(out.nnz)
    assert np.array_equal(np.asarray(out.indices)[:, :nz],
                          refO.indices.numpy())
    assert maxdiff(np.asarray(out.values)[:nz], refO.values.numpy()) < TOL


def test_cosine_restart_scheduler_parity_tmult():
    """cosine_warm_restarts matches the reference scheduler epoch by
    epoch for general T_mult (reference example/lr_scheduler.py:30-53),
    including the polynomial restart-amplitude decay."""
    import importlib.util

    import torch.optim.lr_scheduler as _tls

    class _CompatLRS(_tls.LRScheduler):
        # this torch dropped the positional ``verbose`` arg the
        # reference still passes
        def __init__(self, optimizer, last_epoch=-1, verbose=False):
            super().__init__(optimizer, last_epoch)

    spec = importlib.util.spec_from_file_location(
        "ref_lr_scheduler", os.path.join(REF, "example/lr_scheduler.py"))
    ref_mod = importlib.util.module_from_spec(spec)
    orig = _tls.LRScheduler
    _tls.LRScheduler = _CompatLRS
    try:
        spec.loader.exec_module(ref_mod)
    finally:
        _tls.LRScheduler = orig

    from pygho_tpu.models.training import cosine_warm_restarts

    for T_mult in (1, 2, 3):
        for K, K2 in ((0.0, 0.0), (0.5, 0.25)):
            p = torch.nn.Parameter(torch.zeros(1))
            opt = torch.optim.SGD([p], lr=1e-3)
            ref = ref_mod.CosineAnnealingWarmRestarts(
                opt, T_0=7, T_mult=T_mult, eta_min=1e-5, K=K, K2=K2)
            sched = cosine_warm_restarts(1e-3, T0=7, steps_per_epoch=1,
                                         eta_min=1e-5, K=K, K2=K2,
                                         T_mult=T_mult)
            # implicit stepping (scheduler.step() once per epoch) — the
            # mode the reference examples use; the epoch-indexed
            # step(epoch) branch never updates num_cos, so amplitude
            # decay only exists on this path
            for epoch in range(60):
                got = float(sched(epoch))
                want = opt.param_groups[0]["lr"]
                assert abs(got - want) < 1e-9 + 1e-5 * want, (
                    T_mult, K, epoch, got, want)
                ref.step()


def test_training_trajectory_differential():
    """Training-trajectory differential (BASELINE metric c): the same
    tiny dataset and the same initial weights, trained full-batch for N
    Adam steps through the reference torch stack
    (/root/reference/example/zinc.py:225-294 SpModel + honn.Conv) and
    through pygho_tpu's production path (collate_sparse ->
    make_sparse_steps), must produce the same per-step loss trajectory.

    This is stronger than per-layer activation parity: it covers the
    full forward (encoders, tupleinit, conv stack, pooling, heads), the
    backward through every op, and the optimizer (optax.adamw(wd=0) vs
    torch Adam) over multiple steps, including pygho_tpu's padding
    machinery (pad tuple/node/graph rows must contribute exactly
    nothing to losses or gradients).
    """
    from functools import partial

    import torch.nn as tnn
    import torch.nn.functional as tF

    from pygho.backend.utils import torch_scatter_reduce
    from pygho.honn.TensorOp import OpPoolingSubg2D as RefPoolSubg2D
    from pygho.honn.utils import MLP as RefMLP

    from pygho_tpu.backend.indexing import PAD_INDEX
    from pygho_tpu.hodata import Sppretransform
    from pygho_tpu.hodata.sp_data import collate_sparse
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import make_optimizer, make_sparse_steps

    d, L, G, STEPS = 16, 2, 6, 10
    mlp_t = {"norm": "none", "act": "silu"}

    model = make_sp_model("NGNN", num_layer=L, hiddim=d, outlayer=2,
                          npool="sum", lpool="mean", mlp=dict(mlp_t))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=G, seed=11)
    pre = Sppretransform(partial(KhopSampler, hop=2), [""], keys)
    datas = [pre(g) for g in graphs]
    batch = collate_sparse(datas, keys, num_graphs=G)

    # ---- unpadded views for the torch side ------------------------------
    key = keys[0]
    nnz = int(batch["num_tuples"])
    E = int(batch["num_edges"])
    N = int(batch["num_nodes"])
    acd = np.asarray(batch[f"{key}{KEYSEP}acd"])
    acd = acd[:, acd[0] < PAD_INDEX]
    t_tid = torch.from_numpy(
        np.asarray(batch["tupleid"])[:, :nnz].astype(np.int64))
    t_tf = torch.from_numpy(
        np.asarray(batch["tuplefeat"])[:nnz].reshape(nnz).astype(np.int64))
    t_ei = torch.from_numpy(
        np.asarray(batch["edge_index"])[:, :E].astype(np.int64))
    t_ea = torch.from_numpy(
        np.asarray(batch["edge_attr"])[:E].reshape(E).astype(np.int64))
    t_x = torch.from_numpy(
        np.asarray(batch["x"])[:N].reshape(N).astype(np.int64))
    t_bvec = torch.from_numpy(
        np.asarray(batch["batch"])[:N].astype(np.int64))
    t_y = torch.from_numpy(np.asarray(batch["y"], np.float32))
    ref_dd = {f"{k}{KEYSEP}acd": torch.from_numpy(
        np.asarray(batch[f"{k}{KEYSEP}acd"])[
            :, np.asarray(batch[f"{k}{KEYSEP}acd"])[0] < PAD_INDEX]
        .astype(np.int64)) for k in keys}

    class Twin(tnn.Module):
        """The reference SpModel (example/zinc.py:216-294) specialized
        to NGNN/hop-2/mlplayer-1, assembled from the reference's own
        ops so torch autograd trains the genuine article."""

        def __init__(self):
            super().__init__()
            self.x_enc = tnn.Embedding(32, d)
            self.ea_enc = tnn.Embedding(16, d)
            self.tf_enc = tnn.Embedding(16, d)
            self.lin0 = tnn.Linear(d, d)
            self.lin1 = tnn.Linear(d, d)
            mt = {"numlayer": 1, "tailact": True, **mlp_t}
            self.convs = tnn.ModuleList(
                [RefConv.NGNNConv(d, d, "sum", "SS", dict(mt))
                 for _ in range(L)])
            self.lpool = RefPoolSubg2D("S", "mean")
            self.poolmlp = RefMLP(d, d, 1, tailact=True, **mlp_t)
            self.pred = RefMLP(d, 1, 2, tailact=False, **mlp_t)

        def forward(self):
            x = self.x_enc(t_x)
            A = RefSparse(t_ei, self.ea_enc(t_ea), shape=[N, N, d],
                          is_coalesced=True)
            Xv = self.tf_enc(t_tf)
            Xv = self.lin0(x)[t_tid[0]] * self.lin1(x)[t_tid[1]] * Xv
            X = RefSparse(t_tid, Xv, shape=[N, N, d], is_coalesced=True)
            for conv in self.convs:
                X = X.add(conv.forward(A, X, ref_dd), True)
            xn = self.poolmlp(self.lpool(X))
            hg = torch_scatter_reduce(0, xn, t_bvec, G, "sum")
            return self.pred(hg)

    torch.manual_seed(0)
    twin = Twin()

    # ---- copy the torch init into the nnx model -------------------------
    enc = model.data_encoder
    for t_emb, m_emb in ((twin.x_enc, enc.x_encoder),
                         (twin.ea_enc, enc.ea_encoder),
                         (twin.tf_enc, enc.tuplefeat_encoder)):
        m_emb.embedding[...] = jnp.array(t_emb.weight.detach().numpy())
    for t_lin, m_lin in ((twin.lin0, model.lin_tupleinit0),
                         (twin.lin1, model.lin_tupleinit1)):
        m_lin.kernel[...] = jnp.array(t_lin.weight.detach().numpy().T)
        m_lin.bias[...] = jnp.array(t_lin.bias.detach().numpy())
    for t_conv, m_conv in zip(twin.convs, model.subggnns):
        _sync_mlp(t_conv.lin, m_conv.lin)
    _sync_mlp(twin.poolmlp, model.poolmlp)
    _sync_mlp(twin.pred, model.pred_lin)

    # ---- train both, full batch -----------------------------------------
    t_opt = torch.optim.Adam(twin.parameters(), lr=1e-3)
    ref_losses = []
    for _ in range(STEPS):
        t_opt.zero_grad()
        loss = tF.l1_loss(twin().flatten(), t_y.flatten())
        loss.backward()
        ref_losses.append(float(loss))
        t_opt.step()

    opt = make_optimizer(model, 1e-3)
    train_step, _ = make_sparse_steps()
    my_losses = [float(train_step(model, opt, batch)) for _ in range(STEPS)]

    # f32 reductions in different orders drift slowly; the trajectories
    # must track each other far tighter than the loss moves step to step
    for i, (a, b) in enumerate(zip(ref_losses, my_losses)):
        assert abs(a - b) < 3e-4, (i, ref_losses, my_losses)
