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
    """Copy reference torch MLP weights into the nnx MLP (norm='none')."""
    lins = [m for m in ref_mlp.lins if isinstance(m, torch.nn.Linear)] \
        if not isinstance(ref_mlp.lins, torch.nn.Identity) else []
    my_lins = list(my_mlp.hid_lins) + ([my_mlp.tail_lin]
                                       if my_mlp.tail_lin else [])
    assert len(lins) == len(my_lins), (len(lins), len(my_lins))
    for t, m in zip(lins, my_lins):
        m.kernel[...] = jnp.asarray(t.weight.detach().numpy().T)
        if t.bias is not None:
            m.bias[...] = jnp.asarray(t.bias.detach().numpy())


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
