"""Published HOGNN layers (reference pygho/honn/Conv.py).

Seven conv layers composed from the L3 operators; each supports the mode
strings of the reference ("SS"/"SD"/"DD" where applicable).  All MLPs are
mask-aware (padded rows / padded dense slots never leak into batch-norm
statistics).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
from flax import nnx

from ..backend.sptensor import SparseTensor
from ..backend.matensor import MaskedTensor
from . import tensorop as TensorOp
from .utils import MLP, HeteroLinear

Tensorish = Union[SparseTensor, MaskedTensor]


def _mask_of(X: Tensorish):
    return X.rowmask if isinstance(X, SparseTensor) else X.mask


def _apply(X: Tensorish, lin: MLP) -> Tensorish:
    """tuplewiseapply with the validity mask forwarded to the MLP's norms."""
    m = _mask_of(X)
    return X.tuplewiseapply(lambda v: lin(v, m))


class NGNNConv(nnx.Module):
    """Nested GNN layer: X <- MP_subg2D(A, MLP(X))
    (reference Conv.py:20-58; Zhang & Li, NeurIPS 2021)."""

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 mode: str = "SS", mlp: dict = {}, optuplefeat: str = "X",
                 opadj: str = "A", message_func: Optional[Callable] = None,
                 *, rngs: nnx.Rngs):
        self.aggr = TensorOp.OpMessagePassingOnSubg2D(
            mode, aggr, optuplefeat, opadj, message_func)
        self.lin = MLP(indim, outdim, rngs=rngs, **mlp)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        tX = _apply(X, self.lin)
        return self.aggr(A, tX, datadict, tX)

    forward = __call__


class SSWLConv(nnx.Module):
    """Subgraph WL layer: cat[X, MP_subg(A,X), MP_cross(A,X)] -> MLP
    (reference Conv.py:62-103; B. Zhang et al., ICML 2023)."""

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 mode: str = "SS", mlp: dict = {}, optuplefeat: str = "X",
                 opadj: str = "A", *, rngs: nnx.Rngs):
        self.aggr1 = TensorOp.OpMessagePassingOnSubg2D(
            mode, aggr, optuplefeat, opadj)
        self.aggr2 = TensorOp.OpMessagePassingCrossSubg2D(
            mode, aggr, optuplefeat, opadj)
        self.lin = MLP(3 * indim, outdim, rngs=rngs, **mlp)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        X1 = self.aggr1(A, X, datadict, X)
        X2 = self.aggr2(A, X, datadict, X)
        return _apply(X.catvalue([X1, X2], True), self.lin)

    forward = __call__


class I2Conv(nnx.Module):
    """I2-GNN layer on 3-tuples: X <- MP_subg3D(A, MLP(X))
    (reference Conv.py:107-147; Huang et al., ICLR 2023)."""

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 mode: str = "SS", mlp: dict = {}, optuplefeat: str = "X",
                 opadj: str = "A", *, rngs: nnx.Rngs):
        self.aggr = TensorOp.OpMessagePassingOnSubg3D(
            mode, aggr, optuplefeat, opadj)
        self.lin = MLP(indim, outdim, rngs=rngs, **mlp)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        tX = _apply(X, self.lin)
        return self.aggr(A, tX, datadict, tX)

    forward = __call__


class DSSGNNConv(nnx.Module):
    """ESAN/DSS layer: cat[MP_subg(A,X), unpool(nodeMP(A, pool_cross(X)))]
    -> MLP (reference Conv.py:151-196; Bevilacqua et al., ICLR 2022)."""

    def __init__(self, indim: int, outdim: int, aggr_subg: str = "sum",
                 aggr_global: str = "sum", pool: str = "mean",
                 mode: str = "SS", mlp: dict = {}, optuplefeat: str = "X",
                 opadj: str = "A", *, rngs: nnx.Rngs):
        self.aggr_subg = TensorOp.OpMessagePassingOnSubg2D(
            mode, aggr_subg, optuplefeat, opadj)
        self.pool2global = TensorOp.OpPoolingCrossSubg2D(mode[1], pool)
        self.aggr_global = TensorOp.OpNodeMessagePassing(mode, aggr_global)
        self.unpooling2subg = TensorOp.OpUnpoolingRootNodes2D(mode[1])
        self.lin = MLP(2 * indim, outdim, rngs=rngs, **mlp)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        X1 = self.unpooling2subg(self.aggr_global(A, self.pool2global(X)), X)
        X2 = self.aggr_subg(A, X, datadict, X)
        return _apply(X2.catvalue(X1, True), self.lin)

    forward = __call__


class PPGNConv(nnx.Module):
    """Provably-powerful GN layer: 2-FWL product MLP1(X) @ MLP2(X)
    (reference Conv.py:200-236; Maron et al., NeurIPS 2019)."""

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 mode: str = "SS", mlp: dict = {}, optuplefeat: str = "X",
                 *, rngs: nnx.Rngs):
        self.op = TensorOp.Op2FWL(mode, aggr, optuplefeat)
        self.lin1 = MLP(indim, outdim, rngs=rngs, **mlp)
        self.lin2 = MLP(indim, outdim, rngs=rngs, **mlp)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        return self.op(_apply(X, self.lin1), _apply(X, self.lin2),
                       datadict, X)

    forward = __call__


class GNNAKConv(nnx.Module):
    """GNN-as-kernel layer: MP then cat[unpool(diag), unpool(pool_subg),
    unpool(pool_cross)] -> MLP (reference Conv.py:240-297; Zhao et al.,
    ICLR 2022)."""

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 pool: str = "mean", mode: str = "SS", mlp0: dict = {},
                 mlp1: dict = {}, ctx: bool = True, optuplefeat: str = "X",
                 opadj: str = "A", *, rngs: nnx.Rngs):
        self.lin0 = MLP(indim, indim, rngs=rngs, **mlp0)
        self.aggr = TensorOp.OpMessagePassingOnSubg2D(
            mode, aggr, optuplefeat, opadj)
        self.diag = TensorOp.OpDiag2D(mode[1])
        self.pool2subg = TensorOp.OpPoolingSubg2D(mode[1], pool)
        self.unpool4subg = TensorOp.OpUnpoolingSubgNodes2D(mode[1])
        self.ctx = ctx
        if ctx:
            self.pool2node = TensorOp.OpPoolingCrossSubg2D(mode[1], pool)
            self.unpool4rootnode = TensorOp.OpUnpoolingRootNodes2D(mode[1])
        self.lin = MLP(3 * indim if ctx else 2 * indim, outdim,
                       rngs=rngs, **mlp1)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        X = self.aggr(A, _apply(X, self.lin0), datadict, X)
        X1 = self.unpool4subg(self.diag(X), X)
        X2 = self.unpool4subg(self.pool2subg(X), X)
        if self.ctx:
            X3 = self.unpool4rootnode(self.pool2node(X), X)
            return _apply(X2.catvalue([X1, X3], True), self.lin)
        return _apply(X2.catvalue(X1, True), self.lin)

    forward = __call__


class SUNConv(nnx.Module):
    """SUN layer: 7-branch concat + diagonal-vs-offdiagonal HeteroLinear +
    MLP (reference Conv.py:301-363; Frasca et al., NeurIPS 2022)."""

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 pool: str = "mean", mode: str = "SS", mlp0: dict = {},
                 mlp1: dict = {}, optuplefeat: str = "X", opadj: str = "A",
                 *, rngs: nnx.Rngs):
        self.lin0 = MLP(indim, indim, rngs=rngs, **mlp0)
        self.aggr = TensorOp.OpMessagePassingOnSubg2D(
            mode, aggr, optuplefeat, opadj)
        self.diag = TensorOp.OpDiag2D(mode[1])
        self.pool2subg = TensorOp.OpPoolingSubg2D(mode[1], pool)
        self.unpool4subg = TensorOp.OpUnpoolingSubgNodes2D(mode[1])
        self.pool2node = TensorOp.OpPoolingCrossSubg2D(mode[1], pool)
        self.unpool4rootnode = TensorOp.OpUnpoolingRootNodes2D(mode[1])
        self.lin1_0 = HeteroLinear(7 * indim, indim, 2, False, rngs=rngs)
        self.lin1_1 = MLP(indim, outdim, rngs=rngs, **mlp1)

    def __call__(self, A: Tensorish, X: Tensorish, datadict: Dict) -> Tensorish:
        X4 = self.aggr(A, _apply(X, self.lin0), datadict, X)
        Xdiag = self.diag(X)
        X1 = X
        X2 = self.unpool4subg(Xdiag, X)
        X3 = self.unpool4rootnode(Xdiag, X)
        X5 = self.unpool4rootnode(self.pool2node(X), X)
        X6 = self.unpool4subg(self.pool2subg(X), X)
        X7 = self.unpool4rootnode(self.pool2node(X4), X)
        Xc = X1.catvalue([X2, X3, X4, X5, X6, X7], True)
        Xc = Xc.diagonalapply(self.lin1_0)
        return _apply(Xc, self.lin1_1)

    forward = __call__


class NGATConv(nnx.Module):
    """Attention-based nested-subgraph conv (subgraph GAT).

    The reference documents this pattern via spspmpnn's message_func
    (docs/BasicOperators.md:75-83) and its reproduce.sh references an
    example/NGAT.py that is absent from the snapshot; this is a concrete
    implementation: per-channel attention scores, softmax-normalized over
    each target tuple's in-neighborhood, sparse ("SS") mode.

        alpha_{ij<-ik} = softmax_k( att1(X_ik) * attA(A_kj) * att2(X_ij) )
        X'_ij          = sum_k alpha * att3(X_ik)
    """

    def __init__(self, indim: int, outdim: int, aggr: str = "sum",
                 mode: str = "SS", mlp: dict = {}, optuplefeat: str = "X",
                 opadj: str = "A", *, rngs: nnx.Rngs):
        from . import sp_operator as SpOperator

        assert mode == "SS", "NGATConv is sparse-only (spspmpnn path)"
        self.att1 = nnx.Linear(indim, outdim, rngs=rngs)
        self.attA = nnx.Linear(indim, outdim, rngs=rngs)
        self.att2 = nnx.Linear(indim, outdim, rngs=rngs)
        self.att3 = nnx.Linear(indim, outdim, rngs=rngs)
        self.lin = MLP(indim, outdim, rngs=rngs, **mlp)
        self.aggr_str = aggr
        # registers the precompute key for parse_precomputekey; the actual
        # dispatch happens via spspmpnn below (the message closure needs
        # call-time statics)
        self.keyop = SpOperator.OpMessagePassing(
            optuplefeat, optuplefeat, 1, opadj, 0, aggr)

    def _att_proj(self, xv, av):
        """The four attention projections as TWO matmuls: att1/att2/att3
        share the input plane, so one (d, 3*d) concatenated weight reads
        ``xv`` once instead of three times.  Under fast math on TPU the
        matmuls run in bf16 with f32 accumulation — the downstream fused
        kernels cast their operands to bf16 on entry anyway, and the r5
        ablation (runs/ngat_ablate_r4.json) showed the f32 projections'
        multi-pass MXU decomposition was ~13 ms of the 35.5 ms step.
        Exact math (and CPU, where the parity tests run) keeps f32.
        Gradients flow to the per-Linear params through the concat."""
        import jax
        import jax.numpy as jnp

        from ..kernels.fused_spspmm import get_fused_math

        W = jnp.concatenate([self.att1.kernel.value,
                             self.att2.kernel.value,
                             self.att3.kernel.value], axis=1)
        b = jnp.concatenate([self.att1.bias.value,
                             self.att2.bias.value,
                             self.att3.bias.value])
        WA, bA = self.attA.kernel.value, self.attA.bias.value
        o = self.att1.kernel.value.shape[1]
        # get_fused_math() returns the EXACT flag (True = exact f32);
        # bf16 projections only under FAST math
        if not get_fused_math() and jax.default_backend() == "tpu":
            proj = jnp.dot(xv.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) + b
            aA = jnp.dot(av.astype(jnp.bfloat16), WA.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + bA
        else:
            proj = jnp.dot(xv, W) + b
            aA = jnp.dot(av, WA) + bA
        return proj[:, :o], proj[:, o:2 * o], proj[:, 2 * o:], aA

    def __call__(self, A: SparseTensor, X: SparseTensor,
                 datadict: Dict) -> SparseTensor:
        from ..backend.segment import segment_reduce, segment_softmax
        from ..backend.spspmm import spspmpnn
        from .sp_operator import KEYSEP

        tX = _apply(X, self.lin)
        nseg = tX.nnz_pad
        key = self.keyop.precomputekey
        acd = datadict[f"{key}{KEYSEP}acd"]
        attplan1 = datadict.get(f"{key}{KEYSEP}attplan1", None)
        if (attplan1 is not None and self.aggr_str == "sum"
                and A.values is not None and tX.values.ndim == 2
                and tX.values.shape[1] % 128 == 0
                and A.values.shape[-1] == tX.values.shape[1]):
            # single-launch fused attention (kernels/strip_attention):
            # the whole score -> softmax -> aggregate chain is one strip
            # launch per pass (fwd + three gradient roles), e is never
            # materialized in HBM; only the final division runs on XLA
            import jax.numpy as jnp

            from ..backend.segment import segment_reduce
            from ..kernels.fused_spspmm import get_fused_math
            from ..kernels.strip_attention import fused_attention_strip

            a1, a2, a3, aA = self._att_proj(tX.values, A.values)
            # rows with triples: a flushed-to-zero denominator on one of
            # these poisons with NaN (loud) instead of silently being 0.
            # Batch-constant -> loaders precompute it host-side
            # (add_attention_plans); the in-layer reduce is the fallback
            nonempty = datadict.get(f"{key}{KEYSEP}nonempty", None)
            if nonempty is None:
                ones = jnp.ones((acd.shape[1], 1), jnp.float32)
                nonempty = segment_reduce(ones, acd[0], nseg, "sum",
                                          indices_are_sorted=True)[:, 0] > 0
            # poison default OFF: flushed (row, channel)s yield finite 0
            # (mid-training evals routinely visit transiently-flushing
            # models; a loud NaN default aborts tuned-lr runs — r5).
            # set_attention_poison(True) restores the loud contract for
            # serving/debug (kernels/strip_attention.py)
            from ..kernels.strip_attention import get_attention_poison

            out = fused_attention_strip(a1, a3, aA, a2, *attplan1,
                                        nonempty, None,
                                        get_fused_math(),
                                        get_attention_poison())[:nseg]
            return SparseTensor(indices=tX.indices,
                                values=out.astype(tX.values.dtype),
                                nnz=tX.nnz, sparse_shape=tX.sparse_shape)
        attplans = datadict.get(f"{key}{KEYSEP}attplan", None)
        if (attplans is not None and self.aggr_str == "sum"
                and A.values is not None and tX.values.ndim == 2
                and tX.values.shape[1] % 128 == 0
                and A.values.shape[-1] == tX.values.shape[1]):
            # fused path (VERDICT r1 #5): the attention Linears commute
            # with the gathers (row-wise maps), so apply them on the nnz
            # rows FIRST, then run the two gather-heavy stages on the
            # fused kernel: (1) s12[k] = a1[c_k] * aA[d_k] (triples
            # (k, c, d)), (2) out[a] += a3[c_k] * alpha[k] (triples
            # (a, c, k)).  Only the cheap target-side modulation + the
            # segment softmax stay on XLA.  Gradients flow through the
            # kernels' custom VJPs.
            import jax.numpy as jnp

            score_plans, agg_plans = attplans
            a1, a2, a3, aA = self._att_proj(tX.values, A.values)
            from ..kernels import fused_spspmm, fused_spspmm_strip
            from ..kernels.fused_spspmm import get_fused_math
            from ..kernels.strip_spspmm import StripPlan

            run = (fused_spspmm_strip
                   if isinstance(score_plans[0], StripPlan)
                   else fused_spspmm)
            K_pad = acd.shape[1]
            s12 = run(a1, aA, *score_plans, None,
                      get_fused_math())[:K_pad]
            tgt = jnp.minimum(acd[0], nseg - 1)
            score = s12 * a2[tgt]
            # softmax, restructured: (a) global-column shift — the same
            # softmax (any within-segment-constant shift cancels) but
            # one column reduce instead of the 2x-slower scatter-max +
            # gather-back; (b) the 1/denominator is applied AFTER the
            # aggregate (denom is constant per segment), so alpha never
            # materializes as a (K, D) array
            m = jnp.max(jax.lax.stop_gradient(score), axis=0,
                        keepdims=True)
            e = jnp.exp(score - jnp.where(jnp.isfinite(m), m, 0.0))
            denom = segment_reduce(e, acd[0], nseg, "sum",
                                   indices_are_sorted=True)
            out = run(a3, e.astype(a3.dtype), *agg_plans, None,
                      get_fused_math())[:nseg]
            out = out / jnp.maximum(denom, 1e-16)
            return SparseTensor(indices=tX.indices,
                                values=out.astype(tX.values.dtype),
                                nnz=tX.nnz, sparse_shape=tX.sparse_shape)

        def message(av, bv, cv, seg):
            score = self.att1(av) * self.att2(cv)
            if bv is not None:   # adjacency without edge features
                score = score * self.attA(bv)
            alpha = segment_softmax(score, seg, nseg)
            return alpha * self.att3(av)

        return spspmpnn(tX, 1, A, 0, tX, acd, message, self.aggr_str)

    forward = __call__
