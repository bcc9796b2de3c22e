"""Operators for SparseTensor (reference pygho/honn/SpOperator.py).

The precompute-key protocol is kept verbatim: each OpMessagePassing module
declares ``"{op0}___{op1}___{dim1}___{op2}___{dim2}"``;
``parse_precomputekey`` collects keys from a built model; the data
pipeline stores ``datadict[key + "___acd"]`` (padded i32[3, k]) per batch
(reference SpOperator.py:12-44,135,165-183).  Unlike the reference there is
*no* on-the-fly fallback when the key is missing — dynamic index building
cannot run under jit, so a missing key is an error pointing at
preprocessing.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Union

import jax
from flax import nnx

from ..backend.sptensor import SparseTensor
from ..backend.spmm import spmm
from ..backend.spspmm import spspmm, spspmpnn

KEYSEP = "___"

POOL_PREFIX = "pool"  # datadict keys for precomputed sparse-output pooling


def pool_seg_key(op: str, dims: Union[int, Iterable[int]]) -> str:
    """datadict key holding the tuple->pooled-pattern segment map for
    pooling ``dims`` of tuple tensor ``op`` (e.g. "Xpool___2___seg")."""
    if isinstance(dims, int):
        dims = [dims]
    d = "_".join(str(x) for x in sorted(dims))
    return f"{op}{POOL_PREFIX}{KEYSEP}{d}"


def parse_precomputekey(model) -> List[str]:
    """Collect precompute keys from every OpMessagePassing in a model
    (reference SpOperator.py:15-44), walking the nnx module graph."""
    ret = []
    for _, mod in nnx.iter_graph(model):
        if isinstance(mod, OpMessagePassing):
            ret.append(mod.precomputekey)
    return sorted(set(ret))


def _fetch_acd(datadict: Dict, key: str) -> jax.Array:
    acd = datadict.get(f"{key}{KEYSEP}acd", None)
    assert acd is not None, (
        f"missing precomputed indices '{key}{KEYSEP}acd'. Run the sparse "
        f"preprocessing with keys=parse_precomputekey(model).")
    return acd


class OpNodeMessagePassing(nnx.Module):
    """Node-level message passing out = A @ X
    (reference SpOperator.py:47-85)."""

    def __init__(self, aggr: str = "sum"):
        self.aggr = aggr

    def __call__(self, A: SparseTensor, X: jax.Array,
                 tarX: Optional[jax.Array] = None) -> jax.Array:
        assert A.sparse_dim == 2
        return spmm(A, 1, X, self.aggr)

    forward = __call__


class OpMessagePassing(nnx.Module):
    """Generalized tuple message passing dispatching to spspmm/spspmpnn
    with host-precomputed acd (reference SpOperator.py:88-183)."""

    def __init__(self, op0: str = "X", op1: str = "X", dim1: int = 1,
                 op2: str = "A", dim2: int = 0, aggr: str = "sum",
                 message_func: Optional[Callable] = None):
        self.dim1 = dim1
        self.dim2 = dim2
        self.precomputekey = \
            f"{op0}{KEYSEP}{op1}{KEYSEP}{dim1}{KEYSEP}{op2}{KEYSEP}{dim2}"
        if aggr not in ("sum", "mean", "max", "min"):
            raise ValueError(
                f"unknown aggr {aggr!r}; expected sum|mean|max|min")
        self.aggr = aggr
        self.message_func = message_func

    def __call__(self, A: SparseTensor, B: SparseTensor, datadict: Dict,
                 tarX: Optional[SparseTensor] = None) -> SparseTensor:
        if self.message_func is not None:
            acd = _fetch_acd(datadict, self.precomputekey)
            assert tarX is not None, \
                "target pattern required for message_func mode"
            return spspmpnn(A, self.dim1, B, self.dim2, tarX, acd,
                            self.message_func, self.aggr)
        assert tarX is not None, (
            "tarX (target pattern) is required: the TPU path has no "
            "dynamic-pattern fallback")
        plans = datadict.get(f"{self.precomputekey}{KEYSEP}plan", None)
        import jax.numpy as jnp

        if (plans is not None and self.aggr == "sum"
                and A.values is not None and B.values is not None
                and A.values.ndim == 2 and B.values.ndim == 2
                and A.values.shape[1] == B.values.shape[1]
                # bf16 operands ride the kernel's grouped-DMA path when
                # the plan's window bases are 16-aligned (the default);
                # fused_contract falls back to an f32 cast otherwise
                and A.values.dtype in (jnp.float32, jnp.bfloat16)
                and B.values.dtype in (jnp.float32, jnp.bfloat16)
                # Mosaic constraint in this container: lane dim must be a
                # multiple of 128 (smaller feature dims use the XLA path)
                and A.values.shape[1] % 128 == 0):
            # fused Pallas path (sum aggregation, matching feature dims);
            # dispatches on the plan type: StripPlan -> v2 strip kernel
            # (kernels/strip_spspmm.py), ChunkPlan -> v1
            from ..kernels import fused_spspmm
            from ..kernels.fused_spspmm import get_fused_math
            from ..kernels.strip_spspmm import StripPlan, fused_spspmm_strip

            fwd, dxp, dap = plans
            run = (fused_spspmm_strip if isinstance(fwd, StripPlan)
                   else fused_spspmm)
            vals = run(A.values, B.values, fwd, dxp, dap,
                       None, get_fused_math())[: tarX.nnz_pad]
            vals = vals.astype(A.values.dtype)
            keep_shape = (tuple(A.sparse_shape[:self.dim1])
                          + tuple(A.sparse_shape[self.dim1 + 1:])
                          + tuple(B.sparse_shape[:self.dim2])
                          + tuple(B.sparse_shape[self.dim2 + 1:]))
            return SparseTensor(indices=tarX.indices, values=vals,
                                nnz=tarX.nnz, sparse_shape=keep_shape)
        acd = _fetch_acd(datadict, self.precomputekey)
        return spspmm(A, self.dim1, B, self.dim2, self.aggr, acd=acd,
                      tarX=tarX)

    forward = __call__


class Op2FWL(OpMessagePassing):
    """2-FWL update X <- X1 @ X2 (reference SpOperator.py:185-227)."""

    def __init__(self, aggr: str = "sum", optuplefeat: str = "X"):
        super().__init__(optuplefeat, optuplefeat, 1, optuplefeat, 0, aggr)

    def __call__(self, X1: SparseTensor, X2: SparseTensor, datadict: Dict,
                 tarX: Optional[SparseTensor] = None) -> SparseTensor:
        assert X1.sparse_dim == 2 and X2.sparse_dim == 2
        return OpMessagePassing.__call__(self, X1, X2, datadict, tarX)

    forward = __call__


class OpMessagePassingOnSubg2D(OpMessagePassing):
    """Message passing within each subgraph: X(i, :) propagated along A
    (reference SpOperator.py:230-277); contraction X[i,k] A[k,j]."""

    def __init__(self, aggr: str = "sum", optuplefeat: str = "X",
                 opadj: str = "A", message_func: Optional[Callable] = None):
        super().__init__(optuplefeat, optuplefeat, 1, opadj, 0, aggr,
                         message_func)

    def __call__(self, A: SparseTensor, X: SparseTensor, datadict: Dict,
                 tarX: Optional[SparseTensor] = None) -> SparseTensor:
        assert A.sparse_dim == 2 and X.sparse_dim == 2
        return OpMessagePassing.__call__(self, X, A, datadict, tarX)

    forward = __call__


class OpMessagePassingOnSubg3D(OpMessagePassing):
    """Message passing on dim 2 of 3-tuple representations
    (reference SpOperator.py:280-327)."""

    def __init__(self, aggr: str = "sum", optuplefeat: str = "X",
                 opadj: str = "A", message_func: Optional[Callable] = None):
        super().__init__(optuplefeat, optuplefeat, 2, opadj, 0, aggr,
                         message_func)

    def __call__(self, A: SparseTensor, X: SparseTensor, datadict: Dict,
                 tarX: Optional[SparseTensor] = None) -> SparseTensor:
        assert A.sparse_dim == 2 and X.sparse_dim == 3
        return OpMessagePassing.__call__(self, X, A, datadict, tarX)

    forward = __call__


class OpMessagePassingCrossSubg2D(OpMessagePassing):
    """Message passing across subgraphs: A[i,k] X[k,j]
    (reference SpOperator.py:330-372)."""

    def __init__(self, aggr: str = "sum", optuplefeat: str = "X",
                 opadj: str = "A", message_func: Optional[Callable] = None):
        super().__init__(optuplefeat, opadj, 1, optuplefeat, 0, aggr,
                         message_func)

    def __call__(self, A: SparseTensor, X: SparseTensor, datadict: Dict,
                 tarX: Optional[SparseTensor] = None) -> SparseTensor:
        assert A.sparse_dim == 2 and X.sparse_dim == 2
        return OpMessagePassing.__call__(self, A, X, datadict, tarX)

    forward = __call__


class OpDiag(nnx.Module):
    """Diagonal extraction (reference SpOperator.py:375-403)."""

    def __init__(self, dims: Iterable[int], return_sparse: bool = False):
        self.dims = sorted(set(dims))
        self.return_sparse = return_sparse

    def __call__(self, A: SparseTensor):
        return A.diag(self.dims, return_sparse=self.return_sparse)

    forward = __call__


class OpDiag2D(OpDiag):
    def __init__(self):
        super().__init__([0, 1], False)

    def __call__(self, X: SparseTensor) -> jax.Array:
        assert X.sparse_dim == 2
        return X.diag(self.dims, return_sparse=False)

    forward = __call__


class OpPooling(nnx.Module):
    """Pool tuple representations over sparse dims
    (reference SpOperator.py:427-467).  Sparse-output pooling reads the
    precomputed segment map + target pattern from datadict
    (pool_seg_key)."""

    def __init__(self, dims: Union[int, Iterable[int]], pool: str = "sum",
                 return_sparse: bool = False, op: str = "X"):
        if isinstance(dims, int):
            dims = [dims]
        self.dims = sorted(set(dims))
        self.pool = pool
        self.return_sparse = return_sparse
        self.op = op

    def __call__(self, X: SparseTensor, datadict: Optional[Dict] = None):
        if not self.return_sparse:
            return getattr(X, self.pool)(self.dims)
        key = pool_seg_key(self.op, self.dims)
        assert datadict is not None and f"{key}{KEYSEP}seg" in datadict, (
            f"sparse-output pooling needs precomputed '{key}{KEYSEP}seg' / "
            f"tarX in datadict")
        seg = datadict[f"{key}{KEYSEP}seg"]
        tarX: SparseTensor = datadict[f"{key}{KEYSEP}tarX"]
        return getattr(X, self.pool)(
            self.dims, return_sparse=True, seg_ids=seg,
            tar_indices=tarX.indices, tar_nnz=tarX.nnz)

    forward = __call__


class OpPoolingSubg2D(OpPooling):
    """Pool each subgraph's nodes to its root: dims=[1], dense out
    (reference SpOperator.py:470-493)."""

    def __init__(self, pool: str = "sum"):
        super().__init__(1, pool, False)

    def __call__(self, X: SparseTensor, datadict=None) -> jax.Array:
        assert X.sparse_dim == 2
        return OpPooling.__call__(self, X)

    forward = __call__


class OpPoolingSubg3D(OpPooling):
    """Pool dim 2 of 3-tuples onto the (i, j) pair pattern: sparse out
    (reference SpOperator.py:496-519)."""

    def __init__(self, pool: str = "sum", op: str = "X"):
        super().__init__(2, pool, True, op)

    def __call__(self, X: SparseTensor, datadict: Dict) -> SparseTensor:
        assert X.sparse_dim == 3
        return OpPooling.__call__(self, X, datadict)

    forward = __call__


class OpPoolingCrossSubg2D(OpPooling):
    """Pool the same node across subgraphs: dims=[0], dense out
    (reference SpOperator.py:522-545)."""

    def __init__(self, pool: str = "sum"):
        super().__init__(0, pool, False)

    def __call__(self, X: SparseTensor, datadict=None) -> jax.Array:
        assert X.sparse_dim == 2
        return OpPooling.__call__(self, X)

    forward = __call__


class OpUnpooling(nnx.Module):
    """Broadcast pooled representations back onto a tuple pattern
    (reference SpOperator.py:548-583)."""

    def __init__(self, dims: Union[int, Iterable[int]],
                 fromdense1dim: bool = True):
        if isinstance(dims, int):
            dims = [dims]
        self.dims = sorted(set(dims))
        self.fromdense1dim = fromdense1dim

    def __call__(self, X, tarX: SparseTensor,
                 b2a=None) -> SparseTensor:
        if isinstance(X, SparseTensor):
            # generic sparse->sparse unpooling (reference
            # SpOperator.py:564-573) rides the host-precomputed row map:
            # indexing.unpooling_ind(src_ind, tar_ind, self.dims)
            return X.unpooling(self.dims, tarX, b2a=b2a)
        leftdim = [i for i in range(tarX.sparse_dim) if i not in self.dims]
        assert len(leftdim) == 1, "can only unpool from one kept dim"
        return tarX.unpooling_fromdense1dim(leftdim[0], X)

    forward = __call__


class OpUnpoolingSubgNodes2D(OpUnpooling):
    """Copy per-node representations to the same node in all subgraphs
    (reference SpOperator.py:586-592)."""

    def __init__(self):
        super().__init__(1, True)


class OpUnpoolingRootNodes2D(OpUnpooling):
    """Copy root representations to all tuples of the root's subgraph
    (reference SpOperator.py:595-601)."""

    def __init__(self):
        super().__init__(0, True)
