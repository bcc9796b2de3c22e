"""Operators for MaskedTensor (reference pygho/honn/MaOperator.py).

The masked-dense path is the MXU-native one: all message passing lowers to
mamamm einsums (or spmamm for sparse adjacency) over 0-filled padded
arrays — no index plumbing needed.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Union

import jax
from flax import nnx

from ..backend.sptensor import SparseTensor
from ..backend.matensor import MaskedTensor
from ..backend.mamamm import mamamm
from ..backend.spmamm import spmamm
from .sp_operator import KEYSEP


class OpNodeMessagePassing(nnx.Module):
    """Dense node message passing: out = A @ X via einsum
    (reference MaOperator.py:14-42)."""

    def __call__(self, A: MaskedTensor, X: MaskedTensor,
                 tarX: MaskedTensor) -> MaskedTensor:
        assert A.masked_dim == 3 and X.masked_dim == 2
        return mamamm(A, 2, X, 1, tarX.mask)

    forward = __call__


class OpSpNodeMessagePassing(nnx.Module):
    """Sparse-adjacency node message passing (reference MaOperator.py:45-80)."""

    def __init__(self, aggr: str = "sum"):
        self.aggr = aggr

    def __call__(self, A: SparseTensor, X: MaskedTensor,
                 tarX: MaskedTensor) -> MaskedTensor:
        assert A.sparse_dim == 3 and X.masked_dim == 2
        return spmamm(A, 2, X, 1, tarX.mask, self.aggr)

    forward = __call__


class OpMessagePassing(nnx.Module):
    """Generalized dense message passing via mamamm
    (reference MaOperator.py:83-123)."""

    def __init__(self, dim1: int, dim2: int):
        self.dim1 = dim1
        self.dim2 = dim2

    def __call__(self, A: MaskedTensor, B: MaskedTensor,
                 tarX: MaskedTensor) -> MaskedTensor:
        return mamamm(A, self.dim1, B, self.dim2, tarX.mask, True)

    forward = __call__


class Op2FWL(OpMessagePassing):
    """2-FWL: X <- X1 @ X2, (b,i,k,d)x(b,k,j,d)->(b,i,j,d)
    (reference MaOperator.py:126-160)."""

    def __init__(self):
        super().__init__(2, 1)

    def __call__(self, X1: MaskedTensor, X2: MaskedTensor,
                 datadict: Optional[Dict] = None,
                 tarX: Optional[MaskedTensor] = None) -> MaskedTensor:
        assert X1.masked_dim == 3 and X2.masked_dim == 3
        return OpMessagePassing.__call__(self, X1, X2, tarX)

    forward = __call__


class OpMessagePassingOnSubg2D(OpMessagePassing):
    """Within-subgraph message passing: X[b,i,k,d] A[b,k,j,d]
    (reference MaOperator.py:163-202)."""

    def __init__(self):
        super().__init__(2, 1)

    def __call__(self, A: MaskedTensor, X: MaskedTensor,
                 datadict: Optional[Dict] = None,
                 tarX: Optional[MaskedTensor] = None) -> MaskedTensor:
        assert A.masked_dim == 3 and X.masked_dim == 3
        return OpMessagePassing.__call__(self, X, A, tarX)

    forward = __call__


class OpMessagePassingOnSubg3D(OpMessagePassing):
    """3-tuple within-subgraph message passing (reference MaOperator.py:204-238)."""

    def __init__(self):
        super().__init__(3, 1)

    def __call__(self, A: MaskedTensor, X: MaskedTensor,
                 datadict: Optional[Dict] = None,
                 tarX: Optional[MaskedTensor] = None) -> MaskedTensor:
        assert A.masked_dim == 3 and X.masked_dim == 4
        return OpMessagePassing.__call__(self, X, A, tarX)

    forward = __call__


class OpMessagePassingCrossSubg2D(OpMessagePassing):
    """Cross-subgraph message passing: A[b,i,k,d] X[b,k,j,d]
    (reference MaOperator.py:240-278)."""

    def __init__(self):
        super().__init__(1, 1)

    def __call__(self, A: MaskedTensor, X: MaskedTensor,
                 datadict: Optional[Dict] = None,
                 tarX: Optional[MaskedTensor] = None) -> MaskedTensor:
        assert A.masked_dim == 3 and X.masked_dim == 3
        return OpMessagePassing.__call__(self, A, X, tarX)

    forward = __call__


class OpSpMessagePassing(nnx.Module):
    """Sparse-adjacency variants ("SD" mode) via spmamm
    (reference MaOperator.py:281-333).  When the loader shipped fused
    chunk plans (datadict["spmamm___<dim1>___<dim2>___plan"], see
    kernels/fused_spmamm.py) the contraction rides the Pallas kernel."""

    def __init__(self, dim1: int, dim2: int, aggr: str = "sum"):
        self.dim1 = dim1
        self.dim2 = dim2
        self.aggr = aggr
        self.plankey = f"spmamm{KEYSEP}{dim1}{KEYSEP}{dim2}{KEYSEP}plan"

    def __call__(self, A: SparseTensor, X: MaskedTensor,
                 datadict: Optional[Dict] = None,
                 tarX: Optional[MaskedTensor] = None) -> MaskedTensor:
        plans = None if datadict is None else datadict.get(self.plankey)
        return spmamm(A, self.dim1, X, self.dim2,
                      None if tarX is None else tarX.mask, self.aggr,
                      plans=plans)

    forward = __call__


def parse_spmamm_dims(model) -> list:
    """Collect (dim1, dim2) pairs of every OpSpMessagePassing in a model
    — the SD-mode analog of parse_precomputekey, feeding
    MaDataloader(plan_dims=...) for fused spmamm plan building."""
    ret = set()
    for _, mod in nnx.iter_graph(model):
        if isinstance(mod, OpSpMessagePassing):
            ret.add((mod.dim1, mod.dim2))
    return sorted(ret)


class OpSpMessagePassingOnSubg2D(OpSpMessagePassing):
    def __init__(self, aggr: str = "sum"):
        super().__init__(1, 2, aggr)


class OpSpMessagePassingOnSubg3D(OpSpMessagePassing):
    def __init__(self, aggr: str = "sum"):
        super().__init__(1, 3, aggr)


class OpSpMessagePassingCrossSubg2D(OpSpMessagePassing):
    def __init__(self, aggr: str = "sum"):
        super().__init__(1, 1, aggr)


class OpDiag(nnx.Module):
    """Masked diagonal (reference MaOperator.py:336-361)."""

    def __init__(self, dims: Iterable[int]):
        self.dims = sorted(set(dims))

    def __call__(self, A: MaskedTensor) -> MaskedTensor:
        return A.diag(self.dims)

    forward = __call__


class OpDiag2D(OpDiag):
    def __init__(self):
        super().__init__([1, 2])

    def __call__(self, X: MaskedTensor) -> MaskedTensor:
        assert X.masked_dim == 3
        return X.diag(self.dims)

    forward = __call__


class OpPooling(nnx.Module):
    """Masked pooling over masked dims (reference MaOperator.py:390-402)."""

    def __init__(self, dims: Union[int, Iterable[int]], pool: str = "sum"):
        if isinstance(dims, int):
            dims = [dims]
        self.dims = sorted(set(dims))
        self.pool = pool

    def __call__(self, X: MaskedTensor, datadict=None) -> MaskedTensor:
        return getattr(X, self.pool)(tuple(self.dims), keepdim=False)

    forward = __call__


class OpPoolingSubg2D(OpPooling):
    def __init__(self, pool: str = "sum"):
        super().__init__([2], pool)

    def __call__(self, X: MaskedTensor, datadict=None) -> MaskedTensor:
        assert X.masked_dim == 3
        return OpPooling.__call__(self, X)

    forward = __call__


class OpPoolingSubg3D(OpPooling):
    def __init__(self, pool: str = "sum"):
        super().__init__([3], pool)

    def __call__(self, X: MaskedTensor, datadict=None) -> MaskedTensor:
        assert X.masked_dim == 4
        return OpPooling.__call__(self, X)

    forward = __call__


class OpPoolingCrossSubg2D(OpPooling):
    def __init__(self, pool: str = "sum"):
        super().__init__([1], pool)

    def __call__(self, X: MaskedTensor, datadict=None) -> MaskedTensor:
        assert X.masked_dim == 3
        return OpPooling.__call__(self, X)

    forward = __call__


class OpUnpooling(nnx.Module):
    """Broadcast along new masked dims (reference MaOperator.py:481-511)."""

    def __init__(self, dims: Union[int, Iterable[int]]):
        if isinstance(dims, int):
            dims = [dims]
        self.dims = sorted(set(dims))

    def __call__(self, X: MaskedTensor, tarX: MaskedTensor) -> MaskedTensor:
        return X.unpooling(self.dims, tarX)

    forward = __call__


class OpUnpoolingSubgNodes2D(OpUnpooling):
    def __init__(self):
        super().__init__([2])


class OpUnpoolingRootNodes2D(OpUnpooling):
    def __init__(self):
        super().__init__([1])
