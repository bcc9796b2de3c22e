"""Unified mode-string dispatch over sparse / masked operators
(reference pygho/honn/TensorOp.py).

Mode strings: first char = adjacency representation, second = tuple
representation.  "SS" sparse/sparse, "SD" sparse adjacency with dense X,
"DD" dense/dense.  DD message passing supports sum aggregation only
(it is a plain einsum), as in the reference (TensorOp.py:35-36,100-101).

Fixes reference TensorOp.py:162 (SD-mode CrossSubg2D instantiated the
dense operator with an invalid arg): SD dispatches to the sparse-adjacency
operator.
"""

from __future__ import annotations

from typing import Callable, Dict, Literal, Optional, Union

import jax
from flax import nnx

from ..backend.sptensor import SparseTensor
from ..backend.matensor import MaskedTensor
from . import sp_operator as SpOperator
from . import ma_operator as MaOperator

Mode = Literal["SS", "SD", "DD"]


class OpNodeMessagePassing(nnx.Module):
    """(reference TensorOp.py:14-65)"""

    def __init__(self, mode: Mode = "SS", aggr: str = "sum"):
        if mode == "SS":
            self.mod = SpOperator.OpNodeMessagePassing(aggr)
        elif mode == "SD":
            self.mod = MaOperator.OpSpNodeMessagePassing(aggr)
        elif mode == "DD":
            assert aggr == "sum", f"aggr {aggr} is not implemented for DD"
            self.mod = MaOperator.OpNodeMessagePassing()
        else:
            raise NotImplementedError(mode)

    def __call__(self, A, X):
        return self.mod(A, X, X)

    forward = __call__


class Op2FWL(nnx.Module):
    """(reference TensorOp.py:68-123)"""

    def __init__(self, mode: Literal["SS", "DD"] = "SS", aggr: str = "sum",
                 optuplefeat: str = "X"):
        if mode == "SS":
            self.mod = SpOperator.Op2FWL(aggr, optuplefeat)
        elif mode == "DD":
            assert aggr == "sum", "only sum aggregation for dense"
            self.mod = MaOperator.Op2FWL()
        else:
            raise NotImplementedError(mode)

    def __call__(self, X1, X2, datadict: Optional[Dict] = None, tarX=None):
        return self.mod(X1, X2, datadict, tarX)

    forward = __call__


class _MPDispatch(nnx.Module):
    def __call__(self, A, X, datadict: Optional[Dict] = None, tarX=None):
        return self.mod(A, X, datadict, tarX)

    forward = __call__


class OpMessagePassingOnSubg2D(_MPDispatch):
    """(reference TensorOp.py:126-187)"""

    def __init__(self, mode: Mode = "SS", aggr: str = "sum",
                 optuplefeat: str = "X", opadj: str = "A",
                 message_func: Optional[Callable] = None):
        if mode == "SS":
            self.mod = SpOperator.OpMessagePassingOnSubg2D(
                aggr, optuplefeat, opadj, message_func)
        elif mode == "SD":
            assert message_func is None
            self.mod = MaOperator.OpSpMessagePassingOnSubg2D(aggr)
        elif mode == "DD":
            assert message_func is None
            assert aggr == "sum", "only sum aggregation for dense adjacency"
            self.mod = MaOperator.OpMessagePassingOnSubg2D()
        else:
            raise NotImplementedError(mode)


class OpMessagePassingOnSubg3D(_MPDispatch):
    """(reference TensorOp.py:190-252)"""

    def __init__(self, mode: Mode = "SS", aggr: str = "sum",
                 optuplefeat: str = "X", opadj: str = "A",
                 message_func: Optional[Callable] = None):
        if mode == "SS":
            self.mod = SpOperator.OpMessagePassingOnSubg3D(
                aggr, optuplefeat, opadj, message_func)
        elif mode == "SD":
            assert message_func is None
            self.mod = MaOperator.OpSpMessagePassingOnSubg3D(aggr)
        elif mode == "DD":
            assert message_func is None
            assert aggr == "sum", "only sum aggregation for dense adjacency"
            self.mod = MaOperator.OpMessagePassingOnSubg3D()
        else:
            raise NotImplementedError(mode)


class OpMessagePassingCrossSubg2D(_MPDispatch):
    """(reference TensorOp.py:255-317)"""

    def __init__(self, mode: Mode = "SS", aggr: str = "sum",
                 optuplefeat: str = "X", opadj: str = "A",
                 message_func: Optional[Callable] = None):
        if mode == "SS":
            self.mod = SpOperator.OpMessagePassingCrossSubg2D(
                aggr, optuplefeat, opadj, message_func)
        elif mode == "SD":
            assert message_func is None
            self.mod = MaOperator.OpSpMessagePassingCrossSubg2D(aggr)
        elif mode == "DD":
            assert message_func is None
            assert aggr == "sum", "only sum aggregation for dense adjacency"
            self.mod = MaOperator.OpMessagePassingCrossSubg2D()
        else:
            raise NotImplementedError(mode)


class OpDiag2D(nnx.Module):
    """(reference TensorOp.py:320-360)"""

    def __init__(self, mode: Literal["S", "D"] = "S"):
        if mode == "S":
            self.mod = SpOperator.OpDiag2D()
        elif mode == "D":
            self.mod = MaOperator.OpDiag2D()
        else:
            raise NotImplementedError(mode)

    def __call__(self, X):
        return self.mod(X)

    forward = __call__


class _PoolDispatch(nnx.Module):
    def __call__(self, X, datadict: Optional[Dict] = None):
        return self.mod(X, datadict)

    forward = __call__


class OpPoolingSubg2D(_PoolDispatch):
    """(reference TensorOp.py:363-398)"""

    def __init__(self, mode: Literal["S", "D"] = "S", pool: str = "sum"):
        if mode == "S":
            self.mod = SpOperator.OpPoolingSubg2D(pool)
        elif mode == "D":
            self.mod = MaOperator.OpPoolingSubg2D(pool)
        else:
            raise NotImplementedError(mode)


class OpPoolingSubg3D(_PoolDispatch):
    """(reference TensorOp.py:401-420)"""

    def __init__(self, mode: Literal["S", "D"] = "S", pool: str = "sum",
                 op: str = "X"):
        if mode == "S":
            self.mod = SpOperator.OpPoolingSubg3D(pool, op)
        elif mode == "D":
            self.mod = MaOperator.OpPoolingSubg3D(pool)
        else:
            raise NotImplementedError(mode)


class OpPoolingCrossSubg2D(_PoolDispatch):
    """(reference TensorOp.py:423-443)"""

    def __init__(self, mode: Literal["S", "D"] = "S", pool: str = "sum"):
        if mode == "S":
            self.mod = SpOperator.OpPoolingCrossSubg2D(pool)
        elif mode == "D":
            self.mod = MaOperator.OpPoolingCrossSubg2D(pool)
        else:
            raise NotImplementedError(mode)


class OpUnpoolingSubgNodes2D(nnx.Module):
    """(reference TensorOp.py:446-471)"""

    def __init__(self, mode: Literal["S", "D"] = "S"):
        if mode == "S":
            self.mod = SpOperator.OpUnpoolingSubgNodes2D()
        elif mode == "D":
            self.mod = MaOperator.OpUnpoolingSubgNodes2D()
        else:
            raise NotImplementedError(mode)

    def __call__(self, X, tarX):
        return self.mod(X, tarX)

    forward = __call__


class OpUnpoolingRootNodes2D(nnx.Module):
    """(reference TensorOp.py:474-500)"""

    def __init__(self, mode: Literal["S", "D"] = "S"):
        if mode == "S":
            self.mod = SpOperator.OpUnpoolingRootNodes2D()
        elif mode == "D":
            self.mod = MaOperator.OpUnpoolingRootNodes2D()
        else:
            raise NotImplementedError(mode)

    def __call__(self, X, tarX):
        return self.mod(X, tarX)

    forward = __call__
