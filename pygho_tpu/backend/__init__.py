"""Tensor backend (L1): SparseTensor / MaskedTensor pytrees + matmul families.

Mirrors the capability surface of the reference backend
(pygho/backend/{SpTensor,MaTensor,Spmm,Spspmm,Spmamm,Mamamm,utils}.py) with a
TPU-native split:

- ``indexing``: host-side (numpy) index building — hashing, coalescing,
  spspmm index precompute, padding/bucketing.  Runs in the data pipeline.
- ``segment``: the single device-side aggregation primitive
  (sorted segment reduce), the TPU equivalent of
  ``Tensor.scatter_reduce_`` (reference backend/utils.py:6-55).
- ``sptensor`` / ``matensor``: jittable pytree data structures.
- ``spmm`` / ``spspmm`` / ``spmamm`` / ``mamamm``: device matmul families.
"""

from . import indexing
from .segment import segment_reduce
from .sptensor import SparseTensor
from .matensor import MaskedTensor
from .spmm import spmm
from .spspmm import spspmm, spspmpnn, spsphadamard
from .spmamm import spmamm
from .mamamm import mamamm

__all__ = [
    "indexing",
    "segment_reduce",
    "SparseTensor",
    "MaskedTensor",
    "spmm",
    "spspmm",
    "spspmpnn",
    "spsphadamard",
    "spmamm",
    "mamamm",
]
