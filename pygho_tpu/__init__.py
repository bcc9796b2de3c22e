"""pygho_tpu — a TPU-native high-order GNN (HOGNN) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of GraphPKU/PygHO
(reference layout: pygho/__init__.py:1-2 re-exports SparseTensor and
MaskedTensor as the top-level API; we keep that contract).

Design highlights (TPU-first, not a port):

- ``SparseTensor`` is a frozen pytree with *static padded shapes*: indices
  ``i32[sparse_dim, nnz_pad]``, values ``f32[nnz_pad, *dense]`` and a traced
  scalar ``nnz``.  Padding columns carry a large positive sentinel index so
  that XLA scatters drop them (mode="drop") while gathers clamp harmlessly.
- All data-dependent sparsity structure (coalescing, spspmm index building,
  tuple sampling) happens on the host in numpy at preprocessing time — the
  device hot loop is pure gather-multiply-segment-reduce with static shapes,
  which jits once per shape bucket.
- The masked-dense path is plain einsum + masks and maps directly onto the
  MXU.
"""

from .backend.sptensor import SparseTensor
from .backend.matensor import MaskedTensor

__version__ = "0.1.0"

__all__ = ["SparseTensor", "MaskedTensor", "__version__"]
