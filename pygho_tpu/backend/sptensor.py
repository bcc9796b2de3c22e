"""SparseTensor: a static-shape, jittable batched-COO sparse tensor.

Re-design of the reference SparseTensor (pygho/backend/SpTensor.py:200-527)
for XLA: instead of dynamic ``nnz``, the tensor is a frozen pytree with

- ``indices``: ``i32[sparse_dim, nnz_pad]`` — lexicographically sorted,
  coalesced; padding columns hold ``PAD_INDEX`` (sort after all real
  entries, get dropped by scatters, clamp in gathers).
- ``values``: ``[nnz_pad, *dense]`` or None; padding rows are kept at 0 by
  ``tuplewiseapply`` so that sums/means over rows stay exact.
- ``nnz``: traced ``i32[]`` true count (does not trigger recompiles).
- ``sparse_shape``: static tuple of *padded* sparse extents — this is what
  fixes every downstream dense shape at trace time.

All coalescing/sorting happens on the host (see backend.indexing); device
methods are pure gather / segment-reduce compositions with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import indexing
from .indexing import PAD_INDEX
from .segment import segment_reduce


def _expand_mask(mask: jax.Array, ndim: int) -> jax.Array:
    """Reshape a [n] bool mask to broadcast against [n, *dense]."""
    return mask.reshape(mask.shape + (1,) * (ndim - 1))


@dataclasses.dataclass(frozen=True)
class SparseTensor:
    indices: jax.Array                 # i32[sparse_dim, nnz_pad]
    values: Optional[jax.Array]        # [nnz_pad, *dense] | None
    nnz: jax.Array                     # i32[] true non-zero count
    sparse_shape: Tuple[int, ...]      # static padded sparse extents

    # -- construction -----------------------------------------------------

    @classmethod
    def from_numpy(
        cls,
        indices: np.ndarray,
        values: Optional[np.ndarray],
        sparse_shape: Sequence[int],
        nnz_pad: Optional[int] = None,
        is_coalesced: bool = False,
        reduce: str = "sum",
    ) -> "SparseTensor":
        """Host-side constructor: coalesce (numpy), pad to ``nnz_pad`` and
        wrap as device-ready arrays.  Mirrors the reference constructor
        (SpTensor.py:240-266) with the added padding step."""
        if not is_coalesced:
            indices, values = indexing.coalesce(indices, values, reduce)
        nnz = indices.shape[1]
        if nnz_pad is None:
            nnz_pad = indexing.bucket_size(nnz)
        pind = indexing.pad_indices(np.asarray(indices), nnz_pad)
        pval = None
        if values is not None:
            pval = indexing.pad_values(np.asarray(values), nnz_pad)
        return cls(
            indices=jnp.asarray(pind),
            values=None if pval is None else jnp.asarray(pval),
            nnz=jnp.asarray(nnz, dtype=jnp.int32),
            sparse_shape=tuple(int(s) for s in sparse_shape),
        )

    # -- basic properties -------------------------------------------------

    @property
    def sparse_dim(self) -> int:
        return self.indices.shape[0]

    @property
    def nnz_pad(self) -> int:
        return self.indices.shape[1]

    @property
    def denseshape(self) -> Tuple[int, ...]:
        return () if self.values is None else tuple(self.values.shape[1:])

    @property
    def sparseshape(self) -> Tuple[int, ...]:
        """Padded sparse extents (reference SpTensor.py sparseshape)."""
        return tuple(self.sparse_shape)

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.sparse_shape) + self.denseshape

    @property
    def rowmask(self) -> jax.Array:
        """bool[nnz_pad]: True for real entries."""
        return jnp.arange(self.nnz_pad, dtype=jnp.int32) < self.nnz

    def is_coalesced(self) -> bool:
        return True

    # -- value transforms -------------------------------------------------

    def tuplewiseapply(self, func: Callable[[jax.Array], jax.Array]) -> "SparseTensor":
        """Apply ``func`` over the value rows (reference SpTensor.py:491-496).

        Padding rows are re-zeroed afterwards so that downstream sums /
        batch-norm statistics never see garbage from pad slots (funcs with
        bias terms would otherwise pollute them)."""
        nvalues = func(self.values)
        nvalues = jnp.where(_expand_mask(self.rowmask, nvalues.ndim), nvalues,
                            jnp.zeros((), dtype=nvalues.dtype))
        return dataclasses.replace(self, values=nvalues)

    def diagonalapply(self, func: Callable[[jax.Array, jax.Array], jax.Array]) -> "SparseTensor":
        """Apply ``func(values, is_diagonal)`` where is_diagonal is i32[nnz_pad]
        (reference SpTensor.py:498-505; 2-D only)."""
        assert self.sparse_dim == 2, "only implemented for 2D"
        isdiag = (self.indices[0] == self.indices[1]).astype(jnp.int32)
        nvalues = func(self.values, isdiag)
        nvalues = jnp.where(_expand_mask(self.rowmask, nvalues.ndim), nvalues,
                            jnp.zeros((), dtype=nvalues.dtype))
        return dataclasses.replace(self, values=nvalues)

    def add(self, tarX: "SparseTensor", samesparse: bool,
            union: Optional[tuple] = None) -> "SparseTensor":
        """Add two SparseTensors (reference SpTensor.py:507-514).

        ``samesparse=True``: identical patterns, values add directly.
        ``samesparse=False``: needs the host-precomputed ``union`` plan
        ``(union_indices, union_nnz, a2u, b2u)`` from
        ``indexing.union_ind(indA, indB)`` — the device op is then one
        static-shape scatter-add onto the union pattern (the reference
        re-coalesces eagerly, SpTensor.py:513, a dynamic-shape op)."""
        if samesparse:
            return dataclasses.replace(self,
                                       values=self.values + tarX.values)
        if union is None:
            raise NotImplementedError(
                "samesparse=False needs a precomputed union plan: "
                "indexing.union_ind(indA, indB) -> "
                "(union_indices, union_nnz, a2u, b2u)")
        u_ind, u_nnz, a2u, b2u = union
        u_ind = jnp.asarray(u_ind)
        u_pad = u_ind.shape[1]
        vals = jnp.zeros((u_pad,) + self.denseshape, self.values.dtype)
        na, nb = a2u.shape[0], b2u.shape[0]
        vals = vals.at[jnp.asarray(a2u)].add(self.values[:na])
        vals = vals.at[jnp.asarray(b2u)].add(
            tarX.values[:nb].astype(self.values.dtype))
        return SparseTensor(indices=u_ind, values=vals,
                            nnz=jnp.asarray(u_nnz, jnp.int32),
                            sparse_shape=self.sparse_shape)

    def catvalue(self, tarXs: Union["SparseTensor", Iterable["SparseTensor"]],
                 samesparse: bool) -> "SparseTensor":
        """Concatenate values along the last dense dim
        (reference SpTensor.py:516-524)."""
        assert samesparse, "must share the sparsity pattern to concat values"
        if isinstance(tarXs, SparseTensor):
            tarXs = [tarXs]
        nvalues = jnp.concatenate([self.values] + [t.values for t in tarXs],
                                  axis=-1)
        return dataclasses.replace(self, values=nvalues)

    # -- reductions to dense ----------------------------------------------

    def _segment_ids_for(self, keep_dims: Sequence[int]) -> Tuple[jax.Array, int]:
        """Row-major flat segment id over the kept sparse dims; padded rows
        map out of range (=> dropped by the scatter)."""
        keep_dims = list(keep_dims)
        if len(keep_dims) == 1:
            d = keep_dims[0]
            return self.indices[d], self.sparse_shape[d]
        sizes = [self.sparse_shape[d] for d in keep_dims]
        total = int(np.prod(sizes))
        ids = jnp.zeros((self.nnz_pad,), dtype=jnp.int32)
        stride = 1
        for d, s in zip(reversed(keep_dims), reversed(sizes)):
            # clip first: PAD_INDEX * stride would overflow int32
            ids = ids + jnp.minimum(self.indices[d], s - 1) * stride
            stride *= s
        ids = jnp.where(self.rowmask, ids, total)
        return ids, total

    def _reduce_to_dense(self, dims: Sequence[int], reduce: str) -> jax.Array:
        keep = [i for i in range(self.sparse_dim) if i not in list(dims)]
        ids, total = self._segment_ids_for(keep)
        if len(keep) == 1:
            return segment_reduce(self.values, ids, total, reduce,
                                  indices_are_sorted=(keep[0] == 0))
        out = segment_reduce(self.values, ids, total, reduce,
                             indices_are_sorted=False)
        return out.reshape(tuple(self.sparse_shape[d] for d in keep) +
                           self.denseshape)

    def _reduce_to_sparse(
        self,
        dims: Sequence[int],
        reduce: str,
        seg_ids: jax.Array,
        tar_indices: jax.Array,
        tar_nnz: jax.Array,
    ) -> "SparseTensor":
        """Sparse-output reduction over sparse dims.

        The reference re-coalesces on the fly (SpTensor.py:368-380) — a
        dynamic-shape op.  On TPU the target pattern and the per-row segment
        map are precomputed on the host (see hodata.sp_data: ``pool`` keys)
        and passed in; the device op is a single sorted segment reduce."""
        keep = [i for i in range(self.sparse_dim) if i not in list(dims)]
        vals = segment_reduce(self.values, seg_ids, tar_indices.shape[1],
                              reduce, indices_are_sorted=False)
        return SparseTensor(
            indices=tar_indices,
            values=vals,
            nnz=tar_nnz,
            sparse_shape=tuple(self.sparse_shape[d] for d in keep),
        )

    def _reduce(self, dims, reduce: str, return_sparse: bool = False,
                seg_ids=None, tar_indices=None, tar_nnz=None):
        if isinstance(dims, int):
            dims = [dims]
        if dims is None:
            # reduce over rows entirely (reference passes dims to torch.sum —
            # a latent bug, SpTensor.py:417; we implement the evident intent)
            return segment_reduce(
                self.values,
                jnp.where(self.rowmask, 0, 1),
                1, reduce, indices_are_sorted=True)[0]
        if return_sparse:
            assert seg_ids is not None and tar_indices is not None, (
                "sparse-output pooling needs precomputed seg_ids/tar_indices "
                "(datadict pool keys)")
            return self._reduce_to_sparse(dims, reduce, seg_ids, tar_indices,
                                          tar_nnz)
        return self._reduce_to_dense(dims, reduce)

    def sum(self, dims, return_sparse: bool = False, **kw):
        return self._reduce(dims, "sum", return_sparse, **kw)

    def mean(self, dims, return_sparse: bool = False, **kw):
        return self._reduce(dims, "mean", return_sparse, **kw)

    def max(self, dims, return_sparse: bool = False, **kw):
        return self._reduce(dims, "max", return_sparse, **kw)

    def min(self, dims, return_sparse: bool = False, **kw):
        return self._reduce(dims, "min", return_sparse, **kw)

    # -- diagonal ----------------------------------------------------------

    def diag_to_dense(self, dims: Optional[Sequence[int]] = None) -> jax.Array:
        """Dense diagonal extraction (reference SpTensor.py:322-352).

        For the common full-diagonal case the result row i holds the value at
        index (i, i, ..., i) or 0 — computed as one dropped-OOB scatter, no
        binary search needed on device."""
        if dims is None:
            dims = list(range(self.sparse_dim))
        dims = sorted(set(dims))
        assert len(dims) == self.sparse_dim, (
            "partial-diagonal to dense not supported on device; "
            "precompute the pattern on host")
        first = self.indices[dims[0]]
        ondiag = jnp.ones((self.nnz_pad,), dtype=bool)
        for d in dims[1:]:
            ondiag &= self.indices[d] == first
        tar = jnp.where(ondiag, first, self.sparse_shape[dims[0]])
        # NOT sorted: off-diagonal rows map to the out-of-range sentinel
        # interleaved between ascending diagonal ids
        return segment_reduce(self.values, tar, self.sparse_shape[dims[0]],
                              "sum", indices_are_sorted=False)

    def diag(self, dims: Optional[Sequence[int]] = None,
             return_sparse: bool = False,
             diag_pattern: Optional[tuple] = None):
        """Diagonal extraction (reference SpTensor.py:322-366).  Dense
        output by default; ``return_sparse=True`` returns the diagonal
        sub-pattern as a SparseTensor and needs the host-precomputed
        ``diag_pattern = indexing.diag_ind(indices, dims)`` — the device
        op is one clamp-gather."""
        if return_sparse:
            if diag_pattern is None:
                raise NotImplementedError(
                    "sparse-output diag needs a precomputed pattern: "
                    "indexing.diag_ind(ind, dims) -> "
                    "(tar_indices, tar_nnz, d2a)")
            tar_ind, tar_nnz, d2a = diag_pattern
            tar_ind = jnp.asarray(tar_ind)
            d2a = jnp.asarray(d2a)
            vals = self.values[jnp.maximum(d2a, 0)]
            vals = jnp.where(_expand_mask(d2a >= 0, vals.ndim), vals,
                             jnp.zeros((), vals.dtype))
            if dims is None:
                dims = list(range(self.sparse_dim))
            dims = sorted(set(dims))
            keep = [i for i in range(self.sparse_dim)
                    if i not in dims[1:]]
            return SparseTensor(
                indices=tar_ind, values=vals,
                nnz=jnp.asarray(tar_nnz, jnp.int32),
                sparse_shape=tuple(self.sparse_shape[d] for d in keep))
        return self.diag_to_dense(dims)

    # -- unpooling ---------------------------------------------------------

    def unpooling_fromdense1dim(self, dims: int, X: jax.Array) -> "SparseTensor":
        """Broadcast a dense per-index tensor onto this sparsity pattern
        (reference SpTensor.py:470-476): out.values[r] = X[indices[dims, r]].
        Padded rows clamp-gather then get re-zeroed."""
        assert dims < self.sparse_dim
        return self.tuplewiseapply(lambda _: X[self.indices[dims]])

    def unpooling(self, dims, tarX: "SparseTensor",
                  b2a: Optional[jax.Array] = None) -> "SparseTensor":
        """Broadcast this tensor's values onto tarX's pattern along ``dims``
        of tarX (reference SpTensor.py:447-468).  The row map ``b2a``
        (position of each tarX row's remaining-index tuple in self, -1 if
        absent) is host-precomputed:
        ``indexing.unpooling_ind(src_ind, tar_ind, dims)``."""
        if b2a is None:
            raise NotImplementedError(
                "sparse unpooling needs a precomputed b2a row map "
                "(host: indexing.unpooling_ind(src_ind, tar_ind, dims))")
        vals = self.values[jnp.maximum(b2a, 0)]
        vals = jnp.where(_expand_mask(b2a >= 0, vals.ndim), vals,
                         jnp.zeros((), vals.dtype))
        return tarX.tuplewiseapply(lambda _: vals)

    # -- interop ------------------------------------------------------------
    # (the TPU-native analog of the reference's torch sparse COO converters,
    #  SpTensor.py:478-489)

    @classmethod
    def from_scipy(cls, mat, nnz_pad: Optional[int] = None) -> "SparseTensor":
        """Build from a scipy sparse matrix (host-side)."""
        coo = mat.tocoo()
        ind = np.stack([coo.row, coo.col]).astype(np.int64)
        return cls.from_numpy(ind, coo.data, mat.shape, nnz_pad=nnz_pad)

    def to_scipy(self):
        """Materialize as scipy COO (host-side; 2-dim, scalar values)."""
        import scipy.sparse as ssp

        assert self.sparse_dim == 2 and (self.values is None
                                         or self.values.ndim == 1)
        n = int(self.nnz)
        ind = np.asarray(self.indices)[:, :n]
        val = (np.ones(n) if self.values is None
               else np.asarray(self.values)[:n])
        return ssp.coo_matrix((val, (ind[0], ind[1])),
                              shape=self.sparse_shape)

    @classmethod
    def from_bcoo(cls, mat, nnz_pad: Optional[int] = None) -> "SparseTensor":
        """Build from a jax.experimental.sparse.BCOO (host-side coalesce)."""
        ind = np.asarray(mat.indices).T.astype(np.int64)
        return cls.from_numpy(ind, np.asarray(mat.data),
                              mat.shape[: ind.shape[0]], nnz_pad=nnz_pad)

    def to_bcoo(self):
        """Convert to jax.experimental.sparse.BCOO (keeps padding rows as
        explicit zeros at a clamped index; jit-safe)."""
        from jax.experimental import sparse as jsparse

        ind = jnp.minimum(self.indices, jnp.asarray(
            [[s - 1] for s in self.sparse_shape], jnp.int32)).T
        vals = self.values
        if vals is None:
            vals = jnp.ones((self.nnz_pad,), jnp.float32)
        vals = jnp.where(_expand_mask(self.rowmask, vals.ndim), vals,
                         jnp.zeros((), vals.dtype))
        return jsparse.BCOO((vals, ind), shape=self.shape)

    # -- misc --------------------------------------------------------------

    def to_dense(self) -> jax.Array:
        """Materialize as a dense array (testing / small tensors only)."""
        ids, total = self._segment_ids_for(list(range(self.sparse_dim)))
        vals = self.values
        if vals is None:
            vals = jnp.ones((self.nnz_pad,), dtype=jnp.float32)
        flat = segment_reduce(vals, ids, total, "sum",
                              indices_are_sorted=True)
        return flat.reshape(tuple(self.sparse_shape) + self.denseshape)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"SparseTensor(shape={self.shape}, "
                f"sparse_dim={self.sparse_dim}, nnz_pad={self.nnz_pad})")


jax.tree_util.register_dataclass(
    SparseTensor,
    data_fields=["indices", "values", "nnz"],
    meta_fields=["sparse_shape"],
)
