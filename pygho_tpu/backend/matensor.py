"""MaskedTensor: padded dense tensor + boolean validity mask.

Re-design of the reference MaskedTensor (pygho/backend/MaTensor.py:34-266)
as a frozen pytree.  Semantics follow the reference: ``mask`` is True for
valid entries; reductions fill invalid entries with the op-neutral value,
reduce densely (VPU/MXU friendly) and re-mask.

Deviations from the reference (documented, deliberate):
- ``min`` actually computes a minimum.  The reference's ``min`` applies
  ``amax`` to +inf-filled data and therefore returns a max
  (MaTensor.py:200-206) — a latent bug we fix rather than replicate.
- No in-place fill (functional style): ``padvalue`` bookkeeping is replaced
  by always-explicit ``fill_masked``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def filterinf(x: jax.Array, filled_value: float = 0.0) -> jax.Array:
    """Replace +/-inf with ``filled_value`` (reference MaTensor.py:8-31)."""
    return jnp.where(jnp.isinf(x), jnp.asarray(filled_value, x.dtype), x)


@dataclasses.dataclass(frozen=True)
class MaskedTensor:
    data: jax.Array   # [*maskedshape, *denseshape]
    mask: jax.Array   # bool[*maskedshape], True = valid

    def __post_init__(self):
        # shape guards only when both children are array-like: pytree
        # transforms (nnx.remat's clear_non_graph_nodes, tree_map with
        # None/placeholder leaves) reconstruct registered dataclasses
        # with non-array children, and must not trip dev asserts
        # (SparseTensor has no __post_init__ for the same reason)
        if hasattr(self.data, "ndim") and hasattr(self.mask, "ndim"):
            assert self.data.ndim >= self.mask.ndim
            assert self.data.shape[: self.mask.ndim] == self.mask.shape

    # -- properties --------------------------------------------------------

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def masked_dim(self) -> int:
        return self.mask.ndim

    @property
    def dense_dim(self) -> int:
        return self.data.ndim - self.mask.ndim

    @property
    def maskedshape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape[: self.mask.ndim])

    @property
    def denseshape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape[self.mask.ndim:])

    @property
    def fullmask(self) -> jax.Array:
        """mask broadcast to data's rank."""
        return self.mask.reshape(self.mask.shape + (1,) * self.dense_dim)

    # -- filling -----------------------------------------------------------

    def fill_masked(self, val: float = 0.0) -> jax.Array:
        """Return data with invalid entries set to ``val``
        (reference MaTensor.py:122-128)."""
        return jnp.where(self.fullmask, self.data,
                         jnp.asarray(val, self.data.dtype))

    # -- reductions --------------------------------------------------------

    def _outmask(self, dims, keepdim: bool) -> jax.Array:
        return jnp.any(self.mask, axis=dims, keepdims=keepdim)

    def sum(self, dims: Union[int, Sequence[int]], keepdim: bool = False) -> "MaskedTensor":
        dims = _canon(dims)
        return MaskedTensor(
            jnp.sum(self.fill_masked(0.0), axis=dims, keepdims=keepdim),
            self._outmask(dims, keepdim))

    def mean(self, dims: Union[int, Sequence[int]], keepdim: bool = False) -> "MaskedTensor":
        dims = _canon(dims)
        cnt = jnp.maximum(
            jnp.sum(self.fullmask, axis=dims, keepdims=keepdim), 1)
        s = self.sum(dims, keepdim)
        return MaskedTensor(s.data / cnt.astype(s.data.dtype), s.mask)

    def max(self, dims: Union[int, Sequence[int]], keepdim: bool = False) -> "MaskedTensor":
        dims = _canon(dims)
        out = jnp.max(self.fill_masked(-jnp.inf), axis=dims, keepdims=keepdim)
        return MaskedTensor(filterinf(out, 0.0), self._outmask(dims, keepdim))

    def min(self, dims: Union[int, Sequence[int]], keepdim: bool = False) -> "MaskedTensor":
        dims = _canon(dims)
        out = jnp.min(self.fill_masked(jnp.inf), axis=dims, keepdims=keepdim)
        return MaskedTensor(filterinf(out, 0.0), self._outmask(dims, keepdim))

    # -- diagonal / unpooling ---------------------------------------------

    def diag(self, dims: Sequence[int]) -> "MaskedTensor":
        """Take the joint diagonal of the given masked dims, placing the
        result at dims[0] (reference MaTensor.py:208-223)."""
        dims = sorted(dims)
        assert len(dims) >= 2
        tdata = jnp.diagonal(self.data, 0, dims[0], dims[1])
        tmask = jnp.diagonal(self.mask, 0, dims[0], dims[1])
        for d in dims[2:]:
            tdata = jnp.diagonal(tdata, 0, d, -1)
            tmask = jnp.diagonal(tmask, 0, d, -1)
        tdata = jnp.moveaxis(tdata, -1, dims[0])
        tmask = jnp.moveaxis(tmask, -1, dims[0])
        return MaskedTensor(tdata, tmask)

    def unpooling(self, dims: Union[int, Sequence[int]], tarX: "MaskedTensor") -> "MaskedTensor":
        """Broadcast along new dims to tarX's masked shape
        (reference MaTensor.py:225-234)."""
        if isinstance(dims, int):
            dims = [dims]
        dims = sorted(dims)
        tdata = self.data
        for d in dims:
            tdata = jnp.expand_dims(tdata, d)
        target = tuple(
            tarX.shape[i] if i in dims else tdata.shape[i]
            for i in range(tdata.ndim))
        tdata = jnp.broadcast_to(tdata, target)
        return MaskedTensor(tdata, tarX.mask)

    # -- value transforms --------------------------------------------------

    def tuplewiseapply(self, func: Callable[[jax.Array], jax.Array]) -> "MaskedTensor":
        return MaskedTensor(func(self.fill_masked(0.0)), self.mask)

    def diagonalapply(self, func: Callable[[jax.Array, jax.Array], jax.Array]) -> "MaskedTensor":
        """func(data, is_diagonal i32 of maskedshape) for (b, n, n) tensors
        (reference MaTensor.py:241-249)."""
        assert self.masked_dim == 3, "only implemented for (b, n, n)"
        eye = jnp.eye(self.shape[1], self.shape[2], dtype=jnp.int32)
        eye = jnp.broadcast_to(eye[None], self.maskedshape)
        return MaskedTensor(func(self.data, eye), self.mask)

    def add(self, tarX: "MaskedTensor", samesparse: bool) -> "MaskedTensor":
        if samesparse:
            return MaskedTensor(self.data + tarX.data, self.mask)
        return MaskedTensor(
            self.fill_masked(0.0) + tarX.fill_masked(0.0),
            jnp.logical_or(self.mask, tarX.mask))

    def catvalue(self, tarXs: Union["MaskedTensor", Iterable["MaskedTensor"]],
                 samesparse: bool) -> "MaskedTensor":
        assert samesparse
        if isinstance(tarXs, MaskedTensor):
            tarXs = [tarXs]
        data = jnp.concatenate(
            [self.fill_masked(0.0)] + [t.fill_masked(0.0) for t in tarXs],
            axis=-1)
        return MaskedTensor(data, self.mask)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"MaskedTensor(shape={self.shape}, "
                f"masked_dim={self.masked_dim})")


def _canon(dims):
    if isinstance(dims, int):
        return (dims,)
    return tuple(dims)


jax.tree_util.register_dataclass(
    MaskedTensor, data_fields=["data", "mask"], meta_fields=[])
