"""Device-side aggregation primitive: sorted segment reduction.

The TPU-native equivalent of the reference's single aggregation primitive
``torch_scatter_reduce`` (reference pygho/backend/utils.py:6-55, a wrapper
over CUDA atomic ``Tensor.scatter_reduce_``).  On TPU the index arrays are
sorted at preprocessing time, so reductions are one-pass deterministic
segment reductions — no atomics, bitwise-reproducible across runs (a parity
advantage over the CUDA reference, whose float atomics are order-dependent).

Semantics matched to the reference:
- ``aggr`` in {"sum", "mean", "max", "min"}.
- Segments that receive no contribution yield 0 (the reference zero-inits the
  output and scatters with include_self=False, utils.py:51-55).
- Out-of-range segment ids (the PAD_INDEX convention) are dropped by the XLA
  scatter, which is what makes static-shape padding free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_reduce(
    src: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    aggr: str = "sum",
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Reduce rows of ``src`` into ``num_segments`` buckets by ``seg_ids``.

    Args:
      src: ``[n, *dense]`` contributions.
      seg_ids: ``i32[n]``; entries outside ``[0, num_segments)`` are dropped.
      num_segments: static output row count.
      aggr: "sum" | "mean" | "max" | "min".
      indices_are_sorted: set True when seg_ids is ascending (the canonical
        coalesced/acd invariant) — lets XLA lower to a faster scatter.

    Returns:
      ``[num_segments, *dense]``; empty segments are 0.
    """
    if aggr == "sum":
        return jax.ops.segment_sum(
            src, seg_ids, num_segments, indices_are_sorted=indices_are_sorted)
    if aggr == "mean":
        total = jax.ops.segment_sum(
            src, seg_ids, num_segments, indices_are_sorted=indices_are_sorted)
        ones = jnp.ones((src.shape[0],), dtype=src.dtype)
        cnt = jax.ops.segment_sum(
            ones, seg_ids, num_segments, indices_are_sorted=indices_are_sorted)
        cnt = jnp.maximum(cnt, 1).reshape((-1,) + (1,) * (src.ndim - 1))
        return total / cnt
    if aggr == "max":
        out = jax.ops.segment_max(
            src, seg_ids, num_segments, indices_are_sorted=indices_are_sorted)
        return jnp.where(jnp.isneginf(out), jnp.zeros_like(out), out)
    if aggr == "min":
        out = jax.ops.segment_min(
            src, seg_ids, num_segments, indices_are_sorted=indices_are_sorted)
        return jnp.where(jnp.isposinf(out), jnp.zeros_like(out), out)
    raise ValueError(f"unknown aggr {aggr}")


def segment_softmax(
    src: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
    stable: str = "segment",
) -> jax.Array:
    """Per-segment softmax over rows — building block for attention-style
    message functions (the reference enables subgraph GAT through spspmpnn's
    message_func, docs/BasicOperators.md:75-83).

    ``stable`` picks the overflow shift: "segment" (default) subtracts
    the per-segment max — the torch-convention, safe for any input
    range; "global" subtracts the per-column global max — the SAME
    softmax mathematically (any within-segment-constant shift cancels),
    but it replaces the expensive segment_max scatter + gather-back with
    one column reduce: measured 0.50 vs 1.14 ms on a (65k, 128) ZINC
    attention batch on v5e (segment scatter-max lowers ~2x slower than
    scatter-add).  Trade-off: entries more than ~80 below the column max
    underflow to exp(.) = 0 — fine for activations-derived attention
    scores, wrong for wild dynamic ranges."""
    if stable == "global":
        m = jax.lax.stop_gradient(jnp.max(src, axis=0, keepdims=True))
        e = jnp.exp(src - jnp.where(jnp.isfinite(m), m, 0.0))
    else:
        m = jax.ops.segment_max(
            src, seg_ids, num_segments,
            indices_are_sorted=indices_are_sorted)
        m = jnp.where(jnp.isneginf(m), jnp.zeros_like(m), m)
        e = jnp.exp(src - m[seg_ids])
    denom = jax.ops.segment_sum(
        e, seg_ids, num_segments, indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return e / denom[seg_ids]
