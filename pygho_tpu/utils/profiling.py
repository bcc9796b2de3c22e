"""Profiling hooks: jax.profiler traces + device memory stats.

Replaces the reference's time.time() + torch.cuda.max_memory_allocated
prints (example/zinc.py:417-427) with xplane traces viewable in
TensorBoard / xprof and structured memory stats."""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, annotate: Optional[str] = None):
    """Capture an xplane trace of the enclosed block::

        with profile_trace("/tmp/trace"):
            train_step(model, opt, batch)
    """
    jax.profiler.start_trace(logdir)
    try:
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, float]:
    """Per-device memory statistics in GB (bytes_in_use / peak /
    bytes_limit where the backend reports them)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    g = 1024 ** 3
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
              "largest_alloc_size"):
        if k in stats:
            out[k.replace("bytes", "gb")] = stats[k] / g
    return out


annotate = jax.profiler.TraceAnnotation
