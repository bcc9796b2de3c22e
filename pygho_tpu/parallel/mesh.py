"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("dp",),
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    Default: a 1-D "dp" mesh over all devices.  For multi-host, call
    jax.distributed.initialize() first; jax.devices() then spans hosts and
    the mesh lays dp over DCN-adjacent hosts and inner axes over ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) if len(axis_names) == 1 else None
    assert axis_sizes is not None and int(np.prod(axis_sizes)) == n, (
        f"axis sizes {axis_sizes} do not cover {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize JAX multi-host (multi-process) execution.

    Call before any other JAX API on each host of a pod slice; afterwards
    jax.devices() spans all hosts and make_mesh() can lay axes across
    DCN/ICI.  Args default to the TPU runtime's automatic discovery."""
    import jax

    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
