"""2-process multi-host smoke test for parallel.mesh.init_multihost
(VERDICT r2 #6 / coverage row #45).

Spawns two CPU-backend processes with a localhost coordinator via
jax.distributed.initialize (through init_multihost), builds a global
mesh over both processes' devices, and runs one psum and one tiny
data-parallel SGD step.  This exercises the real multi-process path —
distributed init, cross-process mesh construction, jit over a global
mesh with process-local addressable shards — without TPU pods.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pygho_tpu.parallel.mesh import init_multihost
init_multihost(coordinator_address=f"127.0.0.1:{port}",
               num_processes=nproc, process_id=pid)

assert jax.process_count() == nproc, jax.process_count()
ndev = len(jax.devices())
assert ndev == nproc * len(jax.local_devices()), (
    ndev, len(jax.local_devices()))

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("dp",))

# one psum across the global mesh via a sharded sum
from jax.experimental.shard_map import shard_map
from functools import partial

@partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
def allsum(x):
    return jax.lax.psum(jnp.sum(x), "dp")[None]

xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")),
    np.full((len(jax.local_devices()),), float(pid + 1), np.float32),
    (ndev,))
total = allsum(xs)
want = sum((p + 1) * len(jax.local_devices()) for p in range(nproc))
assert abs(float(total[0]) - want) < 1e-6, (float(total[0]), want)

# one tiny dp SGD step: grads psum-averaged across processes
w0 = jnp.ones((4,), jnp.float32)

@jax.jit
def step(w, xb):
    def loss(w):
        return jnp.mean((xb @ w[None].T.reshape(4, 1)).sum(-1) ** 2)
    g = jax.grad(loss)(w)
    return w - 0.1 * g

xb = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp", None)),
    np.full((len(jax.local_devices()), 4), 1.0 + pid, np.float32),
    (ndev, 4))
w1 = step(w0, xb)
# the updated weights are replicated: every process must see the same
w1g = np.asarray(jax.device_get(w1.addressable_shards[0].data))
print("MULTIHOST_OK", pid, np.round(w1g.reshape(-1), 6).tolist(),
      flush=True)
"""


@pytest.mark.skipif(os.environ.get("PYGHO_SKIP_MULTIHOST") == "1",
                    reason="multihost smoke disabled")
def test_two_process_multihost_smoke(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ,
               REPO=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               JAX_PLATFORMS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-2000:]
    # both processes computed identical replicated weights
    w0 = outs[0].split("MULTIHOST_OK 0", 1)[1].splitlines()[0]
    w1 = outs[1].split("MULTIHOST_OK 1", 1)[1].splitlines()[0]
    assert w0.strip() == w1.strip(), (w0, w1)
