"""Multi-host (DCN) smoke: a real 2-process jax.distributed local cluster.

The trainer's multi-host story (`train.distributed`, per-host data feeding
via ``make_array_from_process_local_data``) is validated without real hosts
by spawning two CPU processes that form a jax.distributed cluster on
localhost, build a global mesh over all 4 (2x2) devices, feed per-process
batch shards, and run one jitted data-parallel loss step — both processes
must observe the identical global loss (XLA all-reduce over the cluster).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()).reshape(4,), ("data",))
sharding = NamedSharding(mesh, P("data"))

# per-host data sharding: each process contributes ITS half of the batch
local = np.arange(8, dtype=np.float32) + 100 * pid  # distinct per host
x = jax.make_array_from_process_local_data(sharding, local)
assert x.shape == (16,), x.shape

@jax.jit
def loss(x):
    return (x ** 2).mean()  # global mean -> XLA all-reduce across hosts

val = float(loss(x))
# expected over the concatenated [process0 slice, process1 slice]
want = float(np.mean(np.concatenate([np.arange(8), np.arange(8) + 100]) ** 2))
assert abs(val - want) < 1e-3, (val, want)
print(f"WORKER_OK {pid} {val:.4f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_data_parallel(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-2000:]}"
        assert f"WORKER_OK {pid}" in out, out[-2000:]
    # both processes computed the same global loss
    v0 = [l for l in outs[0].splitlines() if l.startswith("WORKER_OK")][0].split()[-1]
    v1 = [l for l in outs[1].splitlines() if l.startswith("WORKER_OK")][0].split()[-1]
    assert v0 == v1


def test_distributed_init_failure_is_fatal(tmp_path):
    """train.distributed=true with a broken cluster config must raise,
    never fall back to silent single-host training. (An unreachable-but-
    specified coordinator aborts at the C++ layer after its timeout — also
    loud; the Python-level misconfiguration path is what used to be
    swallowed with a print.)"""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training import Trainer

    cfg = loads(f"""
tensorboard_path: {tmp_path}/logs
epochs: 1
optimizer: {{lr: 1e-3}}
seed: 0
monitor: val_loss
monitor_mode: min
distributed: true
""")
    # no coordinator_address and no cluster env -> initialize() raises;
    # the trainer must convert that into a fatal, explanatory error
    with pytest.raises(RuntimeError, match="refusing to fall back"):
        Trainer(cfg, name="dist_fail")
