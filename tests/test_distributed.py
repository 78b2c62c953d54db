"""Two-process jax.distributed smoke test on CPU (VERDICT round-1 item:
multi-host was wired but never executed).

Spawns two fresh processes with a local coordinator; each initializes via
parallel.distributed.maybe_initialize_distributed, asserts the global
device view spans both processes, and runs a cross-process psum over a
jax.make_array_from_process_local_data-backed global array.
"""

import socket
import subprocess
import sys

_WORKER = r"""
import sys
import jax
import jax.numpy as jnp
import numpy as np

coord, pid = sys.argv[1], int(sys.argv[2])
jax.config.update("jax_platforms", "cpu")

from yolo_ms_tpu.parallel.distributed import maybe_initialize_distributed, process_info

ok = maybe_initialize_distributed(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert ok, "initialize returned False"
info = process_info()
assert info["process_count"] == 2, info
n_local = info["local_devices"]
n_global = info["global_devices"]
assert n_global == 2 * n_local, info

# cross-process collective: global sum over a process-sharded array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("data",))
sharding = NamedSharding(mesh, P("data"))
local = np.full((n_local, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, (n_global, 4))
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(garr)
# fetching a fully-replicated scalar is process-local
assert float(total) == (1.0 + 2.0) * n_local * 4, float(total)

# GT-bucket consensus: hosts with different local GT occupancy must agree
# on the max so every process picks the SAME train-step specialization
# (Trainer._bucket_gt); here pid 0 needs 7 slots, pid 1 needs 33.
from yolo_ms_tpu.parallel.distributed import global_max_int

agreed = global_max_int(7 if pid == 0 else 33)
assert agreed == 33, f"bucket consensus returned {agreed}, want 33"
print(f"WORKER_OK {pid}", flush=True)
"""


def test_two_process_cpu_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {i}" in out
