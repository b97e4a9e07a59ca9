"""Worker for the 2-process jax.distributed CPU test (spawned by
tests/test_multiprocess.py). Exercises the REAL multi-host branches of
parallel/render.py: process_count()>1 host shard slicing, host-0 gates,
per-host RNG, and a cross-process psum through a jitted global-array
reduction."""
import json
import os
import sys

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nerf_projects_tpu.parallel.render import (
    host_offset_key,
    host_shard_slice,
    is_main_process,
    process_count,
    process_index,
)

assert process_count() == n_procs, process_count()
assert process_index() == proc_id

result = {
    "proc": proc_id,
    "n_local_devices": jax.local_device_count(),
    "n_global_devices": jax.device_count(),
}

# host shard slicing (datasets.py:81 behavior)
sl = host_shard_slice(8)
result["shard"] = [sl.start, sl.stop]

# per-host RNG decorrelation (train.py:138,207)
key = host_offset_key(jax.random.PRNGKey(0))
result["key"] = np.asarray(jax.random.key_data(key)).tolist()

# host-0 gate (train.py:200,228)
if is_main_process():
    with open(os.path.join(outdir, "host0.txt"), "w") as f:
        f.write("main\n")

# cross-process collective: global array sharded over all devices,
# jitted global sum must equal the analytic total on every process
n_dev = jax.device_count()
mesh = jax.sharding.Mesh(np.array(jax.devices()), ("d",))
sharding = NamedSharding(mesh, P("d"))
global_shape = (n_dev * 4,)
local_devices = jax.local_devices()
per_dev = global_shape[0] // n_dev

all_devices = list(jax.devices())  # mesh order

def make_local(d):
    idx = all_devices.index(d)
    return jnp.arange(idx * per_dev, (idx + 1) * per_dev, dtype=jnp.float32)

arrays = [
    jax.device_put(make_local(d), jax.sharding.SingleDeviceSharding(d))
    for d in local_devices
]
garr = jax.make_array_from_single_device_arrays(
    global_shape, sharding, arrays
)

total = jax.jit(
    lambda x: jnp.sum(x),
    out_shardings=NamedSharding(mesh, P()),
)(garr)
expected = float(sum(range(global_shape[0])))
assert float(total) == expected, (float(total), expected)
result["psum_ok"] = True

with open(os.path.join(outdir, f"proc{proc_id}.json"), "w") as f:
    json.dump(result, f)
print("WORKER_OK", proc_id)
