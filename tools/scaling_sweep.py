"""Scaling-efficiency sweep of the sharded end-to-end codec.

Runs the shard_map compress+decompress graph (engine/sharded_stream) on
virtual CPU meshes of 1/2/4/8 devices with FIXED global work (strong
scaling) and reports time per step, speedup, and parallel efficiency.

Each mesh size runs in its own subprocess because the virtual device
count is fixed at backend init
(``--xla_force_host_platform_device_count``). Prints one JSON line:
  {"metric": "sharded_codec_strong_scaling", "points": [...]}

Caveat for this dev box: 4 physical cores back the virtual devices, so
ideal scaling stops at 4; the 8-device point mainly validates that the
collective-free graph does not add overhead as the mesh grows. On a real
pod each mesh device is a chip and the same graph shards over ICI.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
n = int(sys.argv[1])
import jax.numpy as jnp
from myyuv_tpu.engine import sharded_stream as ss
from myyuv_tpu.kernels import scalar
from myyuv_tpu.parallel import mesh as meshlib
from jax.sharding import NamedSharding, PartitionSpec as P

devices = jax.devices("cpu")[:n]
assert len(devices) == n, (len(devices), n)
mesh = meshlib.make_mesh((n, 1), devices)

h, w = 512, 768                       # 6144 blocks of fixed global work
yy, xx = np.mgrid[0:h, 0:w]
plane = ((128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.int32)
         % 256).astype(np.uint8)
qt = jnp.asarray(np.asarray(scalar.plane_qtable(0, 50), np.float32))
blocks = ss._host_plane_to_blocks(plane)
compress, decompress = ss.make_sharded_plane_codec(mesh)
sh = NamedSharding(mesh, P(ss.AXES))
bdev = jax.device_put(jnp.asarray(blocks), sh)

def step():
    c4, sizes, rows, ok = compress(bdev, qt)
    pix, dok = decompress(c4, sizes, qt)
    return pix

jax.block_until_ready(step())
reps = 8
t0 = time.perf_counter()
for _ in range(reps):
    r = step()
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / reps
print(json.dumps({"n": n, "step_s": dt}))
"""


def main() -> int:
    points = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run(
            [sys.executable, "-c", _WORKER, str(n)], env=env,
            capture_output=True, text=True, timeout=600)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            return 1
        points.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(f"n={n}: {points[-1]['step_s']*1e3:.1f} ms/step",
              file=sys.stderr, flush=True)
    t1 = points[0]["step_s"]
    for p in points:
        p["speedup"] = round(t1 / p["step_s"], 3)
        p["efficiency"] = round(t1 / p["step_s"] / p["n"], 3)
    print(json.dumps({"metric": "sharded_codec_strong_scaling",
                      "host_cores": os.cpu_count(),
                      "points": points}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
