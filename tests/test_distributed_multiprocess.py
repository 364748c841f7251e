"""Two-process jax.distributed test: the multi-process branches of
parallel/distributed.py (initialize, allgather_sizes, gather_streams)
execute for real — two CPU processes compress disjoint halves of one
plane and both assemble the identical global stream."""

import hashlib
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import hashlib, json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
from myyuv_tpu.parallel import distributed as dist
dist.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

from myyuv_tpu import entropy
from myyuv_tpu.kernels import scalar

h, w = 32, 64
yy, xx = np.mgrid[0:h, 0:w]
plane = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
qt = scalar.plane_qtable(0, 50)
coeffs = scalar.dct_quantize_blocks(
    scalar.plane_to_blocks(plane), qt).reshape(-1, 64)
lo, hi = dist.local_shard(coeffs.shape[0])
sizes, content = entropy.encode_blocks(coeffs[lo:hi])

all_sizes = dist.allgather_sizes(sizes)
gsizes, gcontent = dist.gather_streams(sizes, content)
offs = dist.global_offsets(all_sizes)
print(json.dumps({
    "pid": pid,
    "n_hosts": len(all_sizes),
    "offsets": [int(o) for o in offs],
    "n_blocks": int(gsizes.size),
    "sha": hashlib.sha256(gcontent.tobytes()).hexdigest(),
}), flush=True)
"""


def test_two_process_gather_streams(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # the ambient sitecustomize registers the TPU PJRT plugin (touching
    # the backend) when this is set; jax.distributed.initialize must run
    # before any backend init, so drop it for the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes saw 2 hosts and assembled the identical global stream
    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["n_hosts"] == 2 for o in outs)
    assert outs[0]["sha"] == outs[1]["sha"]
    assert outs[0]["offsets"] == outs[1]["offsets"]
    assert outs[0]["offsets"][0] == 0 and outs[0]["offsets"][1] > 0

    # and it matches the single-process encode of the whole plane
    from myyuv_tpu import entropy
    from myyuv_tpu.kernels import scalar
    h, w = 32, 64
    yy, xx = np.mgrid[0:h, 0:w]
    plane = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    qt = scalar.plane_qtable(0, 50)
    coeffs = scalar.dct_quantize_blocks(
        scalar.plane_to_blocks(plane), qt).reshape(-1, 64)
    sizes, content = entropy.encode_blocks(coeffs)
    assert outs[0]["n_blocks"] == sizes.size
    assert outs[0]["sha"] == hashlib.sha256(content.tobytes()).hexdigest()
