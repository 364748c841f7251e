"""Capture a 3-rep device profile of the production frame roundtrip.

Writes an xplane trace under .profiles/r3 and prints the op aggregate
(tools/xplane_dump). Usage: python tools/exp_r3prof.py [outdir]
"""
import glob
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else ".profiles/r3"
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    planes = bench.get_4k_planes()
    h, w = planes[0].shape
    qts = [jnp.asarray(np.asarray(scalar.plane_qtable(i, 50), np.float32))
           for i in range(3)]
    y, u, v = [jnp.asarray(p) for p in planes]

    def rt():
        cA, cC, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
        ry, *_ = ds.decompress_frame(cA, cC, sizes, *qts, h=h, w=w)
        return ry

    np.asarray(rt()[:1])   # warm
    with jax.profiler.trace(outdir):
        for _ in range(3):
            ry = rt()
        np.asarray(ry[:1])
    pb = sorted(glob.glob(outdir + "/plugins/profile/*/*.xplane.pb"),
                key=os.path.getmtime)[-1]
    print("trace:", pb, flush=True)
    subprocess.run([sys.executable, "tools/xplane_dump.py", pb, "30"])


if __name__ == "__main__":
    main()
