"""Per-quality RD + device-entropy throughput on the real chip.

BASELINE config 4: rate measured from the flagship device codec
(compress_frame) and per-quality device encode/decode fps recorded.
Writes RD_DEVICE.json at the repo root and prints it.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402

from myyuv_tpu.engine import sweep  # noqa: E402


def main():
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    planes = bench.get_4k_planes()
    pts = sweep.quality_sweep(planes, qualities=(10, 30, 50, 70, 90),
                              entropy_backend="device", time_device=True)
    out = {"metric": "4k_rd_device_entropy", "points": pts}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RD_DEVICE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
