"""Per-quality RD + device-entropy throughput on the real chip.

BASELINE config 4. Two tables (VERDICT r3 weak #3/#4):

  rd_points   — the TRUE ORIGINAL 992x736 image (raw
                chef-with-trumpet.myyuv): a real rate-distortion curve,
                monotone in PSNR (the 4K golden planes are a q50
                DECOMPRESSED artifact, so re-encoding them at q50 is
                near-lossless and distorts the curve).
  throughput  — the 4K artifact-sourced sweep kept for per-quality
                device throughput (sync-latency-corrected timing, and
                now including the FUSED roundtrip executable — the
                production transcode path).

Writes RD_DEVICE.json at the repo root and prints it.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402

from myyuv_tpu import YUVImage  # noqa: E402
from myyuv_tpu.engine import sweep  # noqa: E402

QUALITIES = (10, 30, 50, 70, 90)
SMALL = "/root/reference/images/chef-with-trumpet.myyuv"


def main():
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    out = {"metric": "rd_device_entropy"}
    if os.path.exists(SMALL):
        planes = [p for p in YUVImage.load(SMALL).planes() if p is not None]
        out["rd_points"] = {
            "source": "true original 992x736 chef-with-trumpet.myyuv "
                      "(never-compressed IYUV)",
            "points": sweep.quality_sweep(planes, qualities=QUALITIES,
                                          entropy_backend="device"),
        }
    planes4k = bench.get_4k_planes()
    out["throughput_4k"] = {
        "source": "4032x3008 golden planes = the q50-DECOMPRESSED "
                  "artifact (throughput only: its q50 RD point "
                  "re-encodes near-losslessly)",
        "points": sweep.quality_sweep(planes4k, qualities=QUALITIES,
                                      entropy_backend="device",
                                      time_device=True),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RD_DEVICE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
