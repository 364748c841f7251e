"""Measured per-phase cycle split of the fused DCT+encode kernel.

VERDICT r3 weak #6: the encoder cycle budget was estimated from op
counts; this measures it by PHASE ABLATION — kernel variants that skip
one phase's sequential loops while keeping every loop bound and tensor
shape identical (pallas_encode8._encode_body `ablate`), so
T(full) - T(ablated) is that phase's device time.

Usage: python tools/exp_encphase.py [variant ...]
  variants: full serial lut merge depth frontonly   (default: all)
Run variants in separate invocations if compile time crowds the 600 s
command cap — the persistent cache keeps finished ones warm.
"""

import glob
import importlib.util
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.entropy import pallas_encode8 as pe8  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402

VARIANTS = ["full", "serial", "lut", "merge", "cansort", "groups",
            "frontonly", "dct"]


def sync(x):
    np.asarray(x.ravel()[:1])


def device_time(fn, reps=20):
    """Per-rep device time of fn's executables via an xplane trace."""
    import jax
    spec = importlib.util.spec_from_file_location(
        "xplane_dump", str(REPO / "tools" / "xplane_dump.py"))
    xd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(xd)
    out = fn()
    sync(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = fn()
            sync(out)
        pb = sorted(glob.glob(td + "/plugins/profile/*/*.xplane.pb"))[-1]
        buf = open(pb, "rb").read()
    total = 0.0
    for fno, _, v in xd.fields(buf):
        if fno != 1:
            continue
        name, _meta, agg, _ = xd.parse_plane(v)
        if "TPU" not in name:
            continue
        for (lname, _mid), ms in agg.items():
            if lname == "XLA Modules":
                total += ms
    return total / reps / 1e3


def main():
    names = sys.argv[1:] or VARIANTS
    import bench

    planes_np = bench.get_4k_planes()
    h, w = planes_np[0].shape
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc
    qts = eb.plane_qtables([50] * 3)
    y, u, v = [jnp.asarray(p) for p in planes_np]

    @jax.jit
    def stage_pack(y, u, v):
        parts = [p8.pack_pixel_words(p) for p in (y, u, v)]
        xw = jnp.concatenate(parts, axis=1)
        padc = (-(n // 8)) % p8.TILE
        if padc:
            xw = jnp.concatenate(
                [xw, jnp.zeros((128, padc), jnp.int32)], axis=1)
        return xw

    xw = stage_pack(y, u, v)
    qtx = p8.expand_qtables(tuple(qts))
    pids = p8.plane_pids(ny, nc, xw.shape[1] - n // 8)
    sync(xw)

    times = {}
    for name in names:
        if name == "dct":
            # standalone DCT+quantize kernel (same pair output the
            # fused kernel computes in VMEM): front(sort) cost =
            # frontonly - dct
            def run():
                return p8.dct_quantize_words(xw, qtx, pids)
        else:
            ab = "" if name == "full" else name

            def run(ab=ab):
                return pe8.dct_encode_words_packed(xw, qtx, pids, cont=8,
                                                   ablate=ab)

        t0 = time.perf_counter()
        out = run()
        sync(out[0])
        compile_s = time.perf_counter() - t0
        # DEVICE time via xplane: wall windows carry the tunnel's
        # 25-50 ms (and drifting) sync latency, which swamps sub-ms
        # phase deltas
        dt = device_time(lambda: run()[0])
        times[name] = dt
        print(f"{name:10s}: {dt*1e3:7.3f} ms device "
              f"(first call {compile_s:.1f} s)", flush=True)

    if "full" in times:
        full = times["full"]
        print(f"\nphase deltas vs full ({full*1e3:.3f} ms):", flush=True)
        for name, dt in times.items():
            if name in ("full", "frontonly"):
                continue
            print(f"  {name:10s}: {(full-dt)*1e3:7.3f} ms", flush=True)
        if "frontonly" in times:
            print(f"  front+DCT : {times['frontonly']*1e3:7.3f} ms "
                  f"(the frontonly variant's absolute time)", flush=True)
        if "dct" in times and "frontonly" in times:
            print(f"  dct alone : {times['dct']*1e3:7.3f} ms; front sort "
                  f"= {(times['frontonly']-times['dct'])*1e3:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
