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

import sys
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

VARIANTS = ["full", "serial", "lut", "merge", "frontonly"]


def sync(x):
    np.asarray(x.ravel()[:1])


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
        ab = "" if name == "full" else name

        def run(ab=ab):
            return pe8.dct_encode_words_packed(xw, qtx, pids, cont=8,
                                               ablate=ab)

        t0 = time.perf_counter()
        out = run()
        sync(out[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            out = run()
        sync(out[0])
        dt = (time.perf_counter() - t0) / 10
        times[name] = dt
        print(f"{name:10s}: {dt*1e3:7.3f} ms  (first call {compile_s:.1f} s)",
              flush=True)

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


if __name__ == "__main__":
    main()
