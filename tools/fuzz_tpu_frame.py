"""On-chip differential content fuzz of the word-contract codec.

Random adversarial 4K frames (uniform noise, gradients, flat fields,
impulse patterns) at random qualities run through the FIXED golden
geometry — no recompiles — and every stream is byte-compared against
the host coder; reconstructions pixel-compared against the scalar
model of the decoded coefficients. Exercises the cont ladder, the
tile-max tiers (nmax / mlenmax / sym2 / window), and the ok flags with
content the golden image never produces.

Usage: python tools/fuzz_tpu_frame.py [n_frames] [seed]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from myyuv_tpu import entropy  # noqa: E402
from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.engine import word_frame as wf  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402

H, W = 3008, 4032     # the golden geometry: every executable is cached


def _content(rng, kind, shape):
    h, w = shape
    if kind == 0:                                   # uniform noise
        return rng.integers(0, 256, shape, np.uint8)
    if kind == 1:                                   # smooth gradient
        yy, xx = np.mgrid[0:h, 0:w]
        return ((xx * 255 // max(w - 1, 1) + yy // 7) % 256).astype(np.uint8)
    if kind == 2:                                   # flat field
        return np.full(shape, int(rng.integers(0, 256)), np.uint8)
    if kind == 3:                                   # sparse impulses
        p = np.full(shape, 128, np.uint8)
        n = int(rng.integers(10, 2000))
        p[rng.integers(0, h, n), rng.integers(0, w, n)] = \
            rng.integers(0, 256, n)
        return p
    # banded extremes: alternating 0/255 rows at random period
    per = int(rng.integers(1, 17))
    yy = np.arange(h)[:, None] // per % 2
    band = np.broadcast_to((yy * 255).astype(np.uint8), shape)
    return band ^ np.uint8(int(rng.integers(0, 2)) * 255)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    assert jax.devices()[0].platform != "cpu"
    rng = np.random.default_rng(seed)
    fails = 0
    for i in range(n_frames):
        kinds = rng.integers(0, 5, 3)
        q = int(rng.choice([1, 10, 35, 50, 75, 90, 100]))
        y = _content(rng, kinds[0], (H, W))
        u = _content(rng, kinds[1], (H // 2, W // 2))
        v = _content(rng, kinds[2], (H // 2, W // 2))
        qts_np = [np.asarray(scalar.plane_qtable(p, q), np.float32)
                  for p in range(3)]
        t0 = time.perf_counter()
        # device streams (ladder-walking host API over the word kernels)
        got = ds.compress_frame_to_streams((y, u, v), qts_np,
                                           cont0=ds.cont_for_quality(q))
        ok_all = True
        for p, plane in enumerate((y, u, v)):
            co = scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(plane), qts_np[p])
            ws, wc = entropy.encode_blocks(
                co.reshape(-1, 64).astype(np.int16))
            if not (np.array_equal(got[p][0].astype(np.int64), ws)
                    and np.array_equal(got[p][1], wc)):
                ok_all = False
        # roundtrip through the word contract; compare vs scalar recon
        qts = eb.plane_qtables([q] * 3)
        xw = wf.pack_frame(jnp.asarray(y), jnp.asarray(u),
                           jnp.asarray(v))
        rxw = total = None
        for cont in (t for t in ds.CONT_LADDER
                     if t >= (ds.cont_for_quality(q) or 0)):
            rxw, total, rok = wf.roundtrip_words(xw, *qts, h=H, w=W,
                                                 cont=cont)
            if bool(rok):
                break
        else:
            print(f"frame {i}: roundtrip overflowed every tier "
                  f"(q={q}) — BUG (format max is 255 B)")
            fails += 1
            continue
        ry, ru, rv = wf.unpack_frame(rxw, H, W)
        for p, (plane, rec) in enumerate(((y, ry), (u, ru), (v, rv))):
            co = scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(plane), qts_np[p])
            want = scalar.blocks_to_plane(
                scalar.dequantize_idct_blocks(co, qts_np[p]),
                *plane.shape)
            if not np.array_equal(np.asarray(rec), want):
                ok_all = False
        dt = time.perf_counter() - t0
        print(f"frame {i}: kinds={list(kinds)} q={q:3d} "
              f"{'PASS' if ok_all else 'FAIL'} ({dt:.1f}s)", flush=True)
        fails += 0 if ok_all else 1
    print("FUZZ RESULT:", "PASS" if fails == 0 else f"{fails} FAILS")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
