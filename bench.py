"""Benchmark: 4K-frame DCT q=50 compress+decompress roundtrips/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The headline value is the end-to-end roundtrip rate (device DCT/quant
transform + host entropy encode/decode + device dequant/IDCT) on one chip
for 4032x3008 IYUV frames at quality 50 — the pipeline of the reference CLI
``-compress DCT 50`` + ``-decompress`` (myyuv_cli/main.cpp:151-207) minus
file I/O. ``vs_baseline`` is the speedup over the compiled single-threaded
reference CLI doing the same roundtrip on this machine's CPU (measured once
and cached in .oracle/baseline_bench.json).

Sub-metrics report the device-transform-only rate (the TPU kernel ceiling)
and the host entropy rate (the current bottleneck).
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
REF_IMAGES = Path("/root/reference/images")
ORACLE = REPO / ".oracle" / "myyuv_cli"
BASELINE_CACHE = REPO / ".oracle" / "baseline_bench.json"

W4K, H4K = 4032, 3008
QUALITY = 50
BATCH = int(os.environ.get("MYYUV_BENCH_BATCH", "2"))
REPS = int(os.environ.get("MYYUV_BENCH_REPS", "5"))


def log(*a):
    print(*a, file=sys.stderr)


def get_4k_frame():
    """A real 4K IYUV frame (decoded golden) or a synthetic fallback."""
    from myyuv_tpu import YUVImage
    big = REF_IMAGES / "chef-with-trumpet-big-DCT-50.myyuv"
    if big.exists():
        img = YUVImage.load(big).decompress()
        return img.planes()[:3]
    rng = np.random.default_rng(0)
    small = REF_IMAGES / "chef-with-trumpet.myyuv"
    if small.exists():
        y, u, v = YUVImage.load(small).planes()[:3]
        reps = (H4K // y.shape[0] + 1, W4K // y.shape[1] + 1)
        y = np.tile(y, reps)[:H4K, :W4K]
        u = np.tile(u, reps)[:H4K // 2, :W4K // 2]
        v = np.tile(v, reps)[:H4K // 2, :W4K // 2]
        return y, u, v
    return (rng.integers(0, 256, (H4K, W4K), np.uint8),
            rng.integers(0, 256, (H4K // 2, W4K // 2), np.uint8),
            rng.integers(0, 256, (H4K // 2, W4K // 2), np.uint8))


def measure_reference_baseline() -> float:
    """Seconds per 4K compress+decompress roundtrip for the reference CLI."""
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["roundtrip_s"]
    if not ORACLE.exists():
        subprocess.run([str(REPO / "tools" / "build_oracle.sh")], check=True,
                       capture_output=True)
    import tempfile
    from myyuv_tpu import YUVImage
    y, u, v = get_4k_frame()
    from myyuv_tpu.formats.yuv import FourccFormats
    img = YUVImage.from_planes(FourccFormats.IYUV, [y, u, v],
                               y.shape[1], y.shape[0])
    with tempfile.TemporaryDirectory() as td:
        raw = Path(td) / "big.myyuv"
        comp = Path(td) / "big_c.myyuv"
        dec = Path(td) / "big_d.myyuv"
        img.dump(raw)
        t0 = time.perf_counter()
        subprocess.run([str(ORACLE), str(raw), "-compress", "DCT",
                        str(QUALITY), "-o", str(comp)], check=True,
                       capture_output=True)
        t1 = time.perf_counter()
        subprocess.run([str(ORACLE), str(comp), "-decompress", "-o",
                        str(dec)], check=True, capture_output=True)
        t2 = time.perf_counter()
    out = {"compress_s": t1 - t0, "decompress_s": t2 - t1,
           "roundtrip_s": t2 - t0}
    BASELINE_CACHE.parent.mkdir(exist_ok=True)
    BASELINE_CACHE.write_text(json.dumps(out))
    return out["roundtrip_s"]


def main() -> int:
    from myyuv_tpu.runtime import jaxcache
    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    from myyuv_tpu import entropy
    from myyuv_tpu.engine import batch as eb

    log("devices:", jax.devices())
    y, u, v = get_4k_frame()
    h, w = y.shape
    yb = jnp.asarray(np.broadcast_to(y, (BATCH, *y.shape)))
    ub = jnp.asarray(np.broadcast_to(u, (BATCH, *u.shape)))
    vb = jnp.asarray(np.broadcast_to(v, (BATCH, *v.shape)))
    qt_y, qt_u, qt_v = eb.plane_qtables([QUALITY] * 3)

    enc = jax.jit(eb.encode_planes)
    dec = jax.jit(lambda cy, cu, cv, a, b, c: eb.decode_planes(
        cy, cu, cv, a, b, c, h, w))

    # --- device transform roundtrip (on-chip ceiling) ---
    cy, cu, cv = enc(yb, ub, vb, qt_y, qt_u, qt_v)
    ry, ru, rv = dec(cy, cu, cv, qt_y, qt_u, qt_v)
    jax.block_until_ready(ry)
    t0 = time.perf_counter()
    for _ in range(REPS):
        cy, cu, cv = enc(yb, ub, vb, qt_y, qt_u, qt_v)
        ry, ru, rv = dec(cy, cu, cv, qt_y, qt_u, qt_v)
    jax.block_until_ready(ry)
    dt = (time.perf_counter() - t0) / (REPS * BATCH)
    transform_fps = 1.0 / dt
    log(f"device transform roundtrip: {transform_fps:.2f} frames/s")

    # --- host entropy stage ---
    cy0 = np.asarray(cy[0]).reshape(-1, 64)
    cu0 = np.asarray(cu[0]).reshape(-1, 64)
    cv0 = np.asarray(cv[0]).reshape(-1, 64)
    t0 = time.perf_counter()
    streams = [entropy.encode_blocks(c) for c in (cy0, cu0, cv0)]
    t1 = time.perf_counter()
    for (s, c) in streams:
        entropy.decode_blocks(s, c)
    t2 = time.perf_counter()
    entropy_enc_fps = 1.0 / (t1 - t0)
    entropy_dec_fps = 1.0 / (t2 - t1)
    entropy_fps = 1.0 / (t2 - t0)
    log(f"host entropy: enc {entropy_enc_fps:.2f}/s dec "
        f"{entropy_dec_fps:.2f}/s roundtrip {entropy_fps:.2f}/s")

    # --- end-to-end roundtrip (device + host overlapped via async dispatch)
    def roundtrip_once():
        cy, cu, cv = enc(yb, ub, vb, qt_y, qt_u, qt_v)
        per_frame = []
        for b in range(BATCH):
            planes = [np.asarray(cy[b]).reshape(-1, 64),
                      np.asarray(cu[b]).reshape(-1, 64),
                      np.asarray(cv[b]).reshape(-1, 64)]
            per_frame.append([entropy.encode_blocks(c) for c in planes])
        dcy = jnp.stack([jnp.asarray(
            entropy.decode_blocks(*f[0]).reshape(-1, 8, 8))
            for f in per_frame])
        dcu = jnp.stack([jnp.asarray(
            entropy.decode_blocks(*f[1]).reshape(-1, 8, 8))
            for f in per_frame])
        dcv = jnp.stack([jnp.asarray(
            entropy.decode_blocks(*f[2]).reshape(-1, 8, 8))
            for f in per_frame])
        ry, ru, rv = dec(dcy, dcu, dcv, qt_y, qt_u, qt_v)
        jax.block_until_ready(ry)
        return ry

    ry = roundtrip_once()  # warm
    t0 = time.perf_counter()
    for _ in range(max(1, REPS // 2)):
        ry = roundtrip_once()
    dt = (time.perf_counter() - t0) / (max(1, REPS // 2) * BATCH)
    e2e_fps = 1.0 / dt
    log(f"end-to-end roundtrip: {e2e_fps:.2f} frames/s")

    # correctness spot check: reconstruction matches scalar oracle psnr-wise
    mse = float(np.mean((np.asarray(ry[0]).astype(np.float64) -
                         y.astype(np.float64)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    log(f"recon PSNR-Y vs source: {psnr:.2f} dB")

    try:
        baseline_s = measure_reference_baseline()
    except Exception as e:  # oracle unavailable: report measured-only
        log("baseline measurement failed:", e)
        baseline_s = None

    result = {
        "metric": "4k_dct50_roundtrips_per_sec_per_chip",
        "value": round(e2e_fps, 3),
        "unit": "frames/s",
        "vs_baseline": (round(e2e_fps * baseline_s, 2)
                        if baseline_s else None),
        "transform_only_fps": round(transform_fps, 2),
        "entropy_enc_fps": round(entropy_enc_fps, 2),
        "entropy_dec_fps": round(entropy_dec_fps, 2),
        "reference_cli_roundtrip_s": (round(baseline_s, 3)
                                      if baseline_s else None),
        "psnr_y_db": round(psnr, 2),
        "batch": BATCH,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
