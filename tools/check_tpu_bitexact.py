"""TPU bit-exactness validation: device kernels vs the scalar oracle.

Run on the real chip (ambient JAX_PLATFORMS): exercises the FMA-defeat
(runtime zero) and the division-free boundary-exact quantization across
qualities, plane shapes, and the real golden image.
"""
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from myyuv_tpu import YUVImage
from myyuv_tpu.kernels import device, scalar

def main():
    print("devices:", jax.devices())
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    rng = np.random.default_rng(7)
    fails = 0

    # jitted entries: the block-level kernels are eager library functions,
    # and eager op-by-op dispatch through the tunnel costs ~2.5 ms/op
    j_fwd = jax.jit(device.dct_quantize)
    j_inv = jax.jit(device.dequantize_idct)
    j_to_iyuv = jax.jit(device.bgrx_to_iyuv)
    j_to_bgrx = jax.jit(device.iyuv_to_bgrx)

    # random blocks across qualities/planes
    blocks = rng.integers(0, 256, size=(4096, 8, 8), dtype=np.uint8)
    coeffs = rng.integers(-1024, 1024, size=(4096, 8, 8), dtype=np.int16)
    for q in (1, 10, 37, 50, 60, 77, 90, 95, 100):
        for p in (0, 1):
            qt = scalar.plane_qtable(p, q)
            want = scalar.dct_quantize_blocks(blocks, qt)
            got = np.asarray(j_fwd(jnp.asarray(blocks), jnp.asarray(qt)))
            ok1 = (got == want).all()
            w2 = scalar.dequantize_idct_blocks(coeffs, qt)
            g2 = np.asarray(j_inv(jnp.asarray(coeffs), jnp.asarray(qt)))
            ok2 = (g2 == w2).all()
            if not (ok1 and ok2):
                fails += 1
                print(f"FAIL q={q} p={p} fwd={ok1} inv={ok2}",
                      np.abs(got.astype(int)-want.astype(int)).max() if not ok1 else "")
    print("random-block sweep:", "PASS" if fails == 0 else f"{fails} FAILS")

    # real image, whole-plane path, mixed qualities
    img = YUVImage.load("/root/reference/images/chef-with-trumpet.myyuv")
    planes = img.planes()
    for i, q in enumerate([50, 60, 70]):
        qt = scalar.plane_qtable(i, q)
        want = scalar.dct_quantize_blocks(scalar.plane_to_blocks(planes[i]), qt)
        got = np.asarray(device.dct_quantize_plane(jnp.asarray(planes[i]), jnp.asarray(qt)))
        ok = (got == want).all()
        print(f"golden plane {i} q={q} fwd:", "PASS" if ok else "FAIL")
        fails += 0 if ok else 1
        h, w = planes[i].shape
        rec_w = scalar.blocks_to_plane(scalar.dequantize_idct_blocks(want, qt), h, w)
        rec_g = np.asarray(device.dequantize_idct_plane(
            jnp.asarray(want.reshape(-1, 8, 8)), jnp.asarray(qt), h, w))
        ok = (rec_g == rec_w).all()
        print(f"golden plane {i} q={q} inv:", "PASS" if ok else "FAIL")
        fails += 0 if ok else 1

    # RGB conversions
    px = rng.integers(0, 256, size=(736, 992, 4), dtype=np.uint8)
    wy, wu, wv = scalar.bgrx_to_iyuv(px)
    gy, gu, gv = [np.asarray(a) for a in j_to_iyuv(jnp.asarray(px))]
    ok = (gy == wy).all() and (gu == wu).all() and (gv == wv).all()
    print("bgrx_to_iyuv:", "PASS" if ok else "FAIL")
    fails += 0 if ok else 1
    y, u, v = planes[:3]
    wr = scalar.iyuv_to_bgrx(y, u, v)
    gr = np.asarray(j_to_bgrx(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    ok = (gr == wr).all()
    print("iyuv_to_bgrx:", "PASS" if ok else "FAIL")
    fails += 0 if ok else 1

    # FMA-contraction sentinel: the production pallas_dct8 kernels carry
    # NO runtime-zero defeat (round-4 toolchain does not contract
    # mul+add — tools/exp_fma.py); if Mosaic ever contracts again, the
    # bare 8-term chain diverges from the host double-rounded sequence
    # and the defeat must be restored in pallas_dct8._dctq_pairs /
    # _idct_words.
    from jax.experimental import pallas as pl
    from myyuv_tpu.kernels.constants import DCT_MATRIX8
    Crow = np.asarray(DCT_MATRIX8, np.float32)[1]

    def chain(x_ref, o_ref):
        xs = [x_ref[8 * k:8 * k + 8, :] for k in range(8)]
        acc = jnp.float32(float(Crow[0])) * xs[0]
        for k in range(1, 8):
            acc = acc + (jnp.float32(float(Crow[k])) * xs[k])
        o_ref[...] = acc

    xs = rng.standard_normal((64, 1024)).astype(np.float32) * 128
    got = np.asarray(jax.jit(lambda: pl.pallas_call(
        chain, out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32))(
            jnp.asarray(xs)))())
    acc = Crow[0] * xs[0:8]
    for k in range(1, 8):
        acc = acc + Crow[k] * xs[8 * k:8 * k + 8]
    ok = (got.view(np.uint32) == acc.view(np.uint32)).all()
    print("fma-contraction sentinel (bare chain == double-rounded):",
          "PASS" if ok else "FAIL — restore the runtime-zero defeat!")
    fails += 0 if ok else 1

    # PRODUCTION-kernel contraction probe (round 5, ADVICE r4):
    # contraction decisions can be context-dependent (register
    # pressure, scheduling), so ALSO probe the real word kernel with
    # content whose double-rounded vs fma-contracted QUANTIZED
    # coefficients provably differ (float64 emulation of per-step
    # fma); if Mosaic ever contracts inside the production body, this
    # mismatches the scalar oracle loudly.
    from myyuv_tpu.kernels import pallas_dct8 as p8
    from myyuv_tpu.entropy.reference import ZIGZAG

    qt50 = np.asarray(scalar.plane_qtable(0, 50), np.float32)
    C = np.asarray(DCT_MATRIX8, np.float32)

    def fma_quantize(blocks):
        x = blocks.astype(np.float32) - np.float32(128)

        def fma_mm(a_const, b):
            # acc = fma(a0, b0, 0); acc = fma(ak, bk, acc): one
            # rounding per step (f64 product+add is exact enough for a
            # probe)
            acc = np.float32(np.float64(a_const[:, 0:1])
                             * np.float64(b[:, 0:1, :]))
            for k in range(1, 8):
                acc = np.float32(
                    np.float64(a_const[:, k:k + 1])
                    * np.float64(b[:, k:k + 1, :])
                    + np.float64(acc))
            return acc

        t = fma_mm(C, x)
        coef = np.transpose(fma_mm(C, np.transpose(t, (0, 2, 1))),
                            (0, 2, 1))
        qv = np.float32(coef / qt50[None])
        r = np.trunc(qv)
        f = qv - r
        bump = np.where(np.abs(f) >= np.float32(0.5), np.sign(qv), 0)
        return (r + bump).astype(np.int16)

    rng3 = np.random.default_rng(11)
    probe = None
    for _ in range(8):
        cand = rng3.integers(0, 256, (8192, 8, 8), np.uint8)
        w_oracle = scalar.dct_quantize_blocks(cand, qt50)
        w_fma = fma_quantize(cand)
        diff = (w_oracle != w_fma).any(axis=(1, 2))
        if diff.any():
            probe = cand[diff][:1024]
            break
    if probe is None:
        print("production-kernel contraction probe: SKIP "
              "(no divergent content found)")
    else:
        n = 1024
        reps = -(-n // probe.shape[0])
        blocks_p = np.tile(probe, (reps, 1, 1))[:n]
        plane = scalar.blocks_to_plane(blocks_p, 64, 1024)
        xw = p8.pack_pixel_words(jnp.asarray(plane))
        qtx = p8.expand_qtables([jnp.asarray(qt50)] * 3)
        pids = jnp.zeros((1, n // 8), jnp.int32)
        out = np.asarray(p8.dct_quantize_words(xw, qtx, pids,
                                               tile=n // 8))
        lo = ((out << 16) >> 16).astype(np.int16)
        hi = (out >> 16).astype(np.int16)
        got = np.zeros((n, 64), np.int16)
        for p_ in range(32):
            got[:, 2 * p_] = lo[8 * p_:8 * p_ + 8].T.reshape(n)
            got[:, 2 * p_ + 1] = hi[8 * p_:8 * p_ + 8].T.reshape(n)
        zz = np.asarray(ZIGZAG)
        want_p = scalar.dct_quantize_blocks(blocks_p, qt50)
        want_msg = want_p.reshape(n, 64)[:, zz]
        okp = np.array_equal(got, want_msg)
        print(f"production-kernel contraction probe "
              f"({probe.shape[0]} divergent blocks):",
              "PASS" if okp else "FAIL — restore the runtime-zero "
              "defeat in pallas_dct8!")
        fails += 0 if okp else 1

    print("TPU BIT-EXACT:", "ALL PASS" if fails == 0 else f"{fails} FAILURES")
    return 0 if fails == 0 else 1

if __name__ == "__main__":
    sys.exit(main())
