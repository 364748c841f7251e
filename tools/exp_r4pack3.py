"""Pack/unpack v5: byte-view weighted matmuls (round 4).

exp_r4pack2 showed the bf16 route's cost is NOT the MXU (0.041 ms) but
the 4-pass byte extraction (0.277 ms) + the transpose (0.096). v5 cuts
the extraction to ONE pass each direction:

  pack:   u8 view of the plane (free bitcast) -> bf16 -> ONE matmul
          with a {1, 256}-weighted byte->u16-half permutation ->
          f32 -> u16 -> bitcast u16 pairs to i32 words (free) ->
          transpose.
  unpack: transpose -> u8 view of the words (free) -> bf16 -> ONE
          {1, 256} matmul producing the plane's u16 pixel pairs ->
          u16 -> bitcast to u8 plane (free).

Exactness: bytes <= 255 and weights 1/256 are exact in bf16; each
output sums exactly two nonzero products <= 65535 — exact in the f32
accumulator; f32->u16 of an exact integer is exact. The weight matrix
is built from iota compares at trace time behind an
optimization_barrier (constant-folding a [4032, 2016] literal through
the HLO evaluator is the round-1 compile trap).

Usage: python tools/exp_r4pack3.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402

F32 = jnp.float32
I32 = jnp.int32


def _perm16_pack(w: int, L: int):
    """[w, 4wb] bf16: plane byte column a -> packed u16-half column
    (m, half) with weight 256^(a odd). Output col q = 2*m + half;
    word m = (k1*8 + r)*L + c selects plane word 16c + 2r + k1
    (see p8._perm_mxu), i.e. plane bytes 4*(16c+2r+k1) + {0..3};
    half h covers bytes 2h, 2h+1."""
    wb = w // 32  # = (w//8)//4? no: wb words per block-row unit
    # w = pixel columns; plane words per row = w // 4; packed cols = 16L
    n = 16 * L                     # packed words per row
    a = jax.lax.broadcasted_iota(I32, (w, 2 * n), 0)   # plane byte col
    q = jax.lax.broadcasted_iota(I32, (w, 2 * n), 1)   # (m, half)
    m = q >> 1
    half = q & 1
    src_word = 16 * (m % L) + 2 * ((m // L) % 8) + m // (8 * L)
    src_byte = 4 * src_word + 2 * half                 # low byte of half
    wgt = jnp.where(a == src_byte, 1, 0) \
        + jnp.where(a == src_byte + 1, 256, 0)
    return jax.lax.optimization_barrier(wgt.astype(jnp.bfloat16))


def _perm16_unpack(w: int, L: int):
    """[4*16L, w//2] bf16: packed byte column -> plane u16-pair column
    with weight 256^(byte odd)."""
    n = 16 * L
    a = jax.lax.broadcasted_iota(I32, (4 * n, w // 2), 0)  # packed byte
    q = jax.lax.broadcasted_iota(I32, (4 * n, w // 2), 1)  # plane pair
    m = a >> 2
    b = a & 3
    src_word = 16 * (m % L) + 2 * ((m // L) % 8) + m // (8 * L)
    pbyte = 4 * src_word + b                   # plane byte column
    wgt = jnp.where(pbyte == 2 * q, 1, 0) \
        + jnp.where(pbyte == 2 * q + 1, 256, 0)
    return jax.lax.optimization_barrier(wgt.astype(jnp.bfloat16))


def _pack_v5(plane):
    h, w = plane.shape
    wb = w // 8
    L = wb // 8
    xb = plane.astype(jnp.bfloat16)            # byte view IS the plane
    P = _perm16_pack(w, L)
    o16 = jnp.dot(xb, P, preferred_element_type=F32).astype(jnp.uint16)
    o = jax.lax.bitcast_convert_type(
        o16.reshape(h, 16 * L, 2), I32)        # [h, 16L]
    return o.reshape(h // 8, 8, 16, L).transpose(1, 2, 0, 3).reshape(
        128, (h // 8) * L)


def _unpack_v5(xw, ph, pw):
    wb = pw // 8
    L = wb // 8
    o = xw.reshape(8, 16, ph // 8, L).transpose(2, 0, 1, 3).reshape(
        ph, 16 * L)
    ob = jax.lax.bitcast_convert_type(o, jnp.uint8).reshape(
        ph, 64 * L).astype(jnp.bfloat16)
    P = _perm16_unpack(pw, L)
    p16 = jnp.dot(ob, P, preferred_element_type=F32).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(p16, jnp.uint8).reshape(ph, pw)


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    y, u, v = bench.get_4k_planes()
    h, w = y.shape

    yd = jax.device_put(jnp.asarray(y))
    bench._sync(yd)

    want = np.asarray(jax.jit(p8.pack_pixel_words)(yd))
    got = np.asarray(jax.jit(_pack_v5)(yd))
    print("v5 pack luma exact:", np.array_equal(want, got), flush=True)
    xwd = jax.device_put(jnp.asarray(want))
    gotp = np.asarray(jax.jit(
        functools.partial(_unpack_v5, ph=h, pw=w))(xwd))
    print("v5 unpack luma exact:", np.array_equal(gotp, y), flush=True)

    t = bench._device_time(lambda: jax.jit(_pack_v5)(yd), reps=30)
    print(f"pack_v5_luma: {t*1e3:.3f} ms", flush=True)
    f = jax.jit(functools.partial(_unpack_v5, ph=h, pw=w))
    t = bench._device_time(lambda: f(xwd), reps=30)
    print(f"unpack_v5_luma: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
