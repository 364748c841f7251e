"""Experiment: Pallas lane-shuffle kernel for the pack/unpack relayouts.

The packed-8 pixel-word relayout ([H, W] plane -> [128, N/8] quad words)
is a pure permutation whose fine part (block-sublane extraction) XLA runs
as a 4-byte-granule transpose (~6 GB/s; pack 5.9 ms + unpackY 4.25 ms per
4K frame). Within one padded plane row of P = 2^nbits words the
permutation is an index-BIT permutation (a [P/16, 16] matrix transpose),
which a Pallas kernel can apply as ~8 bit-transposition stages of
lane rolls + selects — VPU work at HBM bandwidth instead of a strided
copy. The coarse remainder (moving g' groups across rows) stays in XLA
with a 2^G-word granule.

Usage:  JAX_PLATFORMS=cpu python tools/exp_shuffle.py        # verify
        python tools/exp_shuffle.py --tpu                    # timing
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def bitperm_swaps(perm):
    """perm[i] = source bit index feeding TARGET bit i. Returns a list of
    position swaps (p, q) whose left-to-right composition realizes the
    permutation on lane indices."""
    n = len(perm)
    cur = list(range(n))
    ops = []
    for tgt in range(n):
        want = perm[tgt]
        pos = cur.index(want)
        if pos != tgt:
            ops.append((min(pos, tgt), max(pos, tgt)))
            cur[pos], cur[tgt] = cur[tgt], cur[pos]
    return ops


def apply_perm_np(x, perm):
    """NumPy oracle: out[..., l_out] = x[..., l] with l_out's bit i equal
    to l's bit perm[i]."""
    n = x.shape[-1]
    nbits = n.bit_length() - 1
    l = np.arange(n)
    l_out = np.zeros(n, np.int64)
    for i in range(nbits):
        l_out |= ((l >> perm[i]) & 1) << i
    out = np.empty_like(x)
    out[..., l_out] = x
    return out


def make_shuffle_kernel(perm, rows, lanes):
    ops = bitperm_swaps(perm)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        lane = jax.lax.broadcasted_iota(I32, (rows, lanes), 1)
        for (p, q) in ops:
            d = (1 << q) - (1 << p)
            bp = (lane >> p) & 1
            bq = (lane >> q) & 1
            in_a = (bp == 1) & (bq == 0)   # receives from l + d
            in_b = (bp == 0) & (bq == 1)   # receives from l - d
            xd = pltpu.roll(x, d, 1)
            xu = pltpu.roll(x, lanes - d, 1)
            x = jnp.where(in_b, xd, jnp.where(in_a, xu, x))
        o_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("perm", "rows", "interpret"))
def lane_shuffle(x, perm, rows=8, interpret=False):
    """[R, P] i32 -> [R, P] with each row's lanes bit-permuted."""
    r, p = x.shape
    if r % rows:
        raise ValueError(f"row count {r} must be a multiple of rows={rows}")
    kern = make_shuffle_kernel(perm, rows, p)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, p), I32),
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((rows, p), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, p), lambda i: (i, 0)),
        interpret=interpret,
    )(x)


def pack_perm(nbits):
    """Pack: l = 16 g' + 2 s + wj  ->  l_out = (wj<<(G+3)) | (s<<G) | g'
    (G = nbits - 4). perm[i] = source bit of target bit i."""
    g = nbits - 4
    perm = [4 + i for i in range(g)] + [1, 2, 3] + [0]
    return tuple(perm)


def unpack_perm(nbits):
    p = pack_perm(nbits)
    inv = [0] * len(p)
    for i, s in enumerate(p):
        inv[s] = i
    return tuple(inv)


def pack_plane_fast(plane, interpret=False):
    """[H, W] u8 plane -> [128, N/8] i32 quad words, luma geometry
    ((W/8) % 8 == 0)."""
    h, w = plane.shape
    wd = w // 4
    p = 1 << (wd - 1).bit_length()
    g = p.bit_length() - 1 - 4          # g' bits
    v = jax.lax.bitcast_convert_type(
        plane.reshape(h, wd, 4), jnp.int32)
    if p != wd:
        v = jnp.pad(v, ((0, 0), (0, p - wd)))
    y = lane_shuffle(v, pack_perm(p.bit_length() - 1), interpret=interpret)
    ng = 1 << g
    t = y.reshape(h // 8, 8, 2, 8, ng)[:, :, :, :, :wd // 16]
    return t.transpose(1, 2, 3, 0, 4).reshape(128, -1)


def unpack_plane_fast(xw, ph, pw, interpret=False):
    """[128, n/8] i32 quad words -> [ph, pw] u8 plane (luma geometry)."""
    wd = pw // 4
    p = 1 << (wd - 1).bit_length()
    g = p.bit_length() - 1 - 4
    ng = 1 << g
    ngd = wd // 16
    t = xw.reshape(8, 2, 8, ph // 8, ngd).transpose(3, 0, 1, 2, 4)
    if ng != ngd:
        t = jnp.pad(t, ((0, 0),) * 4 + ((0, ng - ngd),))
    v = t.reshape(ph, p)
    y = lane_shuffle(v, unpack_perm(p.bit_length() - 1),
                     interpret=interpret)[:, :wd]
    return jax.lax.bitcast_convert_type(
        y.reshape(ph, wd, 1), jnp.uint8).reshape(ph, pw)


def verify_cpu():
    from myyuv_tpu.kernels import pallas_dct8 as p8
    rng = np.random.default_rng(0)
    # small luma-geometry plane: W/8 % 8 == 0
    for (h, w) in [(16, 512), (24, 1024), (16, 4032)]:
        plane = rng.integers(0, 256, (h, w), np.uint8)
        ref = np.asarray(p8.pack_pixel_words(jnp.asarray(plane)))
        got = np.asarray(pack_plane_fast(jnp.asarray(plane),
                                         interpret=True))
        assert got.shape == ref.shape, (got.shape, ref.shape)
        assert (got == ref).all(), f"pack mismatch {h}x{w}"
        back = np.asarray(unpack_plane_fast(jnp.asarray(got), h, w,
                                            interpret=True))
        assert (back == plane).all(), f"unpack mismatch {h}x{w}"
        print(f"verify {h}x{w}: OK")


def bench_tpu():
    from myyuv_tpu.kernels import pallas_dct8 as p8
    rng = np.random.default_rng(0)
    h, w = 3008, 4032
    plane = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))

    fast = jax.jit(pack_plane_fast)
    ref = jax.jit(p8.pack_pixel_words)
    ufast = jax.jit(lambda x: unpack_plane_fast(x, h, w))
    uref = jax.jit(lambda x: p8.unpack_pixel_words(x, h, w))

    def timeit(f, reps=20):
        f()  # warm
        np.asarray(f()[:1, :1])
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        np.asarray(r[:1, :1])
        return (time.perf_counter() - t0) / reps * 1e3

    a = ref(plane)
    b = fast(plane)
    ok = bool(jnp.all(a == b))
    print(f"pack exact: {ok}")
    okp = bool(jnp.all(uref(a) == ufast(a)))
    print(f"unpack exact: {okp}")
    print(f"pack XLA:    {timeit(lambda: ref(plane)):6.2f} ms")
    print(f"pack pallas: {timeit(lambda: fast(plane)):6.2f} ms")
    print(f"unpack XLA:  {timeit(lambda: uref(a)):6.2f} ms")
    print(f"unpack plls: {timeit(lambda: ufast(a)):6.2f} ms")


if __name__ == "__main__":
    if "--tpu" in sys.argv:
        bench_tpu()
    else:
        jax.config.update("jax_platforms", "cpu")
        verify_cpu()
