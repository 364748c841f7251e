"""Round-4 experiment: conversion kernels to speed-of-light (VERDICT #4).

bgrx->iyuv runs 6.77 ms and iyuv->bgrx 9.80 ms per 4K frame — ~100x
their ~80 us HBM byte bound. The dominant costs are the 2x2 chroma
quad-sum (reduce_window, ~3 ms/channel) and the chroma upsample
(jnp.repeat on the lane axis). Variants measured here:

quad-sum ([3008,4032] i32 -> [1504,2016]):
  C0  two reduce_windows (current)
  C1  qcb | qcr<<16 packed, ONE reduce_window, unpack
  C2  vertical reshape-sum + horizontal pair-sum einsum (bf16, /chan)
  C3  same but packed u|v<<16 in f32 (exact below 2^24; verified)
  C4  horizontal einsum first, vertical reshape-sum after

upsample ([1504,2016] u8 -> [3008,4032] f32):
  U0  jnp.repeat x2 (current)
  U1  vertical broadcast-reshape + horizontal expansion einsum (bf16)
  U2  vertical broadcast-reshape + horizontal jnp.repeat
  U3  vertical jnp.repeat + horizontal expansion einsum

Matmul blocks use 64/32-wide tiles (4032 = 63*64; 2016 = 63*32), so no
padding is needed. All variants are verified EXACT against the current
kernels before timing.

Usage: python tools/exp_r4conv.py
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
from jax import lax  # noqa: E402

F32 = jnp.float32
BF16 = jnp.bfloat16
HI = jax.lax.Precision.HIGHEST
H, W = 3008, 4032
H2, W2 = H // 2, W // 2


def log(*a):
    print(*a, flush=True)


def sync(x):
    np.asarray(x.ravel()[:1])


_SYNC_MS = [0.0]


def timeit(fn, reps=40):
    """ms/op with the d2h sync latency (~25 ms floor on this tunnel)
    subtracted — at small reps the sync otherwise dominates the mean
    (the round-3 conversion numbers carried ~5 ms of it)."""
    out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    return ((time.perf_counter() - t0) * 1e3 - _SYNC_MS[0]) / reps


def calibrate_sync():
    x = jnp.zeros((8, 128), jnp.int32)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(x)
    _SYNC_MS[0] = (time.perf_counter() - t0) * 1e3 / 5
    print(f"sync latency: {_SYNC_MS[0]:.1f} ms", flush=True)


# --- building blocks --------------------------------------------------------

def _pairsum_mat(k: int) -> np.ndarray:
    p = np.zeros((k, k // 2), np.float32)
    p[np.arange(k), np.arange(k) // 2] = 1.0
    return p


def _expand_mat(k: int) -> np.ndarray:
    e = np.zeros((k, 2 * k), np.float32)
    e[np.arange(2 * k) // 2, np.arange(2 * k)] = 1.0
    return e


def hpair_einsum(x, dtype):
    """[R, C] -> [R, C/2] horizontal pair sums via a banded matmul."""
    r, c = x.shape
    p = jnp.asarray(_pairsum_mat(64), dtype)
    t = x.astype(dtype).reshape(r, c // 64, 64)
    out = jnp.einsum("abk,kj->abj", t, p, precision=HI,
                     preferred_element_type=F32)
    return out.reshape(r, c // 2)


def hexpand_einsum(x, dtype):
    """[R, C] -> [R, 2C] horizontal x2 duplication via a banded matmul."""
    r, c = x.shape
    e = jnp.asarray(_expand_mat(32), dtype)
    t = x.astype(dtype).reshape(r, c // 32, 32)
    out = jnp.einsum("abk,kj->abj", t, e, precision=HI,
                     preferred_element_type=F32)
    return out.reshape(r, 2 * c)


def vpair_sum(x):
    """[R, C] -> [R/2, C] vertical pair sums via reshape + middle-axis add."""
    r, c = x.shape
    t = x.reshape(r // 2, 2, c)
    return t[:, 0, :] + t[:, 1, :]


def vexpand(x):
    """[R, C] -> [2R, C] vertical x2 via broadcast + reshape."""
    r, c = x.shape
    return jnp.broadcast_to(x[:, None, :], (r, 2, c)).reshape(2 * r, c)


# --- quad-sum variants -------------------------------------------------------

def rw(q):
    s = lax.reduce_window(q, 0, lax.add, (2, 2), (2, 2), "VALID")
    return s


@jax.jit
def c0(qcb, qcr):
    return (rw(qcb) & 255).astype(jnp.uint8), (rw(qcr) & 255).astype(jnp.uint8)


@jax.jit
def c1(qcb, qcr):
    t = qcb | (qcr << 16)
    s = rw(t)
    return (s & 255).astype(jnp.uint8), ((s >> 16) & 255).astype(jnp.uint8)


@jax.jit
def c2(qcb, qcr):
    def one(q):
        s = hpair_einsum(vpair_sum(q).astype(BF16), BF16)
        return (s.astype(jnp.int32) & 255).astype(jnp.uint8)
    return one(qcb), one(qcr)


@jax.jit
def c3(qcb, qcr):
    t = (qcb | (qcr << 16)).astype(F32)
    s = hpair_einsum(vpair_sum(t), F32).astype(jnp.int32)
    return (s & 255).astype(jnp.uint8), ((s >> 16) & 255).astype(jnp.uint8)


@jax.jit
def c4(qcb, qcr):
    def one(q):
        s = vpair_sum(hpair_einsum(q.astype(BF16), BF16).astype(jnp.int32))
        return (s & 255).astype(jnp.uint8)
    return one(qcb), one(qcr)


# --- upsample variants -------------------------------------------------------

@jax.jit
def u0(u):
    return jnp.repeat(jnp.repeat(u, 2, -2), 2, -1).astype(F32)


@jax.jit
def u1(u):
    return vexpand(hexpand_einsum(u.astype(BF16), BF16))


@jax.jit
def u2(u):
    return jnp.repeat(vexpand(u.astype(F32)), 2, -1)


@jax.jit
def u3(u):
    return hexpand_einsum(jnp.repeat(u, 2, -2).astype(BF16), BF16)


def main():
    rng = np.random.default_rng(0)
    qcb = jnp.asarray(rng.integers(0, 65, (H, W), np.int32))
    qcr = jnp.asarray(rng.integers(0, 65, (H, W), np.int32))
    uu8 = jnp.asarray(rng.integers(0, 256, (H2, W2), np.uint8))
    calibrate_sync()

    # component floors
    @jax.jit
    def comp_add(a, b):
        return a + b

    @jax.jit
    def comp_u8cast(a):
        return (a & 255).astype(jnp.uint8)

    @jax.jit
    def comp_vsum(a):
        return vpair_sum(a)

    print(f"i32 add [H,W]       : {timeit(lambda: comp_add(qcb, qcr)):7.3f} ms",
          flush=True)
    print(f"u8 cast [H,W]       : {timeit(lambda: comp_u8cast(qcb)):7.3f} ms",
          flush=True)
    print(f"v-pair-sum [H,W]    : {timeit(lambda: comp_vsum(qcb)):7.3f} ms",
          flush=True)

    # full current kernels for reference, same harness
    from myyuv_tpu.kernels import device as kdev
    px = rng.integers(0, 256, (H, W, 4), np.uint8)
    px[..., 3] = 0
    pdev = jnp.asarray(px)
    planes = (jnp.asarray(rng.integers(0, 256, (H, W), np.uint8)),
              jnp.asarray(np.asarray(uu8)),
              jnp.asarray(rng.integers(0, 256, (H2, W2), np.uint8)))
    jf = jax.jit(kdev.bgrx_to_iyuv)
    ji = jax.jit(kdev.iyuv_to_bgrx)
    print(f"bgrx_to_iyuv current: {timeit(lambda: jf(pdev)[0]):7.3f} ms",
          flush=True)
    print(f"iyuv_to_bgrx current: {timeit(lambda: ji(*planes)):7.3f} ms",
          flush=True)

    want = [np.asarray(x) for x in c0(qcb, qcr)]
    for name, fn in (("c0 reduce_window x2 ", c0),
                     ("c1 packed rw        ", c1),
                     ("c2 v-sum + h-einsum ", c2),
                     ("c3 packed v + h-ein ", c3),
                     ("c4 h-einsum + v-sum ", c4)):
        got = fn(qcb, qcr)
        exact = all(np.array_equal(np.asarray(g), w)
                    for g, w in zip(got, want))
        ms = timeit(lambda fn=fn: fn(qcb, qcr))
        log(f"{name}: {ms:7.2f} ms  exact={exact}")

    wantu = np.asarray(u0(uu8))
    for name, fn in (("u0 repeat x2        ", u0),
                     ("u1 v-bcast + h-ein  ", u1),
                     ("u2 v-bcast + h-rep  ", u2),
                     ("u3 v-rep + h-einsum ", u3)):
        got = np.asarray(fn(uu8))
        exact = np.array_equal(got, wantu)
        ms = timeit(lambda fn=fn: fn(uu8))
        log(f"{name}: {ms:7.2f} ms  exact={exact}")


if __name__ == "__main__":
    main()
