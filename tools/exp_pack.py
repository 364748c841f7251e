"""Measure the XLA relayout costs the packed8 entropy kernels would pay.

pack8:   [R, N]   -> [R*8, N//8]   (blocks 8-per-lane-column)
unpack8: [R*8, N//8] -> [N, R]     (kernel output back to block-major)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 284256 // 8 * 8


def sync(x):
    np.asarray(x.ravel()[:1])


def t(f, x, label):
    g = jax.jit(f)
    r = g(x)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(x)
    sync(r)
    dt = (time.perf_counter() - t0) / 10
    mb = x.size * x.dtype.itemsize / 1e6
    print(f"{label}: {dt*1e3:.2f} ms ({mb:.0f} MB src)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    def pack8(w):
        r, n = w.shape
        return w.reshape(r, n // 8, 8).transpose(0, 2, 1).reshape(
            r * 8, n // 8)

    def unpack8(w, r):
        return w.reshape(r, 8, -1).transpose(2, 1, 0).reshape(N, r)

    w16 = jnp.asarray(rng.integers(0, 1 << 30, (16, N), np.int32))
    t(pack8, w16, "pack8 [16, N] -> [128, N/8]")
    w64 = jnp.asarray(rng.integers(0, 1 << 30, (64, N), np.int32))
    t(pack8, w64, "pack8 [64, N] -> [512, N/8]")
    o = jnp.asarray(rng.integers(0, 1 << 30, (528, N // 8), np.int32))
    t(lambda x: unpack8(x[:512], 64).astype(jnp.int16), o,
      "unpack8+cast [512, N/8] -> [N, 64] i16")
    t(lambda x: x.T, w64, "plain [64, N] -> [N, 64] (today's out.T)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
