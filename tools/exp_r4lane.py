"""Round-4 capability probe: cross-lane decimation inside Mosaic.

VERDICT #1 wants the pack/unpack relayouts fused into the Pallas
kernels; every fusion design needs SOME lane-stride primitive in the
kernel (plane layout holds a block's words at lane stride 2/16, the
kernel wants blocks at lane stride 1). Round-2 established reshape
bridges are rejected; this probes the remaining candidates:

  s1  strided lane READ   out[8,128]  = x_ref[:, 0::2] of [8,256]
  s2  strided lane WRITE  out[:, 0::2] = a; out[:, 1::2] = b
  s3  in-kernel reshape   [8,256] -> [8,128,2] -> sum(-1)
  s4  pltpu.roll lane roll + mask (known-good baseline op)

Each either compiles (then timed on a 4K-sized tensor) or the Mosaic
error is printed — the measured negative result the verdict asks for.

Usage: python tools/exp_r4lane.py
"""

import functools
import sys
import time
import traceback
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

R, C = 512, 8192        # ~16 MB i32: enough to see bandwidth
TILE = 512


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, reps=30):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    x = jnp.zeros((8, 128), jnp.int32) + 1
    sync(x)
    t1 = time.perf_counter()
    sync(x)
    sync_s = time.perf_counter() - t1
    return ((t1 - t0) - sync_s) / reps * 1e3


def probe(name, build):
    try:
        fn = build()
        x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
        out = fn(x)
        np.asarray(out.ravel()[:1])
        ms = timeit(lambda: fn(x))
        print(f"{name}: OK  {ms:7.3f} ms  ({(R*C*4*1.5)/ms/1e6:.0f} MB/s eff)",
              flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"{name}: FAIL  {type(e).__name__}: {msg}", flush=True)


def k_sliceread(x_ref, o_ref):
    o_ref[...] = x_ref[:, 0::2] + x_ref[:, 1::2]


def k_slicewrite(x_ref, o_ref):
    h = x_ref.shape[1] // 2
    o_ref[:, 0::2] = x_ref[:, :h]
    o_ref[:, 1::2] = x_ref[:, h:]


def k_reshape(x_ref, o_ref):
    r, c = x_ref.shape
    t = x_ref[...].reshape(r, c // 2, 2)
    o_ref[...] = t[:, :, 0] + t[:, :, 1]


def k_roll(x_ref, o_ref):
    t = x_ref[...]
    o_ref[...] = t + pltpu.roll(t, -1, 1)


def build(kernel, out_cols):
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, out_cols), jnp.int32),
            grid=(R // 8,),
            in_specs=[pl.BlockSpec((8, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, out_cols), lambda i: (i, 0)),
        )(x)
    return jax.jit(fn)


def main():
    print("devices:", jax.devices(), flush=True)
    probe("s4 lane roll      ", lambda: build(k_roll, C))
    probe("s1 strided read   ", lambda: build(k_sliceread, C // 2))
    probe("s3 in-kernel rshp ", lambda: build(k_reshape, C // 2))
    probe("s2 strided write  ", lambda: build(k_slicewrite, C))


if __name__ == "__main__":
    main()
