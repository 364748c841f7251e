"""Does Mosaic still contract mul+add into single-rounded FMAs? (r4 re-check)

The round-1 finding (runtime-zero defeat required for bit-exactness)
predates several toolchain updates; if the contraction is gone, the
DCT/IDCT kernels could drop ~0.7 ms of defeat adds. This builds two
tiny Pallas kernels — a bare fused chain y = a*b + c and the defeated
form y = (a*b + z) + c — and compares them element-wise on inputs
dense in half-ulp boundary cases. Differences == contraction present.

Usage: python tools/exp_fma.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

F32 = jnp.float32


def _bare(a_ref, b_ref, c_ref, o_ref):
    o_ref[...] = a_ref[...] * b_ref[...] + c_ref[...]


def _defeated(a_ref, b_ref, c_ref, o_ref):
    z = a_ref[0, 0] * F32(0)
    o_ref[...] = (a_ref[...] * b_ref[...] + z) + c_ref[...]


def main():
    rng = np.random.default_rng(3)
    n = 1 << 16
    # products whose exact value needs > 24 mantissa bits: wide-exponent
    # randoms plus integer*irrational pairs like the DCT's
    a = (rng.standard_normal(n) * np.exp2(
        rng.integers(-8, 8, n))).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    c = (rng.standard_normal(n) * 0.001).astype(np.float32)
    shape = (n // 128, 128)
    args = [jnp.asarray(x.reshape(shape)) for x in (a, b, c)]

    def call(kern):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(shape, F32))(*args)

    y_bare = np.asarray(jax.jit(lambda: call(_bare))())
    y_def = np.asarray(jax.jit(lambda: call(_defeated))())
    ndiff = int((y_bare.view(np.uint32) != y_def.view(np.uint32)).sum())
    print(f"differing elements: {ndiff} / {n}")
    print("contraction", "PRESENT (defeat still required)" if ndiff
          else "ABSENT (defeat removable?)")
    # reference double-rounded result on host
    host = (a * b) + c
    print("defeated == host double-rounded:",
          bool((y_def.reshape(-1).view(np.uint32)
                == host.view(np.uint32)).all()))


if __name__ == "__main__":
    main()
