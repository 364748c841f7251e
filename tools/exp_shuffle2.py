"""Sub-stage timing for the lane-shuffle pack experiment."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.exp_shuffle import lane_shuffle, pack_perm

I32 = jnp.int32


def timeit(f, reps=20):
    f()
    r = f()
    np.asarray(r.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    np.asarray(r.ravel()[:1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    h, w = 3008, 4032
    wd = w // 4
    p_lanes = 1 << (wd - 1).bit_length()  # pad width: next pow2 >= wd
    plane = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))

    bc = jax.jit(lambda p: jax.lax.bitcast_convert_type(
        p.reshape(h, wd, 4), jnp.int32))
    v = bc(plane)
    pad = jax.jit(lambda v: jnp.pad(v, ((0, 0), (0, p_lanes - wd))))
    vp = pad(v)
    shuf = jax.jit(lambda x: lane_shuffle(x, pack_perm(p_lanes.bit_length() - 1)))
    y = shuf(vp)
    outer = jax.jit(lambda y: y.reshape(h // 8, 8, 2, 8, p_lanes // 16)
                    [:, :, :, :, :wd // 16]
                    .transpose(1, 2, 3, 0, 4).reshape(128, -1))
    # variant: slice after transpose
    outer2 = jax.jit(lambda y: y.reshape(h // 8, 8, 2, 8, p_lanes // 16)
                     .transpose(1, 2, 3, 0, 4)[:, :, :, :, :wd // 16]
                     .reshape(8, 2, 8, -1)
                     .reshape(128, (h // 8) * (wd // 16)))

    print(f"bitcast: {timeit(lambda: bc(plane)):6.2f} ms")
    print(f"pad:     {timeit(lambda: pad(v)):6.2f} ms")
    print(f"shuffle: {timeit(lambda: shuf(vp)):6.2f} ms")
    print(f"outer:   {timeit(lambda: outer(y)):6.2f} ms")
    try:
        o2 = outer2(y)
        print(f"outer2:  {timeit(lambda: outer2(y)):6.2f} ms")
    except Exception as e:
        print("outer2 failed:", e)
    # fused pad+shuffle+outer, minus initial bitcast
    full = jax.jit(lambda v: outer(shuf(pad(v))))
    print(f"full-(bitcast): {timeit(lambda: full(v)):6.2f} ms")


if __name__ == "__main__":
    main()
