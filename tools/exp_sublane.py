"""Microbenchmark: sublane utilization of per-block register state.

Hypothesis (PERF_NOTES round-2 plan): [1, TILE] per-block state vectors
use 1/8 of each (8, 128) vreg; packing 8 blocks per lane column as
[8, TILE/8] makes the same op chain ~8x cheaper. Run on the real chip.

Both kernels run the same synthetic consume-like chain (shifts, wheres,
one-hot refill against a [CW(*8), T] word table) for STEPS sequential
steps over the same total block count.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

I32 = jnp.int32
STEPS = 64
CW = 16
NBLOCKS = 8 * 189504 // 8 * 8  # ~ one 4K luma plane, 8-aligned


def _shl(x, s):
    return jnp.where(s >= 32, 0, x << jnp.minimum(s, 31))


def _shr_l(x, s):
    ux = x & 0x7FFFFFFF
    top = (x >> 31) & 1
    r = (ux >> jnp.minimum(s, 31)) | _shl(top, 31 - s)
    return jnp.where(s >= 32, 0, jnp.where(s == 0, x, r))


def make_kernel(rows, tile, cw_rows):
    def kern(words_ref, out_ref):
        R = words_ref[...]
        iota_w = jax.lax.broadcasted_iota(I32, (cw_rows, tile), 0)

        def body(t, carry):
            W0, W1, valid, widx = carry
            s = (W0 >> 28) & 7
            W0 = _shl(W0, s) | _shr_l(W1, 32 - s)
            W1 = _shl(W1, s)
            valid = valid - s
            need = valid <= 32
            if rows == 1:
                V = jnp.sum(jnp.where(iota_w == widx, R, 0),
                            axis=0, keepdims=True)
            else:
                V = jnp.zeros((rows, tile), I32)
                for w in range(cw_rows // rows):
                    V = V | jnp.where(widx == w, R[w * rows:(w + 1) * rows],
                                      0)
            V = jnp.where(need, V, 0)
            W0 = W0 | jnp.where(need, _shr_l(V, valid), 0)
            W1 = W1 | jnp.where(need, _shl(V, 32 - valid), 0)
            valid = valid + jnp.where(need, 32, 0)
            widx = widx + need.astype(I32)
            return W0, W1, valid, widx

        z = jnp.zeros((rows, tile), I32)
        W0, W1, valid, widx = jax.lax.fori_loop(
            0, STEPS, body, (R[:rows], z, jnp.full((rows, tile), 33, I32), z))
        out_ref[...] = W0 | W1 | valid | widx

    return kern


def run(rows, tile):
    cw_rows = CW * rows
    ncols = NBLOCKS // rows
    kern = make_kernel(rows, tile, cw_rows)
    words = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, (cw_rows, ncols),
                                          dtype=np.int32))
    f = jax.jit(lambda w: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, ncols), I32),
        grid=(ncols // tile,),
        in_specs=[pl.BlockSpec((cw_rows, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i)),
    )(w))
    r = f(words)
    np.asarray(r.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(words)
    np.asarray(r.ravel()[:1])
    dt = (time.perf_counter() - t0) / 5
    print(f"rows={rows} tile={tile}: {dt*1e3:.2f} ms "
          f"({NBLOCKS/dt/1e6:.1f} Mblocks/s)", flush=True)


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    run(1, 1024)
    run(8, 128)
    run(8, 512)
    run(8, 1024)
    return 0


if __name__ == "__main__":
    sys.exit(main())
