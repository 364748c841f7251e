"""Experiment: SPLIT-STREAM interchange (v3) — region A = every block's
first 32-byte row (strided slice of the canvas, NO gather), region B =
continuation rows only (tiny gather: ~1% of q50 blocks have a 2nd row).

Decode window row 0 = A directly; row 1 = scatter of B rows into a
[N, 8] canvas (sorted unique indices, ~capB of them) — replacing the
568K-index window gather.

Measures against the production path on the golden 4K frame.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.entropy import pallas_encode as pe  # noqa: E402
from myyuv_tpu.entropy import pallas_decode8 as pd8  # noqa: E402
from myyuv_tpu.kernels import pallas_dct8 as p8  # noqa: E402

I32 = jnp.int32


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, reps=8):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


@functools.partial(jax.jit, static_argnames=("capb",))
def compact_split(words, sizes_r, capb):
    """[N, 64] canvas + [N] row counts -> (A [N, 8], B [capb, 8], ok)."""
    n = sizes_r.shape[0]
    A = words[:, :8]
    ovf = sizes_r - 1                              # continuation rows/block
    offs = jnp.cumsum(ovf) - ovf                   # B offsets per block
    totb = jnp.sum(ovf)
    # B row k: owning block id via max-scatter of block ids at B starts
    bid0 = jnp.full((capb,), -1, I32).at[offs].max(
        jnp.where(ovf > 0, jnp.arange(n, dtype=I32), -1),
        mode="drop", indices_are_sorted=True)
    block_of = jax.lax.associative_scan(jnp.maximum, bid0)
    k = jnp.arange(capb, dtype=I32)
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(bid0 >= 0, k, -1))
    r_of = jnp.clip(k - start + 1, 1, 7)
    rows = words.reshape(n * 8, 8)
    B = rows[jnp.clip(block_of, 0, n - 1) * 8 + r_of]
    return A, B, totb <= capb


@jax.jit
def expand_split(A, B, sizes_r):
    """(A [N, 8], B [capb, 8], sizes_r) -> packed-8 windows [128, N/8]
    (same layout as ds._expand_window8 with cw=16)."""
    n = sizes_r.shape[0]
    ovf = sizes_r - 1
    offs = jnp.cumsum(ovf) - ovf
    has2 = ovf > 0
    # scatter B row (offs[i]) -> W1 row i for blocks with a 2nd row
    idx = jnp.where(has2, jnp.arange(n, dtype=I32), n)   # drop sink
    src = B[jnp.clip(offs, 0, B.shape[0] - 1)]
    W1 = jnp.zeros((n, 8), I32).at[idx].set(
        src, mode="drop", indices_are_sorted=True, unique_indices=True)
    # relayout (A, W1) -> [cw*8=128, n/8]: flat row = (j*8 + w)*8 + r
    W = jnp.stack([A, W1], axis=0)                       # [2, n, 8]
    return W.reshape(2, n // 8, 8, 8).transpose(0, 3, 2, 1).reshape(
        128, n // 8)


def main():
    import bench
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    h, w = planes[0].shape
    y, u, v = [jnp.asarray(p) for p in planes]
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc
    capb = n // 4

    @jax.jit
    def front(y, u, v):
        parts = [p8.pack_pixel_words(p) for p in (y, u, v)]
        xw = jnp.concatenate(parts, axis=1)
        padc = (-(n // 8)) % p8.TILE
        if padc:
            xw = jnp.concatenate(
                [xw, jnp.zeros((128, padc), jnp.int32)], axis=1)
        qtx = p8.expand_qtables(tuple(qts))
        pids = p8.plane_pids(ny, nc, padc)
        cp = p8.dct_quantize_words(xw, qtx, pids)
        ntp = cp.shape[1]
        pairsT = cp.reshape(32, 8, ntp).transpose(0, 2, 1).reshape(
            32, ntp * 8)[:, :n]
        return pe.encode_words_pairs(pairsT)

    words, sizes, ok = front(y, u, v)
    sizes_r = jax.jit(ds._chunk_rows)(sizes.astype(I32))
    sr_np = np.asarray(sizes_r)
    print(f"continuation rows: {int((sr_np - 1).sum())} "
          f"({(sr_np > 1).mean() * 100:.1f}% of blocks multi-row)",
          flush=True)

    # --- correctness ------------------------------------------------------
    A, B, sok = compact_split(words, sizes_r, capb)
    print("split capacity ok:", bool(sok), flush=True)
    Rp_new = expand_split(A, B, sizes_r)
    c_new, ok_new = jax.jit(pd8.decode_words8_packed)(Rp_new)

    content4, s2, total, _ = jax.jit(
        lambda w, s: ds._compact_words(w, s, jnp.bool_(True)))(words, sizes)
    Rp_old = jax.jit(lambda c, s: ds._expand_window8(
        c, ds._chunk_rows(s.astype(I32)), 16))(content4, s2)
    c_old, ok_old = jax.jit(pd8.decode_words8_packed)(Rp_old)

    same = bool(jnp.array_equal(c_new, c_old)) and bool(
        jnp.array_equal(ok_new, ok_old))
    print("decoded coefficients equal:", same, flush=True)

    # --- timings ----------------------------------------------------------
    t = timeit(lambda: compact_split(words, sizes_r, capb)[0])
    print(f"compact split (slice+tiny gather): {t*1e3:7.2f} ms "
          f"(old gather: 12.19)", flush=True)
    t = timeit(lambda: expand_split(A, B, sizes_r))
    print(f"expand split (scatter+transpose):  {t*1e3:7.2f} ms "
          f"(old gather:  8.78)", flush=True)
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
