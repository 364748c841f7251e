"""Experiment: gather-free ragged interchange via GROUP-ALIGNED layout.

Replaces the two row gathers that dominate the packed 4K roundtrip
(compaction 12.2 ms + window expansion 8.8 ms, tools/exp_stage4k3.py)
with pure elementwise/shift XLA:

  compact: per 8-block GROUP, a 6-step log-shift compaction network
           moves each block's ceil(size/32B) rows up to its in-group
           offset (monotone-gap shifts never collide: delta grows at
           most 1 per kept row).  Interchange = [NG, GROWS, 8] words.
  expand:  per-block window rows come from in-group offsets in
           [0, GROWS) -- a GROWS-term one-hot select-accumulate, no
           index-bound gather at all.

Verifies exact equality of decoded coefficients vs the production path
on the golden 4K frame, then times both.
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
GROWS = 12


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


def _shift_up(a, b):
    """Shift rows of [ng, 64(, w)] up by b along axis 1, zeros in."""
    pad = jnp.zeros(a.shape[:1] + (b,) + a.shape[2:], a.dtype)
    return jnp.concatenate([a[:, b:], pad], axis=1)


@functools.partial(jax.jit, static_argnames=("grows",))
def compact_grouped(words, sizes_r, grows=GROWS):
    """[N, 64] i32 block-major words + [N] row counts ->
    ([NG, grows, 8] i32 grouped interchange, ok)."""
    n = sizes_r.shape[0]
    ng = n // 8
    sr = sizes_r.reshape(ng, 8).astype(I32)
    off = jnp.cumsum(sr, axis=1) - sr                    # [ng, 8]
    x = words.reshape(ng, 64, 8)
    rr = np.tile(np.arange(8, dtype=np.int32), 8)        # r within block
    sr_rep = jnp.repeat(sr, 8, axis=1)                   # [ng, 64]
    off_rep = jnp.repeat(off, 8, axis=1)
    keep = jnp.asarray(rr)[None] < sr_rep
    dest = off_rep + jnp.asarray(rr)[None]
    delta = jnp.where(keep, jnp.arange(64, dtype=I32)[None] - dest, 0)
    for b in (1, 2, 4, 8, 16, 32):
        d_in = _shift_up(delta, b)
        move_in = (d_in & b) > 0
        x = jnp.where(move_in[:, :, None], _shift_up(x, b), x)
        delta = jnp.where(move_in, d_in - b,
                          jnp.where((delta & b) > 0, 0, delta))
    grp_rows = jnp.sum(sr, axis=1)
    return x[:, :grows, :], jnp.all(grp_rows <= grows)


@functools.partial(jax.jit, static_argnames=("grows", "cwr"))
def expand_grouped(xg, sizes_r, grows=GROWS, cwr=2):
    """[NG, grows, 8] grouped interchange -> packed-8 decode windows
    [cwr*64, NG] (same layout as ds._expand_window8's output)."""
    n = sizes_r.shape[0]
    ng = n // 8
    sr = sizes_r.reshape(ng, 8).astype(I32)
    off = jnp.cumsum(sr, axis=1) - sr
    outs = []
    for j in range(cwr):
        src = jnp.clip(off + j, 0, grows - 1)            # [ng, 8]
        acc = jnp.zeros((ng, 8, 8), I32)
        for d in range(grows):
            acc = acc + jnp.where((src == d)[:, :, None],
                                  xg[:, d, None, :], 0)
        outs.append(acc)
    W = jnp.stack(outs, axis=2)                          # [ng, 8r, cwr, 8w]
    return W.transpose(2, 3, 1, 0).reshape(cwr * 64, ng)


def main():
    import bench
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    h, w = planes[0].shape
    y, u, v = [jnp.asarray(p) for p in planes]
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = ny + 2 * nc

    # build words + sizes via the production packed path pieces
    @jax.jit
    def front(y, u, v):
        parts = [p8.pack_pixel_words(p) for p in (y, u, v)]
        xw = jnp.concatenate(parts, axis=1)
        padc = (-(n // 8)) % p8.TILE
        if padc:
            xw = jnp.concatenate(
                [xw, jnp.zeros((128, padc), jnp.int32)], axis=1)
        qtx = p8.expand_qtables(tuple(qts))
        pat = np.concatenate([
            np.zeros(ny // 8, np.int32), np.ones(nc // 8, np.int32),
            np.full(nc // 8, 2, np.int32)])
        pids = jnp.asarray(np.concatenate(
            [pat, np.zeros(padc, np.int32)])[None])
        cp = p8.dct_quantize_words(xw, qtx, pids)
        ntp = cp.shape[1]
        pairsT = cp.reshape(32, 8, ntp).transpose(0, 2, 1).reshape(
            32, ntp * 8)[:, :n]
        return pe.encode_words_pairs(pairsT)

    words, sizes, ok = front(y, u, v)
    sizes_r = jax.jit(ds._chunk_rows)(sizes.astype(I32))
    sr_np = np.asarray(sizes_r)
    grp = sr_np.reshape(-1, 8).sum(1)
    print(f"group rows: mean {grp.mean():.2f} p99 "
          f"{np.percentile(grp, 99):.0f} max {grp.max()}", flush=True)

    # --- correctness: grouped path vs production path -------------------
    xg, gok = compact_grouped(words, sizes_r)
    print("grouped capacity ok:", bool(gok), flush=True)
    Rp_new = expand_grouped(xg, sizes_r)
    c_new, ok_new = jax.jit(pd8.decode_words8_packed)(Rp_new)

    content4, s2, total, _ = jax.jit(
        lambda w, s: ds._compact_words(w, s, jnp.bool_(True)))(words, sizes)
    Rp_old = jax.jit(lambda c, s: ds._expand_window8(
        c, ds._chunk_rows(s.astype(I32)), 16))(content4, s2)
    c_old, ok_old = jax.jit(pd8.decode_words8_packed)(Rp_old)

    same = bool(jnp.array_equal(c_new[:, :n // 8], c_old[:, :n // 8])
                ) and bool(jnp.array_equal(ok_new, ok_old))
    print("decoded coefficients equal:", same, flush=True)

    # --- timings ---------------------------------------------------------
    t = timeit(lambda: compact_grouped(words, sizes_r)[0])
    print(f"compact grouped (log-shift): {t*1e3:7.2f} ms "
          f"(old gather: 12.19)", flush=True)
    t = timeit(lambda: expand_grouped(xg, sizes_r))
    print(f"expand grouped (one-hot):    {t*1e3:7.2f} ms "
          f"(old gather:  8.78)", flush=True)
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
