"""One-off: measure compaction/window gather variants on the real chip.

Variants of engine/device_stream._compact_words / _expand_window on the
real 4K frame's stream geometry (284,256 blocks, ~3.4 MB packed):

  A. compact, current: capr = 3n rows gathered, unsorted jnp take
  B. compact, tight capacity: capr = ceil(1.25n)
  C. compact, sorted/unique gather hints (indices monotone by design)
  D. B + C
  E. window, current: [4, N] row gather
  F. window, [N, 4] monotone-flattened gather with sorted hints
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import bench
from myyuv_tpu.engine import batch as eb
from myyuv_tpu.engine import device_stream as ds

ALIGN_W = ds.ALIGN_W
RPB = 64 // ALIGN_W


def timeit(fn, *args, reps=10):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def compact_cummax(words, sizes, cap_factor):
    """block_of's start position via a running max instead of the
    offs_r[block_of] index gather (the hidden second gather)."""
    n = sizes.shape[0]
    sizes_r = ds._chunk_rows(sizes)
    offs_r = jnp.cumsum(sizes_r) - sizes_r
    totr = jnp.sum(sizes_r)
    capr = int(n * cap_factor)
    k = jnp.arange(capr, dtype=jnp.int32)
    # row k belongs to the block whose run starts at the last marked
    # position <= k: block id via cumsum of marks, the run start via a
    # running max — no index gather
    mark = jnp.zeros((capr,), jnp.int32).at[offs_r].add(
        1, mode="drop", indices_are_sorted=True, unique_indices=True)
    block_of = jnp.cumsum(mark) - 1
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(mark > 0, k, -1))
    r_of = jnp.clip(k - start, 0, RPB - 1)
    rows = words.T.reshape(n * RPB, ALIGN_W)
    src = block_of * RPB + r_of
    out = rows[src]
    return jnp.where((k < totr)[:, None], out, 0).reshape(-1)


def compact_variant(words, sizes, cap_factor, sorted_hints):
    n = sizes.shape[0]
    sizes_r = ds._chunk_rows(sizes)
    offs_r = jnp.cumsum(sizes_r) - sizes_r
    totr = jnp.sum(sizes_r)
    capr = int(n * cap_factor)
    mark = jnp.zeros((capr,), jnp.int32).at[offs_r].add(
        1, mode="drop", indices_are_sorted=True, unique_indices=True)
    block_of = jnp.cumsum(mark) - 1
    k = jnp.arange(capr, dtype=jnp.int32)
    r_of = jnp.clip(k - offs_r[block_of], 0, RPB - 1)
    rows = words.T.reshape(n * RPB, ALIGN_W)
    src = block_of * RPB + r_of
    if sorted_hints:
        out = jax.lax.gather(
            rows, src[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            (1, ALIGN_W), indices_are_sorted=True, unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP)
    else:
        out = rows[src]
    return jnp.where((k < totr)[:, None], out, 0).reshape(-1)


def window_variant(content4, sizes_r, cw, mode):
    rows = content4.reshape(-1, ALIGN_W)
    offs_r = jnp.cumsum(sizes_r) - sizes_r
    n = sizes_r.shape[0]
    nr = cw // ALIGN_W
    if mode == "jT":                       # [4, N] index grid (current)
        jr = jnp.arange(nr, dtype=jnp.int32)[:, None]
        idx = jnp.clip(offs_r[None, :] + jr, 0, rows.shape[0] - 1)
        R4 = jnp.where((jr < sizes_r[None, :])[:, :, None], rows[idx], 0)
        return R4.transpose(0, 2, 1).reshape(cw, n)
    # [N, 4] monotone order with sorted gather hint
    jr = jnp.arange(nr, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(offs_r[:, None] + jr, rows.shape[0] - 1)
    R4 = jax.lax.gather(
        rows, idx.reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        (1, ALIGN_W), indices_are_sorted=True, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP).reshape(n, nr, ALIGN_W)
    R4 = jnp.where((jr < sizes_r[:, None])[:, :, None], R4, 0)
    return R4.transpose(1, 2, 0).reshape(cw, n)


def main():
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    from myyuv_tpu.kernels import device as kdev

    # full-frame coefficient tensor like compress_frame
    by = kdev.plane_to_blocks(jnp.asarray(planes[0]))
    bu = kdev.plane_to_blocks(jnp.asarray(planes[1]))
    bv = kdev.plane_to_blocks(jnp.asarray(planes[2]))
    ny, nc = by.shape[0], bu.shape[0]
    blocks = jnp.concatenate([by, bu, bv])
    qtab = ds._frame_qtables(*qts, ny, nc)
    coeffs = kdev.dct_quantize(blocks, qtab)
    n = coeffs.shape[0]
    words, sizes, ok = jax.jit(ds._encode_words_dispatch)(
        coeffs.reshape(n, 64))
    sizes = sizes.astype(jnp.int32)
    np.asarray(words.ravel()[:1])
    sizes_np = np.asarray(sizes)
    totr = int(np.sum((sizes_np + 15) // 16))
    print(f"n={n} blocks, totr={totr} rows ({totr/n:.3f} rows/blk), "
          f"total={int(sizes_np.sum())} B", flush=True)

    for name, fac, hint in (("A cap3.0 nohint", 3.0, False),
                            ("B cap1.25 nohint", 1.25, False),
                            ("C cap3.0 hint", 3.0, True),
                            ("D cap1.25 hint", 1.25, True)):
        f = jax.jit(lambda w, s, fac=fac, hint=hint:
                    compact_variant(w, s, fac, hint))
        dt = timeit(f, words, sizes)
        print(f"compact {name}: {dt*1e3:.2f} ms", flush=True)

    for name, fac in (("G cummax cap3.0", 3.0), ("H cummax cap1.5", 1.5)):
        f = jax.jit(lambda w, s, fac=fac: compact_cummax(w, s, fac))
        dt = timeit(f, words, sizes)
        print(f"compact {name}: {dt*1e3:.2f} ms", flush=True)
    got2 = jax.jit(lambda w, s: compact_cummax(w, s, 1.5))(words, sizes)

    content4 = jax.jit(
        lambda w, s: compact_variant(w, s, 3.0, False))(words, sizes)
    sizes_r = ds._chunk_rows(sizes)
    for name, mode in (("E jT (current)", "jT"), ("F monotone+hint", "nT")):
        f = jax.jit(lambda c, s, mode=mode: window_variant(c, s, 16, mode))
        dt = timeit(f, content4, sizes_r)
        print(f"window {name}: {dt*1e3:.2f} ms", flush=True)

    # sanity: variants agree with the production helpers
    ref = jax.jit(lambda w, s: ds._compact_words(w, s, jnp.bool_(True)))(
        words, sizes)[0]
    got = jax.jit(lambda w, s: compact_variant(w, s, 1.25, True))(
        words, sizes)
    nref = np.asarray(ref)
    ngot = np.asarray(got)
    print("compact agree:", np.array_equal(nref[:ngot.size][:totr * 4],
                                           ngot[:totr * 4]))
    print("cummax agree:", np.array_equal(nref[:totr * 4],
                                          np.asarray(got2)[:totr * 4]))
    wref = jax.jit(lambda c, s: ds._expand_window(c, s, 16))(
        content4, sizes_r)
    wgot = jax.jit(lambda c, s: window_variant(c, s, 16, "nT"))(
        content4, sizes_r)
    print("window agree:", np.array_equal(np.asarray(wref),
                                          np.asarray(wgot)))


if __name__ == "__main__":
    main()
