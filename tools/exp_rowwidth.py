"""Gather throughput vs row width on the real chip.

The compact/expand stages are row gathers; cost could be per-index or
per-byte. Same logical stream (4K q50 geometry: N=284k blocks,
~5.2 MB aligned interchange), gathered at 4/8/16-word row granularity.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


N = 284_256


def main():
    rng = np.random.default_rng(0)
    sizes = rng.integers(4, 28, (N,)).astype(np.int32)  # bytes, avg ~16

    for aw in (4, 8, 16):
        rb = 4 * aw  # bytes per row
        sizes_r = (sizes + rb - 1) // rb
        offs_r = np.cumsum(sizes_r) - sizes_r
        totr = int(sizes_r.sum())
        capr = int(N * (64 // aw) // 8)  # ~2 rows/block at aw=4 scale
        capr = max(capr, totr + 8)
        src = jnp.asarray(rng.integers(0, 1 << 30, (capr, aw), np.int32))
        # expand-style: cwr rows per block
        cwr = max(1, 16 // aw)
        offs_d = jnp.asarray(offs_r)
        szs_d = jnp.asarray(sizes_r)

        @jax.jit
        def expand(rows, offs, szs):
            jr = jnp.arange(cwr, dtype=jnp.int32)[:, None]
            idx = jnp.clip(offs[None, :] + jr, 0, rows.shape[0] - 1)
            return jnp.where((jr < szs[None, :])[:, :, None], rows[idx], 0)

        t = timeit(expand, src, offs_d, szs_d)
        nbytes = cwr * N * aw * 4
        print(f"aw={aw:2d} expand cwr={cwr}: {t*1e3:6.1f} ms "
              f"({nbytes/t/1e9:.2f} GB/s, {cwr*N/t/1e6:.0f} Midx/s)",
              flush=True)

        @jax.jit
        def expand_nomask(rows, offs):
            jr = jnp.arange(cwr, dtype=jnp.int32)[:, None]
            idx = jnp.clip(offs[None, :] + jr, 0, rows.shape[0] - 1)
            return rows[idx]

        t = timeit(expand_nomask, src, offs_d)
        print(f"aw={aw:2d} expand nomask : {t*1e3:6.1f} ms", flush=True)

        # compact-style gather: totr-capacity rows picked from block canvas
        canvas = jnp.asarray(
            rng.integers(0, 1 << 30, (N * max(1, 16 // aw) * cwr, aw),
                         np.int32))

        @jax.jit
        def compact(rows, offs, szs):
            capg = rows.shape[0] // 2
            k = jnp.arange(capg, dtype=jnp.int32)
            mark = jnp.zeros((capg,), jnp.int32).at[offs].add(
                1, mode="drop", indices_are_sorted=True,
                unique_indices=True)
            block_of = jnp.cumsum(mark) - 1
            start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(mark > 0, k, -1))
            r_of = jnp.clip(k - start, 0, cwr - 1)
            return rows[jnp.clip(block_of * cwr + r_of, 0,
                                 rows.shape[0] - 1)]

        t = timeit(compact, canvas, offs_d, szs_d)
        capg = canvas.shape[0] // 2
        print(f"aw={aw:2d} compact        : {t*1e3:6.1f} ms "
              f"({capg/t/1e6:.0f} Midx/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
