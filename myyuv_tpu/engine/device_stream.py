"""Fully on-chip codec streams: transform + entropy on the device.

The end-to-end TPU path: pixels go up once, compressed bytes come down —
nothing else crosses the host<->device link (which is a narrow tunnel on
single-chip dev boxes and a PCIe/DCN hop in production):

  compress:   plane u8 --h2d--> [DCT+quant] -> [encode_lanes] ->
              [on-device compaction via exclusive prefix sum]
              --d2h--> (chunk_sizes, packed content)
  decompress: (chunk_sizes, content) --h2d--> [on-device lane expansion]
              -> [decode_lanes] -> [dequant+IDCT] -> plane u8 (stays on
              device for metrics, or one d2h for file output)

The ragged<->dense conversions are the device analogs of
DCTYUVPlane::getContentPos (DCT.cpp:21-33): a prefix-sum gather/scatter
over the block axis. Content buffers are statically sized at CAP_BYTES_PER
block (4x the typical q50 chunk); overflow is detected and the caller
falls back to the host path (engine.pipeline with native entropy).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import device as edev
from ..kernels import device as kdev
from ..runtime.errors import BitstreamError

# static content capacity per block; q50 averages ~12 B/block, max 255
CAP_PER_BLOCK = 48


@functools.partial(jax.jit, static_argnames=("precision",))
def compress_plane(plane: jnp.ndarray, qtable: jnp.ndarray,
                   precision: str = "exact"):
    """[H, W] u8 -> (content [N*CAP] u8, sizes [N] i32, total i32, ok bool).

    The whole forward path on device: blocked DCT + quantization, per-block
    Huffman encode, then compaction of the 256-byte lanes into a packed
    content buffer at exclusive-prefix-sum offsets.
    """
    coeffs = kdev.dct_quantize_plane(plane, qtable, precision=precision)
    n = coeffs.shape[0]
    lanes, sizes, ok = edev.encode_lanes(coeffs.reshape(n, 64))
    offs = jnp.cumsum(sizes) - sizes                      # exclusive
    total = jnp.sum(sizes)
    cap = n * CAP_PER_BLOCK
    j = jnp.arange(edev.LANE, dtype=jnp.int32)[None, :]
    flat_pos = offs[:, None] + j                          # [N, LANE]
    valid = j < sizes[:, None]
    flat_pos = jnp.where(valid, flat_pos, cap)            # drop out-of-lane
    content = jnp.zeros((cap,), jnp.uint8).at[
        flat_pos.reshape(-1)].add(
        jnp.where(valid, lanes, 0).reshape(-1), mode="drop")
    all_ok = jnp.all(ok) & (total <= cap)
    return content, sizes, total, all_ok


@functools.partial(jax.jit, static_argnames=("h", "w", "precision"))
def decompress_plane(content: jnp.ndarray, sizes: jnp.ndarray,
                     qtable: jnp.ndarray, h: int, w: int,
                     precision: str = "exact"):
    """(content, sizes [N]) -> ([H, W] u8 plane, ok bool).

    Lane expansion (prefix-sum gather) + decode + inverse transform, all on
    device.
    """
    n = sizes.shape[0]
    sizes = sizes.astype(jnp.int32)
    offs = jnp.cumsum(sizes) - sizes
    j = jnp.arange(edev.LANE, dtype=jnp.int32)[None, :]
    idx = jnp.clip(offs[:, None] + j, 0, content.shape[0] - 1)
    lanes = jnp.where(j < sizes[:, None], content[idx], 0)
    coeffs, ok = edev.decode_lanes(lanes)
    plane = kdev.dequantize_idct_plane(
        coeffs.reshape(n, 8, 8), qtable, h, w, precision=precision)
    return plane, jnp.all(ok)


def roundtrip_planes(planes, qtables, precision: str = "exact"):
    """Full on-chip roundtrip of one frame's planes; returns device arrays.

    Dispatches all compresses before all decompresses so XLA can overlap;
    returns (recon_planes, total_compressed_bytes).
    """
    comp = [compress_plane(p, q, precision=precision)
            for p, q in zip(planes, qtables)]
    recon = []
    total = jnp.int32(0)
    for (content, sizes, t, ok), p, q in zip(comp, planes, qtables):
        h, w = p.shape
        r, dok = decompress_plane(content, sizes, q, h, w,
                                  precision=precision)
        recon.append(r)
        total = total + t
    return recon, total


# ---------------------------------------------------------------------------
# Host-facing helpers (pull/push with bounded shape variants)
# ---------------------------------------------------------------------------

_PULL_QUANTUM = 1 << 20  # 1 MiB


def pull_content(content_dev: jnp.ndarray, total: int) -> np.ndarray:
    """Transfer exactly ceil(total/1MiB) of the device content buffer."""
    n = int(total)
    padded = min(content_dev.shape[0],
                 (n + _PULL_QUANTUM - 1) // _PULL_QUANTUM * _PULL_QUANTUM)
    return np.asarray(content_dev[:padded])[:n]


def compress_plane_to_stream(plane_np: np.ndarray, qtable_np: np.ndarray,
                             precision: str = "exact"):
    """Host API: plane -> (chunk_sizes u8 [N], content u8 [total]).

    Raises BitstreamError on capacity overflow (caller falls back to the
    native host encoder).
    """
    content, sizes, total, ok = compress_plane(
        jnp.asarray(plane_np), jnp.asarray(qtable_np), precision=precision)
    if not bool(ok):
        raise BitstreamError("device compress overflow/failure")
    sizes_np = np.asarray(sizes).astype(np.uint8)
    return sizes_np, pull_content(content, int(total))


def decompress_stream_to_plane(sizes_np: np.ndarray, content_np: np.ndarray,
                               qtable_np: np.ndarray, h: int, w: int,
                               precision: str = "exact") -> np.ndarray:
    """Host API: ragged stream -> [H, W] u8 plane (pulled to host)."""
    n = sizes_np.shape[0]
    cap = n * CAP_PER_BLOCK
    if content_np.size > cap:
        raise BitstreamError("stream larger than device capacity")
    padded = np.zeros((cap,), np.uint8)
    padded[:content_np.size] = content_np
    plane, ok = decompress_plane(
        jnp.asarray(padded), jnp.asarray(sizes_np.astype(np.int32)),
        jnp.asarray(qtable_np), h, w, precision=precision)
    if not bool(ok):
        raise BitstreamError("Huffman bad code (device decode)")
    return np.asarray(plane)
