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


def _decode_lanes_dispatch(lanes):
    """Entropy decode: Pallas register kernel on TPU (fast), XLA v1
    elsewhere (Pallas has no compiled CPU path). The branch is trace-time
    static."""
    import jax

    if jax.default_backend() not in ("cpu",):
        from ..entropy import pallas_decode
        return pallas_decode.decode_lanes(lanes)
    return edev.decode_lanes(lanes)


def _encode_lanes_dispatch(coeffs):
    """Entropy encode: Pallas register kernel on TPU (~52 ms/4K-plane vs
    8.5 s for the XLA v1 encoder), XLA v1 elsewhere. Byte-identical
    output (tests/test_pallas_encode.py; tools/check_tpu_pallas_entropy)."""
    import jax

    if jax.default_backend() not in ("cpu",):
        from ..entropy import pallas_encode
        return pallas_encode.encode_lanes(coeffs)
    return edev.encode_lanes(coeffs)


# ---------------------------------------------------------------------------
# Frame-level API: one jit per geometry (all planes' blocks in one tensor)
# ---------------------------------------------------------------------------
#
# Compiles through the tunnel are expensive (~8 min cold / ~2 min warm per
# executable), so the whole frame — luma + both chroma planes — is packed
# into a single [Ntot, 8, 8] block tensor with a per-block quantization
# table (broadcast-selected from the three plane tables). Two executables
# cover the full codec instead of six, and the bigger N utilizes the chip
# better. Block order: Y raster blocks, then U, then V — matching the
# per-plane stream split of the on-disk DCTYUV payload (DCT.cpp:112-173).


def _frame_qtables(qt_y, qt_u, qt_v, ny: int, nc: int):
    qidx = jnp.concatenate([
        jnp.zeros((ny,), jnp.int32), jnp.ones((nc,), jnp.int32),
        jnp.full((nc,), 2, jnp.int32)])
    qts = jnp.stack([qt_y, qt_u, qt_v])          # [3, 8, 8]
    return qts[qidx]                             # [Ntot, 8, 8]


@functools.partial(jax.jit, static_argnames=("precision",))
def compress_frame(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                   qt_y: jnp.ndarray, qt_u: jnp.ndarray, qt_v: jnp.ndarray,
                   precision: str = "exact"):
    """Full-frame on-chip compress.

    Returns (content [Ntot*CAP] u8, sizes [Ntot] i32, total, ok) with
    blocks ordered Y, U, V.
    """
    by = kdev.plane_to_blocks(y)
    bu = kdev.plane_to_blocks(u)
    bv = kdev.plane_to_blocks(v)
    ny, nc = by.shape[0], bu.shape[0]
    blocks = jnp.concatenate([by, bu, bv])
    qtab = _frame_qtables(qt_y, qt_u, qt_v, ny, nc)
    coeffs = kdev.dct_quantize(blocks, qtab, precision=precision)
    n = coeffs.shape[0]
    lanes, sizes, ok = _encode_lanes_dispatch(coeffs.reshape(n, 64))
    offs = jnp.cumsum(sizes) - sizes
    total = jnp.sum(sizes)
    cap = n * CAP_PER_BLOCK
    j = jnp.arange(edev.LANE, dtype=jnp.int32)[None, :]
    valid = j < sizes[:, None]
    # invalid lane bytes re-target the row's last valid byte with a zero
    # add: a sink index would break global monotonicity across rows, and
    # indices_are_sorted is what keeps this scatter's lowering cheap.
    # (No unique_indices hint: the re-targeted indices deliberately
    # duplicate the row's last position; add-of-zero keeps it correct
    # under any scatter ordering.)
    flat_pos = offs[:, None] + jnp.minimum(j, sizes[:, None] - 1)
    content = jnp.zeros((cap,), jnp.uint8).at[
        flat_pos.reshape(-1)].add(
        jnp.where(valid, lanes, 0).reshape(-1), mode="drop",
        indices_are_sorted=True)
    return content, sizes, total, jnp.all(ok) & (total <= cap)


@functools.partial(jax.jit, static_argnames=("h", "w", "precision"))
def decompress_frame(content: jnp.ndarray, sizes: jnp.ndarray,
                     qt_y: jnp.ndarray, qt_u: jnp.ndarray,
                     qt_v: jnp.ndarray, h: int, w: int,
                     precision: str = "exact"):
    """Full-frame on-chip decompress -> (y, u, v, ok).

    Entropy decode runs in the Pallas register kernel
    (entropy/pallas_decode.py, ~240 ms/4K frame) on TPU; the XLA v1
    decoder remains for other backends.
    """
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    sizes = sizes.astype(jnp.int32)
    offs = jnp.cumsum(sizes) - sizes
    j = jnp.arange(edev.LANE, dtype=jnp.int32)[None, :]
    idx = jnp.clip(offs[:, None] + j, 0, content.shape[0] - 1)
    lanes = jnp.where(j < sizes[:, None], content[idx], 0)
    coeffs, ok = _decode_lanes_dispatch(lanes)
    qtab = _frame_qtables(qt_y, qt_u, qt_v, ny, nc)
    pix = kdev.dequantize_idct(coeffs.reshape(-1, 8, 8), qtab,
                               precision=precision)
    y = kdev.blocks_to_plane(pix[:ny], h, w)
    u = kdev.blocks_to_plane(pix[ny:ny + nc], h // 2, w // 2)
    v = kdev.blocks_to_plane(pix[ny + nc:], h // 2, w // 2)
    return y, u, v, jnp.all(ok)


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
    lanes, sizes, ok = _encode_lanes_dispatch(coeffs.reshape(n, 64))
    offs = jnp.cumsum(sizes) - sizes                      # exclusive
    total = jnp.sum(sizes)
    cap = n * CAP_PER_BLOCK
    j = jnp.arange(edev.LANE, dtype=jnp.int32)[None, :]
    valid = j < sizes[:, None]
    flat_pos = offs[:, None] + jnp.minimum(j, sizes[:, None] - 1)
    content = jnp.zeros((cap,), jnp.uint8).at[
        flat_pos.reshape(-1)].add(
        jnp.where(valid, lanes, 0).reshape(-1), mode="drop",
        indices_are_sorted=True)
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
    returns (recon_planes, total_compressed_bytes, ok) where ``ok`` is the
    AND of every compress/decompress status flag — False means capacity
    overflow or a bad decode, and the planes/byte count must not be
    trusted.
    """
    comp = [compress_plane(p, q, precision=precision)
            for p, q in zip(planes, qtables)]
    recon = []
    total = jnp.int32(0)
    all_ok = jnp.bool_(True)
    for (content, sizes, t, ok), p, q in zip(comp, planes, qtables):
        h, w = p.shape
        r, dok = decompress_plane(content, sizes, q, h, w,
                                  precision=precision)
        recon.append(r)
        total = total + t
        all_ok = all_ok & ok & dok
    return recon, total, all_ok


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


def compress_frame_to_streams(planes_np, qtables_np,
                              precision: str = "exact"):
    """Host API: (y, u, v) planes -> [(sizes u8, content u8)] per plane."""
    h, w = planes_np[0].shape
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    content, sizes, total, ok = compress_frame(
        jnp.asarray(planes_np[0]), jnp.asarray(planes_np[1]),
        jnp.asarray(planes_np[2]), *[jnp.asarray(q) for q in qtables_np],
        precision=precision)
    if not bool(ok):
        raise BitstreamError("device compress overflow/failure")
    sizes_np = np.asarray(sizes)
    content_np = pull_content(content, int(total))
    out = []
    pos = 0
    for lo, hi in ((0, ny), (ny, ny + nc), (ny + nc, ny + 2 * nc)):
        s = sizes_np[lo:hi]
        t = int(s.sum())
        out.append((s.astype(np.uint8), content_np[pos: pos + t]))
        pos += t
    return out


def decompress_streams_to_frame(streams, qtables_np, h: int, w: int,
                                precision: str = "exact"):
    """Host API: per-plane (sizes, content) -> (y, u, v) uint8 planes."""
    sizes_np = np.concatenate([s.astype(np.int32) for s, _ in streams])
    content_np = np.concatenate([c for _, c in streams])
    cap = sizes_np.shape[0] * CAP_PER_BLOCK
    if content_np.size > cap:
        raise BitstreamError("stream larger than device capacity")
    padded = np.zeros((cap,), np.uint8)
    padded[:content_np.size] = content_np
    y, u, v, ok = decompress_frame(
        jnp.asarray(padded), jnp.asarray(sizes_np),
        *[jnp.asarray(q) for q in qtables_np], h=h, w=w,
        precision=precision)
    if not bool(ok):
        raise BitstreamError("Huffman bad code (device decode)")
    return np.asarray(y), np.asarray(u), np.asarray(v)


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
