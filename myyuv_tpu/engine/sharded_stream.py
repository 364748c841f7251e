"""Sharded end-to-end compression: entropy + compaction inside the graph.

Round 1 sharded only the dense transform roundtrip; this module puts the
WHOLE codec — DCT+quantize, per-block Huffman encode, and the ragged
stream compaction — under ``jax.shard_map`` over the device mesh, so a
frame's blocks compress to per-device compact segments with zero host
round-trips. The TPU-native generalization of the reference's OpenMP
block loop (DCT.cpp:294-296) and of ``DCTYUVPlane::getContentPos``
(DCT.cpp:21-33): the within-device exclusive scan runs in the kernel
graph, and the cross-device/process scan happens once at assembly time
over per-segment byte totals (parallel.distributed.gather_streams).

Layout contract: blocks are sharded contiguously over the mesh's
flattened (data, block) axes — device d owns global blocks
[d*n_loc, (d+1)*n_loc) — so concatenating the per-device repacked byte
segments in device order yields exactly the single-device stream, byte
for byte (tests/test_sharded_stream.py asserts this).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..kernels import device as kdev
from ..parallel import mesh as meshlib
from ..runtime.errors import BitstreamError
from . import device_stream as ds

AXES = (meshlib.DATA_AXIS, meshlib.BLOCK_AXIS)


def _pad_blocks(n: int, n_dev: int) -> int:
    """Blocks padded so every device owns the same count."""
    return (n + n_dev - 1) // n_dev * n_dev


def make_sharded_plane_codec(mesh, precision: str = "exact"):
    """Build (compress, decompress) jitted over `mesh` for one plane.

    compress: (blocks [Npad, 8, 8] u8, qtable) ->
        (content4 [Npad*CAPW] i32 — device d's compact segment at
         [d*segcap, (d+1)*segcap), sizes [Npad] i32, seg_rows [D] i32
         valid 16-byte rows per segment, ok [D] bool)
    decompress: (content4, sizes, qtable) -> (coeff blocks [Npad, 8, 8]
         i16 pixels u8, ok [Npad] bool per block)

    Npad must be a multiple of the mesh device count (pad with any valid
    blocks; callers drop padding rows/bytes — they sit at the global
    tail by the layout contract).
    """
    n_dev = mesh.devices.size
    shspec = P(AXES)
    rep = P()

    def compress_body(blocks, qtable):
        coeffs = kdev.dct_quantize(blocks, qtable, precision=precision)
        n_loc = coeffs.shape[0]
        words, _aT, sizes, ok = ds._encode_words_dispatch(
            coeffs.reshape(n_loc, 64))
        content4, sizes, _total, okk = ds._compact_words(
            words, sizes, jnp.all(ok))
        seg_rows = jnp.sum(ds._chunk_rows(sizes))
        return content4, sizes, seg_rows[None], okk[None]

    def decompress_body(content4, sizes, qtable):
        sizes = sizes.astype(jnp.int32)
        sizes_r = ds._chunk_rows(sizes)
        R = ds._expand_window(content4, sizes_r, cw=16)
        coeffs, ok = ds._decode_words_dispatch(R)
        ok = ok & (sizes_r <= 16 // ds.ALIGN_W)
        pix = kdev.dequantize_idct(coeffs.reshape(-1, 8, 8), qtable,
                                   precision=precision)
        return pix, ok

    # check_vma=False: the bodies are purely per-device (no collectives),
    # and the entropy kernels' scan carries start from literals, which the
    # varying-axis checker would otherwise reject.
    compress = jax.jit(jax.shard_map(
        compress_body, mesh=mesh, check_vma=False,
        in_specs=(shspec, rep), out_specs=(shspec, shspec, shspec, shspec)))
    decompress = jax.jit(jax.shard_map(
        decompress_body, mesh=mesh, check_vma=False,
        in_specs=(shspec, shspec, rep), out_specs=(shspec, shspec)))
    return compress, decompress


_CODEC_CACHE = {}


def _codec_for(mesh, precision: str):
    key = (id(mesh), precision)
    if key not in _CODEC_CACHE:
        _CODEC_CACHE[key] = make_sharded_plane_codec(mesh, precision)
    return _CODEC_CACHE[key]


def compress_plane_sharded(mesh, plane_np: np.ndarray,
                           qtable_np: np.ndarray,
                           precision: str = "exact"):
    """Host API: plane -> (chunk_sizes u8 [N], content u8) via the mesh.

    Every device compresses its contiguous share of the plane's blocks;
    the per-device compact segments are repacked and concatenated in
    device order (the cross-device exclusive scan over segment totals),
    producing a byte stream identical to the single-device path.
    """
    from .. import native
    n_dev = mesh.devices.size
    blocks = _host_plane_to_blocks(plane_np)
    n = blocks.shape[0]
    npad = _pad_blocks(n, n_dev)
    if npad != n:
        blocks = np.concatenate(
            [blocks, np.zeros((npad - n, 8, 8), np.uint8)])
    compress, _ = _codec_for(mesh, precision)
    sh = NamedSharding(mesh, P(AXES))
    blocks_dev = jax.device_put(jnp.asarray(blocks), sh)
    content4, sizes, seg_rows, ok = compress(blocks_dev,
                                             jnp.asarray(qtable_np))
    if not bool(jnp.all(ok)):
        raise BitstreamError("sharded device compress overflow/failure")
    sizes_np = np.asarray(sizes).astype(np.int32)
    seg_rows_np = np.asarray(seg_rows)
    content_np = np.asarray(content4)
    n_loc = npad // n_dev
    segcap = ds.capw_total(n_loc)
    parts: List[np.ndarray] = []
    for d in range(n_dev):
        seg_sizes = sizes_np[d * n_loc:(d + 1) * n_loc]
        seg_words = content_np[d * segcap:
                               d * segcap + int(seg_rows_np[d]) * ds.ALIGN_W]
        parts.append(native.repack_words(seg_words, seg_sizes,
                                         align=ds.ALIGN_W))
    packed = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    # padding blocks sit at the global tail: drop their sizes and bytes
    total = int(sizes_np[:n].astype(np.int64).sum())
    return sizes_np[:n].astype(np.uint8), packed[:total]


def decompress_plane_sharded(mesh, sizes_np: np.ndarray,
                             content_np: np.ndarray,
                             qtable_np: np.ndarray, h: int, w: int,
                             precision: str = "exact"):
    """Host API: ragged stream -> [H, W] u8 plane via the mesh."""
    from .. import native
    n_dev = mesh.devices.size
    n = sizes_np.shape[0]
    npad = _pad_blocks(n, n_dev)
    sizes_i32 = np.zeros(npad, np.int32)
    sizes_i32[:n] = sizes_np.astype(np.int32)
    content_all = content_np
    if npad != n:
        # pad with valid minimal chunks (all-zero blocks) so padded rows
        # decode cleanly; their pixels are dropped below
        filler = _zero_block_chunk()
        sizes_i32[n:] = filler.size
        content_all = np.concatenate(
            [content_np, np.tile(filler, npad - n)])
    n_loc = npad // n_dev
    segcap = ds.capw_total(n_loc)
    boffs = np.cumsum(sizes_i32.astype(np.int64)) - sizes_i32
    content4 = np.zeros(n_dev * segcap, np.int32)
    for d in range(n_dev):
        seg_sizes = sizes_i32[d * n_loc:(d + 1) * n_loc]
        lo = int(boffs[d * n_loc])
        hi = lo + int(seg_sizes.astype(np.int64).sum())
        words = native.expand_words(content_all[lo:hi], seg_sizes,
                                    align=ds.ALIGN_W)
        if words.size > segcap:
            raise BitstreamError("stream larger than device capacity")
        content4[d * segcap: d * segcap + words.size] = words
    _, decompress = _codec_for(mesh, precision)
    sh = NamedSharding(mesh, P(AXES))
    pix, ok = decompress(
        jax.device_put(jnp.asarray(content4), sh),
        jax.device_put(jnp.asarray(sizes_i32), sh),
        jnp.asarray(qtable_np))
    if not bool(jnp.all(ok[:n])):
        raise BitstreamError("Huffman bad code (sharded device decode)")
    blocks = np.asarray(pix[:n])
    return _host_blocks_to_plane(blocks, h, w)


def _host_plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _host_blocks_to_plane(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


@functools.lru_cache(maxsize=1)
def _zero_block_chunk() -> np.ndarray:
    """Chunk bytes of an all-zero coefficient block (the minimal valid
    stream: Huffman.cpp:176-203 single-symbol path)."""
    from .. import entropy
    sizes, content = entropy.encode_blocks(np.zeros((1, 64), np.int16))
    return content[:int(sizes[0])]
