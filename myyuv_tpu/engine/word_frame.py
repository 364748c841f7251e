"""Word-contract frames: the i32-packed device-resident frame format.

Round-5 (VERDICT r4 #5). The u8-plane frame contract pays a relayout
tax at every codec boundary: pack 0.764 + unpack 0.567 ms per 4K frame
(BENCH_r04 stages) against a ~44 us HBM byte bound, and round 4 proved
that cost is the local optimum FOR A u8-PLANE CONTRACT (the u8<->i32
bitcast machinery alone is 0.26 ms/direction; tools/exp_r4pack2/3).
This module changes the contract instead: a device-resident frame IS
one packed word tensor

    xw [128, NTP] i32 — pixel quad words in the packed-8 block layout
    (block b = c*8 + r at sublane r%8 of rows 16k..16k+7, lane column
    c; 4 consecutive row pixels per word, little-endian — exactly
    kernels/pallas_dct8.pack_pixel_words' output), columns ordered
    [Y | U | V] plane-major and right-padded to the Pallas tile.

With frames born in this layout (ingest converts into it, preview
converts out of it — engine/streaming pipelines), the codec roundtrip
is the two fused kernels and NOTHING else: compress consumes xw
verbatim (DCT+quantize+Huffman-encode, entropy/pallas_encode8) and
decompress emits it verbatim (Huffman-decode+dequantize+IDCT,
entropy/pallas_decode8). No pack, no unpack, no bitcast machinery.

The pad columns (tile alignment) carry zero-pixel blocks on creation;
after a roundtrip their content is the codec image of zero blocks —
consumers address frames through ``unpack_frame``/plane slices, which
never read pad columns. Reference semantics unchanged: the interchange
(A, C, sizes) is byte-identical to engine/device_stream.compress_frame
on the same pixels (same kernels, same inputs), so every oracle-interop
and bit-exactness guarantee carries over (DCT.cpp:269-335,
Huffman.cpp:105-154,172-241).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import device_stream as ds
from ..kernels import pallas_dct8 as p8


def frame_cols(h: int, w: int, tile: int | None = None):
    """(luma columns, chroma columns per plane, padded total NTP) of the
    packed word layout for an h x w IYUV frame (h, w divisible by 16).

    NTP aligns to the DECODER tile (512, a multiple of the encoder's
    128) so both fused kernels consume/emit the frame with zero
    internal re-padding and a roundtrip preserves the tensor shape."""
    t = tile or p8.TILE
    ny8 = (h // 8) * (w // 8) // 8
    nc8 = (h // 16) * (w // 16) // 8
    ntot = ny8 + 2 * nc8
    return ny8, nc8, ntot + ((-ntot) % t)


@functools.partial(jax.jit, static_argnames=("tile",))
def pack_frame(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               tile: int | None = None):
    """u8 planes -> xw [128, NTP] word frame (the format boundary: file
    loads and legacy plane APIs enter the word contract here)."""
    h, w = y.shape
    _, _, ntp = frame_cols(h, w, tile)
    uv = jnp.concatenate([u, v], axis=0)
    parts = [p8.pack_pixel_words(y), p8.pack_pixel_words(uv)]
    xw = jnp.concatenate(parts, axis=1)
    pad = ntp - xw.shape[1]
    if pad:
        xw = jnp.concatenate(
            [xw, jnp.zeros((128, pad), jnp.int32)], axis=1)
    return xw


@functools.partial(jax.jit, static_argnames=("h", "w"))
def unpack_frame(xw: jnp.ndarray, h: int, w: int):
    """xw word frame -> (y, u, v) u8 planes (pad columns never read)."""
    ny8, nc8, _ = frame_cols(h, w, 1)
    yp = p8.unpack_pixel_words(xw[:, :ny8], h, w)
    uvp = p8.unpack_pixel_words(xw[:, ny8:ny8 + 2 * nc8],
                                h, w // 2)
    return yp, uvp[:h // 2], uvp[h // 2:]


@functools.partial(jax.jit, static_argnames=("tile",))
def bgrx_to_frame(pixels: jnp.ndarray, tile: int | None = None):
    """[H, W, 4] u8 BGRX -> xw word frame: the word-contract INGEST
    conversion. The colorspace math is kernels/device.bgrx_to_iyuv_vals
    (bit-identical to bgrx_to_iyuv); the computed i32 values pack
    straight into the packed layout through the weighted-MXU value
    relayout — no u8 plane, no byte bitcast repack."""
    from ..kernels import device as kdev
    h, w = pixels.shape[-3], pixels.shape[-2]
    _, _, ntp = frame_cols(h, w, tile)
    yv, uv, vv = kdev.bgrx_to_iyuv_vals(pixels)
    parts = [p8.pack_value_words(yv),
             p8.pack_value_words(jnp.concatenate([uv, vv], axis=0))]
    xw = jnp.concatenate(parts, axis=1)
    pad = ntp - xw.shape[1]
    if pad:
        xw = jnp.concatenate(
            [xw, jnp.zeros((128, pad), jnp.int32)], axis=1)
    return xw


@functools.partial(jax.jit, static_argnames=("h", "w"))
def frame_to_bgrx(xw: jnp.ndarray, h: int, w: int):
    """xw word frame -> [H, W, 4] u8 BGRX: the word-contract PREVIEW
    conversion.

    Negative result (tools/exp_r5conv.py, 4K): the value-route unpack
    measured 1.832 ms vs 1.027 for byte-route unpack + dense
    conversion — the inverse direction needs FOUR byte-selection dots
    where the forward needs two weighted ones, doubling the MXU work
    past the bitcast saving. Preview therefore keeps the byte route
    (ingest keeps the value route: 1.019 vs 1.218 ms).

    The barrier between the two halves is load-bearing: fused into one
    module without it, XLA merges the unpack relayout with the
    conversion's channel math and the chain regressed 1.0 -> 8.5 ms
    (round-5 shakedown bench; same pathology as kernels/device.unfuse)."""
    from ..kernels import device as kdev
    y, u, v = unpack_frame(xw, h, w)
    y, u, v = jax.lax.optimization_barrier((y, u, v))
    return kdev.iyuv_to_bgrx(y, u, v)


def _qtx_pids(qt_y, qt_u, qt_v, h: int, w: int,
              tile: int | None = None):
    ny8, nc8, ntp = frame_cols(h, w, tile)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    pids = p8.plane_pids(8 * ny8, 8 * nc8, ntp - ny8 - 2 * nc8)
    return qtx, pids


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "cont", "interpret",
                                    "tile"))
def compress_words(xw: jnp.ndarray, qt_y, qt_u, qt_v, h: int, w: int,
                   cont: int = ds.CONT_DEFAULT,
                   interpret: bool = False, tile: int | None = None):
    """Word frame -> (contentA, contentC, sizes, total, ok): the dense
    two-region interchange, byte-identical to compress_frame on the
    same pixels. The frame feeds the fused DCT+quantize+Huffman-encode
    kernel verbatim — compress IS the kernel."""
    from ..entropy import pallas_encode8 as pe8
    ny8, nc8, _ = frame_cols(h, w, tile)
    n = 8 * (ny8 + 2 * nc8)
    qtx, pids = _qtx_pids(qt_y, qt_u, qt_v, h, w, tile)
    C, A, sizes, ok = pe8.dct_encode_words_packed(
        xw, qtx, pids, cont=cont, interpret=interpret, tile=tile)
    sizes = sizes[:n]
    return A, C, sizes, jnp.sum(sizes), jnp.all(ok[:n])


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "fused", "interpret",
                                    "tile"))
def decompress_words(contentA: jnp.ndarray, contentC: jnp.ndarray,
                     sizes: jnp.ndarray, qt_y, qt_u, qt_v,
                     h: int, w: int, fused: bool | None = None,
                     interpret: bool = False, tile: int | None = None):
    """Dense interchange -> (xw word frame, ok). Decompress IS the
    fused Huffman-decode+dequantize+IDCT kernel — its [128, NTP] pixel
    quad-word output is the frame."""
    from ..entropy import pallas_decode8 as pd8
    ny8, nc8, _ = frame_cols(h, w, tile)
    n = 8 * (ny8 + 2 * nc8)
    qtx, pids = _qtx_pids(qt_y, qt_u, qt_v, h, w, tile)
    sizes = sizes.astype(jnp.int32)
    cwrows = (sizes + 4 * ds.ALIGN_W - 1) // (4 * ds.ALIGN_W)
    cw = 8 + contentC.shape[0] // 8
    if ds.DEC8_FUSED if fused is None else fused:
        xw, ok = pd8.decode_idct_words8_split_fused(
            contentA, contentC, qtx, pids, interpret=interpret,
            tile=tile)
    else:
        xw, ok = pd8.decode_idct_words8_split(
            contentA, contentC, qtx, pids, interpret=interpret,
            tile=tile)
    return xw, jnp.all(ok[:n]) & jnp.all(cwrows <= cw // ds.ALIGN_W)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "cont", "interpret",
                                    "tile"))
def roundtrip_words(xw: jnp.ndarray, qt_y, qt_u, qt_v, h: int, w: int,
                    cont: int = ds.CONT_DEFAULT,
                    interpret: bool = False, tile: int | None = None):
    """Whole word-contract roundtrip as ONE executable -> (xw', total,
    ok): the transcode/RD loop entry on the word contract — two fused
    kernels back to back, zero relayouts."""
    A, C, sizes, total, ok = compress_words(
        xw, qt_y, qt_u, qt_v, h=h, w=w, cont=cont, interpret=interpret,
        tile=tile)
    rxw, dok = decompress_words(A, C, sizes, qt_y, qt_u, qt_v,
                                h=h, w=w, interpret=interpret,
                                tile=tile)
    return rxw, total, ok & dok


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "cont", "interpret",
                                    "tile"))
def ingest_frame(pixels: jnp.ndarray, qt_y, qt_u, qt_v, h: int, w: int,
                 cont: int = ds.CONT_DEFAULT, interpret: bool = False,
                 tile: int | None = None):
    """BGRX pixels -> interchange in ONE executable (bgrx_to_frame +
    compress_words fused): the capture pipeline's per-frame dispatch."""
    xw = bgrx_to_frame(pixels, tile=tile)
    return compress_words(xw, qt_y, qt_u, qt_v, h=h, w=w, cont=cont,
                          interpret=interpret, tile=tile)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "fused", "interpret",
                                    "tile"))
def preview_frame(contentA: jnp.ndarray, contentC: jnp.ndarray,
                  sizes: jnp.ndarray, qt_y, qt_u, qt_v, h: int, w: int,
                  fused: bool | None = None, interpret: bool = False,
                  tile: int | None = None):
    """Interchange -> BGRX preview in ONE executable (decompress_words
    + frame_to_bgrx fused; the unpack/convert barrier inside
    frame_to_bgrx is preserved): the playback pipeline's per-frame
    dispatch. Returns (bgrx, ok)."""
    xw, ok = decompress_words(contentA, contentC, sizes,
                              qt_y, qt_u, qt_v, h=h, w=w, fused=fused,
                              interpret=interpret, tile=tile)
    return frame_to_bgrx(xw, h, w), ok


# ---------------------------------------------------------------------------
# Sharded word-contract codec: lane columns over the device mesh
# ---------------------------------------------------------------------------
#
# The word layout makes sharding trivial: splitting xw's lane COLUMNS
# over the mesh gives every device a contiguous block range (block
# b = c*8 + r), so each shard body is just the fused kernels on its
# slab — no per-device pack/unpack (the plane-row sharding of
# engine/sharded_stream pays both), and assembly is concatenation in
# mesh order = the global stream order. The TPU-native generalization
# of the reference's OpenMP block loop (DCT.cpp:294-296) on the
# word contract.


def pad_frame_cols(xw: jnp.ndarray, n_dev: int,
                   tile: int | None = None) -> jnp.ndarray:
    """Right-pad a word frame's columns to a multiple of
    n_dev * encoder-tile so every device's slab is tile-aligned (pad
    columns are zero blocks = valid ignorable chunks)."""
    from ..entropy import pallas_encode8 as pe8
    t = (tile or pe8.TP) * n_dev
    pad = (-xw.shape[1]) % t
    if pad:
        xw = jnp.concatenate(
            [xw, jnp.zeros((128, pad), jnp.int32)], axis=1)
    return xw


_WORD_SHARDED_CACHE = {}


def _word_sharded(mesh, h: int, w: int, ntps: int, cont: int,
                  interpret: bool, tile: int | None):
    """(compress, decompress) shard_map jits for an ntps-column frame
    (cached per geometry — shard_map closures retrace per call)."""
    key = (id(mesh), h, w, ntps, cont, interpret, tile)
    if key in _WORD_SHARDED_CACHE:
        return _WORD_SHARDED_CACHE[key]
    from jax.sharding import PartitionSpec as P
    from ..entropy import pallas_encode8 as pe8
    from ..entropy import pallas_decode8 as pd8
    from ..parallel import mesh as meshlib
    axes = (meshlib.DATA_AXIS, meshlib.BLOCK_AXIS)
    shc = P(None, axes)
    shs = P(axes)
    rep = P()

    def cbody(xw_l, qtx, pids_l):
        C, A, sizes, ok = pe8.dct_encode_words_packed(
            xw_l, qtx, pids_l, cont=cont, interpret=interpret,
            tile=tile)
        return A, C, sizes, ok.astype(jnp.int32)

    def dbody(A_l, C_l, qtx, pids_l):
        xw_l, ok = pd8.decode_idct_words8_split(
            A_l, C_l, qtx, pids_l, interpret=interpret, tile=tile)
        return xw_l, ok.astype(jnp.int32)

    compress = jax.jit(jax.shard_map(
        cbody, mesh=mesh, check_vma=False,
        in_specs=(shc, rep, shc), out_specs=(shc, shc, shs, shs)))
    decompress = jax.jit(jax.shard_map(
        dbody, mesh=mesh, check_vma=False,
        in_specs=(shc, shc, rep, shc), out_specs=(shc, shs)))
    _WORD_SHARDED_CACHE[key] = (compress, decompress)
    return compress, decompress


def _pids_sharded(h, w, ntps):
    ny8, nc8, _ = frame_cols(h, w, 1)
    return p8.plane_pids(8 * ny8, 8 * nc8, ntps - ny8 - 2 * nc8)


def compress_words_sharded(mesh, xw: jnp.ndarray, qt_y, qt_u, qt_v,
                           h: int, w: int, cont: int = ds.CONT_DEFAULT,
                           interpret: bool = False,
                           tile: int | None = None):
    """Sharded word-contract compress: xw [128, NTPS] (pad_frame_cols
    geometry) -> (A, C, sizes[:n live], total, ok) — byte-identical
    chunks to the single-device compress_words."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel import mesh as meshlib
    axes = (meshlib.DATA_AXIS, meshlib.BLOCK_AXIS)
    ntps = xw.shape[1]
    ny8, nc8, _ = frame_cols(h, w, 1)
    n = 8 * (ny8 + 2 * nc8)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    pids = jax.device_put(
        _pids_sharded(h, w, ntps),
        NamedSharding(mesh, P(None, axes)))
    compress, _ = _word_sharded(mesh, h, w, ntps, cont, interpret,
                                tile)
    with mesh:
        A, C, sizes, ok = compress(xw, qtx, pids)
    sizes = sizes[:n]
    return A, C, sizes, jnp.sum(sizes), jnp.all(ok[:n] != 0)


def decompress_words_sharded(mesh, A: jnp.ndarray, C: jnp.ndarray,
                             sizes: jnp.ndarray, qt_y, qt_u, qt_v,
                             h: int, w: int, interpret: bool = False,
                             tile: int | None = None):
    """Sharded word-contract decompress -> (xw [128, NTPS], ok)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel import mesh as meshlib
    axes = (meshlib.DATA_AXIS, meshlib.BLOCK_AXIS)
    ntps = A.shape[1]
    ny8, nc8, _ = frame_cols(h, w, 1)
    n = 8 * (ny8 + 2 * nc8)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    pids = jax.device_put(
        _pids_sharded(h, w, ntps),
        NamedSharding(mesh, P(None, axes)))
    _, decompress = _word_sharded(
        mesh, h, w, ntps, 8 * (C.shape[0] // 64), interpret, tile)
    with mesh:
        xw, ok = decompress(A, C, qtx, pids)
    sizes = sizes.astype(jnp.int32)
    cw = 8 + C.shape[0] // 8
    cwrows = (sizes + 4 * ds.ALIGN_W - 1) // (4 * ds.ALIGN_W)
    return xw, (jnp.all(ok[:n] != 0)
                & jnp.all(cwrows <= cw // ds.ALIGN_W))


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "cont", "interpret",
                                    "tile"))
def roundtrip_words_scan(xws: jnp.ndarray, qt_y, qt_u, qt_v,
                         h: int, w: int, cont: int = ds.CONT_DEFAULT,
                         interpret: bool = False,
                         tile: int | None = None):
    """K word-frame roundtrips in ONE executable (lax.scan over the
    leading axis of xws [K, 128, NTP]) -> (totals [K], oks [K])."""
    def body(carry, xw):
        _rxw, total, ok = roundtrip_words(
            xw, qt_y, qt_u, qt_v, h=h, w=w, cont=cont,
            interpret=interpret, tile=tile)
        return carry, (total, ok)

    _, (totals, oks) = jax.lax.scan(body, jnp.int32(0), xws)
    return totals, oks
