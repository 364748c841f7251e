"""Fully on-chip codec streams: transform + entropy on the device.

The end-to-end TPU path: pixels go up once, compressed bytes come down —
nothing else crosses the host<->device link (which is a narrow tunnel on
single-chip dev boxes and a PCIe/DCN hop in production):

  compress:   plane u8 --h2d--> [pack] -> [fused DCT+quant+Huffman
              encode] -> (A, C, sizes); host pulls [compact] --d2h-->
  decompress: (sizes, A, C) --h2d--> [fused Huffman decode +
              dequant+IDCT] -> [unpack] -> plane u8 (stays on device
              for metrics, or one d2h for file output)

The ragged<->dense conversions are the device analogs of
DCTYUVPlane::getContentPos (DCT.cpp:21-33). The frame/batch paths use
the DENSE TWO-REGION interchange (round 3): region A [64, ceil8(N)]
holds every chunk's first 32 bytes and region C [cont*8, ceil8(N)] its
continuation words, BOTH in the packed decoder's window layout (row
8w + r = word w of block 8c + r) and both direct register-file outputs
of the Pallas encoder — so compress has no compaction gather and
decompress no scatter/window-expansion at all (each cost >1 ms/4K
frame in round 2). The ragged<->dense index work survives only at the
HOST boundary: ``_compact_split`` gathers the live continuation rows
before a pull (the d2h tunnel must not carry the dense C), and
expansion back to dense C happens in numpy before an upload. ``cont``
(8, 24 or 56 words) is the static emission tier: chunks beyond
4*(8+cont) bytes flip ok and callers retry roomier or fall back to the
host path (engine.pipeline with native entropy).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import device as edev
from ..kernels import device as kdev
from ..runtime.errors import BitstreamError

# interchange granularity: chunks pad to 8-word (32-byte) rows. TPU row
# gathers are index-bound, not byte-bound (tools/exp_rowwidth.py: 32-byte
# rows gather at ~60 Midx/s vs ~110 for 16-byte — half the indices for
# the same stream wins ~2x on compaction and ~1.3x on window expansion)
ALIGN_W = 8
# DENSE TWO-REGION interchange (frame/batch paths): region A holds
# every chunk's first 32 bytes and region C its continuation words,
# both [*, ceil8(N)] in the packed decoder's window layout (row 8w + r
# = word w of block 8c + r) — free register-file outputs of the Pallas
# encoder that the decode kernels consume verbatim. ``cont`` is the
# encoder's static continuation-word tier: 8 (64-byte chunks, covers
# the golden content through q70), 24 (128 B — covers q100 on the
# golden 4K frame, max chunk 118 B, with HALF the decode window-refill
# scan of the roomy tier) or 56 (the 255-byte format maximum).
CONT_DEFAULT = 8
CONT_Q90 = 16
CONT_MID = 24
CONT_ROOMY = 56
CONT_LADDER = (CONT_DEFAULT, CONT_Q90, CONT_MID, CONT_ROOMY)
# one-kernel decompress (tree+payload+IDCT fused, tree tables in VMEM
# scratch — entropy/pallas_decode8._fused_decode_idct_kernel8) vs the
# two-kernel pipeline; byte-identical, selectable for measurement.
# Default FUSED since round 5: with the latency-bound loop work done,
# the single kernel measures 1.120 vs 1.142 ms on the golden 4K (the
# per-kernel prologue is no longer hidden); both variants stay covered
# by tools/check_tpu_frame.py at q50+q90
DEC8_FUSED = os.environ.get("MYYUV_DEC8_FUSED", "1") == "1"
# quality at or above which streams are expected to exceed the 64-byte
# default tier (golden 4K: max chunk 58 B at q70, 71 B at q90) — callers
# that know the quality start the ladder higher (cont_for_quality)
QUALITY_MID_TIER = 85
# q95+ content can exceed the 96-byte q90 tier (q100 golden max chunk
# 118 B -> the 128-byte CONT_MID tier)
QUALITY_TOP_TIER = 95


def cont_for_quality(qmax: int):
    """Ladder start tier for a known max plane quality (None = default).

    96-byte chunks (cont=16, window cw=24) cover golden q90's 71-byte
    max with a 25% smaller decode refill scan and a 33% smaller encoder
    continuation file than CONT_MID; overflow still retries up the
    ladder, so the hint only affects speed, never correctness."""
    if qmax >= QUALITY_TOP_TIER:
        return CONT_MID
    if qmax >= QUALITY_MID_TIER:
        return CONT_Q90
    return None

# HOST-PULL compaction of region C (the d2h tunnel must not carry the
# dense C): live continuation rows gathered back to back in block
# order, budgeted by a global average in eighth-rows per block
# (capacity rows = npad * capb8_pb / 8). The row->block map costs one
# nseg-index scatter (segment-start marks -> cumsum) plus a 64-wide
# in-segment searchsorted — no N-index scatter anywhere (an
# ``.at[offs].max`` over all N blocks costs ~5 ms/4K frame).
SEG = 64                        # blocks per map segment
CAPB8_DEFAULT = 1               # 4 B/block avg (golden q50 uses ~10%)
CAPB8_MID = 8                   # 32 B/block avg (covers q90-class)
CAPB8_ROOMY = 56                # 224 B/block: every legal stream
CAPB8_LADDER = (CAPB8_DEFAULT, CAPB8_MID, CAPB8_ROOMY)


def capb_total(npad: int, capb8_pb: int = CAPB8_DEFAULT) -> int:
    """B-region capacity in 8-word (32-byte) rows for npad blocks."""
    return max(npad * capb8_pb // 8, 1)


def _encode_words_dispatch(coeffs):
    """[N, 64] i16 -> (words [N, 64] i32 kernel-space block-major,
    aT [8, N] i32 A-region words, sizes [N], ok [N]).

    Pallas on TPU; on CPU the XLA v1 encoder's lanes are packed to words
    (elementwise) so tests run everywhere."""
    import jax

    if jax.default_backend() not in ("cpu",):
        from ..entropy import pallas_encode
        return pallas_encode.encode_words(coeffs)
    from ..entropy import pallas_decode
    lanes, sizes, ok = edev.encode_lanes(coeffs)
    words, _ = pallas_decode._pack_words(lanes)
    return words.T, words[:8], sizes, ok


def _decode_words_dispatch(words):
    """[CW, N] i32 kernel-space words -> ([N, 64] i16, [N] ok)."""
    import jax

    if jax.default_backend() not in ("cpu",):
        from ..entropy import pallas_decode
        return pallas_decode.decode_words(words)
    from ..entropy import pallas_decode
    cw, n = words.shape
    if cw < 64:
        words = jnp.concatenate(
            [words, jnp.zeros((64 - cw, n), jnp.int32)], axis=0)
    from ..entropy.pallas_encode import _unpack_words
    lanes = _unpack_words(words.T)
    return edev.decode_lanes(lanes)


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


def _fwd_transform(blocks_flat, qt, precision: str):
    """[n, 64] u8 block rows + one [8, 8] qtable -> [n, 64] i16.

    Per-plane calls keep the quantization table a broadcast instead of a
    gathered [N, 8, 8] tensor (the gather + dequantize multiply cost
    ~10 ms/4K frame, profiled); the Pallas kernel fuses center + both
    matmuls + quantize in VMEM on TPU."""
    import jax

    if precision == "exact" and jax.default_backend() not in ("cpu",):
        from ..kernels import pallas_dct
        return pallas_dct.dct_quantize_rows(blocks_flat, qt)
    n = blocks_flat.shape[0]
    return kdev.dct_quantize(blocks_flat.reshape(n, 8, 8), qt,
                             precision=precision).reshape(n, 64)


def _inv_transform(coeffs_flat, qt, precision: str):
    """[n, 64] i16 coefficient rows + one [8, 8] qtable -> [n, 64] u8."""
    import jax

    if precision == "exact" and jax.default_backend() not in ("cpu",):
        from ..kernels import pallas_dct
        return pallas_dct.dequantize_idct_rows(coeffs_flat, qt)
    n = coeffs_flat.shape[0]
    return kdev.unfuse(kdev.dequantize_idct(
        coeffs_flat.reshape(n, 8, 8), qt,
        precision=precision)).reshape(n, 64)


def _use_packed(precision: str, h: int, w: int) -> bool:
    """Trace-time gate for the word-packed TPU routes: exact precision,
    codec-legal geometry (divisible by 16 => plane-pure lane columns and
    word-aligned rows), non-CPU backend."""
    return (precision == "exact" and h % 16 == 0 and w % 16 == 0
            and (h // 8) * (w // 8) % 8 == 0
            and (h // 16) * (w // 16) % 8 == 0
            and jax.default_backend() not in ("cpu",))


def _compress_words_packed(y, u, v, qt_y, qt_u, qt_v, b: int, h: int,
                           w: int, cont: int):
    """Word-packed on-chip compress: pixel quad words -> packed DCT ->
    coefficient pairs -> pair-input Huffman encoder -> compaction.

    Every inter-stage tensor stays at information density (4 pixels or
    2 coefficients per i32), which is what makes the relayouts cheap —
    the [N, 64]-shaped hops of the flat route cost 10.8 + 5.9 ms/4K
    frame in pure HBM shuffling (tools/exp_packdct.py)."""
    from ..entropy import pallas_encode8 as pe8
    from ..kernels import pallas_dct8 as p8
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    n = b * (ny + 2 * nc)
    # PLANE-MAJOR block order across the batch ([all Y | all U | all V],
    # frames contiguous within each plane region): each plane stack
    # packs as one tall plane — no per-frame slicing (the frame-major
    # interleave cost ~2 ms/frame of extra relayout at B=4 4K)
    # U and V share geometry: ONE row-stacked relayout call covers both
    # (identical block order to packing them separately; halves the
    # per-call overhead of the chroma relayouts)
    uv = jnp.concatenate([u.reshape(b * (h // 2), w // 2),
                          v.reshape(b * (h // 2), w // 2)], axis=0)
    parts = [p8.pack_pixel_words(y.reshape(b * h, w)),
             p8.pack_pixel_words(uv)]
    xw = jnp.concatenate(parts, axis=1)
    padc = (-(n // 8)) % p8.TILE
    if padc:
        xw = jnp.concatenate(
            [xw, jnp.zeros((128, padc), jnp.int32)], axis=1)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    pids = p8.plane_pids(b * ny, b * nc, padc)
    # ONE fused kernel does DCT+quantize+Huffman-encode: the coefficient
    # pairs live only in VMEM (the unfused hop moved 36 MB/4K frame
    # through HBM), pad lane columns encode as ignorable valid chunks,
    # and BOTH interchange regions come out already in the decoder's
    # window layout — compress ends at the kernel.
    C, A, sizes, ok = pe8.dct_encode_words_packed(
        xw, qtx, pids, cont=cont)
    sizes = sizes[:n]
    return A, C, sizes, jnp.sum(sizes), jnp.all(ok[:n])


def _dense_from_words(words, aT, sizes, ok, cont: int):
    """Fallback-route dense interchange: (words [N, 64] i32 block-major,
    aT [8, N]) -> (A [64, ceil8(N)], C [cont*8, ceil8(N)], sizes, total,
    ok) — the same contract the packed encoder emits directly."""
    from ..kernels.pallas_dct8 import pack_rows8

    n = sizes.shape[0]
    contentA = _a_to_packed(aT)
    cwords = words[:, 8:8 + cont]
    pad = (-n) % 8
    if pad:
        cwords = jnp.concatenate(
            [cwords, jnp.zeros((pad, cont), jnp.int32)], axis=0)
    C = pack_rows8(cwords)
    sizes = sizes.astype(jnp.int32)
    ok = ok & jnp.all(sizes <= 4 * (8 + cont))
    return contentA, C, sizes, jnp.sum(sizes), ok


@functools.partial(jax.jit, static_argnames=("precision", "cont"))
def compress_frame(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                   qt_y: jnp.ndarray, qt_u: jnp.ndarray, qt_v: jnp.ndarray,
                   precision: str = "exact",
                   cont: int = CONT_DEFAULT):
    """Full-frame on-chip compress -> (contentA, contentC, sizes, total,
    ok): the DENSE two-region device interchange.

    ``contentA`` [64, ceil8(N)] i32 holds every chunk's first 32 bytes
    and ``contentC`` [cont*8, ceil8(N)] its continuation words, both in
    the packed decoder's window layout (bytes bit-reversed, packed
    big-endian — the entropy kernels' native stream space) and both
    direct outputs of the Pallas encoder's register file: compress does
    no index work after the kernel and decompress consumes the pair
    verbatim. Chunks larger than 4*(8+cont) bytes flip ok (callers
    retry with cont=CONT_ROOMY). ``total`` is the exact byte total; the
    on-disk stream is one compaction gather + linear host pass away
    (native.repack_split). Blocks ordered Y, U, V.
    """
    h, w = y.shape
    if _use_packed(precision, h, w):
        return _compress_words_packed(y, u, v, qt_y, qt_u, qt_v,
                                      1, h, w, cont)
    by = kdev.plane_to_blocks(y)
    bu = kdev.plane_to_blocks(u)
    bv = kdev.plane_to_blocks(v)
    ny, nc = by.shape[0], bu.shape[0]
    coeffs = jnp.concatenate([
        _fwd_transform(by.reshape(ny, 64), qt_y, precision),
        _fwd_transform(bu.reshape(nc, 64), qt_u, precision),
        _fwd_transform(bv.reshape(nc, 64), qt_v, precision)])
    words, aT, sizes, ok = _encode_words_dispatch(coeffs)
    return _dense_from_words(words, aT, sizes, jnp.all(ok), cont)


def _chunk_rows(sizes):
    """16-byte rows each chunk occupies in the aligned interchange."""
    return (sizes + 4 * ALIGN_W - 1) // (4 * ALIGN_W)


def _b_maps(sizes_r, npad: int, capb: int):
    """Global stream-compaction maps for the B region: per-block
    CONTINUATION row counts (rows beyond the one held in A) fed to the
    generic ``_row_maps``."""
    n = sizes_r.shape[0]
    ovf = jnp.maximum(sizes_r.astype(jnp.int32) - 1, 0)
    if npad != n:
        ovf = jnp.concatenate([ovf, jnp.zeros(npad - n, jnp.int32)])
    return _row_maps(ovf, npad, capb)


def _row_maps(rows, npad: int, capb: int):
    """Generic global stream-compaction maps.

    For each compacted stream row p (stream order, capacity ``capb``
    rows) returns (src_block [capb] — the owning block id in [0, npad),
    r0 [capb] — its 0-based row index within the block, total — the
    live row count). ``rows`` [npad] i32 is the per-block row count.
    Rows p >= total carry garbage ids (callers clamp/drop).

    Scatter/gather economics: one nseg-index scatter (segment start
    marks -> cumsum -> per-row segment), one capb-element gather of the
    segment offsets, one capb-row gather of the per-segment inclusive
    row cumsums, then a 64-wide searchsorted per row — every cost is
    O(capb + nseg), never O(N)."""
    nseg = npad // SEG
    cumS = jnp.cumsum(rows.reshape(nseg, SEG), axis=1)  # [nseg, SEG] incl
    seg_tot = cumS[:, -1]
    soffs = jnp.cumsum(seg_tot) - seg_tot               # [nseg] exclusive
    total = soffs[-1] + seg_tot[-1]
    # owning segment per row: start marks (duplicates at empty segments
    # are fine — add accumulates, cumsum-1 lands on the owner)
    mark = jnp.zeros((capb,), jnp.int32).at[soffs].add(
        1, mode="drop", indices_are_sorted=True)
    seg_of = jnp.cumsum(mark) - 1                       # [capb]
    q = jnp.arange(capb, dtype=jnp.int32) - soffs[seg_of]
    cum_rows = cumS[seg_of]                             # [capb, SEG]
    qc = q[:, None]
    blockin = jnp.sum((cum_rows <= qc).astype(jnp.int32), axis=1)
    iota64 = jnp.arange(SEG, dtype=jnp.int32)[None, :]
    off_own = jnp.sum(
        jnp.where(iota64 == blockin[:, None] - 1, cum_rows, 0), axis=1)
    return seg_of * SEG + blockin, q - off_own, total


def _a_to_packed(aT):
    """Flat A region [8, n] word-major -> packed-8 [64, ceil8(n)] (the
    decoder's W0 window layout: row 8w + r = word w of block 8c + r).
    Pad blocks carry the minimal valid all-zero-block chunk."""
    from ..entropy.pallas_decode import _FILLER_W0

    n = aT.shape[1]
    pad = (-n) % 8
    if pad:
        fill = jnp.zeros((8, pad), jnp.int32).at[0].set(_FILLER_W0)
        aT = jnp.concatenate([aT, fill], axis=1)
    n8 = aT.shape[1] // 8
    return aT.reshape(8, n8, 8).transpose(0, 2, 1).reshape(64, n8)


def _compact_split(wordsC, A, sizes, ok, capb8_pb: int = CAPB8_DEFAULT):
    """(wordsC [>=N, cont] block-major continuation words, A region) ->
    (contentA [64, ceil8(N)] packed-8, contentB [capb*8] i32
    stream-compacted, sizes, total bytes, ok).

    ``A`` arrives either packed-8 [64, *] (the Pallas encoder emits the
    decoder's W0 layout directly — pass-through) or word-major [8, N]
    (the flat/CPU encoders — one relayout). B gathers the live
    continuation rows back to back in block order — ~capb indices, and
    capb hugs the global average instead of a per-segment worst case.
    ``cont`` (8 or 56 words) is the encoder's emission tier; chunks
    beyond it were already flagged in ok. ``wordsC`` may carry trailing
    pad-block rows (the packed encoder's tile padding) — never
    gathered."""
    sizes = sizes.astype(jnp.int32)
    sizes_r = _chunk_rows(sizes)
    total = jnp.sum(sizes)
    crows = wordsC.shape[1] // ALIGN_W
    contentA = A if A.shape[0] == 64 else _a_to_packed(A)
    # the padded block count derives from the A width on BOTH
    # interchange sides, so contentA crosses without any copy
    npad = -(-contentA.shape[1] * 8 // SEG) * SEG
    capb = capb_total(npad, capb8_pb)
    src_block, r0, totb = _b_maps(sizes_r, npad, capb)
    gsrc = jnp.clip(src_block, 0, npad - 1) * crows \
        + jnp.clip(r0, 0, crows - 1)
    rows = wordsC.reshape(-1, ALIGN_W)
    B = rows[jnp.clip(gsrc, 0, rows.shape[0] - 1)]
    return (contentA, B.reshape(-1), sizes, total, ok & (totb <= capb))


def _decode_idct_packed(W0, Wc, qt_y, qt_u, qt_v, ny: int, nc: int,
                        b: int, h: int, w: int,
                        fused: bool | None = None):
    """Packed window words -> (y, u, v, ok[n]) via the FUSED Huffman
    payload decode + dequantize + IDCT kernel (the message-order
    coefficient canvas lives only in VMEM; the kernel emits pixel QUAD
    WORDS [128, NTP], 4 px/i32), so the only relayout in the whole
    decompress is the final word->plane move at information density.
    PLANE-MAJOR block order ([all Y | all U | all V], frames contiguous
    within each region). Requires ny, nc divisible by 8."""
    from ..entropy import pallas_decode8 as pd8
    from ..kernels import pallas_dct8 as p8
    n = b * (ny + 2 * nc)
    qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
    by8 = b * ny // 8
    bc8 = b * nc // 8
    pids = p8.plane_pids(b * ny, b * nc, W0.shape[1] - n // 8)
    # ``fused`` defaults to the MYYUV_DEC8_FUSED env read; tools pass it
    # explicitly so BOTH decode variants get on-device coverage
    # (ADVICE r4: tools/check_tpu_frame.py exercises each setting)
    if DEC8_FUSED if fused is None else fused:
        pixw, ok = pd8.decode_idct_words8_split_fused(W0, Wc, qtx, pids)
    else:
        pixw, ok = pd8.decode_idct_words8_split(W0, Wc, qtx, pids)
    y = p8.unpack_pixel_words(pixw[:, :by8], b * h, w)
    # U and V unpack as one row-stacked plane (mirror of the pack side)
    uvp = p8.unpack_pixel_words(pixw[:, by8:by8 + 2 * bc8],
                                2 * b * (h // 2), w // 2)
    u = uvp[:b * (h // 2)]
    v = uvp[b * (h // 2):]
    if b > 1:
        y = y.reshape(b, h, w)
        u = u.reshape(b, h // 2, w // 2)
        v = v.reshape(b, h // 2, w // 2)
    return y, u, v, ok[:n]


def _decode_words8_dispatch(W0, Wc, n: int):
    """Two-region packed windows (W0 [64, NP], Wc [(cw-8)*8, NP]) ->
    ([n, 64] i16, [n] ok).

    Packed Pallas kernels on TPU; on CPU the words unpack back to the
    flat layout and run the XLA v1 decoder so tests cover the same
    graph shape everywhere."""
    import jax

    if jax.default_backend() not in ("cpu",):
        from ..entropy import pallas_decode8
        out, ok = pallas_decode8._decode8_raw(
            W0, Wc, False, pallas_decode8.TILE)
        ntp = out.shape[1]
        from ..entropy.pallas_decode8 import _IZZ
        m = out[:512].reshape(64, 8, ntp).transpose(2, 1, 0).reshape(
            ntp * 8, 64)
        return m[:, _IZZ].astype(jnp.int16)[:n], (
            ok.T.reshape(ntp * 8)[:n] != 0)
    wordsp = jnp.concatenate([W0, Wc], axis=0)
    cw8, np8 = wordsp.shape
    words = wordsp.reshape(cw8 // 8, 8, np8).transpose(0, 2, 1).reshape(
        cw8 // 8, np8 * 8)
    coeffs, ok = _decode_words_dispatch(words)
    return coeffs[:n], ok[:n]


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "precision", "fused"))
def decompress_frame(contentA: jnp.ndarray, contentC: jnp.ndarray,
                     sizes: jnp.ndarray,
                     qt_y: jnp.ndarray, qt_u: jnp.ndarray,
                     qt_v: jnp.ndarray, h: int, w: int,
                     precision: str = "exact",
                     fused: bool | None = None):
    """Full-frame on-chip decompress of the dense two-region interchange
    -> (y, u, v, ok).

    (contentA, contentC) ARE the decode kernels' (W0, Wc) window regions
    — no expansion stage at all. The window capacity cw = 8 +
    contentC rows / 8 words per block; chunks beyond it flip ok False
    (the encoder already flagged them at compress time).
    """
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    sizes = sizes.astype(jnp.int32)
    sizes_r = _chunk_rows(sizes)
    cw = 8 + contentC.shape[0] // 8
    W0, Wc = contentA, contentC
    if (precision == "exact" and ny % 8 == 0 and nc % 8 == 0
            and jax.default_backend() not in ("cpu",)):
        y, u, v, ok = _decode_idct_packed(
            W0, Wc, qt_y, qt_u, qt_v, ny, nc, 1, h, w, fused=fused)
        return y, u, v, jnp.all(ok & (sizes_r <= cw // ALIGN_W))
    coeffs, ok = _decode_words8_dispatch(W0, Wc, ny + 2 * nc)
    ok = ok & (sizes_r <= cw // ALIGN_W)
    py = _inv_transform(coeffs[:ny], qt_y, precision)
    pu = _inv_transform(coeffs[ny:ny + nc], qt_u, precision)
    pv = _inv_transform(coeffs[ny + nc:], qt_v, precision)
    y = kdev.blocks_to_plane(py.reshape(ny, 8, 8), h, w)
    u = kdev.blocks_to_plane(pu.reshape(nc, 8, 8), h // 2, w // 2)
    v = kdev.blocks_to_plane(pv.reshape(nc, 8, 8), h // 2, w // 2)
    return y, u, v, jnp.all(ok)


# ---------------------------------------------------------------------------
# Batched multi-frame API: B frames per executable
# ---------------------------------------------------------------------------
#
# The reference's throughput story is one image at a time (myyuv_cli); the
# TPU-native story is a batch axis: B frames' blocks concatenate into one
# block tensor so dispatch, layout changes and kernel launches amortize
# across the batch (BASELINE.json config 3: batched synthetic 1080p).
# Block order is PLANE-MAJOR across the batch ([all Y | all U | all V],
# frames contiguous within each plane region): each plane stack packs as
# one tall plane with zero per-frame slicing; batch_streams_split maps
# (frame, plane) segments with plain index arithmetic.


@functools.partial(jax.jit, static_argnames=("precision", "cont"))
def compress_batch(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                   qt_y: jnp.ndarray, qt_u: jnp.ndarray, qt_v: jnp.ndarray,
                   precision: str = "exact",
                   cont: int = CONT_DEFAULT):
    """[B, H, W] (+2x [B, H/2, W/2]) u8 -> (contentA, contentC, sizes
    [B*Nf], total bytes, ok) — the whole batch compressed on-chip in one
    executable (dense two-region interchange)."""
    b, h, w = y.shape
    if _use_packed(precision, h, w):
        return _compress_words_packed(y, u, v, qt_y, qt_u, qt_v,
                                      b, h, w, cont)
    by = kdev.plane_to_blocks(y)                 # [B, ny, 8, 8]
    bu = kdev.plane_to_blocks(u)
    bv = kdev.plane_to_blocks(v)
    ny, nc = by.shape[1], bu.shape[1]
    cy = _fwd_transform(by.reshape(b * ny, 64), qt_y, precision)
    cu = _fwd_transform(bu.reshape(b * nc, 64), qt_u, precision)
    cv = _fwd_transform(bv.reshape(b * nc, 64), qt_v, precision)
    # plane-major block order, matching the packed route
    coeffs = jnp.concatenate([cy, cu, cv])
    words, aT, sizes, ok = _encode_words_dispatch(coeffs)
    return _dense_from_words(words, aT, sizes, jnp.all(ok), cont)


@functools.partial(jax.jit,
                   static_argnames=("b", "h", "w", "precision"))
def decompress_batch(contentA: jnp.ndarray, contentC: jnp.ndarray,
                     sizes: jnp.ndarray,
                     qt_y: jnp.ndarray, qt_u: jnp.ndarray,
                     qt_v: jnp.ndarray, b: int, h: int, w: int,
                     precision: str = "exact"):
    """Batch dense interchange -> ([B, H, W], 2x [B, H/2, W/2], ok)."""
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    sizes = sizes.astype(jnp.int32)
    sizes_r = _chunk_rows(sizes)
    cw = 8 + contentC.shape[0] // 8
    W0, Wc = contentA, contentC
    if (precision == "exact" and ny % 8 == 0 and nc % 8 == 0
            and jax.default_backend() not in ("cpu",)):
        y, u, v, ok = _decode_idct_packed(
            W0, Wc, qt_y, qt_u, qt_v, ny, nc, b, h, w)
        return y, u, v, jnp.all(ok & (sizes_r <= cw // ALIGN_W))
    coeffs, ok = _decode_words8_dispatch(W0, Wc, b * (ny + 2 * nc))
    ok = ok & (sizes_r <= cw // ALIGN_W)
    # plane-major block order, matching the packed route
    py = _inv_transform(coeffs[:b * ny], qt_y, precision)
    pu = _inv_transform(coeffs[b * ny:b * (ny + nc)], qt_u, precision)
    pv = _inv_transform(coeffs[b * (ny + nc):], qt_v, precision)
    y = kdev.blocks_to_plane(py.reshape(b, ny, 8, 8), h, w)
    u = kdev.blocks_to_plane(pu.reshape(b, nc, 8, 8), h // 2, w // 2)
    v = kdev.blocks_to_plane(pv.reshape(b, nc, 8, 8), h // 2, w // 2)
    return y, u, v, jnp.all(ok)


@functools.partial(jax.jit, static_argnames=("precision", "cont"))
def roundtrip_frame(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                    qt_y: jnp.ndarray, qt_u: jnp.ndarray,
                    qt_v: jnp.ndarray, precision: str = "exact",
                    cont: int = CONT_DEFAULT):
    """Whole compress+decompress roundtrip as ONE executable ->
    (ry, ru, rv, total bytes, ok) — the transcode/RD-loop entry
    (quality evaluation runs exactly this shape), and one device
    dispatch instead of two (each launch costs ~1.9 ms through a
    tunneled/remote link)."""
    h, w = y.shape
    cA, cC, sizes, total, ok = compress_frame(
        y, u, v, qt_y, qt_u, qt_v, precision=precision, cont=cont)
    ry, ru, rv, dok = decompress_frame(
        cA, cC, sizes, qt_y, qt_u, qt_v, h=h, w=w, precision=precision)
    return ry, ru, rv, total, ok & dok


@functools.partial(jax.jit, static_argnames=("precision", "cont"))
def roundtrip_scan(ys, us, vs, qt_y, qt_u, qt_v,
                   precision: str = "exact", cont: int = CONT_DEFAULT):
    """K whole-frame roundtrips in ONE executable via ``lax.scan`` over
    stacked frames ([K, H, W] / [K, H/2, W/2] x2) -> (totals [K] i64,
    ok [K] bool).

    Each scan iteration runs the SAME frame-geometry codec body (no
    cross-frame padding — the failure mode of the concatenated 4K
    batch, PERF_NOTES round-3 negative results), so K frames cost one
    host dispatch. This is the honest chip-bound sustained number on
    links where per-execute dispatch is expensive; recon planes stay
    in the loop body (transcode/RD semantics, like
    streaming.roundtrip_stream)."""
    def body(carry, fr):
        y, u, v = fr
        _ry, _ru, _rv, total, ok = roundtrip_frame(
            y, u, v, qt_y, qt_u, qt_v, precision=precision, cont=cont)
        return carry, (total, ok)

    _, (totals, oks) = jax.lax.scan(body, jnp.int32(0), (ys, us, vs))
    return totals, oks


def roundtrip_batch(y, u, v, qtables, precision: str = "exact"):
    """On-chip roundtrip of a [B, ...] frame batch; returns device arrays
    (recon planes, total compressed bytes, ok)."""
    b, h, w = y.shape
    cA, cB, sizes, total, ok = compress_batch(
        y, u, v, *qtables, precision=precision)
    ry, ru, rv, dok = decompress_batch(
        cA, cB, sizes, *qtables, b=b, h=h, w=w, precision=precision)
    return (ry, ru, rv), total, ok & dok


def batch_streams_split(sizes_np: np.ndarray, packed: np.ndarray,
                        b: int, ny: int, nc: int):
    """Split a batch's packed bytes into per-frame [(sizes, content) x3].

    Batch block order is PLANE-MAJOR ([all Y | all U | all V], frames
    contiguous within each plane region)."""
    boffs = np.cumsum(sizes_np.astype(np.int64)) - sizes_np
    frames = [[] for _ in range(b)]
    pbase = 0
    for npl in (ny, nc, nc):
        for f in range(b):
            lo = pbase + f * npl
            s = sizes_np[lo:lo + npl]
            base = int(boffs[lo])
            frames[f].append(
                (s.astype(np.uint8),
                 packed[base:base + int(s.astype(np.int64).sum())]))
        pbase += b * npl
    return frames


@functools.partial(jax.jit, static_argnames=("capb8_pb",))
def _compact_c(contentA, contentC, sizes, capb8_pb: int):
    """Gather region C's live continuation rows before a host pull ->
    (contentB [capb*8] i32, ok) — the compacted artifact-side B region,
    what native.repack_split consumes. Runs only on the host-facing
    stream APIs — the pure device roundtrip never compacts. ``ok`` is
    the device-side capacity check; callers assert it so a divergence
    between _capb_tier's host arithmetic and _b_maps can never silently
    truncate the pulled stream."""
    from ..kernels.pallas_dct8 import unpack_rows8
    c_bm = unpack_rows8(contentC)
    _, cB, _, _, ok = _compact_split(c_bm, contentA, sizes,
                                     jnp.bool_(True), capb8_pb)
    return cB, ok


# PULL-LEAN stream compaction tiers for the streaming driver
# (engine/streaming.py): average words per block * 8. The dense A+C
# regions carry ~3x the live bytes; on a tunneled/narrow d2h link the
# pull IS the streaming budget, so the device gathers the exact live
# words (4-byte granularity) before the transfer. 32 = 16 B/block avg
# (golden q50 needs ~13.7), 96 = 48 B (q90-class), 512 = the 255-byte
# format maximum.
CAPW8_DEFAULT = 32
CAPW8_MID = 96
CAPW8_ROOMY = 512
CAPW8_LADDER = (CAPW8_DEFAULT, CAPW8_MID, CAPW8_ROOMY)


@functools.partial(jax.jit, static_argnames=("capw8",))
def _compact_stream_words(contentA, contentC, sizes, ok, capw8: int):
    """Dense two-region interchange -> (words [capw] i32 — the EXACT
    live stream words back to back in block order, each chunk padded to
    a word boundary; sizes_u8 [N]; ok) for a pull-lean d2h transfer.

    The host finishes with native.repack_words(words[:totw], sizes,
    align=1) — a linear byte squeeze. The gather is O(capw) element
    indices via the same segment machinery as the B-region compaction
    (_row_maps); capw = npad * capw8 // 8."""
    sizes = sizes.astype(jnp.int32)
    n = sizes.shape[0]
    n8 = contentA.shape[1]
    npad = -(-n8 * 8 // SEG) * SEG
    capw = max(npad * capw8 // 8, 1)
    rows = (sizes + 3) // 4                  # words per chunk
    if npad != n:
        rows = jnp.concatenate([rows, jnp.zeros(npad - n, jnp.int32)])
    src_block, r0, totw = _row_maps(rows, npad, capw)
    W = jnp.concatenate([contentA, contentC], axis=0)   # [cw*8, n8]
    cw = W.shape[0] // 8
    b = jnp.clip(src_block, 0, n8 * 8 - 1)
    w = jnp.clip(r0, 0, cw - 1)
    words = W[8 * w + b % 8, b // 8]
    return (words, sizes.astype(jnp.uint8),
            ok & (totw <= capw) & jnp.all(sizes <= 4 * cw))


def _capb_tier(sizes_np: np.ndarray, ntp: int) -> int:
    """Smallest pull-compaction tier covering the stream's live
    continuation rows — picked from HOST-VISIBLE stats, so the pull
    never ladder-walks (cannot fail for format-legal <=255 B chunks)."""
    sizes_r = (sizes_np.astype(np.int64) + 4 * ALIGN_W - 1) \
        // (4 * ALIGN_W)
    totb = int(np.maximum(sizes_r - 1, 0).sum())
    npad = -(-ntp * 8 // SEG) * SEG
    for t in CAPB8_LADDER:
        if totb <= capb_total(npad, t):
            return t
    raise BitstreamError("stream larger than device capacity")


def _pull_packed_stream(cA, cC, sizes, sizes_np: np.ndarray) -> np.ndarray:
    """(device interchange, host sizes) -> exact packed byte stream."""
    from .. import native
    tier = _capb_tier(sizes_np, cA.shape[1])
    cB, ok = _compact_c(cA, cC, sizes, tier)
    if not bool(ok):
        raise BitstreamError("pull compaction overflowed its tier")
    aT_np, b_np = pull_split(cA, cB)
    return native.repack_split(aT_np, b_np, sizes_np)


def compress_batch_to_streams(planes_np, qtables_np,
                              precision: str = "exact"):
    """Host API: batched planes -> per-frame stream lists (file layout)."""
    y, u, v = [np.ascontiguousarray(p) for p in planes_np]
    b, h, w = y.shape
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    cA = cC = sizes = None
    for cont in CONT_LADDER:
        cA, cC, sizes, total, ok = compress_batch(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            *[jnp.asarray(q) for q in qtables_np], precision=precision,
            cont=cont)
        if bool(ok):
            break
    else:
        raise BitstreamError("device compress overflow/failure")
    sizes_np = np.asarray(sizes).astype(np.int32)
    packed = _pull_packed_stream(cA, cC, sizes, sizes_np)
    return batch_streams_split(sizes_np, packed, b, ny, nc)


# ---------------------------------------------------------------------------
# Host-facing helpers (pull/push with bounded shape variants)
# ---------------------------------------------------------------------------


def pull_split(contentA_dev: jnp.ndarray, contentB_dev: jnp.ndarray):
    """Pull the split-stream artifact -> (a i32 [64, ceil8(N)] packed-8
    W0 layout, b i32 [nseg*slots, 8] segment-padded)."""
    a = np.asarray(contentA_dev)
    b = np.asarray(contentB_dev).reshape(-1, ALIGN_W)
    return a, b


def _split_planes(sizes_np, packed, ny, nc):
    out = []
    pos = 0
    for lo, hi in ((0, ny), (ny, ny + nc), (ny + nc, ny + 2 * nc)):
        s = sizes_np[lo:hi]
        t = int(s.astype(np.int64).sum())
        out.append((s.astype(np.uint8), packed[pos: pos + t]))
        pos += t
    return out


def compress_frame_to_streams(planes_np, qtables_np,
                              precision: str = "exact",
                              cont0: int | None = None):
    """Host API: (y, u, v) planes -> [(sizes u8, content u8)] per plane.

    Compacts region C's live continuation rows on device, pulls
    (A + live B rows) and repacks to the exact on-disk layout in one
    native pass. ``cont0`` pre-picks the emission tier (callers that
    know the quality pass CONT_MID for q >= QUALITY_MID_TIER, skipping
    the default-tier attempt and its compile — VERDICT r2 #7)."""
    h, w = planes_np[0].shape
    ny = (h // 8) * (w // 8)
    nc = (h // 16) * (w // 16)
    ladder = CONT_LADDER if cont0 is None else tuple(
        t for t in CONT_LADDER if t >= cont0)
    cA = cC = sizes = None
    for cont in ladder:
        cA, cC, sizes, total, ok = compress_frame(
            jnp.asarray(planes_np[0]), jnp.asarray(planes_np[1]),
            jnp.asarray(planes_np[2]),
            *[jnp.asarray(q) for q in qtables_np],
            precision=precision, cont=cont)
        if bool(ok):
            break
    else:
        raise BitstreamError("device compress overflow/failure")
    sizes_np = np.asarray(sizes).astype(np.int32)
    packed = _pull_packed_stream(cA, cC, sizes, sizes_np)
    return _split_planes(sizes_np, packed, ny, nc)


def _dense_c_np(b_np: np.ndarray, sizes_np: np.ndarray,
                cont: int) -> np.ndarray:
    """Compacted live continuation rows -> dense region C
    [cont*8, ceil8(N)] (the decoder's Wc window layout) in numpy — the
    upload direction of the host boundary (h2d is the fast tunnel
    direction, so expansion happens before the transfer)."""
    n = sizes_np.size
    n8 = (n + 7) // 8
    sizes_r = (sizes_np.astype(np.int64) + 4 * ALIGN_W - 1) \
        // (4 * ALIGN_W)
    nbr = np.maximum(sizes_r - 1, 0)
    totb = int(nbr.sum())
    c_bm = np.zeros((n8 * 8, cont), np.int32)
    if totb:
        rows = np.ascontiguousarray(b_np).reshape(-1, ALIGN_W)[:totb]
        src = np.repeat(np.arange(n), nbr)
        boffs = np.cumsum(nbr) - nbr
        r0 = (np.arange(totb) - boffs[src]).astype(np.int64)
        for j in range(int(r0.max()) + 1):
            m = r0 == j
            c_bm[src[m], ALIGN_W * j:ALIGN_W * (j + 1)] = rows[m]
    return np.ascontiguousarray(
        c_bm.T.reshape(cont, n8, 8).transpose(0, 2, 1).reshape(
            cont * 8, n8))


def decompress_streams_to_frame(streams, qtables_np, h: int, w: int,
                                precision: str = "exact",
                                fused: bool | None = None):
    """Host API: per-plane (sizes, content) -> (y, u, v) uint8 planes."""
    from .. import native
    sizes_np = np.concatenate([s.astype(np.int32) for s, _ in streams])
    content_np = np.concatenate([c for _, c in streams])
    maxsz = int(sizes_np.max(initial=0))
    cont = next(t for t in CONT_LADDER if maxsz <= 4 * (8 + t))
    aT_np, b_np = native.expand_split(content_np, sizes_np)
    c_np = _dense_c_np(b_np, sizes_np, cont)
    y, u, v, ok = decompress_frame(
        jnp.asarray(aT_np), jnp.asarray(c_np), jnp.asarray(sizes_np),
        *[jnp.asarray(q) for q in qtables_np], h=h, w=w,
        precision=precision, fused=fused)
    if not bool(ok):
        raise BitstreamError("Huffman bad code (device decode)")
    return np.asarray(y), np.asarray(u), np.asarray(v)
