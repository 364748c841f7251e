"""Sublane-packed Pallas Huffman decoder: 8 blocks per lane column.

Round-2 successor of entropy/pallas_decode.py (same stream space, same
reference semantics: Huffman.cpp:105-154,243-277). Three structural
changes, each removing a measured bottleneck of the [1, TILE] kernels:

1. **Packing**: every per-block register is [8, TP] — 8 blocks share a
   lane column, so the (8, 128) vregs that the [1, TILE] layout filled
   to 1/8 are dense. Block b of a tile maps to (sublane r = b % 8,
   lane c = b // 8). Measured 2.1x on the consume chain alone
   (tools/exp_sublane.py) before the other changes.
2. **Refill every 3rd step**: the 64-bit lookahead window loses at most
   8 bits per symbol step, and a refill tops it up to > 32 valid bits,
   so the one-hot word refill (the packed layout's dominant cost, CW
   unrolled group selects) only needs to run once per 3 steps.
3. **Uniform-row dynamic-slice stores**: the symbol-step counter is the
   same for every lane, so decoded symbols store to ``out_ref[pl.ds(
   8*p, 8)]`` — O(1) vector stores instead of the [64, TILE] one-hot
   canvas blend per step. The same trick stores the parsed tree symbols
   at the (uniform) parse-step row. Zigzag un-permutation moves to the
   XLA side as a static column gather fused into the output transpose.

The table lookup also drops its per-row key compare: tree groups arrive
in canonical (code length ascending) order — enforced with a per-step
non-decreasing check that flags violators bad — so the symbol for
(length L, rank idx) lives at table row cumbase[L] + idx, a computed
row index read through a one-hot over PAIRED rows (two 11-bit symbols
per word halve the scan height).

Validity semantics are identical to pallas_decode: bad trees (group
overrun, section size mismatch, non-canonical group order), out-of-table
codes, and payload length mismatches flag ok=False per block; callers
fall back to the host decoder.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reference import ZIGZAG
from .pallas_decode import _bitrev8, _bitrev11, _shl, _shr_l, _FILLER_W0
from .pallas_encode8 import _ortree

I32 = jnp.int32
# lane columns per grid program (8 blocks each)
TILE = int(os.environ.get("MYYUV_DEC8_TILE", "512"))
# inverse zigzag: symbols decode in message order p, coefficient row is
# ZIGZAG[p]; the output gather uses the inverse permutation
_IZZ = np.argsort(np.asarray(ZIGZAG, np.int64)).astype(np.int32)


def _consume_nr(state, s):
    """Advance the 64-bit window by s (<= 24) bits, NO refill."""
    W0, W1, valid, widx = state
    W0 = _shl(W0, s) | _shr_l(W1, 32 - s)
    W1 = _shl(W1, s)
    return W0, W1, valid - s, widx


def _refill(state, R, cw):
    """One refill: if <= 32 valid bits remain, pull the next word.

    R is the packed word file [cw*8, TP]; the read is a one-hot over
    the cw row groups (widx past the end reads 0), combined as a
    BALANCED OR tree — the left-deep chain was latency-bound
    (PERF_NOTES round 5)."""
    W0, W1, valid, widx = state
    need = valid <= 32
    V = _ortree([jnp.where(widx == w, R[8 * w:8 * w + 8], 0)
                 for w in range(cw)])
    V = jnp.where(need, V, 0)
    W0 = W0 | jnp.where(need, _shr_l(V, valid), 0)
    W1 = W1 | jnp.where(need, _shl(V, 32 - valid), 0)
    valid = valid + jnp.where(need, 32, 0)
    widx = widx + need.astype(I32)
    return W0, W1, valid, widx


def _read_group(R, cw, widx):
    """One-hot read of word row-group widx -> [8, TP] (balanced OR)."""
    return _ortree([jnp.where(widx == w, R[8 * w:8 * w + 8], 0)
                    for w in range(cw)])


def _tree_body(w0_ref, wc_ref, sym2_ref, counts_ref, bad_ref,
               rec_ref):
    """Packed flat tree parse (kernel body; output refs may be HBM
    outputs — _tree_kernel8 — or VMEM scratch — the fused
    decode+IDCT kernel).

    w0 [64, TP] + wc [(CW-8)*8, TP] packed stream words (the split-stream
    interchange's two window regions — concatenated IN VMEM so the XLA
    side never materializes the joined window) -> sym2 [256, TP] (paired
    11-bit symbol values: rows 8p..8p+7 hold symbols 2p | 2p+1 << 16),
    counts [72, TP] (9 groups of per-length symbol counts), bad [8, TP].
    rec is VMEM scratch for the unpaired symbol rows. The 3 header bytes
    (enc_bits, tree_size) decode from word 0 IN the kernel — no XLA-side
    meta slices."""
    R = jnp.concatenate([w0_ref[...], wc_ref[...]], axis=0)
    cw = (w0_ref.shape[0] + wc_ref.shape[0]) // 8
    tree_size = _bitrev8(_shr_l(R[0:8], 8) & 0xFF)
    tree_bits = tree_size * 8

    # window starts after the 3 header bytes; valid = 40 >= 27 invariant
    st = (R[0:8], R[8:16], jnp.full_like(tree_size, 64),
          jnp.full_like(tree_size, 2))
    st = _consume_nr(st, jnp.full_like(tree_size, 24))
    st = _refill(st, R, cw)

    zero = jnp.zeros_like(tree_size)

    def step(t, carry):
        st, g_rem, cur_len, consumed, counts, bad = carry
        # open a new group when the current is exhausted and bytes remain
        pad = (8 - (consumed & 7)) & 7
        more = (g_rem == 0) & (consumed + pad < tree_bits)
        st = _consume_nr(st, jnp.where(more, pad, 0))
        hdr = _bitrev8(_shr_l(st[0], 24) & 0xFF)
        st = _consume_nr(st, jnp.where(more, 8, 0))
        new_len = (hdr >> 5) + 1
        # canonical streams list groups in ascending code-length order;
        # the computed-row lookup in the payload kernel depends on it
        bad = bad | (more & (new_len < cur_len)).astype(I32)
        cur_len = jnp.where(more, new_len, cur_len)
        g_rem = jnp.where(more, (hdr & 31) + 1, g_rem)
        consumed = jnp.where(more, consumed + pad + 8, consumed)
        # one symbol per step while inside a group; every lane stores at
        # the UNIFORM row t (idle lanes store 0, never read back: the
        # payload's computed row is always < that block's symbol count)
        take = g_rem > 0
        v11 = _bitrev11(_shr_l(st[0], 21) & 0x7FF)
        rec_ref[pl.ds(t * 8, 8), :] = jnp.where(take, v11, 0)
        counts = [counts[0]] + [
            counts[l] + (take & (cur_len == l)).astype(I32)
            for l in range(1, 9)]
        g_rem = g_rem - take.astype(I32)
        consumed = consumed + jnp.where(take, 11, 0)
        st = _consume_nr(st, jnp.where(take, 11, 0))
        st = _refill(st, R, cw)
        return st, g_rem, cur_len, consumed, counts, bad

    def step4(t4, carry):
        # FOUR parse steps per trip (round 5): the loop is
        # latency-bound on per-trip overhead (PERF_NOTES round-5 LUT
        # finding), and extra trailing steps are no-ops (g_rem == 0
        # and no bytes left => more = take = False; their zero stores
        # are what the blank loop writes anyway; t <= 4*16 - 1 = 63)
        for j in range(4):
            carry = step(4 * t4 + j, carry)
        return carry

    # trip count: one symbol stored per step, tree_bits >= 8 + 11*n_sym
    steps = jnp.max(jnp.clip((tree_bits - 8) // 11, 0, 64))
    carry = (st, zero, zero, zero, [zero] * 9, zero)
    st, g_rem, cur_len, consumed, counts, bad = jax.lax.fori_loop(
        0, (steps + 3) // 4, step4, carry)
    # zero the symbol rows beyond the loop bound (sym2 pairs read them)
    def blank(t, _):
        rec_ref[pl.ds(t * 8, 8), :] = zero
        return 0
    jax.lax.fori_loop(steps, 64, blank, 0)

    consumed = consumed + ((8 - (consumed & 7)) & 7)
    bad = bad | (g_rem > 0).astype(I32) | (consumed != tree_bits).astype(I32)

    rec = rec_ref[...]
    even = jnp.concatenate([rec[16 * p:16 * p + 8] for p in range(32)],
                           axis=0)
    odd = jnp.concatenate([rec[16 * p + 8:16 * p + 16] for p in range(32)],
                          axis=0)
    sym2_ref[...] = even | (odd << 16)
    counts_ref[...] = jnp.concatenate(counts, axis=0)
    bad_ref[...] = bad


def _tree_kernel8(w0_ref, wc_ref, sym2_ref, counts_ref, bad_ref,
                  rec_ref):
    """Standalone tree-parse kernel (see _tree_body)."""
    _tree_body(w0_ref, wc_ref, sym2_ref, counts_ref, bad_ref, rec_ref)


def _fused_decode_idct_kernel8(w0_ref, wc_ref, qt_ref, pid_ref,
                               pix_ref, ok_ref, rec_scr, sym2_scr,
                               counts_scr, bad_scr, oscr):
    """Whole decompress in ONE kernel: tree parse -> payload decode ->
    dequantize+IDCT, with the (sym2, counts, bad) tree tables living
    only in VMEM scratch (the two-kernel pipeline writes + re-reads
    them through HBM, and reads the (W0, Wc) window twice)."""
    from ..kernels.pallas_dct8 import _idct_words, _qt_select
    _tree_body(w0_ref, wc_ref, sym2_scr, counts_scr, bad_scr, rec_scr)
    ok_ref[...] = _payload_body(w0_ref, wc_ref, sym2_scr, counts_scr,
                                bad_scr, oscr)
    pix_ref[...] = _idct_words(oscr[0:512, :], _qt_select(qt_ref, pid_ref))


def _payload_body(w0_ref, wc_ref, sym2_ref, counts_ref,
                  tbad_ref, out_ref):
    """Packed canonical payload decode, 3-step groups -> ok [8, TP].

    out_ref [528, TP] (an output ref or VMEM scratch): rows 8p..8p+7
    hold message symbol p (zigzag order; consumers un-permute). 22
    groups of 3 steps cover the 64-symbol format bound; the while loop
    exits at the first group with no live lane. The 3 header bytes
    decode from word 0 in-kernel."""
    R = jnp.concatenate([w0_ref[...], wc_ref[...]], axis=0)
    cw = (w0_ref.shape[0] + wc_ref.shape[0]) // 8
    w0r = R[0:8]
    enc_bits = _bitrev8(_shr_l(w0r, 24) & 0xFF) \
        | (_bitrev8(_shr_l(w0r, 16) & 0xFF) << 8)
    tree_size = _bitrev8(_shr_l(w0r, 8) & 0xFF)
    counts = [counts_ref[8 * l:8 * l + 8, :] for l in range(9)]

    zero = jnp.zeros_like(enc_bits)
    # first_code[l+1] = (first_code[l] + count[l]) << 1;
    # cumbase[l] = symbols of length < l (= table row base)
    fc = [zero, zero]
    cb = [zero, zero]
    for l in range(1, 8):
        fc.append((fc[l] + counts[l]) << 1)
        cb.append(cb[l] + counts[l])
    n_sym = cb[8] + counts[8]
    # packed per-length record: fc << 16 | count << 8 | cumbase
    pk = [fc[l] << 16 | counts[l] << 8 | cb[l] for l in range(9)]
    nmax_sym = jnp.max(n_sym)

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # enter the stream at the byte-aligned payload offset
    bitoff = (3 + tree_size) * 8
    w0i = _shr_l(bitoff, 5)
    sh = bitoff & 31
    A = _read_group(R, cw, w0i)
    B = _read_group(R, cw, w0i + 1)
    W0 = _shl(A, sh) | _shr_l(B, 32 - sh)
    W1 = _shl(B, sh)
    st0 = (W0, W1, 64 - sh, w0i + 2)
    bad0 = tbad_ref[...]

    def run(sym_groups):
        def cond(carry):
            g, st, bitpos, bad = carry
            live = (bitpos < enc_bits) & (bad == 0)
            return (g < 22) & (jnp.max(live.astype(I32)) > 0)

        def group(carry):
            g, st, bitpos, bad = carry
            syms = []
            for j in range(3):
                W0 = st[0]
                active = (bitpos < enc_bits) & (3 * g + j < 64)
                peek = _shr_l(W0, 24) & 0xFF
                # canonical monotonicity: fc[L+1] = (fc[L]+cnt[L]) << 1
                # makes hit_L => hit_{L+1} for EVERY counts table the
                # parser can produce, so length = 9 - sum(hit_L) — a
                # balanced add tree instead of the 8-deep select chain
                # (and code is one variable shift off peek)
                hits = [(peek >> (8 - L) < fc[L] + counts[L])
                        .astype(I32) for L in range(1, 9)]
                while len(hits) > 1:
                    hits = [a + b for a, b in zip(hits[0::2],
                                                  hits[1::2])]
                length = 9 - hits[0]
                code = _shr_l(peek, jnp.clip(8 - length, 0, 8))
                rec = _ortree([jnp.where(length == L, pk[L], 0)
                               for L in range(1, 9)])
                idx = code - (rec >> 16)
                rt = (rec & 0xFF) + idx               # computed table row
                rt2 = rt >> 1
                s2 = _ortree([jnp.where(rt2 == gg,
                                        sym2_ref[8 * gg:8 * gg + 8, :],
                                        0) for gg in range(sym_groups)])
                v = jnp.where((rt & 1) > 0, _shr_l(s2, 16), s2) & 0x7FF
                sym = jnp.where(v >= 1024, v - 2048, v)
                ok_sym = (length <= 8) & (idx >= 0) \
                    & (idx < ((rec >> 8) & 0xFF)) \
                    & (bitpos + length <= enc_bits)
                write = active & ok_sym
                syms.append(jnp.where(write, sym, 0))
                bad = bad | (active & ~ok_sym).astype(I32)
                adv = jnp.where(write, length, 0)
                bitpos = bitpos + adv
                st = _consume_nr(st, adv)
            st = _refill(st, R, cw)
            out_ref[pl.ds(g * 24, 24), :] = jnp.concatenate(syms, axis=0)
            return g + 1, st, bitpos, bad

        def body(carry):
            # TWO 3-symbol groups per trip (round 5, latency-bound
            # loops): 22 groups = exactly 11 pairs, so the second
            # group's store row never exceeds 21; a group past the
            # stream is all-inactive (bitpos >= enc_bits masks every
            # step) and stores zeros to its own rows only
            return group(group(carry))

        _, st, bitpos, bad = jax.lax.while_loop(
            cond, body, (jnp.int32(0), st0, jnp.zeros_like(enc_bits), bad0))
        return bitpos, bad

    # sym2-scan tiers by tile-max distinct symbols: the one-hot table
    # read is sym_groups x 2 ops per symbol step, and q50/q90 tiles
    # rarely exceed 32 distinct symbols — the 32-symbol MID tier
    # (round 5) halves the scan for most tiles vs jumping straight
    # from 16 to the 64-symbol format bound
    bitpos, bad = jax.lax.cond(
        nmax_sym <= 16, lambda: run(8),
        lambda: jax.lax.cond(nmax_sym <= 32, lambda: run(16),
                             lambda: run(32)))
    bad = bad | (bitpos != enc_bits).astype(I32)
    return (bad == 0).astype(I32)


def _payload_kernel8(w0_ref, wc_ref, sym2_ref, counts_ref,
                     tbad_ref, out_ref, ok_ref):
    """Payload decode to an HBM coefficient canvas (see _payload_body)."""
    ok_ref[...] = _payload_body(w0_ref, wc_ref, sym2_ref,
                                counts_ref, tbad_ref, out_ref)


def _payload_idct_kernel8(w0_ref, wc_ref, sym2_ref, counts_ref,
                          tbad_ref, qt_ref, pid_ref, pix_ref, ok_ref,
                          oscr):
    """Fused payload decode + dequantize + IDCT: the [528, TP]
    message-order coefficient canvas lives only in VMEM scratch (the
    unfused pipeline writes + reads it through HBM — 72 MB/4K frame),
    and the kernel emits [128, TP] pixel quad words directly (reference
    semantics: Huffman.cpp:105-154 + DCT.cpp:325-365)."""
    from ..kernels.pallas_dct8 import _idct_words, _qt_select
    ok_ref[...] = _payload_body(w0_ref, wc_ref, sym2_ref,
                                counts_ref, tbad_ref, oscr)
    pix_ref[...] = _idct_words(oscr[0:512, :], _qt_select(qt_ref, pid_ref))


def pack8_rows(x: jnp.ndarray) -> jnp.ndarray:
    """[R, n] -> [R*8, n//8]: row w of block c*8+r lands at row w*8+r,
    column c. n must be a multiple of 8."""
    r, n = x.shape
    return x.reshape(r, n // 8, 8).transpose(0, 2, 1).reshape(r * 8, n // 8)


def _decode8_raw(W0: jnp.ndarray, Wc: jnp.ndarray, interpret: bool,
                 tile: int):
    """Shared kernel driver -> (out [528, NTP] i32, ok [8, NTP] i32).

    The window arrives as two regions (W0 [64, NP] = every chunk's first
    8 words, Wc [(CW-8)*8, NP] = the continuation words) that the
    kernels join in VMEM. NTP is NP padded up to the tile; out rows
    8p..8p+7 hold message symbol p for the 8 blocks of each lane column
    (zigzag order)."""
    np8 = W0.shape[1]
    cw8 = W0.shape[0] + Wc.shape[0]
    pad = (-np8) % tile
    if pad:
        fill0 = jnp.zeros((64, pad), I32).at[0:8, :].set(_FILLER_W0)
        W0 = jnp.concatenate([W0, fill0], axis=1)
        Wc = jnp.concatenate(
            [Wc, jnp.zeros((Wc.shape[0], pad), I32)], axis=1)
    ntp = W0.shape[1]
    grid = (ntp // tile,)
    wcr = Wc.shape[0]
    sym2, counts, tbad = pl.pallas_call(
        _tree_kernel8,
        out_shape=(jax.ShapeDtypeStruct((256, ntp), I32),
                   jax.ShapeDtypeStruct((72, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i)),
                  pl.BlockSpec((wcr, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((256, tile), lambda i: (0, i)),
                   pl.BlockSpec((72, tile), lambda i: (0, i)),
                   pl.BlockSpec((8, tile), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((512, tile), I32)],
        interpret=interpret,
    )(W0, Wc)
    out, ok = pl.pallas_call(
        _payload_kernel8,
        out_shape=(jax.ShapeDtypeStruct((528, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i)),
                  pl.BlockSpec((wcr, tile), lambda i: (0, i)),
                  pl.BlockSpec((256, tile), lambda i: (0, i)),
                  pl.BlockSpec((72, tile), lambda i: (0, i)),
                  pl.BlockSpec((8, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((528, tile), lambda i: (0, i)),
                   pl.BlockSpec((8, tile), lambda i: (0, i))),
        interpret=interpret,
    )(W0, Wc, sym2, counts, tbad)
    return out, ok


def _decode8_idct_raw(W0, Wc, qtx, pids, interpret: bool, tile: int,
                      tile_pi: int = 512):
    """Fused decode+IDCT driver -> (pixw [128, NTP] i32 pixel quad
    words, ok [8, NTP] i32). Same window contract as _decode8_raw plus
    expanded qtables [3*512, 1] and per-column plane ids [1, NP]
    (padded internally). ``tile_pi`` sizes the fused payload+IDCT
    kernel's tiles (512 measured 2.3x faster than 256 on the 4K golden
    frame; Mosaic's liveness scheduling keeps the ~16 MB naive IDCT
    intermediate footprint inside scoped VMEM)."""
    np8 = W0.shape[1]
    pad = (-np8) % tile
    if pad:
        fill0 = jnp.zeros((64, pad), I32).at[0:8, :].set(_FILLER_W0)
        W0 = jnp.concatenate([W0, fill0], axis=1)
        Wc = jnp.concatenate(
            [Wc, jnp.zeros((Wc.shape[0], pad), I32)], axis=1)
    ntp = W0.shape[1]
    if pids.shape[1] < ntp:
        pids = jnp.concatenate(
            [pids, jnp.zeros((1, ntp - pids.shape[1]), I32)], axis=1)
    if ntp % tile_pi:
        # NTP is padded to ``tile`` only; a coarser payload tile would
        # leave a short (or zero) grid and silently skip columns
        tile_pi = tile
    wcr = Wc.shape[0]
    sym2, counts, tbad = pl.pallas_call(
        _tree_kernel8,
        out_shape=(jax.ShapeDtypeStruct((256, ntp), I32),
                   jax.ShapeDtypeStruct((72, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=(ntp // tile,),
        in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i)),
                  pl.BlockSpec((wcr, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((256, tile), lambda i: (0, i)),
                   pl.BlockSpec((72, tile), lambda i: (0, i)),
                   pl.BlockSpec((8, tile), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((512, tile), I32)],
        interpret=interpret,
    )(W0, Wc)
    pixw, ok = pl.pallas_call(
        _payload_idct_kernel8,
        out_shape=(jax.ShapeDtypeStruct((128, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=(ntp // tile_pi,),
        in_specs=[pl.BlockSpec((64, tile_pi), lambda i: (0, i)),
                  pl.BlockSpec((wcr, tile_pi), lambda i: (0, i)),
                  pl.BlockSpec((256, tile_pi), lambda i: (0, i)),
                  pl.BlockSpec((72, tile_pi), lambda i: (0, i)),
                  pl.BlockSpec((8, tile_pi), lambda i: (0, i)),
                  pl.BlockSpec((1536, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, tile_pi), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((128, tile_pi), lambda i: (0, i)),
                   pl.BlockSpec((8, tile_pi), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((528, tile_pi), I32)],
        interpret=interpret,
    )(W0, Wc, sym2, counts, tbad, qtx, pids)
    return pixw, ok


def _decode8_idct_fused_raw(W0, Wc, qtx, pids, interpret: bool,
                            tile: int):
    """One-kernel decompress driver (see _fused_decode_idct_kernel8):
    same contract as _decode8_idct_raw."""
    np8 = W0.shape[1]
    pad = (-np8) % tile
    if pad:
        fill0 = jnp.zeros((64, pad), I32).at[0:8, :].set(_FILLER_W0)
        W0 = jnp.concatenate([W0, fill0], axis=1)
        Wc = jnp.concatenate(
            [Wc, jnp.zeros((Wc.shape[0], pad), I32)], axis=1)
    ntp = W0.shape[1]
    if pids.shape[1] < ntp:
        pids = jnp.concatenate(
            [pids, jnp.zeros((1, ntp - pids.shape[1]), I32)], axis=1)
    wcr = Wc.shape[0]
    pixw, ok = pl.pallas_call(
        _fused_decode_idct_kernel8,
        out_shape=(jax.ShapeDtypeStruct((128, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=(ntp // tile,),
        in_specs=[pl.BlockSpec((64, tile), lambda i: (0, i)),
                  pl.BlockSpec((wcr, tile), lambda i: (0, i)),
                  pl.BlockSpec((1536, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((128, tile), lambda i: (0, i)),
                   pl.BlockSpec((8, tile), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((512, tile), I32),
                        pltpu.VMEM((256, tile), I32),
                        pltpu.VMEM((72, tile), I32),
                        pltpu.VMEM((8, tile), I32),
                        pltpu.VMEM((528, tile), I32)],
        interpret=interpret,
    )(W0, Wc, qtx, pids)
    return pixw, ok


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def decode_idct_words8_split_fused(W0: jnp.ndarray, Wc: jnp.ndarray,
                                   qtx: jnp.ndarray, pids: jnp.ndarray,
                                   interpret: bool = False,
                                   tile: int | None = None):
    """Fused one-kernel variant of decode_idct_words8_split (same
    outputs)."""
    tile = tile or 512
    n = W0.shape[1] * 8
    pixw, ok = _decode8_idct_fused_raw(W0, Wc, qtx, pids, interpret,
                                       tile)
    ntp = pixw.shape[1]
    return pixw, ok.T.reshape(ntp * 8)[:n] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def decode_idct_words8_split(W0: jnp.ndarray, Wc: jnp.ndarray,
                             qtx: jnp.ndarray, pids: jnp.ndarray,
                             interpret: bool = False,
                             tile: int | None = None):
    """Two-region window + quantization inputs -> ([128, NTP] i32 pixel
    quad words, [NP*8] ok): the fused frame-decompress entry (Huffman
    payload decode, dequantize and IDCT in ONE kernel; the coefficient
    canvas never exists in HBM)."""
    tile = tile or TILE
    n = W0.shape[1] * 8
    pixw, ok = _decode8_idct_raw(W0, Wc, qtx, pids, interpret, tile)
    ntp = pixw.shape[1]
    return pixw, ok.T.reshape(ntp * 8)[:n] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def decode_words8(wordsp: jnp.ndarray, interpret: bool = False,
                  tile: int | None = None):
    """[CW*8, NP] i32 packed-8 kernel-space words -> ([NP*8, 64] i16
    coefficients in block order b = c*8 + r, [NP*8] ok)."""
    tile = tile or TILE
    n = wordsp.shape[1] * 8
    out, ok = _decode8_raw(wordsp[:64], wordsp[64:], interpret, tile)
    ntp = out.shape[1]
    # rows 8p+r -> block-major [n, 64] + inverse-zigzag column gather
    m = out[:512].reshape(64, 8, ntp).transpose(2, 1, 0).reshape(ntp * 8, 64)
    coeffs = m[:, _IZZ].astype(jnp.int16)[:n]
    okb = ok.T.reshape(ntp * 8)[:n]
    return coeffs, okb != 0


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def decode_words8_packed(wordsp: jnp.ndarray, interpret: bool = False,
                         tile: int | None = None):
    """[CW*8, NP] packed words -> ([512, NTP] i32 message-order packed
    coefficient rows (kernels/pallas_dct8 layout; NTP = NP padded to the
    tile), [NP*8] ok) — no relayout: the output feeds
    dequantize_idct_packed directly."""
    tile = tile or TILE
    n = wordsp.shape[1] * 8
    out, ok = _decode8_raw(wordsp[:64], wordsp[64:], interpret, tile)
    ntp = out.shape[1]
    return out[:512], ok.T.reshape(ntp * 8)[:n] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def decode_words8_packed_split(W0: jnp.ndarray, Wc: jnp.ndarray,
                               interpret: bool = False,
                               tile: int | None = None):
    """Two-region window (W0 [64, NP], Wc [(CW-8)*8, NP]) -> ([512, NTP]
    i32 message-order packed coefficient rows, [NP*8] ok) — the frame
    decompress entry: the split-stream regions feed the kernels directly
    and the joined window tensor never exists in HBM."""
    tile = tile or TILE
    n = W0.shape[1] * 8
    out, ok = _decode8_raw(W0, Wc, interpret, tile)
    ntp = out.shape[1]
    return out[:512], ok.T.reshape(ntp * 8)[:n] != 0


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def decode_lanes8(lanes: jnp.ndarray, interpret: bool = False,
                  tile: int | None = None):
    """[N, 256] u8 chunk lanes -> ([N, 64] i16, [N] ok) via the packed
    kernels (test/interop entry; the frame path feeds packed words
    directly)."""
    from .pallas_decode import _pack_words
    n = lanes.shape[0]
    pad = (-n) % 8
    if pad:
        filler = np.zeros((pad, 256), np.uint8)
        filler[:, 0] = 1
        filler[:, 2] = 3
        lanes = jnp.concatenate([lanes, jnp.asarray(filler)], axis=0)
    words, _ = _pack_words(lanes)                      # [64, n+pad]
    coeffs, ok = decode_words8(pack8_rows(words), interpret=interpret,
                               tile=tile)
    return coeffs[:n], ok[:n]
