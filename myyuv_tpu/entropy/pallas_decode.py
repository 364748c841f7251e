"""Pallas TPU Huffman decoder: all blocks decode in lockstep, in VMEM.

The v2 gather/scatter-free design (PERF_NOTES.md): each chunk's bytes are
bit-reversed and packed into big-endian u32 words on the XLA side, and the
kernels consume the stream through a 64-bit lookahead window (two i32
words) advanced by elementwise variable shifts — the "next bits" always
sit at a fixed position, so there is no per-row dynamic addressing at all.
Refills pull the next packed word via a fused one-hot select. Symbol
lookup is a one-hot match on (code length, within-length rank), both
recorded at parse time.

Layout: blocks ride the LANE (minor) dimension — every tensor is
[small, TILE] with TILE a multiple of 128, so the per-block registers
(window words, cursors) are [1, TILE] vectors at full VPU width; the
original [TILE, 1] orientation ran at 1/128th utilization (measured 717 ms
vs this layout's time for the same 189k-block plane).

Round-2 restructure: the tree section parses in a FLAT loop — one step per
symbol (64 total) with the group-header consumption folded into the step
where a new group begins — instead of the round-1 nested 16x32
group/symbol sweep (512 lockstep steps, ~85% of kernel time for typical
~8-symbol trees). Tree parse and payload decode are separate pallas_calls
so each Mosaic program stays small enough to compile quickly (the fused
flat variant exceeded 10-minute compiles in round 1); the payload kernel
re-enters the bitstream directly at the byte-aligned payload offset
(3 + tree_size bytes), so no window state crosses the kernel boundary.

Validity: streams whose tree declares more than 64 symbols, whose section
size disagrees with the parsed groups, or whose payload hits an
out-of-table code set the per-row ok flag False — callers fall back to the
host decoder, so decoding is never silently wrong.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .reference import ZIGZAG

I32 = jnp.int32
# blocks per grid program; see pallas_encode.TILE
TILE = int(os.environ.get("MYYUV_DEC_TILE", "1024"))
WORDS = 64          # 256 chunk bytes = 64 packed words


def _bitrev8(v):
    v = ((v & 0xF0) >> 4) | ((v & 0x0F) << 4)
    v = ((v & 0xCC) >> 2) | ((v & 0x33) << 2)
    return ((v & 0xAA) >> 1) | ((v & 0x55) << 1)


def _bitrev11(v):
    r = jnp.zeros_like(v)
    for i in range(11):
        r = r | (((v >> i) & 1) << (10 - i))
    return r


def _shl(x, s):
    """x << s with s possibly 0..32 (s == 32 -> 0), elementwise."""
    return jnp.where(s >= 32, 0, x << jnp.minimum(s, 31))


def _shr_l(x, s):
    """logical right shift of an i32 holding u32 bits, s in 0..32."""
    ux = x & 0x7FFFFFFF
    top = (x >> 31) & 1
    r = (ux >> jnp.minimum(s, 31)) | _shl(top, 31 - s)
    return jnp.where(s >= 32, 0, jnp.where(s == 0, x, r))


def _make_consume(R, iota_w):
    """Build the window-advance closure over the packed words R."""

    def consume(state, s):
        """advance the window by s (<= 24) bits, refilling as needed."""
        W0, W1, valid, widx = state
        W0 = _shl(W0, s) | _shr_l(W1, 32 - s)
        W1 = _shl(W1, s)
        valid = valid - s
        need = valid <= 32
        V = jnp.sum(jnp.where(iota_w == widx, R, 0), axis=0, keepdims=True)
        V = jnp.where(need, V, 0)
        W0 = W0 | jnp.where(need, _shr_l(V, valid), 0)
        W1 = W1 | jnp.where(need, _shl(V, 32 - valid), 0)
        valid = valid + jnp.where(need, 32, 0)
        widx = widx + need.astype(I32)
        return (W0, W1, valid, widx)

    return consume


def _tree_kernel(words_ref, meta_ref, rec_ref, counts_ref, bad_ref):
    """Flat tree parse: words [WORDS, TILE], meta [2, TILE] ->
    rec [64, TILE] i32 packed (len<<17 | rank<<11 | sym11),
    counts [9, TILE] per-length symbol counts, bad [1, TILE]."""
    R = words_ref[...]
    tree_size = meta_ref[1:2, :]
    tree_bits = tree_size * 8

    cw = words_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(I32, (cw, TILE), 0)
    iota64 = jax.lax.broadcasted_iota(I32, (64, TILE), 0)
    iota9 = jax.lax.broadcasted_iota(I32, (9, TILE), 0)
    consume = _make_consume(R, iota_w)

    # window starts right after the 3 header bytes
    st = (R[0:1, :], R[1:2, :], jnp.full((1, TILE), 64, I32),
          jnp.full((1, TILE), 2, I32))
    st = consume(st, jnp.full((1, TILE), 24, I32))

    def step(t, carry):
        st, g_rem, cur_len, consumed, nstored, counts, rec = carry
        # start a new group when the current one is exhausted and tree
        # bytes remain: consume the previous group's byte pad + the header
        pad = (8 - (consumed & 7)) & 7
        more = (g_rem == 0) & (consumed + pad < tree_bits)
        st = consume(st, jnp.where(more, pad, 0))
        W0 = st[0]
        hdr = _bitrev8(_shr_l(W0, 24) & 0xFF)
        st = consume(st, jnp.where(more, 8, 0))
        cur_len = jnp.where(more, (hdr >> 5) + 1, cur_len)
        g_rem = jnp.where(more, (hdr & 31) + 1, g_rem)
        consumed = jnp.where(more, consumed + pad + 8, consumed)
        # one symbol per step while inside a group
        take = g_rem > 0
        W0 = st[0]
        v11 = _bitrev11(_shr_l(W0, 21) & 0x7FF)
        lcount = jnp.sum(jnp.where(iota9 == cur_len, counts, 0),
                         axis=0, keepdims=True)
        entry = (cur_len << 17) | (lcount << 11) | v11
        sel = (iota64 == nstored) & take
        rec = jnp.where(sel, entry, rec)
        counts = counts + jnp.where((iota9 == cur_len) & take, 1, 0)
        nstored = nstored + take.astype(I32)
        g_rem = g_rem - take.astype(I32)
        consumed = consumed + jnp.where(take, 11, 0)
        st = consume(st, jnp.where(take, 11, 0))
        return st, g_rem, cur_len, consumed, nstored, counts, rec

    zero1 = jnp.zeros((1, TILE), I32)
    carry = (st, zero1, zero1, zero1, zero1, jnp.zeros((9, TILE), I32),
             jnp.zeros((64, TILE), I32))
    # every step stores one symbol while any remain, so the trip count
    # only needs to cover the tile's largest symbol count; tree_bits >=
    # 8 + 11*n_sym bounds it from the header alone (malformed declarations
    # beyond the bound still flag bad via the consumed != tree_bits check)
    steps = jnp.max(jnp.clip((tree_bits - 8) // 11, 0, 64))
    st, g_rem, cur_len, consumed, nstored, counts, rec = jax.lax.fori_loop(
        0, steps, step, carry)
    # a valid tree ends exactly at tree_size bytes with no group open
    # (>64-symbol trees leave g_rem > 0 -> bad; ADVICE round 1)
    consumed = consumed + ((8 - (consumed & 7)) & 7)
    bad = (g_rem > 0) | (consumed != tree_bits)
    rec_ref[...] = rec
    counts_ref[...] = counts
    bad_ref[...] = bad.astype(I32)


def _payload_kernel(words_ref, meta_ref, rec_ref, counts_ref, tbad_ref,
                    zz_ref, out_ref, ok_ref):
    """Canonical payload decode: lockstep symbol steps.

    The per-step cost is dominated by one-hot ops over the symbol table
    rows, so the table height specializes at runtime: parse order packs
    the symbols into the low rows, and a tile whose largest tree has
    <= SMALL_ROWS symbols (virtually every q<=85 tile) runs the match
    over a [SMALL_ROWS, TILE] slice via lax.cond (~3x less table work
    per step)."""
    R = words_ref[...]
    enc_bits = meta_ref[0:1, :]
    tree_size = meta_ref[1:2, :]
    counts = counts_ref[...]

    cw = words_ref.shape[0]
    iota_w = jax.lax.broadcasted_iota(I32, (cw, TILE), 0)
    iota64 = jax.lax.broadcasted_iota(I32, (64, TILE), 0)
    iota9 = jax.lax.broadcasted_iota(I32, (9, TILE), 0)
    consume = _make_consume(R, iota_w)

    # canonical first_code per length: first[l+1] = (first[l]+count[l])<<1
    fc_list = [jnp.zeros((1, TILE), I32), jnp.zeros((1, TILE), I32)]
    for l in range(1, 8):
        fc_list.append((fc_list[l] + counts[l:l + 1, :]) << 1)
    first_code = jnp.concatenate(fc_list, axis=0)      # [9, TILE]

    # enter the stream directly at the byte-aligned payload offset; the
    # window holds the tail of words w0i/w0i+1 (valid = 64 - sh bits, the
    # consume invariant), so the next refill correctly pulls w0i+2
    bitoff = (3 + tree_size) * 8
    w0i = _shr_l(bitoff, 5)
    sh = bitoff & 31
    A = jnp.sum(jnp.where(iota_w == w0i, R, 0), axis=0, keepdims=True)
    B = jnp.sum(jnp.where(iota_w == w0i + 1, R, 0), axis=0, keepdims=True)
    W0 = _shl(A, sh) | _shr_l(B, 32 - sh)
    W1 = _shl(B, sh)
    st0 = (W0, W1, 64 - sh, w0i + 2)

    iota64_1 = jax.lax.broadcasted_iota(I32, (64, 1), 0)
    bad0 = tbad_ref[...]
    n_sym = jnp.sum(counts, axis=0, keepdims=True)     # parse stores rows
    nmax_sym = jnp.max(n_sym)

    def run(rows):
        rec = rec_ref[:rows, :]
        iota_r = jax.lax.broadcasted_iota(I32, (rows, TILE), 0)
        # packed (len<<6 | rank) key: ONE table compare per step
        keystore = ((rec >> 17) << 6) | ((rec >> 11) & 63)
        keystore = jnp.where(iota_r < n_sym, keystore, -1)
        v11s = rec & 0x7FF
        symstore = jnp.where(v11s >= 1024, v11s - 2048, v11s)

        def sym_cond(carry):
            # run until every lane has either consumed its payload or
            # gone bad (bad lanes stop advancing bitpos, so they must
            # not hold the loop open); p < 64 is the format bound
            p, st, coeffs, bitpos, bad = carry
            live = (bitpos < enc_bits) & (bad == 0)
            return (p < 64) & (jnp.max(live.astype(I32)) > 0)

        def sym_step(carry):
            p, st, coeffs, bitpos, bad = carry
            W0 = st[0]
            active = bitpos < enc_bits
            peek = _shr_l(W0, 24) & 0xFF
            length = jnp.full((1, TILE), 9, I32)
            code = jnp.zeros((1, TILE), I32)
            for L in range(8, 0, -1):
                cL = peek >> (8 - L)
                hit = cL < first_code[L:L + 1, :] + counts[L:L + 1, :]
                length = jnp.where(hit, L, length)
                code = jnp.where(hit, cL, code)
            idx = code - jnp.sum(
                jnp.where(iota9 == length, first_code, 0),
                axis=0, keepdims=True)
            match = keystore == ((length << 6) | (idx & 63))
            # an empty (length, rank) match is an out-of-table code ->
            # bad row, not a silent symbol 0 (ADVICE round 1); the
            # explicit idx range check keeps a wrapped (idx & 63) or
            # sign-extended idx from matching anything silently
            nmatch = jnp.sum(match.astype(I32), axis=0, keepdims=True)
            ok_sym = (length <= 8) & (idx >= 0) & (idx < 64) \
                & (bitpos + length <= enc_bits) & (nmatch > 0)
            sym = jnp.sum(jnp.where(match, symstore, 0),
                          axis=0, keepdims=True)
            write = active & ok_sym
            zzp = jnp.sum(jnp.where(iota64_1 == p, zz_ref[...], 0),
                          axis=0, keepdims=True)        # [1, 1]
            sel = iota64 == zzp
            coeffs = jnp.where(sel & write, sym, coeffs)
            bad = bad | (active & ~ok_sym).astype(I32)
            adv = jnp.where(write, length, 0)
            bitpos = bitpos + adv
            st = consume(st, adv)
            return p + 1, st, coeffs, bitpos, bad

        carry0 = (0, st0, jnp.zeros((64, TILE), I32),
                  jnp.zeros((1, TILE), I32), bad0)
        _, st, coeffs, bitpos, bad = jax.lax.while_loop(
            sym_cond, sym_step, carry0)
        return coeffs, bitpos, bad

    SMALL_ROWS = 16
    coeffs, bitpos, bad = jax.lax.cond(
        nmax_sym <= SMALL_ROWS,
        lambda: run(SMALL_ROWS), lambda: run(64))
    bad = bad | (bitpos != enc_bits).astype(I32)

    out_ref[...] = coeffs.astype(jnp.int16)
    ok_ref[...] = (bad == 0).astype(I32)


def _pack_words(lanes: jnp.ndarray):
    """[N, 256] u8 lanes -> ([WORDS, N] i32 big-endian packed bit-reversed
    words, [2, N] i32 (enc_bits; tree_size)) — XLA-side preprocessing."""
    x = lanes.astype(I32)
    enc_bits = x[:, 0] | (x[:, 1] << 8)
    tree_size = x[:, 2]
    rev = _bitrev8(x)
    b = rev.reshape(rev.shape[0], 64, 4)
    words = (b[:, :, 0] << 24) | (b[:, :, 1] << 16) | (b[:, :, 2] << 8) \
        | b[:, :, 3]
    meta = jnp.stack([enc_bits, tree_size], axis=0)
    return words.T, meta


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_lanes(lanes: jnp.ndarray, interpret: bool = False):
    """[N, 256] u8 chunk lanes -> ([N, 64] i16 coefficients, [N] ok)."""
    n = lanes.shape[0]
    pad = (-n) % TILE
    if pad:
        # minimal valid chunk: all-zero block (enc_bits=1, one group with
        # the single symbol 0 of code length 1, payload bit 0)
        filler = np.zeros((pad, 256), np.uint8)
        filler[:, 0] = 1          # enc_bits = 1
        filler[:, 2] = 3          # tree_size: 1 hdr + 2 bytes of 11-bit sym
        lanes = jnp.concatenate([lanes, jnp.asarray(filler)], axis=0)
    words, meta = _pack_words(lanes)
    ntot = lanes.shape[0]
    grid = (ntot // TILE,)
    rec, counts, tbad = pl.pallas_call(
        _tree_kernel,
        out_shape=(jax.ShapeDtypeStruct((64, ntot), I32),
                   jax.ShapeDtypeStruct((9, ntot), I32),
                   jax.ShapeDtypeStruct((1, ntot), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((WORDS, TILE), lambda i: (0, i)),
                  pl.BlockSpec((2, TILE), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((64, TILE), lambda i: (0, i)),
                   pl.BlockSpec((9, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i))),
        interpret=interpret,
    )(words, meta)
    zz = jnp.asarray(np.asarray(ZIGZAG, np.int32).reshape(64, 1))
    out, ok = pl.pallas_call(
        _payload_kernel,
        out_shape=(jax.ShapeDtypeStruct((64, ntot), jnp.int16),
                   jax.ShapeDtypeStruct((1, ntot), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((WORDS, TILE), lambda i: (0, i)),
                  pl.BlockSpec((2, TILE), lambda i: (0, i)),
                  pl.BlockSpec((64, TILE), lambda i: (0, i)),
                  pl.BlockSpec((9, TILE), lambda i: (0, i)),
                  pl.BlockSpec((1, TILE), lambda i: (0, i)),
                  pl.BlockSpec((64, 1), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((64, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i))),
        interpret=interpret,
    )(words, meta, rec, counts, tbad, zz)
    return out.T[:n], ok[0, :n] != 0


# word-space filler column for padding N to a TILE multiple: the minimal
# valid chunk (all-zero block: enc_bits=1, tree = one group, single symbol
# 0 of code length 1, payload bit 0) packed into kernel stream space
_FILLER_W0 = np.int32(np.uint32((0x80 << 24) | (0xC0 << 8)).view(np.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_words(words: jnp.ndarray, interpret: bool = False):
    """[CW, N] i32 packed kernel-space words -> ([N, 64] i16, [N] ok).

    CW is the static per-block word capacity (16 covers chunks up to 64
    bytes — every q<=~85 stream; 64 covers the format max of 255 bytes).
    The caller guarantees each chunk fits CW*4 bytes."""
    cw, n = words.shape
    pad = (-n) % TILE
    if pad:
        fill = jnp.zeros((cw, pad), I32).at[0, :].set(_FILLER_W0)
        words = jnp.concatenate([words, fill], axis=1)
    ntot = words.shape[1]
    # meta from the first word (header bytes live bit-reversed in it)
    w0 = words[0]
    b0 = _bitrev8(_shr_l(w0, 24) & 0xFF)
    b1 = _bitrev8(_shr_l(w0, 16) & 0xFF)
    b2 = _bitrev8(_shr_l(w0, 8) & 0xFF)
    meta = jnp.stack([b0 | (b1 << 8), b2], axis=0)
    grid = (ntot // TILE,)
    rec, counts, tbad = pl.pallas_call(
        _tree_kernel,
        out_shape=(jax.ShapeDtypeStruct((64, ntot), I32),
                   jax.ShapeDtypeStruct((9, ntot), I32),
                   jax.ShapeDtypeStruct((1, ntot), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((cw, TILE), lambda i: (0, i)),
                  pl.BlockSpec((2, TILE), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((64, TILE), lambda i: (0, i)),
                   pl.BlockSpec((9, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i))),
        interpret=interpret,
    )(words, meta)
    zz = jnp.asarray(np.asarray(ZIGZAG, np.int32).reshape(64, 1))
    out, ok = pl.pallas_call(
        _payload_kernel,
        out_shape=(jax.ShapeDtypeStruct((64, ntot), jnp.int16),
                   jax.ShapeDtypeStruct((1, ntot), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((cw, TILE), lambda i: (0, i)),
                  pl.BlockSpec((2, TILE), lambda i: (0, i)),
                  pl.BlockSpec((64, TILE), lambda i: (0, i)),
                  pl.BlockSpec((9, TILE), lambda i: (0, i)),
                  pl.BlockSpec((1, TILE), lambda i: (0, i)),
                  pl.BlockSpec((64, 1), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((64, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i))),
        interpret=interpret,
    )(words, meta, rec, counts, tbad, zz)
    return out.T[:n], ok[0, :n] != 0
