"""Pallas TPU Huffman decoder: all blocks decode in lockstep, in VMEM.

The v2 gather/scatter-free design (PERF_NOTES.md): each chunk's bytes are
bit-reversed and packed into big-endian u32 words on the XLA side, and the
kernel consumes the stream through a 64-bit lookahead window (two i32
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

Validity: streams whose tree section has more than MAX_GROUPS groups (the
reference encoder emits <= 9; 16 gives slack) or any malformed code set
the per-row ok flag False — callers fall back to the host decoder, so
decoding is never silently wrong.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .reference import ZIGZAG

I32 = jnp.int32
TILE = 1024
MAX_GROUPS = 16
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


def _decode_kernel(words_ref, meta_ref, zz_ref, out_ref, ok_ref):
    """words [WORDS, TILE] i32 (big-endian packed bit-reversed bytes),
    meta [2, TILE] i32 = (enc_bits; tree_size), zz [64, 1] zigzag table ->
    out [64, TILE] i16 coefficients (zigzag-restored), ok [1, TILE] i32."""
    R = words_ref[...]
    enc_bits = meta_ref[0:1, :]               # [1, TILE]
    tree_size = meta_ref[1:2, :]

    iota_w = jax.lax.broadcasted_iota(I32, (WORDS, TILE), 0)
    iota64 = jax.lax.broadcasted_iota(I32, (64, TILE), 0)
    iota9 = jax.lax.broadcasted_iota(I32, (9, TILE), 0)

    # ---- 64-bit lookahead window ----------------------------------------
    W0 = R[0:1, :]
    W1 = R[1:2, :]
    valid = jnp.full((1, TILE), 64, I32)
    widx = jnp.full((1, TILE), 2, I32)

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

    st = consume((W0, W1, valid, widx), jnp.full((1, TILE), 24, I32))

    # ---- tree parse: symbols + lengths + within-length ranks ------------
    symstore = jnp.zeros((64, TILE), I32)
    lenstore = jnp.zeros((64, TILE), I32)
    rankstore = jnp.zeros((64, TILE), I32)
    counts = jnp.zeros((9, TILE), I32)
    nstored = jnp.zeros((1, TILE), I32)
    consumed = jnp.zeros((1, TILE), I32)      # tree bytes consumed
    bad = jnp.zeros((1, TILE), I32)

    def group_body(g, carry):
        (st, symstore, lenstore, rankstore, counts, nstored, consumed,
         bad) = carry
        W0 = st[0]
        active = consumed < tree_size
        hdr = _bitrev8(_shr_l(W0, 24) & 0xFF)
        length = (hdr >> 5) + 1
        cnt = jnp.where(active, (hdr & 31) + 1, 0)
        # trees with > 64 symbols overflow the stores silently -> flag bad
        # (the reference decoder throws; ADVICE round 1)
        bad = bad | (active & (nstored + cnt > 64)).astype(I32)
        st = consume(st, jnp.where(active, 8, 0))

        def sym_body(t, inner):
            st, symstore, lenstore, rankstore, counts, nstored = inner
            W0 = st[0]
            take = active & (t < cnt)
            v11 = _bitrev11(_shr_l(W0, 21) & 0x7FF)
            sym = jnp.where(v11 >= 1024, v11 - 2048, v11)
            sel = (iota64 == nstored) & take
            symstore = jnp.where(sel, sym, symstore)
            lenstore = jnp.where(sel, length, lenstore)
            lcount = jnp.sum(jnp.where(iota9 == length, counts, 0),
                             axis=0, keepdims=True)
            rankstore = jnp.where(sel, lcount, rankstore)
            counts = counts + jnp.where((iota9 == length) & take, 1, 0)
            nstored = nstored + take.astype(I32)
            st = consume(st, jnp.where(take, 11, 0))
            return st, symstore, lenstore, rankstore, counts, nstored

        st, symstore, lenstore, rankstore, counts, nstored = \
            jax.lax.fori_loop(0, 32, sym_body,
                              (st, symstore, lenstore, rankstore, counts,
                               nstored))
        pad = (8 - (11 * cnt) % 8) % 8
        st = consume(st, jnp.where(active, pad, 0))
        consumed = consumed + jnp.where(active, 1 + (cnt * 11 + 7) // 8, 0)
        return (st, symstore, lenstore, rankstore, counts, nstored,
                consumed, bad)

    carry = (st, symstore, lenstore, rankstore, counts, nstored, consumed,
             bad)
    carry = jax.lax.fori_loop(0, MAX_GROUPS, group_body, carry)
    st, symstore, lenstore, rankstore, counts, nstored, consumed, bad = carry
    bad = bad | (consumed != tree_size).astype(I32)

    # canonical first_code per length: first[l+1] = (first[l]+count[l])<<1
    fc_list = [jnp.zeros((1, TILE), I32), jnp.zeros((1, TILE), I32)]
    for l in range(1, 8):
        fc_list.append((fc_list[l] + counts[l:l + 1, :]) << 1)
    first_code = jnp.concatenate(fc_list, axis=0)      # [9, TILE]

    # ---- payload: 64 canonical-decode steps -----------------------------
    iota64_1 = jax.lax.broadcasted_iota(I32, (64, 1), 0)
    coeffs = jnp.zeros((64, TILE), I32)
    bitpos = jnp.zeros((1, TILE), I32)

    def sym_step(p, carry):
        st, coeffs, bitpos, bad = carry
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
            jnp.where(iota9 == length, first_code, 0), axis=0, keepdims=True)
        match = (lenstore == length) & (rankstore == idx)
        # an empty (length, rank) match is an out-of-table code -> bad
        # row, not a silent symbol 0 (ADVICE round 1)
        nmatch = jnp.sum(match.astype(I32), axis=0, keepdims=True)
        ok_sym = (length <= 8) & (bitpos + length <= enc_bits) & (nmatch > 0)
        sym = jnp.sum(jnp.where(match, symstore, 0), axis=0, keepdims=True)
        write = active & ok_sym
        zzp = jnp.sum(jnp.where(iota64_1 == p, zz_ref[...], 0),
                      axis=0, keepdims=True)        # [1, 1]
        sel = iota64 == zzp
        coeffs = jnp.where(sel & write, sym, coeffs)
        bad = bad | (active & ~ok_sym).astype(I32)
        adv = jnp.where(write, length, 0)
        bitpos = bitpos + adv
        st = consume(st, adv)
        return st, coeffs, bitpos, bad

    st, coeffs, bitpos, bad = jax.lax.fori_loop(
        0, 64, sym_step, (st, coeffs, bitpos, bad))
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
    grid = (lanes.shape[0] // TILE,)
    zz = jnp.asarray(np.asarray(ZIGZAG, np.int32).reshape(64, 1))
    out, ok = pl.pallas_call(
        _decode_kernel,
        out_shape=(jax.ShapeDtypeStruct((64, lanes.shape[0]), jnp.int16),
                   jax.ShapeDtypeStruct((1, lanes.shape[0]), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((WORDS, TILE), lambda i: (0, i)),
                  pl.BlockSpec((2, TILE), lambda i: (0, i)),
                  pl.BlockSpec((64, 1), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((64, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i))),
        interpret=interpret,
    )(words, meta, zz)
    return out.T[:n], ok[0, :n] != 0
