"""Pallas TPU Huffman encoder: all blocks encode in lockstep, in VMEM.

The round-2 mirror of entropy/pallas_decode.py (PERF_NOTES.md "Round-2
Pallas encoder design"): the per-block Huffman::fromData + dump pipeline
(reference Huffman.cpp:172-241,279-326) reformulated with zero dynamic
addressing, blocks riding the LANE (minor) axis so every per-block register
is a full-width [1, TILE] vector:

1. distinct symbols + counts: 64 lockstep row steps comparing one message
   row against all rows (count = equality sum, first-occurrence via a
   row-index mask) — no general sort, and distinct symbols inherit symbol
   order for free;
2. leaf order for the Huffman merge: bitonic-64 ON THE SUBLANE AXIS with
   keys count*4096 + (sym+1024) — identical ordering to the XLA encoder's
   (count, gid) stable sort, so the emitted bytes are byte-identical.
   Partner rows x[r^j] come from a select of two static row shifts (j is a
   power of two), not gathers;
3. two-queue merge (63 masked steps) + descending parent-depth sweep
   (127 steps): one-hot sublane reductions for queue-head reads, masked
   row blends for writes — the priority-queue-free formulation of
   entropy/device.py, now in VMEM;
4. canonical (len, sym) order via a second bitonic-64, then the Kraft
   prefix sum as a 6-step log-scan with static row shifts;
5. serialization: a sequential bit-append register (current word + bit
   cursor) spilling into a [64, TILE] word register file — the exact
   reverse of the decoder's refill schedule. Appends run MSB-first in the
   same bit-reversed big-endian word space the decoder consumes, so the
   XLA-side postprocessing is one elementwise byte split + bitrev.

Output is byte-identical to entropy.device.encode_lanes (itself verified
against the compiled reference CLI both directions).
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

I32 = jnp.int32
# blocks per grid program; sequential-loop overhead is width-independent
# (measured), so wider tiles amortize it — bounded by VMEM (~16 MB/core)
TILE = int(os.environ.get("MYYUV_ENC_TILE", "1024"))
BIG = 1 << 29


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
    """x << s with s possibly 0..32+ (saturating to 0), elementwise."""
    return jnp.where(s >= 32, 0, x << jnp.minimum(s, 31))


def _shr_l(x, s):
    """Logical right shift of an i32 holding u32 bits, s in 0..32."""
    ux = x & 0x7FFFFFFF
    top = (x >> 31) & 1
    r = (ux >> jnp.minimum(s, 31)) | _shl(top, 31 - s)
    return jnp.where(s >= 32, 0, jnp.where(s == 0, x, r))


def _shift_down(x, j):
    """out[r] = x[r - j] (rows 0..j-1 read 0)."""
    return jnp.concatenate([jnp.zeros((j, x.shape[1]), x.dtype), x[:-j]],
                           axis=0)


def _shift_up(x, j):
    """out[r] = x[r + j] (top j rows read 0)."""
    return jnp.concatenate([x[j:], jnp.zeros((j, x.shape[1]), x.dtype)],
                           axis=0)


def _bitonic(key, iota):
    """Ascending bitonic sort of the rows, elementwise per lane.

    Each compare-exchange level is emitted as STATIC REGION SLICES (the
    pallas_encode8._bitonic8 formulation): rows [a, a+j) pair with
    [a+j, a+2j), direction uniform per 2j-block, so the level is one
    min and one max per slice pair, concatenated back in place — no
    partner materialization, no blend select. ``iota`` is unused (kept
    for signature stability). Row count is a power of two.
    """
    rows = key.shape[0]
    k = 2
    while k <= rows:
        j = k >> 1
        while j >= 1:
            pieces = []
            for a in range(0, rows, 2 * j):
                A = key[a:a + j]
                B = key[a + j:a + 2 * j]
                if (a & k) == 0:
                    pieces.append(jnp.minimum(A, B))
                    pieces.append(jnp.maximum(A, B))
                else:
                    pieces.append(jnp.maximum(A, B))
                    pieces.append(jnp.minimum(A, B))
            key = jnp.concatenate(pieces, axis=0)
            j >>= 1
        k <<= 1
    return key


def _row(x, r, iota):
    """One-hot read of row r (a [1, TILE] index vector) -> [1, TILE]."""
    return jnp.sum(jnp.where(iota == r, x, 0), axis=0, keepdims=True)


def _encode_kernel(pair_ref, words_ref, a_ref, size_ref, ok_ref, scr_ref):
    """pair [32, TILE] i32 zigzag-ordered coefficient PAIRS (row p holds
    messages 2p | 2p+1 << 16 — the layout the word-packed DCT kernel
    emits) -> words [TILE, cont] i32 CONTINUATION words (words 8.. of
    each chunk, bit-reversed big-endian, block-major — the split-stream
    interchange's B source; cont = words_ref.shape[1], 8 or 56), a
    [8, TILE] i32 (each chunk's FIRST 8 words — region A, emitted
    straight from the serialization register file so the compress path
    never slices a canvas), size [1, TILE] i32 chunk bytes, ok [1, TILE]
    (false when a chunk exceeds 4*(8+cont) bytes — the caller retries a
    roomier tier).

    ``scr_ref`` is [256, TILE] VMEM scratch holding the per-step record
    tables (canonical LUT, tree records, payload quads, interior depths):
    the sequential loops read them back through UNIFORM dynamic row
    slices (``ref[pl.ds(c, 1)]``) instead of one-hot row reductions —
    the loop index is the same for every lane, so each read is O(1)
    vector work (the trick pallas_decode8 uses for its symbol stores).
    The pair layout halves the HBM read and every per-message-position
    full-height op (LUT compare, payload record build)."""
    cont = words_ref.shape[1]
    pw = pair_ref[...]
    lo = (pw << 16) >> 16                             # messages 2p
    hi = pw >> 16                                     # messages 2p+1
    iota32 = jax.lax.broadcasted_iota(I32, (32, TILE), 0)
    iota64 = jax.lax.broadcasted_iota(I32, (64, TILE), 0)

    # ---- message trim (Huffman.cpp:174-203) -----------------------------
    mlen = jnp.max(jnp.maximum(
        jnp.where(lo != 0, 2 * iota32 + 1, 0),
        jnp.where(hi != 0, 2 * iota32 + 2, 0)), axis=0, keepdims=True)
    mlen = jnp.maximum(mlen, 1)                      # all-zero -> one 0 sym
    vlo = 2 * iota32 < mlen                           # [32, TILE]
    vhi = 2 * iota32 + 1 < mlen

    # ---- distinct symbols + counts via a value sort ---------------------
    # Sorting the trimmed message groups equal symbols into runs: run
    # starts mark the distinct symbols and run lengths are their counts.
    # One bitonic + two log-scans replace the round-1 64-step compare-all
    # loop; the (count, symbol) multiset is identical, so the canonical
    # output is byte-identical. Row order within vals is irrelevant to
    # the sort, so the lo/hi halves concatenate as blocks (no interleave
    # needed). The WHOLE front — both bitonics and the boundary scans —
    # specializes on the tile-max trimmed message length: messages
    # 0..2h-1 live in lo[:h] | hi[:h], so a [16, TILE] or [32, TILE]
    # variant runs when every block's message fits (45%/27% of q50 4K
    # tiles at TILE=1024; the 64-height sort alone is ~21 stages of
    # 8-vreg compare-exchanges).
    mlenmax = jnp.max(mlen)

    def front(mrows):
        half = mrows // 2
        iota_m = jax.lax.broadcasted_iota(I32, (mrows, TILE), 0)
        vals = jnp.concatenate(
            [jnp.where(vlo[:half], lo[:half] + 1024, BIG),
             jnp.where(vhi[:half], hi[:half] + 1024, BIG)], axis=0)
        svals = _bitonic(vals, iota_m)
        valid_s = svals < BIG
        prevv = _shift_down(svals, 1)
        run_start0 = valid_s & ((iota_m == 0) | (svals != prevv))
        # next run boundary strictly after each row (reverse running min)
        bnd0 = run_start0 | ~valid_s
        bpos0 = jnp.where(bnd0, iota_m, 99)
        nxt0 = _shift_up(bpos0, 1) + jnp.where(iota_m >= mrows - 1, 99, 0)
        st = 1
        while st < mrows:
            nxt0 = jnp.minimum(nxt0, _shift_up(nxt0, st) +
                               jnp.where(iota_m >= mrows - st, 99, 0))
            st <<= 1
        nxt0 = jnp.minimum(nxt0, mrows)
        cnt0 = nxt0 - iota_m                          # valid at run starts
        n_sym = jnp.sum(run_start0.astype(I32), axis=0, keepdims=True)
        # leaf order for the merge: sort run starts by (count, symbol)
        leafkey = _bitonic(
            jnp.where(run_start0, cnt0 * 4096 + svals, BIG), iota_m)
        if mrows < 64:
            leafkey = jnp.concatenate(
                [leafkey, jnp.full((64 - mrows, TILE), BIG, I32)], axis=0)
        return leafkey, n_sym

    leafkey64, n_sym = jax.lax.cond(
        mlenmax <= 16, lambda: front(16),
        lambda: jax.lax.cond(mlenmax <= 32, lambda: front(32),
                             lambda: front(64)))

    # ---- symbol-table-sized tail under a runtime size cond --------------
    # Everything from the merge on only touches rows < n_sym, and at
    # q50 93% of 1024-block tiles top out at n_sym <= 16 (max observed
    # 19), so the whole tail specializes on the tile-max: lax.cond picks
    # a [16, TILE] variant (one-hot reads/writes are 3-4x cheaper) or
    # the general [64, TILE] one.
    nmax = jnp.max(n_sym)                             # scalar loop bound
    lo11 = lo & 0x7FF
    hi11 = hi & 0x7FF

    def tail(rows):
        iota_r = jax.lax.broadcasted_iota(I32, (rows, TILE), 0)
        in_rows = iota_r < n_sym

        leafkey = leafkey64[:rows]
        leafw = jnp.where(in_rows, leafkey >> 12, BIG)   # counts, sorted
        leafsym = jnp.where(in_rows, (leafkey & 4095) - 1024, 0)

        # ---- two-queue Huffman merge ------------------------------------
        # Sequential loop steps are the kernel's cost unit, so every loop
        # runs to the TILE-wide data maximum, not the worst case: nmax-1
        # merge steps instead of 63. Parent pointers split into
        # leaf/interior halves so the depth sweep touches [rows, TILE]
        # arrays only.
        def pick(state):
            lh, ih, it, intw, active = state
            lw = _row(leafw, lh, iota_r)
            iw = _row(intw, ih, iota_r)
            leaf_has = lh < n_sym
            int_has = ih < it
            take_leaf = leaf_has & (~int_has | (lw <= iw))
            w = jnp.where(take_leaf, lw, iw)
            node = jnp.where(take_leaf, lh, 64 + ih)
            lh = lh + (take_leaf & active).astype(I32)
            ih = ih + (~take_leaf & active).astype(I32)
            return (lh, ih, it, intw, active), w, node

        def merge_body(s, carry):
            lh, ih, it, intw, parentL, parentI = carry
            active = it < n_sym - 1
            st = (lh, ih, it, intw, active)
            st, w1, node1 = pick(st)
            st, w2, node2 = pick(st)
            lh, ih, it, intw, _ = st
            new_id = 64 + it
            n1 = jnp.where(active, node1, 999)        # sentinel off-range
            n2 = jnp.where(active, node2, 999)
            parentL = jnp.where(iota_r == n1, new_id, parentL)
            parentL = jnp.where(iota_r == n2, new_id, parentL)
            parentI = jnp.where(iota_r == n1 - 64, new_id, parentI)
            parentI = jnp.where(iota_r == n2 - 64, new_id, parentI)
            intw = jnp.where((iota_r == it) & active, w1 + w2, intw)
            it = it + active.astype(I32)
            return lh, ih, it, intw, parentL, parentI

        zero1 = jnp.zeros((1, TILE), I32)
        zeroR = jnp.zeros((rows, TILE), I32)
        lh, ih, it, intw, parentL, parentI = jax.lax.fori_loop(
            0, nmax - 1, merge_body,
            (zero1, zero1, zero1, jnp.full((rows, TILE), BIG, I32),
             zeroR, zeroR))

        # ---- depth sweep: write-based top-down propagation --------------
        # Interior ids descend from the tile-max root 64+nmax-2; every
        # node's parent has a larger id, so when step nid runs, its own
        # depth is final (roots keep the zero init: a root is never
        # consumed, so its parentI entry stays 0, below the id range).
        # Interior depths live in scratch so the per-step read of row
        # nid-64 is a uniform dynamic slice, not a one-hot reduction.
        scr_ref[192:192 + rows, :] = zeroR

        def depth_body(i, leafd):
            nid = 64 + nmax - 2 - i
            d = scr_ref[pl.ds(192 + nid - 64, 1), :] + 1   # [1, TILE]
            scr_ref[192:192 + rows, :] = jnp.where(
                parentI == nid, d, scr_ref[192:192 + rows, :])
            leafd = jnp.where(parentL == nid, d, leafd)
            return leafd

        leafd = jax.lax.fori_loop(0, nmax - 1, depth_body, zeroR)
        leaf_len = jnp.where(n_sym == 1, 1, leafd)    # per sorted-leaf row

        # ---- canonical (len, sym) order + Kraft codes -------------------
        key2 = jnp.where(in_rows, leaf_len * 4096 + leafsym + 1024, BIG)
        key2 = _bitonic(key2, iota_r)
        len_c = jnp.where(in_rows, key2 >> 12, 0)
        sym_c = jnp.where(in_rows, (key2 & 4095) - 1024, 0)
        ok = jnp.min(jnp.where(in_rows, (len_c >= 1) & (len_c <= 8), 1)
                     .astype(I32), axis=0, keepdims=True)

        lc = jnp.clip(len_c, 1, 8)
        kraft = jnp.where(in_rows, 1 << (8 - lc), 0)
        incl = kraft
        s = 1
        while s < rows:
            incl = incl + _shift_down(incl, s)
            s <<= 1
        code_c = (incl - kraft) >> (8 - lc)           # exclusive prefix

        # ---- per-message-position (len, code) lookup --------------------
        # one composite record per step (len 4b | code 8b | sym11), read
        # back from scratch by uniform row index
        canrec = (jnp.clip(len_c, 0, 8) << 19) | ((code_c & 0xFF) << 11) \
            | (sym_c & 0x7FF)
        scr_ref[0:rows, :] = canrec

        def lut_body(c, carry):
            pl_l, pc_l, pl_h, pc_h = carry
            rec = scr_ref[pl.ds(c, 1), :]
            sym = rec & 0x7FF
            live = c < n_sym
            m_l = (lo11 == sym) & live
            m_h = (hi11 == sym) & live
            pl_l = jnp.where(m_l, (rec >> 19) & 15, pl_l)
            pc_l = jnp.where(m_l, (rec >> 11) & 0xFF, pc_l)
            pl_h = jnp.where(m_h, (rec >> 19) & 15, pl_h)
            pc_h = jnp.where(m_h, (rec >> 11) & 0xFF, pc_h)
            return pl_l, pc_l, pl_h, pc_h

        z32 = jnp.zeros((32, TILE), I32)
        pl_l, pc_l, pl_h, pc_h = jax.lax.fori_loop(
            0, nmax, lut_body, (z32, z32, z32, z32))
        l0 = jnp.where(vlo, pl_l, 0)
        l1 = jnp.where(vhi, pl_h, 0)
        enc_bits = jnp.sum(l0 + l1, axis=0, keepdims=True)

        # ---- group structure over canonical rows (Huffman.cpp:300-316) --
        prev_len = _shift_down(len_c, 1) + jnp.where(iota_r == 0, -1, 0)
        run_start = in_rows & (len_c != prev_len)
        # last run start at or before each row: log-scan running max
        lrs = jnp.where(run_start, iota_r, -1)
        s = 1
        while s < rows:
            lrs = jnp.maximum(lrs, _shift_down(lrs, s) +
                              jnp.where(iota_r < s, -64, 0))
            s <<= 1
        idx_in_run = iota_r - lrs
        grp_start = in_rows & (run_start | ((idx_in_run & 31) == 0))
        # next boundary strictly after each row (run start or table end):
        # reverse running min over shifted-up boundary positions
        bpos = jnp.where(run_start | ~in_rows, iota_r, 99)
        nxt = _shift_up(bpos, 1) + jnp.where(iota_r >= rows - 1, 99, 0)
        s = 1
        while s < rows:
            nxt = jnp.minimum(nxt, _shift_up(nxt, s) +
                              jnp.where(iota_r >= rows - s, 99, 0))
            s <<= 1
        nxt = jnp.minimum(nxt, rows)
        gcnt = jnp.minimum(nxt, iota_r + 32) - iota_r  # valid at grp_start
        grp_bytes = jnp.where(grp_start, 1 + (gcnt * 11 + 7) // 8, 0)
        tree_size = jnp.sum(grp_bytes, axis=0, keepdims=True)
        size = 3 + tree_size + (enc_bits + 7) // 8
        ok = ok & (size <= 255).astype(I32)

        # composite per-row tree record (overwrites the LUT rows — the
        # LUT loop is done with them):
        # grp_start(1b)<<28 | in_rows(1b)<<27 | gcnt(6b)<<21 |
        # len(4b)<<17 | (sym+1024)(11b)
        tree_rec = (grp_start.astype(I32) << 28) \
            | (in_rows.astype(I32) << 27) \
            | (jnp.clip(gcnt, 0, 63) << 21) | (lc << 17) | (sym_c & 0x7FF)
        scr_ref[0:rows, :] = tree_rec

        # payload QUADS: the input pair rows combine code (2p, 2p+1)
        # directly; adjacent pair rows then merge into one <=32-bit
        # append — 4 codes per sequential step. Quad values/lengths go
        # to scratch for the uniform-row reads in the append loop.
        c0 = jnp.where(vlo, pc_l, 0) & 0xFF
        c1 = jnp.where(vhi, pc_h, 0) & 0xFF
        pair_rec = ((l0 + l1) << 16) | ((_shl(c0, l1) | c1) & 0xFFFF)
        q2 = _shift_up(pair_rec, 1)                   # next pair row
        scr_ref[64:96, :] = _shl(pair_rec & 0xFFFF, q2 >> 16) \
            | (q2 & 0xFFFF)
        scr_ref[96:128, :] = (pair_rec >> 16) + (q2 >> 16)

        # ---- serialization: sequential bit-append machine ---------------
        # Stream space matches the decoder's: bit-reversed bytes packed
        # big-endian into words, appends fill each word from the MSB down.
        # The register file height specializes on the tile-max chunk size
        # (known before any bit is appended): 16-word files cover every
        # <=64 B chunk and make the per-append spill blend 4x cheaper.
        def serialize(wrows):
            iota_w = jax.lax.broadcasted_iota(I32, (wrows, TILE), 0)

            def append(state, v, L):
                """Append the L-bit value v (MSB-first in stream space);
                L may be 0 (no-op) and varies per lane."""
                W0, nb, wi, regfile = state
                v = jnp.where(L > 0, v, 0)
                sh = 32 - nb - L
                # both branches evaluate: clamp the shifts nonnegative
                W0 = W0 | jnp.where(sh >= 0, _shl(v, jnp.maximum(sh, 0)),
                                    _shr_l(v, jnp.maximum(-sh, 0)))
                newnb = nb + L
                spill = newnb >= 32
                regfile = jnp.where((iota_w == wi) & spill, W0, regfile)
                W0 = jnp.where(spill, _shl(v, 64 - newnb), W0)
                wi = wi + spill.astype(I32)
                nb = jnp.where(spill, newnb - 32, newnb)
                return W0, nb, wi, regfile

            st = (jnp.zeros((1, TILE), I32), jnp.zeros((1, TILE), I32),
                  jnp.zeros((1, TILE), I32),
                  jnp.zeros((wrows, TILE), I32))
            # 3-byte header as ONE 24-bit append (same bit sequence)
            hdr24 = (_bitrev8(enc_bits & 0xFF) << 16) \
                | (_bitrev8(_shr_l(enc_bits, 8) & 0xFF) << 8) \
                | _bitrev8(tree_size & 0xFF)
            st = append(st, hdr24, jnp.full((1, TILE), 24, I32))

            def tree_body(c, st):
                # one fused append per canonical row: [pad][group hdr]
                # [sym] (<= 7+8+11 = 26 bits; leading pad bits are 0)
                rec = scr_ref[pl.ds(c, 1), :]
                g_start = (rec >> 28) & 1
                in_r = (rec >> 27) & 1
                gc = (rec >> 21) & 63
                ln = (rec >> 17) & 15
                v11 = rec & 0x7FF
                nb = st[1]
                pad = (8 - (nb & 7)) & 7
                hdr = _bitrev8(((ln - 1) << 5) | (gc - 1))
                v = jnp.where(in_r > 0, _bitrev11(v11), 0)
                v = v | jnp.where(g_start > 0, hdr << (in_r * 11), 0)
                L = g_start * (pad + 8) + in_r * 11
                return append(st, v, L)

            st = jax.lax.fori_loop(0, nmax, tree_body, st)
            # close the last group to its byte boundary
            W0, nb, wi, regfile = st
            st = append((W0, nb, wi, regfile), jnp.zeros((1, TILE), I32),
                        (8 - (nb & 7)) & 7)

            def pay_body(p, st):
                v = scr_ref[pl.ds(64 + 2 * p, 1), :]
                L = scr_ref[pl.ds(96 + 2 * p, 1), :]
                return append(st, v, L)

            st = jax.lax.fori_loop(0, (mlenmax + 3) // 4, pay_body, st)
            W0, nb, wi, regfile = st
            regfile = jnp.where(iota_w == wi, W0, regfile)  # final flush
            if wrows < 8 + cont:
                regfile = jnp.concatenate(
                    [regfile,
                     jnp.zeros((8 + cont - wrows, TILE), I32)], axis=0)
            # emit the continuation words block-major: the in-VMEM
            # transpose saves the downstream XLA relayout the B gather
            # otherwise pays (1/8 the cost of transposing a full canvas)
            return regfile[8:8 + cont].T, regfile[:8]

        if cont == 8:
            # the 16-word register file covers every emittable chunk
            # (ok already bounds size <= 64 B); the spill blend stays at
            # its cheapest and the 64-word branch never compiles
            wordsT, aT = serialize(16)
        else:
            wmax = jnp.max((size + 3) >> 2)
            wordsT, aT = jax.lax.cond(wmax <= 16, lambda: serialize(16),
                                      lambda: serialize(64))
        ok = ok & (size <= 4 * (8 + cont)).astype(I32)
        return wordsT, aT, size, ok

    wordsT, aT, size, ok = jax.lax.cond(
        nmax <= 16, lambda: tail(16), lambda: tail(64))
    words_ref[...] = wordsT
    a_ref[...] = aT
    size_ref[...] = size
    ok_ref[...] = ok


def _unpack_words(words: jnp.ndarray) -> jnp.ndarray:
    """[N, 64] i32 packed words (block-major) -> [N, 256] u8 lanes
    (inverse of the decoder's _pack_words: big-endian byte split +
    bitrev)."""
    w = words
    parts = [_bitrev8((w >> sh) & 0xFF).astype(jnp.uint8)
             for sh in (24, 16, 8, 0)]
    return jnp.stack(parts, axis=-1).reshape(w.shape[0], 256)


@functools.partial(jax.jit, static_argnames=("cont", "interpret"))
def encode_words_pairs(pairsT: jnp.ndarray, cont: int = 56,
                       interpret: bool = False):
    """[32, N] i32 message-order coefficient pairs (row p holds messages
    2p | 2p+1 << 16; columns are blocks) -> ([N, cont] i32 CONTINUATION
    words block-major (words 8.. of each chunk; cont=8 covers every
    <=64 B chunk at a quarter of the full-canvas HBM traffic, cont=56
    every legal chunk), [8, N] i32 A-region words (first 32 bytes of
    each chunk, word-major), [N] sizes, [N] ok — ok is False for chunks
    larger than the tier, the caller retries roomier).

    Words are in the kernel stream space (bit-reversed bytes packed
    big-endian) — exactly what the Pallas decoder consumes and what the
    word-aligned device interchange stores; the byte-exact on-disk stream
    is one cheap elementwise conversion away (native repack or
    _unpack_words). The pair layout is what the word-packed DCT kernel
    emits after an unpack8 relayout (kernels/pallas_dct8
    dct_quantize_words), so the transform->entropy hop moves 2 bytes per
    coefficient instead of 4."""
    n = pairsT.shape[1]
    pad = (-n) % TILE
    if pad:
        pairsT = jnp.concatenate(
            [pairsT, jnp.zeros((32, pad), I32)], axis=1)
    ntp = pairsT.shape[1]
    grid = (ntp // TILE,)
    words, aT, size, ok = pl.pallas_call(
        _encode_kernel,
        out_shape=(jax.ShapeDtypeStruct((ntp, cont), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32),
                   jax.ShapeDtypeStruct((1, ntp), I32),
                   jax.ShapeDtypeStruct((1, ntp), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((32, TILE), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((TILE, cont), lambda i: (i, 0)),
                   pl.BlockSpec((8, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i)),
                   pl.BlockSpec((1, TILE), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((256, TILE), I32)],
        interpret=interpret,
    )(pairsT)
    return words[:n], aT[:, :n], size[0, :n], ok[0, :n] != 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_words(coeffs: jnp.ndarray, interpret: bool = False):
    """[N, 64] int16 coefficients (element order) -> ([N, 64] i32 FULL
    packed-word canvas block-major, [8, N] A-region words, [N] sizes,
    [N] ok) via the pair kernel (A + continuation words re-joined for
    the canvas consumers: tests, lanes, the sharded aligned path)."""
    zz = jnp.asarray(np.asarray(ZIGZAG, np.int32))
    msg = coeffs.astype(I32)[:, zz]                   # [N, 64] zigzag order
    pairs = (msg[:, 0::2] & 0xFFFF) | (msg[:, 1::2] << 16)   # [N, 32]
    wordsC, aT, size, ok = encode_words_pairs(pairs.T, cont=56,
                                              interpret=interpret)
    words = jnp.concatenate([aT.T, wordsC], axis=1)
    return words, aT, size, ok


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_lanes(coeffs: jnp.ndarray, interpret: bool = False):
    """[N, 64] int16 coefficients -> ([N, 256] u8 lanes, [N] sizes, [N] ok).

    Drop-in replacement for entropy.device.encode_lanes with byte-identical
    output (reference semantics: Huffman.cpp:172-241,279-326)."""
    words, _aT, size, ok = encode_words(coeffs, interpret=interpret)
    return _unpack_words(words), size, ok
