"""Sublane-packed Pallas Huffman encoder: 8 blocks per lane column.

Round-2 successor of entropy/pallas_encode.py (same reference semantics:
Huffman.cpp:172-241,279-326; byte-identical output). The flat kernel keeps
every per-block scalar register as a [1, TILE] vector — one live sublane
of eight — so the sequential serialization machine (the kernel's dominant
cost) runs at 1/8 VPU utilization, and its [32, N] pair input requires a
relayout of the packed-8 DCT kernel's output (measured 4.4 ms/4K frame).
Here blocks ride lanes 8-per-column (block b = c*8 + r at sublane r, lane
c — the layout of kernels/pallas_dct8 and entropy/pallas_decode8), so:

1. the input IS ``dct_quantize_words``'s [256, TP] coefficient-pair
   output — the transform->entropy relayout disappears;
2. every per-block register (bit-append window, cursors, queue heads) is
   a dense [8, TP] vreg — the serialization loops drop to ~1/8 their
   flat vector cost;
3. the A-region register file is emitted in rows 8w + r — exactly the
   packed decoder's W0 window layout, so the decompress side consumes it
   with zero index work;
4. the continuation register file uses the SAME rows-8w+r layout
   (round 3): the [8*cont, NP] continuation tensor IS the decoder's Wc
   window region verbatim, so the whole interchange is dense — no
   compaction gather on compress, no scatter/window-expansion on
   decompress (each measured >1 ms/4K frame). Block-major [N, cont]
   views (host repack) relayout lazily via unpack-style reshapes.

Row-shift identities carry over from the flat kernel with every shift
scaled by 8 (group = 8 physical rows); per-block maxima/sums fold over
row groups (log halving) instead of full-column reductions so the eight
blocks of a lane column never mix.
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
from .pallas_encode import BIG, _bitrev8, _bitrev11, _shl, _shr_l

I32 = jnp.int32
# lane columns per grid program (8 blocks each)
TP = int(os.environ.get("MYYUV_ENC8_TILE", "128"))


def _sd8(x, j):
    """Group shift down: out group g reads x group g - j (low groups 0)."""
    return jnp.concatenate(
        [jnp.zeros((8 * j, x.shape[1]), x.dtype), x[:-8 * j]], axis=0)


def _su8(x, j):
    """Group shift up: out group g reads x group g + j (top groups 0)."""
    return jnp.concatenate(
        [x[8 * j:], jnp.zeros((8 * j, x.shape[1]), x.dtype)], axis=0)


def _sd8f(x, j, fill):
    """Group shift down with an explicit fill value for the low groups
    (folds the scans' boundary-guard adds into the shift)."""
    return jnp.concatenate(
        [jnp.full((8 * j, x.shape[1]), fill, x.dtype), x[:-8 * j]], axis=0)


def _su8f(x, j, fill):
    """Group shift up with an explicit fill value for the top groups."""
    return jnp.concatenate(
        [x[8 * j:], jnp.full((8 * j, x.shape[1]), fill, x.dtype)], axis=0)


def _tile_g(x, groups):
    """[8, TP] -> [groups*8, TP]: row 8g + r reads x[r] (cycle tiling;
    doubles then trims, so any group count works)."""
    while x.shape[0] < groups * 8:
        x = jnp.concatenate([x, x], axis=0)
    return x[:groups * 8]


def _fold_max(x):
    """[G*8, TP] -> [8, TP] per-block max over the G groups (G pow 2)."""
    while x.shape[0] > 8:
        h = x.shape[0] // 2
        x = jnp.maximum(x[:h], x[h:])
    return x


def _fold_min(x):
    while x.shape[0] > 8:
        h = x.shape[0] // 2
        x = jnp.minimum(x[:h], x[h:])
    return x


def _fold_sum(x):
    while x.shape[0] > 8:
        h = x.shape[0] // 2
        x = x[:h] + x[h:]
    return x


def _ortree(terms):
    """Balanced OR-reduction: the left-deep ``a | b | c | ...`` chains
    the one-hot scans used to build are LATENCY-bound on the VPU (the
    round-5 phase measurements moved with chain depth, not op count);
    a pairwise tree cuts the dependency depth to log2(n)."""
    while len(terms) > 1:
        nxt = [a | b for a, b in zip(terms[0::2], terms[1::2])]
        if len(terms) & 1:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _grp_read(x, gidx, groups):
    """One-hot read of per-block group indices: out[r] = x[8*gidx[r]+r]."""
    return _ortree([jnp.where(gidx == g, x[8 * g:8 * g + 8], 0)
                    for g in range(groups)])


def _bitonic8(key):
    """Ascending bitonic sort of the row GROUPS, elementwise per (sublane,
    lane) block slot.

    Each compare-exchange level is emitted as STATIC REGION SLICES: for
    stride j, groups [a, a+j) pair with [a+j, a+2j) and the direction is
    uniform per 2j-block ((a & k) selects it), so the step is one
    min and one max over each slice pair, concatenated back in place —
    no partner materialization (two full group shifts) and no blend
    select. Same comparison network, same results, ~3x fewer vector ops
    per level than the shift+select formulation."""
    rows = key.shape[0] // 8
    k = 2
    while k <= rows:
        j = k >> 1
        while j >= 1:
            pieces = []
            for a in range(0, rows, 2 * j):
                A = key[8 * a:8 * (a + j)]
                B = key[8 * (a + j):8 * (a + 2 * j)]
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


def _encode_body(pw, words_ref, a_ref, size_ref, ok_ref, scr_ref,
                 ablate: str = ""):
    """Shared encoder body: ``pw`` [256, TP] i32 zigzag-ordered
    coefficient PAIR VALUES packed-8 (rows 8p..8p+7 hold messages
    2p | 2p+1 << 16 of the column's 8 blocks — the dct_quantize_words
    layout) -> words [8*cont, TP] i32 (row 8w + r holds continuation
    word 8+w of sublane-block r — the decoder's Wc window region
    verbatim), a [64, TP] i32 (rows 8w + r: the packed decoder's W0
    window layout, directly consumable), size [8, TP], ok [8, TP].

    ``ablate`` (measurement only, tools/exp_encphase.py) skips ONE
    phase's sequential loops while keeping every loop BOUND and tensor
    shape identical, so T(full) - T(ablated) measures that phase's
    cycles: "serial" | "lut" | "merge" | "cansort" (the canonical
    bitonic) | "groups" (the per-length code/group table) |
    "frontonly". The production path ("") is untouched.

    ``scr_ref`` is [1536, TP] VMEM scratch: rows 0..511 the canonical
    LUT records, 512..1023 the payload quads (values + lengths),
    1024..1535 the tree records.
    Sequential loops read them back through UNIFORM dynamic row slices
    (``ref[pl.ds(8*c, 8)]``) — O(1) vector work per step.

    Tier structure: the front (value sort) and the LUT/payload section
    specialize on the tile-max MESSAGE length (16/32/64), the tree
    construction on the tile-max DISTINCT-symbol count (8/16/32/64),
    and the serialization machine is shared across every tier."""
    cont = words_ref.shape[0] // 8
    tp = pw.shape[1]
    lo = (pw << 16) >> 16                             # messages 2p
    hi = pw >> 16                                     # messages 2p+1
    i32g = jax.lax.broadcasted_iota(I32, (256, tp), 0) >> 3
    z8 = jnp.zeros((8, tp), I32)

    # ---- message trim (Huffman.cpp:174-203) -----------------------------
    mlen = _fold_max(jnp.maximum(
        jnp.where(lo != 0, 2 * i32g + 1, 0),
        jnp.where(hi != 0, 2 * i32g + 2, 0)))
    mlen = jnp.maximum(mlen, 1)                      # [8, TP]
    mlen32 = _tile_g(mlen, 32)
    vlo = 2 * i32g < mlen32
    vhi = 2 * i32g + 1 < mlen32
    mlenmax = jnp.max(mlen)

    # ---- distinct symbols + counts via a value sort ---------------------
    # (see pallas_encode._encode_kernel: identical algorithm, group-shifted)
    def front(mrows):
        half = mrows // 2
        ig = jax.lax.broadcasted_iota(I32, (8 * mrows, tp), 0) >> 3
        vals = jnp.concatenate(
            [jnp.where(vlo[:8 * half], lo[:8 * half] + 1024, BIG),
             jnp.where(vhi[:8 * half], hi[:8 * half] + 1024, BIG)], axis=0)
        svals = _bitonic8(vals)
        valid_s = svals < BIG
        prevv = _sd8(svals, 1)
        run_start0 = valid_s & ((ig == 0) | (svals != prevv))
        bnd0 = run_start0 | ~valid_s
        bpos0 = jnp.where(bnd0, ig, 99)
        nxt0 = _su8f(bpos0, 1, 99)
        st = 1
        while st < mrows:
            nxt0 = jnp.minimum(nxt0, _su8f(nxt0, st, 99))
            st <<= 1
        nxt0 = jnp.minimum(nxt0, mrows)
        cnt0 = nxt0 - ig                              # valid at run starts
        n_sym = _fold_sum(run_start0.astype(I32))
        leafkey = _bitonic8(
            jnp.where(run_start0, cnt0 * 4096 + svals, BIG))
        if mrows < 64:
            leafkey = jnp.concatenate(
                [leafkey, jnp.full((8 * (64 - mrows), tp), BIG, I32)],
                axis=0)
        return leafkey, n_sym

    leafkey64, n_sym = jax.lax.cond(
        mlenmax <= 16, lambda: front(16),
        lambda: jax.lax.cond(mlenmax <= 32, lambda: front(32),
                             lambda: front(64)))

    if ablate == "frontonly":
        # measurement stub: everything after the front is skipped
        words_ref[...] = jnp.zeros((words_ref.shape[0], tp), I32)
        a_ref[...] = jnp.zeros((64, tp), I32)
        size_ref[...] = n_sym
        ok_ref[...] = jnp.ones((8, tp), I32)
        return

    nmax = jnp.max(n_sym)                             # scalar loop bound
    lo11 = lo & 0x7FF
    hi11 = hi & 0x7FF

    def tail(rows):
        R = 8 * rows
        ig = jax.lax.broadcasted_iota(I32, (R, tp), 0) >> 3
        n_symR = _tile_g(n_sym, rows)
        in_rows = ig < n_symR

        leafkey = leafkey64[:R]
        leafsym = jnp.where(in_rows, (leafkey & 4095) - 1024, 0)

        # ---- two-queue Huffman merge ------------------------------------
        # Node weights are <= 64 (freq counts of a <=64-symbol message),
        # so both queues pack 4 weights per word: the per-lane indexed
        # head reads scan rows/4 one-hot groups instead of rows, and the
        # interior writes are monotone single-writes so an OR-blend into
        # the packed slot is exact.
        rows4 = rows // 4
        lw8 = jnp.where(in_rows, leafkey >> 12, 127)     # byte sentinel
        pk4 = lw8 | (_su8(lw8, 1) << 8) | (_su8(lw8, 2) << 16) \
            | (_su8(lw8, 3) << 24)
        leafw4 = jnp.concatenate(
            [pk4[32 * g:32 * g + 8] for g in range(rows4)], axis=0)
        ig4 = jax.lax.broadcasted_iota(I32, (8 * rows4, tp), 0) >> 3

        def qread(x4, idx):
            return _shr_l(_grp_read(x4, idx >> 2, rows4),
                          (idx & 3) << 3) & 0xFF

        def pick2(lh, ih, it, intw4, active):
            """BOTH queue picks of one merge step with their four
            candidate heads read in PARALLEL (round 5): the sequential
            pick pair serialized two one-hot reads behind each other —
            the latency chain, not the op count, is what these loops
            pay for. Sentinel 0x3FF outranks every real weight
            (<= 64); the empty-empty case only arises when inactive,
            where every consumer is masked. Tie-breaking (leaf wins
            equals) is a1 <= b1 — identical to the sequential
            ``leaf_has & (~int_has | (lw <= iw))``."""
            la = qread(leafw4, lh)
            lb = qread(leafw4, lh + 1)
            ia = qread(intw4, ih)
            ib = qread(intw4, ih + 1)
            a1 = jnp.where(lh < n_sym, la, 0x3FF)
            a2 = jnp.where(lh + 1 < n_sym, lb, 0x3FF)
            b1 = jnp.where(ih < it, ia, 0x3FF)
            b2 = jnp.where(ih + 1 < it, ib, 0x3FF)
            t1 = a1 <= b1
            w1 = jnp.minimum(a1, b1)
            node1 = jnp.where(t1, lh, 64 + ih)
            a_next = jnp.where(t1, a2, a1)
            b_next = jnp.where(t1, b1, b2)
            t2 = a_next <= b_next
            w2 = jnp.minimum(a_next, b_next)
            node2 = jnp.where(
                t2, jnp.where(t1, lh + 1, lh),
                64 + jnp.where(t1, ih, ih + 1))
            nl = (t1.astype(I32) + t2.astype(I32)) \
                * active.astype(I32)
            lh = lh + nl
            ih = ih + 2 * active.astype(I32) - nl
            return lh, ih, w1, w2, node1, node2

        def merge_body(s, carry):
            # leaf depths by ANCESTOR TRACKING, SWAR-packed 4 leaves
            # per word (round 5): each sorted-leaf row keeps its
            # current subtree-root node id; when that node merges, the
            # leaf sits one level deeper. Node ids <= 126 and depths
            # <= 63 fit bytes, so the [R, tp] compare/select/add of
            # round 4 shrinks 4x to [2*rows, tp] byte-lane ops
            # (inactive sentinel 127 collides with no node id).
            lh, ih, it, intw4, anc4, leafd4 = carry
            active = it < n_sym - 1
            lh, ih, w1, w2, node1, node2 = pick2(lh, ih, it, intw4,
                                                 active)
            new_id = 64 + it
            n1x = _tile_g(jnp.where(active, node1, 127) * 0x01010101,
                          rows4)
            n2x = _tile_g(jnp.where(active, node2, 127) * 0x01010101,
                          rows4)
            x1 = anc4 ^ n1x
            z1 = ((x1 & 0x7F7F7F7F) + 0x7F7F7F7F) | x1
            x2 = anc4 ^ n2x
            z2 = ((x2 & 0x7F7F7F7F) + 0x7F7F7F7F) | x2
            m80 = (~(z1 & z2)) & jnp.int32(0x80808080 - (1 << 32))
            inc = _shr_l(m80, 7)             # 0x01 per matched byte
            bm = inc * 255                   # 0xFF per matched byte
            newb = _tile_g(new_id * 0x01010101, rows4)
            anc4 = (anc4 & ~bm) | (newb & bm)
            leafd4 = leafd4 + inc            # bytes <= 63: no carries
            wsh = _shl(_tile_g(jnp.where(active, w1 + w2, 0), rows4),
                       _tile_g((it & 3) << 3, rows4))
            intw4 = intw4 | jnp.where(ig4 == _tile_g(it >> 2, rows4),
                                      wsh, 0)
            it = it + active.astype(I32)
            return lh, ih, it, intw4, anc4, leafd4

        # packed byte-iota ancestors: group g4 byte j holds leaf 4g4+j
        anc0 = (ig4 << 2) * 0x01010101 + 0x03020100
        init = (z8, z8, z8, jnp.zeros((8 * rows4, tp), I32), anc0,
                jnp.zeros((8 * rows4, tp), I32))
        if ablate == "merge":
            lh, ih, it, intw4, anc4, leafd4 = init
        else:
            lh, ih, it, intw4, anc4, leafd4 = jax.lax.fori_loop(
                0, nmax - 1, merge_body, init)

        # unpack the byte-packed depths back to one row group per leaf
        leafd = jnp.concatenate(
            [_shr_l(leafd4[8 * (g // 4):8 * (g // 4) + 8],
                    8 * (g % 4)) & 0xFF for g in range(rows)], axis=0)
        leaf_len = jnp.where(n_symR == 1, 1, leafd)   # per sorted-leaf row

        # ---- canonical (len, sym) order + Kraft codes -------------------
        key2 = jnp.where(in_rows, leaf_len * 4096 + leafsym + 1024, BIG)
        if ablate != "cansort":
            key2 = _bitonic8(key2)
        len_c = jnp.where(in_rows, key2 >> 12, 0)
        sym_c = jnp.where(in_rows, (key2 & 4095) - 1024, 0)
        ok = _fold_min(jnp.where(
            in_rows, ((len_c >= 1) & (len_c <= 8)).astype(I32), 1))

        lc = jnp.clip(len_c, 1, 8)
        # Per-length arithmetic (round 5) replaces the Kraft prefix scan
        # AND both group-boundary scan networks of round 4 (three
        # log-depth [R, tp] scans): the canonical order groups equal
        # lengths contiguously, so a row of length L at canonical index
        # i has
        #   code = fc[L] + (i - cb[L])    (== the exclusive Kraft
        #                                  prefix >> (8-L), exactly)
        #   run boundaries at cb[L] and cb[L] + cnt[L]
        # with fc[l+1] = (fc[l] + cnt[l]) << 1 — the same first_code
        # recurrence the decoder derives from its counts table
        # (Huffman.cpp:300-316; entropy/pallas_decode8._payload_body).
        # Lengths beyond 8 (too-skewed trees) already flipped ``ok``;
        # their garbage codes are discarded with the chunk.
        cnt = [_fold_sum((jnp.where(in_rows, lc, 0) == L).astype(I32))
               for L in range(1, 9)]                  # [8, tp] each
        fcl = z8
        cbl = z8
        rec8 = []
        for L in range(8):
            rec8.append(((fcl & 0x7FF) << 20)
                        | ((cbl + cnt[L]) << 10) | cbl)
            fcl = (fcl + cnt[L]) << 1
            cbl = cbl + cnt[L]
        if ablate == "groups":
            pk = jnp.zeros((R, tp), I32)
        else:
            pk = _ortree([jnp.where(lc == L + 1,
                                    _tile_g(rec8[L], rows), 0)
                          for L in range(8)])
        cbR = pk & 0x3FF
        endR = (pk >> 10) & 0x3FF
        fcR = _shr_l(pk, 20)
        idx_in_run = ig - cbR
        code_c = fcR + idx_in_run

        # ---- per-message-position (len, code) lookup records -------------
        # one packed record per canonical row: (len << 20 | code << 12)
        # selects as a unit, and bit 11 of the key marks live rows so
        # dead rows (len 0, sym 0) can never match a real 0 symbol —
        # the msg_lut cond below scans them at MESSAGE-height tiers
        canrec = (jnp.clip(len_c, 0, 15) << 20) | ((code_c & 0xFF) << 12) \
            | (in_rows.astype(I32) << 11) | (sym_c & 0x7FF)
        scr_ref[0:R, :] = canrec

        # ---- group structure over canonical rows (Huffman.cpp:300-316):
        # derived from the same per-length table — a length run starts
        # at cb[L] (idx_in_run == 0), splits every 32 symbols, and ends
        # at cb[L] + cnt[L]
        grp_start = in_rows & ((idx_in_run & 31) == 0)
        gcnt = jnp.minimum(endR, ig + 32) - ig        # valid at grp_start
        grp_bytes = jnp.where(grp_start, 1 + (gcnt * 11 + 7) // 8, 0)
        tree_size = _fold_sum(grp_bytes)

        # tree records land at scr rows 1024.. (canrec keeps 0..R for
        # the message-height-tiered LUT cond that runs after this one)
        tree_rec = (grp_start.astype(I32) << 28) \
            | (in_rows.astype(I32) << 27) \
            | (jnp.clip(gcnt, 0, 63) << 21) | (lc << 17) | (sym_c & 0x7FF)
        scr_ref[1024:1024 + R, :] = tree_rec
        return tree_size, ok

    # nmax-tiered tree construction (merge/depths/canonical/groups)
    tree_size, ok = jax.lax.cond(
        nmax <= 8, lambda: tail(8),
        lambda: jax.lax.cond(
            nmax <= 16, lambda: tail(16),
            lambda: jax.lax.cond(nmax <= 32, lambda: tail(32),
                                 lambda: tail(64))))

    # ---- per-message-position (len, code) lookup ------------------------
    # scans the canonical records against the messages at MESSAGE-height
    # tiers (positions past mlenmax are dead for the whole tile), and
    # writes the payload QUADS (4 codes per append step) to scr 512..
    lo12 = lo11 | 0x800
    hi12 = hi11 | 0x800

    def msg_lut(mrows):
        mR = 4 * mrows                     # live pair rows
        lo12m = lo12[:mR]
        hi12m = hi12[:mR]

        def lut_body(c, carry):
            # EIGHT canonical records per trip (round 5): the loop is
            # latency-bound on its carried select chain + per-trip
            # overhead, not on vector throughput (op-count cuts moved
            # nothing, halving trips cut the phase 25% — PERF_NOTES
            # round-5), so trip count is the lever. Tail records past
            # nmax mask to a key no message carries (-1: live messages
            # set bit 11); their row reads stay inside the canrec
            # region because the record index is < 8*ceil(nmax/8)
            # <= rows of the active tier (tiers are multiples of 8).
            # Each trip's matches are disjoint (distinct symbols), so
            # the selects combine as a balanced OR of masked values
            # onto the carry.
            lc_l, lc_h = carry
            recs = [_tile_g(scr_ref[pl.ds(64 * c + 8 * j, 8), :],
                            mrows // 2) for j in range(8)]
            keys = [recs[0] & 0xFFF] + [
                jnp.where(8 * c + j < nmax, recs[j] & 0xFFF, -1)
                for j in range(1, 8)]
            lcs = [r >> 12 for r in recs]
            lc_l = lc_l | _ortree(
                [jnp.where(lo12m == keys[j], lcs[j], 0)
                 for j in range(8)])
            lc_h = lc_h | _ortree(
                [jnp.where(hi12m == keys[j], lcs[j], 0)
                 for j in range(8)])
            return lc_l, lc_h

        zm = jnp.zeros((mR, tp), I32)
        lc_l, lc_h = ((zm, zm) if ablate == "lut"
                      else jax.lax.fori_loop(0, (nmax + 7) // 8,
                                             lut_body, (zm, zm)))
        l0 = jnp.where(vlo[:mR], lc_l >> 8, 0)
        l1 = jnp.where(vhi[:mR], lc_h >> 8, 0)
        enc_bits = _fold_sum(l0 + l1)                 # [8, TP]
        c0 = jnp.where(vlo[:mR], lc_l, 0) & 0xFF
        c1 = jnp.where(vhi[:mR], lc_h, 0) & 0xFF
        pair_rec = ((l0 + l1) << 16) | ((_shl(c0, l1) | c1) & 0xFFFF)
        q2 = _su8(pair_rec, 1)                        # next pair group
        scr_ref[512:512 + mR, :] = _shl(pair_rec & 0xFFFF, q2 >> 16) \
            | (q2 & 0xFFFF)
        scr_ref[768:768 + mR, :] = (pair_rec >> 16) + (q2 >> 16)
        return enc_bits

    enc_bits = jax.lax.cond(
        mlenmax <= 16, lambda: msg_lut(16),
        lambda: jax.lax.cond(mlenmax <= 32, lambda: msg_lut(32),
                             lambda: msg_lut(64)))

    size = 3 + tree_size + (enc_bits + 7) // 8
    ok = ok & (size <= 255).astype(I32) \
        & (size <= 4 * (8 + cont)).astype(I32)

    # ---- serialization: sequential bit-append machine (shared across
    # every tier — reads records back through uniform scr rows) ----------
    # Stream space matches the decoder's (bit-reversed bytes packed
    # big-endian, each word filled MSB-down). Per-block state is one
    # dense [8, TP] vreg; spills blend into ONE combined word file
    # (rows 8w + r: words 0..7 = the decoder's W0 layout, 8.. = its Wc
    # region) — a single iota compare per append instead of the split
    # A/C blends of round 4 (one fewer tile_g chain per append).
    iota_f = jax.lax.broadcasted_iota(I32, (8 * (8 + cont), tp), 0) >> 3

    def append(state, v, L):
        """Append the L-bit value v (MSB-first in stream space);
        L may be 0 (no-op) and varies per block."""
        W0, nb, wi, fW = state
        v = jnp.where(L > 0, v, 0)
        sh = 32 - nb - L
        W0 = W0 | jnp.where(sh >= 0, _shl(v, jnp.maximum(sh, 0)),
                            _shr_l(v, jnp.maximum(-sh, 0)))
        newnb = nb + L
        spill = newnb >= 32
        wS = jnp.where(spill, wi, -1)
        fW = jnp.where(iota_f == _tile_g(wS, 8 + cont),
                       _tile_g(W0, 8 + cont), fW)
        W0 = jnp.where(spill, _shl(v, 64 - newnb), W0)
        wi = wi + spill.astype(I32)
        nb = jnp.where(spill, newnb - 32, newnb)
        return W0, nb, wi, fW

    st = (z8, z8, z8, jnp.zeros((8 * (8 + cont), tp), I32))
    if ablate == "serial":
        words_ref[...] = st[3][64:]
        a_ref[...] = st[3][:64]
        size_ref[...] = size
        ok_ref[...] = ok
        return
    # 3-byte header as ONE 24-bit append (same bit sequence)
    hdr24 = (_bitrev8(enc_bits & 0xFF) << 16) \
        | (_bitrev8(_shr_l(enc_bits, 8) & 0xFF) << 8) \
        | _bitrev8(tree_size & 0xFF)
    st = append(st, hdr24, jnp.full((8, tp), 24, I32))

    def tree_body(c, st):
        # one fused append per canonical row: [pad][group hdr][sym]
        rec = scr_ref[pl.ds(1024 + 8 * c, 8), :]
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

    def tree_body4(t4, st):
        # four appends per trip (latency-bound loops — PERF_NOTES r5);
        # tail rows c in [nmax, 4*ceil(nmax/4)) stay inside the written
        # tree-record region (tier rows are multiples of 4 and
        # nmax <= rows) and carry in_r = g_start = 0, so their appends
        # are L = 0 (no-ops)
        for j in range(4):
            st = tree_body(4 * t4 + j, st)
        return st

    st = jax.lax.fori_loop(0, (nmax + 3) // 4, tree_body4, st)
    # close the last group to its byte boundary
    W0, nb, wi, fW = st
    st = append((W0, nb, wi, fW), z8, (8 - (nb & 7)) & 7)

    qtrips = (mlenmax + 3) // 4

    def pay_body(p, st):
        # the odd-tail quad row p = qtrips sits at the region boundary
        # (rows 768/1024) — mask its append to L = 0 instead of
        # consuming a foreign record
        live = p < qtrips
        v = scr_ref[pl.ds(512 + 16 * p, 8), :]
        L = jnp.where(live, scr_ref[pl.ds(768 + 16 * p, 8), :], 0)
        return append(st, v, L)

    def pay_body4(p4, st):
        for j in range(4):
            st = pay_body(4 * p4 + j, st)
        return st

    st = jax.lax.fori_loop(0, (qtrips + 3) // 4, pay_body4, st)
    W0, nb, wi, fW = st
    # final flush of the partial word
    fW = jnp.where(iota_f == _tile_g(wi, 8 + cont),
                   _tile_g(W0, 8 + cont), fW)
    words_ref[...] = fW[64:]
    a_ref[...] = fW[:64]
    size_ref[...] = size
    ok_ref[...] = ok


def _encode_kernel8(pair_ref, words_ref, a_ref, size_ref, ok_ref, scr_ref):
    """Pair-input entry: see _encode_body."""
    _encode_body(pair_ref[...], words_ref, a_ref, size_ref, ok_ref,
                 scr_ref)


def _dct_encode_kernel8(x_ref, qt_ref, pid_ref, words_ref, a_ref,
                        size_ref, ok_ref, scr_ref, ablate: str = ""):
    """Fused transform + entropy encode: x [128, TP] i32 pixel quad
    words (packed-8, 4 px/word) -> the encoder outputs, with the
    [256, TP] coefficient-pair tensor living only in VMEM — the
    unfused pipeline writes + reads it through HBM (36 MB/4K frame).
    Same math as kernels/pallas_dct8._dct_quantize_kernel8p followed by
    _encode_body (reference semantics: DCT.cpp:269-323 +
    Huffman.cpp:172-241,279-326)."""
    from ..kernels.pallas_dct8 import _dctq_pairs, _qt_select
    qp = _qt_select(qt_ref, pid_ref)
    _encode_body(_dctq_pairs(x_ref[...], qp), words_ref, a_ref,
                 size_ref, ok_ref, scr_ref, ablate)


@functools.partial(jax.jit,
                   static_argnames=("cont", "interpret", "tile", "ablate"))
def dct_encode_words_packed(xw: jnp.ndarray, qtx: jnp.ndarray,
                            pids: jnp.ndarray, cont: int = 8,
                            interpret: bool = False,
                            tile: int | None = None,
                            ablate: str = ""):
    """Fused DCT+quantize+Huffman-encode: [128, NP] i32 pixel quad words
    (+ [3*512, 1] expanded qtables, [1, NP] plane ids) ->
    (C [8*cont, NP] i32 — the decoder's Wc window region verbatim,
    A [64, NP] i32 — the decoder's W0 region, sizes [NP*8], ok [NP*8]).
    NP must already be a tile multiple (the compress path pads at pixel
    packing)."""
    tp = tile or TP
    ntp = xw.shape[1]
    grid = (ntp // tp,)
    C, A, size8, ok8 = pl.pallas_call(
        functools.partial(_dct_encode_kernel8, ablate=ablate),
        out_shape=(jax.ShapeDtypeStruct((8 * cont, ntp), I32),
                   jax.ShapeDtypeStruct((64, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((128, tp), lambda i: (0, i)),
                  pl.BlockSpec((1536, 1), lambda i: (0, 0)),
                  pl.BlockSpec((1, tp), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((8 * cont, tp), lambda i: (0, i)),
                   pl.BlockSpec((64, tp), lambda i: (0, i)),
                   pl.BlockSpec((8, tp), lambda i: (0, i)),
                   pl.BlockSpec((8, tp), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((1536, tp), I32)],
        interpret=interpret,
    )(xw, qtx, pids)
    return C, A, size8.T.reshape(ntp * 8), ok8.T.reshape(ntp * 8) != 0


@functools.partial(jax.jit, static_argnames=("cont", "interpret", "tile"))
def encode_words_packed(pairs8: jnp.ndarray, cont: int = 8,
                        interpret: bool = False, tile: int | None = None):
    """[256, NP] i32 packed-8 coefficient pairs (dct_quantize_words
    layout; lane columns beyond the real block count may carry pad
    blocks — their outputs are valid chunks the caller ignores) ->
    (C [8*cont, NP_t] i32 continuation words in the decoder's Wc window
    layout (row 8w + r = word 8+w of block 8c + r; NP_t = NP padded to
    the tile), A [64, NP_t] i32 — every chunk's first 8 words in the
    packed decoder's W0 layout, sizes [NP_t*8], ok [NP_t*8]).

    Words live in the kernel stream space (bit-reversed bytes packed
    big-endian): (A, C) feed decode_words8_packed_split directly and the
    on-disk stream is one linear host pass away (native.repack_split)."""
    tp = tile or TP
    npc = pairs8.shape[1]
    pad = (-npc) % tp
    if pad:
        pairs8 = jnp.concatenate(
            [pairs8, jnp.zeros((256, pad), I32)], axis=1)
    ntp = pairs8.shape[1]
    grid = (ntp // tp,)
    C, A, size8, ok8 = pl.pallas_call(
        _encode_kernel8,
        out_shape=(jax.ShapeDtypeStruct((8 * cont, ntp), I32),
                   jax.ShapeDtypeStruct((64, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32),
                   jax.ShapeDtypeStruct((8, ntp), I32)),
        grid=grid,
        in_specs=[pl.BlockSpec((256, tp), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((8 * cont, tp), lambda i: (0, i)),
                   pl.BlockSpec((64, tp), lambda i: (0, i)),
                   pl.BlockSpec((8, tp), lambda i: (0, i)),
                   pl.BlockSpec((8, tp), lambda i: (0, i))),
        scratch_shapes=[pltpu.VMEM((1536, tp), I32)],
        interpret=interpret,
    )(pairs8)
    return C, A, size8.T.reshape(ntp * 8), ok8.T.reshape(ntp * 8) != 0


@functools.partial(jax.jit, static_argnames=("cont", "interpret", "tile"))
def encode_words8(coeffs: jnp.ndarray, cont: int = 56,
                  interpret: bool = False, tile: int | None = None):
    """[N, 64] int16 coefficients (element order) -> ([N, 8+cont] i32
    packed-word canvas block-major, A [64, ceil8(N)], [N] sizes, [N] ok)
    via the packed pair kernel (test/interop entry; the frame path feeds
    packed pairs directly)."""
    from ..kernels.pallas_dct8 import pack_rows8
    n = coeffs.shape[0]
    zz = jnp.asarray(np.asarray(ZIGZAG, np.int32))
    msg = coeffs.astype(I32)[:, zz]                   # [N, 64] zigzag order
    pairs = (msg[:, 0::2] & 0xFFFF) | (msg[:, 1::2] << 16)   # [N, 32]
    padn = (-n) % 8
    if padn:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((padn, 32), I32)], axis=0)
    from ..kernels.pallas_dct8 import unpack_rows8
    C, A, sizes, ok = encode_words_packed(
        pack_rows8(pairs), cont=cont, interpret=interpret, tile=tile)
    words = jnp.concatenate([unpack_rows8(A), unpack_rows8(C)], axis=1)
    return words[:n], A, sizes[:n], ok[:n]


def encode_lanes8(coeffs: jnp.ndarray, interpret: bool = False,
                  tile: int | None = None):
    """[N, 64] int16 -> ([N, 256] u8 lanes, [N] sizes, [N] ok): drop-in
    equivalent of pallas_encode.encode_lanes via the packed kernel."""
    from .pallas_encode import _unpack_words
    words, _A, sizes, ok = encode_words8(coeffs, cont=56,
                                         interpret=interpret, tile=tile)
    return _unpack_words(words), sizes, ok
