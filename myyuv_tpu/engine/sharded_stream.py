"""Sharded flagship codec: the dense-interchange frame pipeline under
``jax.shard_map``.

Round 2 sharded the round-1 flat encoder; this module puts the
PRODUCTION pipeline — pixel packing, fused DCT+quantize+Huffman-encode,
dense two-region interchange, fused decode+IDCT — under ``shard_map``
over the device mesh. Plane BLOCK ROWS shard contiguously over the
mesh's flattened (data, block) axes (the TPU-native generalization of
the reference's OpenMP block loop, DCT.cpp:294-296): device d owns each
plane's row slab [d*rows_loc, (d+1)*rows_loc), compresses it with the
same kernels as the single-device path, and emits its own dense (A, C)
interchange segment plus chunk sizes. Blocks are independent in the
format (per-block Huffman tables, DCT.cpp:16-33), so every per-block
chunk is byte-identical to the single-device encoder's, and assembling
the per-device segments in (plane, device) order reproduces the
single-device stream byte for byte (tests/test_sharded_stream.py).

Chroma planes pad their rows to a multiple of 8*n_dev before sharding
(4K chroma is 1504 rows — not divisible by 8 devices at block-row
granularity); pad blocks encode as valid chunks that sit at the global
tail of each plane's stream and are dropped at assembly.

The batch API composes ``parallel.distributed.shard_batch`` (frames
over the data axis) with the sharded compress and
``parallel.distributed.gather_streams`` (the cross-process ragged
gather) into a single sharded-batch -> valid ``.myyuv`` streams path.
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


def _pad_rows(p: np.ndarray, mult: int) -> np.ndarray:
    """Pad a [H, W] plane's rows up to a multiple of ``mult``."""
    h = p.shape[0]
    pad = (-h) % mult
    if not pad:
        return p
    return np.concatenate([p, np.zeros((pad, p.shape[1]), p.dtype)])


def _compress_planes_body(y, u, v, qt_y, qt_u, qt_v,
                          precision: str, cont: int):
    """Per-device compress of one device's plane slabs -> (A, C, sizes,
    ok[1]).

    Identical pipeline to device_stream.compress_frame, but the three
    plane slabs carry independent geometry (sharded chroma rows are
    padded independently of luma). Local block order: Y slab raster,
    then U, then V — the global stream order restricted to this
    device's rows.
    """
    ny = (y.shape[0] // 8) * (y.shape[1] // 8)
    nc = (u.shape[0] // 8) * (u.shape[1] // 8)
    n = ny + 2 * nc
    packed = (precision == "exact" and ny % 8 == 0 and nc % 8 == 0
              and y.shape[0] % 8 == 0 and u.shape[0] % 8 == 0
              and jax.default_backend() not in ("cpu",))
    if packed:
        from ..entropy import pallas_encode8 as pe8
        from ..kernels import pallas_dct8 as p8
        uv = jnp.concatenate([u, v], axis=0)   # one chroma relayout
        parts = [p8.pack_pixel_words(y), p8.pack_pixel_words(uv)]
        xw = jnp.concatenate(parts, axis=1)
        padc = (-(n // 8)) % p8.TILE
        if padc:
            xw = jnp.concatenate(
                [xw, jnp.zeros((128, padc), jnp.int32)], axis=1)
        qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
        pids = p8.plane_pids(ny, nc, padc)
        C, A, sizes, ok = pe8.dct_encode_words_packed(
            xw, qtx, pids, cont=cont)
        return A, C, sizes[:n], jnp.all(ok[:n])[None]
    by = kdev.plane_to_blocks(y)
    bu = kdev.plane_to_blocks(u)
    bv = kdev.plane_to_blocks(v)
    coeffs = jnp.concatenate([
        ds._fwd_transform(by.reshape(ny, 64), qt_y, precision),
        ds._fwd_transform(bu.reshape(nc, 64), qt_u, precision),
        ds._fwd_transform(bv.reshape(nc, 64), qt_v, precision)])
    words, aT, sizes, ok = ds._encode_words_dispatch(coeffs)
    A, C, sizes, _total, okk = ds._dense_from_words(
        words, aT, sizes, jnp.all(ok), cont)
    return A, C, sizes, okk[None]


def _decompress_planes_body(A, C, sizes, qt_y, qt_u, qt_v,
                            hy: int, wy: int, hc: int, wc: int,
                            precision: str):
    """Per-device decompress of one dense interchange segment ->
    (y slab, u slab, v slab, ok[1])."""
    ny = (hy // 8) * (wy // 8)
    nc = (hc // 8) * (wc // 8)
    n = ny + 2 * nc
    sizes = sizes.astype(jnp.int32)
    sizes_r = ds._chunk_rows(sizes)
    cw = 8 + C.shape[0] // 8
    okr = jnp.all(sizes_r <= cw // ds.ALIGN_W)
    packed = (precision == "exact" and ny % 8 == 0 and nc % 8 == 0
              and jax.default_backend() not in ("cpu",))
    if packed:
        from ..entropy import pallas_decode8 as pd8
        from ..kernels import pallas_dct8 as p8
        qtx = p8.expand_qtables((qt_y, qt_u, qt_v))
        pids = p8.plane_pids(ny, nc, A.shape[1] - n // 8)
        pixw, ok = pd8.decode_idct_words8_split(A, C, qtx, pids)
        y = p8.unpack_pixel_words(pixw[:, :ny // 8], hy, wy)
        uvp = p8.unpack_pixel_words(
            pixw[:, ny // 8:n // 8], 2 * hc, wc)
        return y, uvp[:hc], uvp[hc:], (jnp.all(ok) & okr)[None]
    coeffs, ok = ds._decode_words8_dispatch(A, C, n)
    py = ds._inv_transform(coeffs[:ny], qt_y, precision)
    pu = ds._inv_transform(coeffs[ny:ny + nc], qt_u, precision)
    pv = ds._inv_transform(coeffs[ny + nc:], qt_v, precision)
    y = kdev.blocks_to_plane(py.reshape(ny, 8, 8), hy, wy)
    u = kdev.blocks_to_plane(pu.reshape(nc, 8, 8), hc, wc)
    v = kdev.blocks_to_plane(pv.reshape(nc, 8, 8), hc, wc)
    return y, u, v, (jnp.all(ok) & okr)[None]


_CODEC_CACHE = {}


def _sharded_codec(mesh, precision: str, cont: int, hc: int, wc: int,
                   hy: int, wy: int):
    """Jitted shard_map (compress, decompress) for per-device slab
    geometry (hy, wy) / (hc, wc)."""
    key = (id(mesh), precision, cont, hy, wy, hc, wc)
    if key in _CODEC_CACHE:
        return _CODEC_CACHE[key]
    shp = P(AXES, None)        # plane rows over the flattened mesh
    shc = P(None, AXES)        # interchange lane columns
    shs = P(AXES)              # sizes / ok
    rep = P()

    def cbody(y, u, v, qy, qu, qv):
        return _compress_planes_body(y, u, v, qy, qu, qv, precision, cont)

    def dbody(A, C, sizes, qy, qu, qv):
        return _decompress_planes_body(A, C, sizes, qy, qu, qv,
                                       hy, wy, hc, wc, precision)

    def kbody(A, C, sizes):
        # per-device pull compaction: the d2h link must not carry the
        # dense C (device_stream module docstring); the capacity tier
        # equals cont, which covers every live continuation row exactly
        # — ok is still surfaced so the caller can assert that
        from ..kernels.pallas_dct8 import unpack_rows8
        c_bm = unpack_rows8(C)
        _, cB, _, _, ok = ds._compact_split(
            c_bm, A, sizes, jnp.bool_(True), C.shape[0] // 8)
        return cB, ok[None]

    # check_vma=False: bodies are purely per-device (no collectives) and
    # the entropy kernels' scans carry literal starts
    compress = jax.jit(jax.shard_map(
        cbody, mesh=mesh, check_vma=False,
        in_specs=(shp, shp, shp, rep, rep, rep),
        out_specs=(shc, shc, shs, shs)))
    decompress = jax.jit(jax.shard_map(
        dbody, mesh=mesh, check_vma=False,
        in_specs=(shc, shc, shs, rep, rep, rep),
        out_specs=(shp, shp, shp, shs)))
    compact = jax.jit(jax.shard_map(
        kbody, mesh=mesh, check_vma=False,
        in_specs=(shc, shc, shs), out_specs=(shs, shs)))
    _CODEC_CACHE[key] = (compress, decompress, compact)
    return _CODEC_CACHE[key]


def _slab_geometry(h: int, w: int, n_dev: int):
    """(padded plane rows, per-device slab rows) at block granularity."""
    hpad = -(-h // (8 * n_dev)) * (8 * n_dev)
    return hpad, hpad // n_dev


def compress_frame_sharded(mesh, planes_np, qtables_np,
                           precision: str = "exact"):
    """Host API: (y, u, v) planes -> [(sizes u8, content u8)] per plane
    via the mesh — byte-identical to the single-device
    compress_frame_to_streams output.

    Every device compresses its contiguous block-row slab of each plane
    with the production kernels; the per-device dense segments are
    repacked and concatenated in (plane, device) order, dropping the
    chroma row-padding chunks at each plane's tail.
    """
    n_dev = mesh.devices.size
    y, u, v = [np.ascontiguousarray(p) for p in planes_np]
    hy, wy = y.shape
    hc, wc = u.shape
    _, hy_loc = _slab_geometry(hy, wy, n_dev)
    _, hc_loc = _slab_geometry(hc, wc, n_dev)
    yp = _pad_rows(y, 8 * n_dev)
    up = _pad_rows(u, 8 * n_dev)
    vp = _pad_rows(v, 8 * n_dev)
    sh = NamedSharding(mesh, P(AXES, None))
    args = [jax.device_put(jnp.asarray(p), sh) for p in (yp, up, vp)]
    qts = [jnp.asarray(q) for q in qtables_np]
    A = C = sizes = compact = None
    for cont in ds.CONT_LADDER:
        compress, _, compact = _sharded_codec(mesh, precision, cont,
                                              hc_loc, wc, hy_loc, wy)
        A, C, sizes, ok = compress(*args, *qts)
        if bool(jnp.all(ok)):
            break
    else:
        raise BitstreamError("sharded device compress overflow/failure")
    cB, cok = compact(A, C, sizes)  # per-device live rows (d2h-friendly)
    if not bool(jnp.all(cok)):
        raise BitstreamError("sharded pull compaction overflowed")
    return _assemble_streams(np.asarray(A), np.asarray(cB),
                             np.asarray(sizes).astype(np.int32),
                             n_dev, hy, wy, hc, wc, hy_loc, hc_loc)


def _assemble_streams(A, cB, sizes, n_dev, hy, wy, hc, wc, hy_loc, hc_loc):
    """Per-device (A, compacted continuation rows) segments -> per-plane
    (sizes u8, content u8), dropping row-padding chunks (they sit at
    each plane's global tail)."""
    from .. import native
    ny = (hy // 8) * (wy // 8)
    nc = (hc // 8) * (wc // 8)
    ny_loc = (hy_loc // 8) * (wy // 8)
    nc_loc = (hc_loc // 8) * (wc // 8)
    n_loc = ny_loc + 2 * nc_loc
    ntp_loc = A.shape[1] // n_dev
    capw_loc = cB.size // n_dev
    out_sizes: List[List[np.ndarray]] = [[], [], []]
    out_content: List[List[np.ndarray]] = [[], [], []]
    for d in range(n_dev):
        A_d = A[:, d * ntp_loc:(d + 1) * ntp_loc]
        b_d = cB[d * capw_loc:(d + 1) * capw_loc].reshape(-1, ds.ALIGN_W)
        sizes_d = sizes[d * n_loc:(d + 1) * n_loc]
        packed = native.repack_split(A_d, b_d, sizes_d)
        offs = np.cumsum(sizes_d.astype(np.int64)) - sizes_d
        for p, (lo, cnt_loc, cnt_glob) in enumerate(
                ((0, ny_loc, ny), (ny_loc, nc_loc, nc),
                 (ny_loc + nc_loc, nc_loc, nc))):
            live = max(0, min(cnt_loc, cnt_glob - d * cnt_loc))
            if not live:
                continue
            s = sizes_d[lo:lo + live]
            base = int(offs[lo])
            out_sizes[p].append(s.astype(np.uint8))
            out_content[p].append(
                packed[base:base + int(s.astype(np.int64).sum())])
    return [(np.concatenate(out_sizes[p]), np.concatenate(out_content[p]))
            for p in range(3)]


def decompress_frame_sharded(mesh, streams, qtables_np, h: int, w: int,
                             precision: str = "exact"):
    """Host API: per-plane (sizes, content) -> (y, u, v) planes via the
    mesh (inverse partitioning of compress_frame_sharded)."""
    from .. import native
    n_dev = mesh.devices.size
    hy, wy = h, w
    hc, wc = h // 2, w // 2
    _, hy_loc = _slab_geometry(hy, wy, n_dev)
    _, hc_loc = _slab_geometry(hc, wc, n_dev)
    ny = (hy // 8) * (wy // 8)
    nc = (hc // 8) * (wc // 8)
    ny_loc = (hy_loc // 8) * (wy // 8)
    nc_loc = (hc_loc // 8) * (wc // 8)
    n_loc = ny_loc + 2 * nc_loc
    filler = _zero_block_chunk()
    maxsz = max(int(s.astype(np.int64).max(initial=0)) for s, _ in streams)
    cont = next(t for t in ds.CONT_LADDER if maxsz <= 4 * (8 + t))
    # per-device (sizes, content) in local Y|U|V order, padded planes
    plane_meta = [(0, ny_loc, ny), (1, nc_loc, nc), (2, nc_loc, nc)]
    offs = [np.cumsum(s.astype(np.int64)) - s for s, _ in streams]
    A_cols: List[np.ndarray] = []
    C_cols: List[np.ndarray] = []
    sizes_all: List[np.ndarray] = []
    for d in range(n_dev):
        seg_sizes: List[np.ndarray] = []
        seg_content: List[np.ndarray] = []
        for p, cnt_loc, cnt_glob in plane_meta:
            s, c = streams[p]
            lo = min(d * cnt_loc, cnt_glob)
            hi = min(lo + cnt_loc, cnt_glob)
            live = hi - lo
            seg_sizes.append(s[lo:hi].astype(np.int32))
            base = int(offs[p][lo]) if live else 0
            seg_content.append(
                c[base:base + int(s[lo:hi].astype(np.int64).sum())])
            npad = cnt_loc - live
            if npad:
                seg_sizes.append(
                    np.full(npad, filler.size, np.int32))
                seg_content.append(np.tile(filler, npad))
        sizes_d = np.concatenate(seg_sizes)
        content_d = np.concatenate(seg_content)
        aT, b = native.expand_split(content_d, sizes_d)
        A_cols.append(aT)
        C_cols.append(ds._dense_c_np(b, sizes_d, cont))
        sizes_all.append(sizes_d)
    # pad every device's columns to the widest (tile padding can differ
    # only if geometry differs — it cannot here, but keep it safe)
    n8 = max(a.shape[1] for a in A_cols)
    A = np.concatenate([_pad_cols(a, n8, True) for a in A_cols], axis=1)
    C = np.concatenate([_pad_cols(c, n8, False) for c in C_cols], axis=1)
    sizes = np.concatenate(sizes_all)
    _, decompress, _ = _sharded_codec(mesh, precision, cont, hc_loc, wc,
                                      hy_loc, wy)
    shc = NamedSharding(mesh, P(None, AXES))
    shs = NamedSharding(mesh, P(AXES))
    qts = [jnp.asarray(q) for q in qtables_np]
    y, u, v, ok = decompress(
        jax.device_put(jnp.asarray(A), shc),
        jax.device_put(jnp.asarray(C), shc),
        jax.device_put(jnp.asarray(sizes), shs), *qts)
    if not bool(jnp.all(ok)):
        raise BitstreamError("Huffman bad code (sharded device decode)")
    return (np.asarray(y)[:hy], np.asarray(u)[:hc], np.asarray(v)[:hc])


def _pad_cols(x: np.ndarray, n8: int, is_a: bool) -> np.ndarray:
    if x.shape[1] == n8:
        return x
    from ..entropy.pallas_decode import _FILLER_W0
    fill = np.zeros((x.shape[0], n8 - x.shape[1]), np.int32)
    if is_a:
        fill[0:8, :] = _FILLER_W0
    return np.concatenate([x, fill], axis=1)


# ---------------------------------------------------------------------------
# Sharded batch -> single-file streams (shard_batch + gather_streams)
# ---------------------------------------------------------------------------


def compress_batch_sharded(mesh, planes_np, qtables_np,
                           precision: str = "exact"):
    """Host API: [B, ...] plane batch -> per-frame stream lists.

    Composition of the scale-out pieces: ``shard_batch`` places frames
    over the mesh's data axis (process-local shards become one global
    array in multi-process runs), the sharded frame codec compresses
    every frame's block rows over the block axis, and
    ``gather_streams`` merges the per-process byte segments so every
    host can assemble identical single-file ``.myyuv`` payloads.

    Single-frame-at-a-time over the full mesh keeps the layout contract
    identical to compress_frame_sharded (bytes == single-device path);
    frames pipeline through the same executable.

    Multi-process runs pass a PROCESS-LOCAL mesh (the devices of this
    host): frames split across processes (local_shard), block rows
    across the local mesh, and gather_streams assembles the global
    per-frame streams on every host
    (tests/test_distributed_multiprocess.py runs this for real).
    """
    from ..parallel import distributed
    y, u, v = [np.ascontiguousarray(p) for p in planes_np]
    b = y.shape[0]
    lo, hi = distributed.local_shard(b)
    frames = []
    for f in range(lo, hi):
        streams = compress_frame_sharded(
            mesh, (y[f], u[f], v[f]), qtables_np, precision=precision)
        frames.append(streams)
    if jax.process_count() == 1:
        return frames
    # cross-process: gather every frame's concatenated plane streams
    flat_sizes = np.concatenate(
        [s for streams in frames for s, _ in streams]) \
        if frames else np.zeros(0, np.uint8)
    flat_content = np.concatenate(
        [c for streams in frames for _, c in streams]) \
        if frames else np.zeros(0, np.uint8)
    all_sizes, all_content = distributed.gather_streams(
        flat_sizes, flat_content)
    # re-split globally: every process reconstructs all frames
    hy, wy = y.shape[1:]
    ny = (hy // 8) * (wy // 8)
    nc = (hy // 16) * (wy // 16)
    per_frame = [ny, nc, nc]
    out = []
    spos = cpos = 0
    for f in range(b):
        streams = []
        for p in range(3):
            n = per_frame[p]
            s = all_sizes[spos:spos + n]
            t = int(s.astype(np.int64).sum())
            streams.append((s, all_content[cpos:cpos + t]))
            spos += n
            cpos += t
        out.append(streams)
    return out


@functools.lru_cache(maxsize=1)
def _zero_block_chunk() -> np.ndarray:
    """Chunk bytes of an all-zero coefficient block (the minimal valid
    stream: Huffman.cpp:176-203 single-symbol path)."""
    from .. import entropy
    sizes, content = entropy.encode_blocks(np.zeros((1, 64), np.int16))
    return content[:int(sizes[0])]
