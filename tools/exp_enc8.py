"""Packed-8 Pallas encoder on the real chip: bytes vs the flat encoder
on the golden 4K luma plane + standalone timing of both."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import YUVImage, entropy  # noqa: E402
from myyuv_tpu.entropy import pallas_encode as pe, pallas_encode8 as pe8  # noqa: E402
from myyuv_tpu.entropy.reference import ZIGZAG  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTStream  # noqa: E402
from myyuv_tpu.kernels.pallas_dct8 import pack_rows8  # noqa: E402


def sync(x):
    return np.asarray(x[:1])


def main():
    assert jax.devices()[0].platform != "cpu"
    img = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    st = DCTStream.parse(img.data)
    co = entropy.decode_blocks(st.planes[0].chunk_sizes,
                               st.planes[0].content)      # [N, 64] int16
    n = co.shape[0]
    print("blocks:", n, flush=True)

    m = co.astype(np.int32)[:, np.asarray(ZIGZAG)]
    pairs = ((m[:, 0::2] & 0xFFFF) | (m[:, 1::2] << 16)).astype(np.int32)
    pad = (-n) % 8
    if pad:
        pairs = np.concatenate([pairs, np.zeros((pad, 32), np.int32)])
    pairs8 = jnp.asarray(np.asarray(pack_rows8(jnp.asarray(pairs))))
    pairsT = jnp.asarray(pairs.T[:, :n].copy())

    # flat encoder (cont=8 tier, as the frame path uses at q50)
    wC_f, aT_f, sz_f, ok_f = pe.encode_words_pairs(pairsT, cont=8)
    sync(sz_f)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        wC_f, aT_f, sz_f, ok_f = pe.encode_words_pairs(pairsT, cont=8)
        sync(sz_f)
    t_flat = (time.perf_counter() - t0) / reps * 1e3
    print(f"flat encoder: {t_flat:.2f} ms/plane", flush=True)

    # packed-8 encoder
    wC_p, A_p, sz_p, ok_p = pe8.encode_words_packed(pairs8, cont=8)
    sync(sz_p)
    t0 = time.perf_counter()
    for _ in range(reps):
        wC_p, A_p, sz_p, ok_p = pe8.encode_words_packed(pairs8, cont=8)
        sync(sz_p)
    t_packed = (time.perf_counter() - t0) / reps * 1e3
    print(f"packed-8 encoder: {t_packed:.2f} ms/plane", flush=True)

    szf = np.asarray(sz_f)
    szp = np.asarray(sz_p)[:n]
    okf = np.asarray(ok_f)
    okp = np.asarray(ok_p)[:n]
    print("sizes equal:", np.array_equal(szf, szp),
          "ok equal:", np.array_equal(okf, okp), flush=True)

    # byte comparison: A region (flat aT [8, n] vs packed [64, ceil8])
    aTf = np.asarray(aT_f)
    Ap = np.asarray(A_p)
    n8 = n // 8 if n % 8 == 0 else n // 8 + 1
    a_from_p = Ap[:, :n // 8].reshape(8, 8, -1).transpose(0, 2, 1).reshape(
        8, -1)
    nn = (n // 8) * 8
    eqA = np.array_equal(aTf[:, :nn], a_from_p[:, :nn])
    print("A region equal (first", nn, "blocks):", eqA, flush=True)

    wCf = np.asarray(wC_f)
    wCp = np.asarray(wC_p)[:n]
    # only continuation words within each chunk's extent are defined
    valid = okf & okp
    rows = np.maximum((szf + 31) // 32 - 1, 0)
    bad = 0
    for i in range(n):
        if not valid[i]:
            continue
        k = int(rows[i]) * 8
        if k and not np.array_equal(wCf[i, :k], wCp[i, :k]):
            bad += 1
            if bad <= 3:
                print("cont words differ at block", i, wCf[i, :k],
                      wCp[i, :k], flush=True)
    print("continuation word mismatches:", bad, flush=True)
    print("RESULT:", "PASS" if (eqA and bad == 0
                                and np.array_equal(szf, szp)) else "FAIL")


if __name__ == "__main__":
    main()
