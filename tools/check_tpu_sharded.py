"""Sharded codec's Pallas kernels on the REAL chip (VERDICT r3 #6).

The CPU-mesh tests certify the shard_map sharding contract, layout and
byte assembly but route to XLA fallbacks; this runs the PRODUCTION
packed Pallas kernels under a (1, 1) Mesh on the real TPU device —
engine.sharded_stream compress/decompress — and byte-compares against
the single-device frame API on the golden 4K frame:

  1. compress_frame_sharded  == compress_frame_to_streams (bytes)
  2. decompress_frame_sharded(reference q50 stream) == the scalar host
     decode (pixels)

Writes SHARDED_TPU.json at the repo root.

Usage: python tools/check_tpu_sharded.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402

from myyuv_tpu import YUVImage  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.engine import sharded_stream as ss  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTStream  # noqa: E402
from myyuv_tpu.kernels import constants  # noqa: E402
from myyuv_tpu.parallel import mesh as meshlib  # noqa: E402


def main():
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    planes = bench.get_4k_planes()
    h, w = planes[0].shape
    qts = [constants.quality_scaled_qtable(constants.PLANE_Q50[i], 50)
           for i in range(3)]

    mesh = meshlib.make_mesh((1, 1), devices=jax.devices()[:1])

    # 1. sharded compress == single-device stream bytes
    got = ss.compress_frame_sharded(mesh, planes, qts)
    want = ds.compress_frame_to_streams(planes, qts)
    bytes_equal = all(
        np.array_equal(ws, gs) and np.array_equal(wc, gc)
        for (ws, wc), (gs, gc) in zip(want, got))
    print("sharded compress bytes == single-device:", bytes_equal,
          flush=True)

    # 2. sharded decompress of the REFERENCE stream == host scalar decode
    img = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    st = DCTStream.parse(img.data)
    streams = [(p.chunk_sizes, p.content) for p in st.planes]
    ry, ru, rv = ss.decompress_frame_sharded(mesh, streams, qts, h, w)
    pixels_equal = (np.array_equal(ry, planes[0])
                    and np.array_equal(ru, planes[1])
                    and np.array_equal(rv, planes[2]))
    print("sharded decompress pixels == host scalar:", pixels_equal,
          flush=True)

    # 3. sharded WORD-CONTRACT codec (column sharding, round 5):
    # interchange + roundtrip identical to the single-device word path
    import jax.numpy as jnp
    from myyuv_tpu.engine import word_frame as wf
    dev = [jnp.asarray(p) for p in planes]
    xw = wf.pack_frame(*dev)
    xws = wf.pad_frame_cols(xw, mesh.devices.size)
    A, C, sizes, total, ok = wf.compress_words_sharded(
        mesh, xws, *[jnp.asarray(q) for q in qts], h=h, w=w)
    rA, rC, rsizes, rtotal, rok = wf.compress_words(
        xw, *[jnp.asarray(q) for q in qts], h=h, w=w)
    n8 = (np.asarray(rsizes).size + 7) // 8
    words_equal = (bool(ok) and bool(rok)
                   and int(total) == int(rtotal)
                   and np.array_equal(np.asarray(sizes),
                                      np.asarray(rsizes))
                   and np.array_equal(np.asarray(A)[:, :n8],
                                      np.asarray(rA)[:, :n8])
                   and np.array_equal(np.asarray(C)[:, :n8],
                                      np.asarray(rC)[:, :n8]))
    rxw, dok = wf.decompress_words_sharded(
        mesh, A, C, sizes, *[jnp.asarray(q) for q in qts], h=h, w=w)
    ry2, ru2, rv2 = wf.unpack_frame(rxw, h, w)
    rpy, _rpu, _rpv, pok = ds.decompress_frame(
        rA, rC, rsizes, *[jnp.asarray(q) for q in qts], h=h, w=w)
    words_px_equal = (bool(dok) and bool(pok) and np.array_equal(
        np.asarray(ry2), np.asarray(rpy)))
    print("sharded word-contract bytes+pixels == single-device:",
          words_equal and words_px_equal, flush=True)

    out = {"mesh": [1, 1], "device": str(jax.devices()[0]),
           "packed_pallas_kernels": True,
           "compress_bytes_equal": bool(bytes_equal),
           "decompress_pixels_equal": bool(pixels_equal),
           "word_contract_sharded_equal": bool(
               words_equal and words_px_equal)}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHARDED_TPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if (bytes_equal and pixels_equal
                 and words_equal and words_px_equal) else 1


if __name__ == "__main__":
    sys.exit(main())
