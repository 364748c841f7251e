"""On-chip frame codec validation against the host oracle paths.

For each quality (default 50; ``--sweep`` = 10,30,50,70,90 per
BASELINE config 2/4):

1. decompress a 4K stream via the device frame path and compare
   pixel-exactly with the scalar host decode;
2. compress the 4K planes via the device frame path and compare the
   byte stream with the native host encoder.

All checks run on the 4032x3008 golden geometry so every quality
reuses the same compiled executables (the cont=8 and cont=56 tiers).

Usage: python tools/check_tpu_frame.py [--sweep | q [q ...]]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402

from myyuv_tpu import YUVImage, entropy  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTStream  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402


def golden_planes():
    """Golden 4K pixel planes (host-decoded q50 stream)."""
    img = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    st = DCTStream.parse(img.data)
    h, w = img.height, img.width
    planes = []
    for i in range(3):
        qt = np.asarray(scalar.plane_qtable(i, 50), np.float32)
        co = entropy.decode_blocks(st.planes[i].chunk_sizes,
                                   st.planes[i].content)
        px = scalar.dequantize_idct_blocks(co.reshape(-1, 8, 8), qt)
        ph, pw = (h, w) if i == 0 else (h // 2, w // 2)
        planes.append(scalar.blocks_to_plane(px, ph, pw))
    return planes, h, w


def check_quality(planes, h, w, q):
    """Device compress+decompress at quality q vs the host oracle."""
    fails = 0
    qts_np = [np.asarray(scalar.plane_qtable(i, q), np.float32)
              for i in range(3)]

    # host-oracle streams + reconstruction
    want_streams = []
    want_recon = []
    for i in range(3):
        co = scalar.dct_quantize_blocks(
            scalar.plane_to_blocks(planes[i]), qts_np[i])
        want_streams.append(entropy.encode_blocks(
            co.reshape(-1, 64).astype(np.int16)))
        px = scalar.dequantize_idct_blocks(co, qts_np[i])
        ph, pw = (h, w) if i == 0 else (h // 2, w // 2)
        want_recon.append(scalar.blocks_to_plane(px, ph, pw))

    got_streams = ds.compress_frame_to_streams(planes, qts_np)
    for i in range(3):
        wsz, wcontent = want_streams[i]
        gsz, gcontent = got_streams[i]
        ok = (np.array_equal(gsz.astype(np.int64), wsz)
              and np.array_equal(gcontent, wcontent))
        print(f"q{q} device compress plane {i} bytes:",
              "PASS" if ok else "FAIL", flush=True)
        fails += 0 if ok else 1

    # both decode variants get on-device coverage (ADVICE r4): the
    # two-kernel pipeline AND the one-kernel fused decompress, whatever
    # MYYUV_DEC8_FUSED says
    for fused in (False, True):
        gy, gu, gv = ds.decompress_streams_to_frame(
            [(s.astype(np.uint8), c) for s, c in want_streams],
            qts_np, h, w, fused=fused)
        tag = "fused " if fused else ""
        for name, g, wv in (("Y", gy, want_recon[0]),
                            ("U", gu, want_recon[1]),
                            ("V", gv, want_recon[2])):
            ok = (np.asarray(g) == wv).all()
            print(f"q{q} device {tag}decompress plane {name}:",
                  "PASS" if ok else "FAIL", flush=True)
            fails += 0 if ok else 1
    return fails


def main():
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    args = sys.argv[1:]
    if args and args[0] == "--sweep":
        qualities = [10, 30, 50, 70, 90]
    elif args:
        qualities = [int(a) for a in args]
    else:
        qualities = [50]
    planes, h, w = golden_planes()
    fails = 0
    for q in qualities:
        fails += check_quality(planes, h, w, q)
    print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILS")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
