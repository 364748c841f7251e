"""On-chip frame codec validation against the host oracle paths.

1. decompress the golden 4K q50 stream via the device frame path and
   compare pixel-exactly with the native host decode;
2. compress those planes via the device frame path and compare the
   byte stream with the native host encoder.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402

from myyuv_tpu import YUVImage, entropy  # noqa: E402
from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTStream  # noqa: E402
from myyuv_tpu.kernels import scalar  # noqa: E402


def main():
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    img = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    st = DCTStream.parse(img.data)
    h, w = img.height, img.width
    qts_np = [np.asarray(scalar.plane_qtable(i, 50), np.float32)
              for i in range(3)]
    fails = 0

    streams = [(st.planes[i].chunk_sizes, st.planes[i].content)
               for i in range(3)]
    gy, gu, gv = ds.decompress_streams_to_frame(streams, qts_np, h, w)
    want = []
    for i in range(3):
        co = entropy.decode_blocks(*streams[i])
        px = scalar.dequantize_idct_blocks(
            co.reshape(-1, 8, 8), qts_np[i])
        ph, pw = (h, w) if i == 0 else (h // 2, w // 2)
        want.append(scalar.blocks_to_plane(px, ph, pw))
    for name, g, wv in (("Y", gy, want[0]), ("U", gu, want[1]),
                        ("V", gv, want[2])):
        ok = (np.asarray(g) == wv).all()
        print(f"device decompress plane {name}:",
              "PASS" if ok else "FAIL", flush=True)
        fails += 0 if ok else 1

    got_streams = ds.compress_frame_to_streams(want, qts_np)
    for i in range(3):
        co = scalar.dct_quantize_blocks(
            scalar.plane_to_blocks(want[i]), qts_np[i])
        wsz, wcontent = entropy.encode_blocks(
            co.reshape(-1, 64).astype(np.int16))
        gsz, gcontent = got_streams[i]
        ok = (np.array_equal(gsz, wsz)
              and np.array_equal(gcontent, wcontent))
        print(f"device compress plane {i} bytes:",
              "PASS" if ok else "FAIL", flush=True)
        fails += 0 if ok else 1

    print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILS")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
