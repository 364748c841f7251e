"""Real-chip validation + timing of the Pallas entropy kernels.

Encoder: byte-identical output vs the host encoders (all host/XLA/native
encoders are byte-identical; tests/test_pallas_encode.py).
Decoder: exact coefficients on the same streams.

Run on the ambient (TPU) platform. First compile of the encoder kernel is
expensive through the remote-compile tunnel; the persistent cache makes
reruns fast.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import YUVImage, entropy  # noqa: E402
from myyuv_tpu.entropy import pallas_decode, pallas_encode  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTPlaneStream, DCTStream  # noqa: E402


def sync(x):
    np.asarray(x[:1])


def main():
    print("devices:", jax.devices(), flush=True)
    assert jax.devices()[0].platform != "cpu", "must run on TPU"
    rng = np.random.default_rng(23)

    # mix of synthetic + real golden coefficient blocks
    c = (rng.integers(-1024, 1024, (2048, 64))
         * (rng.random((2048, 64)) < 0.25)).astype(np.int16)
    c[0] = 0
    c[1, :] = 0
    c[1, 0] = 7
    img = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-DCT-50.myyuv")
    st = DCTStream.parse(img.data)
    gold = entropy.decode_blocks(st.planes[0].chunk_sizes,
                                 st.planes[0].content, backend="py"
                                 if True else None)
    c[2048 - gold.shape[0]:] = gold[:2048]
    coeffs = np.concatenate([c, gold[:2048]])[:4096]

    t0 = time.perf_counter()
    lanes, sizes, ok = pallas_encode.encode_lanes(jnp.asarray(coeffs))
    sync(np.asarray(sizes))
    print(f"encoder compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    lanes, sizes = np.asarray(lanes), np.asarray(sizes)
    assert np.asarray(ok).all(), "encoder ok flags"

    py_sizes, py_content = entropy.encode_blocks(coeffs, backend="py")
    got = DCTPlaneStream.from_lanes(lanes, sizes.astype(np.uint8))
    assert np.array_equal(sizes.astype(np.uint8), py_sizes), "sizes differ"
    assert got.content.tobytes() == py_content.tobytes(), "bytes differ"
    print("encoder bytes vs host oracle: PASS", flush=True)

    # decode the pallas-encoded streams with the pallas decoder on-chip
    dec, dok = pallas_decode.decode_lanes(jnp.asarray(got.to_lanes()))
    assert np.asarray(dok).all(), "decoder ok flags"
    assert np.array_equal(np.asarray(dec), coeffs), "roundtrip coeffs"
    print("on-chip encode->decode roundtrip: PASS", flush=True)

    # timing on a full golden 4K luma plane worth of blocks
    big = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    stb = DCTStream.parse(big.data)
    coeffs_y = entropy.decode_blocks(stb.planes[0].chunk_sizes,
                                     stb.planes[0].content)
    n = coeffs_y.shape[0]
    print(f"4K luma plane: {n} blocks", flush=True)
    cy = jnp.asarray(coeffs_y)
    lanes2, sizes2, ok2 = pallas_encode.encode_lanes(cy)
    sync(np.asarray(sizes2))
    t0 = time.perf_counter()
    for _ in range(3):
        lanes2, sizes2, ok2 = pallas_encode.encode_lanes(cy)
    sync(np.asarray(sizes2))
    dt = (time.perf_counter() - t0) / 3
    print(f"pallas encode: {dt*1e3:.0f} ms/plane "
          f"({n/dt/1e6:.2f} Mblocks/s)", flush=True)
    # compare against OUR host encoder (the reference CLI's tie-breaking
    # differs legitimately; interop is covered by byte-level tests above)
    s2 = np.asarray(sizes2).astype(np.uint8)
    want_sizes, _ = entropy.encode_blocks(coeffs_y)
    assert np.array_equal(s2, want_sizes), "4K sizes differ from host"
    print("4K golden luma sizes vs host encoder: PASS", flush=True)
    print("ALL PASS")
    return 0




def time_decoder():
    """Separate entry: time the flat-parse decoder on the 4K golden luma."""
    import jax
    print("devices:", jax.devices(), flush=True)
    big = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    stb = DCTStream.parse(big.data)
    p = stb.planes[0]
    lanes = p.to_lanes()
    n = lanes.shape[0]
    want = entropy.decode_blocks(p.chunk_sizes, p.content)
    t0 = time.perf_counter()
    dec, ok = pallas_decode.decode_lanes(jnp.asarray(lanes))
    sync(np.asarray(ok))
    print(f"decoder compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(dec), want), "decode mismatch"
    print("4K golden luma decode: PASS", flush=True)
    lj = jnp.asarray(lanes)
    t0 = time.perf_counter()
    for _ in range(3):
        dec, ok = pallas_decode.decode_lanes(lj)
    sync(np.asarray(ok))
    dt = (time.perf_counter() - t0) / 3
    print(f"pallas decode: {dt*1e3:.0f} ms/plane "
          f"({n/dt/1e6:.2f} Mblocks/s)", flush=True)


if __name__ == "__main__" and "--decode" in sys.argv:
    time_decoder()
    sys.exit(0)


if __name__ == "__main__" and "--decode" not in sys.argv:
    sys.exit(main())
