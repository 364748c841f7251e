"""Real-chip validation + timing: packed8 decoder vs unpacked on the 4K
golden luma plane."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu import YUVImage, entropy  # noqa: E402
from myyuv_tpu.entropy import pallas_decode, pallas_decode8  # noqa: E402
from myyuv_tpu.formats.dct_stream import DCTStream  # noqa: E402


def sync(x):
    np.asarray(x.ravel()[:1])


def main():
    print("devices:", jax.devices(), flush=True)
    big = YUVImage.load(
        "/root/reference/images/chef-with-trumpet-big-DCT-50.myyuv")
    stb = DCTStream.parse(big.data)
    p = stb.planes[0]
    lanes = p.to_lanes()
    n = lanes.shape[0]
    want = entropy.decode_blocks(p.chunk_sizes, p.content)
    print(f"{n} blocks", flush=True)

    # CW=16 words (64-byte chunks) covers this stream; mirrors the frame
    # path's window capacity
    lj = jnp.asarray(lanes)
    words, _ = pallas_decode._pack_words(lj)           # [64, n]
    w16 = words[:16]
    npad = (-n) % 8
    if npad:
        fill = jnp.zeros((16, npad), jnp.int32).at[0, :].set(
            pallas_decode._FILLER_W0)
        w16 = jnp.concatenate([w16, fill], axis=1)
    wp = jax.jit(pallas_decode8.pack8_rows)(w16)
    sync(wp)

    t0 = time.perf_counter()
    dec, ok = pallas_decode8.decode_words8(wp)
    sync(np.asarray(ok))
    print(f"packed8 compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    assert np.asarray(ok)[:n].all(), "ok flags"
    np.testing.assert_array_equal(np.asarray(dec)[:n], want)
    print("packed8 4K golden luma decode: PASS", flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        dec, ok = pallas_decode8.decode_words8(wp)
    sync(np.asarray(ok))
    dt = (time.perf_counter() - t0) / 5
    print(f"packed8 decode (incl pack8): {dt*1e3:.1f} ms/plane "
          f"({n/dt/1e6:.2f} Mblocks/s)", flush=True)

    # unpacked comparison on the same CW=16 words
    dec0, ok0 = pallas_decode.decode_words(words[:16])
    sync(np.asarray(ok0))
    t0 = time.perf_counter()
    for _ in range(5):
        dec0, ok0 = pallas_decode.decode_words(words[:16])
    sync(np.asarray(ok0))
    dt0 = (time.perf_counter() - t0) / 5
    print(f"unpacked decode_words: {dt0*1e3:.1f} ms/plane", flush=True)
    print("ALL PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
