"""Dump the optimized HLO of the frame executables for op attribution."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from myyuv_tpu.runtime import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from myyuv_tpu.engine import batch as eb  # noqa: E402
from myyuv_tpu.engine import device_stream as ds  # noqa: E402


def main():
    import bench
    planes = bench.get_4k_planes()
    qts = eb.plane_qtables([50] * 3)
    h, w = planes[0].shape
    y, u, v = [jnp.asarray(p) for p in planes]
    c4, sizes, total, ok = ds.compress_frame(y, u, v, *qts)

    lowered = ds.decompress_frame.lower(c4, sizes, *qts, h=h, w=w)
    txt = lowered.compile().as_text()
    open("/tmp/decompress_hlo.txt", "w").write(txt)
    print("decompress HLO:", len(txt), "bytes")
    lowered2 = ds.compress_frame.lower(y, u, v, *qts)
    txt2 = lowered2.compile().as_text()
    open("/tmp/compress_hlo.txt", "w").write(txt2)
    print("compress HLO:", len(txt2), "bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
