"""Split encoder kernel cost: all-zero frame (nmax=1, mlen=1) vs golden.

Zero input drives every data-dependent loop to ~1 iteration, so the
difference to the golden frame is the nmax/mlen-dependent work, and the
zero time is DCT + front/tail fixed costs + minimal serialization.
Uses the cached production executable (no new compiles).
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from myyuv_tpu.engine import device_stream as ds
from myyuv_tpu.kernels import scalar

import importlib.util
spec = importlib.util.spec_from_file_location(
    "benchmod", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
planes = bench.get_4k_planes()
h, w = planes[0].shape
qts = [jnp.asarray(np.asarray(scalar.plane_qtable(i, 50), np.float32))
       for i in range(3)]

def sync(x): np.asarray(x.ravel()[:1])
def timeit(fn, reps=10):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3

zero = [jnp.asarray(np.full_like(p, 128)) for p in planes]
gold = [jnp.asarray(p) for p in planes]
for name, pl in (("zero", zero), ("gold", gold)):
    c = lambda: ds.compress_frame(pl[0], pl[1], pl[2], *qts)
    print(f"{name} compress_frame: {timeit(lambda: c()[0]):6.2f} ms", flush=True)
    cA, cC, sizes, total, ok = c()
    d = lambda: ds.decompress_frame(cA, cC, sizes, *qts, h=h, w=w)
    print(f"{name} decompress:     {timeit(lambda: d()[0]):6.2f} ms (ok={bool(ok)})", flush=True)
