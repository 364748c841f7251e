"""Variants of the bgrx->iyuv conversion kernel, timed on chip."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from myyuv_tpu.runtime import jaxcache
jaxcache.enable()
import jax, jax.numpy as jnp
from jax import lax
from myyuv_tpu.kernels import device as kdev

H, W = 3008, 4032
rng = np.random.default_rng(0)
px = rng.integers(0, 256, (H, W, 4), np.uint8)
pdev = jnp.asarray(px)

def sync(x): np.asarray(x.ravel()[:1])
def timeit(fn, reps=5):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3

F32 = jnp.float32

@jax.jit
def v0(pixels):
    return kdev.bgrx_to_iyuv(pixels)[1]

@jax.jit
def v_yonly(pixels):
    w32 = lax.bitcast_convert_type(pixels, jnp.int32)
    b = (w32 & 255).astype(F32); g = ((w32 >> 8) & 255).astype(F32)
    r = ((w32 >> 16) & 255).astype(F32)
    yf = (F32(0.299) * r) + (F32(0.587) * g) + (F32(0.114) * b)
    return jnp.trunc(yf).astype(jnp.int32).astype(jnp.uint8)

@jax.jit
def v_rw(pixels):
    w32 = lax.bitcast_convert_type(pixels, jnp.int32)
    b = (w32 & 255).astype(F32)
    yf = F32(0.5) * b
    cb = (jnp.trunc((b - yf) * F32(0.564)).astype(jnp.int32) + 128) & 255
    q = (cb + 2) >> 2
    s = lax.reduce_window(q, 0, lax.add, (2, 2), (2, 2), "VALID")
    return (s & 255).astype(jnp.uint8)

@jax.jit
def v_stride(pixels):
    w32 = lax.bitcast_convert_type(pixels, jnp.int32)
    b = (w32 & 255).astype(F32)
    yf = F32(0.5) * b
    cb = (jnp.trunc((b - yf) * F32(0.564)).astype(jnp.int32) + 128) & 255
    q = (cb + 2) >> 2
    a = q[0::2, 0::2] + q[0::2, 1::2]
    bq = q[1::2, 0::2] + q[1::2, 1::2]
    return ((a + bq) & 255).astype(jnp.uint8)

print("v0 current:", f"{timeit(lambda: v0(pdev)):8.2f} ms", flush=True)
print("y only:    ", f"{timeit(lambda: v_yonly(pdev)):8.2f} ms", flush=True)
print("chroma rw: ", f"{timeit(lambda: v_rw(pdev)):8.2f} ms", flush=True)
print("chroma str:", f"{timeit(lambda: v_stride(pdev)):8.2f} ms", flush=True)
