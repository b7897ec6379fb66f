"""Probe: does an int8 one-hot MXU contraction lower in Mosaic, is the
4-plane byte reconstruction exact, and how fast is it vs the bf16x3 split?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K, W = 192, 56, 1024   # 6*ny_pad rows, nx_pad, width (8 sublanes x 128)
rng = np.random.default_rng(0)
V32 = (rng.standard_normal((M, K)) * 3).astype(np.float32)

# --- int8 bit-planes: V32 bytes split into 4 signed int8 planes ---
Vbits = V32.view(np.uint32)
planes = np.stack([((Vbits >> (8 * p)) & 0xFF).astype(np.int64) for p in range(4)])  # (4, M, K)
planes_i8 = (planes - 128).astype(np.int8)  # shift to signed range; one-hot colsum == 1 -> +128 after

ix = rng.integers(0, K - 1, size=W).astype(np.int32)

def onehot(ix, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
    return (i == ix[None, :]).astype(dtype)

def kernel_int8(v_ref, ix_ref, o_ref):
    oh = onehot(ix_ref[0], jnp.int8)
    g = jax.lax.dot_general(
        v_ref[:], oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # (4*M, W) int32
    g = g + 128
    b0, b1, b2, b3 = g[:M], g[M:2*M], g[2*M:3*M], g[3*M:]
    bits = (b0.astype(jnp.uint32) | (b1.astype(jnp.uint32) << 8)
            | (b2.astype(jnp.uint32) << 16) | (b3.astype(jnp.uint32) << 24))
    o_ref[:] = jax.lax.bitcast_convert_type(bits, jnp.float32)

V4 = planes_i8.reshape(4 * M, K)
try:
    out = pl.pallas_call(
        kernel_int8,
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
    )(jnp.asarray(V4), jnp.asarray(ix)[None, :])
    ref = V32[:, ix]
    exact = bool((np.asarray(out) == ref).all())
    print("INT8 LOWERED ok, exact:", exact, flush=True)
except Exception as e:
    print("INT8 FAILED:", type(e).__name__, str(e)[:400], flush=True)
    exact = False

# --- timing: T repeated gathers inside one kernel, int8x4 vs bf16x3 ---
import ml_dtypes
def split_bf16x3(v32):
    hi = v32.astype(ml_dtypes.bfloat16); r = v32 - hi.astype(np.float32)
    mid = r.astype(ml_dtypes.bfloat16); r2 = r - mid.astype(np.float32)
    lo = r2.astype(ml_dtypes.bfloat16)
    return np.concatenate([hi, mid, lo], axis=0)
V3 = split_bf16x3(V32)

T = 512
def make_timed(mode):
    def kernel(v_ref, ix_ref, o_ref):
        def body(t, acc):
            oh_src = (ix_ref[0] + t) % (K - 1)
            if mode == "int8":
                oh = onehot(oh_src, jnp.int8)
                g = jax.lax.dot_general(v_ref[:], oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32) + 128
                bits = (g[:M].astype(jnp.uint32) | (g[M:2*M].astype(jnp.uint32) << 8)
                        | (g[2*M:3*M].astype(jnp.uint32) << 16) | (g[3*M:].astype(jnp.uint32) << 24))
                val = jax.lax.bitcast_convert_type(bits, jnp.float32)
            else:
                oh = onehot(oh_src, jnp.bfloat16)
                g3 = jax.lax.dot_general(v_ref[:], oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                val = (g3[:M] + g3[M:2*M]) + g3[2*M:]
            return acc + val
        o_ref[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((M, W), jnp.float32))
    V = V4 if mode == "int8" else V3
    f = jax.jit(lambda v, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32))(v, i))
    return f, jnp.asarray(V), None

for mode in ("bf16", "int8"):
    try:
        f, V, _ = make_timed(mode)
        ixs = [jnp.asarray((ix + j) % (K - 1))[None, :] for j in range(4)]
        o = f(V, ixs[0]); float(jnp.sum(o))  # compile+fence
        best = 1e9
        for j in range(4):
            t0 = time.perf_counter()
            o = f(V, ixs[j]); s = float(jnp.sum(o))
            best = min(best, time.perf_counter() - t0)
        print(f"{mode}: {best*1e3:.2f} ms for {T} gathers ({best/T*1e6:.2f} us/gather)", flush=True)
    except Exception as e:
        print(mode, "TIMING FAILED:", type(e).__name__, str(e)[:300], flush=True)
print("PROBE DONE", flush=True)
