"""Marginal-cost probe: vary the in-kernel gather count T and use the slope,
which cancels the relay's fixed per-execution overhead."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

M, K, W = 192, 56, 1024
rng = np.random.default_rng(0)
V32 = (rng.standard_normal((M, K)) * 3).astype(np.float32)
Vbits = V32.view(np.uint32)
planes = np.stack([((Vbits >> (8 * p)) & 0xFF).astype(np.int64) for p in range(4)])
V4 = (planes - 128).astype(np.int8).reshape(4 * M, K)
import ml_dtypes
hi = V32.astype(ml_dtypes.bfloat16); r = V32 - hi.astype(np.float32)
mid = r.astype(ml_dtypes.bfloat16); lo = (r - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
V3 = np.concatenate([hi, mid, lo], axis=0)

ix0 = rng.integers(0, K - 1, size=W).astype(np.int32)

def make(mode, T):
    def kernel(v_ref, ix_ref, o_ref):
        def body(t, acc):
            src = (ix_ref[0] + t) % (K - 1)
            i = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
            if mode == "int8":
                oh = (i == src[None, :]).astype(jnp.int8)
                g = jax.lax.dot_general(v_ref[:], oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32) + 128
                bits = (g[:M].astype(jnp.uint32) | (g[M:2*M].astype(jnp.uint32) << 8)
                        | (g[2*M:3*M].astype(jnp.uint32) << 16) | (g[3*M:].astype(jnp.uint32) << 24))
                val = jax.lax.bitcast_convert_type(bits, jnp.float32)
            else:
                oh = (i == src[None, :]).astype(jnp.bfloat16)
                g3 = jax.lax.dot_general(v_ref[:], oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                val = (g3[:M] + g3[M:2*M]) + g3[2*M:]
            return acc + val
        o_ref[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((M, W), jnp.float32))
    V = V4 if mode == "int8" else V3
    return jax.jit(lambda v, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32))(v, i)), jnp.asarray(V)

def best_time(f, V, reps=5):
    ixs = [jnp.asarray((ix0 + 7 * j) % (K - 1))[None, :] for j in range(reps)]
    o = f(V, ixs[0]); float(jnp.sum(o))
    best = 1e9
    for j in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(V, ixs[j])))
        best = min(best, time.perf_counter() - t0)
    return best

for mode in ("bf16", "int8"):
    ts = {}
    for T in (2048, 16384):
        f, V = make(mode, T)
        ts[T] = best_time(f, V)
    marg = (ts[16384] - ts[2048]) / (16384 - 2048)
    print(f"{mode}: t2048={ts[2048]*1e3:.2f}ms t16384={ts[16384]*1e3:.2f}ms marginal={marg*1e9:.1f} ns/gather", flush=True)
print("PROBE2 DONE", flush=True)
