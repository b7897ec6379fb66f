"""Kernel cost breakdown by ablation: time the saturated-PMSM inner loop with
pieces knocked out (wrong results, right costs).  Chained-marginal via
in-kernel T scaling."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
    _N_CHANNELS, _lut_operand, _split_bf16x3, _split_int8x4, _round_up, LANES, SUBLANES,
)

env = excenvs.PMSM(batch_size=1024, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
lut = env._lut
nx, ny = lut.nx, lut.ny
nx_pad, ny_pad = _round_up(nx, 8), _round_up(ny, 8)
geom = (float(lut.x0), float(lut.dx), float(lut.y0), float(lut.dy), nx, ny, nx_pad, ny_pad)
V3 = jnp.asarray(_split_bf16x3(_lut_operand(lut, np.float32)))
V4 = jnp.asarray(_split_int8x4(_lut_operand(lut, np.float32)))

rows, W = SUBLANES, SUBLANES * LANES
r_s, p15, tau = 0.01, 4.5, 1e-4

def make(T, variant):
    x0, dx, y0g, dy, nx, ny, nx_pad, ny_pad = geom

    def kernel(v_ref, u_ref, om_ref, id_in, iq_in, id_out, iq_out):
        V = v_ref[:]
        omega = om_ref[:]

        def gather(i_d, i_q):
            fx = (i_d - x0) / dx
            fy = (i_q - y0g) / dy
            ix = jnp.clip(jnp.floor(fx), 0, nx - 2).astype(int)
            iy = jnp.clip(jnp.floor(fy), 0, ny - 2).astype(int)
            wx, wy = fx - ix, fy - iy
            if variant == "noluts":
                z = i_d * 0.002
                return [1e-3 + z, 1e-4 + z, 1e-4 + z, 1e-3 + z, 0.1 + z, 0.01 + z]
            dims = (((1,), (0,)), ((), ()))
            xiota = jax.lax.broadcasted_iota(ix.dtype, (nx_pad, W), 0)
            bix = jnp.concatenate([jnp.broadcast_to(ix[r:r+1, :], (nx_pad, LANES)) for r in range(rows)], axis=1)
            oh_x0 = (xiota == bix).astype(jnp.float32)
            oh_x1 = pltpu.roll(oh_x0, 1, 0)
            g_wide = {}
            for a, oh in ((0, oh_x0), (1, oh_x1)):
                if variant in ("int8", "int8_noy"):
                    m = V.shape[0] // 4
                    g = jax.lax.dot_general(V, oh.astype(jnp.int8), dims, preferred_element_type=jnp.int32) + 128
                    bits = (g[:m].astype(jnp.uint32) | (g[m:2*m].astype(jnp.uint32) << 8)
                            | (g[2*m:3*m].astype(jnp.uint32) << 16) | (g[3*m:].astype(jnp.uint32) << 24))
                    g_wide[a] = jax.lax.bitcast_convert_type(bits, jnp.float32)
                else:
                    m = V.shape[0] // 3
                    g3 = jax.lax.dot_general(V, oh.astype(jnp.bfloat16), dims, preferred_element_type=jnp.float32)
                    g_wide[a] = (g3[:m] + g3[m:2*m]) + g3[2*m:]
            if variant in ("nody",):
                pass
            if variant in ("int8_opt", "opt"):
                # optimized assembly: no concat mask builds (single
                # lane-to-sublane reshape + broadcast-compare), per-channel
                # STATIC slices instead of the (6, ny_pad, W) relayout, blend
                # in wide form, one shuffle per channel at the end
                iy_w = jnp.reshape(iy, (1, W))
                yiota = jax.lax.broadcasted_iota(iy.dtype, (ny_pad, W), 0)
                oh_y0 = (yiota == iy_w).astype(jnp.float32)
                oh_y1 = pltpu.roll(oh_y0, 1, 0)
                wx_w = jnp.reshape(wx, (1, W))
                wy_w = jnp.reshape(wy, (1, W))
                out = []
                for c in range(_N_CHANNELS):
                    sl0 = g_wide[0][c * ny_pad : (c + 1) * ny_pad, :]
                    sl1 = g_wide[1][c * ny_pad : (c + 1) * ny_pad, :]
                    v00 = jnp.sum(sl0 * oh_y0, axis=0, keepdims=True)
                    v01 = jnp.sum(sl0 * oh_y1, axis=0, keepdims=True)
                    v10 = jnp.sum(sl1 * oh_y0, axis=0, keepdims=True)
                    v11 = jnp.sum(sl1 * oh_y1, axis=0, keepdims=True)
                    val = (v00 * (1 - wx_w) * (1 - wy_w) + v01 * (1 - wx_w) * wy_w
                           + v10 * wx_w * (1 - wy_w) + v11 * wx_w * wy_w)
                    out.append(jnp.reshape(val, (rows, LANES)))
                return out
            if variant in ("noy", "int8_noy"):
                # skip the y-select: read fixed rows (wrong, cheap)
                vals = []
                for c in range(_N_CHANNELS):
                    row = g_wide[0][c * ny_pad : c * ny_pad + 1, :]
                    vals.append(jnp.reshape(row, (rows, LANES)))
                v00 = v01 = v10 = v11 = vals
            else:
                yiota = jax.lax.broadcasted_iota(iy.dtype, (ny_pad, W), 0)
                biy = jnp.concatenate([jnp.broadcast_to(iy[r:r+1, :], (ny_pad, LANES)) for r in range(rows)], axis=1)
                oh_y0 = (yiota == biy).astype(jnp.float32)[None]
                oh_y1 = pltpu.roll(oh_y0, 1, 1)
                wide = {}
                for a in (0, 1):
                    g = g_wide[a].reshape(_N_CHANNELS, ny_pad, W)
                    wide[(a, 0)] = jnp.sum(g * oh_y0, axis=1)
                    wide[(a, 1)] = jnp.sum(g * oh_y1, axis=1)
                def tor(key):
                    return [jnp.reshape(wide[key][c:c+1, :], (rows, LANES)) for c in range(_N_CHANNELS)]
                v00, v01, v10, v11 = tor((0, 0)), tor((0, 1)), tor((1, 0)), tor((1, 1))
            out = []
            for c in range(_N_CHANNELS):
                out.append(v00[c] * (1 - wx) * (1 - wy) + v01[c] * (1 - wx) * wy
                           + v10[c] * wx * (1 - wy) + v11[c] * wx * wy)
            return out

        def body(i, y):
            i_d, i_q = y
            u = u_ref[i % 512]
            l_dd, l_dq, l_qd, l_qq, psi_d, psi_q = gather(i_d, i_q)
            det = l_dd * l_qq - l_dq * l_qd
            rhs_d = u[0] - r_s * i_d + omega * psi_q
            rhs_q = u[1] - r_s * i_q - omega * psi_d
            i_d = i_d + tau * ((l_qq / det) * rhs_d + (-l_dq / det) * rhs_q)
            i_q = i_q + tau * ((-l_qd / det) * rhs_d + (l_dd / det) * rhs_q)
            return (i_d, i_q)

        y = jax.lax.fori_loop(0, T, body, (id_in[:], iq_in[:]))
        id_out[:] = y[0]
        iq_out[:] = y[1]

    V = V4 if variant.startswith("int8") else V3
    f = jax.jit(lambda v, u, om, a, b: pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 2,
    )(v, u, om, a, b))
    return f, V

rng = np.random.default_rng(0)
u = jnp.asarray(rng.uniform(-50, 50, (512, 2, rows, LANES)).astype(np.float32))
om = jnp.asarray(rng.uniform(-3000, 3000, (rows, LANES)).astype(np.float32))
i0 = jnp.asarray(rng.uniform(-100, 100, (rows, LANES)).astype(np.float32))
q0 = jnp.asarray(rng.uniform(-100, 100, (rows, LANES)).astype(np.float32))

for variant in ("int8", "int8_opt", "opt"):
    ts = {}
    for T in (2048, 16384):
        f, V = make(T, variant)
        o = f(V, u, om, i0, q0); float(jnp.sum(o[0]))
        best = 1e9
        for rep in range(4):
            t0 = time.perf_counter()
            o = f(V, u, om, i0 + 0.01 * rep, q0)
            float(jnp.sum(o[0]))
            best = min(best, time.perf_counter() - t0)
        ts[T] = best
    marg = (ts[16384] - ts[2048]) / 14336
    print(json.dumps({"variant": variant, "t2048_ms": ts[2048]*1e3, "t16384_ms": ts[16384]*1e3,
                      "ns_per_step_tile": marg * 1e9}), flush=True)
print("BREAKDOWN DONE", flush=True)
