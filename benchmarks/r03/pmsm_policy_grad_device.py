"""Device: policy gradient through the closed-loop PMSM DRIVE kernel.

Saturated BRUSA magnetics — the backward pass recomputes segments through
the exact LUT gather and backprops the inverter constraint (hexagon clip,
Park rotations) and the policy, all w.r.t. the SMEM-streamed gain pytree.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_closed_loop

B, T = 8192, 128
env = excenvs.PMSM(
    batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
    control_state=["i_d", "i_q"],
)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
s0 = structures.replace(
    s0,
    reference=structures.replace(
        s0.reference,
        i_d=jnp.linspace(-200.0, -10.0, B, dtype=jnp.float32),
        i_q=jnp.linspace(-150.0, 150.0, B, dtype=jnp.float32),
    ),
)


def policy(obs, t, p):
    e_d = obs[0] - obs[8]
    e_q = obs[1] - obs[9]
    a_d = -p["kd"] * e_d - p["kw"] * obs[2] * obs[1]
    a_q = -p["kq"] * e_q + p["kw"] * obs[2] * obs[0]
    return (a_d, a_q)


params = {
    "kd": jnp.asarray(0.3, jnp.float32),
    "kq": jnp.asarray(0.3, jnp.float32),
    "kw": jnp.asarray(0.0, jnp.float32),
}


def loss(p):
    obs, acts, _ = pmsm_fused_closed_loop(
        env, s0, policy, T, obs_stride=8, gather="int8", policy_params=p
    )
    # clip the error: a fraction of the batch is open-loop unstable at weak
    # gains (high-|omega| field-weakening region) and would otherwise drown
    # the gradient signal of the stable samples
    e_d = jnp.clip(obs[:, :, 0] - obs[:, :, 8], -3.0, 3.0)
    e_q = jnp.clip(obs[:, :, 1] - obs[:, :, 9], -3.0, 3.0)
    return jnp.mean(e_d**2 + e_q**2)


t0 = time.time()
l0 = float(loss(params))
print("fwd loss", l0, "in", time.time() - t0, flush=True)
t0 = time.time()
g = jax.grad(loss)(params)
print("grad", {k: float(v) for k, v in g.items()}, "in", time.time() - t0, flush=True)
assert all(jnp.isfinite(v) for v in g.values())
import optax

p = dict(params)
opt = optax.adam(0.1)
opt_state = opt.init(p)
vg = jax.jit(jax.value_and_grad(loss))
for i in range(12):
    l, g = vg(p)
    updates, opt_state = opt.update(g, opt_state)
    p = optax.apply_updates(p, updates)
    print("iter", i, "loss", float(l), flush=True)
lf = float(loss(p))
print("loss after descent", lf, "from", l0, "gains", {k: float(v) for k, v in p.items()}, flush=True)
assert lf < l0
print("PMSM POLICY GRAD DEVICE DONE", flush=True)
