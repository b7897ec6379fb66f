"""Round-3 TPU smoke: restructured PMSM kernel still bit-exact; vjp compiles."""
import json, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

B, T = 65536, 64
print("devices:", jax.devices(), flush=True)
env = excenvs.PMSM(batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
acts = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 2), minval=-0.6, maxval=0.6)

t0 = time.time()
obs_f, last_f = pmsm_fused_rollout(env, s0, acts, gather="dot")
print("fused compiled+ran in", time.time() - t0, flush=True)
t0 = time.time()
obs_s, last_s = env.vmap_rollout(s0, acts, T)
print("scan compiled+ran in", time.time() - t0, flush=True)

devs = {}
for n in ("i_d", "i_q", "epsilon", "torque", "u_d_buffer", "u_q_buffer"):
    d = jnp.max(jnp.abs(getattr(last_f.physical_state, n) - getattr(last_s.physical_state, n)))
    devs[n] = float(d)
devs["obs"] = float(jnp.max(jnp.abs(obs_f - obs_s[:, -1])))
print("BITEXACT_DEVS", json.dumps(devs), flush=True)

# grad through the fused path compiles and runs on hardware
t0 = time.time()
g = jax.grad(lambda a: jnp.sum(pmsm_fused_rollout(env, s0, a, gather="dot")[0] ** 2))(acts[:, :16])
gn = float(jnp.linalg.norm(g))
print("GRAD_OK norm", gn, "finite", bool(jnp.isfinite(g).all()), "in", time.time() - t0, flush=True)

# generic kernel grad on hardware (cartpole tsit5)
cenv = excenvs.CartPole(batch_size=B, solver="tsit5")
_, cs0 = cenv.vmap_reset(jax.random.split(jax.random.PRNGKey(2), B))
ca = jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 1), minval=-0.7, maxval=0.7)
from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout
t0 = time.time()
g2 = jax.grad(lambda a: jnp.sum(env_fused_rollout(cenv, cs0, a)[0] ** 2))(ca)
print("GENERIC_GRAD_OK norm", float(jnp.linalg.norm(g2)), "finite", bool(jnp.isfinite(g2).all()), "in", time.time() - t0, flush=True)
print("SMOKE DONE", flush=True)
