"""Device: SMEM-streamed policy params + policy gradient through the kernel."""
import json, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

B, T = 65536, 1024
env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
_, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
s0 = structures.replace(s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.5, 1.5, B)))

def policy(obs, t, p):
    return (-p["k1"] * (obs[0] - obs[2]) - p["k2"] * obs[1],)

params = {"k1": jnp.asarray(0.9, jnp.float32), "k2": jnp.asarray(0.25, jnp.float32)}

def loss(p):
    obs, acts, _ = env_fused_closed_loop(env, s0, policy, T, obs_stride=64, policy_params=p)
    return jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)

t0 = time.time()
l0 = float(loss(params))
print("fwd loss", l0, "in", time.time() - t0, flush=True)
t0 = time.time()
g = jax.grad(loss)(params)
print("grad", {k: float(v) for k, v in g.items()}, "in", time.time() - t0, flush=True)
assert all(jnp.isfinite(v) for v in g.values())
# a couple of on-device descent steps reduce the loss
p = dict(params)
vg = jax.jit(jax.value_and_grad(loss))
for i in range(8):
    l, g = vg(p)
    p = {k: v - 2.0 * g[k] for k, v in p.items()}
print("loss after descent", float(loss(p)), "from", l0, flush=True)
print("POLICY GRAD DEVICE DONE", flush=True)
