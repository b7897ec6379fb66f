"""Device: fleet-scale parallel EKF current observers on the PMSM drive.

B independent 7-state extended Kalman filters — one per drive — run as ONE
vmapped ``lax.scan`` program; each filter step re-linearizes the drive's own
transition (``jax.jacobian`` through the inverter hexagon constraint, the
deadtime buffer swap and the linear-magnetics torque) and assimilates noisy
current + speed measurements.  The production shape of drive-fleet
monitoring: reconstructing clean currents from cheap noisy sensors at rates
far above the control loop's.

Timing methodology per CLAUDE.md: filter iterations chain through the scan
carry, so the marginal time between two horizon lengths is trustworthy;
inputs are perturbed per repeat to defeat the relay's (executable, args)
cache; results are fetched as reduced host scalars.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils import estimate

B = 2048
T1, T2 = 128, 2048

env = excenvs.PMSM(
    batch_size=B, saturated=False, observation_noise={"i_d": 8.0, "i_q": 8.0}
)
keys = jax.random.split(jax.random.PRNGKey(0), B)
state0 = env.vmap_reset(keys)[1]
t_grid = jnp.arange(T2) * env.tau
actions = jnp.broadcast_to(
    0.15 * jnp.stack([jnp.sin(300.0 * t_grid), jnp.cos(300.0 * t_grid)], axis=-1)[None],
    (B, T2, 2),
)
obs, _ = env.vmap_rollout(state0, actions)
print("data", obs.shape, flush=True)


def run(T, rep=0):
    o = obs[:, :T] * (1.0 + 1e-9 * rep)
    t0 = time.perf_counter()
    res = estimate.run_ekf(
        env, o, actions[:, :T],
        measured_fields=("i_d", "i_q", "omega_el"),
        process_std={"i_d": 1.0, "i_q": 1.0},
    )
    fence = float(jnp.mean(res.nll))  # device->host fetch closes the timed region
    return fence, time.perf_counter() - t0


for T in (T1, T2):  # warm both compiles
    fence, dt = run(T)
    print(f"compile+run T={T}: {dt:.2f}s nll/step={fence / T:.3f}", flush=True)

_, t1 = run(T1, rep=1)
_, t2 = run(T2, rep=2)
marginal = (t2 - t1) / (T2 - T1)
value = B / marginal
print(f"t1={t1:.3f}s t2={t2:.3f}s marginal={marginal * 1e3:.3f} ms/step", flush=True)
print(f"parallel drive-EKF updates/s: {value:.3e}", flush=True)
print(json.dumps({
    "metric": "ekf_pmsm_fleet_updates_per_s",
    "value": value,
    "unit": "7-state filter-updates/s (predict + constrained-step Jacobian + update)",
    "config": f"pmsm_b{B}_currents_and_omega_measured",
    "t_k1": t1, "t_k2": t2, "k1": T1, "k2": T2,
    "scaling_ok": bool(t2 > t1 * 1.2),
}), flush=True)
print("ESTIMATE PMSM DEVICE DONE", flush=True)
