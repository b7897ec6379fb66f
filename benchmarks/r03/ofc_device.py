"""Device: fleet-scale output-feedback MPC.

B independent plant/EKF/MPPI triples run the full belief->plan->act->
measure->assimilate loop as ONE program — per control step: an MPPI update
(n_samples x B x horizon candidate env steps), one noisy plant step, and a
fleet of EKF predict/updates (Jacobian re-linearization included).

Timing methodology per CLAUDE.md: control steps chain through the scan
carry (plant state, belief, plan), so the marginal time between two loop
lengths is trustworthy; the reduced reward fetch fences the timed region.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.utils import mpc, ofc
from exciting_environments_tpu.utils.episodes import reset_with_references

B, HORIZON, SAMPLES = 1024, 16, 64
K1, K2 = 8, 2048

plant = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"],
                         observation_noise={"theta": 0.08})
model = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
_, state = jax.jit(lambda k: reset_with_references(plant, k))(jax.random.PRNGKey(0))
with structures.copy_and_mutate(state, validate=False) as state:
    state.physical_state.theta = jnp.zeros(B)
    state.physical_state.omega = jnp.zeros(B)
    state.reference.theta = jnp.linspace(-0.9, 0.9, B)
cfg = mpc.MPPIConfig(horizon=HORIZON, n_samples=SAMPLES, temperature=0.02,
                     noise_sigma=0.5, n_iterations=1, smoothing=0.5)


def run(n_steps, seed=1):
    t0 = time.perf_counter()
    res = ofc.run_output_feedback_mppi(
        plant, model, state, n_steps, jax.random.PRNGKey(seed), cfg,
        measured_fields=("theta",), process_std={"omega": 0.05},
        x0=jnp.zeros((B, 2)),
    )
    fence = float(jnp.mean(res.rewards))  # device->host fetch closes the region
    return fence, time.perf_counter() - t0


for n in (K1, K2):  # warm both compiles
    fence, dt = run(n, seed=0)
    print(f"compile+run n_steps={n}: {dt:.2f}s mean-reward={fence:.4f}", flush=True)

# fresh keys per timed repeat: the relay caches identical (executable, args)
# executions (CLAUDE.md), so the timed runs must differ from the warmups
r1, t1 = run(K1, seed=11)
r2, t2 = run(K2, seed=12)
marginal = (t2 - t1) / (K2 - K1)
# per control step: the MPPI candidate sweep + one plant step + B EKF updates
cand_steps = SAMPLES * B * HORIZON
replan_hz = 1.0 / marginal
print(f"t1={t1:.3f}s t2={t2:.3f}s marginal={marginal * 1e3:.2f} ms/control-step", flush=True)
print(f"fleet replans at {replan_hz:.0f} Hz ({cand_steps / marginal:.3e} candidate-env-steps/s "
      f"+ {B / marginal:.3e} EKF updates/s)", flush=True)
print(json.dumps({
    "metric": "ofc_fleet_replan_hz",
    "value": replan_hz,
    "unit": "control steps/s for the whole fleet (MPPI sweep + plant + EKF)",
    "config": f"pendulum_b{B}_H{HORIZON}_K{SAMPLES}_theta_measured",
    "candidate_env_steps_per_s": cand_steps / marginal,
    "ekf_updates_per_s": B / marginal,
    "k1": K1, "k2": K2, "t_k1": t1, "t_k2": t2,
    "scaling_ok": bool(t2 > t1 * 1.2),
    "mean_reward": r2,
}), flush=True)
