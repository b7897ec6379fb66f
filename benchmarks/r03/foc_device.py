"""Device: fleet-scale sensorless field-oriented control of the induction machine.

B independent drive/EKF/FOC triples close the belief->law->act->measure->
assimilate loop as ONE program — per control step: the flux-oriented PI law
(a handful of elementwise ops), one noisy-current-sensor plant step, and a
fleet of 4-state EKF predict/updates reconstructing the rotor flux the law
orients on.  The analytic-law counterpart of the MPPI output-feedback
benches (`ofc_device.py` / `ofc_pmsm_device.py`): no candidate sweep, so the
fleet replans at simulation rate.

Timing methodology per CLAUDE.md: control steps chain through the scan
carry (plant state, belief, PI integrators), so the marginal time between
two loop lengths is trustworthy; the reduced NLL fetch fences the region,
and the initial state is perturbed per timed run (relay caches args).
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.utils import foc, ofc

PSI_REF, TORQUE_REF = 0.7, 8.0


def make_fleet(batch, seed):
    """One drive fleet: noisy plant, deterministic twin, rest-start state
    (machine at standstill, zero flux — the canonical startup), FOC law."""
    plant = excenvs.InductionMachine(
        batch_size=batch, observation_noise={"i_sd": 0.3, "i_sq": 0.3}
    )
    model = excenvs.InductionMachine(batch_size=batch)
    _, st = plant.vmap_reset(jax.random.split(jax.random.PRNGKey(seed), batch))
    with structures.copy_and_mutate(st, validate=False) as st:
        st.physical_state.i_sd = jnp.zeros(batch)
        st.physical_state.i_sq = jnp.zeros(batch)
        st.physical_state.psi_rd = jnp.zeros(batch)
        st.physical_state.psi_rq = jnp.zeros(batch)
    controller, carry0 = foc.make_sensorless_foc(
        model, psi_ref=PSI_REF, torque_ref=TORQUE_REF
    )

    def run(n_steps, rep=0, **kw):
        """Timed closed loop; rep != 0 perturbs the start flux so the relay
        cannot serve a cached execution for the timed repeats."""
        s = st
        if rep:
            with structures.copy_and_mutate(s, validate=False) as s:
                s.physical_state.psi_rd = jnp.full((batch,), 1e-6 * rep)
        t0 = time.perf_counter()
        res = ofc.run_output_feedback_controller(
            plant, model, s, n_steps, controller, controller_carry=carry0,
            measured_fields=("i_sd", "i_sq"),
            process_std={"psi_rd": 0.02, "psi_rq": 0.02},
            x0=jnp.zeros((4,)), **kw,
        )
        fence = float(jnp.mean(res.nll))  # device->host fetch closes the region
        return res, fence, time.perf_counter() - t0

    return model, run


# --- b=4096, full trajectories -------------------------------------------
B = 4096
K1, K2 = 256, 4096  # K2 bounded by the materialized belief covariances (B x T x 4 x 4)
model, run = make_fleet(B, seed=0)

for n in (K1, K2):  # warm both compiles
    res, fence, dt = run(n)
    print(f"compile+run n_steps={n}: {dt:.2f}s nll/step={fence / n:.3f}", flush=True)

# control quality at the long horizon: TRUE flux/torque vs setpoints
fs = res.final_state.physical_state
psi = jnp.sqrt(fs.psi_rd**2 + fs.psi_rq**2)
tq = model.torque(res.final_state)
psi_err = float(jnp.max(jnp.abs(psi - PSI_REF)))
tq_err = float(jnp.max(jnp.abs(tq - TORQUE_REF)))
print(f"fleet max |psi-{PSI_REF}|={psi_err:.3f}, max |T-{TORQUE_REF}|={tq_err:.3f}", flush=True)
assert psi_err < 0.1 and tq_err < 1.5

_, _, t1 = run(K1, rep=1)
_, _, t2 = run(K2, rep=2)
marginal = (t2 - t1) / (K2 - K1)
print(f"t1={t1:.3f}s t2={t2:.3f}s marginal={marginal * 1e3:.3f} ms/control-step", flush=True)
print(f"FOC fleet replans at {1.0 / marginal:.0f} Hz "
      f"({B / marginal:.3e} law+plant+EKF triples/s)", flush=True)
print(json.dumps({
    "metric": "foc_fleet_replan_hz",
    "value": 1.0 / marginal,
    "unit": "control steps/s for the whole fleet (FOC law + plant + 4-state EKF)",
    "config": f"scim_b{B}_currents_measured_psi{PSI_REF}_T{TORQUE_REF}",
    "triples_per_s": B / marginal,
    "k1": K1, "k2": K2, "t_k1": t1, "t_k2": t2,
    "scaling_ok": bool(t2 > t1 * 1.2),
    "fleet_max_abs_psi_err": psi_err,
    "fleet_max_abs_torque_err": tq_err,
}), flush=True)

# --- fleet scale: is the loop per-plant-work-bound or dispatch-bound? ----
# (Measured answer: work-bound — per-step time scales linearly with B, so
# triples/s is batch-invariant at ~1.1e6.)  return_trajectories=False
# keeps memory bounded by the fleet (the belief-covariance history alone
# would be 17 GB here).
BF = 65536
KF1, KF2 = 64, 512
_, run_f = make_fleet(BF, seed=5)

for n in (KF1, KF2):
    _, fence, dt = run_f(n, return_trajectories=False)
    print(f"compile+run fleet n_steps={n}: {dt:.2f}s", flush=True)
_, _, tf1 = run_f(KF1, rep=1, return_trajectories=False)
_, _, tf2 = run_f(KF2, rep=2, return_trajectories=False)
marg_f = (tf2 - tf1) / (KF2 - KF1)
print(f"fleet t1={tf1:.3f}s t2={tf2:.3f}s marginal={marg_f * 1e3:.3f} ms/control-step", flush=True)
print(json.dumps({
    "metric": "foc_fleet65536_triples_per_s",
    "value": BF / marg_f,
    "unit": "FOC law + plant + 4-state EKF triples/s (return_trajectories=False)",
    "config": f"scim_b{BF}_currents_measured_psi{PSI_REF}_T{TORQUE_REF}",
    "replan_hz": 1.0 / marg_f,
    "k1": KF1, "k2": KF2, "t_k1": tf1, "t_k2": tf2,
    "scaling_ok": bool(tf2 > tf1 * 1.2),
}), flush=True)
print("FOC DEVICE DONE", flush=True)
