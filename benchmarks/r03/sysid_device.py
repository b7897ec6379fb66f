"""Device: TPU-scale multistart system identification.

8192 candidate parameter sets x 8 multiple-shooting segments = 65536
concurrent rollouts per loss evaluation; the whole fit (forward + VJP +
adam, every iteration) is ONE lax.scan program — one device dispatch per
fit regardless of iteration count.  Timing methodology per CLAUDE.md: the
iteration scan is sequentially data-dependent (optimizer state chains), so
the marginal time between two scan lengths is trustworthy; results are
fetched as reduced host scalars.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.ops.signals import aprbs
from exciting_environments_tpu.utils.sysid import fit_parameters

TAU = 1e-2
TRUE = {"l": 1.3, "m": 0.8}
N_STARTS, T, SEG = 8192, 256, 32
K1, K2 = 400, 3200  # big enough that the marginal chain time dwarfs relay latency

env = excenvs.Pendulum(batch_size=4, tau=TAU)
props = structures.replace(
    env.env_properties,
    static_params=structures.replace(env.env_properties.static_params, **TRUE),
)
actions = aprbs(jax.random.PRNGKey(0), 1, T, 1, hold_min=5, hold_max=20)[0]
init_state = env.init_state(props)
recorded, _, _ = env.sim_ahead(init_state, actions, props, TAU, TAU)
print("recorded", recorded.shape, float(jnp.abs(recorded).max()), flush=True)


def fit(iters, rep=0):
    # fresh args per timed repeat (relay (executable, args) cache, CLAUDE.md)
    rec = recorded * (1.0 + 1e-9 * rep)
    t0 = time.perf_counter()
    r = fit_parameters(
        env, actions, rec, {"l": 1.0, "m": 1.0},
        init_state=init_state, n_starts=N_STARTS, iterations=iters,
        segment_length=SEG, spread=0.5,
    )
    dt = time.perf_counter() - t0  # includes the host fetch of the reduced results
    return r, dt


# warm the compile cache for both scan lengths, then time fresh runs
for it in (K1, K2):
    r, dt = fit(it)
    print(f"compile+run iters={it}: {dt:.2f}s loss={r.final_loss:.3e}", flush=True)

r1, t1 = fit(K1, rep=1)
r2, t2 = fit(K2, rep=2)
marginal = (t2 - t1) / (K2 - K1)
# one iteration = forward + VJP over N_STARTS x T env-steps (fwd-equivalent count)
steps_per_iter = N_STARTS * T
value = steps_per_iter / marginal
print(f"t1={t1:.3f}s t2={t2:.3f}s marginal={marginal*1e3:.2f} ms/iter", flush=True)
print(f"candidate-env-steps/s (fwd+grad fit iterations): {value:.3e}", flush=True)
print("fit result @K2:", r2.params, r2.final_loss, flush=True)
ok_scaling = t2 > t1 * 1.2
rel_err = max(abs(r2.params[k] - TRUE[k]) / TRUE[k] for k in TRUE)
print(json.dumps({
    "metric": "sysid_multistart_fit_steps_per_s",
    "value": value,
    "unit": "candidate-env-steps/s (fwd+VJP+adam per iteration)",
    "config": f"pendulum_nstarts{N_STARTS}_T{T}_seg{SEG}",
    "k1": K1, "k2": K2, "t_k1": t1, "t_k2": t2, "scaling_ok": bool(ok_scaling),
    "final_rel_err": rel_err,
}), flush=True)
