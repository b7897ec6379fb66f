"""VanDerPol: dynamics sanity, stiffness behavior, engine-feature coverage.

The beyond-reference oscillator doubles as the extensibility proof: a
declarative ~80-line subclass must get every engine feature for free —
batching, per-batch heterogeneous ``mu``, the fused Pallas kernel, the
adaptive integrator, implicit Euler, and the registry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import TILE, env_fused_rollout


def _rollout_zero_force(env, n_steps, state=None, obs_stride=None):
    if state is None:
        _, state = env.vmap_reset()
    actions = jnp.zeros((env.batch_size, n_steps, 1))
    obs, last = env.vmap_rollout(state, actions, obs_stride or n_steps)
    return obs, last


def test_limit_cycle_amplitude():
    """The unforced Van der Pol limit cycle has position amplitude ~2
    independent of mu (classical result); trajectories from the default
    initial state must settle onto it."""
    env = excenvs.VanDerPol(batch_size=4, tau=1e-3, static_params={"mu": 2.0})
    obs, _ = _rollout_zero_force(env, 30_000, obs_stride=10)  # 30 time units
    x = np.asarray(obs[:, 1_500:, 0]) * 4.0  # denormalize (position in +-4)
    amp = np.max(np.abs(x), axis=1)
    np.testing.assert_allclose(amp, 2.0, atol=0.1)


def test_registry_and_defaults():
    env = excenvs.EnvironmentRegistry.VAN_DER_POL.make(batch_size=8)
    assert isinstance(env, excenvs.VanDerPol)
    assert list(env.obs_description) == ["position", "velocity"]
    assert float(env.env_properties.static_params.mu) == 5.0
    obs, state = env.vmap_reset()
    np.testing.assert_allclose(np.asarray(obs[:, 0]), 0.25, atol=1e-7)


def test_rk4_order_of_convergence():
    """Halving tau must shrink the RK4 global error ~16x (order 4)."""
    errs = []
    for tau in (2e-3, 1e-3):
        env = excenvs.VanDerPol(batch_size=2, tau=tau, solver="rk4",
                                static_params={"mu": 1.0})
        ref = excenvs.VanDerPol(batch_size=2, tau=tau / 64, solver="rk4",
                                static_params={"mu": 1.0})
        n = int(round(1.0 / tau))
        _, state = env.vmap_reset()
        obs, _ = _rollout_zero_force(env, n, state)
        obs_ref, _ = _rollout_zero_force(ref, 64 * n, state)
        errs.append(float(jnp.max(jnp.abs(obs[:, -1] - obs_ref[:, -1]))))
    assert errs[1] < errs[0] / 8  # asymptotic 16, allow slack


def test_fused_kernel_covers_it():
    """A fresh declarative env is in generic-kernel scope with no extra code."""
    env = excenvs.VanDerPol(batch_size=TILE, solver="tsit5")
    assert rollout_path(env) == "fused"
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), TILE))
    actions = 0.3 * jnp.ones((TILE, 8, 1))
    obs_ref, last_ref = env.vmap_rollout(state, actions, 8)
    obs_fused, last_fused = env_fused_rollout(env, state, actions, interpret=True, strict=True)
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref[:, -1]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(last_fused.physical_state.velocity),
        np.asarray(last_ref.physical_state.velocity), rtol=1e-9, atol=1e-9,
    )


def test_adaptive_resolves_heterogeneous_stiffness():
    """Per-batch mu spanning 1..50: the adaptive integrator matches a dense
    fixed-step reference on every instance, and its per-instance step counts
    grow with mu (stiff instances take more steps — the point of the
    torchode-style controller)."""
    from exciting_environments_tpu.ops.adaptive import adaptive_rollout

    B = 4
    mu = jnp.asarray([1.0, 5.0, 20.0, 50.0])
    env = excenvs.VanDerPol(batch_size=B, tau=2e-2, static_params={"mu": mu})
    _, state = env.vmap_reset()
    actions = jnp.zeros((B, 25, 1))

    obs_ad, last_ad, stats = adaptive_rollout(env, state, actions, rtol=1e-8, atol=1e-10)

    dense = excenvs.VanDerPol(batch_size=B, tau=2e-2 / 512, solver="rk4",
                              static_params={"mu": mu})
    obs_ref, _ = _rollout_zero_force(dense, 25 * 512, state)
    np.testing.assert_allclose(np.asarray(obs_ad), np.asarray(obs_ref[:, -1]),
                               rtol=1e-5, atol=1e-6)
    steps = np.asarray(stats.accepted)
    assert steps[3] > steps[0]  # measured [27, 27, 28, 52] over mu 1..50
    assert (np.diff(steps) >= 0).all()


def test_implicit_euler_stable_where_explicit_blows_up():
    """mu = 1000 at tau = 1e-2: explicit Euler overflows within the first
    hold intervals; implicit Euler stays bounded near the slow manifold."""
    B = 2
    mu = {"mu": 1000.0}
    exp_env = excenvs.VanDerPol(batch_size=B, tau=1e-2, solver="euler", static_params=mu)
    imp_env = excenvs.VanDerPol(batch_size=B, tau=1e-2, solver="implicit_euler", static_params=mu)
    _, state = exp_env.vmap_reset()
    obs_exp, _ = _rollout_zero_force(exp_env, 50, state)
    obs_imp, _ = _rollout_zero_force(imp_env, 50, state)
    assert not bool(jnp.isfinite(obs_exp[:, -1]).all())
    assert bool(jnp.isfinite(obs_imp).all())
    assert float(jnp.max(jnp.abs(obs_imp[:, :, 0]))) < 1.0  # |x| < 4 denorm
