"""On-device SAC (utils/sac.py): mechanics fast, learning in the slow lane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.sac import (
    SACConfig,
    evaluate_sac,
    init_sac_agent,
    sac_policy_mean,
    train_sac,
)


def _env(batch_size=16):
    return excenvs.Pendulum(batch_size=batch_size, tau=2e-2, control_state=["theta"])


def test_sac_mechanics():
    env = _env()
    cfg = SACConfig(n_steps=4, updates_per_iteration=2, update_batch_size=64,
                    buffer_capacity=4 * 16 * 8, learning_starts=128,
                    max_episode_steps=32)
    res = train_sac(env, iterations=5, key=jax.random.PRNGKey(0), config=cfg)
    assert set(res.metrics) == {"mean_reward", "q_loss", "actor_loss", "alpha", "entropy"}
    for name, v in res.metrics.items():
        assert v.shape == (5,) and np.isfinite(v).all(), name
    # warmup gate: 64 steps after iter 1 < learning_starts=128 -> no update,
    # updates kick in once the buffer passes the threshold
    assert res.metrics["q_loss"][0] == 0.0
    assert res.metrics["q_loss"][-1] != 0.0
    assert (res.metrics["mean_reward"] <= 0).all()
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(res.params))


def test_sac_policy_and_eval():
    env = _env()
    params = init_sac_agent(env, jax.random.PRNGKey(3))
    act = sac_policy_mean(params, jnp.zeros((5, len(env.obs_description))))
    assert act.shape == (5, env.action_dim)
    assert bool((jnp.abs(act) <= 1.0).all())
    val = evaluate_sac(env, params, n_steps=8, max_episode_steps=32)
    assert isinstance(val, float) and np.isfinite(val)
    assert val == evaluate_sac(env, params, n_steps=8, max_episode_steps=32)


def test_sac_sample_action_is_squashed_and_consistent():
    """Sampled actions stay inside (-1, 1) and the log-prob matches a
    numerical change-of-variables check against the pre-squash Gaussian."""
    from exciting_environments_tpu.utils import sac

    env = _env()
    params = init_sac_agent(env, jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, len(env.obs_description)))
    a, logp = sac._sample_action(params, obs, jax.random.PRNGKey(2))
    assert bool((jnp.abs(a) < 1.0).all())
    assert np.isfinite(np.asarray(logp)).all()
    # recompute: logp = N(u; mean, std) - sum log(1 - tanh(u)^2)
    mean, log_std = sac._actor_dist(params, obs)
    u = jnp.arctanh(jnp.clip(a, -1 + 1e-9, 1 - 1e-9))
    g = jnp.sum(-0.5 * ((u - mean) / jnp.exp(log_std)) ** 2 - log_std
                - 0.5 * np.log(2 * np.pi), axis=-1)
    expected = g - jnp.sum(jnp.log(1.0 - jnp.tanh(u) ** 2), axis=-1)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(expected), rtol=1e-6)


def test_sac_buffer_capacity_validation():
    env = _env()
    with pytest.raises(ValueError, match="multiple"):
        train_sac(env, 1, config=SACConfig(n_steps=3, buffer_capacity=100))


@pytest.mark.slow
def test_sac_pendulum_tracking_improves():
    """300 SAC iterations on pendulum angle tracking must clearly beat the
    initial policy (fixed seeds; deterministic CPU arithmetic pins the
    learning dynamics)."""
    env = excenvs.Pendulum(batch_size=128, tau=2e-2, control_state=["theta"])
    cfg = SACConfig(n_steps=8, updates_per_iteration=16, update_batch_size=1024,
                    buffer_capacity=2**15, learning_starts=8192,
                    learning_rate=1e-3, gamma=0.99, max_episode_steps=128)
    res = train_sac(env, iterations=300, key=jax.random.PRNGKey(0), config=cfg)

    init_ev = evaluate_sac(env, init_sac_agent(env, jax.random.PRNGKey(1)), 128,
                           max_episode_steps=128)
    trained_ev = evaluate_sac(env, res.params, 128, max_episode_steps=128)
    assert trained_ev > init_ev + 0.3, (init_ev, trained_ev)
    m = res.metrics["mean_reward"]
    assert m[-20:].mean() > m[:20].mean() + 0.25


@pytest.mark.slow
def test_sac_scan_iterations_mode():
    """scan_iterations folds the run (ring buffer as carry) into one program."""
    env = _env()
    cfg = SACConfig(n_steps=4, updates_per_iteration=2, update_batch_size=64,
                    buffer_capacity=4 * 16 * 8, learning_starts=128,
                    max_episode_steps=32)
    res = train_sac(env, iterations=4, key=jax.random.PRNGKey(0), config=cfg,
                    scan_iterations=True)
    for name, v in res.metrics.items():
        assert v.shape == (4,) and np.isfinite(v).all(), name
    assert res.metrics["q_loss"][0] == 0.0 and res.metrics["q_loss"][-1] != 0.0
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(res.params))
