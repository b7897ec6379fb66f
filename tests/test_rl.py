"""On-device PPO (utils/rl.py): mechanics fast, learning in the slow lane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.rl import (
    PPOConfig,
    evaluate_policy,
    init_agent,
    policy_mean,
    train_ppo,
)


def _env(batch_size=8, tau=2e-2):
    return excenvs.Pendulum(batch_size=batch_size, tau=tau, control_state=["theta"])


def test_ppo_mechanics():
    env = _env()
    cfg = PPOConfig(n_steps=16, n_epochs=2, n_minibatches=4, max_episode_steps=32)
    res = train_ppo(env, iterations=2, key=jax.random.PRNGKey(0), config=cfg)
    assert set(res.metrics) == {
        "mean_reward", "pg_loss", "value_loss", "entropy", "approx_kl",
    }
    for name, v in res.metrics.items():
        assert v.shape == (2,), name
        assert np.isfinite(v).all(), name
    # tracking rewards are negative squared errors
    assert (res.metrics["mean_reward"] <= 0).all()
    # trained parameter pytree is finite and structurally an agent
    assert set(res.params) == {"actor", "log_std", "critic"}
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(res.params))


def test_ppo_scan_iterations_mode():
    """scan_iterations folds the whole run into one program; metrics have the
    same shape/meaning and training still produces finite parameters."""
    env = _env()
    cfg = PPOConfig(n_steps=16, n_epochs=2, n_minibatches=4, max_episode_steps=32)
    res = train_ppo(env, iterations=3, key=jax.random.PRNGKey(0), config=cfg,
                    scan_iterations=True)
    for name, v in res.metrics.items():
        assert v.shape == (3,), name
        assert np.isfinite(v).all(), name
    assert (res.metrics["mean_reward"] <= 0).all()
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(res.params))


def test_ppo_minibatch_validation():
    env = _env()
    cfg = PPOConfig(n_steps=3, n_minibatches=7)
    with pytest.raises(ValueError, match="divisible"):
        train_ppo(env, iterations=1, config=cfg)


def test_ppo_warm_start_and_policy_mean():
    env = _env()
    params = init_agent(env, jax.random.PRNGKey(3))
    cfg = PPOConfig(n_steps=8, n_epochs=1, n_minibatches=2)
    res = train_ppo(env, iterations=1, key=jax.random.PRNGKey(0), config=cfg, params=params)
    obs = jnp.zeros((5, len(env.obs_description)))
    act = policy_mean(res.params, obs)
    assert act.shape == (5, env.action_dim)
    assert bool((jnp.abs(act) <= 1.0).all())


def test_evaluate_policy_scalar():
    env = _env()
    params = init_agent(env, jax.random.PRNGKey(1))
    val = evaluate_policy(env, params, n_steps=16, max_episode_steps=32)
    assert isinstance(val, float) and np.isfinite(val)
    # deterministic: same key, same value
    assert val == evaluate_policy(env, params, n_steps=16, max_episode_steps=32)


def test_ppo_episode_boundaries():
    """GAE must not leak post-reset values across a done, yet must bootstrap
    through time-limit truncation: with gamma=lam=1 and a one-step time limit
    every step is truncated (never terminated), so each advantage reduces to
    exactly reward + V(true successor) - V(obs) — the accumulation is cut
    (done) but the bootstrap survives (not terminated)."""
    from exciting_environments_tpu.utils import rl

    env = _env(batch_size=4)
    params = init_agent(env, jax.random.PRNGKey(0))
    obs0, state0 = jax.jit(lambda k: rl._fresh(env, k))(jax.random.PRNGKey(2))
    carry = (state0, obs0, jnp.zeros((4,), jnp.int32))
    carry, traj = jax.jit(
        lambda p, c, k: rl._rollout(env, p, c, k, 6, 1, False)
    )(params, carry, jax.random.PRNGKey(5))
    assert bool(traj["done"].all())  # one-step time limit: every step is done
    assert not bool(traj["term"].any())  # ... but truncated, not terminated
    advs, rets = rl._gae(traj, gamma=1.0, lam=1.0)
    expected = traj["reward"] + traj["next_value"] - traj["value"]
    np.testing.assert_allclose(np.asarray(advs), np.asarray(expected), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rets), np.asarray(traj["reward"] + traj["next_value"]), rtol=1e-12
    )
    # genuine termination kills the bootstrap: force term=True everywhere
    traj_term = dict(traj, term=jnp.ones_like(traj["term"]))
    advs_t, _ = rl._gae(traj_term, gamma=1.0, lam=1.0)
    np.testing.assert_allclose(
        np.asarray(advs_t), np.asarray(traj["reward"] - traj["value"]), rtol=1e-12
    )


@pytest.mark.slow
def test_ppo_pendulum_tracking_improves():
    """150 PPO iterations on pendulum angle tracking must clearly beat the
    initial policy (fixed seeds; CPU arithmetic is deterministic, so this
    pins the learning dynamics rather than gambling on them)."""
    env = _env(batch_size=256)
    cfg = PPOConfig(
        n_steps=64, n_epochs=4, n_minibatches=8, max_episode_steps=128,
        learning_rate=2e-3, gamma=0.95, ent_coef=0.001,
    )
    params = init_agent(env, jax.random.PRNGKey(42))
    params["log_std"] = params["log_std"] - 0.7
    res = train_ppo(env, iterations=150, key=jax.random.PRNGKey(0), config=cfg, params=params)

    init_eval = evaluate_policy(
        env, init_agent(env, jax.random.PRNGKey(1)), 128, max_episode_steps=128
    )
    trained_eval = evaluate_policy(env, res.params, 128, max_episode_steps=128)
    assert trained_eval > init_eval + 0.25, (init_eval, trained_eval)
    # training reward trend agrees with the evaluation verdict
    m = res.metrics["mean_reward"]
    assert m[-20:].mean() > m[:20].mean() + 0.2


def test_ppo_params_checkpoint_roundtrip(tmp_path):
    """Trained agent parameters are plain pytrees: utils.checkpoint must
    round-trip them bit-identically (resume/deploy path)."""
    from exciting_environments_tpu.utils import checkpoint

    env = _env()
    params = init_agent(env, jax.random.PRNGKey(7))
    path = str(tmp_path / "agent")
    checkpoint.save_state(params, path)
    restored = checkpoint.load_state(params, path)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
