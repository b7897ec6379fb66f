"""GymnasiumVectorEnv: spaces, NEXT_STEP autoreset, time limit, references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.wrappers.gymnasium_vector import GymnasiumVectorEnv

B = 16


def _make(**kw):
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    return GymnasiumVectorEnv(env, seed=3, **kw)


def test_is_gymnasium_vector_env_with_spaces():
    venv = _make()
    assert isinstance(venv, gymnasium.vector.VectorEnv)
    assert venv.num_envs == B
    assert venv.metadata["autoreset_mode"] == gymnasium.vector.AutoresetMode.NEXT_STEP
    assert venv.single_observation_space.shape == (3,)  # theta, omega, theta_ref
    assert venv.single_action_space.shape == (1,)
    assert venv.observation_space.shape == (B, 3)
    assert venv.action_space.shape == (B, 1)

    obs, info = venv.reset(seed=11)
    assert isinstance(obs, np.ndarray) and obs.dtype == np.float32
    assert obs.shape == (B, 3) and np.isfinite(obs).all()  # references drawn
    assert info == {}

    a = venv.action_space.sample()
    obs, r, term, trunc, info = venv.step(a)
    for arr, dt in ((obs, np.float32), (r, np.float32), (term, bool), (trunc, bool)):
        assert isinstance(arr, np.ndarray) and arr.dtype == dt
    assert r.shape == (B,) and term.shape == (B,) and trunc.shape == (B,)
    assert np.isfinite(obs).all()


def test_reset_is_seed_deterministic_and_reference_episodic():
    venv = _make()
    obs1, _ = venv.reset(seed=5)
    obs2, _ = venv.reset(seed=5)
    np.testing.assert_array_equal(obs1, obs2)
    obs3, _ = venv.reset(seed=6)
    assert not np.array_equal(obs1, obs3)

    # references stay constant within an episode (no autoreset, mild actions)
    venv.reset(seed=7)
    refs = []
    for _ in range(5):
        obs, r, term, trunc, _ = venv.step(np.zeros((B, 1), np.float32))
        if not (term.any() or trunc.any()):
            refs.append(obs[:, 2].copy())
    for other in refs[1:]:
        np.testing.assert_array_equal(refs[0], other)


def test_next_step_autoreset_protocol():
    """A sub-env that ended on step t returns its reset observation with
    reward 0 and cleared flags on step t+1 (Gymnasium NEXT_STEP semantics)."""
    venv = _make(max_episode_steps=3)
    venv.reset(seed=0)
    a = np.zeros((B, 1), np.float32)
    venv.step(a)
    venv.step(a)
    obs3, r3, term3, trunc3, _ = venv.step(a)
    assert trunc3.all()  # time limit hit everywhere
    obs4, r4, term4, trunc4, _ = venv.step(np.ones((B, 1), np.float32))
    assert (r4 == 0).all() and (~term4).all() and (~trunc4).all()
    # the reset observation is a fresh draw, not the stepped old state
    assert not np.allclose(obs4, obs3)
    # counter restarted: another limit is 3 steps later, not immediately
    _, _, _, trunc5, _ = venv.step(a)
    assert not trunc5.any()
    venv.step(a)
    _, _, _, trunc7, _ = venv.step(a)
    assert trunc7.all()


def test_engine_truncation_reaches_the_api():
    """|obs| > 1 truncation (the engine's rule) surfaces as a (B,) bool."""
    env = excenvs.Pendulum(batch_size=B, tau=2e-2)
    venv = GymnasiumVectorEnv(env, seed=1)
    venv.reset(seed=1)
    saw = False
    for _ in range(300):
        _, _, term, trunc, _ = venv.step(np.full((B, 1), 1.0, np.float32))
        assert trunc.shape == (B,) and trunc.dtype == bool
        saw = saw or bool(trunc.any())
    assert saw  # constant max torque spins |omega| past the bound


def test_matches_gym_wrapper_dynamics():
    """One adapter step equals GymWrapper's gym_step on the same state and
    action (same reward/flag contract, modulo the adapter's (B,) reduction)."""
    from exciting_environments_tpu.core import structures

    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    venv = GymnasiumVectorEnv(env, seed=2)
    venv.reset(seed=2)
    state = venv._state
    a = 0.3 * np.ones((B, 1), np.float32)

    gw = excenvs.GymWrapper(env=env, control_state=["theta"])
    from jax.tree_util import tree_flatten

    gw.state = tree_flatten(state)[0]
    obs_gw, r_gw, term_gw, trunc_gw = gw.step(jnp.asarray(a))

    obs, r, term, trunc, _ = venv.step(a)
    np.testing.assert_allclose(obs, np.asarray(obs_gw, np.float32), rtol=1e-6)
    np.testing.assert_allclose(r, np.asarray(r_gw).reshape(B), rtol=1e-6)
    np.testing.assert_array_equal(term, np.asarray(term_gw).reshape(B, -1).any(axis=1))
    np.testing.assert_array_equal(trunc, np.asarray(trunc_gw).reshape(B, -1).any(axis=1))


def test_from_registry_and_lazy_export():
    venv = excenvs.GymnasiumVectorEnv.from_registry(
        excenvs.EnvironmentRegistry.CART_POLE, num_envs=8, max_episode_steps=10
    )
    obs, _ = venv.reset(seed=0)
    assert obs.shape == (8, 4)
    obs, r, term, trunc, _ = venv.step(venv.action_space.sample())
    assert obs.shape == (8, 4) and np.isfinite(obs).all()


@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_vector_env_with_stochastic_env(noise_mode):
    """Stochastic envs drop into the vector adapter: the per-step draws ride
    the same jitted vector step (chained-step stream in both modes), the
    autoreset branch reseeds from the per-instance keys, and two identically
    seeded adapters reproduce each other exactly."""
    def mk():
        env = excenvs.Pendulum(
            batch_size=4, control_state=["theta"],
            process_noise={"omega": 0.3}, observation_noise={"theta": 0.02},
            noise_mode=noise_mode,
        )
        return GymnasiumVectorEnv(env, max_episode_steps=8, seed=0)

    a, b = mk(), mk()
    obs_a, _ = a.reset(seed=3)
    obs_b, _ = b.reset(seed=3)
    np.testing.assert_array_equal(obs_a, obs_b)
    act = np.zeros((4, 1), np.float32)
    saw_trunc = False
    for _ in range(20):
        oa, ra, ta, tra, _ = a.step(act)
        ob, rb, tb, trb, _ = b.step(act)
        np.testing.assert_array_equal(oa, ob)
        np.testing.assert_array_equal(ra, rb)
        saw_trunc = saw_trunc or bool(np.any(tra))
        assert np.isfinite(oa).all()
    assert saw_trunc  # the time limit fired (autoreset exercised under noise)
