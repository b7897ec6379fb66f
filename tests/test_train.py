"""Controller training through the closed-loop kernels (utils/train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.core import structures
from exciting_environments_tpu.utils.train import default_tracking_loss, train_policy

BATCH = 1024


def _pendulum_setup():
    env = excenvs.Pendulum(batch_size=BATCH, tau=1e-2, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.2, 1.2, BATCH))
    )
    return env, s0


def _pd(obs, t, p):
    return (-p["kp"] * (obs[0] - obs[2]) - p["kd"] * obs[1],)


@pytest.mark.slow
def test_train_policy_pendulum_improves():
    env, s0 = _pendulum_setup()
    params = {"kp": jnp.asarray(0.1), "kd": jnp.asarray(0.0)}
    res = train_policy(env, _pd, params, s0, n_steps=24, iterations=10, interpret=True)
    assert res.losses.shape == (10,)
    assert res.final_loss <= float(res.losses[0])
    assert res.final_loss == min(float(res.losses.min()), res.final_loss)
    # trained gains are finite and the loss history is finite throughout
    assert all(bool(jnp.isfinite(v)) for v in jax.tree_util.tree_leaves(res.params))
    assert bool(jnp.isfinite(res.losses).all())


@pytest.mark.slow
def test_train_policy_stochastic_env_noise_robust():
    """Stochastic classic envs train at kernel speed: the closed-loop kernel
    streams the sensor/process draw slabs, so the descent tunes an
    output-feedback law against NOISY measurements (fixed realizations per
    state keys — common random numbers)."""
    env = excenvs.Pendulum(
        batch_size=BATCH, tau=1e-2, control_state=["theta"],
        process_noise={"omega": 0.2}, observation_noise={"theta": 0.03},
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.2, 1.2, BATCH))
    )
    params = {"kp": jnp.asarray(0.1), "kd": jnp.asarray(0.0)}
    res = train_policy(env, _pd, params, s0, n_steps=24, iterations=10, interpret=True)
    assert res.final_loss <= float(res.losses[0])
    assert bool(jnp.isfinite(res.losses).all())
    # the tuned gains differ from the init (gradients flowed through the
    # noisy kernel loop)
    assert float(res.params["kp"]) != 0.1


@pytest.mark.slow
def test_train_policy_pmsm_drive():
    env = excenvs.PMSM(
        batch_size=BATCH, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        control_state=["i_d", "i_q"],
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), BATCH))
    s0 = structures.replace(
        s0,
        reference=structures.replace(
            s0.reference,
            i_d=jnp.linspace(-200.0, -10.0, BATCH),
            i_q=jnp.linspace(-150.0, 150.0, BATCH),
        ),
    )

    def pi(obs, t, p):
        return (-p["kd"] * (obs[0] - obs[8]), -p["kq"] * (obs[1] - obs[9]))

    params = {"kd": jnp.asarray(0.3), "kq": jnp.asarray(0.3)}
    res = train_policy(env, pi, params, s0, n_steps=16, iterations=8, interpret=True)
    assert res.final_loss < float(res.losses[0])


@pytest.mark.slow
def test_train_policy_stateful_pi_gains():
    """PI-gain tuning through the carried loop: the integral gain gets a
    real gradient (through the VMEM carry) and descent improves tracking."""
    env, s0 = _pendulum_setup()

    def pi(obs, t, carry, p):
        e = obs[2] - obs[0]
        integ = carry[0] + p["ki"] * e
        return (p["kp"] * e + integ - 0.2 * obs[1],), (integ,)

    params = {"kp": jnp.asarray(0.1), "ki": jnp.asarray(0.0)}
    carry0 = (jnp.zeros(BATCH),)
    res = train_policy(
        env, pi, params, s0, n_steps=24, iterations=10, interpret=True,
        policy_carry=carry0,
    )
    assert res.final_loss < float(res.losses[0])
    assert all(bool(jnp.isfinite(v)) for v in jax.tree_util.tree_leaves(res.params))
    # the integral gain moved: its gradient flows through the carry chain
    assert float(jnp.abs(res.params["ki"])) > 0.0


def test_train_policy_out_of_scope_raises():
    env = excenvs.Pendulum(batch_size=8, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), 8))
    with pytest.raises(ValueError, match="scope"):
        train_policy(env, _pd, {"kp": jnp.asarray(0.1), "kd": jnp.asarray(0.0)},
                     s0, n_steps=4, iterations=1, interpret=True)


def test_default_tracking_loss_requires_control_state():
    env = excenvs.Pendulum(batch_size=8)
    with pytest.raises(ValueError, match="control_state"):
        default_tracking_loss(env)


def test_pmsm_obs_description_matches_observation_columns():
    """The reference's description list disagrees with its own
    generate_observation column order (reference pmsm_env.py:258-267 vs
    :903-916) — anything pairing columns by name silently reads sin_eps where
    it wants torque.  Pin the fixed ordering against the actual columns."""
    B = 8
    env = excenvs.PMSM(batch_size=B, control_state=["torque"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B))
    eps = jnp.linspace(0.1, 2.9, B)
    torque = jnp.linspace(-5.0, 5.0, B)
    s0 = structures.replace(
        s0,
        physical_state=structures.replace(s0.physical_state, epsilon=eps, torque=torque),
        reference=structures.replace(s0.reference, torque=jnp.zeros(B)),
    )
    obs = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        s0, env.env_properties
    )
    names = list(env.obs_description)
    np.testing.assert_allclose(obs[:, names.index("cos_eps")], jnp.cos(eps), rtol=1e-6)
    np.testing.assert_allclose(obs[:, names.index("sin_eps")], jnp.sin(eps), rtol=1e-6)
    lim = env.env_properties.physical_normalizations.torque
    np.testing.assert_allclose(
        obs[:, names.index("torque")], 2 * (torque - lim.min) / (lim.max - lim.min) - 1, rtol=1e-6
    )
    assert names[-1] == "torque_ref"


def test_default_tracking_loss_pmsm_torque_pairs_real_column():
    """Tracking-loss regression: with references equal to the actual torque
    the loss must be ~0 (the old obs_description pairing read sin_eps)."""
    B = 8
    env = excenvs.PMSM(batch_size=B, control_state=["torque"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), B))
    torque = jnp.linspace(-5.0, 5.0, B)
    s0 = structures.replace(
        s0,
        physical_state=structures.replace(
            s0.physical_state, epsilon=jnp.linspace(0.3, 2.5, B), torque=torque
        ),
        reference=structures.replace(s0.reference, torque=torque),
    )
    obs = jax.vmap(env.generate_observation, in_axes=(0, env.in_axes_env_properties))(
        s0, env.env_properties
    )[:, None, :]  # (B, T=1, obs_dim)
    loss = default_tracking_loss(env)(obs, None)
    assert float(loss) < 1e-12


def test_train_policy_cpu_backend_requires_interpret():
    """Regression: interpret=False on the CPU backend must raise the
    module's descriptive error instead of crashing in Mosaic lowering
    (the guard every sibling path — FleetRunner, RolloutCollector — has)."""
    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend guard only observable on the CPU backend")
    env, s0 = _pendulum_setup()
    params = {"kp": jnp.asarray(0.1), "kd": jnp.asarray(0.0)}
    with pytest.raises(ValueError, match="interpret=True"):
        train_policy(env, _pd, params, s0, n_steps=4, iterations=1)


def test_train_policy_sharded_out_of_scope_raises_descriptive():
    """A ShardedEnv out of per-shard kernel scope must raise the descriptive
    scope error up front, not 'fused_closed_loop out of scope' mid-iteration."""
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    env = excenvs.Pendulum(batch_size=4096, tau=1e-2, control_state=["theta"])  # local 512
    senv = ShardedEnv(env, mesh)
    _, s0 = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(1), 4096))
    params = {"kp": jnp.asarray(0.1), "kd": jnp.asarray(0.0)}
    with pytest.raises(ValueError, match="sharded"):
        train_policy(senv, _pd, params, senv.shard(s0), n_steps=4, iterations=1,
                     interpret=True)
