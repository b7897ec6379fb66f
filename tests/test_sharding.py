"""Mesh-sharding equivalence tests on a virtual 8-device CPU mesh.

Proves the SPMD contract: a batch sharded over the mesh produces bit-identical
results to the single-device run (environment steps are embarrassingly
parallel, so GSPMD must introduce no communication or reordering).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.parallel import (
    ShardedEnv,
    make_batch_mesh,
    mean_metric,
    shard_batched_tree,
    violation_fraction,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    return make_batch_mesh()


def test_sharded_step_equals_single_device(mesh):
    batch = 64
    env = excenvs.Pendulum(batch_size=batch)
    obs_ref, state_ref = env.vmap_reset()
    actions = 0.25 * jnp.ones((batch, 1))
    obs_ref, state_ref = env.vmap_step(state_ref, actions)

    env2 = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env2, mesh)
    obs_s, state_s = senv.vmap_reset()
    state_s = senv.shard(state_s)
    obs_s, state_s = senv.vmap_step(state_s, actions)

    assert obs_s.sharding.is_equivalent_to(senv.shard(obs_ref).sharding, obs_s.ndim)
    np.testing.assert_array_equal(np.asarray(obs_s), np.asarray(obs_ref))


def test_sharded_rollout_equals_single_device(mesh):
    batch, T = 32, 50
    actions = jnp.tile(jnp.sin(jnp.linspace(0, 3, T))[None, :, None], (batch, 1, 1)) * 0.5

    env = excenvs.MassSpringDamper(batch_size=batch)
    _, s0 = env.vmap_reset()
    obs_ref, last_ref = env.vmap_rollout(s0, actions)

    env2 = excenvs.MassSpringDamper(batch_size=batch)
    senv = ShardedEnv(env2, mesh)
    _, s0s = senv.vmap_reset()
    s0s = senv.shard(s0s)
    obs_s, last_s = senv.vmap_rollout(s0s, actions)

    np.testing.assert_array_equal(np.asarray(obs_s), np.asarray(obs_ref))
    np.testing.assert_array_equal(
        np.asarray(last_s.physical_state.deflection), np.asarray(last_ref.physical_state.deflection)
    )


def test_heterogeneous_properties_shard_with_batch(mesh):
    """Per-batch parameters (in_axes==0 leaves) must ride with their shard."""
    batch = 16
    lengths = jnp.linspace(1.0, 2.0, batch)
    env = excenvs.Pendulum(batch_size=batch, static_params={"l": lengths, "g": 9.81, "m": 1})
    ref_obs, ref_state = env.vmap_reset()
    ref_obs, _ = env.vmap_step(ref_state, 0.5 * jnp.ones((batch, 1)))

    env2 = excenvs.Pendulum(batch_size=batch, static_params={"l": lengths, "g": 9.81, "m": 1})
    senv = ShardedEnv(env2, mesh)
    # the facade's per-batch `l` leaf must be split over the mesh...
    assert not senv.env.env_properties.static_params.l.sharding.is_fully_replicated
    # ...while the wrapped env object stays unmodified (docstring contract)
    assert env2.env_properties.static_params.l.sharding.is_fully_replicated
    obs_s, state_s = senv.vmap_reset()
    obs_s, _ = senv.vmap_step(senv.shard(state_s), 0.5 * jnp.ones((batch, 1)))
    np.testing.assert_array_equal(np.asarray(obs_s), np.asarray(ref_obs))


def test_metric_reduction_over_mesh(mesh):
    batch = 64
    env = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env, mesh)
    obs, state = senv.vmap_reset()
    state = senv.shard(state)
    obs, state = senv.vmap_step(state, jnp.zeros((batch, 1)))
    m = mean_metric(obs)
    assert m.shape == ()
    trunc = jax.vmap(env.generate_truncated, in_axes=(0, env.in_axes_env_properties))(
        state, env.env_properties
    )
    frac = violation_fraction(trunc)
    assert 0.0 <= float(frac) <= 1.0


def test_vmap_rollout_matches_step_loop():
    batch, T = 8, 20
    env = excenvs.CartPole(batch_size=batch)
    _, s0 = env.vmap_reset()
    actions = 0.3 * jnp.ones((batch, T, 1))

    obs_roll, last_roll = env.vmap_rollout(s0, actions)

    state = s0
    obs_seq = []
    for t in range(T):
        o, state = env.vmap_step(state, actions[:, t])
        obs_seq.append(o)
    np.testing.assert_array_equal(np.asarray(obs_roll), np.stack([np.asarray(o) for o in obs_seq], axis=1))
    np.testing.assert_array_equal(
        np.asarray(last_roll.physical_state.theta), np.asarray(state.physical_state.theta)
    )


def test_vmap_rollout_obs_stride():
    batch, T = 4, 12
    env = excenvs.Pendulum(batch_size=batch)
    _, s0 = env.vmap_reset()
    actions = 0.1 * jnp.ones((batch, T, 1))
    obs_full, last_full = env.vmap_rollout(s0, actions)
    obs_strided, last_strided = env.vmap_rollout(s0, actions, 3)
    assert obs_strided.shape == (batch, T // 3, obs_full.shape[-1])
    np.testing.assert_array_equal(np.asarray(obs_strided), np.asarray(obs_full[:, 2::3]))
    np.testing.assert_array_equal(
        np.asarray(last_strided.physical_state.theta), np.asarray(last_full.physical_state.theta)
    )


def test_shard_batched_tree_rules(mesh):
    tree = {
        "batched": jnp.ones((16, 3)),
        "scalar": 2.0,
        "small": jnp.ones((4,)),
    }
    placed = shard_batched_tree(tree, 16, mesh)
    assert not placed["batched"].sharding.is_fully_replicated
    assert placed["small"].sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_fused_rollout(mesh):
    """The fused Pallas kernel runs per shard under shard_map and matches the
    single-device scan path."""
    batch, T = 8192, 16  # 1024 envs per shard on the 8-device mesh
    env = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 1), minval=-0.9, maxval=0.9)

    obs_f, last_f = senv.fused_rollout(state, actions, interpret=True)
    obs_s, last_s = env.vmap_rollout(state, actions, T)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s[:, -1]), rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(last_f.physical_state.theta), np.asarray(last_s.physical_state.theta)
    )
    assert not last_f.physical_state.theta.sharding.is_fully_replicated


def test_sharded_fused_rollout_fallback(mesh):
    """Out-of-kernel-scope envs fall back to the sharded scan path."""
    batch = 64  # 8 per shard: below the kernel's 1024-env tile
    env = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset()
    state = senv.shard(state)
    actions = 0.2 * jnp.ones((batch, 4, 1))
    obs, last = senv.fused_rollout(state, actions)
    assert obs.shape == (batch, 2)
    # time-major input through the fallback transposes back
    obs_tm, _ = senv.fused_rollout(state, jnp.transpose(actions, (1, 0, 2)), time_major=True)
    np.testing.assert_array_equal(np.asarray(obs_tm), np.asarray(obs))


@pytest.mark.slow
def test_sharded_fused_rollout_time_major(mesh):
    """(T, B, A) slabs shard over axis 1 and match the batch-major kernel."""
    batch, T = 8192, 16
    env = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 1), minval=-0.9, maxval=0.9)

    obs, last = senv.fused_rollout(state, actions, interpret=True)
    obs_tm, last_tm = senv.fused_rollout(
        state, jnp.transpose(actions, (1, 0, 2)), time_major=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(obs_tm), np.asarray(obs))
    np.testing.assert_array_equal(
        np.asarray(last_tm.physical_state.theta), np.asarray(last.physical_state.theta)
    )
    assert not last_tm.physical_state.theta.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_adaptive_rollout(mesh):
    """Per-instance adaptive integration composes with the mesh: each shard's
    while_loop converges independently and results match single-device."""
    from exciting_environments_tpu.ops.adaptive import adaptive_rollout

    batch = 16
    env = excenvs.Pendulum(batch_size=batch, tau=2e-2)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, 8, 1), minval=-0.8, maxval=0.8)

    obs_s, last_s, stats_s = senv.adaptive_rollout(state, actions, rtol=1e-7, atol=1e-9)
    obs_r, last_r, stats_r = adaptive_rollout(env, state, actions, rtol=1e-7, atol=1e-9)

    assert not obs_s.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_r), rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(stats_s.accepted), np.asarray(stats_r.accepted))
    assert not bool(jnp.any(stats_s.incomplete))


@pytest.mark.slow
def test_sharded_adaptive_rollout_per_batch_props(mesh):
    """Per-batch heterogeneous parameters ride the mesh through the adaptive
    controller: each shard integrates with its local parameter slice and the
    result matches the single-device run."""
    from exciting_environments_tpu.ops.adaptive import adaptive_rollout

    batch = 16
    lengths = jnp.linspace(1.0, 2.0, batch)
    env = excenvs.Pendulum(batch_size=batch, static_params={"l": lengths, "g": 9.81, "m": 1})
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(3), batch))
    actions = jax.random.uniform(jax.random.PRNGKey(4), (batch, 6, 1), minval=-0.5, maxval=0.5)

    obs_s, last_s, stats_s = senv.adaptive_rollout(state, actions, rtol=1e-7, atol=1e-9)
    obs_r, last_r, stats_r = adaptive_rollout(env, state, actions, rtol=1e-7, atol=1e-9)

    assert not obs_s.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_r), rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(stats_s.accepted), np.asarray(stats_r.accepted))
    assert not bool(jnp.any(stats_s.incomplete))
    # heterogeneous lengths must actually produce heterogeneous trajectories
    assert float(jnp.std(last_s.physical_state.theta)) > 1e-3


@pytest.mark.slow
def test_sharded_adaptive_rollout_pmsm(mesh):
    """The stiff PMSM drive (derived fields + per-batch r_s) integrates
    adaptively under the mesh — SURVEY hard part (e)."""
    from exciting_environments_tpu.ops.adaptive import adaptive_rollout

    batch = 16
    r_s = jnp.linspace(10e-3, 40e-3, batch)
    params = {"p": 3, "r_s": r_s, "l_d": 0.37e-3, "l_q": 1.2e-3,
              "psi_p": 65.6e-3, "u_dc": 400, "deadtime": 1}
    env = excenvs.PMSM(batch_size=batch, tau=1e-4, static_params=params)
    senv = ShardedEnv(env, mesh)
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    _, state = senv.vmap_reset(keys)
    actions = 0.3 * jnp.ones((batch, 5, 2))

    obs_s, last_s, stats_s = senv.adaptive_rollout(state, actions, rtol=1e-8, atol=1e-10)
    obs_r, last_r, stats_r = adaptive_rollout(env, state, actions, rtol=1e-8, atol=1e-10)

    assert not obs_s.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_r), rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(stats_s.accepted), np.asarray(stats_r.accepted))
    assert not bool(jnp.any(stats_s.incomplete))


@pytest.mark.slow
def test_sharded_saturated_pmsm_step_and_rollout(mesh):
    """LUT constants replicate cleanly under GSPMD: the saturated-BRUSA PMSM
    steps and rolls out identically (to rounding) to the single-device run."""
    batch = 16
    env = excenvs.PMSM(batch_size=batch, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    _, state_ref = env.vmap_reset(keys)
    action = 0.2 * jnp.ones((batch, 2))
    obs_ref, state_ref1 = env.vmap_step(state_ref, action)
    actions = 0.15 * jnp.ones((batch, 12, 2))
    roll_ref, roll_last_ref = env.vmap_rollout(state_ref, actions)

    env2 = excenvs.PMSM(batch_size=batch, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    senv = ShardedEnv(env2, mesh)
    _, state_s = senv.vmap_reset(keys)
    obs_s, state_s1 = senv.vmap_step(state_s, action)
    roll_s, roll_last_s = senv.vmap_rollout(state_s, actions)

    assert not obs_s.sharding.is_fully_replicated
    # near-ULP rather than bit-exact: GSPMD partitioning may reassociate the
    # FMA chain inside the LUT bilinear blend (observed 1-ULP deltas on 2/128
    # elements); anything beyond rounding noise would still fail loudly
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_ref), rtol=1e-14, atol=1e-15)
    np.testing.assert_allclose(np.asarray(roll_s), np.asarray(roll_ref), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(roll_last_s.physical_state.i_d),
        np.asarray(roll_last_ref.physical_state.i_d), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(roll_last_s.physical_state.torque),
        np.asarray(roll_last_ref.physical_state.torque), rtol=1e-12,
    )


@pytest.mark.slow
def test_sharded_fused_pmsm_rollout(mesh):
    """The fused PMSM kernel (constraint pre-pass + current-integration
    kernel) runs per shard under shard_map and matches the single-device
    scan path at CPU closeness (see tests/test_pallas_pmsm.py docstring)."""
    batch, T = 8192, 8  # 1024 envs per shard on the 8-device mesh
    env = excenvs.PMSM(batch_size=batch, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 2), minval=-0.4, maxval=0.4)

    obs_f, last_f = senv.fused_rollout(state, actions, interpret=True)
    obs_s, last_s = env.vmap_rollout(state, actions, T)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s[:, -1]), rtol=1e-9, atol=1e-9)
    for name in ("i_d", "i_q", "epsilon", "torque", "u_d_buffer", "u_q_buffer"):
        np.testing.assert_allclose(
            np.asarray(getattr(last_f.physical_state, name)),
            np.asarray(getattr(last_s.physical_state, name)),
            rtol=1e-9,
            atol=1e-9,
            err_msg=name,
        )
    assert not last_f.physical_state.i_d.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_fused_pmsm_rollout_per_batch_params(mesh):
    """Round-4: a domain-randomized drive fleet (per-batch r_s) stays in the
    fused PMSM kernel's scope UNDER THE MESH — the heterogeneous property
    leaves ride shard_map as sharded operands and each shard launches with
    its local parameter slices."""
    batch, T = 8192, 8
    params = dict(excenvs.MotorVariant.BRUSA.get_params().static_params.__dict__)
    params["r_s"] = jnp.asarray(params["r_s"]) * (
        1 + 0.3 * jax.random.uniform(jax.random.PRNGKey(5), (batch,))
    )
    env = excenvs.PMSM(
        batch_size=batch, saturated=True,
        motor_variant=excenvs.MotorVariant.BRUSA, static_params=params,
    )
    senv = ShardedEnv(env, mesh)
    assert senv._fused_in_scope()
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 2), minval=-0.4, maxval=0.4)

    obs_f, last_f = senv.fused_rollout(state, actions, interpret=True, strict=True)
    obs_s, last_s = env.vmap_rollout(state, actions, T)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s[:, -1]), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.i_q),
        np.asarray(last_s.physical_state.i_q), rtol=1e-9, atol=1e-11,
    )
    assert not last_f.physical_state.i_d.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_fused_pmsm_stochastic_rollout(mesh):
    """Round-4: a stochastic drive (current process noise + current sensor
    noise) rides the fused PMSM kernel per shard, draw-identical to the
    single-device scan (the draw streams are per-instance, so the mesh
    partition cannot change them)."""
    batch, T = 8192, 8
    env = excenvs.PMSM(
        batch_size=batch, saturated=True,
        motor_variant=excenvs.MotorVariant.BRUSA,
        process_noise={"i_d": 0.5, "i_q": 0.3},
        observation_noise={"i_d": 0.02},
    )
    senv = ShardedEnv(env, mesh)
    assert senv._fused_in_scope()
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 2), minval=-0.4, maxval=0.4)

    obs_f, last_f = senv.fused_rollout(state, actions, interpret=True, strict=True)
    obs_s, last_s = env.vmap_rollout(state, actions, T)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s[:, -1]), rtol=1e-9, atol=1e-9)
    assert jnp.array_equal(jnp.asarray(last_f.PRNGKey), jnp.asarray(last_s.PRNGKey))


@pytest.mark.slow
def test_sharded_fused_sim_ahead(mesh):
    """Tsit5 trajectory solves run per shard in the fused kernel and match
    the single-device scan path."""
    batch, T = 8192, 8
    env = excenvs.CartPole(batch_size=batch, solver="tsit5")
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 1), minval=-0.7, maxval=0.7)

    obs_f, last_f = senv.fused_sim_ahead(state, actions, env.tau, env.tau, interpret=True)
    obs_s, _, last_s = env.vmap_sim_ahead(state, actions, env.tau, env.tau)
    assert obs_f.shape == obs_s.shape
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-10, atol=1e-10)
    for name in env._ode_state_fields:
        np.testing.assert_allclose(
            np.asarray(getattr(last_f.physical_state, name)),
            np.asarray(getattr(last_s.physical_state, name)),
            rtol=1e-10,
            atol=1e-10,
            err_msg=name,
        )
    assert not last_f.physical_state.theta.sharding.is_fully_replicated


def test_sharded_fused_sim_ahead_fallback(mesh):
    """obs_stepsize != action_stepsize rides the sharded scan path."""
    batch, T = 64, 4
    env = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset()
    state = senv.shard(state)
    actions = 0.2 * jnp.ones((batch, T, 1))
    obs, last = senv.fused_sim_ahead(state, actions, env.tau / 2, env.tau)
    obs_ref, _, _ = env.vmap_sim_ahead(state, actions, env.tau / 2, env.tau)
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(obs_ref))


@pytest.mark.slow
def test_sharded_fused_pmsm_sim_ahead(mesh):
    """The fused PMSM trajectory kernel runs per shard and matches the
    single-device scan path."""
    batch, T = 8192, 8
    env = excenvs.PMSM(batch_size=batch, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 2), minval=-0.4, maxval=0.4)

    obs_f, last_f = senv.fused_sim_ahead(state, actions, env.tau, env.tau, interpret=True)
    obs_s, _, last_s = env.vmap_sim_ahead(state, actions, env.tau, env.tau)
    assert obs_f.shape == obs_s.shape
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-9, atol=1e-9)
    for name in ("i_d", "i_q", "epsilon", "torque", "u_d_buffer", "u_q_buffer"):
        np.testing.assert_allclose(
            np.asarray(getattr(last_f.physical_state, name)),
            np.asarray(getattr(last_s.physical_state, name)),
            rtol=1e-9,
            atol=1e-9,
            err_msg=name,
        )

@pytest.mark.slow
def test_shadow_cache_coherent_after_adaptive(mesh):
    """Regression (round-2 verdict): a full-batch fused call caches
    ``_pmsm_fused_impl`` on the env; ``ShardedEnv`` copies the env ``__dict__``
    at construction, and ``adaptive_rollout`` builds the shared per-shard
    shadow first — the shadow must NOT inherit the stale full-batch jitted
    impl, or the later ``fused_rollout`` reuses it inside ``shard_map`` on
    per-shard slices."""
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

    batch, T = 8192, 4
    env = excenvs.PMSM(batch_size=batch, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    _, state0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 2), minval=-0.4, maxval=0.4)

    # full-batch fused call populates env.__dict__["_pmsm_fused_impl"]
    pmsm_fused_rollout(env, state0, actions, gather="take", interpret=True)
    assert "_pmsm_fused_impl" in env.__dict__

    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)

    # adaptive_rollout builds the shared shadow first ...
    senv.adaptive_rollout(state, actions[:, :1], rtol=1e-6, atol=1e-8)
    assert "_pmsm_fused_impl" not in senv._fused_shadow.__dict__

    # ... and the subsequent fused_rollout must run per-shard, matching scan
    obs_f, last_f = senv.fused_rollout(state, actions, interpret=True)
    obs_s, last_s = env.vmap_rollout(state, actions, T)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s[:, -1]), rtol=1e-9, atol=1e-9)
    assert not last_f.physical_state.i_d.sharding.is_fully_replicated


def test_sharded_fused_strict_raises(mesh):
    """strict=True forbids the silent sharded-scan fallback."""
    batch = 64  # local batch 8: far below the kernel's 1024-row tiling
    env = excenvs.Pendulum(batch_size=batch)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset()
    state = senv.shard(state)
    actions = 0.2 * jnp.ones((batch, 4, 1))
    with pytest.raises(ValueError, match="strict"):
        senv.fused_rollout(state, actions, strict=True)
    with pytest.raises(ValueError, match="strict"):
        senv.fused_sim_ahead(state, actions, env.tau / 2, env.tau, strict=True)

@pytest.mark.slow
def test_sharded_fused_closed_loop(mesh):
    """The policy-in-kernel closed loop runs per shard and matches the
    single-device scan closed loop."""
    from exciting_environments_tpu.core import structures

    batch, T = 8192, 8
    env = excenvs.Pendulum(batch_size=batch, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, batch))
    )
    state = senv.shard(state)

    def policy_tile(obs, t):
        return (-0.8 * (obs[0] - obs[2]) - 0.3 * obs[1],)

    obs_f, acts_f, last_f = senv.fused_closed_loop(state, policy_tile, T, obs_stride=1, interpret=True)

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(state, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def body(carry, _):
        st, obs = carry
        a = (-0.8 * (obs[:, 0] - obs[:, 2]) - 0.3 * obs[:, 1])[:, None]
        obs, st = step_b(st, a, env.env_properties)
        return (st, obs), obs

    (_, _), obs_s = jax.lax.scan(body, (state, obs0), None, length=T)
    obs_s = jnp.swapaxes(obs_s, 0, 1)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-10, atol=1e-10)
    assert not last_f.physical_state.theta.sharding.is_fully_replicated


def test_sharded_fused_closed_loop_stateful(mesh):
    """A STATEFUL in-kernel policy shards with the batch: per-instance PI
    integrator carry leaves split over the mesh like state leaves, and the
    sharded run equals the single-device kernel, final carry included."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    batch, T = 8192, 8
    env = excenvs.Pendulum(batch_size=batch, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(2), batch))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, batch))
    )
    state = senv.shard(state)

    def policy_tile(obs, t, carry):
        e = obs[2] - obs[0]
        integ = carry[0] + 0.05 * e
        return (0.8 * e + integ - 0.3 * obs[1],), (integ,)

    carry0 = (0.01 * jnp.linspace(-1.0, 1.0, batch),)
    obs_f, acts_f, last_f, fc = senv.fused_closed_loop(
        state, policy_tile, T, obs_stride=1, interpret=True, policy_carry=carry0
    )
    obs_1, acts_1, last_1, fc_1 = env_fused_closed_loop(
        env, state, policy_tile, T, obs_stride=1, interpret=True, policy_carry=carry0
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_1), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fc[0]), np.asarray(fc_1[0]), rtol=1e-12, atol=1e-12)
    assert not fc[0].sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_closed_loop_policy_grad_matches_plain(mesh):
    """Policy-parameter gradients through the SHARDED closed loop equal the
    single-device kernel's: policy_params is closure-captured inside the
    shard_map body (with check_vma=False), so its transpose — the psum over
    per-shard parameter cotangents — must come out exactly right."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    batch, T = 2048, 4
    mesh2 = make_batch_mesh(jax.devices()[:2])
    env = excenvs.Pendulum(batch_size=batch, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, batch))
    )
    senv = ShardedEnv(env, mesh2)

    def pol(o, t, p):
        return (-p["kp"] * (o[0] - o[2]) - p["kd"] * o[1],)

    params = {"kp": jnp.asarray(0.5), "kd": jnp.asarray(0.1)}

    def loss_sharded(p):
        obs, _, _ = senv.fused_closed_loop(s0, pol, T, obs_stride=1, interpret=True, policy_params=p)
        return jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)

    def loss_plain(p):
        obs, _, _ = env_fused_closed_loop(env, s0, pol, T, obs_stride=1, interpret=True, policy_params=p)
        return jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)

    vs, gs = jax.value_and_grad(loss_sharded)(params)
    vp, gp = jax.value_and_grad(loss_plain)(params)
    np.testing.assert_allclose(float(vs), float(vp), rtol=1e-12)
    for k in params:
        np.testing.assert_allclose(float(gs[k]), float(gp[k]), rtol=1e-9, err_msg=k)


@pytest.mark.slow
def test_sharded_pmsm_fused_closed_loop(mesh):
    """The closed-loop DRIVE kernel routes per shard (linear magnetics, 8
    shards x 1024 rows) and matches the single-device scan closed loop."""
    from exciting_environments_tpu.core import structures

    batch, T = 8192, 4
    env = excenvs.PMSM(
        batch_size=batch, motor_variant=excenvs.MotorVariant.DEFAULT,
        control_state=["i_d", "i_q"],
    )
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(11), batch))
    state = structures.replace(
        state,
        reference=structures.replace(
            state.reference,
            i_d=jnp.linspace(-200.0, -10.0, batch),
            i_q=jnp.linspace(-150.0, 150.0, batch),
        ),
    )
    state = senv.shard(state)

    def policy_tile(obs, t):
        return (-0.6 * (obs[0] - obs[8]), -0.6 * (obs[1] - obs[9]))

    obs_f, acts_f, last_f = senv.fused_closed_loop(
        state, policy_tile, T, obs_stride=1, interpret=True
    )

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(state, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def body(carry, _):
        st, obs = carry
        a = jnp.stack(
            (-0.6 * (obs[:, 0] - obs[:, 8]), -0.6 * (obs[:, 1] - obs[:, 9])), axis=-1
        )
        obs, st = step_b(st, a, env.env_properties)
        return (st, obs), obs

    (_, _), obs_s = jax.lax.scan(body, (state, obs0), None, length=T)
    obs_s = jnp.swapaxes(obs_s, 0, 1)
    assert bool(jnp.isfinite(obs_s).all())
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s), rtol=1e-9, atol=1e-9)
    assert not last_f.physical_state.i_d.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_mppi_equals_single_device(mesh):
    """MPPI planning is per-instance independent, so the sharded facade must
    reproduce the single-device plan (and run_mppi the single-device loop)."""
    from exciting_environments_tpu.utils import mpc
    from exciting_environments_tpu.utils.episodes import reset_with_references

    batch = 16
    cfg = mpc.MPPIConfig(horizon=6, n_samples=16, noise_sigma=0.4, n_iterations=2)

    env = excenvs.Pendulum(batch_size=batch, tau=2e-2, control_state=["theta"])
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
    plan0 = jnp.zeros((batch, 6, 1))
    plan_ref = mpc.mppi_plan(env, state, plan0, jax.random.PRNGKey(1), cfg)
    res_ref = mpc.run_mppi(env, state, 4, key=jax.random.PRNGKey(2), config=cfg)

    senv = ShardedEnv(excenvs.Pendulum(batch_size=batch, tau=2e-2,
                                       control_state=["theta"]), mesh)
    plan_s = mpc.mppi_plan(senv, state, plan0, jax.random.PRNGKey(1), cfg)
    res_s = mpc.run_mppi(senv, state, 4, key=jax.random.PRNGKey(2), config=cfg)

    np.testing.assert_allclose(np.asarray(plan_s), np.asarray(plan_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_s.observations),
                               np.asarray(res_ref.observations),
                               rtol=1e-12, atol=1e-12)
    assert not res_s.observations.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_ppo_trains(mesh):
    """train_ppo over a ShardedEnv runs SPMD end-to-end and produces finite
    metrics/parameters in both dispatch modes."""
    from exciting_environments_tpu.utils.rl import PPOConfig, evaluate_policy, train_ppo

    senv = ShardedEnv(
        excenvs.Pendulum(batch_size=16, tau=2e-2, control_state=["theta"]), mesh
    )
    cfg = PPOConfig(n_steps=8, n_epochs=2, n_minibatches=4, max_episode_steps=16)
    for scan_mode in (False, True):
        res = train_ppo(senv, iterations=2, key=jax.random.PRNGKey(0), config=cfg,
                        scan_iterations=scan_mode)
        for name, v in res.metrics.items():
            assert v.shape == (2,) and np.isfinite(v).all(), (scan_mode, name)
        assert all(
            bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(res.params)
        )
    val = evaluate_policy(senv, res.params, n_steps=8, max_episode_steps=16)
    assert np.isfinite(val)


def test_sharded_gradient_planner(mesh):
    """optimize_actions through a ShardedEnv matches the single-device run."""
    from exciting_environments_tpu.utils import mpc
    from exciting_environments_tpu.utils.episodes import reset_with_references

    batch = 16
    env = excenvs.Pendulum(batch_size=batch, tau=2e-2, control_state=["theta"])
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(5))
    plan0 = jnp.zeros((batch, 8, 1))
    ref = mpc.optimize_actions(env, state, plan0, iterations=20, learning_rate=0.2)

    senv = ShardedEnv(excenvs.Pendulum(batch_size=batch, tau=2e-2,
                                       control_state=["theta"]), mesh)
    res = mpc.optimize_actions(senv, state, plan0, iterations=20, learning_rate=0.2)
    np.testing.assert_allclose(np.asarray(res.actions), np.asarray(ref.actions),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.costs), np.asarray(ref.costs),
                               rtol=1e-9)


@pytest.mark.slow
def test_sharded_fused_mppi_per_shard_semantics(mesh):
    """fused MPPI under a ShardedEnv runs the kernel per shard inside
    shard_map; each shard's plan must equal _plan_core on its local slice
    with the axis-folded key (pins the decorrelated-noise semantics)."""
    from exciting_environments_tpu.utils import mpc
    from exciting_environments_tpu.utils.episodes import reset_with_references

    B = 16  # local batch 2; 512 samples * 2 = one kernel tile
    cfg = mpc.MPPIConfig(horizon=4, n_samples=512, noise_sigma=0.4, n_iterations=1)
    env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
    senv = ShardedEnv(excenvs.Pendulum(batch_size=B, tau=2e-2,
                                       control_state=["theta"]), mesh)
    assert mpc.planning_path(senv, cfg, interpret=True) == "fused"

    plan0 = jnp.zeros((B, 4, 1))
    plan_s = mpc.mppi_plan(senv, state, plan0, jax.random.PRNGKey(1), cfg,
                           fused=True, interpret=True)
    assert not plan_s.sharding.is_fully_replicated

    local = senv._local_shadow()
    for i in (0, 3, 7):
        sl = slice(2 * i, 2 * i + 2)
        state_l = jax.tree_util.tree_map(lambda x: x[sl], state)
        expected = mpc._plan_core(local, state_l, plan0[sl],
                                  jax.random.fold_in(jax.random.PRNGKey(1), i),
                                  cfg, None, True, True)
        np.testing.assert_allclose(np.asarray(plan_s[sl]), np.asarray(expected),
                                   rtol=1e-11, atol=1e-12)

    res = mpc.run_mppi(senv, state, 3, key=jax.random.PRNGKey(2), config=cfg,
                       fused=True, interpret=True)
    assert res.observations.shape == (B, 3, len(env.obs_description))
    assert bool(jnp.isfinite(res.observations).all())
    assert bool((res.rewards <= 0).all())


@pytest.mark.slow
def test_sharded_fused_mppi_after_global_plan(mesh):
    """Regression: a tiled shadow cached by planning on the PLAIN env (global
    batch) must not leak into the facade's per-shard route — the cache is
    keyed on (n_samples, batch_size) and _local_shadow drops it."""
    from exciting_environments_tpu.utils import mpc
    from exciting_environments_tpu.utils.episodes import reset_with_references

    B = 16
    cfg = mpc.MPPIConfig(horizon=4, n_samples=512, noise_sigma=0.4, n_iterations=1)
    env = excenvs.Pendulum(batch_size=B, tau=2e-2, control_state=["theta"])
    # populate the global-batch tiled-shadow cache first
    assert mpc.planning_path(env, cfg, interpret=True) == "fused"
    assert "_mppi_tiled_shadow" in env.__dict__

    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
    senv = ShardedEnv(env, mesh)
    assert mpc.planning_path(senv, cfg, interpret=True) == "fused"
    plan = mpc.mppi_plan(senv, state, jnp.zeros((B, 4, 1)), jax.random.PRNGKey(1),
                         cfg, fused=True, interpret=True)
    assert bool(jnp.isfinite(plan).all())


def test_sharded_fused_mppi_rejects_per_batch_params(mesh):
    """Per-batch heterogeneous properties are closure constants to the
    kernel, not shard_map operands: the sharded fused route must refuse them
    (they ride the GSPMD scan path) even when n_samples == mesh.size makes
    the tiled shapes line up by accident."""
    from exciting_environments_tpu.utils import mpc
    from exciting_environments_tpu.utils.episodes import reset_with_references

    B = 1024
    env = excenvs.Pendulum(
        batch_size=B, tau=2e-2, control_state=["theta"],
        static_params={"l": jnp.linspace(0.5, 2.0, B), "g": 9.81, "m": 1.0},
    )
    senv = ShardedEnv(env, mesh)
    cfg = mpc.MPPIConfig(horizon=4, n_samples=8)  # 8 == mesh.size: shapes align
    assert mpc.planning_path(senv, cfg, interpret=True) == "scan"
    _, state = jax.jit(lambda k: reset_with_references(env, k))(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="fused=True"):
        mpc.mppi_plan(senv, state, jnp.zeros((B, 4, 1)), jax.random.PRNGKey(1),
                      cfg, fused=True, interpret=True)


@pytest.mark.parametrize("noise_mode", ["exact", "fast"])
def test_sharded_stochastic_rollout_equals_single_device(mesh, noise_mode):
    """Noise draws hang off each instance's own PRNG key (in both draw-stream
    modes), so the stochastic rollout is partition-invariant:
    mesh-sharded ≡ single-device."""
    batch = 64
    keys = jax.random.split(jax.random.PRNGKey(11), batch)
    mk = lambda: excenvs.Pendulum(
        batch_size=batch, tau=1e-2,
        process_noise={"omega": 0.4}, observation_noise={"theta": 0.02},
        noise_mode=noise_mode,
    )
    env = mk()
    _, st = env.vmap_reset(keys)
    acts = jnp.zeros((batch, 32, 1))
    obs_ref, last_ref = env.vmap_rollout(st, acts)

    senv = ShardedEnv(mk(), mesh)
    _, st_s = senv.vmap_reset(keys)
    obs_s, last_s = senv.vmap_rollout(senv.shard(st_s), acts)

    np.testing.assert_array_equal(np.asarray(obs_s), np.asarray(obs_ref))
    np.testing.assert_array_equal(
        np.asarray(last_s.physical_state.omega), np.asarray(last_ref.physical_state.omega)
    )


@pytest.mark.slow
def test_sharded_fused_stochastic_rollout(mesh):
    """Stochastic fused rollout under the mesh: the per-shard noise
    precompute reads the shard's own key slice, so the result matches the
    single-device scan path (draws are partition-invariant)."""
    batch, T = 8192, 8
    mk = lambda: excenvs.Pendulum(
        batch_size=batch, tau=1e-2,
        process_noise={"omega": 0.4}, observation_noise={"theta": 0.02},
    )
    env = mk()
    keys = jax.random.split(jax.random.PRNGKey(3), batch)
    _, st = env.vmap_reset(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(4), (batch, T, 1), minval=-0.9, maxval=0.9)
    obs_ref, last_ref = env.vmap_rollout(st, acts, T)

    senv = ShardedEnv(mk(), mesh)
    _, st_s = senv.vmap_reset(keys)
    obs_f, last_f = senv.fused_rollout(senv.shard(st_s), acts, interpret=True)

    np.testing.assert_allclose(
        np.asarray(obs_f), np.asarray(obs_ref[:, -1]), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.omega),
        np.asarray(last_ref.physical_state.omega),
        rtol=0, atol=1e-11,
    )
    np.testing.assert_array_equal(np.asarray(last_f.PRNGKey), np.asarray(last_ref.PRNGKey))


@pytest.mark.slow
def test_sharded_stochastic_closed_loop(mesh):
    """Output-feedback control under sensor noise per shard: the closed-loop
    kernel's per-shard noise precompute reads the shard's own key slice, so
    the mesh-sharded loop matches the single-device scan fallback draw for
    draw (including a STATEFUL policy's carry)."""
    from exciting_environments_tpu.utils.collect import tile_policy_scan

    batch, T = 8192, 8
    mk = lambda: excenvs.Pendulum(
        batch_size=batch, tau=1e-2,
        process_noise={"omega": 0.3}, observation_noise={"theta": 0.04},
    )
    env = mk()
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    _, st = env.vmap_reset(keys)

    carry0 = (jnp.zeros((batch,)),)

    def pol_pi(obs, t, c):
        i = c[0] + 0.05 * obs[0]
        return (-0.8 * obs[0] - 0.1 * i,), (i,)

    obs_ref, acts_ref, _, last_ref, fc_ref = tile_policy_scan(
        env, st, T, pol_pi, None, collect_trajectory=True, policy_carry=carry0
    )

    senv = ShardedEnv(mk(), mesh)
    _, st_s = senv.vmap_reset(keys)
    obs_f, acts_f, last_f, fc_f = senv.fused_closed_loop(
        senv.shard(st_s), pol_pi, T, obs_stride=1, interpret=True,
        policy_carry=carry0,
    )
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_ref), rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(acts_f), np.asarray(acts_ref), rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(fc_f[0]), np.asarray(fc_ref[0]), rtol=0, atol=1e-11)
    np.testing.assert_array_equal(np.asarray(last_f.PRNGKey), np.asarray(last_ref.PRNGKey))
    assert not last_f.physical_state.omega.sharding.is_fully_replicated


def test_per_batch_physical_norms_ride_the_sharded_kernel(mesh):
    """Round-4: per-batch physical normalization spans (with sensor noise
    scaled through them) are no longer closure constants — they ride
    shard_map as sharded property operands, so this config stays in the
    fused kernel's scope per shard and matches the single-device scan
    draw for draw (round 3 excluded it to the sharded scan)."""
    B_ = 8192
    env = excenvs.Pendulum(
        batch_size=B_, tau=1e-2, observation_noise={"theta": 0.05},
        physical_normalizations={
            "theta": excenvs.MinMaxNormalization(-jnp.pi, jnp.pi),
            "omega": excenvs.MinMaxNormalization(-jnp.full(B_, 10.0), jnp.full(B_, 10.0)),
        },
    )
    senv = ShardedEnv(env, mesh)
    assert senv._fused_in_scope()
    _, st = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B_))
    st = senv.shard(st)
    acts = jnp.zeros((B_, 8, 1))
    obs, fin = senv.fused_rollout(st, acts, interpret=True, strict=True)
    obs_ref, fin_ref = env.vmap_rollout(st, acts, 8)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(obs_ref[:, -1]), rtol=1e-10, atol=1e-12)
    assert jnp.array_equal(jnp.asarray(fin.PRNGKey), jnp.asarray(fin_ref.PRNGKey))


def test_sharded_ekf_fleet_equals_single_device(mesh):
    """Fleet filtering scales over the mesh for free: the EKF is a vmapped
    program over the batch, so mesh-sharded observation/action inputs
    auto-partition it (zero communication — each shard filters its own
    plants) and the beliefs match the single-device run exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from exciting_environments_tpu.utils import estimate

    B_, T = 64, 40
    env = excenvs.Pendulum(batch_size=B_, tau=2e-2, observation_noise={"theta": 0.08})
    st = env.vmap_reset(jax.random.split(jax.random.PRNGKey(7), B_))[1]
    t = jnp.arange(T) * 2e-2
    acts = jnp.broadcast_to(0.3 * jnp.sin(2.0 * t)[None, :, None], (B_, T, 1))
    obs, _ = env.vmap_rollout(st, acts)

    kw = dict(measured_fields=("theta",), process_std={"omega": 0.05})
    res_ref = estimate.run_ekf(env, obs, acts, **kw)

    sh = NamedSharding(mesh, P("batch"))
    run = jax.jit(lambda o, a: estimate.run_ekf(env, o, a, **kw))
    res_s = run(jax.device_put(obs, sh), jax.device_put(acts, sh))

    assert not res_s.means.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(res_s.means), np.asarray(res_ref.means))
    np.testing.assert_array_equal(np.asarray(res_s.nll), np.asarray(res_ref.nll))


@pytest.mark.slow
def test_sharded_fused_generic_per_batch_params(mesh):
    """Round-4: per-batch heterogeneous properties for CLASSIC envs stay in
    the generic fused kernel's scope under the mesh — the batched property
    leaves ride shard_map as sharded operands and each shard launches with
    its local slices (previously these fleets dropped to the sharded scan)."""
    batch, T = 8192, 8
    ls = 1.0 + jnp.linspace(0.0, 1.5, batch)
    env = excenvs.Pendulum(batch_size=batch, static_params={"g": 9.81, "l": ls, "m": 1.0})
    senv = ShardedEnv(env, mesh)
    assert senv._fused_in_scope()
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(0), batch))
    state = senv.shard(state)
    actions = jax.random.uniform(jax.random.PRNGKey(1), (batch, T, 1), minval=-0.7, maxval=0.7)

    obs_f, last_f = senv.fused_rollout(state, actions, interpret=True, strict=True)
    obs_s, last_s = env.vmap_rollout(state, actions, T)
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_s[:, -1]), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.omega),
        np.asarray(last_s.physical_state.omega), rtol=1e-9, atol=1e-11,
    )
    assert not last_f.physical_state.theta.sharding.is_fully_replicated

    # the trajectory solve rides the same operands (Tsit5, finer obs grid)
    env2 = excenvs.CartPole(
        batch_size=batch, solver="tsit5",
        static_params={"mu_p": 2e-6, "mu_c": 5e-4, "l": 0.5 + jnp.linspace(0, 0.3, batch),
                       "m_p": 0.1, "m_c": 1.0, "g": 9.81},
    )
    senv2 = ShardedEnv(env2, mesh)
    assert senv2._fused_in_scope(env2.tau, env2.tau)
    _, s2 = senv2.vmap_reset(jax.random.split(jax.random.PRNGKey(2), batch))
    s2 = senv2.shard(s2)
    a2 = jax.random.uniform(jax.random.PRNGKey(3), (batch, T, 1), minval=-0.5, maxval=0.5)
    obs_f2, last_f2 = senv2.fused_sim_ahead(s2, a2, env2.tau, env2.tau, interpret=True, strict=True)
    obs_s2, _, last_s2 = env2.vmap_sim_ahead(s2, a2, env2.tau, env2.tau)
    np.testing.assert_allclose(np.asarray(obs_f2), np.asarray(obs_s2), rtol=1e-9, atol=1e-11)


@pytest.mark.slow
def test_sharded_closed_loop_per_batch_u_dc(mesh):
    """Round-5: a u_dc/winding-randomized PMSM fleet keeps its closed loops
    in kernel scope UNDER THE MESH — each shard's property slices ride as
    shard_map operands into the launcher's env_properties hook, matching
    the single-device kernel bitwise."""
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
        pmsm_fused_closed_loop,
    )
    from exciting_environments_tpu.utils import randomize

    batch, T = 8192, 8
    var = excenvs.MotorVariant.BRUSA
    fleet = randomize.randomize_env(
        excenvs.PMSM, jax.random.PRNGKey(3),
        {"u_dc": randomize.Uniform(350.0, 450.0),
         "r_s": randomize.Uniform(15e-3, 21e-3)},
        batch_size=batch,
        defaults=dict(var.get_params().static_params.__dict__),
        saturated=True, motor_variant=var,
    )
    senv = ShardedEnv(fleet, mesh)
    assert senv.closed_loop_in_scope(interpret=True)
    _, st = fleet.vmap_reset(jax.random.split(jax.random.PRNGKey(1), batch))

    def policy(obs, t):
        return (0.8 + 0.1 * obs[0], 0.7 + 0.1 * obs[1])

    o_m, l_m = senv.fused_closed_loop(st, policy, T, interpret=True)
    o_1, l_1 = pmsm_fused_closed_loop(fleet, st, policy, T, interpret=True, gather="take")
    np.testing.assert_allclose(np.asarray(o_m), np.asarray(o_1), rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(l_m.physical_state.i_d), np.asarray(l_1.physical_state.i_d),
        rtol=0, atol=1e-12,
    )
    assert not l_m.physical_state.i_d.sharding.is_fully_replicated

    # stateful tile policies shard their carry planes alongside
    def tile(obs, t, c):
        (ci,) = c
        return (0.5 + 0.0 * obs[0], jnp.clip(0.1 * ci, -1, 1)), (ci + 0.1,)

    c0 = (jnp.zeros(batch),)
    o_mc, l_mc, fc = senv.fused_closed_loop(st, tile, T, interpret=True, policy_carry=c0)
    o_1c, l_1c, fc1 = pmsm_fused_closed_loop(
        fleet, st, tile, T, interpret=True, gather="take", policy_carry=c0
    )
    np.testing.assert_allclose(
        np.asarray(l_mc.physical_state.i_q), np.asarray(l_1c.physical_state.i_q),
        rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(fc[0]), np.asarray(fc1[0]), rtol=0, atol=0)


def test_non_divisible_batch_raises_and_odd_scan_lane(mesh):
    """Round-5 (r4 verdict item 8): the non-divisible-batch error path is a
    loud ValueError (never silent mis-sharding), and a mesh-divisible but
    NOT tile-divisible batch reports out of kernel scope yet rides the
    sharded scan."""
    bad = excenvs.Pendulum(batch_size=mesh.size * 4 + 1)
    with pytest.raises(ValueError, match="divisible"):
        ShardedEnv(bad, mesh)

    ob = 24 * mesh.size
    soenv = ShardedEnv(excenvs.Pendulum(batch_size=ob), mesh)
    assert not soenv._fused_in_scope()
    assert not soenv.closed_loop_in_scope(interpret=True)
    _, ostate = soenv.vmap_reset()
    ostate = soenv.shard(ostate)
    oobs, olast = soenv.vmap_rollout(ostate, 0.2 * jnp.ones((ob, 3, 1)))
    assert np.isfinite(np.asarray(oobs)).all()
    assert not olast.physical_state.theta.sharding.is_fully_replicated
