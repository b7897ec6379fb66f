"""Excitation-signal generators and the trajectory collector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.signals import aprbs, chirp, multisine, white_uniform
from exciting_environments_tpu.utils.collect import RolloutCollector


def test_aprbs_properties():
    sig = aprbs(jax.random.PRNGKey(0), 4, 500, 2, hold_min=10, hold_max=50)
    assert sig.shape == (4, 500, 2)
    a = np.asarray(sig)
    assert a.min() >= -1 and a.max() <= 1
    # piecewise constant: many consecutive-equal samples, but not all equal
    diffs = np.abs(np.diff(a, axis=1))
    frac_const = float((diffs < 1e-12).mean())
    assert 0.9 < frac_const < 1.0
    n_switches = int((diffs[0, :, 0] > 1e-12).sum())
    assert 500 // 50 <= n_switches <= 500 // 10 + 1
    # channels and batch entries differ
    assert not np.allclose(a[0], a[1])
    assert not np.allclose(a[0, :, 0], a[0, :, 1])


def test_chirp_and_multisine():
    c = chirp(3, 256, 1, tau=1e-3, f0=1.0, f1=50.0, amplitude=0.7)
    assert c.shape == (3, 256, 1)
    assert float(jnp.max(jnp.abs(c))) <= 0.7 + 1e-6
    m = multisine(jax.random.PRNGKey(1), 2, 256, 2, tau=1e-3, f_min=1.0, f_max=40.0)
    assert m.shape == (2, 256, 2)
    np.testing.assert_allclose(float(jnp.max(jnp.abs(m))), 1.0, atol=1e-5)
    w = white_uniform(jax.random.PRNGKey(2), 2, 16, 1)
    assert w.shape == (2, 16, 1)


def test_collector_open_loop_matches_manual():
    env = excenvs.Pendulum(batch_size=4, control_state=["theta"])
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 4))
    actions = aprbs(jax.random.PRNGKey(1), 4, 30, 1, hold_min=3, hold_max=8)

    traj, final_state = RolloutCollector(env).collect(state, actions)
    assert traj.observations.shape == (4, 30, len(env.obs_description))
    assert traj.rewards.shape == (4, 30, 1)
    assert traj.terminated.shape == (4, 30, 1)

    # manual loop cross-check
    s = state
    for t in range(30):
        obs, s = env.vmap_step(s, actions[:, t])
    np.testing.assert_array_equal(np.asarray(traj.observations[:, -1]), np.asarray(obs))
    np.testing.assert_array_equal(
        np.asarray(final_state.physical_state.theta), np.asarray(s.physical_state.theta)
    )


def test_collector_closed_loop():
    env = excenvs.MassSpringDamper(batch_size=3)
    _, state = env.vmap_reset()

    def policy(obs, key):
        # simple proportional controller + exploration noise
        u = -0.5 * obs[:, :1]
        return u + 0.1 * jax.random.uniform(key, u.shape, minval=-1, maxval=1)

    traj, final_state = RolloutCollector(env).collect_policy(policy, state, jax.random.PRNGKey(7), 25)
    assert traj.observations.shape == (3, 25, 2)
    assert traj.actions.shape == (3, 25, 1)
    assert bool(jnp.isfinite(traj.observations).all())
    # trajectory batch is itself a pytree -> checkpointable / shardable
    leaves = jax.tree_util.tree_leaves(traj)
    assert all(l.shape[0] == 3 for l in leaves)


def test_collector_on_sharded_env():
    """The collector composes with mesh sharding (delegated attribute access)."""
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh()
    env = excenvs.Pendulum(batch_size=16)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset()
    state = senv.shard(state)
    actions = senv.shard(aprbs(jax.random.PRNGKey(0), 16, 12, 1, hold_min=2, hold_max=6))

    traj, final_state = RolloutCollector(senv).collect(state, actions)
    assert traj.observations.shape == (16, 12, 2)
    assert not traj.observations.sharding.is_fully_replicated
    # equals the unsharded collection
    traj_ref, _ = RolloutCollector(env).collect(state, actions)
    np.testing.assert_array_equal(np.asarray(traj.observations), np.asarray(traj_ref.observations))


def test_profiler_trace_context(tmp_path):
    """The jax.profiler trace context captures a rollout without error and
    produces trace artifacts."""
    from exciting_environments_tpu.utils.profiling import annotate, trace

    env = excenvs.Pendulum(batch_size=8)
    _, state = env.vmap_reset()
    with trace(str(tmp_path / "tb")):
        with annotate("rollout"):
            obs, last = env.vmap_rollout(state, 0.2 * jnp.ones((8, 16, 1)))
            jax.block_until_ready(obs)
    files = list((tmp_path / "tb").rglob("*"))
    assert files, "profiler produced no trace artifacts"

@pytest.mark.parametrize("noise", [None, "exact", "fast"])
def test_collect_fused_matches_scan_collector(noise):
    """Open-loop collection at kernel speed: TrajectoryBatch identical to the
    scan collector (CPU closeness; reward/flags evaluated on the kernel's
    reconstructed per-step states in one jitted program) — including for
    stochastic envs in both draw-stream modes (fast mode's scan collector
    consumes the same time-parallel slab the kernel streams)."""
    kw = (
        {}
        if noise is None
        else dict(
            process_noise={"omega": 0.3},
            observation_noise={"theta": 0.02},
            noise_mode=noise,
        )
    )
    env = excenvs.Pendulum(batch_size=1024, control_state=["theta"], **kw)
    col = RolloutCollector(env)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (1024, 6, 1), minval=-0.5, maxval=0.5)
    tb_s, last_s = col.collect(s0, acts)
    tb_f, last_f = col.collect_fused(s0, acts, interpret=True)
    for name in ("observations", "rewards", "terminated", "truncated", "actions"):
        a = np.asarray(getattr(tb_s, name)).astype(np.float64)
        b = np.asarray(getattr(tb_f, name)).astype(np.float64)
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-10, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(last_f.physical_state.theta),
        np.asarray(last_s.physical_state.theta), rtol=1e-10, atol=1e-10,
    )

    # out-of-scope batches transparently ride the scan collector
    small = excenvs.Pendulum(batch_size=8, control_state=["theta"])
    scol = RolloutCollector(small)
    _, ss0 = small.vmap_reset()
    sacts = 0.2 * jnp.ones((8, 4, 1))
    tb_a, _ = scol.collect(ss0, sacts)
    tb_b, _ = scol.collect_fused(ss0, sacts)
    np.testing.assert_array_equal(np.asarray(tb_a.rewards), np.asarray(tb_b.rewards))

    # in-scope env WITHOUT interpret on the CPU backend must also fall back
    # (compiled Mosaic kernels only exist on TPU) instead of crashing in
    # pallas_call — same guard as FleetRunner._select_rollout
    tb_c, _ = col.collect_fused(s0, acts)  # interpret defaults to False
    np.testing.assert_allclose(
        np.asarray(tb_c.rewards), np.asarray(tb_s.rewards), rtol=1e-10, atol=1e-10
    )

@pytest.mark.slow
def test_collect_policy_fused_matches_scan_collector():
    """Closed-loop collection at kernel speed: TrajectoryBatch matches the
    scan collect_policy driving the identical deterministic policy."""
    from exciting_environments_tpu.core import structures

    env = excenvs.Pendulum(batch_size=1024, control_state=["theta"])
    col = RolloutCollector(env)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 1024))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, 1024))
    )

    def policy_tile(obs, t):
        return (-0.7 * (obs[0] - obs[2]) - 0.2 * obs[1],)

    def policy_scan(obs, key):
        return (-0.7 * (obs[:, 0] - obs[:, 2]) - 0.2 * obs[:, 1])[:, None]

    tb_f, last_f = col.collect_policy_fused(policy_tile, s0, 8, interpret=True)
    tb_s, last_s = col.collect_policy(policy_scan, s0, jax.random.PRNGKey(1), 8)
    for name in ("observations", "actions", "rewards", "terminated", "truncated"):
        a = np.asarray(getattr(tb_s, name)).astype(np.float64)
        b = np.asarray(getattr(tb_f, name)).astype(np.float64)
        assert a.shape == b.shape, (name, a.shape, b.shape)
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-10, err_msg=name)

    # interpret=False on the CPU backend must ride the tile-policy scan
    # fallback (compiled Mosaic kernels only exist on TPU) and agree too
    tb_c, _ = col.collect_policy_fused(policy_tile, s0, 8)
    for name in ("observations", "actions", "rewards", "terminated", "truncated"):
        np.testing.assert_allclose(
            np.asarray(getattr(tb_c, name)).astype(np.float64),
            np.asarray(getattr(tb_s, name)).astype(np.float64),
            rtol=1e-10, atol=1e-10, err_msg=name,
        )


@pytest.mark.slow
def test_collect_policy_fused_stateful_carry():
    """Stateful collection: a carried-PI policy through the kernel path
    equals the tile-policy scan fallback — TrajectoryBatch AND final carry
    — so datasets collected under integrator-bearing laws are path-stable."""
    from exciting_environments_tpu.core import structures

    env = excenvs.Pendulum(batch_size=1024, control_state=["theta"])
    col = RolloutCollector(env)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), 1024))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, 1024))
    )

    def pi_tile(obs, t, carry):
        e = obs[2] - obs[0]
        integ = carry[0] + 0.05 * e
        return (0.7 * e + integ - 0.2 * obs[1],), (integ,)

    carry0 = (0.01 * jnp.linspace(-1.0, 1.0, 1024),)
    tb_f, last_f, fc_f = col.collect_policy_fused(
        pi_tile, s0, 8, interpret=True, policy_carry=carry0
    )
    # CPU-backend guard path (interpret=False) rides the tile-policy scan
    tb_s, last_s, fc_s = col.collect_policy_fused(pi_tile, s0, 8, policy_carry=carry0)
    for name in ("observations", "actions", "rewards", "terminated", "truncated"):
        np.testing.assert_allclose(
            np.asarray(getattr(tb_f, name)).astype(np.float64),
            np.asarray(getattr(tb_s, name)).astype(np.float64),
            rtol=1e-10, atol=1e-10, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(fc_f[0]), np.asarray(fc_s[0]), rtol=1e-12, atol=1e-12
    )
    # the integrator actually moved (the law is genuinely stateful)
    assert float(jnp.abs(fc_f[0] - carry0[0]).max()) > 0.0


@pytest.mark.slow
def test_collector_policy_fused_pmsm():
    """collect_policy_fused routes PMSM through the closed-loop drive kernel;
    observations equal the kernel's and rewards/flags are evaluated on the
    reconstructed per-step states."""
    from exciting_environments_tpu.core import structures

    B, T = 1024, 6
    env = excenvs.PMSM(
        batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        control_state=["i_d", "i_q"],
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(21), B))
    s0 = structures.replace(
        s0,
        reference=structures.replace(
            s0.reference,
            i_d=jnp.linspace(-200.0, -10.0, B),
            i_q=jnp.linspace(-150.0, 150.0, B),
        ),
    )

    def policy_tile(obs, t):
        return (-0.6 * (obs[0] - obs[8]), -0.6 * (obs[1] - obs[9]))

    traj, final_state = RolloutCollector(env).collect_policy_fused(
        policy_tile, s0, T, interpret=True
    )
    assert traj.observations.shape == (B, T, len(env.obs_description))
    assert traj.actions.shape == (B, T, 2)
    assert traj.rewards.shape == (B, T, 1)
    assert bool(jnp.isfinite(traj.observations).all())
    assert bool(jnp.isfinite(traj.rewards).all())

    obs_k, acts_k, last_k = env.fused_closed_loop(
        s0, policy_tile, T, obs_stride=1, interpret=True, gather="take"
    )
    np.testing.assert_allclose(
        np.asarray(traj.observations), np.asarray(obs_k), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(final_state.physical_state.i_d), np.asarray(last_k.physical_state.i_d)
    )


@pytest.mark.slow
def test_collector_fused_on_sharded_env():
    """Both collector kernel paths route through ShardedEnv's per-shard
    kernels (regression: they previously treated the facade as a plain env
    and crashed on _clip_state)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    B = 8192
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(31), B))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, B))
    )
    state = senv.shard(state)

    acts = 0.2 * jnp.ones((B, 4, 1))
    traj, _ = RolloutCollector(senv).collect_fused(state, acts, interpret=True)
    traj_ref, _ = RolloutCollector(env).collect_fused(state, acts, interpret=True)
    np.testing.assert_array_equal(np.asarray(traj.observations), np.asarray(traj_ref.observations))
    np.testing.assert_array_equal(np.asarray(traj.rewards), np.asarray(traj_ref.rewards))
    assert not traj.observations.sharding.is_fully_replicated

    def policy(obs, t):
        return (-0.8 * (obs[0] - obs[2]) - 0.3 * obs[1],)

    traj_cl, _ = RolloutCollector(senv).collect_policy_fused(policy, state, 4, interpret=True)
    traj_cl_ref, _ = RolloutCollector(env).collect_policy_fused(policy, state, 4, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(traj_cl.observations), np.asarray(traj_cl_ref.observations)
    )
    np.testing.assert_array_equal(np.asarray(traj_cl.rewards), np.asarray(traj_cl_ref.rewards))
    assert not traj_cl.observations.sharding.is_fully_replicated


def test_collect_policy_fused_sharded_cpu_fallback():
    """collect_policy_fused on a ShardedEnv with interpret=False on the CPU
    backend rides the scan fallback like the single-chip case (regression:
    it routed to the compiled sharded kernel and crashed in pallas_call)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    B = 8192
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(33), B))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, B))
    )
    state = senv.shard(state)

    def policy(obs, t):
        return (-0.8 * (obs[0] - obs[2]) - 0.3 * obs[1],)

    traj, _ = RolloutCollector(senv).collect_policy_fused(policy, state, 4)
    traj_ref, _ = RolloutCollector(senv).collect_policy_fused(
        policy, state, 4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(traj.observations), np.asarray(traj_ref.observations),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(traj.rewards), np.asarray(traj_ref.rewards), rtol=1e-11, atol=1e-12
    )
