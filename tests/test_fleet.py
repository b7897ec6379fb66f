"""Production fleet loop: path selection, metrics, sink, checkpoint, mesh."""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.io import ShardWriter, read_shard
from exciting_environments_tpu.utils.fleet import FleetRunner, _select_rollout

BATCH = 1024


def _actions(env, chunk_steps, seed0=0):
    def source(k):
        return jax.random.uniform(
            jax.random.PRNGKey(seed0 + k), (env.batch_size, chunk_steps, env.action_dim),
            minval=-0.8, maxval=0.8,
        )

    return source


def test_fleet_runner_fused_path_and_metrics(tmp_path):
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    runner = FleetRunner(env, interpret=True)
    seen = []
    state = runner.run(
        state, _actions(env, 8), n_chunks=3, chunk_steps=8,
        metric_hook=lambda k, obs, st: seen.append(k),
    )
    s = runner.summary()
    assert seen == [0, 1, 2]
    assert s["chunks"] == 3 and s["env_steps"] == 3 * BATCH * 8
    assert np.asarray(s["obs_mean"]).shape == (2,)
    assert np.isfinite(np.asarray(s["obs_std"])).all()
    assert np.all(np.asarray(s["obs_min"]) <= np.asarray(s["obs_max"]))


@pytest.mark.slow
def test_fleet_runner_pmsm_path(tmp_path):
    env = excenvs.PMSM(batch_size=BATCH, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(1), BATCH))
    runner = FleetRunner(env, interpret=True)
    state = runner.run(state, _actions(env, 4), n_chunks=2, chunk_steps=4)
    assert runner.summary()["chunks"] == 2


def test_fleet_runner_writer_and_checkpoint(tmp_path):
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), BATCH))
    shard = str(tmp_path / "fleet.extpu")
    ckpt_dir = str(tmp_path)
    with ShardWriter(shard, use_native=False) as w:
        runner = FleetRunner(
            env, writer=w, checkpoint_dir=ckpt_dir, checkpoint_every=2, interpret=True
        )
        state = runner.run(state, _actions(env, 8), n_chunks=4, chunk_steps=8)
    entries = dict(read_shard(shard))
    assert len(entries) == 4
    leaves = entries["chunk_000001"]
    assert next(iter(leaves.values())).shape == (BATCH, 2)
    ckpts = [f for f in os.listdir(ckpt_dir) if f.startswith("fleet_")]
    assert len(ckpts) == 2  # chunks 2 and 4

    # process-death resume: a fresh runner restores state AND bookkeeping
    assert FleetRunner.latest_checkpoint(ckpt_dir).endswith(
        sorted(ckpts)[-1]
    ) or FleetRunner.latest_checkpoint(ckpt_dir).endswith(sorted(ckpts)[-1] + ".npz")
    runner2 = FleetRunner(env, checkpoint_dir=ckpt_dir, interpret=True)
    restored, done = runner2.resume(state)
    assert done == 4 and runner2.env_steps == 4 * BATCH * 8
    np.testing.assert_array_equal(  # statistics carried over exactly
        np.asarray(runner.summary()["obs_mean"]), np.asarray(runner2.summary()["obs_mean"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    runner2.run(restored, lambda k: _actions(env, 8)(k + done), n_chunks=1, chunk_steps=8)
    assert runner2.summary()["chunks"] == 5


@pytest.mark.slow
def test_fleet_runner_sharded(tmp_path):
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    env = excenvs.Pendulum(batch_size=8192)
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(3), 8192))
    state = senv.shard(state)
    runner = FleetRunner(senv, interpret=True)
    state = runner.run(state, _actions(env, 8), n_chunks=2, chunk_steps=8)
    assert runner.summary()["chunks"] == 2
    assert not jax.tree_util.tree_leaves(state)[0].sharding.is_fully_replicated


def test_fleet_select_fallback():
    """Non-fused-scope env drops to the scan path."""
    env = excenvs.Pendulum(batch_size=24)  # not a multiple of 1024
    run, base, path = _select_rollout(env, interpret=True)
    assert path == "scan"
    _, state = env.vmap_reset()
    obs, last = run(state, 0.2 * jnp.ones((24, 4, 1)))
    assert obs.shape == (24, 2)


def _pd_policy(obs, t):
    return (-0.8 * (obs[0] - obs[2]) - 0.3 * obs[1],)


def test_fleet_runner_closed_loop_fused():
    """run_policy drives chunks through the closed-loop kernel; stats and
    bookkeeping match the open-loop contract."""
    from exciting_environments_tpu.core import structures

    env = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(5), BATCH))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, BATCH))
    )
    runner = FleetRunner(env, interpret=True)
    seen = []
    state = runner.run_policy(
        state, _pd_policy, n_chunks=3, chunk_steps=6,
        metric_hook=lambda k, obs, st: seen.append(k),
    )
    assert runner.closed_loop_path == "closed_loop_fused"
    assert seen == [0, 1, 2]
    s = runner.summary()
    assert s["chunks"] == 3 and s["env_steps"] == 3 * BATCH * 6
    assert np.isfinite(np.asarray(s["obs_mean"])).all()


def test_fleet_runner_closed_loop_stateful_carry():
    """run_policy(policy_carry=...) threads a PI integrator BETWEEN chunks:
    4 chunks x 8 steps equals one unchunked 32-step kernel run — final
    state AND final carry — and returns (final_state, final_carry)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    env = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(6), BATCH))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, BATCH))
    )

    def pi_policy(obs, t, carry):
        e = obs[2] - obs[0]
        integ = carry[0] + 0.05 * e
        return (0.7 * e + integ - 0.2 * obs[1],), (integ,)

    carry0 = (jnp.zeros(BATCH),)
    runner = FleetRunner(env, interpret=True)
    final_state, final_carry = runner.run_policy(
        state, pi_policy, n_chunks=4, chunk_steps=8, policy_carry=carry0,
        max_retries=1,  # the carry must survive the snapshot machinery too
    )
    assert runner.closed_loop_path == "closed_loop_fused"
    assert runner.summary()["env_steps"] == 4 * BATCH * 8

    # NOTE: chunked-vs-unchunked equality is exact in interpret mode — each
    # chunk re-enters the kernel from the carried (state, integ) pair, which
    # is precisely the step-32k boundary state of the long run
    _, last_1, fc_1 = env_fused_closed_loop(
        env, state, pi_policy, 32, interpret=True, policy_carry=carry0
    )
    np.testing.assert_allclose(
        np.asarray(final_state.physical_state.theta),
        np.asarray(last_1.physical_state.theta), rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(final_carry[0]), np.asarray(fc_1[0]), rtol=1e-12, atol=1e-12
    )


def test_fleet_runner_closed_loop_scan_fallback_matches_kernel():
    """Out-of-tiling-scope envs ride the scan closed loop with the SAME tile
    policy contract; trajectories match the kernel path on a tiled env."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.utils.fleet import _select_closed_loop

    small = excenvs.Pendulum(batch_size=24, control_state=["theta"])
    run, _, path = _select_closed_loop(small, _pd_policy, interpret=True)
    assert path == "closed_loop_scan"
    _, st = small.vmap_reset(jax.random.split(jax.random.PRNGKey(6), 24))
    st = structures.replace(
        st, reference=structures.replace(st.reference, theta=jnp.linspace(-1, 1, 24))
    )
    obs_scan, last_scan = run(st, 5, None)
    assert obs_scan.shape == (24, 3)

    big = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    runk, _, pathk = _select_closed_loop(big, _pd_policy, interpret=True)
    assert pathk == "closed_loop_fused"
    _, stb = big.vmap_reset(jax.random.split(jax.random.PRNGKey(6), BATCH))
    stb = structures.replace(
        stb,
        reference=structures.replace(
            stb.reference,
            theta=jnp.concatenate([jnp.linspace(-1, 1, 24)] * (BATCH // 24 + 1))[:BATCH],
        ),
    )
    # compare the first 24 envs: identical initial states and references
    stb = jax.tree_util.tree_map(
        lambda big_leaf, small_leaf: big_leaf.at[:24].set(small_leaf)
        if hasattr(big_leaf, "at") and big_leaf.shape[:1] == (BATCH,)
        else big_leaf,
        stb, jax.tree_util.tree_map(lambda l: l, st),
    )
    obs_k, _ = runk(stb, 5, None)
    np.testing.assert_allclose(
        np.asarray(obs_k[:24]), np.asarray(obs_scan), rtol=1e-10, atol=1e-10
    )


@pytest.mark.slow
def test_fleet_runner_closed_loop_pmsm():
    from exciting_environments_tpu.core import structures

    env = excenvs.PMSM(
        batch_size=BATCH, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        control_state=["i_d", "i_q"],
    )
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(7), BATCH))
    state = structures.replace(
        state,
        reference=structures.replace(
            state.reference,
            i_d=jnp.linspace(-200.0, -10.0, BATCH),
            i_q=jnp.linspace(-150.0, 150.0, BATCH),
        ),
    )
    runner = FleetRunner(env, interpret=True)

    def pi(obs, t):
        return (-0.6 * (obs[0] - obs[8]), -0.6 * (obs[1] - obs[9]))

    state = runner.run_policy(state, pi, n_chunks=2, chunk_steps=4)
    assert runner.closed_loop_path == "pmsm_closed_loop_fused"
    assert runner.summary()["chunks"] == 2


@pytest.mark.slow
def test_fleet_runner_closed_loop_sharded():
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    env = excenvs.Pendulum(batch_size=8192, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(8), 8192))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, 8192))
    )
    state = senv.shard(state)
    runner = FleetRunner(senv, interpret=True)
    state = runner.run_policy(state, _pd_policy, n_chunks=2, chunk_steps=4)
    assert runner.closed_loop_path == "sharded_closed_loop"
    assert not jax.tree_util.tree_leaves(state)[0].sharding.is_fully_replicated


def test_fleet_runner_closed_loop_policy_params():
    """run_policy threads a parameter pytree through both the kernel path and
    the scan fallback (same tile contract)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.utils.fleet import _select_closed_loop

    def pd_p(obs, t, p):
        return (-p["kp"] * (obs[0] - obs[2]) - p["kd"] * obs[1],)

    params = {"kp": jnp.asarray(0.8), "kd": jnp.asarray(0.3)}

    env = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(9), BATCH))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, BATCH))
    )
    runner = FleetRunner(env, interpret=True)
    runner.run_policy(state, pd_p, n_chunks=1, chunk_steps=5, policy_params=params)
    assert runner.closed_loop_path == "closed_loop_fused"

    small = excenvs.Pendulum(batch_size=24, control_state=["theta"])
    run, _, path = _select_closed_loop(small, pd_p, interpret=True)
    assert path == "closed_loop_scan"
    _, st = small.vmap_reset(jax.random.split(jax.random.PRNGKey(9), 24))
    st = structures.replace(
        st, reference=structures.replace(st.reference, theta=jnp.linspace(-1, 1, 24))
    )
    obs, last = run(st, 5, params)
    assert obs.shape == (24, 3) and bool(jnp.isfinite(obs).all())


def test_fleet_runner_sharded_cpu_fallback():
    """On the CPU backend with interpret=False (the default), the sharded
    lanes must select scan paths — the kernel lanes would try to compile
    Mosaic and crash (regression: FleetRunner(ShardedEnv(...)).run_policy
    raised 'Only interpret mode is supported on CPU backend')."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    B = 8192
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(12), B))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, B))
    )
    state = senv.shard(state)

    runner = FleetRunner(senv)  # interpret=False on the CPU backend
    assert runner.rollout_path == "sharded_scan"
    state = runner.run(state, _actions(senv, 4), n_chunks=1, chunk_steps=4)
    assert runner.summary()["chunks"] == 1

    def pd(obs, t):
        return (-0.8 * (obs[0] - obs[2]) - 0.3 * obs[1],)

    state = runner.run_policy(state, pd, n_chunks=1, chunk_steps=4)
    assert runner.closed_loop_path == "closed_loop_scan"
    assert runner.summary()["chunks"] == 2


def test_fleet_elastic_recovery_retries_transient_failures():
    """A chunk that raises a transient runtime error is replayed from the
    last completed chunk's snapshot: the final state and statistics match a
    failure-free run exactly, nothing is double-counted."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), BATCH))
    src = _actions(env, 8)

    clean = FleetRunner(env, interpret=True)
    clean_final = clean.run(state0, src, n_chunks=3, chunk_steps=8)

    flaky = FleetRunner(env, interpret=True)
    orig = flaky._rollout
    calls = {"n": 0}

    def rollout(state, actions):
        calls["n"] += 1
        if calls["n"] == 2:  # fail the 2nd chunk once
            raise RuntimeError("injected device failure")
        return orig(state, actions)

    flaky._rollout = rollout
    flaky_final = flaky.run(state0, src, n_chunks=3, chunk_steps=8, max_retries=1)

    assert calls["n"] == 4  # 3 chunks + 1 replay
    for a, b in zip(
        jax.tree_util.tree_leaves(clean_final), jax.tree_util.tree_leaves(flaky_final)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cs, fs = clean.summary(), flaky.summary()
    assert fs["chunks"] == cs["chunks"] == 3
    assert fs["env_steps"] == cs["env_steps"]
    np.testing.assert_array_equal(np.asarray(cs["obs_mean"]), np.asarray(fs["obs_mean"]))


def test_fleet_elastic_recovery_exhausts_and_raises():
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), BATCH))
    runner = FleetRunner(env, interpret=True)

    def always_fails(state, actions):
        raise RuntimeError("permanently down")

    runner._rollout = always_fails
    with pytest.raises(RuntimeError, match="permanently down"):
        runner.run(state0, _actions(env, 4), n_chunks=2, chunk_steps=4, max_retries=2)


def test_fleet_nan_gate_is_never_retried():
    """FloatingPointError from the NaN gate is deterministic; max_retries
    must not mask it by replaying the same program."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), BATCH))
    runner = FleetRunner(env, interpret=True)
    orig = runner._rollout
    calls = {"n": 0}

    def nan_rollout(state, actions):
        calls["n"] += 1
        obs, state = orig(state, actions)
        return jnp.full_like(obs, jnp.nan), state

    runner._rollout = nan_rollout
    with pytest.raises(FloatingPointError):
        runner.run(state0, _actions(env, 4), n_chunks=1, chunk_steps=4, max_retries=5)
    assert calls["n"] == 1  # not replayed


def test_fleet_elastic_recovery_run_policy():
    from exciting_environments_tpu.core import structures

    env = excenvs.Pendulum(batch_size=BATCH, control_state=["theta"])
    _, state0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(6), BATCH))
    state0 = structures.replace(
        state0, reference=structures.replace(state0.reference, theta=jnp.linspace(-1, 1, BATCH))
    )

    clean = FleetRunner(env, interpret=True)
    clean_final = clean.run_policy(state0, _pd_policy, n_chunks=3, chunk_steps=4)

    # pre-seed the closed-loop cache with a once-failing wrapper around the
    # real selected run_fn, so the failure fires inside _drive's chunk loop
    from exciting_environments_tpu.utils.fleet import _select_closed_loop

    flaky = FleetRunner(env, interpret=True)
    run_fn = _select_closed_loop(env, _pd_policy, True)[0]
    calls = {"n": 0}

    def flaky_run(state, n_steps, params):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected")
        return run_fn(state, n_steps, params)

    flaky._closed_loop = (_pd_policy, flaky_run)
    flaky.closed_loop_path = "closed_loop_fused"
    flaky_final = flaky.run_policy(
        state0, _pd_policy, n_chunks=3, chunk_steps=4, max_retries=1
    )
    assert calls["n"] == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(clean_final), jax.tree_util.tree_leaves(flaky_final)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fleet_retry_preserves_mesh_sharding():
    """A retried chunk on a ShardedEnv must come back mesh-sharded: the
    closed-loop scan lane steps whatever layout it is handed, so without
    explicit re-placement one retry silently dropped the rest of the run to
    a single device."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    B = 8192
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(21), B))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, B))
    )
    state = senv.shard(state)

    runner = FleetRunner(senv)  # CPU backend -> closed_loop_scan lane
    from exciting_environments_tpu.utils.fleet import _select_closed_loop

    run_fn = _select_closed_loop(senv, _pd_policy, False)[0]
    calls = {"n": 0}

    def flaky_run(state, n_steps, params):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected")
        return run_fn(state, n_steps, params)

    runner._closed_loop = (_pd_policy, flaky_run)
    runner.closed_loop_path = "closed_loop_scan"
    final = runner.run_policy(state, _pd_policy, n_chunks=3, chunk_steps=4, max_retries=1)
    assert calls["n"] == 4
    for leaf in jax.tree_util.tree_leaves(final):
        assert not leaf.sharding.is_fully_replicated, "retry dropped the mesh sharding"


def test_fleet_deterministic_errors_are_not_retried():
    """ValueError/TypeError/IndexError from the rollout path or user hooks
    are deterministic — the retry loop must surface them immediately instead
    of burning max_retries full snapshot-restore replays."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(20), BATCH))
    runner = FleetRunner(env, interpret=True)
    attempts = []

    def bad_source(k):
        attempts.append(k)
        raise IndexError("user bug in the action source")

    with pytest.raises(IndexError, match="user bug"):
        runner.run(state0, bad_source, n_chunks=2, chunk_steps=4, max_retries=5)
    assert attempts == [0]  # exactly one attempt, zero replays


def test_fleet_summary_throughput_with_mixed_chunk_sizes():
    """env_steps_per_sec must pair the recent window's wall time with the
    SAME window's step counts — the lifetime steps-per-chunk average is
    wrong when chunk sizes vary across the runner's lifetime."""
    env = excenvs.Pendulum(batch_size=BATCH)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(21), BATCH))
    runner = FleetRunner(env, interpret=True, window=4)
    state = runner.run(state, _actions(env, 32), n_chunks=2, chunk_steps=32)
    state = runner.run(state, _actions(env, 2, seed0=100), n_chunks=4, chunk_steps=2)
    s = runner.summary()
    # the window (len 4) holds only the 2-step chunks; lifetime average would
    # be (2*32+4*2)/6 = 12 steps/chunk — 6x the window's true 2
    assert s["env_steps"] == BATCH * (2 * 32 + 4 * 2)
    win_steps = BATCH * 2
    assert abs(s["env_steps_per_sec"] * s["mean_chunk_seconds"] - win_steps) < 1e-3 * win_steps


def test_fleet_sharded_out_of_scope_closed_loop_rides_scan():
    """A ShardedEnv whose per-shard batch is not a kernel tile (local 512 on
    an 8-device mesh) must select the scan closed-loop lane instead of
    raising 'fused_closed_loop out of scope' on every chunk."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.parallel import ShardedEnv, make_batch_mesh

    mesh = make_batch_mesh(jax.devices()[:8])
    B = 4096  # local batch 512 -> per-shard tiling out of scope
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    senv = ShardedEnv(env, mesh)
    assert not senv.closed_loop_in_scope(interpret=True)
    _, state = senv.vmap_reset(jax.random.split(jax.random.PRNGKey(22), B))
    state = structures.replace(
        state, reference=structures.replace(state.reference, theta=jnp.linspace(-1, 1, B))
    )
    state = senv.shard(state)

    runner = FleetRunner(senv, interpret=True)

    def pd(obs, t):
        return (-0.8 * (obs[0] - obs[2]) - 0.3 * obs[1],)

    state = runner.run_policy(state, pd, n_chunks=1, chunk_steps=4)
    assert runner.closed_loop_path == "closed_loop_scan"
    assert runner.summary()["chunks"] == 1
