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

    # resume from the checkpoint and continue
    from exciting_environments_tpu.utils.checkpoint import load_state

    restored = load_state(state, os.path.join(ckpt_dir, sorted(ckpts)[-1]))
    runner2 = FleetRunner(env, interpret=True)
    runner2.run(restored, _actions(env, 8, seed0=10), n_chunks=1, chunk_steps=8)
    assert runner2.summary()["chunks"] == 1


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
