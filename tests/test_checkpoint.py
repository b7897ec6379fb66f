"""Checkpoint/resume round-trips: simulation must continue bit-identically
from a restored state."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.utils.checkpoint import (
    ORBAX_AVAILABLE,
    load_state,
    save_state,
)


@pytest.mark.parametrize("backend", ["npz"] + (["orbax"] if ORBAX_AVAILABLE else []))
def test_state_roundtrip_and_resume(tmp_path, backend):
    env = excenvs.Pendulum(batch_size=8)
    _, state = env.vmap_reset()
    for _ in range(5):
        _, state = env.vmap_step(state, 0.4 * jnp.ones((8, 1)))

    if backend == "npz":
        path = save_state(state, str(tmp_path / "state.npz"))
    else:
        path = save_state(state, str(tmp_path / "ckpt"), use_orbax=True)

    restored = load_state(env.vmap_init_state(), path, use_orbax=(backend == "orbax"))
    np.testing.assert_array_equal(
        np.asarray(restored.physical_state.theta), np.asarray(state.physical_state.theta)
    )

    # resuming from the restored state reproduces the original trajectory
    obs_a, state_a = env.vmap_step(state, 0.1 * jnp.ones((8, 1)))
    obs_b, state_b = env.vmap_step(restored, 0.1 * jnp.ones((8, 1)))
    np.testing.assert_array_equal(np.asarray(obs_a), np.asarray(obs_b))


def test_structure_mismatch_rejected(tmp_path):
    env = excenvs.Pendulum(batch_size=8)
    other = excenvs.MassSpringDamper(batch_size=8)
    _, state = env.vmap_reset()
    path = save_state(state, str(tmp_path / "state.npz"))
    with pytest.raises(ValueError, match="path mismatch|leaves"):
        load_state(other.vmap_init_state(), path)


def test_trajectory_checkpoint(tmp_path):
    """Whole sim_ahead trajectories are themselves checkpointable pytrees."""
    env = excenvs.FluidTank(batch_size=4)
    _, s0 = env.vmap_reset()
    acts = 0.5 * jnp.ones((4, 10, 1))
    obs, states, last = env.vmap_sim_ahead(s0, acts, env.tau, env.tau)
    path = save_state(states, str(tmp_path / "traj.npz"))
    restored = load_state(states, path)
    np.testing.assert_array_equal(
        np.asarray(restored.physical_state.height), np.asarray(states.physical_state.height)
    )


def test_load_state_rejects_shape_mismatch(tmp_path):
    import jax.numpy as jnp
    from exciting_environments_tpu.utils.checkpoint import load_state, save_state

    tree = {"a": jnp.ones((8, 2)), "b": jnp.zeros(3)}
    path = save_state(tree, str(tmp_path / "ck.npz"))
    like_bad = {"a": jnp.ones((16, 2)), "b": jnp.zeros(3)}
    with pytest.raises(ValueError, match="shape mismatch"):
        load_state(like_bad, path)
    like_bad_dtype = {"a": jnp.ones((8, 2), jnp.float32), "b": jnp.zeros(3)}
    if jnp.ones(()).dtype != jnp.float32:  # x64 tests: stored f64 vs f32 template
        with pytest.raises(ValueError, match="dtype mismatch"):
            load_state(like_bad_dtype, path)


@pytest.mark.skipif(not ORBAX_AVAILABLE, reason="orbax not installed")
def test_orbax_save_overwrites_existing_destination(tmp_path):
    """Elastic recovery replays a chunk after restoring from its own
    checkpoint, re-saving to the same fleet_{chunks_run} path — the orbax
    backend must overwrite, not raise 'Destination already exists'."""
    env = excenvs.Pendulum(batch_size=4)
    _, state = env.vmap_reset()
    path = str(tmp_path / "ckpt")
    save_state(state, path, use_orbax=True)
    _, state2 = env.vmap_step(state, 0.3 * jnp.ones((4, 1)))
    save_state(state2, path, use_orbax=True)  # must not raise
    restored = load_state(env.vmap_init_state(), path, use_orbax=True)
    np.testing.assert_array_equal(
        np.asarray(restored.physical_state.theta), np.asarray(state2.physical_state.theta)
    )


@pytest.mark.skipif(not ORBAX_AVAILABLE, reason="orbax not installed")
def test_orbax_shape_and_dtype_mismatch_rejected(tmp_path):
    """The orbax branch must validate leaf shapes/dtypes against the `like`
    template just like the npz branch: restoring a batch-8 checkpoint into a
    batch-4 template fails here, not as an opaque vmap axis error later."""
    env8 = excenvs.Pendulum(batch_size=8)
    _, state8 = env8.vmap_reset()
    path = str(tmp_path / "ckpt")
    save_state(state8, path, use_orbax=True)

    env4 = excenvs.Pendulum(batch_size=4)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_state(env4.vmap_init_state(), path, use_orbax=True)

    f32_template = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32) if np.asarray(x).dtype == np.float64 else x,
        jax.device_get(env8.vmap_init_state()),
    )
    with pytest.raises(ValueError, match="dtype mismatch"):
        load_state(f32_template, path, use_orbax=True)
