"""MujucoWrapper tests (the reference ships this wrapper untested; here it
gets coverage: normalization synthesis, NaN gating, batched stepping)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from exciting_environments_tpu.utils import MinMaxNormalization
from exciting_environments_tpu.wrappers.mujoco import (
    MJX_AVAILABLE,
    MujucoWrapper,
    dict_to_pytree_dataclass,
)

# hinge pendulum with limited joint + limited motor: all normalizations derivable
PENDULUM_XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.01"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" limited="true" range="-1.5 1.5"/>
      <geom type="capsule" size="0.04" fromto="0 0 0 0 0 0.5" mass="1"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="torque" joint="hinge" ctrllimited="true" ctrlrange="-2 2"/>
  </actuator>
</mujoco>
"""


@pytest.fixture(scope="module")
def model():
    return mujoco.MjModel.from_xml_string(PENDULUM_XML)


@pytest.fixture(scope="module")
def wrapper(model):
    # backend="auto": mjx where the extra is installed, the plain-mujoco
    # host-callback backend otherwise — either way the full step path runs
    qvel = {"hinge_angular_velocity": MinMaxNormalization(min=-10.0, max=10.0)}
    qvel_dc, _ = dict_to_pytree_dataclass("qvel", qvel)
    base = MujucoWrapper.__new__(MujucoWrapper)
    phys = base.generate_physical_normalization_dataclasses.__get__(base)(model)
    # qpos limits come from the model; qvel needs filling
    phys = MujucoWrapper.PhysicalNormalizations(qpos=phys.qpos, qvel=qvel_dc)
    return MujucoWrapper(model, physical_normalizations=phys, batch_size=4)


def test_normalization_synthesis(model):
    base = MujucoWrapper.__new__(MujucoWrapper)
    phys = base.generate_physical_normalization_dataclasses.__get__(base)(model)
    assert phys.qpos.hinge_angle.min == -1.5 and phys.qpos.hinge_angle.max == 1.5
    assert bool(jnp.isnan(phys.qvel.hinge_angular_velocity.min))
    act = base.generate_action_normalization_dataclasses.__get__(base)(model)
    assert act.torque.min == -2 and act.torque.max == 2


def test_nan_gate(model):
    """Construction must fail fast on either backend: missing qvel
    normalizations -> ValueError; backend='mjx' without the extra ->
    ImportError."""
    with pytest.raises(ValueError, match="physical_normalizations"):
        MujucoWrapper(model, batch_size=2)
    if not MJX_AVAILABLE:
        with pytest.raises(ImportError, match="mujoco-mjx"):
            MujucoWrapper(model, batch_size=2, backend="mjx")
    with pytest.raises(ValueError, match="backend"):
        MujucoWrapper(model, batch_size=2, backend="gpu")


def test_reset_and_step_shapes(wrapper):
    obs, state = wrapper.vmap_reset()
    assert obs.shape == (4, wrapper.qpos_dim + wrapper.qvel_dim)
    obs2, state = wrapper.vmap_step(state, 0.5 * jnp.ones((4, wrapper.action_dim)))
    assert obs2.shape == obs.shape
    assert bool(jnp.isfinite(obs2).all())


def test_dynamics_respond_to_torque(wrapper):
    _, state = wrapper.vmap_reset()
    for _ in range(5):
        obs_pos, state = wrapper.vmap_step(state, jnp.ones((4, 1)))
    _, state2 = wrapper.vmap_reset()
    for _ in range(5):
        obs_neg, state2 = wrapper.vmap_step(state2, -jnp.ones((4, 1)))
    assert not np.allclose(np.asarray(obs_pos), np.asarray(obs_neg)), (
        "opposite torques must produce different trajectories"
    )


def test_cpu_step_is_pure(wrapper):
    """The CPU backend's shared scratch MjData must not leak solver
    warm-start state across samples/calls: the same (state, action) must map
    to the same output regardless of what was stepped before (pure_callback
    may cache/reorder/elide invocations)."""
    if wrapper.backend != "cpu":
        pytest.skip("purity trap is specific to the shared-scratch CPU backend")
    _, state = wrapper.vmap_reset(jax.random.split(jax.random.PRNGKey(5), 4))
    act = 0.7 * jnp.ones((4, 1))
    first = wrapper.vmap_step(state, act)
    # pollute the scratch MjData with a very different trajectory
    _, other = wrapper.vmap_reset(jax.random.split(jax.random.PRNGKey(9), 4))
    for _ in range(10):
        _, other = wrapper.vmap_step(other, -jnp.ones((4, 1)))
    second = wrapper.vmap_step(state, act)
    for a, b in zip(jax.tree_util.tree_leaves(first), jax.tree_util.tree_leaves(second)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_step_matches_vmap_entry(wrapper):
    _, state = wrapper.vmap_reset()
    single = jax.tree_util.tree_map(lambda x: x[0], state)
    obs_single, _ = wrapper.step(single, 0.3 * jnp.ones((1,)), wrapper.env_properties)
    obs_batch, _ = wrapper.vmap_step(state, 0.3 * jnp.ones((4, 1)))
    np.testing.assert_allclose(np.asarray(obs_single), np.asarray(obs_batch[0]), rtol=1e-12)


def test_generate_state_from_observation_roundtrip(wrapper):
    """obs -> state -> obs identity (the reference declares the batched API
    but never defines the per-sample method it vmaps, mujoco_wrapper.py:363-377;
    this pins the working implementation)."""
    obs, _ = wrapper.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 4))
    state = wrapper.vmap_generate_state_from_observation(obs)
    obs_rt = jax.vmap(wrapper.generate_observation, in_axes=(0, None))(state, wrapper.env_properties)
    np.testing.assert_allclose(np.asarray(obs_rt), np.asarray(obs), rtol=1e-12, atol=1e-12)
