"""Batched MuJoCo environments with the same surface as the ODE envs.

Behavior-compatible with
``/root/reference/exciting_environments/mujoco_wrapper.py``: wraps a compiled
MuJoCo model into the ``reset``/``step``/``vmap_*`` API, auto-derives min/max
normalizations from joint and actuator limits (NaN where the model provides
none — construction fails until the user supplies them), and steps through
``mjx.step`` under ``jax.vmap``.

MJX is already TPU-native (pure JAX); this wrapper adds the batching,
normalization and registry conventions of this framework on top.  Beyond the
reference, a plain-``mujoco`` CPU backend (``backend="cpu"``) steps the C
engine on the host through ``jax.pure_callback`` with an identical functional
surface, so the wrapper runs end-to-end where the ``mujoco-mjx`` extra is not
installed (state is then the minimal :class:`MjCpuData` pytree instead of
``mjx.Data``; host stepping is CPU-only and not differentiable).
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from dataclasses import fields
from jax.tree_util import tree_flatten

import mujoco

try:  # mujoco-mjx is an optional extra; the wrapper degrades gracefully
    from mujoco import mjx

    MJX_AVAILABLE = True
except ImportError:  # pragma: no cover - depends on installed extras
    mjx = None
    MJX_AVAILABLE = False

import numpy as np

from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.utils import MinMaxNormalization


@pytree_dataclass
class MjCpuData:
    """Minimal simulation state for the plain-``mujoco`` CPU backend: the
    integrated coordinates plus actuator activations and time — everything
    ``mujoco.mj_step`` carries across steps (derived quantities are
    recomputed by the engine each step)."""

    qpos: object
    qvel: object
    act: object
    time: object


def dict_to_pytree_dataclass(class_name: str, data: Dict[str, Any]):
    """Synthesize a pytree dataclass type from a dict (field per key)."""
    namespace = {"__annotations__": {key: type(value) for key, value in data.items()}}
    cls = pytree_dataclass(type(class_name, (object,), namespace))
    return cls(**data), cls


# joint-type (mjtJoint) -> qpos/qvel component names and angle flags
QPOS_NAMES_BY_JOINT_TYPE = {
    "0": [  # free joint
        "body_position_x",
        "body_position_y",
        "body_position_z",
        "body_orientation_qw",
        "body_orientation_qx",
        "body_orientation_qy",
        "body_orientation_qz",
    ],
    "1": ["ball_orientation_qw", "ball_orientation_qx", "ball_orientation_qy", "ball_orientation_qz"],
    "2": ["position"],  # slide
    "3": ["angle"],  # hinge
}
QVEL_NAMES_BY_JOINT_TYPE = {
    "0": [
        "body_linear_velocity_x",
        "body_linear_velocity_y",
        "body_linear_velocity_z",
        "body_angular_velocity_x",
        "body_angular_velocity_y",
        "body_angular_velocity_z",
    ],
    "1": ["ball_angular_velocity_x", "ball_angular_velocity_y", "ball_angular_velocity_z"],
    "2": ["linear_velocity"],
    "3": ["angular_velocity"],
}
QPOS_IS_ANGLE_BY_JOINT_TYPE = {"0": [0, 0, 0, 1, 1, 1, 1], "1": [1, 1, 1, 1], "2": [0], "3": [1]}


class MujucoWrapper:
    """Batched simulation of a MuJoCo model with normalization support.

    Args:
        mujoco_model: a compiled ``mujoco.MjModel``.
        physical_normalizations: dataclass of per-qpos/qvel
            ``MinMaxNormalization``; derived from joint limits if omitted
            (errors on NaN gaps the model cannot fill).
        action_normalization: dataclass of per-actuator normalization;
            derived from actuator ctrl ranges if omitted.
        batch_size: number of parallel simulations.
        tau: simulation step; must equal ``model.opt.timestep``.
        backend: ``"mjx"`` (device-native ``mjx.step``, the reference's
            path), ``"cpu"`` (host ``mujoco.mj_step`` via
            ``jax.pure_callback``), or ``"auto"`` (mjx when installed,
            else cpu).
    """

    def __init__(
        self,
        mujoco_model,
        physical_normalizations=None,
        action_normalization=None,
        batch_size: int = 8,
        tau: float = None,
        backend: str = "auto",
    ):
        if backend == "auto":
            backend = "mjx" if MJX_AVAILABLE else "cpu"
        if backend not in ("mjx", "cpu"):
            raise ValueError(f"backend must be 'mjx', 'cpu' or 'auto', got {backend!r}")
        if backend == "mjx" and not MJX_AVAILABLE:
            raise ImportError(
                "MujucoWrapper requires the mujoco-mjx package (`pip install mujoco-mjx`); "
                "only the base mujoco bindings are installed. Pass backend='cpu' to step "
                "the C engine on the host instead."
            )
        self.backend = backend
        self.mjx_model = mjx.put_model(mujoco_model) if backend == "mjx" else None
        if backend == "cpu":
            self._scratch_data = mujoco.MjData(mujoco_model)
            # host callbacks from separately dispatched executables can run
            # concurrently; the scratch MjData is shared per-wrapper state
            self._scratch_lock = threading.Lock()
        if not tau:
            self.tau = mujoco_model.opt.timestep
        else:
            assert tau == mujoco_model.opt.timestep, (
                f"tau ({tau}) must match the MuJoCo model timestep ({mujoco_model.opt.timestep})"
            )
            self.tau = tau

        self.batch_size = batch_size
        self.qpos_dim = mujoco_model.nq
        self.qvel_dim = mujoco_model.nv
        self.action_dim = mujoco_model.nu
        self.sensor_dim = mujoco_model.nsensordata
        self.in_axes_env_properties = None
        self.mujoco_model = mujoco_model

        action_names = [
            mujoco.mj_id2name(mujoco_model, mujoco.mjtObj.mjOBJ_ACTUATOR, i) for i in range(mujoco_model.nu)
        ]

        if not action_normalization:
            action_normalization = self.generate_action_normalization_dataclasses(mujoco_model)
            if jnp.any(jnp.isnan(jnp.array(tree_flatten(action_normalization)[0]))):
                raise ValueError(
                    "action_normalization must be passed: the MuJoCo model does not provide all "
                    "required actuator ranges. Call generate_action_normalization_dataclasses() to "
                    "get the current dataclass and fill the jnp.nan entries."
                )
        else:
            if jnp.any(jnp.isnan(jnp.array(tree_flatten(action_normalization)[0]))):
                raise ValueError(
                    "NaN values in action_normalization. Call "
                    "generate_action_normalization_dataclasses() and fill the jnp.nan entries."
                )

        if not physical_normalizations:
            phys_norm = self.generate_physical_normalization_dataclasses(mujoco_model)
            if jnp.any(jnp.isnan(jnp.array(tree_flatten(phys_norm)[0]))):
                raise ValueError(
                    "physical_normalizations must be passed: the MuJoCo model does not provide all "
                    "required qpos/qvel ranges. Call generate_physical_normalization_dataclasses() "
                    "to get the current dataclass and fill the jnp.nan entries."
                )
        else:
            if jnp.any(jnp.isnan(jnp.array(tree_flatten(physical_normalizations)[0]))):
                raise ValueError(
                    "NaN values in physical_normalizations. Call "
                    "generate_physical_normalization_dataclasses() and fill the jnp.nan entries."
                )
            phys_norm = physical_normalizations
            # angle metadata is derived from the model even for user norms
            self.generate_physical_normalization_dataclasses(mujoco_model)

        self.env_properties = self.EnvProperties(
            physical_normalizations=phys_norm,
            action_normalizations=action_normalization,
            static_params=None,
        )

        self.action_description = action_names
        self.obs_description = list(self.env_properties.physical_normalizations.qpos.__dict__.keys()) + list(
            self.env_properties.physical_normalizations.qvel.__dict__.keys()
        )

    # ------------------------------------------------------------------
    # normalization synthesis from model metadata
    # ------------------------------------------------------------------

    def generate_physical_normalization_dataclasses(self, model):
        """Derive qpos/qvel normalizations from joint limits; angles without
        limits default to +-pi, everything else unknown becomes NaN."""
        q_pos = {}
        q_vel = {}
        is_angle = []
        for i in range(model.njnt):
            joint = model.joint(i)
            jt = str(joint.type[0])
            qpos_names = [joint.name + "_" + n for n in QPOS_NAMES_BY_JOINT_TYPE[jt]]
            qvel_names = [joint.name + "_" + n for n in QVEL_NAMES_BY_JOINT_TYPE[jt]]
            angle_flags = QPOS_IS_ANGLE_BY_JOINT_TYPE[jt]
            is_angle += angle_flags
            for k, name in enumerate(qpos_names):
                if joint.limited[0] == 0:
                    if angle_flags[k] == 1:
                        q_pos[name] = MinMaxNormalization(min=-jnp.pi, max=jnp.pi)
                    else:
                        q_pos[name] = MinMaxNormalization(min=jnp.nan, max=jnp.nan)
                else:
                    q_pos[name] = MinMaxNormalization(min=joint.range[0], max=joint.range[1])
            for name in qvel_names:
                q_vel[name] = MinMaxNormalization(min=jnp.nan, max=jnp.nan)

        q_pos_dc, _ = dict_to_pytree_dataclass("qpos", q_pos)
        q_vel_dc, _ = dict_to_pytree_dataclass("qvel", q_vel)
        self.qpos_is_angle = is_angle
        return self.PhysicalNormalizations(qpos=q_pos_dc, qvel=q_vel_dc)

    def generate_action_normalization_dataclasses(self, model):
        """Derive actuator normalizations from ctrl ranges (NaN when unlimited)."""
        action_names = [mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_ACTUATOR, i) for i in range(model.nu)]
        ranges = model.actuator_ctrlrange
        limited = model.actuator_ctrllimited
        data = {
            name: (
                MinMaxNormalization(min=jnp.nan, max=jnp.nan)
                if limited[i] == 0
                else MinMaxNormalization(min=ranges[i, 0], max=ranges[i, 1])
            )
            for i, name in enumerate(action_names)
        }
        action_normalization, _ = dict_to_pytree_dataclass("Action", data)
        return action_normalization

    @pytree_dataclass
    class PhysicalNormalizations:
        qpos: object
        qvel: object

    @pytree_dataclass
    class EnvProperties:
        """Constant-per-simulation properties."""

        physical_normalizations: object
        action_normalizations: object
        static_params: object

    # ------------------------------------------------------------------
    # backend dispatch: mjx.Data on device vs MjCpuData + host callback
    # ------------------------------------------------------------------

    def _make_data(self):
        """Fresh default simulation state for the active backend."""
        if self.backend == "mjx":
            return mjx.make_data(self.mjx_model)
        m = self.mujoco_model
        dtype = jnp.result_type(float)
        return MjCpuData(
            qpos=jnp.asarray(m.qpos0, dtype=dtype),
            qvel=jnp.zeros(m.nv, dtype=dtype),
            act=jnp.zeros(m.na, dtype=dtype),
            time=jnp.zeros((), dtype=dtype),
        )

    def _with_qpos_qvel(self, data, qpos, qvel):
        if self.backend == "mjx":
            return data.replace(qpos=qpos, qvel=qvel)
        return MjCpuData(qpos=qpos, qvel=qvel, act=data.act, time=data.time)

    def _cpu_step_host(self, qpos, qvel, act, time, ctrl):
        """One ``mj_step`` per sample on the host, over any leading batch
        dims (``pure_callback`` hands batched operands under ``vmap`` with
        ``vmap_method="expand_dims"``)."""
        m, d = self.mujoco_model, self._scratch_data
        qpos, qvel, act, time, ctrl = (np.asarray(a) for a in (qpos, qvel, act, time, ctrl))
        lead = time.shape
        B = int(np.prod(lead)) if lead else 1
        qp = qpos.reshape(B, m.nq).astype(np.float64)
        qv = qvel.reshape(B, m.nv).astype(np.float64)
        ac = act.reshape(B, m.na).astype(np.float64)
        tt = time.reshape(B).astype(np.float64)
        ct = ctrl.reshape(B, m.nu).astype(np.float64)
        out_qp, out_qv, out_ac = np.empty_like(qp), np.empty_like(qv), np.empty_like(ac)
        out_t = np.empty_like(tt)
        # the scratch MjData is shared per-wrapper mutable state: callbacks
        # dispatched from different executables (or shards of a partitioned
        # one) may run on separate runtime threads concurrently
        with self._scratch_lock:
            for i in range(B):
                # reset the shared scratch MjData first: mj_step writes solver
                # warm-start state (qacc_warmstart, ...) into it, which would
                # otherwise leak across samples/calls and make this callback
                # impure (pure_callback may cache/reorder/elide invocations)
                mujoco.mj_resetData(m, d)
                d.qpos[:] = qp[i]
                d.qvel[:] = qv[i]
                d.act[:] = ac[i]
                d.time = tt[i]
                d.ctrl[:] = ct[i]
                mujoco.mj_step(m, d)
                out_qp[i], out_qv[i], out_ac[i], out_t[i] = d.qpos, d.qvel, d.act, d.time
        return (
            out_qp.reshape(qpos.shape).astype(qpos.dtype),
            out_qv.reshape(qvel.shape).astype(qvel.dtype),
            out_ac.reshape(act.shape).astype(act.dtype),
            out_t.reshape(time.shape).astype(time.dtype),
        )

    def _cpu_step(self, data, action):
        result_shapes = tuple(
            jax.ShapeDtypeStruct(jnp.shape(leaf), jnp.result_type(leaf))
            for leaf in (data.qpos, data.qvel, data.act, data.time)
        )
        qpos, qvel, act, time = jax.pure_callback(
            self._cpu_step_host, result_shapes,
            data.qpos, data.qvel, data.act, data.time, action,
            vmap_method="expand_dims",
        )
        return MjCpuData(qpos=qpos, qvel=qvel, act=act, time=time)

    # ------------------------------------------------------------------
    # functional API (mirrors CoreEnvironment)
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def init_state(self, env_properties, rng=None, vmap_helper=None):
        """Fresh simulation state; random qpos/qvel when an rng is given."""
        mjx_data = self._make_data()
        if rng is not None:
            # independent keys per draw (the reference reuses one subkey,
            # mujoco_wrapper.py:201-203, making qvel a copy of qpos whenever
            # nq == nv — fixed here like the wrapper's other reference bugs)
            key, subkey = jax.random.split(rng)
            qpos_norm = jax.random.uniform(subkey, (self.qpos_dim,), minval=-1, maxval=1)
            qvel_norm = jax.random.uniform(key, (self.qvel_dim,), minval=-1, maxval=1)
            qpos = self.denormalize_components(qpos_norm, env_properties.physical_normalizations.qpos)
            qvel = self.denormalize_components(qvel_norm, env_properties.physical_normalizations.qvel)
            mjx_data = self._with_qpos_qvel(mjx_data, qpos, qvel)
        return mjx_data

    @partial(jax.jit, static_argnums=0)
    def generate_observation(self, state, env_properties):
        """Normalized (angle-wrapped) qpos followed by normalized qvel."""
        qpos = jnp.where(jnp.array(self.qpos_is_angle), self.transform_angle(state.qpos), state.qpos)
        qpos_norm = self.normalize_components(qpos, env_properties.physical_normalizations.qpos)
        qvel_norm = self.normalize_components(state.qvel, env_properties.physical_normalizations.qvel)
        return jnp.hstack([qpos_norm, qvel_norm])

    def transform_angle(self, theta):
        return (theta + jnp.pi) % (2 * jnp.pi) - jnp.pi

    @partial(jax.jit, static_argnums=0)
    def normalize_components(self, array, normalizations):
        for i, field in enumerate(fields(normalizations)):
            array = array.at[i].set(getattr(normalizations, field.name).normalize(array[i]))
        return array

    @partial(jax.jit, static_argnums=0)
    def denormalize_components(self, array, normalizations):
        for i, field in enumerate(fields(normalizations)):
            array = array.at[i].set(getattr(normalizations, field.name).denormalize(array[i]))
        return array

    @partial(jax.jit, static_argnums=0)
    def denormalize_action(self, action_norm, env_properties):
        """Denormalize a normalized actuator vector component-wise."""
        return self.denormalize_components(action_norm, env_properties.action_normalizations)

    def reset(self, env_properties, rng=None, initial_qpos_qvel=None, vmap_helper=None):
        """Reset to default, random, or a provided flat qpos+qvel vector."""
        if initial_qpos_qvel is not None:
            assert initial_qpos_qvel.shape[0] == self.qpos_dim + self.qvel_dim
            data = self._with_qpos_qvel(
                self._make_data(),
                initial_qpos_qvel[0 : self.qpos_dim],
                initial_qpos_qvel[self.qpos_dim :],
            )
        else:
            data = self.init_state(env_properties, rng)
        obs = self.generate_observation(data, env_properties)
        return obs, data

    @partial(jax.jit, static_argnums=0)
    def step(self, mjx_data, action_norm, env_properties):
        """One engine step with a normalized actuator command
        (``mjx.step`` on the mjx backend, host ``mj_step`` on cpu)."""
        assert action_norm.shape == (self.action_dim,), (
            f"The action needs to be of shape (action_dim,) which is "
            f"{(self.action_dim,)}, but {action_norm.shape} is given"
        )
        action = self.denormalize_action(action_norm, env_properties)
        if self.backend == "mjx":
            data = mjx.step(self.mjx_model, mjx_data.replace(ctrl=action))
        else:
            data = self._cpu_step(mjx_data, action)
        obs = self.generate_observation(data, env_properties)
        return obs, data

    @partial(jax.jit, static_argnums=0)
    def vmap_step(self, mjx_data, action):
        """One step for all ``batch_size`` simulations."""
        assert action.shape == (self.batch_size, self.action_dim), (
            "The action needs to be of shape (batch_size, action_dim) which is "
            f"{(self.batch_size, self.action_dim)}, but {action.shape} is given"
        )
        obs, mjx_data = jax.vmap(self.step, in_axes=(0, 0, self.in_axes_env_properties))(
            mjx_data, action, self.env_properties
        )
        return obs, mjx_data

    @partial(jax.jit, static_argnums=0)
    def vmap_init_state(self, rng=None):
        """Batched :meth:`init_state`."""
        return jax.vmap(self.init_state, in_axes=(self.in_axes_env_properties, 0, 0))(
            self.env_properties, rng, jnp.ones(self.batch_size)
        )

    @partial(jax.jit, static_argnums=0)
    def vmap_reset(self, rng=None, initial_qpos_qvel=None):
        """Batched :meth:`reset`."""
        obs, state = jax.vmap(self.reset, in_axes=(self.in_axes_env_properties, 0, 0, 0))(
            self.env_properties, rng, initial_qpos_qvel, jnp.ones(self.batch_size)
        )
        return obs, state

    @partial(jax.jit, static_argnums=0)
    def generate_state_from_observation(self, obs, env_properties, key=None):
        """Rebuild a fresh ``mjx.Data`` whose qpos/qvel reproduce ``obs``.

        The reference declares only the batched variant and vmaps a
        per-sample method it never defines (``mujoco_wrapper.py:363-377``
        raises ``AttributeError`` when called); the per-sample reconstruction
        is implemented here so the batched API actually works.  Round-trips
        with :meth:`generate_observation` up to angle wrapping.
        """
        qpos_norm = obs[: self.qpos_dim]
        qvel_norm = obs[self.qpos_dim : self.qpos_dim + self.qvel_dim]
        qpos = self.denormalize_components(qpos_norm, env_properties.physical_normalizations.qpos)
        qvel = self.denormalize_components(qvel_norm, env_properties.physical_normalizations.qvel)
        return self._with_qpos_qvel(self._make_data(), qpos, qvel)

    @partial(jax.jit, static_argnums=0)
    def vmap_generate_state_from_observation(self, obs, key=None):
        """Batched :meth:`generate_state_from_observation`
        (reference ``mujoco_wrapper.py:363-377``)."""
        state = jax.vmap(
            self.generate_state_from_observation, in_axes=(0, self.in_axes_env_properties, 0)
        )(obs, self.env_properties, key)
        return state
