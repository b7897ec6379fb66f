"""Permanent-magnet synchronous motor (PMSM) drive environment.

Behavior-compatible with
``/root/reference/exciting_environments/pmsm/pmsm_env.py``: 7-component
dq-frame physical state (``u_d_buffer``/``u_q_buffer``/``epsilon``/``i_d``/
``i_q``/``torque``/``omega_el``), one-step actuation deadtime, inverter
voltage-hexagon constraint applied at the deadtime-advanced electrical angle,
and either linear magnetics or measured saturation LUTs.

TPU-native differences: the six saturation maps are interpolated with one
fused stacked-bilinear gather (:mod:`exciting_environments_tpu.ops.lut`)
instead of six separate ``RegularGridInterpolator`` calls, and the 2x2
differential-inductance system is inverted in closed form rather than via
``jnp.linalg.inv`` — both keep the stiff electrical ODE a single fused VPU
computation per step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable
from types import MethodType

import numpy as np
import jax
import jax.numpy as jnp
from dataclasses import fields

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.core.env import CoreEnvironment
from exciting_environments_tpu.core.structures import pytree_dataclass
from exciting_environments_tpu.models.pmsm.motor_parameters import MotorVariant
from exciting_environments_tpu.ops.lut import SATURATED_QUANTITIES, build_pmsm_lut
from exciting_environments_tpu.ops.rollout import solve_trajectory, zoh_action
from exciting_environments_tpu.ops.transforms import (
    albet2dq,
    apply_hex_constraint,
    dq2albet,
    step_eps,
)


class PMSM(CoreEnvironment):
    """dq-frame PMSM drive with deadtime buffering and hexagon voltage limits.

    State Variables:
        ``['u_d_buffer', 'u_q_buffer', 'epsilon', 'i_d', 'i_q', 'torque', 'omega_el']``

    Action Variables:
        ``['u_d', 'u_q']`` (dq-frame voltages, normalized)
    """

    def __init__(
        self,
        batch_size: int = 8,
        saturated=False,
        motor_variant: MotorVariant = MotorVariant.DEFAULT,
        physical_normalizations: dict = None,
        action_normalizations: dict = None,
        soft_constraints: Callable = None,
        static_params: dict = None,
        control_state: list = None,
        solver=None,
        tau: float = 1e-4,
        process_noise: dict = None,
        observation_noise: dict = None,
        noise_mode: str = "exact",
    ):
        """
        Args:
            batch_size: Number of parallel environment simulations.
            saturated: Use measured flux-linkage/inductance LUTs instead of
                the linear magnetics model.
            motor_variant: Preset supplying default normalizations, static
                parameters, soft constraints and (for BRUSA/SEW) the LUTs.
            physical_normalizations: Min/max per physical-state component.
            action_normalizations: Min/max per action component.
            soft_constraints: Soft-constraint function for state/action.
            static_params: p, r_s, l_d, l_q, psi_p, u_dc, deadtime.
            control_state: Physical-state components tracked by references.
            solver: ODE solver instance or registry name (default Euler).
            tau: Control/simulation step duration in seconds.
            process_noise: Optional ``{field: sigma}`` additive
                Euler–Maruyama disturbance on the integrated currents
                (``i_d`` / ``i_q`` only; sigma in amperes per sqrt-second).
                The derived torque is recomputed from the perturbed currents
                each step, so observations and rewards stay electrically
                consistent.  Same key semantics as the classic envs
                (per-instance ``State.PRNGKey``); the stochastic paths are
                ``step`` / ``vmap_step`` / ``vmap_rollout`` — at kernel
                speed since round 4 (the drive kernels stream the
                pre-scaled draw slabs; ``rollout_path`` answers
                ``"pmsm_fused"``) — and, since round 5, ``sim_ahead`` for
                one-stage solvers (Euler–Maruyama on the observation grid;
                multistage tableaus keep the documented SDE-semantics
                raise).
            observation_noise: Optional ``{field: sigma}`` Gaussian sensor
                noise on the measured columns (``i_d``, ``i_q``,
                ``omega_el``, ``torque``; sigma in physical units, scaled
                into the normalized band).  The epsilon encoder (cos/sin
                columns), buffers and references stay exact; the underlying
                state stays exact.
            noise_mode: ``"exact"`` (per-step ``split(key, 3)`` chain) or
                ``"fast"`` (time-parallel counter-style draws) — see
                ``ClassicODEEnvironment``'s docstring.
        """
        self.batch_size = batch_size
        self.tau = tau

        motor_params = motor_variant.get_params()
        default_physical_normalizations = motor_params.physical_normalizations.__dict__
        default_action_normalizations = motor_params.action_normalizations.__dict__
        default_static_params = dict(motor_params.static_params.__dict__)
        default_soft_constraints = MethodType(motor_params.default_soft_constraints, self)

        self._lut = None
        if motor_variant != MotorVariant.DEFAULT:
            if saturated:
                # linear parameters are meaningless in the saturated model
                default_static_params["l_d"] = jnp.nan
                default_static_params["l_q"] = jnp.nan
                default_static_params["psi_p"] = jnp.nan
                self._lut, self.pmsm_lut = build_pmsm_lut(motor_params.pmsm_lut)
                self.LUT_interpolators = self._lut.as_dict()
            else:
                self.pmsm_lut = motor_params.pmsm_lut
                self.LUT_interpolators = {q: (lambda x: jnp.array([np.nan])) for q in SATURATED_QUANTITIES}
        else:
            if saturated:
                raise ValueError(
                    f"MotorVariant '{motor_variant.value}' is not allowed for saturated LUTs. "
                    "Use a specific motor variant. DEFAULT is only valid for saturated=False."
                )
            self.pmsm_lut = motor_params.pmsm_lut
            self.LUT_interpolators = {q: (lambda x: jnp.array([np.nan])) for q in SATURATED_QUANTITIES}

        if not static_params:
            static_params = default_static_params

        if not physical_normalizations:
            physical_normalizations = default_physical_normalizations
        else:
            i_d_lims = physical_normalizations["i_d"]
            i_q_lims = physical_normalizations["i_q"]
            def_i_d_lims = default_physical_normalizations["i_d"]
            def_i_q_lims = default_physical_normalizations["i_q"]
            # np.any keeps the warning working for per-batch (B,) bands
            # (warn if ANY instance's range leaves the LUT grid)
            if np.any(np.asarray(i_d_lims.min) < def_i_d_lims.min) or np.any(
                np.asarray(i_d_lims.max) > def_i_d_lims.max
            ):
                print(
                    f"The defined permitted range of i_d ({i_d_lims}) exceeds the limits of the "
                    f"LUT ({def_i_d_lims}). Values outside this range are extrapolated."
                )
            if np.any(np.asarray(i_q_lims.min) < def_i_q_lims.min) or np.any(
                np.asarray(i_q_lims.max) > def_i_q_lims.max
            ):
                print(
                    f"The defined permitted range of i_q ({i_q_lims}) exceeds the limits of the "
                    f"LUT ({def_i_q_lims}). Values outside this range are extrapolated."
                )

        if not action_normalizations:
            action_normalizations = default_action_normalizations
        if not control_state:
            control_state = []
        if not soft_constraints:
            soft_constraints = default_soft_constraints

        self.control_state = control_state
        self.soft_constraints = soft_constraints
        self._configure_noise(
            process_noise,
            observation_noise,
            noise_mode,
            process_fields=("i_d", "i_q"),
            observation_fields=tuple(name for _col, name in self._obs_noise_layout),
        )

        env_properties = self.EnvProperties(
            saturated=saturated,
            physical_normalizations=self.PhysicalState(**physical_normalizations),
            action_normalizations=self.Action(**action_normalizations),
            static_params=self.StaticParams(**static_params),
        )
        super().__init__(batch_size, env_properties=env_properties, tau=tau, solver=solver)

        self._action_description = ["u_d", "u_q"]
        # Matches the ACTUAL generate_observation column order.  The
        # reference's description list (pmsm_env.py:258-267) disagrees with
        # its own generate_observation (pmsm_env.py:903-916), which emits
        # (..., omega_el, torque, cos_eps, sin_eps, ...) — a latent reference
        # bug; anything pairing columns by name (e.g. a tracking loss on
        # "torque") silently reads sin_eps there.  Fixed here like the other
        # documented reference bugs.
        self._obs_description = [
            "i_d",
            "i_q",
            "omega_el",
            "torque",
            "cos_eps",
            "sin_eps",
            "u_d_buffer",
            "u_q_buffer",
        ]

    # ------------------------------------------------------------------
    # containers
    # ------------------------------------------------------------------

    @pytree_dataclass
    class StaticParams:
        """Electrical parameters of the drive."""

        p: jax.Array
        r_s: jax.Array
        l_d: jax.Array
        l_q: jax.Array
        psi_p: jax.Array
        u_dc: jax.Array
        deadtime: jax.Array

    @pytree_dataclass
    class PhysicalState:
        """Physical state of the drive."""

        u_d_buffer: jax.Array
        u_q_buffer: jax.Array
        epsilon: jax.Array
        i_d: jax.Array
        i_q: jax.Array
        torque: jax.Array
        omega_el: jax.Array

    @pytree_dataclass
    class Additions:
        """Solver carry threaded between steps."""

        solver_state: tuple
        active_solver_state: bool

    @pytree_dataclass
    class Action:
        """dq-frame voltage action."""

        u_d: jax.Array
        u_q: jax.Array

    @pytree_dataclass
    class EnvProperties:
        """Constant-per-simulation properties (adds the ``saturated`` flag)."""

        saturated: jax.Array
        physical_normalizations: object
        action_normalizations: object
        static_params: object

    # ------------------------------------------------------------------
    # magnetics
    # ------------------------------------------------------------------

    def generate_interpolators_and_lut(self, pmsm_lut):
        """Reference-compatible LUT pipeline entry (``pmsm_env.py:316-363``):
        NaN fill, edge padding and per-quantity interpolators from a raw
        measured LUT dict.  Returns ``(LUT_interpolators, pmsm_lut)`` exactly
        like the reference — the interpolators here are closures over the
        stacked bilinear gather instead of six
        ``RegularGridInterpolator`` objects."""
        lut, processed = build_pmsm_lut(pmsm_lut)
        return lut.as_dict(), processed

    def currents_to_torque(self, i_d, i_q, env_properties):
        """Linear-magnetics torque: 1.5 p (psi_p + (l_d - l_q) i_d) i_q."""
        torque = (
            1.5
            * env_properties.static_params.p
            * (
                env_properties.static_params.psi_p
                + (env_properties.static_params.l_d - env_properties.static_params.l_q) * i_d
            )
            * i_q
        )
        return torque

    def currents_to_torque_saturated(self, i_d, i_q, env_properties):
        """Saturated torque from the flux-linkage LUTs.

        Uses one stacked gather for both flux channels (the reference calls a
        separate ``RegularGridInterpolator`` per quantity, ``pmsm_env.py:377-381``).
        Without LUTs (non-saturated envs trace this branch under ``lax.cond``)
        the result is NaN, matching the reference's placeholder interpolators.
        """
        if self._lut is None:
            return jnp.nan * (i_d + i_q)
        vals = self._lut.interpolate_all(jnp.array([i_d, i_q]))
        psi_d, psi_q = vals[4], vals[5]
        return 3 / 2 * env_properties.static_params.p * (psi_d * i_q - psi_q * i_d)

    def nonlinear_ode(self, t, y, args, action):
        """Saturated electrical dynamics with the differential inductance
        matrix gathered from the LUTs (reference ``pmsm_env.py:487-507``).

        The 2x2 inverse is closed-form and all six LUT channels are fetched
        with one stacked gather, so the whole RHS fuses into one VPU kernel.
        """
        i_d, i_q, eps = y
        static_params, omega_el = args
        u_dq = action(t)
        vals = self._lut.interpolate_all(jnp.array([i_d, i_q]))
        l_dd, l_dq, l_qd, l_qq = vals[0], vals[1], vals[2], vals[3]
        psi_d, psi_q = vals[4], vals[5]
        # closed-form inverse of the differential inductance matrix
        det = l_dd * l_qq - l_dq * l_qd
        inv_dd, inv_dq = l_qq / det, -l_dq / det
        inv_qd, inv_qq = -l_qd / det, l_dd / det
        # di/dt = L_diff^-1 (u - r_s i - omega_el J psi), J = [[0,-1],[1,0]]
        rhs_d = u_dq[0] - static_params.r_s * i_d + omega_el * psi_q
        rhs_q = u_dq[1] - static_params.r_s * i_q - omega_el * psi_d
        i_d_diff = inv_dd * rhs_d + inv_dq * rhs_q
        i_q_diff = inv_qd * rhs_d + inv_qq * rhs_q
        eps_diff = omega_el
        return i_d_diff, i_q_diff, eps_diff

    def linear_ode(self, t, y, args, action):
        """Linear-magnetics electrical dynamics (reference ``pmsm_env.py:509-523``)."""
        i_d, i_q, eps = y
        params, omega_el = args
        u_dq = action(t)
        u_d = u_dq[0]
        u_q = u_dq[1]
        l_d = params.l_d
        l_q = params.l_q
        psi_p = params.psi_p
        r_s = params.r_s
        i_d_diff = (u_d + omega_el * l_q * i_q - r_s * i_d) / l_d
        i_q_diff = (u_q - omega_el * (l_d * i_d + psi_p) - r_s * i_q) / l_q
        eps_diff = omega_el
        return i_d_diff, i_q_diff, eps_diff

    def _pmsm_vector_field(self, saturated, action_callable):
        ode = self.nonlinear_ode if saturated else self.linear_ode
        return lambda t, y, args: ode(t, y, args, action_callable)

    # ------------------------------------------------------------------
    # reset
    # ------------------------------------------------------------------

    def init_state(self, env_properties, rng=None, vmap_helper=None):
        """Default or random initial state.

        Random draws place ``i_dq`` uniformly in the admissible current disc
        (rejected halves folded back, reference ``pmsm_env.py:402-427``) and
        derive the consistent torque from the active magnetics model.
        """
        norms = env_properties.physical_normalizations
        if rng is None:
            phys = self.PhysicalState(
                u_d_buffer=0.0,
                u_q_buffer=0.0,
                epsilon=0.0,
                i_d=(norms.i_d.min + norms.i_d.max) / 2,
                i_q=0.0,
                torque=0.0,
                omega_el=(norms.omega_el.min + norms.omega_el.max) / 2,
            )
            rng = jnp.nan
        else:
            rng, subkey = jax.random.split(rng)
            state_norm = jax.random.uniform(subkey, minval=-1, maxval=1, shape=(2,))
            rng, subkey = jax.random.split(rng)
            i_dq_norm = jax.random.ball(subkey, 2)
            i_max = jnp.max(
                jnp.array(
                    [
                        jnp.abs(norms.i_d.min),
                        jnp.abs(norms.i_d.max),
                        jnp.abs(norms.i_q.min),
                        jnp.abs(norms.i_q.max),
                    ]
                )
            )
            i_dq_rand = i_dq_norm * i_max
            i_d = (
                i_dq_rand[0]
                - 2 * jax.nn.relu(i_dq_rand[0] - norms.i_d.max)
                + 2 * jax.nn.relu(-i_dq_rand[0] + norms.i_d.min)
            )
            i_q = (
                i_dq_rand[1]
                - 2 * jax.nn.relu(i_dq_rand[1] - norms.i_q.max)
                + 2 * jax.nn.relu(-i_dq_rand[1] + norms.i_q.min)
            )
            torque = jax.lax.cond(
                env_properties.saturated,
                self.currents_to_torque_saturated,
                self.currents_to_torque,
                i_d,
                i_q,
                env_properties,
            )
            phys = self.PhysicalState(
                u_d_buffer=0.0,
                u_q_buffer=0.0,
                epsilon=(state_norm[0] + 1) / 2 * (norms.epsilon.max - norms.epsilon.min) + norms.epsilon.min,
                i_d=i_d,
                i_q=i_q,
                torque=torque,
                omega_el=(state_norm[1] + 1) / 2 * (norms.omega_el.max - norms.omega_el.min)
                + norms.omega_el.min,
            )

        additions = self._pmsm_solver_additions(env_properties, phys)
        ref = self._nan_reference()
        return self.State(physical_state=phys, PRNGKey=rng, additions=additions, reference=ref)

    def _pmsm_solver_additions(self, env_properties, phys):
        """NaN-poisoned solver carry for a fresh state (PMSM integrates only
        the electrical subsystem ``(i_d, i_q, epsilon)``)."""
        f = self._pmsm_vector_field(env_properties.saturated, lambda t: jnp.array([0, 0]))
        args = (env_properties.static_params, phys.omega_el)
        y0 = (phys.i_d, phys.i_q, phys.epsilon)
        solver_state = self._solver.init(f, 0.0, self.tau, y0, args)
        solver_state = jax.tree_util.tree_map(lambda x: x * jnp.nan, solver_state)
        return self.Additions(solver_state=solver_state, active_solver_state=False)

    # ------------------------------------------------------------------
    # integration
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=[0, 3])
    def _ode_solver_step(self, state, u_dq, properties):
        """One electrical-subsystem step; torque is recomputed from the new
        currents with the active magnetics model (reference ``pmsm_env.py:525-592``)."""
        system_state = state.physical_state
        omega_el = system_state.omega_el

        f = self._pmsm_vector_field(properties.saturated, lambda t: u_dq)
        args = (properties.static_params, omega_el)
        y0 = (system_state.i_d, system_state.i_q, system_state.epsilon)
        t0, t1 = 0.0, self.tau

        # fresh per-step carry init under the current action — the
        # reference's net step-mode semantics (see CoreEnvironment
        # ._ode_solver_step for the full rationale)
        additions = self.Additions(
            solver_state=self._solver.init(f, t0, t1, y0, args),
            active_solver_state=True,
        )
        y, solver_state_k1 = self._solver.step(f, t0, t1, y0, args, additions.solver_state)
        i_d_k1, i_q_k1, eps_k1 = y
        eps_k1 = ((eps_k1 + jnp.pi) % (2 * jnp.pi)) - jnp.pi

        if properties.saturated:
            torque = self.currents_to_torque_saturated(i_d=i_d_k1, i_q=i_q_k1, env_properties=properties)
        else:
            torque = self.currents_to_torque(i_d_k1, i_q_k1, properties)

        with structures.copy_and_mutate(system_state, validate=True) as system_state_next:
            system_state_next.epsilon = eps_k1
            system_state_next.i_d = i_d_k1
            system_state_next.i_q = i_q_k1
            system_state_next.torque = torque

        new_state = structures.replace(
            state,
            physical_state=system_state_next,
            additions=self.Additions(solver_state=solver_state_k1, active_solver_state=True),
        )
        return new_state

    @partial(jax.jit, static_argnums=[0, 3, 4, 5])
    def _ode_solver_simulate_ahead(self, init_state, actions, properties, obs_stepsize, action_stepsize):
        """Trajectory integration of the electrical subsystem with frozen
        ``omega_el`` (reference ``pmsm_env.py:618-707``)."""
        init_phys = init_state.physical_state
        f = self._pmsm_vector_field(properties.saturated, zoh_action(actions, action_stepsize))
        args = (properties.static_params, init_phys.omega_el)
        y0 = (init_phys.i_d, init_phys.i_q, init_phys.epsilon)
        t1 = action_stepsize * actions.shape[0]
        n_steps = int(t1 / obs_stepsize)

        ys, _ = solve_trajectory(self._solver, f, y0, args, n_steps, obs_stepsize)
        i_d_t, i_q_t, eps_t = ys
        eps_t = ((eps_t + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        obs_len = n_steps + 1

        if properties.saturated:
            torque_t = jax.vmap(self.currents_to_torque_saturated, in_axes=(0, 0, None))(
                i_d_t, i_q_t, properties
            )
        else:
            torque_t = jax.vmap(self.currents_to_torque, in_axes=(0, 0, None))(i_d_t, i_q_t, properties)

        phys = self.PhysicalState(
            u_d_buffer=jnp.zeros(obs_len),
            u_q_buffer=jnp.zeros(obs_len),
            epsilon=eps_t,
            i_d=i_d_t,
            i_q=i_q_t,
            torque=torque_t,
            omega_el=jnp.full(obs_len, init_phys.omega_el),
        )
        y_last = (i_d_t[-1], i_q_t[-1], eps_t[-1])
        solver_state = self._solver.init(f, t1, t1 + self.tau, y_last, args)
        additions = self.Additions(
            solver_state=self.repeat_values(solver_state, obs_len),
            active_solver_state=jnp.full(obs_len, True),
        )
        ref = self.PhysicalState(
            **{field.name: jnp.full(obs_len, jnp.nan) for field in fields(self.PhysicalState)}
        )
        return self.State(
            physical_state=phys,
            PRNGKey=self._tile_time(init_state.PRNGKey, obs_len),
            additions=additions,
            reference=ref,
        )

    def _pmsm_sde_simulate_ahead(self, init_state, actions, properties, obs_stepsize, action_stepsize):
        """Euler–Maruyama trajectory solve of the electrical subsystem (the
        stochastic counterpart of :meth:`_ode_solver_simulate_ahead`,
        one-stage solvers only — gated in :meth:`sim_ahead`).

        Per observation step: the exact one-stage drift update ``y + dt *
        f`` under the ZOH (already constrained + deadtime-shifted) voltage
        sequence, then the current diffusion increment ``sigma * sqrt(dt) *
        xi`` on the raw carry (``epsilon`` is never perturbed — process
        noise is restricted to the integrated currents); keys advance via
        :meth:`CoreEnvironment._noise_step_keys`, so at ``obs_stepsize ==
        action_stepsize`` the draw stream equals chained :meth:`step` calls
        in BOTH noise modes.  Saves wrap the angle like the deterministic
        path, torque is recomputed from the POST-noise currents (the
        :meth:`_apply_process_noise_eps` semantics), and each save carries
        ITS step's advanced key — resuming from a saved state must not
        replay consumed draws.  Returns ``(states, eps_obs)`` with
        ``eps_obs`` the per-post-step-save standard-normal sensor draws
        ``(n_steps, n_layout)``.
        """
        init_phys = init_state.physical_state
        f = self._pmsm_vector_field(properties.saturated, zoh_action(actions, action_stepsize))
        args = (properties.static_params, init_phys.omega_el)
        y0 = (init_phys.i_d, init_phys.i_q, init_phys.epsilon)
        t1 = action_stepsize * actions.shape[0]
        n_steps = int(t1 / obs_stepsize)
        dt = obs_stepsize
        key0 = self._require_noise_key(init_state)

        proc_items = sorted(self._process_noise.items()) if self._process_noise else []
        idxs = tuple(("i_d", "i_q", "epsilon").index(nm) for nm, _ in proc_items)
        sqrt_dt = jnp.sqrt(dt)
        n_layout = len(self._obs_noise_layout)
        want_obs = bool(self._observation_noise)

        def body(carry, t):
            y, key = carry
            new_key, k_p, k_o = self._noise_step_keys(key)
            dy = f(t, y, args)
            y1 = tuple(yl + dt * dyl for yl, dyl in zip(y, dy))
            if proc_items:
                eps = jax.random.normal(k_p, (len(proc_items),))
                y1 = list(y1)
                for j, i in enumerate(idxs):
                    y1[i] = y1[i] + proc_items[j][1] * sqrt_dt * eps[j]
                y1 = tuple(y1)
            eps_o = (
                jax.random.normal(k_o, (n_layout,)) if want_obs else jnp.zeros((0,))
            )
            return (y1, new_key), (y1, new_key, eps_o)

        # host-side f64 step-start times (see _sde_simulate_ahead: an
        # on-device f32 grid consumes zoh_action's floor-guard margin)
        ts = jnp.asarray(np.arange(n_steps, dtype=np.float64) * dt)
        (_, _key_last), (ys_tail, keys_tail, eps_obs) = jax.lax.scan(
            body, (y0, key0), ts
        )
        ys = tuple(
            jnp.concatenate([jnp.asarray(l0)[None], tail], axis=0)
            for l0, tail in zip(y0, ys_tail)
        )
        i_d_t, i_q_t, eps_t = ys
        eps_t = ((eps_t + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        obs_len = n_steps + 1

        # torque from the POST-noise currents at every save (step's
        # _apply_process_noise_eps recompute), LUT or linear magnetics
        if properties.saturated:
            torque_t = jax.vmap(self.currents_to_torque_saturated, in_axes=(0, 0, None))(
                i_d_t, i_q_t, properties
            )
        else:
            torque_t = jax.vmap(self.currents_to_torque, in_axes=(0, 0, None))(i_d_t, i_q_t, properties)

        phys = self.PhysicalState(
            u_d_buffer=jnp.zeros(obs_len),
            u_q_buffer=jnp.zeros(obs_len),
            epsilon=eps_t,
            i_d=i_d_t,
            i_q=i_q_t,
            torque=torque_t,
            omega_el=jnp.full(obs_len, init_phys.omega_el),
        )
        y_last = (i_d_t[-1], i_q_t[-1], eps_t[-1])
        solver_state = self._solver.init(f, t1, t1 + self.tau, y_last, args)
        additions = self.Additions(
            solver_state=self.repeat_values(solver_state, obs_len),
            active_solver_state=jnp.full(obs_len, True),
        )
        ref = self.PhysicalState(
            **{field.name: jnp.full(obs_len, jnp.nan) for field in fields(self.PhysicalState)}
        )
        keys = jnp.concatenate([jnp.asarray(key0)[None], keys_tail], axis=0)
        states = self.State(
            physical_state=phys,
            PRNGKey=keys,
            additions=additions,
            reference=ref,
        )
        return states, eps_obs

    def _adaptive_rollout(
        self,
        init_state,
        actions_norm,
        rtol: float = 1e-6,
        atol: float = 1e-8,
        solver=None,
        dt0: float = None,
        max_steps_per_interval: int = 1_000,
        safety: float = 0.9,
        min_factor: float = 0.2,
        max_factor: float = 5.0,
        env_properties=None,
    ):
        """Per-instance adaptive integration of the electrical subsystem
        across a ZOH action sequence (dispatched to by
        :func:`exciting_environments_tpu.ops.adaptive.adaptive_rollout`).

        The stiff saturated drive is the prime adaptive use case: the LUT
        inductances make the current dynamics' time constants state- and
        parameter-dependent, so fixed-step integration at ``tau`` silently
        under-resolves aggressive operating points.  Each control interval
        reproduces the ``step`` semantics exactly — hexagon constraint at the
        deadtime-advanced angle, deadtime buffer swap, integration of
        ``(i_d, i_q, epsilon)`` with frozen ``omega_el``, angle wrap and
        torque recomputation — but the interval integral itself is
        PI-controlled with a warm-started per-instance step size.

        Supports per-batch heterogeneous parameters: ``env_properties`` may
        carry ``(B,)`` leaves (e.g. per-instance ``r_s``), and the mesh-
        sharded wrapper passes each shard its local property slice here.
        """
        from exciting_environments_tpu.ops.adaptive import AdaptiveStats, _adaptive_interval
        from exciting_environments_tpu.ops.solvers import Tsit5

        solver = solver if solver is not None else Tsit5()
        if getattr(solver, "b_err", None) is None:
            raise ValueError(f"{type(solver).__name__} has no embedded error estimate")
        props = env_properties if env_properties is not None else self.env_properties
        tau = float(self.tau)
        if dt0 is None:
            dt0 = tau / 10.0
        saturated = bool(props.saturated)
        deadtime = int(props.static_params.deadtime)

        batch, n_intervals, _ = actions_norm.shape
        phys = init_state.physical_state
        proto = jnp.zeros(batch, dtype=jnp.asarray(phys.i_d).dtype)
        y0 = tuple(
            jnp.broadcast_to(jnp.asarray(v), proto.shape)
            for v in (phys.i_d, phys.i_q, phys.epsilon)
        )
        bufs0 = tuple(
            jnp.broadcast_to(jnp.asarray(v), proto.shape)
            for v in (phys.u_d_buffer, phys.u_q_buffer)
        )
        omega_el = jnp.broadcast_to(jnp.asarray(phys.omega_el), proto.shape)
        acts_tm = jnp.moveaxis(actions_norm, 1, 0)  # (n_intervals, B, 2)
        in_ax = self.in_axes_env_properties

        def interval(carry, a_norm_i):
            y, bufs, dt, t0, accepted, rejected, incomplete = carry
            i_d, i_q, eps = y
            # the hexagon clip runs at the CURRENT state's advanced angle —
            # same as step() (reference pmsm_env.py:851-883 semantics)
            state_like = structures.replace(
                init_state,
                physical_state=self.PhysicalState(
                    u_d_buffer=bufs[0],
                    u_q_buffer=bufs[1],
                    epsilon=eps,
                    i_d=i_d,
                    i_q=i_q,
                    torque=jnp.zeros_like(i_d),
                    omega_el=omega_el,
                ),
            )
            u_con = jax.vmap(self.constraint_denormalization, in_axes=(0, 0, in_ax))(
                a_norm_i, state_like, props
            )
            if deadtime > 0:
                u_dq = (bufs[0], bufs[1])  # buffered voltage drives the plant
                new_bufs = (u_con[:, 0], u_con[:, 1])
            else:
                u_dq = (u_con[:, 0], u_con[:, 1])
                new_bufs = bufs

            f = self._pmsm_vector_field(saturated, lambda t: u_dq)
            args = (props.static_params, omega_el)
            y_new, dt_new, t_end, acc, rej = _adaptive_interval(
                solver, f, y, args, t0, t0 + tau, dt,
                rtol, atol, max_steps_per_interval, safety, min_factor, max_factor,
            )
            incomplete = jnp.logical_or(incomplete, t_end < t0 + tau)
            i_d, i_q, eps = y_new
            eps = ((eps + jnp.pi) % (2 * jnp.pi)) - jnp.pi
            return (
                (i_d, i_q, eps), new_bufs, dt_new, t0 + tau,
                accepted + acc, rejected + rej, incomplete,
            ), None

        carry0 = (
            y0, bufs0, proto + dt0, proto,
            jnp.zeros(batch, jnp.int32), jnp.zeros(batch, jnp.int32),
            jnp.zeros(batch, bool),
        )
        (y, bufs, dt, _, accepted, rejected, incomplete), _ = jax.lax.scan(
            interval, carry0, acts_tm
        )
        i_d, i_q, eps = y
        if saturated:
            torque = self.currents_to_torque_saturated(i_d, i_q, props)
        else:
            torque = self.currents_to_torque(i_d, i_q, props)

        final_state = structures.replace(
            init_state,
            physical_state=self.PhysicalState(
                u_d_buffer=bufs[0],
                u_q_buffer=bufs[1],
                epsilon=eps,
                i_d=i_d,
                i_q=i_q,
                torque=torque,
                omega_el=omega_el,
            ),
            additions=self.Additions(
                solver_state=None,
                active_solver_state=jnp.full(batch, True),
            ),
        )
        obs = jax.vmap(self.generate_observation, in_axes=(0, in_ax))(final_state, props)
        return obs, final_state, AdaptiveStats(
            accepted=accepted, rejected=rejected, final_dt=dt, incomplete=incomplete
        )

    def fused_rollout(self, init_state, actions, obs_stride: int = None,
                      time_major: bool = False, interpret: bool = False,
                      gather: str = "int8", strict: bool = False):
        """:meth:`vmap_rollout` through the fused PMSM drive kernel
        (constraint pre-pass + VMEM-resident current integration; bit-exact
        on TPU for saturated magnetics — see
        :mod:`exciting_environments_tpu.ops.pallas.pmsm_stepper`), with a
        transparent scan fallback out of kernel scope (``strict=True``
        raises instead).  Differentiable (checkpointed-recompute VJP)."""
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

        return pmsm_fused_rollout(
            self, init_state, actions,
            obs_stride=obs_stride, time_major=time_major,
            gather=gather, interpret=interpret, strict=strict,
        )

    def fused_sim_ahead(self, init_state, actions, obs_stepsize, action_stepsize,
                        obs_stride: int = 1, time_major: bool = False,
                        interpret: bool = False, gather: str = "int8",
                        strict: bool = False):
        """:meth:`vmap_sim_ahead` semantics through the fused drive kernel for
        ``obs_stepsize == action_stepsize`` — the overridden PMSM trajectory
        path (constraint at tau-extrapolated angles, deadtime shift, unwrapped
        angle accumulation, patched buffer columns); scan fallback otherwise
        (``strict=True`` raises).  Returns ``(observations, last_state)``."""
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_sim_ahead

        obs, last = pmsm_fused_sim_ahead(
            self, init_state, actions, obs_stepsize, action_stepsize,
            time_major=time_major, gather=gather, interpret=interpret,
            strict=strict,
        )
        if obs_stride != 1:
            obs = obs[:, ::obs_stride]
        return obs, last

    def fused_closed_loop(self, init_state, policy, n_steps: int,
                          obs_stride: int = None, interpret: bool = False,
                          policy_params=None, return_traj_states: bool = False,
                          gather: str = "int8", policy_carry=None,
                          sched_lut=None):
        """Closed-loop rollout with the policy evaluated INSIDE the fused
        drive kernel: the inverter constraint moves in-kernel and angle +
        deadtime buffers become VMEM-carried planes (see
        :func:`...ops.pallas.pmsm_stepper.pmsm_fused_closed_loop` for the
        tile-policy/observation contract).  Differentiable w.r.t.
        ``policy_params``; ``policy_carry`` makes the policy STATEFUL (a
        real PI current controller with VMEM-resident integrators —
        ``policy(obs, t, carry[, params]) -> ((a_d, a_q), carry)``), every
        return shape then ending with the final carry.  Raises out of
        kernel scope (no open-loop fallback)."""
        from exciting_environments_tpu.ops.pallas.pmsm_stepper import (
            pmsm_fused_closed_loop,
        )

        return pmsm_fused_closed_loop(
            self, init_state, policy, n_steps,
            obs_stride=obs_stride, gather=gather, interpret=interpret,
            return_traj_states=return_traj_states, policy_params=policy_params,
            policy_carry=policy_carry, sched_lut=sched_lut,
        )

    def fast_rollout(self, init_state, actions, time_major: bool = False,
                     interpret: bool = False, gather: str = "int8"):
        """Trig-free fast-math rollout (rotation-carry semantics) through the
        fully-fused kernel when Pallas is available
        (:mod:`...ops.pallas.pmsm_fast_kernel`); returns the final ``State``."""
        from exciting_environments_tpu.ops.pallas.pmsm_fast_kernel import (
            pmsm_fast_fused_rollout,
        )

        return pmsm_fast_fused_rollout(
            self, init_state, actions,
            time_major=time_major, gather=gather, interpret=interpret,
        )

    # ------------------------------------------------------------------
    # inverter constraint + deadtime
    # ------------------------------------------------------------------

    def constraint_denormalization(self, u_dq_norm, system_state, env_properties):
        """Denormalize ``u_dq`` and clip it into the voltage hexagon at the
        deadtime-advanced electrical angle (reference ``pmsm_env.py:594-616``)."""
        u_dq = self.denormalize_action(u_dq_norm, env_properties)
        u_dq_norm = u_dq * (1 / (env_properties.static_params.u_dc / 2))
        advanced_angle = step_eps(
            system_state.physical_state.epsilon,
            system_state.physical_state.omega_el,
            self.tau,
            env_properties.static_params.deadtime + 0.5,
        )
        u_albet_norm = dq2albet(u_dq_norm, advanced_angle)
        u_albet_norm_clip = apply_hex_constraint(u_albet_norm)
        u_dq_norm_clip = albet2dq(u_albet_norm_clip, advanced_angle)
        return u_dq_norm_clip[0] * (env_properties.static_params.u_dc / 2)

    def constraint_denormalization_ahead(self, actions, init_state, env_properties):
        """Vectorized hexagon constraint over a whole action sequence, with
        the electrical angle extrapolated per step (reference ``pmsm_env.py:709-744``)."""
        act_len = actions.shape[0]
        with structures.copy_and_mutate(init_state, validate=False) as states:
            for field in fields(states.physical_state):
                name = field.name
                setattr(
                    states.physical_state,
                    name,
                    self.repeat_values(getattr(states.physical_state, name), act_len),
                )
            # DELIBERATE reference parity (pmsm_env.py:721): the angle
            # advance hardcodes self.tau, not the action_stepsize actually
            # integrated, so the hexagon clip runs at off angles whenever
            # action_stepsize != tau — preserved, not "fixed"
            states.physical_state.epsilon = (
                states.physical_state.epsilon
                + jnp.linspace(0, self.tau * (act_len - 1), act_len) * init_state.physical_state.omega_el
            )
            for field in fields(states.reference):
                name = field.name
                setattr(states.reference, name, self.repeat_values(getattr(states.reference, name), act_len))
            for field in fields(states.additions):
                name = field.name
                setattr(states.additions, name, self.repeat_values(getattr(states.additions, name), act_len))
            states.PRNGKey = self._tile_time(init_state.PRNGKey, act_len)

        actions = jax.vmap(self.constraint_denormalization, in_axes=(0, 0, None))(
            actions, states, env_properties
        )
        return actions

    @partial(jax.jit, static_argnums=[0, 3, 4, 5])
    def sim_ahead(self, init_state, actions, env_properties, obs_stepsize, action_stepsize):
        """Trajectory simulation with hexagon constraint and deadtime shifting
        of the action sequence (reference ``pmsm_env.py:746-801``).

        Stochastic drives (``process_noise``/``observation_noise``, round 5)
        integrate as an SDE for ONE-STAGE solvers, mirroring
        :meth:`CoreEnvironment.sim_ahead`: the hexagon constraint and the
        deadtime shift of the action sequence are unchanged (both are
        state-independent given the frozen ``omega_el`` — process noise on
        the currents never reaches the angle arithmetic), the drift step on
        the observation grid is followed by an Euler–Maruyama current
        increment with the derived torque recomputed from the perturbed
        currents at every save (the exact :meth:`step` semantics), and each
        saved observation carries its own sensor draw.  At ``obs_stepsize ==
        action_stepsize`` this consumes the same per-step key chain as
        repeated :meth:`step` calls in both noise modes (the trajectory-level
        deadtime shift is equivalent to step's buffer swap there, and the
        documented hardcoded-``tau`` extrapolation quirk of the constraint
        angles applies identically).  Multistage solvers raise — the same
        no-agreed-SDE-semantics argument as the classic envs
        (``docs/parts/solvers.rst``)."""
        if self._has_noise:
            from exciting_environments_tpu.ops.solvers import ExplicitRungeKutta

            if not (
                isinstance(self._solver, ExplicitRungeKutta)
                and self._solver.one_stage
            ):
                raise ValueError(
                    "stochastic sim_ahead is defined for one-stage solvers "
                    "only (Euler–Maruyama on the observation grid); multistage "
                    "tableaus have no agreed SDE semantics — integrate with "
                    'solver="euler" or step through vmap_step / vmap_rollout.'
                )
        actions = self.constraint_denormalization_ahead(actions, init_state, env_properties)

        deadtime = env_properties.static_params.deadtime
        acts_buf = jnp.repeat(
            jnp.array(
                [
                    init_state.physical_state.u_d_buffer,
                    init_state.physical_state.u_q_buffer,
                ]
            )[None, :],
            deadtime,
            axis=0,
        )
        actions_dead = jnp.vstack([acts_buf, actions[: (actions.shape[0] - deadtime), :]])

        if self._has_noise:
            states, eps_obs = self._pmsm_sde_simulate_ahead(
                init_state, actions_dead, env_properties, obs_stepsize, action_stepsize
            )
        else:
            states = self._ode_solver_simulate_ahead(
                init_state, actions_dead, env_properties, obs_stepsize, action_stepsize
            )
            eps_obs = None

        with structures.copy_and_mutate(states, validate=False) as states:
            acts_m = jnp.vstack([acts_buf, actions])
            # DELIBERATE reference parity (pmsm_env.py:787): the ratio is
            # inverted (obs/action instead of action/obs), so with deadtime>0
            # this path only produces consistent buffer lengths for
            # obs_stepsize == action_stepsize; finer observation grids break
            # in the reference the same way and are preserved, not "fixed"
            acts_m = acts_m.repeat(int(obs_stepsize / action_stepsize), axis=0)
            if deadtime == 0:
                acts_m = jnp.zeros(((actions.shape[0] + 1), 2))
            states.physical_state.u_d_buffer = acts_m[:, 0]
            states.physical_state.u_q_buffer = acts_m[:, 1]

        observations = jax.vmap(self.generate_observation, in_axes=(0, None))(states, env_properties)
        if eps_obs is not None and self._observation_noise:
            # each post-step save carries its own step's sensor draw; the
            # initial row is the exact state (no draw consumed yet) — same
            # contract as CoreEnvironment.sim_ahead
            noisy_tail = jax.vmap(
                self._apply_observation_noise_eps, in_axes=(0, None, 0)
            )(observations[1:], env_properties, eps_obs)
            observations = jnp.concatenate([observations[:1], noisy_tail], axis=0)

        # per-leaf time indexing so the simulation can continue from the end point
        last_state = self._index_time(states, -1)
        return observations, states, last_state

    def generate_rew_trunc_term_ahead(self, states, actions, env_properties):
        """Reward/flags for a ``sim_ahead`` trajectory, accounting for the
        hexagon constraint and deadtime shift (reference ``pmsm_env.py:803-849``)."""
        assert actions.ndim == 2, "The actions need to have two dimensions: (n_action_steps, action_dim)"
        assert actions.shape[-1] == self.action_dim, (
            f"The last dimension does not correspond to the action dim which is "
            f"{self.action_dim}, but {actions.shape[-1]} is given"
        )
        deadtime = env_properties.static_params.deadtime

        obs_len = jax.tree_util.tree_leaves(states)[0].shape[0]
        states_without_init_state = self._index_time(states, slice(1, None))
        states_without_last_state = self._index_time(states, slice(None, -1))

        actions = jax.vmap(self.constraint_denormalization, in_axes=(0, 0, None))(
            actions, states_without_last_state, env_properties
        )

        acts_buf = jnp.repeat(
            jnp.array(
                [
                    states.physical_state.u_d_buffer[0],
                    states.physical_state.u_q_buffer[0],
                ]
            )[None, :],
            deadtime,
            axis=0,
        )
        actions_dead = jnp.vstack([acts_buf, actions[: (actions.shape[0] - deadtime), :]])

        reward = jax.vmap(self.generate_reward, in_axes=(0, 0, None))(
            states_without_init_state,
            jnp.expand_dims(
                jnp.repeat(
                    actions_dead,
                    int((obs_len - 1) / actions_dead.shape[0]),
                    axis=0,
                ),
                1,
            ),
            env_properties,
        )
        truncated = jax.vmap(self.generate_truncated, in_axes=(0, None))(states, env_properties)
        terminated = jax.vmap(self.generate_terminated, in_axes=(0, 0, None))(
            states_without_init_state, reward, env_properties
        )
        return reward, truncated, terminated

    def _advance_state(self, state, action, env_properties):
        """Deterministic drive update of one control step with actuation
        deadtime: the constrained action enters the buffer while the buffered
        voltage drives the plant (reference ``pmsm_env.py:851-883``).  The
        :meth:`CoreEnvironment.step` noise hooks compose around this."""
        action = self.constraint_denormalization(action, state, env_properties)

        action_buffer = jnp.array([state.physical_state.u_d_buffer, state.physical_state.u_q_buffer])
        if env_properties.static_params.deadtime > 0:
            updated_buffer = jnp.array([action[0], action[1]])
            u_dq = action_buffer
        else:
            updated_buffer = action_buffer
            u_dq = action

        next_state = self._ode_solver_step(state, u_dq, env_properties)
        with structures.copy_and_mutate(next_state, validate=True) as next_state_update:
            next_state_update.physical_state.u_d_buffer = updated_buffer[0]
            next_state_update.physical_state.u_q_buffer = updated_buffer[1]
        return next_state_update

    @partial(jax.jit, static_argnums=[0, 3])
    def step(self, state, action, env_properties):
        """One control step with actuation deadtime (and, when configured,
        the stochastic-simulation hooks — same key semantics as
        ``CoreEnvironment.step``)."""
        if self._has_noise:
            new_key, k_proc, k_obs = self._noise_step_keys(self._require_noise_key(state))
            state = structures.replace(state, PRNGKey=new_key)

        next_state = self._advance_state(state, action, env_properties)
        if self._process_noise:
            next_state = self._apply_process_noise(next_state, k_proc, env_properties)
        observation = self.generate_observation(next_state, env_properties)
        if self._observation_noise:
            observation = self._apply_observation_noise(observation, env_properties, k_obs)
        return observation, next_state

    #: observation columns eligible for sensor noise (the PMSM observation
    #: re-encodes epsilon as cos/sin and appends buffers/references, so the
    #: generic head-aligned default does not apply) — also the measurable
    #: columns for the EKF/UKF observers
    _obs_noise_layout = ((0, "i_d"), (1, "i_q"), (2, "omega_el"), (3, "torque"))

    #: circular physical fields (consumed by the observers' innovation
    #: wrapping and sysid's circular residual metric; the PMSM's own step
    #: wraps epsilon explicitly, and no generic wrap machinery runs on it
    #: because ``_ode_state_fields`` stays empty)
    _angle_fields = ("epsilon",)

    def _state_from_normalized_physical(self, x_norm, env_properties, ref_norm=None):
        """Build the state directly from normalized physical fields (the
        observation re-encodes epsilon as cos/sin, so the generic
        observation-roundtrip default does not apply)."""
        names = tuple(f.name for f in fields(self.PhysicalState))
        phys = self.PhysicalState(**{name: x_norm[i] for i, name in enumerate(names)})
        additions = self._pmsm_solver_additions(env_properties, phys)
        ref = self._nan_reference()
        if ref_norm is not None:
            with structures.copy_and_mutate(ref, validate=False) as ref:
                for pos, name in enumerate(self.control_state):
                    setattr(ref, name, ref_norm[pos])
        norm_state = self.State(
            physical_state=phys, PRNGKey=jnp.nan, additions=additions, reference=ref
        )
        return self.denormalize_state(norm_state, env_properties)

    def _apply_process_noise_eps(self, state, eps, env_properties):
        """Euler–Maruyama current disturbance: perturb ``i_d``/``i_q`` by
        ``sigma * sqrt(tau) * xi`` and recompute the derived torque from the
        perturbed currents (LUT or linear magnetics), so the observation and
        reward see a consistent electrical state."""
        items = sorted(self._process_noise.items())
        sqrt_tau = jnp.sqrt(self.tau)
        with structures.copy_and_mutate(state, validate=True) as noisy:
            for j, (name, sigma) in enumerate(items):
                setattr(
                    noisy.physical_state,
                    name,
                    getattr(state.physical_state, name) + sigma * sqrt_tau * eps[j],
                )
        if env_properties.saturated:
            torque = self.currents_to_torque_saturated(
                noisy.physical_state.i_d, noisy.physical_state.i_q, env_properties
            )
        else:
            torque = self.currents_to_torque(
                noisy.physical_state.i_d, noisy.physical_state.i_q, env_properties
            )
        with structures.copy_and_mutate(noisy, validate=True) as out:
            out.physical_state.torque = torque
        return out

    # ------------------------------------------------------------------
    # observation / reconstruction / reward
    # ------------------------------------------------------------------

    @property
    def action_description(self):
        return self._action_description

    @property
    def obs_description(self):
        return np.hstack(
            [
                np.array(self._obs_description),
                np.array([name + "_ref" for name in self.control_state]),
            ]
        )

    def generate_observation(self, system_state, env_properties):
        """Normalized (i_d, i_q, omega_el, torque, cos eps, sin eps, buffers)
        plus any tracked reference components."""
        eps = system_state.physical_state.epsilon
        cos_eps = jnp.cos(eps)
        sin_eps = jnp.sin(eps)
        norm_state = self.normalize_state(system_state, env_properties)
        norm_state_phys = norm_state.physical_state
        obs = jnp.hstack(
            (
                norm_state_phys.i_d,
                norm_state_phys.i_q,
                norm_state_phys.omega_el,
                norm_state_phys.torque,
                cos_eps,
                sin_eps,
                norm_state_phys.u_d_buffer,
                norm_state_phys.u_q_buffer,
            )
        )
        for name in self.control_state:
            obs = jnp.hstack((obs, getattr(norm_state.reference, name)))
        return obs

    @partial(jax.jit, static_argnums=[0, 2])
    def generate_state_from_observation(self, obs, env_properties, key=None):
        """Rebuild the full state from an observation; the electrical angle is
        recovered from its cos/sin pair."""
        subkey = key if key is not None else jnp.nan
        phys = self.PhysicalState(
            u_d_buffer=obs[6],
            u_q_buffer=obs[7],
            epsilon=jnp.arctan2(obs[5], obs[4]) / jnp.pi,
            i_d=obs[0],
            i_q=obs[1],
            torque=obs[3],
            omega_el=obs[2],
        )
        additions = self._pmsm_solver_additions(env_properties, phys)
        ref = self._nan_reference()
        with structures.copy_and_mutate(ref, validate=False) as new_ref:
            for pos, name in enumerate(self.control_state):
                setattr(new_ref, name, obs[8 + pos])
        norm_state = self.State(physical_state=phys, PRNGKey=subkey, additions=additions, reference=new_ref)
        return self.denormalize_state(norm_state, env_properties)

    def generate_truncated(self, system_state, env_properties):
        """Truncate when the normalized current magnitude exceeds 1."""
        state_norm = self.normalize_state(system_state, env_properties)
        i_d_norm = state_norm.physical_state.i_d
        i_q_norm = state_norm.physical_state.i_q
        i_s = jnp.sqrt(i_d_norm**2 + i_q_norm**2)
        return i_s[None] > 1

    def generate_terminated(self, system_state, reward, env_properties):
        """Terminal iff truncated (current limit violation)."""
        return self.generate_truncated(system_state, env_properties)

    @partial(jax.jit, static_argnums=0)
    def generate_reward(self, state, action, env_properties):
        """Current-tracking and/or torque-tracking reward depending on the
        configured ``control_state``."""
        state_norm = self.normalize_state(state, env_properties)
        reward = 0
        if "i_d" in self.control_state and "i_q" in self.control_state:
            reward += self.current_reward_func(
                state_norm.physical_state.i_d,
                state_norm.physical_state.i_q,
                state_norm.reference.i_d,
                state_norm.reference.i_q,
                0.85,
            )
        if "torque" in self.control_state:
            reward += self.torque_reward_func(
                state_norm.physical_state.i_d,
                state_norm.physical_state.i_q,
                state_norm.physical_state.torque,
                state_norm.reference.torque,
                1,
                0.85,
            )
        return jnp.array([reward])

    def current_reward_func(self, i_d, i_q, i_d_ref, i_q_ref, gamma):
        mse = 0.5 * (i_d - i_d_ref) ** 2 + 0.5 * (i_q - i_q_ref) ** 2
        return -1 * (mse * (1 - gamma))

    def torque_reward_func(self, i_d, i_q, torque, torque_ref, i_lim_multiplier, gamma):
        """Piecewise MTPA-shaped torque-tracking reward (reference
        ``pmsm_env.py:1014-1037``)."""
        i_s = jnp.sqrt(i_d**2 + i_q**2)
        i_n = 1 / i_lim_multiplier
        i_d_plus = 0.2 * i_n
        torque_tol = 0.01
        rew = jnp.zeros_like(torque_ref)
        rew = jnp.where(i_s > 1, -1 * jnp.abs(i_s), rew)
        rew = jnp.where((i_s < 1.0) & (i_s > i_n), 0.5 * (1 - (i_s - i_n) / (1 - i_n)) - 1, rew)
        rew = jnp.where(
            (i_s < i_n) & (i_d > i_d_plus),
            -0.5 * ((i_d - i_d_plus) / (i_n - i_d_plus)),
            rew,
        )
        rew = jnp.where(
            (i_s < i_n) & (i_d < i_d_plus) & (jnp.abs(torque - torque_ref) > torque_tol),
            0.5 * (1 - jnp.abs((torque_ref - torque) / 2)),
            rew,
        )
        rew = jnp.where(
            (i_s < i_n) & (i_d < i_d_plus) & (jnp.abs(torque - torque_ref) < torque_tol),
            1 - 0.5 * i_s,
            rew,
        )
        return rew * (1 - gamma)
