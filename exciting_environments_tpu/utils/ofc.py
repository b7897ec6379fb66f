"""Output-feedback control: stochastic plant + EKF belief + MPPI planning,
composed into ONE on-device program.

The subsystems this framework adds around the reference's simulator —
stochastic simulation (``process_noise`` / ``observation_noise``), state
estimation (:mod:`~exciting_environments_tpu.utils.estimate`), and planning
(:mod:`~exciting_environments_tpu.utils.mpc`) — exist to be composed: a real
controller never sees the plant state, only noisy partial measurements.
:func:`run_output_feedback_mppi` closes that loop end-to-end:

    belief --MPPI plan--> action --noisy plant step--> measurement --EKF--> belief

Every control step re-plans from the *belief mean* (reconstructed into a
full env state through the observation↔state bijection), applies the first
action to the stochastic plant, and assimilates the resulting noisy partial
measurement with one EKF predict/update on the model's own linearization.
The whole ``n_steps`` loop — candidate sweeps, plant stepping, Jacobian
re-linearizations — is a single jitted ``lax.scan``: one device dispatch,
B independent plant/observer/controller triples in parallel.

:func:`run_output_feedback_controller` drives the identical composition
with an explicit analytic control LAW instead of a planner (PI cascades,
LQR gains, the sensorless field-oriented drive control of
:mod:`~exciting_environments_tpu.utils.foc`) — one law evaluation per
control step in place of the candidate sweep.

Plant/model separation is explicit (the standard MPC framing): ``plant`` is
the environment being controlled (typically noise-configured), ``model`` is
the deterministic twin the planner and filter reason with — pass the same
env for both only if it is deterministic.  Model-mismatch robustness studies
fall out naturally: give the model different ``static_params``.

No reference counterpart (the reference ships neither noise, observers, nor
planners).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from exciting_environments_tpu.utils import episodes, mpc
from exciting_environments_tpu.utils.estimate import (
    _ekf_core,
    _initial_belief,
    _make_dynamics,
    _nll_term,
    _phys_names,
    _resolve_setup,
)

__all__ = ["OFCResult", "run_output_feedback_mppi", "run_output_feedback_controller"]


class OFCResult(NamedTuple):
    """Outcome of :func:`run_output_feedback_mppi`.

    ``observations``: the noisy measurements the controller actually saw,
    ``(B, n_steps, obs_dim)``.  ``actions``: applied actions
    ``(B, n_steps, action_dim)``.  ``rewards``: the PLANT's true rewards per
    step ``(B, n_steps)`` (scored on the true state — the controller never
    sees it).  ``belief_means`` / ``belief_covs``: the EKF posterior after
    each step, ``(B, n_steps, n_phys)`` / ``(B, n_steps, n_phys, n_phys)``.
    ``nll``: innovation negative log likelihood ``(B,)``.  ``final_state``:
    true plant state after the last step.  ``plan``: final shifted plan.
    """

    observations: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    belief_means: jnp.ndarray
    belief_covs: jnp.ndarray
    nll: jnp.ndarray
    final_state: object
    plan: jnp.ndarray


def _ofc_setup(plant, model, state, measured_fields, process_std,
               measurement_std, x0, P0, dtype):
    """Shared plant/model validation + EKF/bijection construction for the
    output-feedback runners.  Returns
    ``(belief_to_state, ekf_step_b, x_b, P_b, zidx)``."""
    if plant.batch_size != model.batch_size or plant.action_dim != model.action_dim:
        raise ValueError(
            "plant and model must agree on batch_size/action_dim, got "
            f"({plant.batch_size}, {plant.action_dim}) vs "
            f"({model.batch_size}, {model.action_dim})"
        )
    # the EKF scales Q by sqrt(model.tau) and descales measurements with the
    # model's normalization spans; a twin on a different grid or band would
    # run silently miscalibrated — mismatch studies should vary static_params
    if float(plant.tau) != float(model.tau):
        raise ValueError(f"plant.tau {plant.tau} != model.tau {model.tau}")
    if _phys_names(plant) != _phys_names(model) or list(plant.control_state) != list(model.control_state):
        raise ValueError(
            "plant and model must share the physical-state layout and "
            "control_state (the observation<->belief bijection relies on it)"
        )
    import numpy as _np

    for which in ("physical_normalizations", "action_normalizations"):
        p_l = jax.tree_util.tree_leaves(getattr(plant.env_properties, which))
        m_l = jax.tree_util.tree_leaves(getattr(model.env_properties, which))
        if len(p_l) != len(m_l) or any(
            not _np.array_equal(_np.asarray(a), _np.asarray(b)) for a, b in zip(p_l, m_l)
        ):
            raise ValueError(
                f"plant and model disagree on {which} — measurements would be "
                "descaled on the wrong normalized band"
            )
    if getattr(model, "_has_noise", False):
        raise ValueError(
            "model must be the deterministic twin (its step is the planner's "
            "candidate dynamics and the EKF transition) — construct it without "
            "process_noise/observation_noise"
        )
    B = plant.batch_size
    props = model.env_properties
    names = _phys_names(model)
    n = len(names)
    # noise defaults come from the PLANT (the filter should model the
    # disturbances actually simulated); spans/periods from the model
    names_chk, _, midx, zidx, Q, R, periods = _resolve_setup(
        model, props,
        measured_fields,
        process_std if process_std is not None else getattr(plant, "_process_noise", None),
        measurement_std if measurement_std is not None else (
            {k: v for k, v in (getattr(plant, "_observation_noise", None) or {}).items()}
        ),
    )
    assert names_chk == names
    f = _make_dynamics(model, props)
    jac = jax.jacobian(f, argnums=0)
    ekf = _ekf_core(f, jac, Q, R, midx, periods)
    if x0 is not None and jnp.ndim(x0) == 2:
        x_b = jnp.asarray(x0, dtype)
        if x_b.shape != (B, n):
            raise ValueError(f"batched x0 must have shape ({B}, {n}), got {x_b.shape}")
        _, P0_single = _initial_belief(None, P0, n, midx, R, dtype)
    else:
        x0_single, P0_single = _initial_belief(x0, P0, n, midx, R, dtype)
        x_b = jnp.broadcast_to(x0_single, (B, n))
    P_b = jnp.broadcast_to(P0_single, (B, n, n))
    # references are frozen along the loop (step never mutates them):
    # normalized ref columns appended to the belief vector for the bijection
    norm_state = model.normalize_state(state, props)
    if model.control_state:
        ref_b = jnp.stack(
            [getattr(norm_state.reference, nm) for nm in model.control_state], axis=-1
        )
    else:
        ref_b = jnp.zeros((B, 0), dtype)

    def belief_to_state(x_hat):
        # env hook (not the obs roundtrip): valid for any observation layout
        return jax.vmap(
            lambda x, r: model._state_from_normalized_physical(x, props, ref_norm=r)
        )(x_hat, ref_b)

    def ekf_step(x, P, u, z, nll):
        x_new, P_new, innov, S, *_ = ekf(x, P, u, z)
        return x_new, P_new, nll + _nll_term(innov, S)

    ekf_step_b = jax.vmap(ekf_step)
    return belief_to_state, ekf_step_b, x_b, P_b, zidx


def run_output_feedback_mppi(
    plant,
    model,
    state,
    n_steps: int,
    key=None,
    config: mpc.MPPIConfig = mpc.MPPIConfig(),
    *,
    measured_fields=None,
    process_std=None,
    measurement_std=None,
    x0=None,
    P0=None,
    cost_fn: Callable = None,
    plan=None,
) -> OFCResult:
    """Receding-horizon MPPI from noisy partial measurements.

    Args:
        plant: the batched environment being controlled — typically built
            with ``process_noise`` / ``observation_noise`` so measurements
            are corrupted and dynamics disturbed.
        model: the deterministic twin used by the planner (candidate
            rollouts) and the EKF (transition linearization).  Must share
            the plant's state/observation layout and ``batch_size``; scalar
            env properties (the filter restriction).
        state: batched initial PLANT state; with the default tracking cost
            its references must be populated
            (:func:`~exciting_environments_tpu.utils.episodes.reset_with_references`)
            and, for a noise-configured plant, its PRNG keys usable
            (``vmap_reset(jax.random.split(...))``).
        n_steps: control steps.
        key: PRNG key for the MPPI noise (default ``PRNGKey(0)``).
        config: :class:`~exciting_environments_tpu.utils.mpc.MPPIConfig`.
        measured_fields / process_std / measurement_std / x0 / P0: the EKF
            contract of :func:`~exciting_environments_tpu.utils.estimate.run_ekf`
            (noise dicts default to the PLANT's own configuration); ``x0``
            additionally accepts a per-instance ``(batch_size, n_phys)``
            array — e.g. seeded from an initial measurement, which shortens
            the belief burn-in the planner must act through.
        cost_fn: optional trajectory cost (see
            :func:`~exciting_environments_tpu.utils.mpc.mppi_plan`).
        plan: optional warm-start plan ``(B, horizon, action_dim)``.

    Returns:
        :class:`OFCResult`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    B, A, H = plant.batch_size, plant.action_dim, config.horizon
    dtype = jnp.result_type(float)
    if plan is None:
        plan = jnp.zeros((B, H, A), dtype)
    # setup first: its plant-vs-model batch/action check must fire before
    # _validate_plan, or a batch mismatch surfaces as a confusing
    # plan-shape error (the default plan is built with the PLANT's B)
    belief_to_state, ekf_step_b, x_b, P_b, zidx = _ofc_setup(
        plant, model, state, measured_fields, process_std, measurement_std,
        x0, P0, dtype,
    )
    mpc._validate_plan(model, config, plan, cost_fn, state)

    @jax.jit
    def run(plant_state, plan, x_b, P_b, key):
        def step_fn(carry, k):
            plant_state, plan, x_hat, P, nll = carry
            belief = belief_to_state(x_hat)
            plan = mpc._plan_core(model, belief, plan, k, config, cost_fn,
                                  use_fused=False, interpret=False)
            action = plan[:, 0]
            obs, plant_state, reward, _, _, _ = episodes.step_with_flags(
                plant, plant_state, action
            )
            z = obs[:, zidx]
            x_hat, P, nll = ekf_step_b(x_hat, P, action, z, nll)
            plan = jnp.concatenate([plan[:, 1:], plan[:, -1:]], axis=1)
            return (plant_state, plan, x_hat, P, nll), (obs, action, reward, x_hat, P)

        carry0 = (plant_state, plan, x_b, P_b, jnp.zeros((B,), dtype))
        (plant_state, plan, _, _, nll), (obs, act, rew, xs, Ps) = jax.lax.scan(
            step_fn, carry0, jax.random.split(key, n_steps)
        )
        return plant_state, plan, nll, obs, act, rew, xs, Ps

    plant_state, plan, nll, obs, act, rew, xs, Ps = run(state, plan, x_b, P_b, key)
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    return OFCResult(
        observations=swap(obs), actions=swap(act), rewards=swap(rew),
        belief_means=swap(xs), belief_covs=swap(Ps), nll=nll,
        final_state=plant_state, plan=plan,
    )


def run_output_feedback_controller(
    plant,
    model,
    state,
    n_steps: int,
    controller: Callable,
    *,
    controller_carry=None,
    measured_fields=None,
    process_std=None,
    measurement_std=None,
    x0=None,
    P0=None,
    return_trajectories: bool = True,
) -> OFCResult:
    """Closed-loop analytic control from noisy partial measurements.

    The sibling of :func:`run_output_feedback_mppi` for controllers that are
    explicit control LAWS rather than planners — PI/PID loops, LQR gains
    (e.g. from an :func:`~exciting_environments_tpu.utils.ilqr.ilqr_plan`
    solution), or field-oriented drive control
    (:func:`~exciting_environments_tpu.utils.foc.make_sensorless_foc`).  The
    composition is identical — the controller only ever sees the EKF belief,
    never the plant state:

        belief --controller--> action --noisy plant step--> measurement --EKF--> belief

    and the whole loop is ONE jitted ``lax.scan``: per control step the cost
    is a single controller evaluation + plant step + EKF predict/update
    (where the MPPI runner pays an (n_samples x horizon) candidate sweep),
    so analytic output-feedback fleets run orders of magnitude faster.

    Args:
        plant / model / state / measured_fields / process_std /
            measurement_std / x0 / P0: exactly the
            :func:`run_output_feedback_mppi` contract.
        n_steps: control steps.
        controller: ``controller(belief_state, carry, k) -> (action, carry)``
            — ``belief_state`` is the belief mean reconstructed as a full
            batched env state (physical units, references attached), ``k``
            is the step index, ``action`` the normalized ``(B, action_dim)``
            command, ``carry`` an arbitrary pytree threaded between steps
            (integrator states etc.; pass the initial value as
            ``controller_carry``).
        controller_carry: initial controller carry pytree (default ``None``).
        return_trajectories: with ``False`` the per-step histories are not
            materialized: ``observations``/``actions``/``belief_means``/
            ``belief_covs`` are ``None`` and ``rewards`` holds the
            horizon-mean reward per instance, shape ``(B,)`` (``nll``,
            ``final_state`` and the final carry are unaffected).  At fleet
            scale the belief-covariance history alone is
            ``B x n_steps x n_phys^2`` floats (17 GB at b=65,536 x 4,096
            steps on a 4-state env) — dropping it bounds device memory by
            the fleet size, not the horizon.

    Returns:
        :class:`OFCResult` (``plan`` holds the final controller carry).
    """
    dtype = jnp.result_type(float)
    belief_to_state, ekf_step_b, x_b, P_b, zidx = _ofc_setup(
        plant, model, state, measured_fields, process_std, measurement_std,
        x0, P0, dtype,
    )
    B = plant.batch_size

    @jax.jit
    def run(plant_state, x_b, P_b, carry0):
        def step_fn(scan_carry, k):
            plant_state, x_hat, P, nll, rew_sum, ctrl = scan_carry
            belief = belief_to_state(x_hat)
            action, ctrl = controller(belief, ctrl, k)
            action = jnp.clip(jnp.asarray(action, dtype), -1.0, 1.0)
            obs, plant_state, reward, _, _, _ = episodes.step_with_flags(
                plant, plant_state, action
            )
            z = obs[:, zidx]
            x_hat, P, nll = ekf_step_b(x_hat, P, action, z, nll)
            carry = (plant_state, x_hat, P, nll, rew_sum + reward, ctrl)
            if not return_trajectories:
                return carry, None
            return carry, (obs, action, reward, x_hat, P)

        zeros_b = jnp.zeros((B,), dtype)
        carry0 = (plant_state, x_b, P_b, zeros_b, zeros_b, carry0)
        (plant_state, _, _, nll, rew_sum, ctrl), ys = jax.lax.scan(
            step_fn, carry0, jnp.arange(n_steps)
        )
        return plant_state, ctrl, nll, rew_sum, ys

    plant_state, ctrl, nll, rew_sum, ys = run(state, x_b, P_b, controller_carry)
    if not return_trajectories:
        return OFCResult(
            observations=None, actions=None, rewards=rew_sum / n_steps,
            belief_means=None, belief_covs=None, nll=nll,
            final_state=plant_state, plan=ctrl,
        )
    obs, act, rew, xs, Ps = ys
    swap = lambda a: jnp.swapaxes(a, 0, 1)
    return OFCResult(
        observations=swap(obs), actions=swap(act), rewards=swap(rew),
        belief_means=swap(xs), belief_covs=swap(Ps), nll=nll,
        final_state=plant_state, plan=ctrl,
    )
