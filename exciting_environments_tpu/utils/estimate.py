"""State estimation (EKF / UKF observers) through the differentiable step.

The reference framework simulates and excites systems but ships no observer:
a user who wants the unmeasured states of a running plant (the classic
motor-control need — e.g. rotor speed from angle ticks) must leave the
framework.  Because every environment here exposes
its one-step transition as a differentiable program
(``CoreEnvironment._ode_solver_step`` — the same deterministic core the
stochastic ``process_noise`` simulation perturbs), Bayesian filtering becomes
a few lines of ``lax.scan``:

* :func:`run_ekf` — extended Kalman filter: the transition Jacobian is
  ``jax.jacobian`` of the env's own step, so the filter model *is* the
  simulator (no hand-linearization, any solver, any env).  Optional
  Rauch–Tung–Striebel smoothing (``smooth=True``).
* :func:`run_ukf` — unscented Kalman filter (scaled sigma points): no
  Jacobians, only forward steps, robust to strong nonlinearity.

Conventions (matching the stochastic-simulation constructor args of
:class:`~exciting_environments_tpu.core.classic.ClassicODEEnvironment`):

* The filter state is the **normalized** physical vector (the ``[-1, 1]``
  band every observation already lives in) — uniformly conditioned across
  fields of wildly different physical scale.
* ``process_std`` / ``measurement_std`` are ``{field: sigma}`` dicts in
  **physical units** (per sqrt-second for the process part), exactly the
  ``process_noise`` / ``observation_noise`` dicts the data-generating env was
  built with; they default to the env's own configured noise.  A filter given
  the generating env's dicts is matched to the simulated disturbances.
* Angle fields (``env._angle_fields``) are treated circularly: innovations
  and state corrections wrap on the field's normalized period, so tracking
  through the ±pi seam does not produce spurious full-turn jumps.

Both filters accept a single trajectory ``(T, obs_dim)`` or a batch
``(B, T, obs_dim)`` (vmapped internally), with observations aligned to
``actions``: ``observations[k]`` is the measurement taken *after* applying
``actions[k]`` — exactly the per-instance output of ``vmap_rollout`` /
:class:`~exciting_environments_tpu.wrappers.gym.GymWrapper` stepping.

Scope: any :class:`~exciting_environments_tpu.core.env.CoreEnvironment` whose
state reconstruction and measurement map the filter can resolve — classic
envs through the head-ordered default layout, and the PMSM drive through its
own hooks (``_state_from_normalized_physical`` builds the state directly,
``_obs_noise_layout`` maps the measurable ``i_d``/``i_q``/``omega_el``/
``torque`` observation columns; the filter transition includes the inverter
hexagon constraint and the deadtime buffer swap, so an EKF over a drive sees
exactly the applied voltages).  ``measured_fields`` must name measurable
observation columns — the PMSM's epsilon is cos/sin-encoded and not directly
measurable (it is reconstructed through the dynamics instead).

No reference equivalent (the reference's closest hook is the
observation↔state bijection ``generate_state_from_observation``,
``core_env.py:173-187``, which assumes every component is measured exactly).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


__all__ = ["FilterResult", "StationaryKalman", "run_ekf", "run_ukf", "stationary_kalman_gain"]


class FilterResult(NamedTuple):
    """Outcome of :func:`run_ekf` / :func:`run_ukf`.

    ``means``: filtered normalized state means, ``(T, n_phys)`` (batched:
    ``(B, T, n_phys)``) — entry ``k`` estimates the state after
    ``actions[k]``.  ``covs``: filtered covariances ``(T, n_phys, n_phys)``.
    ``nll``: total negative log marginal likelihood of the measurement
    sequence (scalar; batched: ``(B,)``) — the standard innovation-form NLL,
    usable directly as a noise-hyperparameter tuning objective.
    ``smoothed_means`` / ``smoothed_covs``: Rauch–Tung–Striebel smoothed
    estimates (``run_ekf(smooth=True)`` only, else ``None``).
    """

    means: jnp.ndarray
    covs: jnp.ndarray
    nll: jnp.ndarray
    smoothed_means: jnp.ndarray = None
    smoothed_covs: jnp.ndarray = None


# ----------------------------------------------------------------------
# shared plumbing
# ----------------------------------------------------------------------


def _phys_names(env) -> tuple:
    return tuple(f.name for f in dataclasses.fields(env.PhysicalState))


def _norm_span(env_properties, name):
    norm = getattr(env_properties.physical_normalizations, name)
    return norm.max - norm.min


def _as_scalar_span(env_properties, name):
    span = jnp.asarray(_norm_span(env_properties, name))
    if span.ndim != 0:
        raise ValueError(
            "filtering needs scalar normalizations (a single plant model); "
            f"field {name!r} has a per-batch normalization of shape {span.shape}"
        )
    return span


def _dynamics_fn(env):
    """``f(x_norm, action_norm, env_properties) -> x_norm'``: one
    deterministic env step in normalized coordinates, built from the env's
    own pieces (``_state_from_normalized_physical`` → ``_advance_state`` →
    ``normalize_state``).  Differentiable; bypasses the env's stochastic
    perturbations (the filter models those through Q/R).  The hooks carry
    any per-step actuation semantics — for the PMSM the transition includes
    the inverter hexagon constraint and the deadtime buffer swap, so the
    filter's prediction sees exactly the plant's applied voltages.  Shared
    by the filters here and the iLQR planner (which maps ``env_properties``
    per batch instance)."""
    names = _phys_names(env)

    def f(x_norm, action_norm, props):
        state = env._state_from_normalized_physical(x_norm, props)
        new_state = env._advance_state(state, action_norm, props)
        norm = env.normalize_state(new_state, props)
        return jnp.stack([getattr(norm.physical_state, n) for n in names])

    return f


def _make_dynamics(env, env_properties):
    """:func:`_dynamics_fn` closed over one set of properties."""
    f = _dynamics_fn(env)
    return lambda x, u: f(x, u, env_properties)


def _ekf_core(f, jac, Q, R, midx, periods):
    """One EKF predict/update in normalized coordinates (shared by
    :func:`run_ekf` and the output-feedback loop of
    :mod:`~exciting_environments_tpu.utils.ofc`).

    Returns ``step(x, P, u, z) -> (x_new, P_new, innov, S, x_pred, P_pred, F)``
    — Joseph-form covariance update, circular innovation and state
    correction on angle fields."""
    n = Q.shape[0]
    eye = jnp.eye(n)
    m_periods = periods[midx]

    def step(x, P, u, z):
        F = jac(x, u)
        x_pred = f(x, u)
        P_pred = F @ P @ F.T + Q
        innov = _wrap_diff(z - x_pred[midx], m_periods)
        S = P_pred[jnp.ix_(midx, midx)] + R
        K = jnp.linalg.solve(S.T, P_pred[:, midx].T).T
        x_new = x_pred + K @ innov
        x_new = jnp.where(periods > 0, x_pred + _wrap_diff(x_new - x_pred, periods), x_new)
        IKH = eye - jnp.zeros((n, n)).at[:, midx].set(K)
        P_new = IKH @ P_pred @ IKH.T + K @ R @ K.T
        P_new = 0.5 * (P_new + P_new.T)
        return x_new, P_new, innov, S, x_pred, P_pred, F

    return step


def _angle_periods(env, env_properties, names):
    """Normalized-unit circular period per field (``0`` = not an angle)."""
    periods = []
    for name in names:
        if name in getattr(env, "_angle_fields", ()):
            span = _as_scalar_span(env_properties, name)
            periods.append(2.0 * jnp.pi * 2.0 / span)
        else:
            periods.append(jnp.zeros(()))
    return jnp.stack(periods)


def _wrap_diff(d, periods):
    """Shortest circular representative of ``d`` where ``periods > 0``."""
    safe = jnp.where(periods > 0, periods, 1.0)
    return jnp.where(periods > 0, d - safe * jnp.round(d / safe), d)


def _std_dict_to_norm(env_properties, names, std, scale=1.0, what="std"):
    """``{field: sigma_physical}`` → normalized-band std vector ``(n,)``."""
    std = dict(std or {})
    unknown = set(std) - set(names)
    if unknown:
        raise ValueError(f"{what} names {sorted(unknown)} not in physical fields {names}")
    out = []
    for name in names:
        sigma = float(std.get(name, 0.0))
        if sigma < 0:
            raise ValueError(f"{what}[{name!r}] must be >= 0, got {sigma}")
        if sigma:
            out.append(scale * 2.0 * sigma / _as_scalar_span(env_properties, name))
        else:
            out.append(jnp.zeros(()))
    return jnp.stack(out)


def _resolve_setup(env, env_properties, measured_fields, process_std, measurement_std):
    # state reconstruction and measurement extraction go through the env's
    # own hooks (_state_from_normalized_physical / _obs_noise_layout), so any
    # CoreEnvironment with those — classic envs by the head-ordered default,
    # the PMSM by its cos/sin-aware overrides — filters
    if not hasattr(env, "_state_from_normalized_physical") or not hasattr(
        env, "_obs_noise_layout"
    ):
        raise TypeError(
            f"filtering needs a CoreEnvironment; got {type(env).__name__}"
        )
    # the dynamics closure captures env_properties; per-batch (axis-0) leaves
    # would silently broadcast a (batch,) array into each per-instance filter
    if any(ax == 0 for ax in jax.tree_util.tree_leaves(env.in_axes_env_properties)):
        raise ValueError(
            "filtering needs scalar env properties (one plant model per filter); "
            "this env carries per-batch (batch_size,) property leaves — construct "
            "a scalar-parameter twin for the filter model"
        )
    names = _phys_names(env)
    n = len(names)
    obs_columns = {name: col for col, name in env._obs_noise_layout}
    if measured_fields is None:
        # default: every directly-measurable observation column
        measured_fields = tuple(name for _col, name in env._obs_noise_layout)
    measured_fields = tuple(measured_fields)
    unknown = set(measured_fields) - set(obs_columns)
    if unknown:
        raise ValueError(
            f"measured_fields {sorted(unknown)} are not measurable observation "
            f"columns {sorted(obs_columns)}"
        )
    if not measured_fields:
        raise ValueError("measured_fields must name at least one observed component")
    midx = jnp.array([names.index(m) for m in measured_fields])
    zidx = jnp.array([obs_columns[m] for m in measured_fields])

    if process_std is None:
        process_std = getattr(env, "_process_noise", None) or {}
    if measurement_std is None:
        src = getattr(env, "_observation_noise", None) or {}
        measurement_std = {k: v for k, v in src.items() if k in measured_fields}

    sqrt_tau = float(env.tau) ** 0.5
    q_std = _std_dict_to_norm(env_properties, names, process_std, scale=sqrt_tau, what="process_std")
    r_std_full = _std_dict_to_norm(env_properties, names, measurement_std, what="measurement_std")
    r_std = r_std_full[midx]
    # a singular R makes the innovation solve ill-posed; floor it at a band
    # resolution far below any physical sensor (documented contract)
    r_std = jnp.maximum(r_std, 1e-6)
    Q = jnp.diag(q_std**2)
    R = jnp.diag(r_std**2)
    periods = _angle_periods(env, env_properties, names)
    return names, n, midx, zidx, Q, R, periods


def _initial_belief(x0, P0, n, midx, R, dtype):
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    else:
        x0 = jnp.asarray(x0, dtype)
        if x0.shape != (n,):
            raise ValueError(f"x0 must have shape ({n},), got {x0.shape}")
    if P0 is None:
        # measured components start at sensor accuracy, unmeasured at the
        # full normalized band
        p_diag = jnp.ones((n,))
        p_diag = p_diag.at[midx].set(jnp.maximum(jnp.diag(R), 1e-6))
        P0 = jnp.diag(p_diag)
    else:
        P0 = jnp.asarray(P0, dtype)
        if P0.shape == (n,):
            P0 = jnp.diag(P0)
        if P0.shape != (n, n):
            raise ValueError(f"P0 must have shape ({n},) or ({n}, {n}), got {P0.shape}")
    return x0, P0


def _check_traj(env, observations, actions, what):
    # one consistent float width end-to-end: Q/R/gains are built from the
    # env's normalization spans in the default float type, and a mixed-width
    # belief would fail lax.scan's carry-dtype invariance
    dtype = jnp.result_type(float)
    observations = jnp.asarray(observations).astype(dtype)
    actions = jnp.asarray(actions).astype(dtype)
    if observations.ndim not in (2, 3) or actions.ndim != observations.ndim:
        raise ValueError(
            f"{what} expects observations (T, obs_dim) with actions (T, action_dim) "
            f"or batched (B, T, ...), got {observations.shape} / {actions.shape}"
        )
    if observations.shape[:-1] != actions.shape[:-1]:
        raise ValueError(
            f"observations and actions disagree on (batch,) time shape: "
            f"{observations.shape[:-1]} vs {actions.shape[:-1]}"
        )
    if actions.shape[-1] != env.action_dim:
        raise ValueError(f"actions last dim must be {env.action_dim}, got {actions.shape[-1]}")
    n_phys = len(_phys_names(env))
    if observations.shape[-1] < n_phys:
        raise ValueError(
            f"observations last dim {observations.shape[-1]} is smaller than the "
            f"physical state dim {n_phys} — pass observations as produced by the env"
        )
    return observations, actions


def _nll_term(innov, S):
    chol = jnp.linalg.cholesky(S)
    alpha = jax.scipy.linalg.cho_solve((chol, True), innov)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    m = innov.shape[0]
    return 0.5 * (innov @ alpha + logdet + m * jnp.log(2.0 * jnp.pi))


# ----------------------------------------------------------------------
# EKF (+ RTS smoother)
# ----------------------------------------------------------------------


def run_ekf(
    env,
    observations,
    actions,
    *,
    measured_fields=None,
    process_std=None,
    measurement_std=None,
    x0=None,
    P0=None,
    smooth: bool = False,
) -> FilterResult:
    """Extended Kalman filter over the env's own step dynamics.

    Args:
        env: a :class:`~exciting_environments_tpu.core.env.CoreEnvironment` —
            any classic env, or the PMSM drive (any solver; the filter steps
            the deterministic transition, so a noise-configured env filters
            the very disturbances it simulates).
        observations: normalized observations ``(T, obs_dim)`` or batched
            ``(B, T, obs_dim)``; row ``k`` is measured after ``actions[k]``
            (``vmap_rollout`` alignment).  Only the ``measured_fields``
            columns are read.
        actions: normalized actions ``(T, action_dim)`` (or batched).
        measured_fields: physical fields actually observed (default: all).
            Unmeasured fields are reconstructed by the filter.
        process_std: ``{field: sigma}`` in physical units per sqrt-second
            (the env's ``process_noise`` convention); default: the env's own.
        measurement_std: ``{field: sigma}`` in physical units (the env's
            ``observation_noise`` convention); default: the env's own,
            floored at 1e-6 of the normalized band.
        x0: initial normalized state mean ``(n_phys,)`` (default zeros).
        P0: initial covariance, ``(n_phys,)`` diagonal or full matrix
            (default: sensor variance on measured fields, 1 elsewhere).
        smooth: additionally run the Rauch–Tung–Striebel backward pass.

    Returns:
        :class:`FilterResult` (smoothed fields populated iff ``smooth``).
    """
    env_properties = env.env_properties
    observations, actions = _check_traj(env, observations, actions, "run_ekf")
    names, n, midx, zidx, Q, R, periods = _resolve_setup(
        env, env_properties, measured_fields, process_std, measurement_std
    )
    f = _make_dynamics(env, env_properties)
    jac = jax.jacobian(f, argnums=0)
    x0, P0 = _initial_belief(x0, P0, n, midx, R, observations.dtype)
    ekf = _ekf_core(f, jac, Q, R, midx, periods)

    def step(carry, inp):
        x, P, nll = carry
        u, z = inp
        x_new, P_new, innov, S, x_pred, P_pred, F = ekf(x, P, u, z)
        nll = nll + _nll_term(innov, S)
        return (x_new, P_new, nll), (x_new, P_new, x_pred, P_pred, F)

    def single(obs_t, act_t):
        z_t = obs_t[:, zidx]
        (xT, PT, nll), (xs, Ps, x_preds, P_preds, Fs) = jax.lax.scan(
            step, (x0, P0, jnp.zeros(())), (act_t, z_t)
        )
        if not smooth:
            return FilterResult(means=xs, covs=Ps, nll=nll)

        def back(carry, inp):
            xs_next, Ps_next = carry
            x_f, P_f, x_pred_next, P_pred_next, F_next = inp
            C = jnp.linalg.solve(P_pred_next.T, (P_f @ F_next.T).T).T
            dx = _wrap_diff(xs_next - x_pred_next, periods)
            x_s = x_f + C @ dx
            x_s = jnp.where(periods > 0, x_f + _wrap_diff(x_s - x_f, periods), x_s)
            P_s = P_f + C @ (Ps_next - P_pred_next) @ C.T
            P_s = 0.5 * (P_s + P_s.T)
            return (x_s, P_s), (x_s, P_s)

        # smooth states 0..T-2 against their successors (T-1 is already the
        # smoothed terminal state): filtered k pairs with predicted k+1
        (_, _), (xs_s, Ps_s) = jax.lax.scan(
            back,
            (xT, PT),
            (xs[:-1], Ps[:-1], x_preds[1:], P_preds[1:], Fs[1:]),
            reverse=True,
        )
        xs_s = jnp.concatenate([xs_s, xT[None]], axis=0)
        Ps_s = jnp.concatenate([Ps_s, PT[None]], axis=0)
        return FilterResult(means=xs, covs=Ps, nll=nll, smoothed_means=xs_s, smoothed_covs=Ps_s)

    single = jax.jit(single)
    if observations.ndim == 3:
        return jax.vmap(single)(observations, actions)
    return single(observations, actions)


# ----------------------------------------------------------------------
# UKF
# ----------------------------------------------------------------------


def run_ukf(
    env,
    observations,
    actions,
    *,
    measured_fields=None,
    process_std=None,
    measurement_std=None,
    x0=None,
    P0=None,
    alpha: float = 0.5,
    beta: float = 2.0,
    kappa: float = 0.0,
) -> FilterResult:
    """Unscented Kalman filter (scaled sigma points, van der Merwe weights).

    Same contract as :func:`run_ekf` but derivative-free: only ``2n+1``
    forward env steps per filter step, no Jacobian — preferable when the
    step is strongly nonlinear over the posterior spread.  Sigma points
    propagated through wrapping dynamics are re-referenced to the central
    point's image (shortest circular representative) before the mean/cov
    reduction, so the seam at ±pi does not corrupt the statistics.
    """
    env_properties = env.env_properties
    observations, actions = _check_traj(env, observations, actions, "run_ukf")
    names, n, midx, zidx, Q, R, periods = _resolve_setup(
        env, env_properties, measured_fields, process_std, measurement_std
    )
    f = _make_dynamics(env, env_properties)
    f_batch = jax.vmap(f, in_axes=(0, None))
    x0, P0 = _initial_belief(x0, P0, n, midx, R, observations.dtype)

    lam = alpha**2 * (n + kappa) - n
    c = n + lam
    wm = jnp.concatenate([jnp.array([lam / c]), jnp.full((2 * n,), 0.5 / c)])
    wc = wm.at[0].add(1.0 - alpha**2 + beta)
    m_periods = periods[midx]

    def sigma_points(x, P):
        # jitter keeps the Cholesky factorizable when the filter has
        # collapsed a component to numerical zero variance
        chol = jnp.linalg.cholesky(P + 1e-12 * jnp.eye(n)) * jnp.sqrt(c)
        return jnp.concatenate([x[None], x[None] + chol.T, x[None] - chol.T], axis=0)

    def rereference(pts, center, per):
        return jnp.where(per[None] > 0, center[None] + _wrap_diff(pts - center[None], per[None]), pts)

    def step(carry, inp):
        x, P, nll = carry
        u, z = inp
        pts = sigma_points(x, P)
        pts_f = f_batch(pts, u)
        pts_f = rereference(pts_f, pts_f[0], periods)
        x_pred = wm @ pts_f
        dev = pts_f - x_pred[None]
        P_pred = (dev * wc[:, None]).T @ dev + Q
        z_pts = pts_f[:, midx]
        z_pred = x_pred[midx]
        z_dev = z_pts - z_pred[None]
        S = (z_dev * wc[:, None]).T @ z_dev + R
        Pxz = (dev * wc[:, None]).T @ z_dev
        K = jnp.linalg.solve(S.T, Pxz.T).T
        innov = _wrap_diff(z - z_pred, m_periods)
        x_new = x_pred + K @ innov
        x_new = jnp.where(periods > 0, x_pred + _wrap_diff(x_new - x_pred, periods), x_new)
        P_new = P_pred - K @ S @ K.T
        P_new = 0.5 * (P_new + P_new.T)
        nll = nll + _nll_term(innov, S)
        return (x_new, P_new, nll), (x_new, P_new)

    def single(obs_t, act_t):
        z_t = obs_t[:, zidx]
        (_, _, nll), (xs, Ps) = jax.lax.scan(step, (x0, P0, jnp.zeros(())), (act_t, z_t))
        return FilterResult(means=xs, covs=Ps, nll=nll)

    single = jax.jit(single)
    if observations.ndim == 3:
        return jax.vmap(single)(observations, actions)
    return single(observations, actions)


# ----------------------------------------------------------------------
# Stationary Kalman gain (linear envs)
# ----------------------------------------------------------------------


class StationaryKalman(NamedTuple):
    """Steady-state Kalman observer of a LINEAR environment, in normalized
    coordinates (see :func:`stationary_kalman_gain`).

    ``A``/``B``/``c``: the env's one-step transition ``x' = A x + B u + c``
    (``u`` the normalized action; ``c`` the affine offset, zero for the
    drive models).  ``K``: the converged predicted-form gain — correction
    ``x(t|t) = x(t|t-1) + K (z - x(t|t-1)[midx])``.  ``midx``: measured
    fields' indices into the physical state order; ``zidx``: their
    observation columns; ``names``: the field order; ``P``: the converged
    pre-measurement covariance (the Riccati fixed point).  All arrays are host
    NumPy float64 — compile-time constants a Pallas tile policy can close
    over (the kernels reject captured device arrays).
    """

    A: object
    B: object
    c: object
    K: object
    P: object
    midx: object
    zidx: object
    names: tuple


def stationary_kalman_gain(
    env,
    *,
    measured_fields=None,
    process_std=None,
    measurement_std=None,
    q_floor: float = 1e-8,
    max_iters: int = 200_000,
    tol: float = 1e-13,
) -> StationaryKalman:
    """Steady-state Kalman filter of a LINEAR environment.

    For a time-invariant linear plant the EKF's covariance recursion
    converges to a fixed point, so the per-step Riccati update of
    :func:`run_ekf` collapses to one constant gain matrix — an observer
    cheap enough to run INSIDE the fused closed-loop kernel as part of a
    stateful tile policy (see
    :func:`~exciting_environments_tpu.utils.foc.make_sensorless_foc_tile`):
    per step it is one ``K``-correction and one ``A x + B u`` predict,
    a handful of scalar-weighted FMAs on the tiles.

    The transition is extracted from the env's OWN step (``jax.jacobian``
    of the :func:`_dynamics_fn` hook chain at the origin — no
    hand-discretization; any explicit solver of a linear ODE is itself a
    linear map, so the matrices are exact), and LINEARITY IS VERIFIED: the
    step is evaluated at a random point and compared against the affine
    model; a nonlinear env raises.

    Args:
        env: a linear :class:`CoreEnvironment` (MassSpringDamper,
            InductionMachine, linear-magnetics drives...) with scalar
            normalizations; angle-wrapped fields are rejected (wrapping is
            nonlinear).
        measured_fields / process_std / measurement_std: as :func:`run_ekf`
            (defaults: every measurable column / the env's own noise
            config).
        q_floor: diagonal process-covariance floor (normalized units^2)
            keeping the Riccati iteration well-posed when the env carries
            no process noise; it doubles as the standard fictitious process
            noise guarding against model mismatch.
        max_iters / tol: fixed-point iteration budget — the recursion is
            the EKF's own covariance update, iterated to ``max |dP| < tol``.

    Returns:
        :class:`StationaryKalman` (host NumPy constants).
    """
    import numpy as np

    env_properties = env.env_properties
    names, n, midx, zidx, Q, R, periods = _resolve_setup(
        env, env_properties, measured_fields, process_std, measurement_std
    )
    if bool(jnp.any(periods > 0)):
        raise ValueError(
            "stationary_kalman_gain needs a linear env; angle-wrapped fields "
            f"{tuple(getattr(env, '_angle_fields', ()))} make the step nonlinear "
            "— use run_ekf / run_output_feedback_controller instead"
        )
    f = _make_dynamics(env, env_properties)
    x0 = jnp.zeros((n,), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    u0 = jnp.zeros((env.action_dim,), x0.dtype)
    A = np.asarray(jax.jacobian(f, argnums=0)(x0, u0), dtype=np.float64)
    B = np.asarray(jax.jacobian(f, argnums=1)(x0, u0), dtype=np.float64)
    c = np.asarray(f(x0, u0), dtype=np.float64)
    # verify linearity at a generic probe point (a nonlinear env would make
    # the constant-gain observer silently wrong)
    xp = jnp.asarray(np.linspace(0.13, 0.29, n), x0.dtype)
    up = jnp.asarray(np.linspace(-0.41, 0.37, env.action_dim), x0.dtype)
    probe = np.asarray(f(xp, up), dtype=np.float64)
    xp64 = np.asarray(xp, np.float64)
    affine = A @ xp64 + B @ np.asarray(up, np.float64) + c
    err = float(np.abs(probe - affine).max())
    # the observer predicts one step at a time, so the deviation that
    # matters is relative to the per-step INCREMENT, not the state scale
    scale = float(np.abs(affine - xp64).max()) + 1e-12
    if err > 1e-3 * scale:
        raise ValueError(
            f"stationary_kalman_gain needs a linear env: the step deviates "
            f"from its linearization by {err:.3e} ({err / scale:.1%} of the "
            "step increment) at a probe point — use run_ekf (per-step "
            "relinearization) instead"
        )

    midx_np = np.asarray(midx)
    Qn = np.asarray(Q, dtype=np.float64) + q_floor * np.eye(n)
    Rn = np.asarray(R, dtype=np.float64)
    # predicted-form Riccati fixed point: P is the PRE-measurement covariance
    P = Qn.copy()
    for _ in range(max_iters):
        S = P[np.ix_(midx_np, midx_np)] + Rn
        K = np.linalg.solve(S.T, P[:, midx_np].T).T
        P_upd = P - K @ P[midx_np, :]
        P_next = A @ P_upd @ A.T + Qn
        if float(np.abs(P_next - P).max()) < tol:
            P = P_next
            break
        P = P_next
    S = P[np.ix_(midx_np, midx_np)] + Rn
    K = np.linalg.solve(S.T, P[:, midx_np].T).T
    return StationaryKalman(
        A=A, B=B, c=c, K=K, P=P, midx=midx_np, zidx=np.asarray(zidx), names=names
    )
