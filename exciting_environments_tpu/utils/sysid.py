"""Gradient-based system identification through the differentiable simulator.

The upstream project exists to *excite* systems so their parameters can be
identified, yet the reference framework ships no identification machinery —
it generates data and stops (``/root/reference/exciting_environments/core_env.py``
exposes the forward simulation only).  Because every rollout in this framework
is differentiable end-to-end, identification becomes first-class:

* :func:`fit_parameters` — recover physical ``StaticParams`` fields from an
  observed trajectory by multistart gradient descent.  All starts integrate
  simultaneously as one vmapped batch (the same heterogeneous per-batch
  parameter machinery the engine uses everywhere), so a 64-start fit costs
  one rollout program, not 64.
* :func:`fisher_information` — the Fisher information matrix and Cramér–Rao
  bound of the parameter estimate for a given excitation, via ``jax.jacfwd``
  through the rollout (forward mode: one pass per parameter, any horizon).
* :func:`optimize_excitation` — D/A-optimal input design: ascend
  ``log det FIM`` with respect to the excitation signal itself by nesting
  reverse-mode AD over the forward-mode trajectory sensitivities.  This is
  the published research topic of the reference's authors (optimal excitation
  for identification), expressed in ~30 lines because the simulator is a
  differentiable program.

All three operate on the reference ``sim_ahead`` semantics (ZOH actions,
observation grid decoupled from the action grid, ``core_env.py:435-486``), so
a trajectory recorded from the reference framework can be fitted directly.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core import structures


class FitResult(NamedTuple):
    """Outcome of :func:`fit_parameters`.

    ``params``: best-fit values, ``{name: float}``.  ``final_loss``: weighted
    MSE of the best start.  ``losses``: per-iteration best-across-starts loss,
    shape ``(iterations,)``.  ``start_params``: per-start best-iterate values,
    ``{name: (n_starts,)}``.  ``start_losses``: per-start best loss,
    ``(n_starts,)``.  ``best_start``: index of the winning start.
    """

    params: dict
    final_loss: float
    losses: jnp.ndarray
    start_params: dict
    start_losses: jnp.ndarray
    best_start: int


class FisherResult(NamedTuple):
    """``fim``: Fisher information matrix ``(P, P)``.  ``crlb``: Cramér–Rao
    lower bound ``inv(fim)`` ``(P, P)`` (minimum achievable estimator
    covariance).  ``names``: parameter order for both."""

    fim: jnp.ndarray
    crlb: jnp.ndarray
    names: tuple


class ExcitationResult(NamedTuple):
    """``actions``: optimized normalized excitation ``(n_steps, action_dim)``
    in ``[-1, 1]``.  ``objectives``: per-iteration design objective
    (``log det FIM`` for the D-criterion).  ``fisher``: :class:`FisherResult`
    at the optimized excitation."""

    actions: jnp.ndarray
    objectives: jnp.ndarray
    fisher: FisherResult


def _param_names(env):
    return tuple(f.name for f in dataclasses.fields(env.env_properties.static_params))


def _check_free(env, names):
    valid = _param_names(env)
    unknown = [n for n in names if n not in valid]
    if unknown:
        raise ValueError(f"unknown static parameter(s) {unknown}; {type(env).__name__} has {list(valid)}")
    for field in valid:
        leaf = getattr(env.env_properties.static_params, field)
        if hasattr(leaf, "ndim") and leaf.ndim > 0:
            raise ValueError(
                f"static parameter {field!r} is per-batch (shape {leaf.shape}); system "
                "identification needs a scalar-parameter env — construct one with scalar "
                "static_params (the fit supplies its own candidate batch)"
            )


def _props_with(env, names, values):
    """env_properties with the ``names`` static params replaced by ``values`` (len-P array)."""
    sp = structures.replace(
        env.env_properties.static_params, **{n: values[i] for i, n in enumerate(names)}
    )
    return structures.replace(env.env_properties, static_params=sp)


def _sim_obs(env, init_state, actions, props, obs_stepsize, action_stepsize):
    obs, _, _ = env.sim_ahead(init_state, actions, props, obs_stepsize, action_stepsize)
    return obs


def _resolve_grid(env, obs_stepsize, action_stepsize):
    action_stepsize = env.tau if action_stepsize is None else action_stepsize
    obs_stepsize = action_stepsize if obs_stepsize is None else obs_stepsize
    if obs_stepsize > action_stepsize:
        raise ValueError(
            f"obs_stepsize ({obs_stepsize}) must not exceed action_stepsize "
            f"({action_stepsize}) — sim_ahead samples observations on the finer grid"
        )
    ratio = action_stepsize / obs_stepsize
    if abs(ratio - round(ratio)) > 1e-9 * ratio:
        raise ValueError(
            f"action_stepsize/obs_stepsize must be an integer, got {ratio}"
        )
    return obs_stepsize, action_stepsize


def _obs_circular_periods(env):
    """Per-observation-column period in normalized units (0 = linear column).

    Wrapped-angle states live on a circle: a trajectory crossing the ±π seam
    one step earlier than the recording differs by a full revolution in
    linear MSE, which carves spurious local minima into the fit landscape.
    Columns backed by ``_angle_fields`` therefore get the circular metric
    ``d - period*round(d/period)``.  Normalization maps Δx to
    ``2Δx/(max-min)``, so a 2π physical period is ``4π/(max-min)``
    normalized.  Returns ``None`` when nothing is circular (or when the
    normalization bounds are per-batch arrays)."""
    fields = getattr(env, "_physical_field_names", None)
    angles = set(getattr(env, "_angle_fields", ()) or ())
    if not fields or not angles:
        return None
    periods = []
    try:
        for name in fields:
            if name in angles:
                norm = getattr(env.env_properties.physical_normalizations, name)
                periods.append(4.0 * float(jnp.pi) / (float(norm.max) - float(norm.min)))
            else:
                periods.append(0.0)
    except TypeError:  # per-batch normalization bounds: skip circular handling
        return None
    periods += [0.0] * len(getattr(env, "control_state", ()) or ())
    return jnp.asarray(periods)


def _default_loss_weights(env):
    """Zero out tracked-reference observation columns.

    ``sim_ahead`` tiles the initial state's reference through the trajectory
    and a default/recorded initial state carries NaN references
    (``core/env.py::_nan_reference``), so reference columns must not enter
    the fit residual — they describe the *controller's* target, not the
    plant.  Physical columns keep unit weight."""
    n_ref = len(getattr(env, "control_state", ()) or ())
    if n_ref == 0:
        return None
    n_obs = len(env.obs_description)
    return jnp.concatenate([jnp.ones(n_obs - n_ref), jnp.zeros(n_ref)])


def _resolve_init_state(env, init_state, observed_obs):
    if init_state is not None:
        return init_state
    return env.generate_state_from_observation(observed_obs[0], env.env_properties)


def _resolve_free_point(env, free, relative):
    """(names, values) evaluation point from a dict / name sequence."""
    names = tuple(free.keys()) if isinstance(free, dict) else tuple(free)
    _check_free(env, names)  # before any getattr/float so errors stay friendly
    if isinstance(free, dict):
        values = jnp.asarray([float(free[n]) for n in names])
    else:
        values = jnp.asarray(
            [float(getattr(env.env_properties.static_params, n)) for n in names]
        )
    if relative and not bool(jnp.all(values > 0)):
        raise ValueError(
            "relative=True differentiates w.r.t. log θ and needs strictly positive "
            "parameter values; pass relative=False for sign-indefinite parameters"
        )
    return names, values


def fit_parameters(
    env,
    actions,
    observed_obs,
    free: dict,
    *,
    init_state=None,
    obs_stepsize: float = None,
    action_stepsize: float = None,
    n_starts: int = 32,
    spread: float = 0.3,
    iterations: int = 300,
    optimizer=None,
    loss_weights=None,
    transform: str = "log",
    segment_length: int = 32,
    key=None,
) -> FitResult:
    """Fit physical parameters to an observed trajectory by gradient descent.

    Args:
        env: any environment exposing the reference ``sim_ahead`` protocol
            (all six models + user :class:`ClassicODEEnvironment` subclasses);
            its non-fitted static params are taken as ground truth.
        actions: normalized ZOH action sequence ``(n_action_steps, action_dim)``
            — the excitation that produced the data.
        observed_obs: recorded normalized observations
            ``(n_obs, obs_dim)`` on the ``obs_stepsize`` grid (the exact
            layout ``sim_ahead`` returns, reference ``core_env.py:470-480``).
        free: ``{param_name: initial_guess}`` for the parameters to identify;
            every other static param stays at the env's value.
        init_state: optional known-exact initial :class:`State`; when given
            it seeds the rollout (single shooting) or segment 0 (multiple
            shooting — later segments always re-seed from the recording).
            Defaults to ``generate_state_from_observation(observed_obs[0])``.
        obs_stepsize / action_stepsize: sampling grids (default ``env.tau``).
        n_starts: number of simultaneous multistart candidates (vmapped — one
            rollout program regardless of count).
        spread: multiplicative jitter of the initial guesses across starts
            (start 0 keeps the exact guess).
        iterations: optimizer steps (the whole loop is one ``lax.scan``).
        optimizer: optax transformation; default adam under a cosine-decayed
            step size (``optax.adam(cosine_decay_schedule(0.1, iterations))``
            — the decay is what takes the fit from ~1e-5 to ~1e-10 MSE).
        loss_weights: optional per-observation-column weights ``(obs_dim,)``;
            zero-weight columns are fully masked (NaN-safe).  Default: unit
            weight on physical columns, zero on tracked-reference columns
            (references describe the controller's target, not the plant, and
            are NaN for recordings seeded from a default initial state).
        transform: ``"log"`` (default) optimizes ``log θ`` — enforces
            positivity and makes steps scale-relative, the right frame for
            physical constants; ``"none"`` optimizes raw values.
        segment_length: multiple-shooting segment length in action steps.
            Long single-shot rollouts make the loss landscape razor-sharp
            (trajectory sensitivity grows exponentially with the horizon;
            wrapped angles add discontinuities), so the trajectory is split
            into segments each re-seeded from the *recorded* observation at
            its start (the observation↔state bijection the reference
            guarantees, ``core_env.py:173-187``) and all segments are fitted
            jointly — one extra vmap axis, same rollout program.  ``None``
            disables segmentation (pure single shooting; then ``init_state``
            seeds the rollout).  A trailing remainder of fewer than
            ``segment_length`` action steps is dropped.
        key: PRNG key for the multistart jitter.

    Returns:
        :class:`FitResult` with per-start best-iterate tracking (parameter
        landscapes of oscillatory systems are multimodal; the global best
        iterate across all starts and iterations wins).
    """
    import optax

    names = tuple(free.keys())
    _check_free(env, names)
    if transform not in ("log", "none"):
        raise ValueError(f"transform must be 'log' or 'none', got {transform!r}")
    obs_stepsize, action_stepsize = _resolve_grid(env, obs_stepsize, action_stepsize)
    observed_obs = jnp.asarray(observed_obs)
    actions = jnp.asarray(actions)
    if optimizer is None:
        optimizer = optax.adam(optax.cosine_decay_schedule(0.1, iterations))
    if key is None:
        key = jax.random.PRNGKey(0)

    guess = jnp.asarray([float(free[n]) for n in names])
    if transform == "log":
        if not bool(jnp.all(guess > 0)):
            raise ValueError(
                "transform='log' needs strictly positive initial guesses; "
                "pass transform='none' for sign-indefinite parameters"
            )
        to_theta, from_theta = jnp.log, jnp.exp
    else:
        to_theta = from_theta = lambda x: x

    jitter = jax.random.normal(key, (n_starts, len(names)))
    jitter = jitter.at[0].set(0.0)  # start 0 is the user's exact guess
    if transform == "log":
        theta0 = to_theta(guess)[None, :] + spread * jitter
    else:
        theta0 = guess[None, :] * (1.0 + spread * jitter)

    weights = jnp.asarray(loss_weights) if loss_weights is not None else _default_loss_weights(env)

    n_act = actions.shape[0]
    sub = int(round(action_stepsize / obs_stepsize))  # observations per action step
    expected_rows = n_act * sub + 1
    if observed_obs.shape[0] != expected_rows:
        raise ValueError(
            f"observed_obs has {observed_obs.shape[0]} rows but the grid implies "
            f"{expected_rows} (n_action_steps*action_stepsize/obs_stepsize + 1)"
        )

    if segment_length is None or segment_length >= n_act:
        init_state = _resolve_init_state(env, init_state, observed_obs)
        seg_targets = observed_obs[None]                   # (1, n_act*sub+1, obs)

        def sim_all(props):
            return _sim_obs(env, init_state, actions, props, obs_stepsize, action_stepsize)[None]
    else:
        n_seg = n_act // segment_length
        seg_actions = actions[: n_seg * segment_length].reshape(
            n_seg, segment_length, actions.shape[1]
        )
        row = jnp.arange(segment_length * sub + 1)
        idx = jnp.arange(n_seg)[:, None] * (segment_length * sub) + row[None, :]
        seg_targets = observed_obs[idx]                    # (n_seg, L*sub+1, obs)
        # seed every segment from the recorded observation at its start (vmap
        # materializes every State leaf batched, so plain in_axes=0 below)
        seg_states = jax.vmap(
            lambda o: env.generate_state_from_observation(o, env.env_properties)
        )(observed_obs[jnp.arange(n_seg) * (segment_length * sub)])
        if init_state is not None:
            # a user-supplied initial state is exact knowledge — segment 0
            # uses it instead of the (possibly noisy) recorded observation
            seg_states = jax.tree_util.tree_map(
                lambda b, s: b.at[0].set(s), seg_states, init_state
            )

        def sim_all(props):
            return jax.vmap(
                lambda s, a: _sim_obs(env, s, a, props, obs_stepsize, action_stepsize)
            )(seg_states, seg_actions)

    periods = _obs_circular_periods(env)

    def loss_one(theta):
        sim = sim_all(_props_with(env, names, from_theta(theta)))
        d = sim - seg_targets
        if periods is not None:
            d = jnp.where(periods > 0, d - periods * jnp.round(d / jnp.where(periods > 0, periods, 1.0)), d)
        err = d**2
        if weights is not None:
            # where (not multiply): zero weight must mask NaN reference
            # columns, and 0 * NaN is NaN
            err = jnp.where(weights == 0, 0.0, err * weights)
        return jnp.mean(err)

    def total_loss(theta):
        per_start = jax.vmap(loss_one)(theta)
        return per_start.sum(), per_start

    vg = jax.value_and_grad(total_loss, has_aux=True)
    opt_state = optimizer.init(theta0)

    def scan_step(carry, _):
        theta, opt_state, best_theta, best_loss = carry
        (_, per_start), grads = vg(theta)
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        improved = per_start < best_loss
        best_theta = jnp.where(improved[:, None], theta, best_theta)
        best_loss = jnp.where(improved, per_start, best_loss)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state, best_theta, best_loss), per_start.min()

    @jax.jit
    def run(theta0, opt_state):
        init = (theta0, opt_state, theta0, jnp.full((n_starts,), jnp.inf))
        (theta, _, best_theta, best_loss), history = jax.lax.scan(
            scan_step, init, None, length=iterations
        )
        # the post-update final iterate may beat every recorded pre-update one
        final = jax.vmap(loss_one)(theta)
        improved = final < best_loss
        best_theta = jnp.where(improved[:, None], theta, best_theta)
        best_loss = jnp.where(improved, final, best_loss)
        return best_theta, best_loss, history

    best_theta, best_loss, history = run(theta0, opt_state)
    best_values = jax.vmap(from_theta)(best_theta)
    best = int(jnp.argmin(best_loss))
    return FitResult(
        params={n: float(best_values[best, i]) for i, n in enumerate(names)},
        final_loss=float(best_loss[best]),
        losses=history,
        start_params={n: best_values[:, i] for i, n in enumerate(names)},
        start_losses=best_loss,
        best_start=best,
    )


def fisher_information(
    env,
    actions,
    free: dict | tuple | list,
    *,
    init_state=None,
    obs_stepsize: float = None,
    action_stepsize: float = None,
    noise_std: float = 1.0,
    relative: bool = True,
) -> FisherResult:
    """Fisher information of the parameter estimate under a given excitation.

    Assumes i.i.d. Gaussian observation noise of ``noise_std`` on the
    normalized observations: ``FIM = Jᵀ J / noise_std²`` where
    ``J = ∂(trajectory)/∂θ`` is computed by forward-mode AD (one extra
    rollout per parameter — O(P), independent of the horizon).

    Args:
        free: parameter names to include; a dict uses its values as the
            evaluation point, a tuple/list evaluates at the env's values.
        relative: differentiate w.r.t. ``log θ`` (sensitivity per *relative*
            parameter change — scale-free, the standard frame for comparing
            excitations across parameters of different magnitude).
        init_state: defaults to the env's deterministic initial state.

    Returns:
        :class:`FisherResult`; ``det(fim)`` is the D-optimality objective,
        ``diag(crlb)`` the per-parameter variance floor.
    """
    names, values = _resolve_free_point(env, free, relative)
    obs_stepsize, action_stepsize = _resolve_grid(env, obs_stepsize, action_stepsize)
    actions = jnp.asarray(actions)
    if init_state is None:
        init_state = env.init_state(env.env_properties)

    fim = _fim(env, names, values, init_state, actions, obs_stepsize, action_stepsize,
               noise_std, relative)
    return FisherResult(fim=fim, crlb=jnp.linalg.inv(fim), names=names)


def _fim(env, names, values, init_state, actions, obs_stepsize, action_stepsize,
         noise_std, relative):
    def traj(theta):
        vals = jnp.exp(theta) if relative else theta
        obs = _sim_obs(env, init_state, actions, _props_with(env, names, vals),
                       obs_stepsize, action_stepsize)
        return obs.reshape(-1)

    theta = jnp.log(values) if relative else values
    jac = jax.jacfwd(traj)(theta)  # (n_obs*obs_dim, P)
    return (jac.T @ jac) / (noise_std**2)


def optimize_excitation(
    env,
    free: dict | tuple | list,
    n_steps: int,
    *,
    init_actions=None,
    init_state=None,
    obs_stepsize: float = None,
    action_stepsize: float = None,
    noise_std: float = 1.0,
    relative: bool = True,
    iterations: int = 100,
    optimizer=None,
    criterion: str = "d",
    key=None,
) -> ExcitationResult:
    """Design a D/A-optimal excitation signal by backprop through the simulator.

    Ascends the information the trajectory carries about the parameters with
    respect to the *input signal itself*: reverse-mode AD over the
    forward-mode sensitivities ``J(u)``.  Actions are parametrized as
    ``tanh(u)`` so the optimized excitation respects the normalized actuator
    band ``[-1, 1]`` without projection steps.

    Args:
        free: parameters the excitation should inform (dict = evaluation
            point, tuple/list = env's values) — the nominal-parameter point
            around which the design is optimal (standard local design).
        n_steps: excitation length in action steps.
        init_actions: optional ``(n_steps, action_dim)`` warm start in
            ``(-1, 1)`` (e.g. an APRBS from :mod:`ops.signals`); defaults to
            small random noise.
        criterion: ``"d"`` maximizes ``log det FIM`` (joint information
            volume), ``"a"`` minimizes ``trace(CRLB)`` (sum of variance
            floors).
        optimizer / iterations / noise_std / relative: as in
            :func:`fit_parameters` / :func:`fisher_information`.

    Returns:
        :class:`ExcitationResult` with the optimized signal and the
        per-iteration objective trace (monotone-ish ascent; the final
        :class:`FisherResult` quantifies the gain).
    """
    import optax

    names, values = _resolve_free_point(env, free, relative)
    if criterion not in ("d", "a"):
        raise ValueError(f"criterion must be 'd' or 'a', got {criterion!r}")
    obs_stepsize, action_stepsize = _resolve_grid(env, obs_stepsize, action_stepsize)
    if init_state is None:
        init_state = env.init_state(env.env_properties)
    if optimizer is None:
        optimizer = optax.adam(0.05)
    if key is None:
        key = jax.random.PRNGKey(0)

    if init_actions is None:
        u0 = 0.1 * jax.random.normal(key, (n_steps, env.action_dim))
    else:
        init_actions = jnp.asarray(init_actions)
        if init_actions.shape != (n_steps, env.action_dim):
            raise ValueError(
                f"init_actions shape {init_actions.shape} does not match "
                f"(n_steps, action_dim) = {(n_steps, env.action_dim)}"
            )
        init_actions = jnp.clip(init_actions, -1 + 1e-6, 1 - 1e-6)
        u0 = jnp.arctanh(init_actions)

    eps = 1e-9  # keeps logdet/inv finite while the signal is still uninformative

    def objective(u):
        fim = _fim(env, names, values, init_state, jnp.tanh(u), obs_stepsize,
                   action_stepsize, noise_std, relative)
        fim = fim + eps * jnp.eye(fim.shape[0], dtype=fim.dtype)
        if criterion == "d":
            return jnp.linalg.slogdet(fim)[1]
        return -jnp.trace(jnp.linalg.inv(fim))

    vg = jax.value_and_grad(objective)
    opt_state = optimizer.init(u0)

    def scan_step(carry, _):
        u, opt_state = carry
        value, grad = vg(u)
        # ascent: optax transformations descend, so feed the negated gradient
        updates, opt_state = optimizer.update(jax.tree_util.tree_map(jnp.negative, grad),
                                              opt_state, u)
        return (optax.apply_updates(u, updates), opt_state), value

    @jax.jit
    def run(u0, opt_state):
        (u, _), history = jax.lax.scan(scan_step, (u0, opt_state), None, length=iterations)
        return u, history

    u, history = run(u0, opt_state)
    actions = jnp.tanh(u)
    fim = _fim(env, names, values, init_state, actions, obs_stepsize, action_stepsize,
               noise_std, relative)
    return ExcitationResult(
        actions=actions,
        objectives=history,
        fisher=FisherResult(fim=fim, crlb=jnp.linalg.inv(fim), names=names),
    )
