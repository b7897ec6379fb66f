"""In-house fixed-step ODE solvers with an explicit ``init``/``step`` carry protocol.

The reference framework delegates integration to ``diffrax`` in two modes
(see ``/root/reference/exciting_environments/pendulum/pendulum_env.py:178-184``
and ``:226-235``):

* *stateful single step*: ``solver.init(term, t0, t1, y0, args)`` produces a
  solver carry which is threaded through subsequent
  ``solver.step(term, t0, t1, y0, args, carry)`` calls, and
* *trajectory solve*: ``diffeqsolve`` with a constant step size and save
  points on a uniform grid.

diffrax is not available on this stack, so this module re-implements the same
protocol natively on top of ``jax.numpy``.  The environment runtime builds its
``lax.scan`` trajectory engine (``ops/rollout.py``) out of the very same
``step`` function, which guarantees the documented step/sim_ahead
equivalence for one-stage solvers (reference ``core_env.py:435-439``).

All solvers operate on *pytree* states (the environments use tuples of
scalars, which vmap/shard_map extend to tuples of batched arrays) and receive
the vector field as a plain function ``f(t, y, args) -> dy`` — on TPU this
keeps the whole step a single fused XLA/VPU computation with no host
callbacks and no dynamic shapes.

FSAL ("first same as last") solvers such as Tsit5/Dopri5 expose the usual
``init``/``step`` carry protocol: ``init`` evaluates the first stage, and the
carry returned by ``step`` holds ``f`` at ``(t1, y1)`` under the *current*
vector field.  That carry is only valid for a following step with the SAME
vector field (e.g. inside ``lax.scan`` over a fixed action sequence);
step-mode environment stepping re-``init``s per step because the action —
and hence the field — changes between calls (matching the reference's net
behavior: its cond re-inits active states every step, and diffrax's internal
first-step flag rescues the post-reset NaN dummy).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _weighted_increment(y0, h, ks, coeffs):
    """Compute ``y0 + h * sum_i coeffs[i] * ks[i]`` elementwise over a pytree.

    Terms with a zero coefficient are skipped and unit coefficients are not
    multiplied, so the one-stage Euler path performs exactly ``y + h * f`` —
    bit-identical to the reference's diffrax-Euler arithmetic, which the
    golden-file regression tests pin to ~1e-8 absolute over 10,000 steps.
    """
    terms = [(c, k) for c, k in zip(coeffs, ks) if c != 0.0]
    if not terms:
        return y0

    def combine(y, *kleaves):
        acc = None
        for (c, _), k in zip(terms, kleaves):
            t = k if c == 1.0 else c * k
            acc = t if acc is None else acc + t
        return y + h * acc

    return jax.tree_util.tree_map(combine, y0, *[k for _, k in terms])


class ODESolver:
    """Base class: fixed-step solver with a diffrax-style carry protocol."""

    #: number of intermediate derivative evaluations per step
    num_stages: int = 1
    #: classical order of accuracy
    order: int = 1
    #: whether the last stage equals the next step's first stage
    fsal: bool = False

    def init(self, f: Callable, t0, t1, y0, args):
        """Create the initial solver carry for integrating from ``(t0, y0)``."""
        raise NotImplementedError

    def step(self, f: Callable, t0, t1, y0, args, carry, dt=None):
        """Advance one step over ``[t0, t1]``; returns ``(y1, new_carry)``.

        ``dt`` optionally overrides the step size (otherwise ``t1 - t0``):
        trajectory engines pass the exact grid spacing so that ``fl(t + h) - t``
        rounding cannot perturb the step.
        """
        raise NotImplementedError

    def __repr__(self):  # pragma: no cover - cosmetic
        return f"{type(self).__name__}()"


class ExplicitRungeKutta(ODESolver):
    """Generic explicit Runge-Kutta method defined by a Butcher tableau.

    ``a`` is the strictly lower-triangular stage matrix given as one row per
    stage after the first, ``b`` the output weights, ``c`` the stage times.
    If ``fsal`` is set, the final stage must satisfy ``c[-1] == 1`` and
    ``a[-1] == b[:-1]`` so that the last derivative evaluation is the first
    stage of the following step.
    """

    a: Sequence[Sequence[float]] = ()
    b: Sequence[float] = (1.0,)
    c: Sequence[float] = (0.0,)

    def __init__(self):
        self.num_stages = len(self.b)

    @property
    def one_stage(self) -> bool:
        """Structurally one-stage with unit weight — the exact ``y + h*f``
        Euler update.  This is the gate for Euler–Maruyama stochastic
        semantics; compared structurally (length + value) so a tableau
        expressing ``b`` as a list/ndarray is classified identically to the
        canonical ``(1.0,)`` tuple."""
        return len(self.b) == 1 and float(self.b[0]) == 1.0

    def init(self, f, t0, t1, y0, args):
        if self.fsal:
            return f(t0, y0, args)
        return None

    def step(self, f, t0, t1, y0, args, carry, dt=None):
        h = (t1 - t0) if dt is None else dt
        if self.fsal:
            k1 = carry
        else:
            k1 = f(t0, y0, args)
        ks = [k1]
        for i, row in enumerate(self.a):
            ti = t0 if self.c[i + 1] == 0.0 else t0 + self.c[i + 1] * h
            yi = _weighted_increment(y0, h, ks, row)
            ks.append(f(ti, yi, args))
        if self.fsal:
            # a[-1] == b, therefore the last stage value *is* y1.
            y1 = _weighted_increment(y0, h, ks[:-1], self.b[:-1])
            new_carry = ks[-1]
        else:
            y1 = _weighted_increment(y0, h, ks, self.b)
            new_carry = None
        return y1, new_carry

    #: embedded lower-order error weights (``b - bhat``); None when the
    #: method has no embedded pair
    b_err = None

    def step_with_error(self, f, t0, t1, y0, args, dt=None, k0=None):
        """One step plus the embedded local error estimate.

        Returns ``(y1, err, k_end)`` with ``err = h * sum_i b_err[i] * k_i``
        — the difference between the solution and its embedded lower-order
        companion — and ``k_end`` the final stage, used by the adaptive
        controller (:mod:`exciting_environments_tpu.ops.adaptive`).  For
        FSAL methods ``k_end = f(t0 + h, y1)``, so an accepted step's
        ``k_end`` can be passed back as ``k0`` (the first stage) of the next
        step, saving one vector-field evaluation per accepted step.
        """
        if self.b_err is None:
            raise ValueError(f"{type(self).__name__} has no embedded error estimate")
        h = (t1 - t0) if dt is None else dt
        ks = [f(t0, y0, args) if k0 is None else k0]
        for i, row in enumerate(self.a):
            ti = t0 if self.c[i + 1] == 0.0 else t0 + self.c[i + 1] * h
            yi = _weighted_increment(y0, h, ks, row)
            ks.append(f(ti, yi, args))
        if self.fsal:
            y1 = _weighted_increment(y0, h, ks[:-1], self.b[:-1])
        else:
            y1 = _weighted_increment(y0, h, ks, self.b)
        zero = jax.tree_util.tree_map(lambda leaf: leaf * 0.0, y0)
        err = _weighted_increment(zero, h, ks, self.b_err)
        return y1, err, ks[-1]


class Euler(ExplicitRungeKutta):
    """Explicit (forward) Euler — the reference's default solver
    (``core_env.py:41``); carry-free, one stage, ``y1 = y0 + h * f(t0, y0)``."""

    order = 1
    a = ()
    b = (1.0,)
    c = (0.0,)


class Midpoint(ExplicitRungeKutta):
    """Explicit midpoint rule (2nd order)."""

    order = 2
    a = ((0.5,),)
    b = (0.0, 1.0)
    c = (0.0, 0.5)


class Heun(ExplicitRungeKutta):
    """Heun's method / explicit trapezoidal rule (2nd order)."""

    order = 2
    a = ((1.0,),)
    b = (0.5, 0.5)
    c = (0.0, 1.0)


class RK4(ExplicitRungeKutta):
    """The classical 4th-order Runge-Kutta method."""

    order = 4
    a = ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
    b = (1 / 6, 1 / 3, 1 / 3, 1 / 6)
    c = (0.0, 0.5, 0.5, 1.0)


class Tsit5(ExplicitRungeKutta):
    """Tsitouras 5(4) — the higher-order solver showcased by the reference
    README (``README.md:53,78``).  FSAL, 7 stages, 5th order.

    Coefficients from Tsitouras, "Runge-Kutta pairs of order 5(4) satisfying
    only the first column simplifying assumption", 2011.
    """

    order = 5
    fsal = True
    c = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
    a = (
        (0.161,),
        (-0.008480655492356989, 0.335480655492357),
        (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
        (5.325864828439257, -11.748883564062828, 7.4955393428898365, -0.09249506636175525),
        (5.86145544294642, -12.92096931784711, 8.159367898576159, -0.071584973281401, -0.028269050394068383),
        (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742, -3.290069515436081, 2.324710524099774),
    )
    b = (
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
        0.0,
    )
    # embedded 4th-order error weights (b - bhat), standard Tsit5 values
    b_err = (
        -0.00178001105222577714,
        -0.0008164344596567469,
        0.007880878010261995,
        -0.1447110071732629,
        0.5823571654525552,
        -0.45808210592918697,
        0.015151515151515152,
    )


class Dopri5(ExplicitRungeKutta):
    """Dormand-Prince 5(4) (a.k.a. RK45 / ode45).  FSAL, 7 stages, 5th order."""

    order = 5
    fsal = True
    c = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
    a = (
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    )
    b = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
    # embedded 4th-order error weights (b - bhat), standard Dopri5 values
    b_err = (
        71 / 57600,
        0.0,
        -71 / 16695,
        71 / 1920,
        -17253 / 339200,
        22 / 525,
        -1 / 40,
    )


class ImplicitEuler(ODESolver):
    """Backward Euler with a fixed number of Newton iterations.

    Intended for stiff electrical dynamics (PMSM, SURVEY §7.5) where explicit
    steps force tiny ``tau``.  The Jacobian is obtained with ``jax.jacfwd``
    over the (small) flattened state, solved densely — states here have at
    most 7 entries, so the linear solve is negligible and stays on-chip.
    """

    order = 1
    num_stages = 1

    def __init__(self, newton_iters: int = 4):
        self.newton_iters = newton_iters

    def init(self, f, t0, t1, y0, args):
        return None

    def step(self, f, t0, t1, y0, args, carry, dt=None):
        h = (t1 - t0) if dt is None else dt
        leaves, treedef = jax.tree_util.tree_flatten(y0)
        y0_flat = jnp.stack([jnp.asarray(l) for l in leaves])

        def f_flat(y_flat):
            y = jax.tree_util.tree_unflatten(treedef, list(y_flat))
            dy = f(t1, y, args)
            return jnp.stack([jnp.asarray(l) for l in jax.tree_util.tree_leaves(dy)])

        def residual(y_flat):
            return y_flat - y0_flat - h * f_flat(y_flat)

        y = y0_flat + h * f_flat(y0_flat)  # explicit predictor
        for _ in range(self.newton_iters):
            jac = jax.jacfwd(residual)(y)
            y = y - jnp.linalg.solve(jac, residual(y))
        y1 = jax.tree_util.tree_unflatten(treedef, list(y))
        return y1, None


#: name -> solver class registry (used by config-level construction helpers)
SOLVER_REGISTRY = {
    "euler": Euler,
    "midpoint": Midpoint,
    "heun": Heun,
    "rk4": RK4,
    "tsit5": Tsit5,
    "dopri5": Dopri5,
    "implicit_euler": ImplicitEuler,
}


def make_solver(name_or_solver):
    """Accept an :class:`ODESolver` instance, a registry name, or any object
    whose class name matches a registry entry — so reference constructor
    calls like ``Pendulum(solver=diffrax.Tsit5())`` (reference
    ``pendulum_env.py:60``) work unchanged after swapping the import."""
    if isinstance(name_or_solver, ODESolver):
        return name_or_solver
    key = str(name_or_solver).lower()
    if key not in SOLVER_REGISTRY and not isinstance(name_or_solver, str):
        key = type(name_or_solver).__name__.lower()
        key = {"impliciteuler": "implicit_euler"}.get(key, key)
    if key not in SOLVER_REGISTRY:
        raise ValueError(
            f"unknown solver {name_or_solver!r}; known names: {sorted(SOLVER_REGISTRY)}"
        )
    return SOLVER_REGISTRY[key]()
