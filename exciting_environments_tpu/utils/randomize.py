"""Domain randomization: per-batch sampling of static environment parameters.

The reference supports heterogeneous per-batch parameters — any
``StaticParams`` (or normalization) leaf may be a ``(batch_size,)`` array
(``/root/reference/exciting_environments/core_env.py:253-277``) — but leaves
*drawing* them entirely to the user.  On TPU that capability is the natural
vehicle for domain randomization: a fleet of tens of thousands of batch
entries, each simulating a differently-parameterized system, steps as one
SPMD program (vmap / fused Pallas kernels with per-batch tile operands /
mesh-sharded), so a policy trained on the fleet is trained on the whole
parameter distribution at zero extra dispatch cost.

This module provides the sampling layer:

* distribution specs — :class:`Uniform`, :class:`LogUniform`,
  :class:`Normal`, :class:`Choice`, a plain ``(low, high)`` tuple, or any
  ``callable(key, batch_size) -> (batch_size,)`` array;
* :func:`sample_static_params` — draw a constructor-ready params dict;
* :func:`randomize_env` — construct a randomized fleet in one call;
* :func:`resample_env_properties` — pure, jit-safe redraw of the randomized
  leaves of an existing env's ``EnvProperties``.

Resampling caveat (identical in the reference): the batched convenience
methods (``vmap_step`` & co.) read ``env.env_properties`` inside a jit whose
``self`` is static, so the property values are baked into the compiled
program as constants — **mutating ``env.env_properties`` after the first
call is silently ignored by the cached executable**.  To resample *inside* a
jitted program, pass the freshly drawn properties through the explicit-props
single-sample API instead::

    props = resample_env_properties(env, key, spec)      # inside jit is fine
    obs, state = jax.vmap(env.step, in_axes=(0, 0, env.in_axes_env_properties))(
        state, action, props
    )

(``env.step`` takes ``env_properties`` as a traced operand, reference
``core_env.py:394``, so no retrace occurs as long as the randomized fields
were ``(batch_size,)`` leaves at construction — which :func:`randomize_env`
guarantees.)
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from exciting_environments_tpu.core import structures

__all__ = [
    "Uniform",
    "LogUniform",
    "Normal",
    "Choice",
    "sample_field",
    "sample_static_params",
    "randomize_env",
    "resample_env_properties",
]


@dataclass(frozen=True)
class Uniform:
    """Uniform draw from ``[low, high)``."""

    low: float
    high: float

    def __call__(self, key, batch_size: int):
        return jax.random.uniform(
            key, (batch_size,), minval=self.low, maxval=self.high
        )


@dataclass(frozen=True)
class LogUniform:
    """Log-uniform draw from ``[low, high)`` — uniform in ``log(x)``, for
    positive parameters whose plausible range spans decades (spring
    constants, inductances, friction coefficients)."""

    low: float
    high: float

    def __post_init__(self):
        if not (0.0 < self.low < self.high):
            raise ValueError(
                f"LogUniform requires 0 < low < high, got ({self.low}, {self.high})"
            )

    def __call__(self, key, batch_size: int):
        lo, hi = jnp.log(self.low), jnp.log(self.high)
        return jnp.exp(jax.random.uniform(key, (batch_size,), minval=lo, maxval=hi))


@dataclass(frozen=True)
class Normal:
    """Gaussian draw ``mean + std * N(0, 1)``, optionally clipped to
    ``clip = (lo, hi)`` (clipping, not rejection — mass piles at the
    bounds, which is the usual domain-randomization convention and stays
    shape-static under jit)."""

    mean: float
    std: float
    clip: Optional[tuple] = None

    def __call__(self, key, batch_size: int):
        x = self.mean + self.std * jax.random.normal(key, (batch_size,))
        if self.clip is not None:
            x = jnp.clip(x, self.clip[0], self.clip[1])
        return x


@dataclass(frozen=True)
class Choice:
    """Draw from a finite set ``values`` with optional probabilities ``p``
    (e.g. a discrete set of manufactured component variants)."""

    values: Sequence[float]
    p: Optional[Sequence[float]] = None

    def __call__(self, key, batch_size: int):
        vals = jnp.asarray(self.values)
        p = None if self.p is None else jnp.asarray(self.p)
        return jax.random.choice(key, vals, (batch_size,), p=p)


SpecEntry = Union[Uniform, LogUniform, Normal, Choice, tuple, Callable]


def _as_sampler(entry: SpecEntry) -> Callable:
    if isinstance(entry, tuple):
        if len(entry) != 2:
            raise ValueError(
                f"tuple spec entries must be (low, high), got {entry!r}"
            )
        return Uniform(*entry)
    if callable(entry):
        return entry
    raise TypeError(
        "spec entries must be Uniform/LogUniform/Normal/Choice, a (low, high) "
        f"tuple, or callable(key, batch_size) -> array; got {type(entry)}"
    )


def sample_field(key, batch_size: int, entry: SpecEntry):
    """Draw one ``(batch_size,)`` parameter array from a spec entry."""
    out = jnp.asarray(_as_sampler(entry)(key, batch_size))
    if out.shape != (batch_size,):
        raise ValueError(
            f"sampler returned shape {out.shape}, expected ({batch_size},)"
        )
    return out


def _split_over_spec(key, spec: dict) -> dict:
    # deterministic per-field subkeys, order-independent: fold a stable hash
    # of the field name into the key, so adding/removing a field never shifts
    # the other fields' draws (and draws reproduce across processes —
    # Python's builtin str hash is salted per interpreter)
    return {
        name: jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)
        for name in spec
    }


def sample_static_params(key, batch_size: int, spec: dict, defaults: dict = None) -> dict:
    """Draw a constructor-ready static-params dict.

    Args:
        key: PRNG key.
        batch_size: fleet size — every randomized field becomes a
            ``(batch_size,)`` array (the engine's heterogeneous-batch form).
        spec: mapping ``field name -> distribution`` (see module docstring).
        defaults: base values for the non-randomized fields (e.g.
            ``EnvCls._default_static_params()``); drawn fields override.

    Returns:
        ``dict(defaults, **drawn)`` — pass as ``static_params=`` to an env
        constructor.
    """
    keys = _split_over_spec(key, spec)
    drawn = {name: sample_field(keys[name], batch_size, entry) for name, entry in spec.items()}
    # `is None` deliberately: an empty defaults dict still validates field
    # names (only the explicit defaults=None opts out, as the error says)
    out = dict(defaults) if defaults is not None else {}
    unknown = set(drawn) - set(out) if defaults is not None else set()
    if unknown:
        raise ValueError(
            f"spec fields {sorted(unknown)} are not in defaults "
            f"{sorted(out)} — typo, or pass defaults=None"
        )
    out.update(drawn)
    return out


def randomize_env(env_cls, key, spec: dict, batch_size: int = None, defaults: dict = None, **env_kwargs):
    """Construct an environment fleet with per-batch randomized parameters.

    Args:
        env_cls: a :class:`ClassicODEEnvironment` subclass, or a registry id
            string (``"Pendulum-v0"``).
        key: PRNG key.
        spec: ``field name -> distribution`` (see module docstring).
        batch_size: fleet size (default: the class default).
        defaults: base static params (default:
            ``env_cls._default_static_params()``).
        **env_kwargs: forwarded to the constructor (``tau``, ``solver``,
            ``control_state``, ...).

    Returns:
        The constructed env.  Every execution path that supports per-batch
        heterogeneous parameters — ``vmap_*``, the generic fused Pallas
        kernel, ``adaptive_rollout``, mesh sharding — works unchanged.
    """
    if isinstance(env_cls, str):
        from exciting_environments_tpu.core import registration

        # class resolution only — constructing a probe instance would pay
        # the full env setup (e.g. PMSM LUT preprocessing) for two
        # class-attribute reads
        env_cls = registration.resolve(env_cls)
    make = env_cls

    if batch_size is None:
        batch_size = getattr(env_cls, "_default_batch_size", None)
        if batch_size is None:
            raise ValueError("batch_size is required for this env class")
    if defaults is None:
        getter = getattr(env_cls, "_default_static_params", None)
        if getter is None:
            raise ValueError(
                f"{env_cls.__name__} has no _default_static_params; pass defaults="
            )
        defaults = getter()

    params = sample_static_params(key, batch_size, spec, defaults)
    return make(batch_size=batch_size, static_params=params, **env_kwargs)


def resample_env_properties(env, key, spec: dict):
    """Pure redraw of the randomized static-params leaves of
    ``env.env_properties`` — jit-safe (usable *inside* a training program).

    The returned ``EnvProperties`` has the same pytree structure and leaf
    shapes as ``env.env_properties`` (so it hits every existing jit cache
    when passed through the explicit-props API; see module docstring), with
    the ``spec``'d fields freshly drawn.

    Raises if a ``spec`` field was a scalar at construction — the in-axes
    tree (and any compiled program) would disagree with the new ``(B,)``
    leaf; construct the env through :func:`randomize_env` first.
    """
    params = env.env_properties.static_params
    names = {f.name for f in structures.fields(params)}
    B = env.batch_size
    keys = _split_over_spec(key, spec)
    changes = {}
    for name, entry in spec.items():
        if name not in names:
            raise ValueError(f"{type(params).__name__} has no field {name!r}")
        old = getattr(params, name)
        if not (hasattr(old, "shape") and getattr(old, "shape", ()) == (B,)):
            raise ValueError(
                f"field {name!r} is not a ({B},) per-batch leaf — construct the "
                "env with randomize_env/sample_static_params before resampling"
            )
        changes[name] = sample_field(keys[name], B, entry)
    return structures.replace(
        env.env_properties,
        static_params=structures.replace(params, **changes),
    )
