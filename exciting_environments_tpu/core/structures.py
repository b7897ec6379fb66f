"""In-house pytree dataclass machinery (replaces the reference's `jax_dataclasses` dependency).

The reference framework builds every state/parameter container on
``jax_dataclasses`` (``jdc.pytree_dataclass``, ``jdc.copy_and_mutate``,
``jdc.replace``; see e.g. ``/root/reference/exciting_environments/core_env.py:60``
and ``pendulum/pendulum_env.py:189-193``).  That package is not part of this
TPU stack, so this module provides a minimal, dependency-free equivalent with
the same calling conventions:

* :func:`pytree_dataclass` — class decorator that turns a plain annotated class
  into a ``dataclasses.dataclass`` registered as a JAX pytree node (children =
  fields in declaration order, no aux data).
* :func:`copy_and_mutate` — context manager yielding a structurally independent
  copy that may be mutated field-by-field; nested pytree dataclasses are copied
  recursively so mutation never aliases the source object.
* :func:`replace` — functional field replacement.
* :func:`is_dataclass` — predicate used by the in-axes inference logic.

Design notes (TPU):  flatten/unflatten avoid ``__init__`` (``object.__new__`` +
``setattr``) so tracing through vmap/scan/pjit never re-runs user constructors,
and the treedef carries no aux data, which keeps ``tree_structure`` comparisons
(pinned by the reference's contract tests) purely structural.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax


def pytree_dataclass(cls=None, **kwargs):
    """Decorate ``cls`` as a mutable dataclass registered as a JAX pytree node.

    Children are the dataclass fields in declaration order; there is no static
    aux data, so two instances of the same class always share a treedef.
    """

    def wrap(c):
        c = dataclasses.dataclass(eq=False, **kwargs)(c)
        field_names = tuple(f.name for f in dataclasses.fields(c))

        def flatten_with_keys(obj):
            # DictKey (not GetAttrKey): key strings then render as
            # result['physical_state']['theta'] instead of
            # result.physical_state.theta in the lowered module's
            # jax.result_info metadata.  The axon TPU remote-compile service
            # rejects dotted result names with a runtime UNIMPLEMENTED error,
            # while bracketed names work; semantically both address the same
            # dataclass field.
            children = tuple(
                (jax.tree_util.DictKey(name), getattr(obj, name)) for name in field_names
            )
            return children, None

        def flatten(obj):
            return tuple(getattr(obj, name) for name in field_names), None

        def unflatten(_, children):
            obj = object.__new__(c)
            for name, value in zip(field_names, children):
                object.__setattr__(obj, name, value)
            return obj

        jax.tree_util.register_pytree_with_keys(c, flatten_with_keys, unflatten, flatten)
        c.__pytree_fields__ = field_names
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def is_dataclass(obj) -> bool:
    """True for pytree-dataclass *instances* (mirrors ``jdc.is_dataclass`` usage)."""
    return dataclasses.is_dataclass(obj) and not isinstance(obj, type)


def _copy_tree(obj):
    """Recursively copy dataclass nodes (and list/dict/tuple containers).

    Array and scalar leaves are immutable under JAX, so they are shared; every
    *container* level is fresh, which makes in-place ``setattr`` mutation of the
    copy safe.
    """
    if is_dataclass(obj):
        new = object.__new__(type(obj))
        for f in dataclasses.fields(obj):
            object.__setattr__(new, f.name, _copy_tree(getattr(obj, f.name)))
        return new
    if isinstance(obj, tuple):
        return tuple(_copy_tree(v) for v in obj)
    if isinstance(obj, list):
        return [_copy_tree(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _copy_tree(v) for k, v in obj.items()}
    return obj


@contextmanager
def copy_and_mutate(obj, validate: bool = True):
    """Yield a deep (container-level) copy of ``obj`` for field mutation.

    Drop-in for ``jdc.copy_and_mutate`` as used by the reference runtime
    (``core_env.py:305``, ``pendulum_env.py:189``).  ``validate`` is accepted
    for signature compatibility; this implementation performs no shape/type
    validation — correctness is enforced by the framework's own trace-time
    assertions instead.
    """
    del validate
    copy = _copy_tree(obj)
    yield copy


def replace(obj, **changes):
    """Functional field replacement for pytree dataclasses (``jdc.replace``)."""
    new = _copy_tree(obj)
    for name, value in changes.items():
        if not hasattr(new, name):
            raise AttributeError(f"{type(obj).__name__} has no field {name!r}")
        object.__setattr__(new, name, value)
    return new


def fields(obj):
    """Re-export of :func:`dataclasses.fields` for convenience."""
    return dataclasses.fields(obj)
