"""Unit tests for the pytree-dataclass machinery and the gym-like spaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exciting_environments_tpu.core import structures
from exciting_environments_tpu.core.spaces import Box
from exciting_environments_tpu.core.structures import copy_and_mutate, pytree_dataclass, replace


@pytree_dataclass
class Inner:
    a: jax.Array
    b: jax.Array


@pytree_dataclass
class Outer:
    inner: Inner
    flag: bool
    items: tuple


def test_flatten_order_and_roundtrip():
    o = Outer(inner=Inner(a=1.0, b=2.0), flag=True, items=(3.0, 4.0))
    leaves, treedef = jax.tree_util.tree_flatten(o)
    assert leaves == [1.0, 2.0, True, 3.0, 4.0]  # declaration order
    o2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert o2.inner.a == 1.0 and o2.items == (3.0, 4.0)


def test_treedef_equality_across_instances():
    t1 = jax.tree_util.tree_structure(Outer(Inner(1, 2), False, (0,)))
    t2 = jax.tree_util.tree_structure(Outer(Inner(9, 9), True, (5,)))
    assert t1 == t2


def test_copy_and_mutate_no_aliasing():
    o = Outer(inner=Inner(a=1.0, b=2.0), flag=True, items=(3.0,))
    with copy_and_mutate(o) as o2:
        o2.inner.a = 99.0
        o2.flag = False
    assert o.inner.a == 1.0 and o.flag is True
    assert o2.inner.a == 99.0 and o2.flag is False


def test_replace():
    o = Outer(inner=Inner(a=1.0, b=2.0), flag=True, items=())
    o2 = replace(o, flag=False)
    assert o2.flag is False and o.flag is True
    with pytest.raises(AttributeError):
        replace(o, nope=1)


def test_vmap_and_jit_through_dataclass():
    @jax.jit
    def f(o):
        return replace(o, inner=Inner(a=o.inner.a * 2, b=o.inner.b + 1))

    o = Outer(inner=Inner(a=jnp.arange(3.0), b=jnp.zeros(3)), flag=True, items=())
    out = f(o)
    np.testing.assert_array_equal(np.asarray(out.inner.a), [0.0, 2.0, 4.0])

    batched = jax.vmap(lambda x: Inner(a=x * 2, b=x))(jnp.arange(4.0))
    assert batched.a.shape == (4,)


def test_key_paths_use_dict_keys():
    # DictKey rendering is load-bearing for the TPU runtime (see structures.py)
    o = Inner(a=1.0, b=2.0)
    paths = [jax.tree_util.keystr(kp) for kp, _ in jax.tree_util.tree_leaves_with_path(o)]
    assert paths == ["['a']", "['b']"]


def test_box_space():
    box = Box(low=-1.0, high=2.0, shape=(3,))
    sample = box.sample(jax.random.PRNGKey(0))
    assert sample.shape == (3,)
    assert bool(box.contains(sample))
    assert not bool(box.contains(jnp.array([5.0, 0.0, 0.0])))
