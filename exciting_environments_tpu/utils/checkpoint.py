"""Checkpoint / resume of simulation state.

The reference keeps checkpointing implicit: the full simulation state is an
explicit pytree returned to the caller, and ``sim_ahead`` returns
``last_state`` so simulation can continue from the end point (SURVEY §5).
This module makes it explicit and production-grade:

* :func:`save_state` / :func:`load_state` — persist any environment state
  pytree (works for sharded arrays too; gathered to host on save).  Uses
  `orbax-checkpoint` when available, otherwise a dependency-free ``.npz``
  format that stores the flattened leaves plus the treedef-describing key
  paths.
* :func:`save_sim_properties` / :func:`load_sim_properties` — re-exports of
  the JSON round-trip used by the golden-fixture tests.

State trees restored with :func:`load_state` are structurally identical to
the saved ones (validated), so ``vmap_step``/``vmap_sim_ahead`` can resume
directly.
"""

from __future__ import annotations

import os

import numpy as np
import jax

from exciting_environments_tpu.utils import (
    dump_sim_properties_to_json as save_sim_properties,
    load_sim_properties_from_json as load_sim_properties,
)

try:
    import orbax.checkpoint as ocp

    ORBAX_AVAILABLE = True
except Exception:  # pragma: no cover - depends on installed extras
    ocp = None
    ORBAX_AVAILABLE = False

__all__ = [
    "save_state",
    "load_state",
    "save_sim_properties",
    "load_sim_properties",
    "ORBAX_AVAILABLE",
]


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_state(state, path: str, use_orbax: bool = None):
    """Persist a state pytree to ``path``.

    Args:
        state: any pytree (environment ``State``, trajectory ``states``, ...).
        path: target directory (orbax) or ``.npz`` file (fallback).
        use_orbax: force the backend; default picks orbax when installed and
            ``path`` has no ``.npz`` suffix.
    """
    if use_orbax is None:
        use_orbax = ORBAX_AVAILABLE and not path.endswith(".npz")
    if use_orbax:
        with ocp.PyTreeCheckpointer() as ckptr:
            # force=True: overwrite an existing destination.  Elastic recovery
            # replays a chunk after restoring from its own checkpoint, so the
            # re-saved chunk targets the same path; without overwrite the
            # retry loop would die on "Destination already exists".
            ckptr.save(os.path.abspath(path), jax.device_get(state), force=True)
        return path

    leaves_with_paths = jax.tree_util.tree_leaves_with_path(state)
    arrays = {}
    for i, (keypath, leaf) in enumerate(leaves_with_paths):
        arrays[f"leaf_{i}"] = np.asarray(jax.device_get(leaf))
        arrays[f"path_{i}"] = np.array(jax.tree_util.keystr(keypath))
    np.savez(_npz_path(path), n=np.array(len(leaves_with_paths)), **arrays)
    return _npz_path(path)


def load_state(like, path: str, use_orbax: bool = None):
    """Restore a state pytree from ``path``.

    Args:
        like: a pytree with the target structure (e.g. from
            ``env.vmap_init_state()``); restored leaves are checked against
            its structure and leaf key paths.
        path: directory (orbax) or ``.npz`` file.
    """
    if use_orbax is None:
        use_orbax = ORBAX_AVAILABLE and not path.endswith(".npz") and os.path.isdir(path)
    treedef = jax.tree_util.tree_structure(like)
    if use_orbax:
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), item=jax.device_get(like))
        if jax.tree_util.tree_structure(restored) != treedef:
            raise ValueError("restored structure mismatch")
        # orbax restores whatever was saved regardless of the template's leaf
        # shapes/dtypes; validate like the npz branch so a batch-size or
        # precision mismatch fails here, not as an opaque vmap axis error.
        for (kp, like_leaf), leaf in zip(
            jax.tree_util.tree_leaves_with_path(like), jax.tree_util.tree_leaves(restored)
        ):
            like_arr = np.asarray(like_leaf)
            leaf_arr = np.asarray(leaf)
            name = jax.tree_util.keystr(kp)
            if leaf_arr.shape != like_arr.shape:
                raise ValueError(
                    f"leaf {name!r} shape mismatch: checkpoint {leaf_arr.shape} vs target {like_arr.shape}"
                )
            if leaf_arr.dtype != like_arr.dtype:
                raise ValueError(
                    f"leaf {name!r} dtype mismatch: checkpoint {leaf_arr.dtype} vs target {like_arr.dtype}"
                )
        return restored

    data = np.load(_npz_path(path), allow_pickle=False)
    n = int(data["n"])
    expected = list(jax.tree_util.tree_leaves_with_path(like))
    if n != len(expected):
        raise ValueError(f"checkpoint has {n} leaves, target structure has {len(expected)}")
    leaves = []
    for i, (kp, like_leaf) in enumerate(expected):
        stored_path = str(data[f"path_{i}"])
        expected_path = jax.tree_util.keystr(kp)
        if stored_path != expected_path:
            raise ValueError(
                f"leaf {i} path mismatch: checkpoint {stored_path!r} vs target {expected_path!r}"
            )
        leaf = data[f"leaf_{i}"]
        # catch batch-size/dtype mismatches at load time instead of as an
        # opaque vmap axis error later
        like_arr = np.asarray(like_leaf)
        if leaf.shape != like_arr.shape:
            raise ValueError(
                f"leaf {stored_path!r} shape mismatch: checkpoint {leaf.shape} vs target {like_arr.shape}"
            )
        if leaf.dtype != like_arr.dtype:
            raise ValueError(
                f"leaf {stored_path!r} dtype mismatch: checkpoint {leaf.dtype} vs target {like_arr.dtype}"
            )
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
