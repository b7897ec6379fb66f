"""Randomized cross-path parity sweep (property-style armor).

The targeted parity tests pin hand-picked configurations; this sweep draws a
deterministic pseudo-random sample of (environment, solver, horizon,
obs_stride, per-batch-parameter, sim-ahead ratio) combinations and asserts
the fused Pallas kernels (interpreter mode) agree with the XLA scan paths on
every one — the invariant a user relies on when the dispatch layer routes
their workload to a kernel.  Every sampled config is asserted to actually be
in kernel scope (``rollout_path == "fused"``) so the sweep can never degrade
into vacuously comparing the scan against itself.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas import rollout_path
from exciting_environments_tpu.ops.pallas.stepper import (
    TILE,
    env_fused_rollout,
    env_fused_sim_ahead,
)

BATCH = TILE  # one tile: 1024 environments

# (env class, name of a static param safe to perturb per-batch)
ENVS = [
    (excenvs.Pendulum, "g"),
    (excenvs.CartPole, "m_c"),
    (excenvs.Acrobot, "g"),
    (excenvs.MassSpringDamper, "k"),
    (excenvs.FluidTank, "c_d"),
    (excenvs.VanDerPol, "mu"),
]
SOLVERS = ["euler", "heun", "midpoint", "rk4", "tsit5", "dopri5"]


def _sample_configs(n, seed, sim_ahead):
    rng = random.Random(seed)
    configs = []
    for i in range(n):
        env_cls, pname = rng.choice(ENVS)
        cfg = {
            "env_cls": env_cls,
            "solver": rng.choice(SOLVERS),
            "T": rng.randint(4, 8),
            "per_batch": (pname if rng.random() < 0.4 else None),
            "seed": seed * 1000 + i,
        }
        if sim_ahead:
            cfg["ratio"] = rng.choice([1, 2])
        else:
            cfg["obs_stride"] = rng.choice([None, 1, 2])
            if cfg["obs_stride"] == 2:
                cfg["T"] = 2 * cfg["T"]  # stride must divide the horizon
        configs.append(cfg)
    return configs


def _make_env(cfg):
    env_cls = cfg["env_cls"]
    kwargs = {}
    if cfg["per_batch"] is not None:
        from exciting_environments_tpu.core import structures

        probe = env_cls(batch_size=BATCH)
        params = {
            f.name: getattr(probe.env_properties.static_params, f.name)
            for f in structures.fields(probe.env_properties.static_params)
        }
        base = float(np.asarray(params[cfg["per_batch"]]))
        jitter = jax.random.uniform(
            jax.random.PRNGKey(cfg["seed"]), (BATCH,), minval=0.95, maxval=1.05
        )
        params[cfg["per_batch"]] = jnp.asarray(base * jitter)
        kwargs["static_params"] = params
    return env_cls(batch_size=BATCH, solver=cfg["solver"], **kwargs)


def _reset_and_actions(env, cfg, n_actions):
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(cfg["seed"]), BATCH))
    actions = jax.random.uniform(
        jax.random.PRNGKey(cfg["seed"] + 1),
        (BATCH, n_actions, env.action_dim),
        minval=-0.9, maxval=0.9,
    )
    return state, actions


@pytest.mark.slow
@pytest.mark.parametrize("cfg", _sample_configs(12, seed=20260818, sim_ahead=False),
                         ids=lambda c: f"{c['env_cls'].__name__}-{c['solver']}-T{c['T']}"
                                       f"-s{c['obs_stride']}-pb{bool(c['per_batch'])}")
def test_random_fused_rollout_matches_scan(cfg):
    env = _make_env(cfg)
    assert rollout_path(env) == "fused", "sampled config fell out of kernel scope"
    state, actions = _reset_and_actions(env, cfg, cfg["T"])

    obs_ref, last_ref = env.vmap_rollout(state, actions, cfg["obs_stride"] or cfg["T"])
    obs_fused, last_fused = env_fused_rollout(
        env, state, actions, obs_stride=cfg["obs_stride"], interpret=True, strict=True
    )
    if cfg["obs_stride"] is None:
        obs_ref = obs_ref[:, -1]
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-9, atol=1e-9)
    for leaf_f, leaf_r in zip(
        jax.tree_util.tree_leaves(last_fused.physical_state),
        jax.tree_util.tree_leaves(last_ref.physical_state),
    ):
        np.testing.assert_allclose(np.asarray(leaf_f), np.asarray(leaf_r), rtol=1e-9, atol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("cfg", _sample_configs(8, seed=20260819, sim_ahead=True),
                         ids=lambda c: f"{c['env_cls'].__name__}-{c['solver']}-T{c['T']}"
                                       f"-r{c['ratio']}-pb{bool(c['per_batch'])}")
def test_random_fused_sim_ahead_matches_scan(cfg):
    env = _make_env(cfg)
    obs_step = float(env.tau)
    act_step = cfg["ratio"] * obs_step
    assert rollout_path(env, obs_step, act_step) == "fused"
    state, actions = _reset_and_actions(env, cfg, cfg["T"])

    obs_ref, _, last_ref = env.vmap_sim_ahead(state, actions, obs_step, act_step)
    obs_fused, last_fused = env_fused_sim_ahead(
        env, state, actions, obs_step, act_step, interpret=True, strict=True
    )
    np.testing.assert_allclose(np.asarray(obs_fused), np.asarray(obs_ref), rtol=1e-9, atol=1e-9)
    for leaf_f, leaf_r in zip(
        jax.tree_util.tree_leaves(last_fused.physical_state),
        jax.tree_util.tree_leaves(last_ref.physical_state),
    ):
        np.testing.assert_allclose(np.asarray(leaf_f), np.asarray(leaf_r), rtol=1e-9, atol=1e-9)
