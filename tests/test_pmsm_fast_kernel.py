"""Trig-free fused PMSM kernel vs the XLA fast path (interpreter mode).

Both implement the identical fast-math arithmetic (rotation carry, linear
sector tests, multilinear table), so on one backend they agree to
FMA-context level; float64 over 32 steps is gated at 1e-8 absolute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import exciting_environments_tpu as excenvs
from exciting_environments_tpu.ops.pallas.pmsm_fast_kernel import pmsm_fast_fused_rollout
from exciting_environments_tpu.ops.pmsm_fast import pmsm_fast_rollout

BATCH, T = 1024, 32

FIELDS = ("i_d", "i_q", "epsilon", "torque", "u_d_buffer", "u_q_buffer")


def _pair(saturated, variant, **overrides):
    kwargs = {}
    if overrides:
        params = dict(variant.get_params().static_params.__dict__)
        if saturated:
            params.update({"l_d": jnp.nan, "l_q": jnp.nan, "psi_p": jnp.nan})
        params.update(overrides)
        kwargs["static_params"] = params
    env = excenvs.PMSM(batch_size=BATCH, saturated=saturated, motor_variant=variant, **kwargs)
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, T, 2), minval=-0.4, maxval=0.4)
    return env, state, actions


@pytest.mark.parametrize(
    "saturated,variant",
    [(False, excenvs.MotorVariant.DEFAULT), (True, excenvs.MotorVariant.BRUSA)],
)
@pytest.mark.slow
def test_fast_kernel_matches_xla_fast_path(saturated, variant):
    env, state, actions = _pair(saturated, variant)
    last_x = pmsm_fast_rollout(env, state, actions)
    last_k = pmsm_fast_fused_rollout(env, state, actions, gather="take", interpret=True)
    for n in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(last_k.physical_state, n)),
            np.asarray(getattr(last_x.physical_state, n)),
            rtol=1e-8,
            atol=1e-7,
            err_msg=n,
        )


@pytest.mark.slow
def test_fast_kernel_deadtime_zero():
    env, state, actions = _pair(True, excenvs.MotorVariant.BRUSA, deadtime=0)
    last_x = pmsm_fast_rollout(env, state, actions)
    last_k = pmsm_fast_fused_rollout(env, state, actions, gather="take", interpret=True)
    for n in FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(last_k.physical_state, n)),
            np.asarray(getattr(last_x.physical_state, n)),
            rtol=1e-8,
            atol=1e-7,
            err_msg=n,
        )


@pytest.mark.slow
def test_fast_kernel_time_major():
    env, state, actions = _pair(False, excenvs.MotorVariant.DEFAULT)
    last_b = pmsm_fast_fused_rollout(env, state, actions, gather="take", interpret=True)
    last_t = pmsm_fast_fused_rollout(
        env, state, jnp.transpose(actions, (1, 0, 2)), time_major=True, gather="take", interpret=True
    )
    for n in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(last_t.physical_state, n)),
            np.asarray(getattr(last_b.physical_state, n)),
            err_msg=n,
        )


@pytest.mark.slow
def test_fast_kernel_tracks_exact_path():
    """Fast semantics track the exact scan within the documented envelope."""
    env, state, actions = _pair(True, excenvs.MotorVariant.BRUSA)
    _, last_exact = env.vmap_rollout(state, actions, T)
    last_k = pmsm_fast_fused_rollout(env, state, actions, gather="take", interpret=True)
    i_ref = np.asarray(last_exact.physical_state.i_d)
    i_fast = np.asarray(last_k.physical_state.i_d)
    scale = max(1.0, np.max(np.abs(i_ref)))
    assert np.max(np.abs(i_ref - i_fast)) / scale < 1e-4


def test_fast_kernel_rejects_out_of_scope():
    env = excenvs.PMSM(batch_size=BATCH, motor_variant=excenvs.MotorVariant.DEFAULT, solver="tsit5")
    _, state = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), BATCH))
    with pytest.raises(ValueError):
        pmsm_fast_fused_rollout(env, state, jnp.zeros((BATCH, 4, 2)), interpret=True)


@pytest.mark.slow
def test_fast_kernel_int8_gather_exact_vs_take():
    """The int8x4 byte-plane gather (the compiled default) is bitwise against
    direct indexing on every backend — same guarantee as the exact kernel
    (integer one-hot contraction, bitwise re-pack, no FP arithmetic)."""
    env, state, actions = _pair(True, excenvs.MotorVariant.BRUSA)
    state = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.float32)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float64
        else leaf,
        state,
    )
    actions = actions.astype(jnp.float32)
    last_t = pmsm_fast_fused_rollout(env, state, actions, gather="take", interpret=True)
    env2 = excenvs.PMSM(
        batch_size=BATCH, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA
    )
    last_i = pmsm_fast_fused_rollout(env2, state, actions, gather="int8", interpret=True)
    for n in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(last_i.physical_state, n)),
            np.asarray(getattr(last_t.physical_state, n)), err_msg=n,
        )
