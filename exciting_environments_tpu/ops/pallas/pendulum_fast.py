"""Speed-of-light pendulum rollout kernel.

The generic fused kernel (:mod:`.stepper`) preserves exact ``jnp`` op
semantics; on the target TPU runtime its throughput is capped by the slow-op
class (``sin``, ``rem`` — see :mod:`exciting_environments_tpu.ops.fastmath`).
This kernel is the fast-math variant for the headline benchmark workload
(pendulum, Euler, huge batch):

* whole batch resident in VMEM for the entire horizon (one grid axis over
  *time chunks*, so Pallas double-buffers the action DMA automatically while
  the state never touches HBM),
* ``sin`` evaluated as an FMA-only polynomial (max abs error ~2e-7, the
  float32 rounding level),
* angle wrap via the floored-modulo identity (FMA + floor, no ``rem``),
* action denormalization folded into a single FMA (scale/offset constants).

Scalar parameters are baked into the kernel as compile-time constants, which
matches how the environments hold their defaults (Python scalars).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exciting_environments_tpu.ops.fastmath import poly_sin, wrap_angle_fast

LANES = 128


@functools.partial(
    jax.jit,
    static_argnames=("tau", "g", "l", "m", "a_scale", "a_offset", "chunk", "interpret"),
)
def _pendulum_kernel_call(theta0, omega0, actions_tm, tau, g, l, m, a_scale, a_offset, chunk, interpret):
    n_steps, rows, lanes = actions_tm.shape
    c_grav = float(l * m * g)
    inv_ml2 = float(1.0 / (m * l**2))

    def kernel(a_ref, th0_ref, om0_ref, th_ref, om_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            th_ref[:] = th0_ref[:]
            om_ref[:] = om0_ref[:]

        def body(i, carry):
            th, om = carry
            u = a_ref[i] * a_scale + a_offset
            d_om = (u + c_grav * poly_sin(th)) * inv_ml2
            th1 = wrap_angle_fast(th + tau * om)
            om1 = om + tau * d_om
            return th1, om1

        th, om = jax.lax.fori_loop(0, chunk, body, (th_ref[:], om_ref[:]))
        th_ref[:] = th
        om_ref[:] = om

    state_spec = pl.BlockSpec((rows, lanes), lambda k: (0, 0), memory_space=pltpu.VMEM)
    th, om = pl.pallas_call(
        kernel,
        grid=(n_steps // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, rows, lanes), lambda k: (k, 0, 0), memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_specs=[state_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(actions_tm, theta0, omega0)
    return th, om


def pendulum_fast_rollout(
    env, init_state, actions_norm, chunk: int = 16, time_major: bool = False, interpret: bool = False
):
    """Fast-math Euler rollout for a :class:`Pendulum` environment.

    Args:
        env: a ``Pendulum`` with scalar static params and an Euler solver.
        init_state: batched state from ``vmap_reset``.
        actions_norm: normalized actions, shape ``(B, n_steps, 1)`` — or
            ``(n_steps, B, 1)`` with ``time_major=True``;
            ``n_steps`` must be divisible by ``chunk``.
        chunk: actions per DMA block (time-chunk size of the grid).
        time_major: the kernel streams actions time-major; batch-major input
            costs a full transposed copy of the action slab PER CALL (~3x
            total runtime at the benchmark scale).  Generate long-horizon /
            repeatedly-replayed action slabs ``(n_steps, B, 1)`` and pass
            ``time_major=True`` to skip it.
        interpret: Pallas interpreter mode for CPU testing.

    Returns:
        ``(theta, omega)`` final physical states, each shape ``(B,)``.
    """
    params = env.env_properties.static_params
    norm = env.env_properties.action_normalizations.torque
    a_scale = float((norm.max - norm.min) / 2.0)
    a_offset = float((norm.max + norm.min) / 2.0)

    if time_major:
        n_steps, batch, _ = actions_norm.shape
    else:
        batch, n_steps, _ = actions_norm.shape
    if batch % LANES != 0:
        raise ValueError(f"batch {batch} must be a multiple of {LANES}")
    if n_steps % chunk != 0:
        raise ValueError("n_steps must be divisible by chunk")
    rows = batch // LANES

    theta0 = jnp.asarray(init_state.physical_state.theta, jnp.float32).reshape(rows, LANES)
    omega0 = jnp.asarray(init_state.physical_state.omega, jnp.float32).reshape(rows, LANES)
    if time_major:
        actions_tm = jnp.asarray(actions_norm, jnp.float32).reshape(n_steps, rows, LANES)
    else:
        actions_tm = (
            jnp.asarray(actions_norm, jnp.float32).reshape(batch, n_steps).T.reshape(n_steps, rows, LANES)
        )

    th, om = _pendulum_kernel_call(
        theta0,
        omega0,
        actions_tm,
        tau=float(env.tau),
        g=float(params.g),
        l=float(params.l),
        m=float(params.m),
        a_scale=a_scale,
        a_offset=a_offset,
        chunk=chunk,
        interpret=interpret,
    )
    return th.reshape(batch), om.reshape(batch)
