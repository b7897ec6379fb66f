"""End-to-end differentiability of the simulation (a capability the pure-JAX
design gives for free and that the reference never exposes): gradients flow
through full rollouts and trajectory solves w.r.t. actions, enabling
gradient-based excitation design and optimal control."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import exciting_environments_tpu as excenvs


def test_grad_matches_finite_differences():
    env = excenvs.MassSpringDamper(batch_size=1, tau=1e-2)
    _, state = env.reset(env.env_properties), None
    obs, state = env.vmap_reset()

    def loss(actions):
        _, last = env.vmap_rollout(state, actions, actions.shape[1])
        return jnp.sum(last.physical_state.deflection ** 2)

    actions = 0.3 * jnp.ones((1, 8, 1))
    g = jax.grad(loss)(actions)

    eps = 1e-6
    for t in [0, 3, 7]:
        ap = actions.at[0, t, 0].add(eps)
        am = actions.at[0, t, 0].add(-eps)
        fd = (loss(ap) - loss(am)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, t, 0]), float(fd), rtol=1e-4)


def test_gradient_based_control_improves():
    env = excenvs.Pendulum(batch_size=4, tau=2e-2)
    _, state = env.vmap_reset()

    def loss(actions):
        _, last = env.vmap_rollout(state, actions, actions.shape[1])
        return jnp.mean(last.physical_state.theta ** 2)

    actions = 0.1 * jnp.ones((4, 50, 1))
    before = float(loss(actions))
    a = actions
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(25):
        a = a - 2.0 * grad_fn(a)
    after = float(loss(a))
    assert after < 0.05 * before, f"gradient control did not improve: {before} -> {after}"


def test_grad_through_sim_ahead_and_pmsm():
    env = excenvs.Pendulum(batch_size=2, tau=1e-2)
    _, state = env.vmap_reset()

    def loss(actions):
        obs, states, last = env.vmap_sim_ahead(state, actions, env.tau, env.tau)
        return jnp.mean(obs[:, -1, :] ** 2)

    g = jax.grad(loss)(0.2 * jnp.ones((2, 10, 1)))
    assert bool(jnp.isfinite(g).all())

    pmsm = excenvs.PMSM(batch_size=2)
    _, ps = pmsm.vmap_reset()

    def loss_pmsm(acts):
        _, last = pmsm.vmap_rollout(ps, acts, acts.shape[1])
        return jnp.mean((last.physical_state.i_q - 20.0) ** 2)

    g2 = jax.grad(loss_pmsm)(0.05 * jnp.ones((2, 12, 2)))
    assert bool(jnp.isfinite(g2).all()) and float(jnp.linalg.norm(g2)) > 0


def test_parameter_gradient_system_identification():
    """Gradients w.r.t. physical parameters enable system identification:
    recover the spring constant from observed trajectories by gradient
    descent (the functional API takes env_properties as an argument, so any
    leaf can be a differentiation target)."""
    from exciting_environments_tpu.core import structures

    true_env = excenvs.MassSpringDamper(batch_size=4, tau=1e-2)
    _, s0 = true_env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 4))
    actions = jax.random.uniform(jax.random.PRNGKey(1), (4, 60, 1), minval=-1, maxval=1)
    obs_data, _ = true_env.vmap_rollout(s0, actions)  # ground truth, k = 100

    env = true_env

    def rollout_with_k(k):
        props = structures.replace(
            env.env_properties,
            static_params=structures.replace(env.env_properties.static_params, k=k),
        )

        def body(state, a_t):
            obs, state = jax.vmap(env.step, in_axes=(0, 0, None))(state, a_t, props)
            return state, obs

        _, obs = jax.lax.scan(body, s0, jnp.swapaxes(actions, 0, 1))
        return jnp.swapaxes(obs, 0, 1)

    def loss(k):
        return jnp.mean((rollout_with_k(k) - obs_data) ** 2)

    k = 60.0
    value_and_grad = jax.jit(jax.value_and_grad(loss))
    for _ in range(100):
        l, g = value_and_grad(k)
        k = k - 120.0 * g
    assert abs(float(k) - 100.0) < 0.5, f"identified k = {float(k)}"
    assert float(l) < 1e-4

# ---------------------------------------------------------------------------
# Fused-path differentiability (round-3): the Pallas kernels define a
# checkpointed-recompute custom VJP, so jax.grad works on the hot path like it
# does everywhere in the reference (whose every path is plain diffrax/JAX,
# e.g. reference pendulum_env.py:184).
# ---------------------------------------------------------------------------


def _rel_dev(a, b):
    return float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(b))), 1e-300)


@pytest.mark.slow
def test_fused_rollout_grad_matches_scan():
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    env = excenvs.CartPole(batch_size=1024, solver="tsit5")
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (1024, 8, 1), minval=-0.7, maxval=0.7)

    gf = jax.grad(
        lambda a: jnp.sum(env_fused_rollout(env, s0, a, interpret=True)[0] ** 2)
    )(acts)
    gs = jax.grad(lambda a: jnp.sum(env.vmap_rollout(s0, a, 8)[0][:, -1] ** 2))(acts)
    assert _rel_dev(gf, gs) < 1e-10


def test_fused_rollout_invalid_stride_raises_under_grad_too():
    """The VJP forward launches with the checkpoint stride, so an
    n_steps-indivisible obs_stride must fail identically with and without a
    surrounding grad transform (it used to silently mis-slice under grad)."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_rollout

    env = excenvs.Pendulum(batch_size=1024)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(7), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(8), (1024, 10, 1), minval=-0.5, maxval=0.5)

    with pytest.raises(ValueError, match="divisible"):
        env_fused_rollout(env, s0, acts, obs_stride=8, interpret=True)
    with pytest.raises(ValueError, match="divisible"):
        jax.grad(
            lambda a: jnp.sum(env_fused_rollout(env, s0, a, obs_stride=8, interpret=True)[0] ** 2)
        )(acts)


@pytest.mark.slow
def test_fused_sim_ahead_grad_matches_scan_finer_grid():
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_sim_ahead

    env = excenvs.Pendulum(batch_size=1024)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(2), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(3), (1024, 6, 1), minval=-0.7, maxval=0.7)

    gf = jax.grad(
        lambda a: jnp.sum(
            env_fused_sim_ahead(env, s0, a, env.tau / 2, env.tau, interpret=True)[0] ** 2
        )
    )(acts)
    gs = jax.grad(
        lambda a: jnp.sum(env.vmap_sim_ahead(s0, a, env.tau / 2, env.tau)[0] ** 2)
    )(acts)
    assert _rel_dev(gf, gs) < 1e-10


@pytest.mark.slow
def test_fused_per_batch_param_grad():
    """Gradients flow to per-batch heterogeneous parameter leaves through the
    fused kernel's VJP (system identification on the fast path)."""
    from exciting_environments_tpu.ops.pallas.stepper import fused_rollout, _batched_param_closure
    from exciting_environments_tpu.ops.solvers import Euler

    lengths = 1.0 + jnp.arange(1024) / 1024
    env = excenvs.Pendulum(batch_size=1024, static_params={"l": lengths, "g": 9.81, "m": 1})
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(4), 1024))
    acts_phys = jax.random.uniform(jax.random.PRNGKey(5), (1024, 8, 1), minval=-5, maxval=5)
    tile_ode, _ = _batched_param_closure(env)
    y0 = tuple(jnp.asarray(getattr(s0.physical_state, n)) for n in env._ode_state_fields)
    wrap_flags = tuple(n in env._angle_fields for n in env._ode_state_fields)

    def loss(l_leaf):
        final = fused_rollout(
            tile_ode, env._solver, y0, acts_phys, 8, env.tau, wrap_flags,
            param_leaves=(l_leaf,), interpret=True,
        )
        return jnp.sum(final[1] ** 2)

    g = jax.grad(loss)(lengths)
    eps = 1e-6
    lp = lengths.at[7].add(eps)
    lm = lengths.at[7].add(-eps)
    fd = (loss(lp) - loss(lm)) / (2 * eps)
    np.testing.assert_allclose(float(g[7]), float(fd), rtol=1e-5)


@pytest.mark.slow
def test_pmsm_fused_grad_matches_scan():
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_rollout

    env = excenvs.PMSM(batch_size=1024, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA)
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(6), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(7), (1024, 4, 2), minval=-0.4, maxval=0.4)

    gf = jax.grad(
        lambda a: jnp.sum(pmsm_fused_rollout(env, s0, a, gather="take", interpret=True)[0] ** 2)
    )(acts)
    gs = jax.grad(lambda a: jnp.sum(env.vmap_rollout(s0, a, 4)[0][:, -1] ** 2))(acts)
    assert _rel_dev(gf, gs) < 1e-8


@pytest.mark.slow
def test_fused_sim_ahead_fsal_grad_matches_scan():
    """FSAL sim-ahead gradients: the c == 1.0 stages read the NEXT interval's
    action, so the backward pass pulls a cotangent back through the shifted
    action stream (the has_next branch) — must match the scan path."""
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_sim_ahead

    env = excenvs.Pendulum(batch_size=1024, solver="tsit5")
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(12), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(13), (1024, 6, 1), minval=-0.7, maxval=0.7)

    gf = jax.grad(
        lambda a: jnp.sum(
            env_fused_sim_ahead(env, s0, a, env.tau, env.tau, interpret=True, strict=True)[0] ** 2
        )
    )(acts)
    gs = jax.grad(
        lambda a: jnp.sum(env.vmap_sim_ahead(s0, a, env.tau, env.tau)[0] ** 2)
    )(acts)
    assert _rel_dev(gf, gs) < 1e-8
    assert float(jnp.max(jnp.abs(gf))) > 0


@pytest.mark.slow
def test_pmsm_fused_sim_ahead_fsal_grad_matches_scan():
    """Same has_next backward branch through the PMSM drive kernel's
    trajectory mode with an FSAL solver."""
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_sim_ahead

    env = excenvs.PMSM(
        batch_size=1024, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        solver="tsit5",
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(14), 1024))
    acts = jax.random.uniform(jax.random.PRNGKey(15), (1024, 4, 2), minval=-0.3, maxval=0.3)

    gf = jax.grad(
        lambda a: jnp.sum(
            pmsm_fused_sim_ahead(
                env, s0, a, env.tau, env.tau, gather="take", interpret=True, strict=True
            )[0] ** 2
        )
    )(acts)
    gs = jax.grad(
        lambda a: jnp.sum(env.vmap_sim_ahead(s0, a, env.tau, env.tau)[0] ** 2)
    )(acts)
    assert _rel_dev(gf, gs) < 1e-6
    assert float(jnp.max(jnp.abs(gf))) > 0


@pytest.mark.slow
def test_policy_gradient_through_closed_loop_kernel():
    """Policy-gradient at kernel speed: with policy_params the closed-loop
    kernel defines a checkpointed-recompute VJP — gradients w.r.t. the
    parameter pytree match the scan closed loop at machine precision and
    gradient descent improves reference tracking."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    B, T = 1024, 8
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(0), B))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.2, 1.2, B))
    )

    def policy(obs, t, p):
        return (-p["k1"] * (obs[0] - obs[2]) - p["k2"] * obs[1],)

    params = {"k1": jnp.asarray(0.9), "k2": jnp.asarray(0.25)}

    def loss_fused(p):
        obs, acts, _ = env_fused_closed_loop(
            env, s0, policy, T, obs_stride=1, interpret=True, policy_params=p
        )
        return jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def loss_scan(p):
        def body(carry, _):
            st, obs = carry
            a = (-p["k1"] * (obs[:, 0] - obs[:, 2]) - p["k2"] * obs[:, 1])[:, None]
            obs, st = step_b(st, a, env.env_properties)
            return (st, obs), obs

        (_, _), obs_t = jax.lax.scan(body, (s0, obs0), None, length=T)
        obs_t = jnp.swapaxes(obs_t, 0, 1)
        return jnp.mean((obs_t[:, :, 0] - obs_t[:, :, 2]) ** 2)

    gf = jax.grad(loss_fused)(params)
    gs = jax.grad(loss_scan)(params)
    for k in ("k1", "k2"):
        assert abs(float(gf[k]) - float(gs[k])) <= 1e-12 * max(abs(float(gs[k])), 1e-12), k

    p = dict(params)
    l0 = float(loss_fused(p))
    for _ in range(10):
        g = jax.grad(loss_fused)(p)
        p = {k: v - 2.0 * g[k] for k, v in p.items()}
    assert float(loss_fused(p)) < l0


def test_stateful_policy_gradient_through_closed_loop_kernel():
    """Gradients flow through the VMEM-resident policy carry: PI-gain
    gradients AND the gradient w.r.t. the initial integrator state match
    the scan closed loop at machine precision (the carry is a first-class
    differentiable input of the checkpointed-recompute VJP)."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    B, T = 1024, 8
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, B))
    )

    def policy(obs, t, carry, p):
        e = obs[2] - obs[0]
        integ = carry[0] + p["ki"] * e
        return (p["kp"] * e + integ - 0.2 * obs[1],), (integ,)

    params = {"kp": jnp.asarray(0.7), "ki": jnp.asarray(0.08)}
    carry0 = (0.01 * jnp.linspace(-1.0, 1.0, B),)

    def loss_fused(p, c0):
        obs, acts, _, fc = env_fused_closed_loop(
            env, s0, policy, T, obs_stride=1, interpret=True,
            policy_params=p, policy_carry=c0,
        )
        # touch every output class: trajectory, actions, final carry
        return (
            jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)
            + 1e-3 * jnp.mean(acts**2)
            + 1e-4 * jnp.mean(fc[0] ** 2)
        )

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def loss_scan(p, c0):
        def body(carry, _):
            st, obs, integ = carry
            e = obs[:, 2] - obs[:, 0]
            integ = integ + p["ki"] * e
            a = (p["kp"] * e + integ - 0.2 * obs[:, 1])[:, None]
            obs, st = step_b(st, a, env.env_properties)
            return (st, obs, integ), (obs, a)

        (_, _, integ), (obs_t, a_t) = jax.lax.scan(body, (s0, obs0, c0[0]), None, length=T)
        obs_t = jnp.swapaxes(obs_t, 0, 1)
        a_t = jnp.swapaxes(a_t, 0, 1)
        return (
            jnp.mean((obs_t[:, :, 0] - obs_t[:, :, 2]) ** 2)
            + 1e-3 * jnp.mean(a_t**2)
            + 1e-4 * jnp.mean(integ**2)
        )

    lf = float(loss_fused(params, carry0))
    ls = float(loss_scan(params, carry0))
    assert abs(lf - ls) <= 1e-12 * max(abs(ls), 1e-12)
    gf_p, gf_c = jax.grad(loss_fused, argnums=(0, 1))(params, carry0)
    gs_p, gs_c = jax.grad(loss_scan, argnums=(0, 1))(params, carry0)
    for k in ("kp", "ki"):
        assert abs(float(gf_p[k]) - float(gs_p[k])) <= 1e-11 * max(abs(float(gs_p[k])), 1e-12), k
    np.testing.assert_allclose(np.asarray(gf_c[0]), np.asarray(gs_c[0]), rtol=1e-10, atol=1e-14)


@pytest.mark.slow
def test_pmsm_policy_gradient_through_closed_loop_kernel():
    """Policy gradients through the closed-loop DRIVE kernel: parameter
    gradients of a current-tracking loss match the scan closed loop (which
    backprops through PMSM.step's inverter constraint + magnetics) and a few
    descent steps improve tracking.  Saturated BRUSA exercises the LUT-gather
    VJP inside the recompute segments."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.pmsm_stepper import pmsm_fused_closed_loop

    B, T = 1024, 8
    env = excenvs.PMSM(
        batch_size=B, saturated=True, motor_variant=excenvs.MotorVariant.BRUSA,
        control_state=["i_d", "i_q"],
    )
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(3), B))
    s0 = structures.replace(
        s0,
        reference=structures.replace(
            s0.reference,
            i_d=jnp.linspace(-200.0, -10.0, B),
            i_q=jnp.linspace(-150.0, 150.0, B),
        ),
    )

    def policy(obs, t, p):
        a_d = -p["kd"] * (obs[0] - obs[8]) - p["kx"] * obs[1]
        a_q = -p["kq"] * (obs[1] - obs[9]) + p["kx"] * obs[0]
        return (a_d, a_q)

    params = {"kd": jnp.asarray(0.6), "kq": jnp.asarray(0.6), "kx": jnp.asarray(0.05)}

    def loss_fused(p):
        obs, acts, _ = pmsm_fused_closed_loop(
            env, s0, policy, T, obs_stride=1, gather="take", interpret=True,
            policy_params=p,
        )
        return jnp.mean((obs[:, :, 0] - obs[:, :, 8]) ** 2 + (obs[:, :, 1] - obs[:, :, 9]) ** 2)

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def loss_scan(p):
        def body(carry, _):
            st, obs = carry
            a = jnp.stack(
                (
                    -p["kd"] * (obs[:, 0] - obs[:, 8]) - p["kx"] * obs[:, 1],
                    -p["kq"] * (obs[:, 1] - obs[:, 9]) + p["kx"] * obs[:, 0],
                ),
                axis=-1,
            )
            obs, st = step_b(st, a, env.env_properties)
            return (st, obs), obs

        (_, _), obs_t = jax.lax.scan(body, (s0, obs0), None, length=T)
        obs_t = jnp.swapaxes(obs_t, 0, 1)
        return jnp.mean(
            (obs_t[:, :, 0] - obs_t[:, :, 8]) ** 2 + (obs_t[:, :, 1] - obs_t[:, :, 9]) ** 2
        )

    gf = jax.grad(loss_fused)(params)
    gs = jax.grad(loss_scan)(params)
    for k in params:
        assert abs(float(gf[k]) - float(gs[k])) <= 1e-9 * max(abs(float(gs[k])), 1e-9), k

    p = dict(params)
    l0 = float(loss_fused(p))
    for _ in range(8):
        g = jax.grad(loss_fused)(p)
        p = {k: v - 0.5 * g[k] for k, v in p.items()}
    assert float(loss_fused(p)) < l0


@pytest.mark.slow
def test_mlp_policy_in_kernel_grad_matches_scan():
    """A small unrolled MLP as the in-kernel policy (README claim): weight
    MATRICES ride the SMEM parameter stream via ravel_pytree, static-index
    loops unroll the layer arithmetic over the observation planes, and
    jax.grad w.r.t. all weights matches the scan closed loop."""
    from exciting_environments_tpu.core import structures
    from exciting_environments_tpu.ops.pallas.stepper import env_fused_closed_loop

    B, T, H = 1024, 6, 4
    env = excenvs.Pendulum(batch_size=B, control_state=["theta"])
    _, s0 = env.vmap_reset(jax.random.split(jax.random.PRNGKey(5), B))
    s0 = structures.replace(
        s0, reference=structures.replace(s0.reference, theta=jnp.linspace(-1.0, 1.0, B))
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    params = {
        "w1": 0.3 * jax.random.normal(k1, (3, H)),
        "b1": jnp.zeros((H,)),
        "w2": 0.3 * jax.random.normal(k2, (H,)),
        "b2": jnp.zeros(()),
    }

    def mlp_tile(obs, t, p):
        # obs: tuple of 3 planes -> hidden via static-index unrolled loops
        h = [jnp.tanh(sum(obs[i] * p["w1"][i, j] for i in range(3)) + p["b1"][j])
             for j in range(H)]
        return (sum(h[j] * p["w2"][j] for j in range(H)) + p["b2"],)

    def loss_fused(p):
        obs, acts, _ = env_fused_closed_loop(
            env, s0, mlp_tile, T, obs_stride=1, interpret=True, policy_params=p
        )
        return jnp.mean((obs[:, :, 0] - obs[:, :, 2]) ** 2)

    in_ax = env.in_axes_env_properties
    obs0 = jax.vmap(env.generate_observation, in_axes=(0, in_ax))(s0, env.env_properties)
    step_b = jax.vmap(env.step, in_axes=(0, 0, in_ax))

    def loss_scan(p):
        def body(carry, _):
            st, obs = carry
            h = jnp.tanh(obs @ p["w1"] + p["b1"])
            a = (h @ p["w2"] + p["b2"])[:, None]
            obs, st = step_b(st, a, env.env_properties)
            return (st, obs), obs

        (_, _), obs_t = jax.lax.scan(body, (s0, obs0), None, length=T)
        obs_t = jnp.swapaxes(obs_t, 0, 1)
        return jnp.mean((obs_t[:, :, 0] - obs_t[:, :, 2]) ** 2)

    lf, ls = float(loss_fused(params)), float(loss_scan(params))
    assert abs(lf - ls) <= 1e-10 * max(abs(ls), 1e-10)
    gf = jax.grad(loss_fused)(params)
    gs = jax.grad(loss_scan)(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(gs[k]), rtol=1e-8, atol=1e-12, err_msg=k
        )
