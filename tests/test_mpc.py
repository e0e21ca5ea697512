"""Receding-horizon MPC harness: closed-loop regulation + warm starts."""

import jax
import jax.numpy as jnp
import numpy as np

from pdp_lqr_tpu import mpc
from pdp_lqr_tpu.models import double_integrator, quadrotor
from pdp_lqr_tpu.solvers import admm


def test_closed_loop_regulates_to_target():
    """Double integrator tracks position 1 under |u| <= 1."""
    problem = double_integrator(N=20, constrained=True, u_max=1.0)
    settings = admm.ADMMSettings(max_iter=100, rho_update_interval=25)
    xs, us, infos = mpc.simulate(
        problem, jnp.asarray([0.0, 0.0]), n_steps=60, settings=settings
    )
    xs = np.asarray(xs)
    us = np.asarray(us)
    # Input constraint respected in closed loop.
    assert np.all(np.abs(us) <= 1.0 + 1e-5)
    # Converges to the cost minimizer (position ~1, velocity ~0).
    assert abs(xs[-1, 0] - 1.0) < 5e-2
    assert abs(xs[-1, 1]) < 5e-2


def test_warm_start_cuts_iterations():
    """Replans after the first converge much faster (warm-start value)."""
    problem = double_integrator(N=20, constrained=True, u_max=0.3)
    settings = admm.ADMMSettings(
        max_iter=200, rho_update_interval=50, adaptive_rho=False
    )
    # Far from the tracking target (position 1) so |u| <= 0.3 binds.
    x = jnp.asarray([0.0, 0.0])
    u0, ws, state, info_cold = mpc.replan(problem, x, None, (), settings)
    assert bool(info_cold.converged)

    # Step the plant and replan warm.
    x2 = problem.A[0] @ x + problem.B[0] @ u0 + problem.c[0]
    state = mpc.shift_state(state, problem)
    _, _, _, info_warm = mpc.replan(problem, x2, state, (), settings)
    assert bool(info_warm.converged)
    assert int(info_warm.iter_converged) < int(info_cold.iter_converged)


def test_simulate_jits_and_is_finite():
    problem = double_integrator(N=10, constrained=True)
    settings = admm.ADMMSettings(max_iter=50, rho_update_interval=25)
    sim = jax.jit(
        lambda p, x: mpc.simulate(p, x, n_steps=5, settings=settings),
    )
    xs, us, infos = sim(problem, jnp.asarray([0.5, -0.2]))
    assert np.all(np.isfinite(np.asarray(xs)))
    assert np.all(np.isfinite(np.asarray(us)))


def test_simulate_realtime_tracks_simulate():
    """The operator-path closed loop lands at the same regulated state
    as the scan-path loop (same tolerances, same warm-start shifts)."""
    problem, _ = quadrotor(N=12, constrained=True)
    settings = admm.ADMMSettings(
        rho=1.0, max_iter=60, rho_update_interval=60,
        adaptive_rho=False, eps_abs=1e-6, eps_rel=1e-5,
    )
    x0 = jnp.asarray(np.full(12, 0.08))
    xs_rt, us_rt, infos_rt = mpc.simulate_realtime(
        problem, x0, n_steps=6, settings=settings)
    xs, us, infos = mpc.simulate(
        problem, x0, n_steps=6, settings=settings)
    # Both loops regulate; trajectories agree to solver tolerance.
    # realtime early-exits at tolerance while simulate runs max_iter;
    # trajectories agree to the induced solver-tolerance difference.
    np.testing.assert_allclose(
        np.asarray(xs_rt), np.asarray(xs), atol=2e-3)
    assert np.all(np.isfinite(np.asarray(us_rt)))
