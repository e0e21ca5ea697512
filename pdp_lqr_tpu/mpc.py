"""Receding-horizon MPC harness with warm starts and factor caching.

BASELINE.json configs #5 ("receding-horizon centroidal MPC ... 1 kHz
replan") and the 1 ms p50 latency budget live here.  The reference has
no MPC loop; its enabling feature is the factorization cache across
ADMM iterations (the ``*_without_factorization`` API,
lqr_solver.hpp:65-70) which this harness extends across *replan steps*:
the ADMM state (w, z, y, rho) of one solve warm-starts the next after a
one-stage shift, so steady-state replans converge in a handful of
iterations.

Everything is a pure function of (problem, x_measured, carry-state);
the whole replan step jits, and a full closed-loop simulation is one
``lax.scan`` — no host round-trips inside the control loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from pdp_lqr_tpu.ops import projections
from pdp_lqr_tpu.problem import LQRProblem
from pdp_lqr_tpu.solvers import admm


def shift_state(state: admm.ADMMState, problem: LQRProblem) -> admm.ADMMState:
    """Shift ADMM iterates one stage forward (standard MPC warm start).

    The last stage is duplicated (steady-state extrapolation); rho is
    kept so cached-cadence refactors stay valid across replans.

    Works on per-instance states (w (N+1, nz)) and batch-leading
    batched states (w (B, N+1, nz)): the time axis is always -2.
    """
    shift = lambda a: jnp.concatenate(
        [a[..., 1:, :], a[..., -1:, :]], axis=-2)
    return admm.ADMMState(
        w=shift(state.w), z=shift(state.z), y=shift(state.y),
        rho=state.rho,
        # Factors depend only on (problem, rho) — both unchanged by the
        # shift — so warm replans keep skipping refactorization.
        factors=state.factors,
    )


def replan(
    problem: LQRProblem,
    x_measured,
    state: Optional[admm.ADMMState],
    cones: Sequence[projections.ConeSpec] = (),
    settings: admm.ADMMSettings = admm.ADMMSettings(),
):
    """One MPC replan: warm-started ADMM solve from the measured state.

    Returns (u0, ws, new_state, info).  jit this (cones/settings are
    static) and call at the replan rate.
    """
    ws, new_state, info = admm.solve(
        problem, x_measured, cones=cones, settings=settings, state=state
    )
    u0 = ws[0, : problem.nu]
    return u0, ws, new_state, info


def replan_realtime(
    problem: LQRProblem,
    x_measured,
    state: Optional[admm.ADMMState],
    operator,
    cones: Sequence[projections.ConeSpec] = (),
    settings: admm.ADMMSettings = admm.ADMMSettings(),
):
    """One 1 kHz-class replan through the dense-operator path.

    ``operator`` comes from solvers.realtime.build_operator (rebuild on
    rho/problem changes).  Early-exits on convergence, so steady-state
    replans cost ~2 iterations x ~8 us.  Returns (u0, ws, state, info).
    """
    from pdp_lqr_tpu.solvers import realtime

    ws, new_state, info = realtime.solve(
        problem, x_measured, operator, cones, settings, state
    )
    u0 = ws[0, : problem.nu]
    return u0, ws, new_state, info


def simulate_realtime(
    problem: LQRProblem,
    x0,
    n_steps: int,
    cones: Sequence[projections.ConeSpec] = (),
    settings: admm.ADMMSettings = admm.ADMMSettings(),
    process_noise: Optional[jax.Array] = None,
):
    """Closed-loop rollout on the real-time operator path.

    Same contract as ``simulate`` but every replan is the
    while_loop/matvec solver — the shape of a production 1 kHz loop.
    The operator is built once outside the scan (rho fixed).
    """
    from pdp_lqr_tpu.solvers import realtime

    cones = tuple(cones)
    op = realtime.build_operator(problem, settings.rho, settings, cones)
    A0, B0, c0 = problem.A[0], problem.B[0], problem.c[0]
    if process_noise is None:
        process_noise = jnp.zeros((n_steps, problem.nx), problem.A.dtype)

    state0 = admm.init_state(problem, settings)

    def step(carry, noise):
        x, st = carry
        u0, _, st_new, info = replan_realtime(
            problem, x, st, op, cones, settings
        )
        x_next = A0 @ x + B0 @ u0 + c0 + noise
        st_shifted = shift_state(st_new, problem)
        return (x_next, st_shifted), (x, u0, info)

    (x_final, _), (xs, us, infos) = jax.lax.scan(
        step, (x0, state0), process_noise
    )
    xs = jnp.concatenate([xs, x_final[None]], axis=0)
    return xs, us, infos


def simulate(
    problem: LQRProblem,
    x0,
    n_steps: int,
    cones: Sequence[projections.ConeSpec] = (),
    settings: admm.ADMMSettings = admm.ADMMSettings(),
    process_noise: Optional[jax.Array] = None,
):
    """Closed-loop rollout: replan -> apply u0 -> step true dynamics.

    The plant model is the problem's stage-0 dynamics (time-invariant
    assumption for the closed-loop plant; the *predictions* may still
    be time-varying).  ``process_noise`` is an optional (n_steps, nx)
    additive disturbance.

    Returns (xs (n_steps+1, nx), us (n_steps, nu), infos) — one
    ``lax.scan``, fully on device.
    """
    cones = tuple(cones)
    A0, B0, c0 = problem.A[0], problem.B[0], problem.c[0]
    if process_noise is None:
        process_noise = jnp.zeros((n_steps, problem.nx), problem.A.dtype)

    state0 = admm.init_state(problem, settings)

    def step(carry, noise):
        x, st = carry
        u0, _, st_new, info = replan(problem, x, st, cones, settings)
        x_next = A0 @ x + B0 @ u0 + c0 + noise
        st_shifted = shift_state(st_new, problem)
        return (x_next, st_shifted), (x, u0, info)

    (x_final, _), (xs, us, infos) = jax.lax.scan(
        step, (x0, state0), process_noise
    )
    xs = jnp.concatenate([xs, x_final[None]], axis=0)
    return xs, us, infos
