"""Sequential Riccati solver — reference ``LQRSolver`` (lqr_solver.hpp).

Pure-functional facade over ops.riccati.  All entry points operate on a
single problem; lift with ``jax.vmap`` for batching (see ``solve_batched``).
"""

from __future__ import annotations

import jax

from pdp_lqr_tpu.ops import riccati
from pdp_lqr_tpu.problem import (
    ADMMIterates,
    LQRProblem,
    StageParams,
    make_stage_params,
)

RiccatiFactors = riccati.RiccatiFactors

update_problem_data = make_stage_params
backward = riccati.backward
backward_without_factorization = riccati.backward_no_refactor
forward = riccati.forward


def solve(problem: LQRProblem, it: ADMMIterates, x0, sigma: float):
    """update_problem_data + backward + forward in one call.

    Returns (ws, factors): ws is the (N+1, nz) trajectory [u_k; x_k].
    """
    params = make_stage_params(problem, it, sigma)
    factors = riccati.backward(problem, params, it.rho)
    ws = riccati.forward(problem, factors, x0)
    return ws, factors


def resolve(problem: LQRProblem, it: ADMMIterates, x0, sigma: float,
            factors: RiccatiFactors):
    """Re-solve with cached factors (rho/sigma unchanged) — the ADMM
    steady-state fast path (lqr_solver.hpp:65-70)."""
    params = make_stage_params(problem, it, sigma)
    factors = riccati.backward_no_refactor(problem, params, it.rho, factors)
    ws = riccati.forward(problem, factors, x0)
    return ws, factors


solve_batched = jax.vmap(solve, in_axes=(0, 0, 0, None))
