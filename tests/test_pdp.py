"""PDP parallel solver parity vs the sequential backend.

The reference's own acceptance check is cross-printing sequential vs
parallel trajectories (lqr_example.cpp:206-221); here it is asserted to
tight tolerance over random problems, both condensed variants, and
several segment counts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.config import CondensedSolverType
from pdp_lqr_tpu.models import quadrotor, random_lq
from pdp_lqr_tpu.solvers import pdp, sequential

SIGMA = 1e-6
RHO = 0.01


def _setup(nx, nu, N, nc, seed):
    problem = random_lq(nx, nu, N, nc=nc, seed=seed)
    it = init_iterates(problem, rho=RHO)
    rng = np.random.default_rng(seed + 1000)
    if nc > 0:
        it = dataclasses.replace(
            it,
            w=jnp.asarray(rng.normal(size=it.w.shape) * 0.1),
            y=jnp.asarray(rng.normal(size=it.y.shape) * 0.1),
            z=jnp.asarray(rng.normal(size=it.z.shape) * 0.1),
        )
    x0 = jnp.asarray(rng.normal(size=nx) * 0.1)
    return problem, it, x0


@pytest.mark.parametrize("S", [1, 2, 4, 8])
@pytest.mark.parametrize("solver_type", list(CondensedSolverType))
def test_pdp_matches_sequential_random(S, solver_type):
    problem, it, x0 = _setup(6, 3, 48, 2, seed=S)
    ws_seq, _ = sequential.solve(problem, it, x0, SIGMA)
    ws_pdp, _ = pdp.solve(problem, it, x0, SIGMA, S, solver_type)
    np.testing.assert_allclose(
        np.asarray(ws_pdp), np.asarray(ws_seq), atol=1e-9
    )


def test_pdp_quadrotor_reference_config():
    """Quadrotor N=100, 4 segments, Cholesky — the reference example
    config (lqr_example.cpp:213)."""
    problem, _ = quadrotor(N=100)
    it = init_iterates(problem, rho=RHO)
    x0 = jnp.zeros(problem.nx)
    ws_seq, _ = sequential.solve(problem, it, x0, SIGMA)
    ws_pdp, _ = jax.jit(pdp.solve, static_argnums=(3, 4, 5))(
        problem, it, x0, SIGMA, 4, CondensedSolverType.CHOLESKY
    )
    np.testing.assert_allclose(
        np.asarray(ws_pdp), np.asarray(ws_seq), atol=1e-8
    )


def test_pdp_without_factorization():
    """Fast path: new iterates, cached factors == full re-solve."""
    problem, it, x0 = _setup(5, 2, 32, 3, seed=42)
    _, factors = pdp.solve(problem, it, x0, SIGMA, 4)
    rng = np.random.default_rng(77)
    it2 = dataclasses.replace(
        it,
        w=jnp.asarray(rng.normal(size=it.w.shape) * 0.1),
        y=jnp.asarray(rng.normal(size=it.y.shape) * 0.1),
        z=jnp.asarray(rng.normal(size=it.z.shape) * 0.1),
    )
    ws_fast, _ = pdp.resolve(problem, it2, x0, SIGMA, factors)
    ws_full, _ = pdp.solve(problem, it2, x0, SIGMA, 4)
    np.testing.assert_allclose(
        np.asarray(ws_fast), np.asarray(ws_full), atol=1e-10
    )


def test_pdp_batched():
    problems = [random_lq(4, 2, 24, nc=0, seed=s) for s in range(2)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    x0s = jnp.zeros((2, 4))
    ws_b, _ = pdp.solve_batched(
        stacked, its, x0s, SIGMA, 4, CondensedSolverType.CHOLESKY
    )
    for i, p in enumerate(problems):
        it = jax.tree.map(lambda x: x[i], its)
        ws_i, _ = sequential.solve(p, it, x0s[i], SIGMA)
        np.testing.assert_allclose(
            np.asarray(ws_b[i]), np.asarray(ws_i), atol=1e-9
        )


def test_pdp_indivisible_horizon_raises():
    problem, it, x0 = _setup(4, 2, 30, 0, seed=9)
    with pytest.raises(ValueError, match="divisible"):
        pdp.solve(problem, it, x0, SIGMA, 4)
