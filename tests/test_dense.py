"""Parity: dense P-form Riccati vs sequential (and unrolled linalg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates, make_stage_params
from pdp_lqr_tpu.models import quadrotor, random_lq
from pdp_lqr_tpu.ops import linalg
from pdp_lqr_tpu.solvers import dense, sequential

SIGMA = 1e-6
RHO = 0.01


def _x0(problem, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=problem.nx) * 0.1)


def _random_iterates(problem, seed):
    it = init_iterates(problem, rho=RHO)
    rng = np.random.default_rng(seed)
    return type(it)(
        w=jnp.asarray(rng.normal(size=it.w.shape) * 0.1),
        y=jnp.asarray(rng.normal(size=it.y.shape) * 0.1),
        z=jnp.asarray(rng.normal(size=it.z.shape) * 0.1),
        rho=it.rho,
    )


@pytest.mark.parametrize("n,k", [(1, 1), (3, 2), (6, 4), (12, 3)])
def test_unrolled_ge_solve(n, k):
    """General unrolled GE with branch-free partial pivoting."""
    rng = np.random.default_rng(n * 7 + k)
    A = jnp.asarray(rng.normal(size=(5, n, n)))
    # Include a permutation-heavy case: zero diagonal via row roll.
    A = A.at[0].set(jnp.roll(A[0], 1, axis=0))
    B = jnp.asarray(rng.normal(size=(5, n, k)))
    X = linalg.ge_solve_unrolled(A, B)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), atol=1e-9)


@pytest.mark.parametrize("n,k", [(1, 1), (2, 3), (4, 5), (8, 2)])
def test_unrolled_triangular_solves(n, k):
    rng = np.random.default_rng(n + k)
    G = rng.normal(size=(4, n, n))
    M = jnp.asarray(G @ np.swapaxes(G, -1, -2) + n * np.eye(n))
    L = linalg.cholesky_unrolled(M)
    B = jnp.asarray(rng.normal(size=(4, n, k)))
    Y = linalg.solve_lower_unrolled(L, B)
    np.testing.assert_allclose(np.asarray(L @ Y), np.asarray(B), atol=1e-10)
    Z = linalg.solve_lower_T_unrolled(L, B)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(L, -1, -2) @ Z), np.asarray(B), atol=1e-10
    )


@pytest.mark.parametrize("n,k", [(1, 1), (2, 3), (4, 5), (8, 2)])
def test_unrolled_chol_solve(n, k):
    rng = np.random.default_rng(n * 10 + k)
    G = rng.normal(size=(7, n, n))
    M = jnp.asarray(G @ np.swapaxes(G, -1, -2) + n * np.eye(n))
    B = jnp.asarray(rng.normal(size=(7, n, k)))
    X = linalg.spd_solve_unrolled(M, B)
    np.testing.assert_allclose(
        np.asarray(M @ X), np.asarray(B), atol=1e-10
    )
    L = linalg.cholesky_unrolled(M)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(M)), atol=1e-10
    )


@pytest.mark.parametrize("nx,nu,N,nc,seed", [
    (2, 1, 5, 0, 0),
    (4, 2, 30, 0, 1),
    (8, 3, 50, 2, 2),
    (12, 4, 40, 5, 3),
])
def test_dense_matches_sequential(nx, nu, N, nc, seed):
    problem = random_lq(nx, nu, N, nc=nc, seed=seed)
    it = _random_iterates(problem, seed + 50) if nc else init_iterates(problem, rho=RHO)
    x0 = _x0(problem, seed)
    ws_d, _ = jax.jit(dense.solve, static_argnums=3)(problem, it, x0, SIGMA)
    ws_s, _ = sequential.solve(problem, it, x0, SIGMA)
    np.testing.assert_allclose(np.asarray(ws_d), np.asarray(ws_s), atol=1e-9)


def test_dense_quadrotor_long_horizon_stability():
    """P-form stays accurate over N=500 (no square-root safety net)."""
    problem, _ = quadrotor(N=500)
    it = init_iterates(problem, rho=RHO)
    x0 = jnp.zeros(problem.nx)
    ws_d, _ = dense.solve(problem, it, x0, SIGMA)
    ws_s, _ = sequential.solve(problem, it, x0, SIGMA)
    np.testing.assert_allclose(np.asarray(ws_d), np.asarray(ws_s), atol=1e-8)


def test_dense_no_refactor_matches():
    problem = random_lq(6, 2, 25, nc=3, seed=7)
    it = init_iterates(problem, rho=RHO)
    x0 = _x0(problem, 7)
    _, factors = dense.solve(problem, it, x0, SIGMA)
    it2 = _random_iterates(problem, 8)
    ws_fast, _ = dense.resolve(problem, it2, x0, SIGMA, factors)
    ws_full, _ = dense.solve(problem, it2, x0, SIGMA)
    np.testing.assert_allclose(
        np.asarray(ws_fast), np.asarray(ws_full), atol=1e-10
    )


def test_dense_vmap_batching():
    problems = [random_lq(4, 2, 15, nc=2, seed=s) for s in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    x0s = jnp.stack([_x0(p, s) for s, p in enumerate(problems)])
    ws_b, _ = dense.solve_batched(stacked, its, x0s, SIGMA)
    for i, p in enumerate(problems):
        it = jax.tree.map(lambda x: x[i], its)
        ws_i, _ = dense.solve(p, it, x0s[i], SIGMA)
        np.testing.assert_allclose(
            np.asarray(ws_b[i]), np.asarray(ws_i), atol=1e-12
        )
