"""Parity tests: JAX sequential Riccati vs NumPy oracle vs dense KKT.

Mirrors the reference's de-facto test, the three-way solver cross-check
in examples/lqr_example.cpp:174-221, but automated and randomized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates, make_stage_params
from pdp_lqr_tpu.models import double_integrator, quadrotor, random_lq
from pdp_lqr_tpu.solvers import sequential
from pdp_lqr_tpu.utils import oracle

SIGMA = 1e-6
RHO = 0.01


def _x0(problem, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=problem.nx) * 0.1)


def test_oracle_self_consistency_quadrotor():
    """NumPy Riccati oracle == dense KKT oracle on the reference example."""
    problem, _ = quadrotor(N=20)
    it = init_iterates(problem, rho=RHO)
    x0 = np.zeros(problem.nx)
    ws_r = oracle.riccati_numpy(problem, it, SIGMA, x0)
    ws_k = oracle.solve_kkt_dense(problem, it, SIGMA, x0)
    np.testing.assert_allclose(ws_r, ws_k, atol=1e-9)


def test_sequential_matches_oracle_quadrotor():
    """Unconstrained quadrotor N=100 (the reference example config)."""
    problem, _ = quadrotor(N=100)
    it = init_iterates(problem, rho=RHO)
    x0 = jnp.zeros(problem.nx)
    ws, _ = jax.jit(sequential.solve, static_argnums=3)(problem, it, x0, SIGMA)
    ws_ref = oracle.solve_kkt_dense(problem, it, SIGMA, np.zeros(problem.nx))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-6)


@pytest.mark.parametrize("nx,nu,N,nc,seed", [
    (2, 1, 5, 0, 0),
    (4, 2, 30, 0, 1),
    (8, 3, 50, 2, 2),
    (12, 4, 40, 5, 3),
])
def test_sequential_matches_oracle_random(nx, nu, N, nc, seed):
    problem = random_lq(nx, nu, N, nc=nc, seed=seed)
    it = init_iterates(problem, rho=RHO)
    rng = np.random.default_rng(seed + 100)
    # Random ADMM iterates exercise the g = z - y/rho path.
    if nc > 0:
        it = type(it)(
            w=jnp.asarray(rng.normal(size=it.w.shape) * 0.1),
            y=jnp.asarray(rng.normal(size=it.y.shape) * 0.1),
            z=jnp.asarray(rng.normal(size=it.z.shape) * 0.1),
            rho=it.rho,
        )
    x0 = _x0(problem, seed)
    ws, _ = jax.jit(sequential.solve, static_argnums=3)(problem, it, x0, SIGMA)
    ws_np = oracle.riccati_numpy(problem, it, SIGMA, np.asarray(x0))
    ws_kkt = oracle.solve_kkt_dense(problem, it, SIGMA, np.asarray(x0))
    np.testing.assert_allclose(np.asarray(ws), ws_np, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ws), ws_kkt, atol=1e-7)


def test_without_factorization_matches():
    """Cached-factor fast path == full backward when rho unchanged.

    Reference semantics: lqr_solver.hpp:65-70 redoes only vector work.
    """
    problem = random_lq(6, 2, 25, nc=3, seed=7)
    it = init_iterates(problem, rho=RHO)
    x0 = _x0(problem, 7)
    ws1, factors = sequential.solve(problem, it, x0, SIGMA)
    # Change only the linear data (new ADMM iterates), keep rho.
    rng = np.random.default_rng(8)
    it2 = type(it)(
        w=jnp.asarray(rng.normal(size=it.w.shape) * 0.1),
        y=jnp.asarray(rng.normal(size=it.y.shape) * 0.1),
        z=jnp.asarray(rng.normal(size=it.z.shape) * 0.1),
        rho=it.rho,
    )
    ws_fast, _ = sequential.resolve(problem, it2, x0, SIGMA, factors)
    ws_full, _ = sequential.solve(problem, it2, x0, SIGMA)
    np.testing.assert_allclose(
        np.asarray(ws_fast), np.asarray(ws_full), atol=1e-12
    )


def test_vmap_batching():
    """Batched solve == loop of single solves."""
    problems = [random_lq(4, 2, 15, nc=2, seed=s) for s in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    x0s = jnp.stack([_x0(p, s) for s, p in enumerate(problems)])
    ws_b, _ = sequential.solve_batched(stacked, its, x0s, SIGMA)
    for i, p in enumerate(problems):
        it = jax.tree.map(lambda x: x[i], its)
        ws_i, _ = sequential.solve(p, it, x0s[i], SIGMA)
        np.testing.assert_allclose(
            np.asarray(ws_b[i]), np.asarray(ws_i), atol=1e-12
        )


def test_costates_zero_x_stationarity():
    """Adjoint costates zero the x-rows of the KKT stationarity."""
    problem = random_lq(5, 2, 20, nc=2, seed=11)
    it = init_iterates(problem, rho=RHO)
    x0 = _x0(problem, 11)
    params = make_stage_params(problem, it, SIGMA)
    ws, _ = sequential.solve(problem, it, x0, SIGMA)
    from pdp_lqr_tpu.ops import riccati

    lams = riccati.costates(problem, params, it.rho, ws)
    # u-stationarity: grad_u + B^T lambda_{k+1} == 0 for every stage.
    from pdp_lqr_tpu.ops.riccati import penalty_fold

    H, h = penalty_fold(params.H, params.h, problem.D, it.rho, params.g)
    nu = problem.nu
    for k in range(problem.N):
        grad_u = H[k, :nu, :] @ ws[k] + h[k, :nu]
        res = grad_u + problem.B[k].T @ lams[k]
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-9)
