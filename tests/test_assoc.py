"""Parity: associative-scan Riccati vs sequential scan vs oracles.

The associative decomposition is algebraically exact, so agreement with
the sequential solver should be near roundoff (SURVEY.md section 7
phase 2 target: <= 1e-10 in f64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates, make_stage_params
from pdp_lqr_tpu.models import quadrotor, random_lq
from pdp_lqr_tpu.ops import riccati, riccati_assoc
from pdp_lqr_tpu.solvers import assoc, sequential
from pdp_lqr_tpu.utils import oracle

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


@pytest.mark.parametrize("nx,nu,N,nc,seed", [
    (2, 1, 5, 0, 0),
    (4, 2, 32, 0, 1),
    (8, 3, 50, 2, 2),      # N not a power of two
    (12, 4, 64, 5, 3),
])
def test_cost_to_go_matches_sequential(nx, nu, N, nc, seed):
    """P_k, p_k from the suffix scan == the sequential recursion."""
    problem = random_lq(nx, nu, N, nc=nc, seed=seed)
    it = _random_iterates(problem, seed + 50) if nc else init_iterates(problem, rho=RHO)
    params = make_stage_params(problem, it, SIGMA)

    P, p = riccati_assoc.cost_to_go(problem, params, it.rho)

    fac = riccati.backward(problem, params, it.rho)
    # Sequential P_k = Lxx_k Lxx_k^T, p_k from the lp vectors.
    Lxx = np.concatenate(
        [np.asarray(fac.L)[:, nu:, nu:], np.asarray(fac.LxxN)[None]], axis=0
    )
    P_seq = Lxx @ np.swapaxes(Lxx, -1, -2)
    p_seq = np.concatenate(
        [np.asarray(fac.lp)[:, nu:], np.asarray(fac.pN)[None]], axis=0
    )
    np.testing.assert_allclose(np.asarray(P), P_seq, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p), p_seq, atol=1e-9)


@pytest.mark.parametrize("nx,nu,N,nc,seed", [
    (2, 1, 5, 0, 0),
    (4, 2, 32, 0, 1),
    (8, 3, 50, 2, 2),
    (12, 4, 64, 5, 3),
])
def test_assoc_solve_matches_sequential(nx, nu, N, nc, seed):
    problem = random_lq(nx, nu, N, nc=nc, seed=seed)
    it = _random_iterates(problem, seed + 50) if nc else init_iterates(problem, rho=RHO)
    x0 = _x0(problem, seed)
    ws_a, _ = jax.jit(assoc.solve, static_argnums=3)(problem, it, x0, SIGMA)
    ws_s, _ = sequential.solve(problem, it, x0, SIGMA)
    np.testing.assert_allclose(np.asarray(ws_a), np.asarray(ws_s), atol=1e-10)


def test_assoc_matches_oracle_quadrotor():
    problem, _ = quadrotor(N=100)
    it = init_iterates(problem, rho=RHO)
    x0 = jnp.zeros(problem.nx)
    ws, _ = assoc.solve(problem, it, x0, SIGMA)
    ws_ref = oracle.solve_kkt_dense(problem, it, SIGMA, np.zeros(problem.nx))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-6)


def test_assoc_no_refactor_matches():
    """Log-depth cached-factor path == full solve when rho unchanged."""
    problem = random_lq(6, 2, 25, nc=3, seed=7)
    it = init_iterates(problem, rho=RHO)
    x0 = _x0(problem, 7)
    _, factors = assoc.solve(problem, it, x0, SIGMA)
    it2 = _random_iterates(problem, 8)
    ws_fast, _ = assoc.resolve(problem, it2, x0, SIGMA, factors)
    ws_full, _ = assoc.solve(problem, it2, x0, SIGMA)
    np.testing.assert_allclose(
        np.asarray(ws_fast), np.asarray(ws_full), atol=1e-10
    )


def test_assoc_factors_interchangeable_with_sequential():
    """assoc backward + sequential forward (and vice versa) agree:
    the factor caches are the same mathematical objects."""
    problem = random_lq(5, 2, 20, nc=2, seed=11)
    it = init_iterates(problem, rho=RHO)
    x0 = _x0(problem, 11)
    params = make_stage_params(problem, it, SIGMA)

    fac_a = assoc.backward(problem, params, it.rho)
    fac_s = riccati.backward(problem, params, it.rho)
    np.testing.assert_allclose(
        np.asarray(fac_a.L), np.asarray(fac_s.L), atol=1e-9
    )
    ws_mix1 = riccati.forward(problem, fac_a, x0)
    ws_mix2 = assoc.forward(problem, fac_s, x0)
    np.testing.assert_allclose(
        np.asarray(ws_mix1), np.asarray(ws_mix2), atol=1e-10
    )


@pytest.mark.parametrize("a_scale,q_span", [
    (0.95, 2),     # stable, mild costs
    (1.05, 6),     # unstable rho(A) = 1.05, cost diag spanning 1e6
])
def test_assoc_f32_stability_long_horizon(a_scale, q_span):
    """Ill-conditioned N=1024 f32-vs-f64 stress (VERDICT r3 weak #4).

    Quantifies the plain (A, b, C, eta, J) LU-combine's f32 error
    amplification vs the Cholesky-per-stage sequential recursion.
    Measured (this test's shapes): sequential-f32 ~3e-7 relative,
    assoc-f32 ~3-6e-5 — a ~100x amplification that stays BOUNDED
    (no blow-up) and sits within serving ADMM tolerances (1e-3..1e-4)
    but not tight ones.  This is the basis for the documented decision
    in BASELINE.md: assoc is the low-batch long-horizon LATENCY
    backend and a diagnostic witness, not a throughput path.
    """
    from pdp_lqr_tpu.problem import build_problem

    N, nx, nu = 1024, 8, 2
    rng = np.random.default_rng(3)
    M = rng.normal(size=(nx, nx)) / np.sqrt(nx)
    A = a_scale * M / max(1e-9, np.max(np.abs(np.linalg.eigvals(M))))
    B = rng.normal(size=(nx, nu))
    Q = np.diag(np.logspace(-q_span / 2, q_span / 2, nx))
    problem = build_problem(
        A=A, B=B, c=np.zeros(nx), Q=Q, R=0.01 * np.eye(nu),
        q=np.ones(nx), r=None, N=N)
    it = init_iterates(problem, rho=RHO)
    x0 = jnp.asarray(rng.normal(size=nx) * 0.5)

    ws64, _ = sequential.solve(problem, it, x0, SIGMA)
    f32 = lambda t: jax.tree.map(lambda x: x.astype(jnp.float32), t)
    p32, it32, x032 = f32(problem), f32(it), x0.astype(jnp.float32)
    ws_s32, _ = sequential.solve(p32, it32, x032, SIGMA)
    ws_a32, _ = assoc.solve(p32, it32, x032, SIGMA)

    scale = float(jnp.abs(ws64).max())
    err_s = float(jnp.abs(ws_s32 - ws64).max()) / scale
    err_a = float(jnp.abs(ws_a32 - ws64).max()) / scale
    assert np.isfinite(err_a), "assoc f32 blew up"
    assert err_s < 1e-5
    # Bounded amplification: stays inside serving tolerance.
    assert err_a < 5e-4, f"assoc f32 rel err {err_a:.3e}"


def test_assoc_vmap_batching():
    problems = [random_lq(4, 2, 16, nc=2, seed=s) for s in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *problems)
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    x0s = jnp.stack([_x0(p, s) for s, p in enumerate(problems)])
    ws_b, _ = assoc.solve_batched(stacked, its, x0s, SIGMA)
    for i, p in enumerate(problems):
        it = jax.tree.map(lambda x: x[i], its)
        ws_i, _ = assoc.solve(p, it, x0s[i], SIGMA)
        np.testing.assert_allclose(
            np.asarray(ws_b[i]), np.asarray(ws_i), atol=1e-12
        )
