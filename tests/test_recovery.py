"""Masked non-SPD bump-and-retry (solvers/recovery).

The engineered scenario the verdict asks for: one indefinite instance
inside a healthy batch — healthy lanes bit-identical, sick lane
recovered — beating the reference's ignored failure bool
(condensed_system.hpp:217-226, lqr_solver_parallel.hpp:145).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.models import quadrotor
from pdp_lqr_tpu.ops import pallas_riccati
from pdp_lqr_tpu.solvers import dense, recovery, sequential

SIGMA = 1e-6


def _mixed_batch(B=4, sick=1, N=10):
    """Healthy quadrotor batch with instance ``sick`` made indefinite
    (negative R block -> chol(Huu) NaNs at tiny sigma)."""
    problem, _ = quadrotor(N=N, constrained=True)
    rng = np.random.default_rng(0)
    tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    bp = jax.tree.map(tile, problem)
    bp = dataclasses.replace(
        bp, c=bp.c + jnp.asarray(
            rng.normal(size=bp.c.shape) * 0.01, bp.c.dtype))
    nu = problem.nu
    Hsick = bp.H[sick].at[:, :nu, :nu].add(
        -5.0 * jnp.eye(nu, dtype=bp.H.dtype))
    bp = dataclasses.replace(bp, H=bp.H.at[sick].set(Hsick))
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    x0 = jnp.asarray(rng.normal(size=(B, problem.nx)) * 0.1, bp.c.dtype)
    return bp, its, x0


def _fn_dense(p, i, x, s):
    return dense.solve_batched(p, i, x, s)[0]


def _fn_seq(p, i, x, s):
    return sequential.solve_batched(p, i, x, s)[0]


def _fn_pallas(p, i, x, s):
    return pallas_riccati.solve_lanes(p, i, x, s, interpret=True)


def test_recovery_mixed_batch_dense():
    bp, its, x0 = _mixed_batch()
    ws_plain = _fn_dense(bp, its, x0, SIGMA)
    fail = np.asarray(recovery.failure_mask(ws_plain))
    assert fail.tolist() == [False, True, False, False]

    ws, info = recovery.solve_with_recovery(
        _fn_dense, bp, its, x0, SIGMA, sigma_bump=10.0, retries=1)
    assert np.asarray(info.failed).tolist() == [False, True, False, False]
    assert np.asarray(info.recovered).tolist() == [False, True, False, False]
    assert not np.asarray(info.still_failed).any()
    assert bool(jnp.all(jnp.isfinite(ws)))
    # Healthy lanes BIT-IDENTICAL to the unrecovered solve.
    for b in (0, 2, 3):
        np.testing.assert_array_equal(
            np.asarray(ws[b]), np.asarray(ws_plain[b]))


def test_recovery_escalation():
    """First bump too small -> second retry (x10) recovers."""
    bp, its, x0 = _mixed_batch()
    ws, info = recovery.solve_with_recovery(
        _fn_dense, bp, its, x0, SIGMA, sigma_bump=1.0, retries=2)
    assert not np.asarray(info.still_failed).any()
    assert float(info.bump[1]) == 10.0


def test_recovery_pallas_backend():
    """The same policy over the fused Pallas path (interpret mode)."""
    bp, its, x0 = _mixed_batch()
    ws, info = recovery.solve_with_recovery(
        _fn_pallas, bp, its, x0, SIGMA, sigma_bump=10.0, retries=1)
    assert np.asarray(info.failed).tolist() == [False, True, False, False]
    assert not np.asarray(info.still_failed).any()


def test_recovery_no_failures_is_identity():
    problem, _ = quadrotor(N=10, constrained=True)
    B = 3
    bp = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), problem)
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    x0 = jnp.full((B, problem.nx), 0.05, problem.c.dtype)
    ws_plain = _fn_seq(bp, its, x0, SIGMA)
    ws, info = recovery.solve_with_recovery(
        _fn_seq, bp, its, x0, SIGMA)
    assert not np.asarray(info.failed).any()
    np.testing.assert_array_equal(np.asarray(ws), np.asarray(ws_plain))
