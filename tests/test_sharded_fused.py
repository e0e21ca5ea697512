"""Fused-PDP time sharding vs sequential on a simulated mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.models import quadrotor, random_lq
from pdp_lqr_tpu.parallel import mesh as mesh_lib, pdp_sharded_fused
from pdp_lqr_tpu.solvers import sequential

SIGMA = 1e-6


def _batched(problem, B, seed=0):
    rng = np.random.default_rng(seed)
    bp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), problem)
    bp = dataclasses.replace(
        bp, c=bp.c + jnp.asarray(rng.normal(size=bp.c.shape) * 0.01)
    )
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    x0 = jnp.asarray(rng.normal(size=(B, problem.nx)) * 0.1)
    return bp, its, x0


@pytest.mark.parametrize("time_axis", [2, 4])
def test_fused_pdp_sharded_matches_sequential(time_axis):
    problem, _ = quadrotor(N=16, constrained=True)
    B = 8 // time_axis * 2
    bp, its, x0 = _batched(problem, B)
    m = mesh_lib.make_mesh(batch=8 // time_axis, time=time_axis)
    ws = pdp_sharded_fused.solve(m, bp, its, x0, SIGMA, interpret=True)
    ws_ref, _ = sequential.solve_batched(bp, its, x0, SIGMA)
    np.testing.assert_allclose(
        np.asarray(ws), np.asarray(ws_ref), atol=1e-8
    )


def test_fused_pdp_sharded_random_unconstrained():
    problem = random_lq(5, 2, 12, nc=0, seed=3)
    bp, its, x0 = _batched(problem, B=4, seed=3)
    m = mesh_lib.make_mesh(batch=2, time=4)
    ws = pdp_sharded_fused.solve(m, bp, its, x0, SIGMA, interpret=True)
    ws_ref, _ = sequential.solve_batched(bp, its, x0, SIGMA)
    np.testing.assert_allclose(
        np.asarray(ws), np.asarray(ws_ref), atol=1e-8
    )
