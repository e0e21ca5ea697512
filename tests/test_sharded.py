"""Multi-chip == single-chip parity on a simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.config import CondensedSolverType
from pdp_lqr_tpu.models import random_lq, quadrotor
from pdp_lqr_tpu.parallel import make_mesh
from pdp_lqr_tpu.parallel import pdp_sharded
from pdp_lqr_tpu.solvers import sequential

SIGMA = 1e-6
RHO = 0.01


def _batch(problems):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *problems)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_pdp_matches_sequential(mesh_shape):
    b_axis, t_axis = mesh_shape
    B, N = 8, 32
    problems = [random_lq(6, 3, N, nc=2, seed=s) for s in range(B)]
    stacked = _batch(problems)
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.normal(size=(B, 6)) * 0.1)

    mesh = make_mesh(batch=b_axis, time=t_axis)
    ws = pdp_sharded.solve(mesh, stacked, its, x0s, SIGMA)

    for i, p in enumerate(problems):
        it = jax.tree.map(lambda x: x[i], its)
        ws_i, _ = sequential.solve(p, it, x0s[i], SIGMA)
        np.testing.assert_allclose(
            np.asarray(ws[i]), np.asarray(ws_i), atol=1e-9
        )


def test_sharded_pdp_lu_variant():
    B, N = 4, 24
    problems = [random_lq(4, 2, N, nc=0, seed=10 + s) for s in range(B)]
    stacked = _batch(problems)
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    x0s = jnp.zeros((B, 4))
    mesh = make_mesh(batch=1, time=8)
    ws = pdp_sharded.solve(
        mesh, stacked, its, x0s, SIGMA, CondensedSolverType.LU
    )
    for i, p in enumerate(problems):
        it = jax.tree.map(lambda x: x[i], its)
        ws_i, _ = sequential.solve(p, it, x0s[i], SIGMA)
        np.testing.assert_allclose(
            np.asarray(ws[i]), np.asarray(ws_i), atol=1e-9
        )


def test_sharded_quadrotor():
    problem, _ = quadrotor(N=96)
    B = 4
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), problem
    )
    its = jax.vmap(lambda p: init_iterates(p, rho=RHO))(stacked)
    x0s = jnp.zeros((B, 12))
    mesh = make_mesh(batch=2, time=4)
    ws = pdp_sharded.solve(mesh, stacked, its, x0s, SIGMA)
    ws_seq, _ = sequential.solve(
        problem, init_iterates(problem, rho=RHO), x0s[0], SIGMA
    )
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(ws[i]), np.asarray(ws_seq), atol=1e-8
        )
