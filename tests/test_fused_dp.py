"""Data-parallel fused solves on a simulated multi-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.models import quadrotor
from pdp_lqr_tpu.parallel import fused_dp, mesh as mesh_lib
from pdp_lqr_tpu.solvers import sequential

SIGMA = 1e-6


def test_fused_dp_matches_sequential():
    problem, _ = quadrotor(N=8, constrained=True)
    B = 8  # one instance per virtual device
    rng = np.random.default_rng(0)
    bp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), problem)
    bp = dataclasses.replace(
        bp, c=bp.c + jnp.asarray(rng.normal(size=bp.c.shape) * 0.01)
    )
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    x0 = jnp.asarray(rng.normal(size=(B, 12)) * 0.1)

    m = mesh_lib.make_mesh(batch=4, time=2)
    ws = fused_dp.solve(m, bp, its, x0, SIGMA, interpret=True)
    ws_ref, _ = sequential.solve_batched(bp, its, x0, SIGMA)
    np.testing.assert_allclose(
        np.asarray(ws), np.asarray(ws_ref), atol=1e-9
    )
