"""Native C++ batch engine vs the JAX backends and NumPy oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.models import quadrotor, random_lq
from pdp_lqr_tpu.solvers import sequential
from pdp_lqr_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native engine"
)

SIGMA = 1e-6


def _batch(problem, B, seed=0):
    rng = np.random.default_rng(seed)
    tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    bp = jax.tree.map(tile, problem)
    bp = dataclasses.replace(
        bp, c=bp.c + jnp.asarray(rng.normal(size=bp.c.shape) * 0.01)
    )
    its = jax.vmap(lambda p: init_iterates(p, rho=0.01))(bp)
    x0 = jnp.asarray(rng.normal(size=(B, problem.nx)) * 0.1)
    return bp, its, x0


def test_native_matches_jax_quadrotor():
    problem, _ = quadrotor(N=50, constrained=True)
    bp, its, x0 = _batch(problem, B=3)
    ws_n = native.solve_batch(bp, its, x0, SIGMA)
    ws_j, _ = sequential.solve_batched(bp, its, x0, SIGMA)
    np.testing.assert_allclose(ws_n, np.asarray(ws_j), atol=1e-9)


def test_native_matches_jax_random_constrained():
    problem = random_lq(6, 3, 30, nc=4, seed=5)
    bp, its, x0 = _batch(problem, B=4, seed=5)
    # Random iterates exercise the g = z - y/rho path.
    rng = np.random.default_rng(55)
    its = type(its)(
        w=jnp.asarray(rng.normal(size=its.w.shape) * 0.1),
        y=jnp.asarray(rng.normal(size=its.y.shape) * 0.1),
        z=jnp.asarray(rng.normal(size=its.z.shape) * 0.1),
        rho=its.rho,
    )
    ws_n = native.solve_batch(bp, its, x0, SIGMA)
    ws_j, _ = sequential.solve_batched(bp, its, x0, SIGMA)
    np.testing.assert_allclose(ws_n, np.asarray(ws_j), atol=1e-9)


def test_native_multithreaded_deterministic():
    problem = random_lq(4, 2, 20, nc=2, seed=9)
    bp, its, x0 = _batch(problem, B=16, seed=9)
    ws1 = native.solve_batch(bp, its, x0, SIGMA, n_threads=1)
    ws8 = native.solve_batch(bp, its, x0, SIGMA, n_threads=8)
    np.testing.assert_array_equal(ws1, ws8)
