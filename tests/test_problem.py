"""build_problem: per-stage variable constraint counts (reference ncs,
lqr_model.hpp:71-88) and exactness of the zero-rho row padding."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pdp_lqr_tpu import build_problem, init_iterates
from pdp_lqr_tpu.problem import ADMMIterates
from pdp_lqr_tpu.solvers import sequential
from pdp_lqr_tpu.utils import oracle

SIGMA = 1e-6
A2 = np.array([[1.0, 0.1], [0.0, 1.0]])
B2 = np.array([[0.005], [0.1]])
Q2 = np.eye(2)
R2 = np.array([[0.1]])


def _mixed_problem(N=6):
    """Different nc per stage: 1 row at k=0, 2 rows at k=2, none
    elsewhere, x-only terminal row given with nx columns."""
    entries = [None] * N + [None]
    entries[0] = (np.array([[1.0, 0.0, 0.0]]), [-0.5], [0.5])        # |u|<=.5
    entries[2] = (
        np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
        [-0.4, -1.0], [0.4, 1.0],
    )
    entries[N] = (np.array([[1.0, 0.0]]), [-0.2], [0.2])             # x1 box
    return build_problem(
        A=A2, B=B2, c=None, Q=Q2, R=R2, q=np.zeros(2), r=None,
        stage_constraints=entries, N=N,
    ), entries


def test_stage_constraints_structure():
    p, _ = _mixed_problem()
    assert p.nc == 2
    D = np.asarray(p.D)
    # Padded rows are exactly zero with infinite bounds.
    assert np.all(D[0, 1] == 0) and np.all(D[1] == 0)
    assert np.asarray(p.e_ub)[0, 1] == np.inf
    assert np.asarray(p.e_lb)[3, 0] == -np.inf
    # Terminal row was padded from nx to nz columns, u-cols zero.
    assert np.all(D[-1, 0, :1] == 0) and D[-1, 0, 1] == 1.0
    # init_iterates masks rho to zero on every padded row.
    it = init_iterates(p, rho=0.3)
    rho = np.asarray(it.rho)
    assert rho[0, 0] == 0.3 and rho[0, 1] == 0.0
    assert np.all(rho[1] == 0) and np.all(rho[2] == 0.3)
    assert rho[-1, 0] == 0.3 and rho[-1, 1] == 0.0


def test_stage_constraints_solve_matches_oracle():
    p, _ = _mixed_problem()
    it = init_iterates(p, rho=0.1)
    x0 = jnp.array([0.3, -0.2])
    ws, _ = sequential.solve(p, it, x0, SIGMA)
    ws_ref = oracle.solve_kkt_dense(p, it, SIGMA, np.asarray(x0))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-10)


def test_padding_is_exact():
    """Extra all-padding rows must not change the solution at all."""
    p, _ = _mixed_problem()
    it = init_iterates(p, rho=0.1)
    x0 = jnp.array([0.3, -0.2])
    ws, _ = sequential.solve(p, it, x0, SIGMA)

    pad = 3
    Np1 = p.N + 1
    wide = dataclasses.replace(
        p,
        D=jnp.concatenate([p.D, jnp.zeros((Np1, pad, p.nz))], axis=1),
        e_lb=jnp.concatenate([p.e_lb, jnp.full((Np1, pad), -jnp.inf)], axis=1),
        e_ub=jnp.concatenate([p.e_ub, jnp.full((Np1, pad), jnp.inf)], axis=1),
    )
    z = jnp.zeros((Np1, pad), p.H.dtype)
    it_w = ADMMIterates(
        w=it.w,
        y=jnp.concatenate([it.y, z], axis=1),
        z=jnp.concatenate([it.z, z], axis=1),
        rho=jnp.concatenate([it.rho, z], axis=1),
    )
    ws_w, _ = sequential.solve(wide, it_w, x0, SIGMA)
    np.testing.assert_array_equal(np.asarray(ws), np.asarray(ws_w))


def test_stage_constraints_validation():
    entries = [None] * 7
    entries[0] = (np.array([[1.0, 0.0]]), [-1], [1])  # wrong col count
    with pytest.raises(ValueError, match="columns"):
        build_problem(A=A2, B=B2, c=None, Q=Q2, R=R2, q=np.zeros(2),
                      r=None, stage_constraints=entries, N=6)
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_problem(A=A2, B=B2, c=None, Q=Q2, R=R2, q=np.zeros(2),
                      r=None, D=np.zeros((1, 3)), e_lb=[-1], e_ub=[1],
                      stage_constraints=[None] * 6, N=6)
    with pytest.raises(ValueError, match="entries"):
        build_problem(A=A2, B=B2, c=None, Q=Q2, R=R2, q=np.zeros(2),
                      r=None, stage_constraints=[None] * 3, N=6)
    bad_term = [None] * 6 + [(np.array([[1.0, 1.0, 1.0]]), [-1], [1])]
    with pytest.raises(ValueError, match="terminal"):
        build_problem(A=A2, B=B2, c=None, Q=Q2, R=R2, q=np.zeros(2),
                      r=None, stage_constraints=bad_term, N=6)
