"""Model-zoo coverage mapped to the BASELINE.json benchmark configs.

  #1 double integrator — covered in test_mpc / test_admm
  #2 mass-spring chain (nx=40, nu=10): sequential vs parallel parity
  #3 quadrotor + thrust cone: ADMM feasibility
  #5 centroidal friction cones: ADMM feasibility (reduced N for CPU)
"""

import jax
import jax.numpy as jnp
import numpy as np

from pdp_lqr_tpu import init_iterates
from pdp_lqr_tpu.models import centroidal, mass_spring_chain, quadrotor
from pdp_lqr_tpu.solvers import admm, assoc, dense, pdp, sequential

SIGMA = 1e-6


def test_mass_spring_seq_vs_parallel_parity():
    """BASELINE config #2: nx=40, nu=10, sequential vs PDP vs assoc."""
    problem = mass_spring_chain(n_masses=20, N=64)
    assert problem.nx == 40 and problem.nu == 10
    it = init_iterates(problem, rho=0.01)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=problem.nx) * 0.1)
    ws_s, _ = sequential.solve(problem, it, x0, SIGMA)
    ws_p, _ = pdp.solve(problem, it, x0, SIGMA, 8)
    ws_a, _ = assoc.solve(problem, it, x0, SIGMA)
    ws_d, _ = dense.solve(problem, it, x0, SIGMA)
    np.testing.assert_allclose(np.asarray(ws_p), np.asarray(ws_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ws_a), np.asarray(ws_s), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ws_d), np.asarray(ws_s), atol=1e-8)


def test_quadrotor_thrust_cone_admm():
    """BASELINE config #3 (reduced N): thrust SOC binds and is respected."""
    problem, cones = quadrotor(N=16, constrained=True, thrust_cone=True)
    off = cones[0][0]
    assert cones == [(off, 3)] and off == 16  # after nu + nx box rows
    settings = admm.ADMMSettings(max_iter=400, rho=0.1)
    ws, _, info = admm.solve(problem, jnp.zeros(12), tuple(cones), settings)
    assert bool(info.converged), f"not converged: {info}"
    ws_np = np.asarray(ws)
    D = np.asarray(problem.D)
    vals = np.einsum("kcz,kz->kc", D, ws_np)
    t = vals[:-1, off]
    v = vals[:-1, off + 1 : off + 3]
    assert np.all(np.linalg.norm(v, axis=-1) <= t + 1e-4)


def test_centroidal_friction_cones_admm():
    """BASELINE config #5 (reduced N): contact forces stay in cones."""
    problem, cones = centroidal(N=24, dtype=jnp.float64)
    # Forces are O(100 N); 1e-5 absolute tolerance is ample at that scale.
    settings = admm.ADMMSettings(max_iter=400, rho=1.0, eps_abs=1e-5)
    x0 = jnp.zeros(problem.nx)
    ws, _, info = admm.solve(problem, x0, tuple(cones), settings)
    assert bool(info.converged), f"not converged: {info}"
    ws_np = np.asarray(ws)
    mu = 0.7
    for i in range(2):  # n_feet = 2
        f = ws_np[:-1, 3 * i : 3 * i + 3]   # (fx, fy, fz) per stage
        assert np.all(
            np.linalg.norm(f[:, :2], axis=-1) <= mu * f[:, 2] + 1e-4
        ), f"friction cone violated for foot {i}"
    # The solve actually does something: forces support the robot.
    assert np.asarray(ws)[:-1, 2].mean() > 1.0  # nonzero vertical forces


def test_centroidal_unconstrained_backends_agree():
    problem, _ = centroidal(N=32)
    import dataclasses

    unc = dataclasses.replace(
        problem,
        D=jnp.zeros((problem.N + 1, 0, problem.nz)),
        e_lb=jnp.zeros((problem.N + 1, 0)),
        e_ub=jnp.zeros((problem.N + 1, 0)),
    )
    it = init_iterates(unc, rho=0.01)
    x0 = jnp.zeros(unc.nx)
    ws_s, _ = sequential.solve(unc, it, x0, SIGMA)
    ws_d, _ = dense.solve(unc, it, x0, SIGMA)
    ws_a, _ = assoc.solve(unc, it, x0, SIGMA)
    np.testing.assert_allclose(np.asarray(ws_d), np.asarray(ws_s), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ws_a), np.asarray(ws_s), atol=1e-7)


def test_rocket_landing_oracle_and_cones():
    """Rocket soft-landing (two SOC blocks + thrust box): ADMM is
    feasible, certified stationary (exact OSQP residuals ~0), and its
    objective dominates the scipy witness.

    Trajectory-level oracle parity is checked on the quadrotor /
    centroidal cone tests; this instance grazes the glideslope vertex
    and has near-flat thrust-allocation directions, where trust-constr
    stops short of the optimum (it lands ~0.4% ABOVE the ADMM
    objective) — so the witness provides a one-sided bound here.
    """
    from pdp_lqr_tpu.models import rocket, rocket_x0
    from pdp_lqr_tpu.utils import oracle, quality

    problem, cones = rocket(N=10, dt=1.2, dtype=jnp.float64)
    cones = tuple(cones)
    x0 = rocket_x0()
    settings = admm.ADMMSettings(
        max_iter=400, rho=1.0, rho_update_interval=10,
        eps_abs=1e-5, eps_rel=1e-5,
    )
    ws, _, info = admm.solve(problem, x0, cones, settings)
    # The loop runs all 400 iterations (no early exit by design);
    # final residuals are ~1e-5 absolute on this scale-~90 problem.
    assert bool(info.converged)
    q = quality.assess(problem, ws, cones)
    assert float(q.dyn_residual) < 1e-8
    assert float(q.box_violation) < 1e-5
    assert float(q.cone_violation) < 5e-5
    ws_ref = oracle.solve_constrained_qp(problem, x0, cones)
    q_ref = quality.assess(problem, jnp.asarray(ws_ref), cones)
    # Feasible + stationarity-certified + at least as good as the
    # independent witness => optimal (the witness cannot beat f*).
    margin = 1e-6 * abs(float(q_ref.objective))
    assert float(q.objective) <= float(q_ref.objective) + margin

    vals = np.asarray(ws)
    us = vals[:-1, :3]
    xs = vals[:, 3:]
    tan_gim = np.tan(np.deg2rad(20.0))
    tan_gs = np.tan(np.deg2rad(45.0))
    assert np.all(
        np.linalg.norm(us[:, :2], axis=-1) <= tan_gim * us[:, 2] + 1e-3
    )
    assert np.all(
        np.linalg.norm(xs[:, :2], axis=-1) <= tan_gs * xs[:, 2] + 1e-2
    )
    assert np.all(us[:, 2] <= 80.0 + 1e-5)
    # It descends toward the pad.
    assert xs[-1, 2] < 0.2 * xs[0, 2]
