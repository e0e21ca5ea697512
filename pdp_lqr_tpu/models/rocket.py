"""Rocket soft-landing MPC (nx=6, nu=3) — conic showcase problem.

A 3-DoF point-mass powered-descent model in the style of the classical
convex powered-landing formulation (Acikmese & Ploen, JGCD 2007; the
"lossless convexification" landing problem), reduced to the LQ-tracking
+ row-wise-conic form this framework (and the reference's missing outer
loop) consumes:

  * dynamics: discrete double integrator with gravity drift
      r+ = r + dt v + dt^2/(2m) T - dt^2/2 g e3
      v+ = v + dt/m T - dt g e3
  * thrust gimbal cone (SOC, 3 rows per stage):
      ||(Tx, Ty)|| <= tan(gimbal) * Tz
  * glideslope cone (SOC, 3 rows per stage):
      ||(rx, ry)|| <= tan(glideslope) * rz
  * thrust box: 0 <= Tz <= T_max (engine cannot push the vehicle down,
    a one-sided row; the classical lower throttle bound is what
    lossless convexification relaxes — here the LQ cost keeps Tz > 0
    in the flight envelope, and a nonzero lower bound can be set)
  * cost: quadratic tracking of the pad (origin, zero velocity) plus
    a linear fuel term on Tz.

This exercises every conic feature end-to-end on physically meaningful
data: two distinct SOC blocks per stage, mixed with box rows, active at
the solution (the optimal descent rides the glideslope).  The reference
models constraints of exactly this row form (lqr_model.hpp:22-24,
e_lb <= D [u;x] <= e_ub) but ships no cone projection; BASELINE.json
config #3 is the quadrotor's single thrust cone — this adds the
two-cone landing geometry on top.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pdp_lqr_tpu.problem import LQRProblem, build_problem

_INF = np.inf


def rocket(
    N: int = 64,
    dt: float = 0.5,
    mass: float = 10.0,
    g: float = 3.71,                 # Mars landing, the classical setting
    t_max: float = 80.0,
    t_min: float = 0.0,
    gimbal_deg: float = 20.0,
    glideslope_deg: float = 45.0,
    fuel_weight: float = 0.05,
    dtype=jnp.float64,
):
    """Build the landing problem.

    Returns (problem, cone_specs): cone_specs has the gimbal SOC and
    the glideslope SOC (offsets into the per-stage constraint rows).
    """
    nx, nu = 6, 3
    nz = nu + nx

    A = np.eye(nx)
    A[:3, 3:] = dt * np.eye(3)
    B = np.zeros((nx, nu))
    B[:3, :] = (dt * dt / (2.0 * mass)) * np.eye(3)
    B[3:, :] = (dt / mass) * np.eye(3)
    c = np.zeros(nx)
    c[2] = -0.5 * g * dt * dt
    c[5] = -g * dt

    # Track the pad: position/velocity to zero; fuel-optimal touch is
    # shaped by the linear Tz cost (thrust opposes gravity on average,
    # so minimizing Tz minimizes burned impulse in this LQ proxy).
    Q = np.diag([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    R = np.diag([0.02, 0.02, 0.02])
    q = np.zeros(nx)
    r = np.array([0.0, 0.0, fuel_weight])
    QN = np.diag([50.0, 50.0, 50.0, 100.0, 100.0, 100.0])
    qN = np.zeros(nx)

    tan_gim = np.tan(np.deg2rad(gimbal_deg))
    tan_gs = np.tan(np.deg2rad(glideslope_deg))

    # Rows (order = [u; x] columns):
    #   0     : Tz box               t_min <= Tz <= t_max
    #   1..3  : gimbal SOC           [tan_gim*Tz; Tx; Ty]
    #   4..6  : glideslope SOC       [tan_gs*rz; rx; ry]
    D = np.zeros((7, nz))
    D[0, 2] = 1.0
    D[1, 2] = tan_gim
    D[2, 0] = 1.0
    D[3, 1] = 1.0
    D[4, nu + 2] = tan_gs
    D[5, nu + 0] = 1.0
    D[6, nu + 1] = 1.0
    lb = np.array([t_min] + [-_INF] * 6)
    ub = np.array([t_max] + [_INF] * 6)

    # Terminal stage: glideslope only, in x-only row form (controls
    # don't exist there; the pad itself, rz = 0, is the cone's vertex).
    # Rows pad to the stage count internally with exact zero-rho rows.
    DN = np.zeros((7, nx))
    DN[4:, :] = D[4:, nu:]
    lbN = np.full(7, -_INF)
    ubN = np.full(7, _INF)

    problem = build_problem(
        A=A, B=B, c=c, Q=Q, R=R, q=q, r=r, QN=QN, qN=qN,
        D=D, e_lb=lb, e_ub=ub, DN=DN, e_lbN=lbN, e_ubN=ubN,
        N=N, dtype=dtype,
    )
    cone_specs = [(1, 3), (4, 3)]
    return problem, cone_specs


def rocket_x0(
    batch: int | None = None,
    seed: int = 0,
    dtype=jnp.float64,
):
    """Dispersed entry states: offset, high, descending toward the pad.

    Single (nx,) state when ``batch`` is None, else (batch, nx) with
    randomized lateral offset and descent rate (Monte-Carlo dispersion
    of the guidance entry point).
    """
    base = np.array([40.0, 30.0, 90.0, -1.0, -0.5, -8.0])
    if batch is None:
        return jnp.asarray(base, dtype)
    rng = np.random.default_rng(seed)
    disp = np.zeros((batch, 6))
    disp[:, :2] = rng.normal(size=(batch, 2)) * 8.0
    disp[:, 2] = rng.normal(size=batch) * 5.0
    disp[:, 3:] = rng.normal(size=(batch, 3)) * 0.8
    return jnp.asarray(base[None, :] + disp, dtype)
