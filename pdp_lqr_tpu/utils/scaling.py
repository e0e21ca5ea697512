"""Ruiz equilibration — OSQP sec. 5 problem scaling for the LQ problem.

The reference stores constraint bounds but ships no outer loop
(lqr_model.hpp:22-24 — e_lb/e_ub never read); the loop this framework
completes is OSQP-style, and OSQP's robustness on badly-scaled data
comes from modified Ruiz equilibration of the problem plus cost
normalization (OSQP paper sec. 5.1, alg. 2).  This module is that
scaling, specialized to the stage-structured LQ problem:

  scaled variables    w_k = S_k w̄_k          (S diagonal, per stage)
  scaled constraints  rows of D scaled by E   (diagonal, per stage)
  scaled cost         H̄ = c_s S H S, h̄ = c_s S h

The dynamics are not rows of D here (they are solved exactly inside
the Riccati recursion), so variable scaling must be pushed through
them instead:  Ā_k = S_x,k+1^{-1} A_k S_x,k,  B̄_k = S_x,k+1^{-1} B_k
S_u,k,  c̄_k = S_x,k+1^{-1} c_k,  x̄0 = S_x,0^{-1} x0.

Cone safety: a second-order-cone block is invariant under uniform
row scaling only, so E is forced constant within each cone block
(the SCS/OSQP convention for conic rows).

Unscaled-residual termination (OSQP sec. 5.2): with w = S w̄ and
y = c_s^{-1} E ȳ, the unscaled residuals follow from the scaled ones
via  r_prim = E^{-1} r̄_prim  and  r_dual = (c_s S)^{-1} r̄_dual.
``residual_weights`` returns the (1/e, 1/(c_s s)) weight arrays the
ADMM loops apply inside their max-norms.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RuizScaling:
    """Diagonal scalings: ``s`` (N+1, nz) per-variable, ``e`` (N+1, nc)
    per-constraint-row, ``cost`` () the scalar cost normalization."""

    s: jax.Array
    e: jax.Array
    cost: jax.Array


_MIN_SCALE = 1e-4
_MAX_SCALE = 1e4


def _safe(x, lo=_MIN_SCALE, hi=_MAX_SCALE):
    return jnp.clip(jnp.where(x > 0, x, 1.0), lo, hi)


def ruiz_equilibrate(problem, cones=(), iters: int = 10,
                     scale_variables: bool = False):
    """Compute a RuizScaling for ``problem`` (unbatched).

    Default mode (``scale_variables=False``, s = 1): modified Ruiz on
    the CONSTRAINT ROWS (E) plus cost normalization (c) — the two
    scalings that commute with this solver's architecture.  This is a
    deliberate deviation from OSQP alg. 2's symmetric variable scaling:
    OSQP treats the dynamics as ordinary constraint rows, so variable
    scaling never touches a model matrix; here the dynamics are
    ELIMINATED (solved exactly inside the Riccati recursion), and
    pushing a per-stage diagonal S through them
    (A -> S_{x,k+1}^{-1} A S_{x,k}) was measured to wreck the
    recursion's conditioning whenever states appear in the cost/
    constraints unevenly (transformed-A entries x200 on the quadrotor).
    Row scaling E and the cost scalar c carry the robustness payload —
    constraint rows spanning orders of magnitude, uniformly mis-scaled
    objectives — at zero dynamics risk.

    ``scale_variables=True`` additionally runs the full KKT-block Ruiz
    [H_k; E_k D_k; Ed_k G_k] with G_k = [B_k A_k | -I] the dynamics
    rows anchoring otherwise-unseen state columns (Ed internal to the
    iteration).  Use only on problems whose states are uniformly
    represented in the cost.

    ``cones`` are (offset, dim[, kind]) specs into the constraint
    block; rows of one cone share a single scale (cone invariance).
    """
    from pdp_lqr_tpu.ops import projections

    H, D, h = problem.H, problem.D, problem.h
    A, B = problem.A, problem.B
    nper = H.shape[0]
    nz = H.shape[-1]
    nu = B.shape[-1]
    nc = D.shape[-2]
    dt = H.dtype
    cones3 = projections.normalize_cones(tuple(cones))
    G = jnp.concatenate([B, A], axis=-1)          # (N, nx, nz)

    s = jnp.ones((nper, nz), dt)
    e = jnp.ones((nper, nc), dt)
    ed = jnp.ones(A.shape[:-1], dt)               # (N, nx)

    def uniform_cones(ev):
        for off, dim, _ in cones3:
            blk = ev[:, off:off + dim]
            g = jnp.exp(jnp.mean(jnp.log(_safe(blk)), axis=1,
                                 keepdims=True))
            ev = ev.at[:, off:off + dim].set(
                jnp.broadcast_to(g, blk.shape))
        return ev

    for _ in range(iters):
        if scale_variables:
            Hs = s[:, :, None] * H * s[:, None, :]
            cn = jnp.max(jnp.abs(Hs), axis=-2)
            if nc:
                Ds = e[:, :, None] * D * s[:, None, :]
                cn = jnp.maximum(cn, jnp.max(jnp.abs(Ds), axis=-2))
            # Dynamics-row contributions: row k touches [u_k; x_k]
            # through [B A] and x_{k+1} through -I.
            Gs = ed[:, :, None] * G * s[:-1][:, None, :]
            cn = cn.at[:-1].max(jnp.max(jnp.abs(Gs), axis=-2))
            cn = cn.at[1:, nu:].max(ed * s[1:, nu:])
            s = s / jnp.sqrt(_safe(cn))
        if nc:
            Ds = e[:, :, None] * D * s[:, None, :]
            rn = jnp.max(jnp.abs(Ds), axis=-1)
            e = e / jnp.sqrt(_safe(rn))
            e = uniform_cones(e)
        if scale_variables:
            Gs = ed[:, :, None] * G * s[:-1][:, None, :]
            rn_d = jnp.maximum(jnp.max(jnp.abs(Gs), axis=-1),
                               ed * s[1:, nu:])
            ed = ed / jnp.sqrt(_safe(rn_d))

    if scale_variables:
        # Factor the UNIFORM component of s out into the scalar cost
        # normalization below: symmetric diagonal scaling multiplies
        # the quadratic term by s^2 but the linear term by s, so a
        # uniform s != 1 distorts the problem's h-to-H balance (a
        # uniformly cost-scaled problem would come out quasi-linear
        # and stall ADMM's dual residual).  Only the RELATIVE
        # per-column equilibration belongs in s; e absorbs the uniform
        # factor so constraint rows keep their Ruiz-normalized norms.
        # Done ONCE after the loop — renormalizing inside it breaks
        # the Ruiz contraction along the dynamics block's
        # scale-invariant direction.
        g = jnp.exp(jnp.mean(jnp.log(_safe(s, 1e-8, 1e8))))
        s = jnp.clip(s / g, _MIN_SCALE, _MAX_SCALE)
        e = jnp.clip(e * g, _MIN_SCALE, _MAX_SCALE) if nc else e

    # Cost normalization (OSQP 5.1): c_s = 1 / max(mean col norm of
    # the scaled H, inf-norm of the scaled h).
    Hs = s[:, :, None] * H * s[:, None, :]
    col = jnp.mean(jnp.max(jnp.abs(Hs), axis=-2))
    hn = jnp.max(jnp.abs(s * h))
    cost = 1.0 / _safe(jnp.maximum(col, hn), 1e-8, 1e8)
    return RuizScaling(s=s, e=e, cost=cost)


def scale_problem(problem, scaling: RuizScaling):
    """Apply the scaling: returns the scaled LQRProblem (same pytree
    type).  Terminal u-rows of s are never read (padded stage)."""
    import dataclasses as dc

    s, e, c_s = scaling.s, scaling.e, scaling.cost
    nu = problem.nu
    su = s[:-1, :nu]                      # (N, nu)
    sx = s[:, nu:]                        # (N+1, nx)
    sx_next_inv = 1.0 / sx[1:]            # (N, nx)

    batched_c = problem.c.ndim == 3
    A = sx_next_inv[:, :, None] * problem.A * sx[:-1][:, None, :]
    B = sx_next_inv[:, :, None] * problem.B * su[:, None, :]
    cvec = problem.c * (sx_next_inv[None] if batched_c else sx_next_inv)
    H = c_s * s[:, :, None] * problem.H * s[:, None, :]
    h = c_s * s * problem.h
    D = e[:, :, None] * problem.D * s[:, None, :]
    e_lb = e * problem.e_lb
    e_ub = e * problem.e_ub
    return dc.replace(problem, A=A, B=B, c=cvec, H=H, h=h, D=D,
                      e_lb=e_lb, e_ub=e_ub)


def scale_x0(x0, scaling: RuizScaling, nu: int):
    """x̄0 = S_x,0^{-1} x0 (x0 may carry a leading batch axis)."""
    return x0 / scaling.s[0, nu:]


def scale_soc_shift(soc_shift, scaling: RuizScaling):
    """Affine cone offsets live in constraint-row space: s̄ = E s."""
    return None if soc_shift is None else scaling.e * soc_shift


def unscale_ws(ws_bar, scaling: RuizScaling):
    """w = S w̄ (ws_bar may carry a leading batch axis)."""
    return ws_bar * scaling.s


def residual_weights(scaling: RuizScaling):
    """(prim_weight (N+1, nc), dual_weight (N+1, nz)) such that the
    UNSCALED residual inf-norms are max |r̄_prim * prim_weight| and
    max |r̄_dual * dual_weight| (OSQP 5.2 termination on unscaled
    residuals)."""
    return 1.0 / scaling.e, 1.0 / (scaling.cost * scaling.s)


def unscale_state(state, scaling: RuizScaling):
    """Map a warm-start ADMMState from scaled to unscaled space
    (w = S w̄, z = E^{-1} z̄, y = c_s^{-1} E ȳ; rho is re-usable as-is
    only approximately — kept unchanged)."""
    import dataclasses as dc

    return dc.replace(
        state,
        w=state.w * scaling.s,
        z=state.z / scaling.e,
        y=(scaling.e / scaling.cost) * state.y,
    )


def scale_state(state, scaling: RuizScaling):
    """Inverse of unscale_state (warm-starting a scaled solve from an
    unscaled state)."""
    import dataclasses as dc

    return dc.replace(
        state,
        w=state.w / scaling.s,
        z=state.z * scaling.e,
        y=(scaling.cost / scaling.e) * state.y,
    )
