"""Solution-quality diagnostics: objective, feasibility, KKT residuals.

The reference's de-facto quality check is printing the first controls
and final state for eyeballing (examples/lqr_example.cpp:185-190).
Here quality is a computable pytree — batched, jit-safe, no host sync —
suitable for serving-side monitoring and test assertions.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from pdp_lqr_tpu.ops import projections
from pdp_lqr_tpu.problem import LQRProblem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveQuality:
    objective: jax.Array        # () cost 1/2 w'Hw + h'w summed over stages
    dyn_residual: jax.Array     # () max |x+ - Ax - Bu - c|
    box_violation: jax.Array    # () max box constraint violation
    cone_violation: jax.Array   # () max SOC violation (||v|| - t - shift)

    def __repr__(self):
        return (f"SolveQuality(obj={self.objective:.6g}, "
                f"dyn={self.dyn_residual:.2e}, box={self.box_violation:.2e}, "
                f"cone={self.cone_violation:.2e})")


def assess(
    problem: LQRProblem,
    ws,
    cones: Sequence[projections.ConeSpec] = (),
    soc_shift=None,
) -> SolveQuality:
    """Evaluate a trajectory ws (N+1, nz) against the problem data."""
    nu = problem.nu
    obj = 0.5 * jnp.einsum("kz,kzw,kw->", ws, problem.H, ws) \
        + jnp.einsum("kz,kz->", problem.h, ws)

    us = ws[:-1, :nu]
    xs = ws[:, nu:]
    x_pred = (
        jnp.einsum("kij,kj->ki", problem.A, xs[:-1])
        + jnp.einsum("kij,kj->ki", problem.B, us)
        + problem.c
    )
    dyn = jnp.max(jnp.abs(xs[1:] - x_pred))

    if problem.nc == 0:
        zero = jnp.asarray(0.0, ws.dtype)
        return SolveQuality(objective=obj, dyn_residual=dyn,
                            box_violation=zero, cone_violation=zero)

    vals = jnp.einsum("kcz,kz->kc", problem.D, ws)
    mask = jnp.any(problem.D != 0, axis=-1)
    cones3 = projections.normalize_cones(cones)
    cone_rows = jnp.zeros_like(mask)
    for off, dim, _ in cones3:
        cone_rows = cone_rows.at[..., off : off + dim].set(True)
    box_mask = mask & ~cone_rows

    lo = jnp.where(box_mask, problem.e_lb - vals, -jnp.inf)
    hi = jnp.where(box_mask, vals - problem.e_ub, -jnp.inf)
    box = jnp.maximum(jnp.max(lo), jnp.max(hi))
    box = jnp.maximum(box, 0.0)

    cone = jnp.asarray(0.0, ws.dtype)
    for off, dim, kind in cones3:
        blk = vals[..., off : off + dim]
        if soc_shift is not None:
            blk = blk + soc_shift[..., off : off + dim]
        if kind == "soc":
            t = blk[..., 0]
            vnorm = jnp.sqrt(jnp.sum(blk[..., 1:] ** 2, axis=-1))
            viol = vnorm - t
        else:  # rsoc: p, q >= 0 and ||x|| <= sqrt(2 p q)
            p, q = blk[..., 0], blk[..., 1]
            vnorm = jnp.sqrt(jnp.sum(blk[..., 2:] ** 2, axis=-1))
            cap = jnp.sqrt(2.0 * jnp.maximum(p, 0.0) * jnp.maximum(q, 0.0))
            viol = jnp.maximum(vnorm - cap, jnp.maximum(-p, -q))
        active = jnp.any(problem.D[..., off : off + dim, :] != 0, axis=(-2, -1))
        viol = jnp.where(active, viol, -jnp.inf)
        cone = jnp.maximum(cone, jnp.max(viol))
    cone = jnp.maximum(cone, 0.0)

    return SolveQuality(objective=obj, dyn_residual=dyn,
                        box_violation=box, cone_violation=cone)


assess_batched = jax.vmap(assess, in_axes=(0, 0))
