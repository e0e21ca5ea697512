"""Vectorized projections onto boxes and second-order cones.

The reference stores box bounds ``e_lb/e_ub`` on the model
(lqr_model.hpp:22-24) but never consumes them — the projection step
belongs to the unreleased ADMM outer loop ("conic" appears only in the
paper title, README.md:3-4).  This module supplies that step,
TPU-native: everything is elementwise/branch-free and batches over
arbitrary leading axes (stages, instances).

Cone layout: constraint rows of a stage may be grouped into
second-order cones.  A cone spec ``(offset, dim)`` declares rows
[offset, offset+dim) of every stage's constraint block as one SOC
  { (t, v) in R x R^{dim-1} : ||v||_2 <= t }
with row ``offset`` the t-row.  Cone specs are static (Python ints) —
the projection compiles to fixed slices, no dynamic indexing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

ConeSpec = Tuple[int, int]


def project_box(v, lb, ub):
    """Euclidean projection onto [lb, ub] (elementwise clip)."""
    return jnp.clip(v, lb, ub)


def project_soc(v, axis: int = -1, eps: float = 1e-12):
    """Project [t; x] (t = first entry along ``axis``) onto the SOC.

    Branch-free closed form:
      ||x|| <= t      -> v                      (inside)
      ||x|| <= -t     -> 0                      (polar interior)
      else            -> (t + ||x||)/2 * [1; x/||x||]
    """
    v = jnp.moveaxis(v, axis, -1)
    t = v[..., 0]
    x = v[..., 1:]
    nx = jnp.sqrt(jnp.sum(x * x, axis=-1))
    scale = 0.5 * (t + nx)

    inside = nx <= t
    polar = nx <= -t

    safe_nx = jnp.where(nx > eps, nx, 1.0)
    x_dir = x / safe_nx[..., None]
    t_proj = jnp.where(inside, t, jnp.where(polar, 0.0, scale))
    x_proj = jnp.where(
        inside[..., None],
        x,
        jnp.where(polar[..., None], 0.0, scale[..., None] * x_dir),
    )
    out = jnp.concatenate([t_proj[..., None], x_proj], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def project_constraints(v, lb, ub, cones: Sequence[ConeSpec] = (), shift=None):
    """Project stage constraint values onto box x (shifted) cones.

    v/lb/ub: (..., nc).  Box rows are clipped; rows covered by a cone
    spec are SOC-projected instead (their bounds should be +-inf).

    ``shift`` ((..., nc) or None) gives cones an affine offset: row
    values z with z + shift in SOC, i.e. the projection is
    Pi(v) = Pi_SOC(v + shift) - shift.  This expresses cones like
    ||u_xy|| <= t + margin (thrust/friction cones with a constant
    term), which the pure D w in SOC form cannot.
    """
    out = project_box(v, lb, ub)
    for off, dim in cones:
        blk = v[..., off : off + dim]
        if shift is not None:
            s = shift[..., off : off + dim]
            blk = project_soc(blk + s, axis=-1) - s
        else:
            blk = project_soc(blk, axis=-1)
        out = out.at[..., off : off + dim].set(blk)
    return out
