"""Condensed inter-segment boundary system solvers.

Reference counterpart: include/clqr/lqr/condensed_system.hpp — the
block-tridiagonal system over segment-boundary states produced by the
PDP reduction, with LU (condensed_system.hpp:32-147) and Cholesky
(:151-299, the default) variants.

Each segment i contributes (P_i, A_i, C_i, p_i, c_i) where
  P_i = Lxx_i Lxx_i^T  (cost-to-go Hessian at the segment start),
  A_i = F_i            (closed-loop transition across segment i),
  C_i                  (accumulated Gram of boundary-dual couplings),
  p_i, c_i = f_i       (linear terms),
via update_segment_data (condensed_system.hpp:64-80,183-201).

The solve is functional: ``*_backward`` returns an immutable factor
cache, ``*_forward`` consumes it and returns the boundary states
``xhat`` and boundary duals ``uhat``.  The number of segments S is
static and small (== mesh "time" axis size), so the recursions are
Python-unrolled under jit; every block op is (nx, nx) and batches over
any leading vmap axes.

Failure signalling: the reference's Cholesky variant returns false on a
non-SPD pivot (condensed_system.hpp:217-226) — which its caller then
ignores (lqr_solver_parallel.hpp:145).  Here non-SPD pivots produce
NaNs that propagate to the output, which ADMM-level per-instance
failure masks detect without host synchronization.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from pdp_lqr_tpu.config import f32_matmul_precision
from pdp_lqr_tpu.ops import linalg


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CholeskyCondensedFactors:
    """Factor cache of the Cholesky condensed backward pass.

    Pchol[i] = chol(P_i as updated), valid for i >= 1;
    Cchol[i] = chol(C_i + P_{i+1}^{-1}), valid for i <= S-2;
    Pinv[i]  = P_i^{-1}, valid for i >= 1;
    Asolved[i] = C_i^{-1} A_i, valid for 1 <= i <= S-2.
    Slot 0 / unused slots hold identity-sized placeholders.
    """

    Pchol: jax.Array   # (S, nx, nx)
    Cchol: jax.Array   # (S, nx, nx)
    Pinv: jax.Array    # (S, nx, nx)
    Asolved: jax.Array # (S, nx, nx)
    A: jax.Array       # (S, nx, nx) original segment transitions


@f32_matmul_precision
def cholesky_backward(P, A, C) -> CholeskyCondensedFactors:
    """Reference: CondensedSystemCholeskySolver::backward
    (condensed_system.hpp:203-250).

    Recursion (i = S-2 .. 1):
      Pinv_{i+1} = P_{i+1}^{-1} (via chol)
      C_i += Pinv_{i+1};  chol(C_i)
      P_i += A_i^T (C_i^{-1} A_i)
    plus the i = 0 tail that only folds Pinv_1 into C_0.
    """
    S, nx = P.shape[-3], P.shape[-1]
    Pw = [P[..., i, :, :] for i in range(S)]
    Cw = [C[..., i, :, :] for i in range(S)]
    Aw = [A[..., i, :, :] for i in range(S)]
    eye = jnp.zeros_like(Pw[0]) + jnp.eye(nx, dtype=P.dtype)

    Pchol = [eye] * S
    Cchol = [eye] * S
    Pinv = [eye] * S
    Asolved = [eye] * S

    for i in range(S - 2, 0, -1):
        Lp = linalg.cholesky(Pw[i + 1])
        Pinv_n = linalg.chol_solve(Lp, eye)
        Ci = Cw[i] + Pinv_n
        Lc = linalg.cholesky(Ci)
        Asol = linalg.chol_solve(Lc, Aw[i])
        Pw[i] = Pw[i] + jnp.swapaxes(Aw[i], -1, -2) @ Asol
        Pchol[i + 1] = Lp
        Pinv[i + 1] = Pinv_n
        Cchol[i] = Lc
        Asolved[i] = Asol
    # i = 0 tail (condensed_system.hpp:230-248)
    if S >= 2:
        Lp = linalg.cholesky(Pw[1])
        Pinv[1] = linalg.chol_solve(Lp, eye)
        Pchol[1] = Lp
        Cchol[0] = linalg.cholesky(Cw[0] + Pinv[1])

    stack = lambda xs: jnp.stack(xs, axis=-3)
    return CholeskyCondensedFactors(
        Pchol=stack(Pchol), Cchol=stack(Cchol), Pinv=stack(Pinv),
        Asolved=stack(Asolved), A=A,
    )


@f32_matmul_precision
def cholesky_forward(fac: CholeskyCondensedFactors, p, c, x0):
    """Reference: CondensedSystemCholeskySolver::forward
    (condensed_system.hpp:252-290).  Returns (xhat, uhat), each (S, nx);
    uhat[S-1] is identically zero (no boundary beyond the last segment).
    """
    S = fac.A.shape[-3]
    pw = [p[..., i, :] for i in range(S)]
    cw = [c[..., i, :] for i in range(S)]

    mv = lambda M, v: (M @ v[..., None])[..., 0]

    for i in range(S - 2, 0, -1):
        pw[i + 1] = linalg.chol_solve(fac.Pchol[..., i + 1, :, :], pw[i + 1][..., None])[..., 0]
        cw[i] = cw[i] + pw[i + 1]
        pw[i] = pw[i] + mv(jnp.swapaxes(fac.Asolved[..., i, :, :], -1, -2), cw[i])
    if S >= 2:
        pw[1] = linalg.chol_solve(fac.Pchol[..., 1, :, :], pw[1][..., None])[..., 0]
        cw[0] = cw[0] + pw[1]

    xhat = [None] * S
    uhat = [jnp.zeros_like(pw[0])] * S
    xhat[0] = x0
    for i in range(S - 1):
        u = cw[i] + mv(fac.A[..., i, :, :], xhat[i])
        u = linalg.chol_solve(fac.Cchol[..., i, :, :], u[..., None])[..., 0]
        uhat[i] = u
        xhat[i + 1] = -pw[i + 1] + mv(fac.Pinv[..., i + 1, :, :], u)

    return jnp.stack(xhat, axis=-2), jnp.stack(uhat, axis=-2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LUCondensedFactors:
    """Factor cache of the LU condensed backward pass.

    PClu/PCpiv: LU factors of PC_i = C_i P_{i+1} + I (i <= S-2);
    D[i] = PC_i^{-1} A_i;  Pupd[i] = updated P_i.
    """

    PClu: jax.Array
    PCpiv: jax.Array
    D: jax.Array
    Pupd: jax.Array
    A: jax.Array
    C: jax.Array


@f32_matmul_precision
def lu_backward(P, A, C) -> LUCondensedFactors:
    """Reference: CondensedSystemLUSolver::backward
    (condensed_system.hpp:82-103):
      PC = C_i P_{i+1} + I ; PA = P_{i+1} A_i
      D = PC^{-1} A_i ; P_i += D^T PA
    """
    S, nx = P.shape[-3], P.shape[-1]
    Pw = [P[..., i, :, :] for i in range(S)]
    Aw = [A[..., i, :, :] for i in range(S)]
    Cw = [C[..., i, :, :] for i in range(S)]
    eye = jnp.eye(nx, dtype=P.dtype)

    lus = [jnp.zeros_like(Pw[0]) + eye] * S
    pivs = [jnp.zeros(Pw[0].shape[:-2] + (nx,), jnp.int32)] * S
    Ds = [jnp.zeros_like(Pw[0])] * S

    for i in range(S - 2, -1, -1):
        PC = Cw[i] @ Pw[i + 1] + eye
        PA = Pw[i + 1] @ Aw[i]
        lu, piv = jsl.lu_factor(PC)
        Di = jsl.lu_solve((lu, piv), Aw[i])
        Pw[i] = Pw[i] + jnp.swapaxes(Di, -1, -2) @ PA
        lus[i], pivs[i], Ds[i] = lu, piv, Di

    stack = lambda xs, ax=-3: jnp.stack(xs, axis=ax)
    return LUCondensedFactors(
        PClu=stack(lus), PCpiv=jnp.stack(pivs, axis=-2), D=stack(Ds),
        Pupd=stack(Pw), A=A, C=C,
    )


@f32_matmul_precision
def lu_forward(fac: LUCondensedFactors, p, c, x0):
    """Reference: CondensedSystemLUSolver::forward
    (condensed_system.hpp:105-138).  Returns (xhat, uhat)."""
    S = fac.A.shape[-3]
    pw = [p[..., i, :] for i in range(S)]
    cw = [c[..., i, :] for i in range(S)]
    mv = lambda M, v: (M @ v[..., None])[..., 0]

    for i in range(S - 2, -1, -1):
        c_bar = pw[i + 1] + mv(fac.Pupd[..., i + 1, :, :], cw[i])
        pw[i] = pw[i] + mv(jnp.swapaxes(fac.D[..., i, :, :], -1, -2), c_bar)

    xhat = [None] * S
    uhat = [jnp.zeros_like(pw[0])] * S
    xhat[0] = x0
    for i in range(S - 1):
        ci = cw[i] + mv(fac.A[..., i, :, :], xhat[i]) - mv(fac.C[..., i, :, :], pw[i + 1])
        xn = jsl.lu_solve(
            (fac.PClu[..., i, :, :], fac.PCpiv[..., i, :]), ci[..., None]
        )[..., 0]
        xhat[i + 1] = xn
        uhat[i] = pw[i + 1] + mv(fac.Pupd[..., i + 1, :, :], xn)

    return jnp.stack(xhat, axis=-2), jnp.stack(uhat, axis=-2)
