"""Small dense linear-algebra primitives used by every solver backend.

The reference leans on Eigen's LLT and triangular solves
(lqr_kernel.hpp:89,126,145,199; condensed_system.hpp LLT/PartialPivLU).
Here they are thin wrappers over jnp/XLA so that (a) every call site
reads like the math, and (b) Pallas batch-in-lanes kernels can be
swapped in behind the same names for the hot paths.

All functions operate on the *trailing* two axes and batch over any
leading axes, which is what ``vmap``/``scan`` produce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def cholesky(M: jax.Array) -> jax.Array:
    """Lower-triangular Cholesky factor, L @ L.T = M.

    Reference: Eigen ``M.llt().matrixL()`` (lqr_kernel.hpp:89,126).
    """
    return jnp.linalg.cholesky(M)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b with L lower triangular (forward substitution).

    Reference: ``L.triangularView<Lower>().solveInPlace`` (lqr_kernel.hpp:145).
    """
    return jsl.solve_triangular(L, b, lower=True)


def solve_lower_T(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L^T y = b with L lower triangular (back substitution).

    Reference: ``L.triangularView<Lower>().transpose().solveInPlace``
    (lqr_kernel.hpp:199, lqr_kernel_parallel.hpp:107-108).
    """
    return jsl.solve_triangular(L, b, lower=True, trans=1)


def chol_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) y = b given the Cholesky factor L.

    Reference: Eigen ``LLT::solveInPlace`` (condensed_system.hpp:220,227).
    """
    return solve_lower_T(L, solve_lower(L, b))


def spd_inverse_from_chol(L: jax.Array) -> jax.Array:
    """Inverse of an SPD matrix from its Cholesky factor.

    Reference: ``P_chol_fact.solveInPlace(Pinv)`` with Pinv = I
    (condensed_system.hpp:215-220).
    """
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    eye = jnp.broadcast_to(eye, L.shape)
    return chol_solve(L, eye)
