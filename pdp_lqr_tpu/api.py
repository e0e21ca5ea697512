"""Reference-shaped class API — drop-in lifecycle compatibility.

The reference exposes stateful solver objects with a four-call
lifecycle (include/clqr/lqr/lqr_solver.hpp:9-28):

    LQRSolver solver(model);
    solver.update_problem_data(ws, ys, zs, rho_vecs, inv_rho_vecs, sigma);
    solver.backward(rho_vecs);              // or backward_without_factorization
    solver.forward(x0, ws);

This module provides the same classes and call sequence on top of the
pure-functional backends, so a reference user can port call sites
mechanically.  Internally each method is a cached jit of the
corresponding functional op; the object only holds the problem, the
current StageParams, and the factor cache (all immutable pytrees).

Differences from the reference, by design:
  * ``forward`` returns the trajectory instead of mutating ``ws``.
  * ``inv_rho_vecs`` is derived, not passed (ADMMIterates.inv_rho).
  * Everything works batched: construct with a batched problem and all
    methods map over the leading axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pdp_lqr_tpu.config import CondensedSolverType
from pdp_lqr_tpu.problem import ADMMIterates, LQRProblem, make_stage_params


class _SolverBase:
    """Shared lifecycle plumbing; subclasses bind a backend module."""

    def __init__(self, model: LQRProblem):
        self.model = model
        self._batched = model.A.ndim == 4
        self._params = None
        self._rho = None
        self._factors = None

    # -- reference: update_problem_data (lqr_solver.hpp:41-56) ----------
    def update_problem_data(self, ws, ys, zs, rho_vecs, sigma: float):
        it = ADMMIterates(
            w=jnp.asarray(ws), y=jnp.asarray(ys), z=jnp.asarray(zs),
            rho=jnp.asarray(rho_vecs),
        )
        mk = make_stage_params
        if self._batched:
            self._params = jax.vmap(lambda p, i: mk(p, i, sigma))(
                self.model, it
            )
        else:
            self._params = mk(self.model, it, sigma)
        self._rho = it.rho
        return self

    def _require_params(self):
        if self._params is None:
            raise RuntimeError("call update_problem_data first")

    def _bw(self, problem, params, rho):
        raise NotImplementedError

    def _bw_cached(self, problem, params, rho, factors):
        raise NotImplementedError

    def _fw(self, problem, factors, x0):
        raise NotImplementedError

    # -- reference: backward / backward_without_factorization -----------
    def backward(self):
        self._require_params()
        fn = self._bw
        if self._batched:
            fn = jax.vmap(fn)
        self._factors = jax.jit(fn)(self.model, self._params, self._rho)
        return self

    def backward_without_factorization(self):
        self._require_params()
        if self._factors is None:
            raise RuntimeError("no cached factorization; call backward first")
        fn = self._bw_cached
        if self._batched:
            fn = jax.vmap(fn)
        self._factors = jax.jit(fn)(
            self.model, self._params, self._rho, self._factors
        )
        return self

    # -- reference: forward (lqr_solver.hpp:72-77) -----------------------
    def forward(self, x0):
        if self._factors is None:
            raise RuntimeError("call backward first")
        fn = self._fw
        if self._batched:
            fn = jax.vmap(fn)
        return jax.jit(fn)(self.model, self._factors, jnp.asarray(x0))

    def clear_workspace(self):
        """Reference: LQRSolver::clear_workspace (lqr_solver.hpp:26)."""
        self._params = None
        self._rho = None
        self._factors = None
        return self


class LQRSolver(_SolverBase):
    """Sequential Riccati — reference ``clqr::LQRSolver``."""

    def _bw(self, problem, params, rho):
        from pdp_lqr_tpu.ops import riccati

        return riccati.backward(problem, params, rho)

    def _bw_cached(self, problem, params, rho, factors):
        from pdp_lqr_tpu.ops import riccati

        return riccati.backward_no_refactor(problem, params, rho, factors)

    def _fw(self, problem, factors, x0):
        from pdp_lqr_tpu.ops import riccati

        return riccati.forward(problem, factors, x0)


class LQRParallelSolver(_SolverBase):
    """Segmented parallel Riccati — reference ``clqr::LQRParallelSolver``.

    ``num_segments`` as in the reference ctor
    (lqr_solver_parallel.hpp:22); ``load_balancing`` is accepted for
    signature compatibility and ignored — uniform segments are optimal
    under SIMD (see ops/riccati_pdp.py docstring); ``solver_type``
    picks the condensed factorization (LU or CHOLESKY).
    """

    def __init__(self, model: LQRProblem, num_segments: int = 4,
                 load_balancing: bool = False,
                 solver_type: CondensedSolverType = CondensedSolverType.CHOLESKY):
        super().__init__(model)
        del load_balancing
        self.num_segments = num_segments
        self.solver_type = solver_type

    def _bw(self, problem, params, rho):
        from pdp_lqr_tpu.solvers import pdp

        return pdp.backward(problem, params, rho, self.num_segments,
                            self.solver_type)

    def _bw_cached(self, problem, params, rho, factors):
        from pdp_lqr_tpu.solvers import pdp

        return pdp.backward_without_factorization(problem, params, rho, factors)

    def _fw(self, problem, factors, x0):
        from pdp_lqr_tpu.solvers import pdp

        return pdp.forward(problem, factors, x0)


class QDLDLSolver(_SolverBase):
    """Full-horizon KKT factorization — reference ``clqr::QDLDLSolver``.

    ``rho_dyn``/``sigma`` regularization defaults match the reference's
    hardwired 1e-6 (qdldl_solver.hpp:40-41).  The symbolic phase of
    QDLDL has no analog — the block-tridiagonal structure is static.
    """

    def __init__(self, model: LQRProblem, rho_dyn: float = 1e-6):
        super().__init__(model)
        self.rho_dyn = rho_dyn

    def _bw(self, problem, params, rho):
        from pdp_lqr_tpu.solvers import kkt

        return kkt.backward(problem, params, rho, self.rho_dyn)

    def _bw_cached(self, problem, params, rho, factors):
        # Numeric factor reuse == not refactoring at all (only the rhs
        # changes); the factors pass through untouched.
        return factors

    def forward(self, x0):
        if self._factors is None:
            raise RuntimeError("call backward first")
        from pdp_lqr_tpu.solvers import kkt

        fn = lambda p, prm, rho, fac, x: kkt.forward(p, prm, rho, fac, x)
        if self._batched:
            fn = jax.vmap(fn)
        return jax.jit(fn)(
            self.model, self._params, self._rho, self._factors,
            jnp.asarray(x0),
        )


class AssociativeScanSolver(_SolverBase):
    """Log-depth associative-scan Riccati (TPU-native; no reference
    counterpart — same lifecycle for interchangeability)."""

    def _bw(self, problem, params, rho):
        from pdp_lqr_tpu.ops import riccati_assoc

        return riccati_assoc.backward(problem, params, rho)

    def _bw_cached(self, problem, params, rho, factors):
        from pdp_lqr_tpu.ops import riccati_assoc

        return riccati_assoc.backward_no_refactor(problem, params, rho, factors)

    def _fw(self, problem, factors, x0):
        from pdp_lqr_tpu.ops import riccati_assoc

        return riccati_assoc.forward(problem, factors, x0)
