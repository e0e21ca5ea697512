"""Solver backends: one API, four implementations.

Every backend exposes the reference's four-call interface
(update_problem_data / backward / backward_without_factorization /
forward — lqr_solver.hpp:9-28) as pure functions plus a one-shot
``solve``:

  sequential — Riccati recursion via lax.scan (reference LQRSolver)
  pdp        — segmented parallel Riccati + condensed boundary system
               (reference LQRParallelSolver)
  kkt        — batched block-tridiagonal LDLt of the full-horizon KKT
               (reference QDLDLSolver, dense-block re-design)
  assoc      — log-depth associative-scan Riccati (TPU-native, no
               reference counterpart)
  admm       — conic ADMM outer loop around any of the above
"""
