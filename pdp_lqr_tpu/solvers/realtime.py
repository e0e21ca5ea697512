"""Real-time single-instance conic MPC — the 1 kHz replan path.

The reference's steady-state fast path re-solves with cached factors
every ADMM iteration (``backward_without_factorization``,
lqr_solver.hpp:65-70): with (H~, rho) fixed, only *vector* work runs.
On a TPU that vector sweep is still a length-N sequential scan of tiny
ops — latency-bound at small batch, which is exactly the regime of a
1 kHz MPC replan loop (B = 1).

TPU-native re-design: with the factorization fixed, the inner KKT
solve is a *fixed affine map* of the iteration-varying folded cost
vector hf and the initial state:

    w~  =  hf_flat @ T  +  x0 @ J  +  r          (all dense)

so we materialize (T, J, r) ONCE per factorization by pushing basis
vectors through the cached-factor vector solve (a single batched scan),
and every subsequent ADMM iteration is ONE dense (M, M) matvec on the
MXU (M = (N+1) nz, e.g. 1040 for the quadrotor at N = 64) plus
elementwise projection/dual work — no per-stage scan, no tiny-matrix
ops, near-zero serial depth.  The replan loop itself is a
``lax.while_loop`` with convergence-based early exit (the batch-SIMD
paths deliberately avoid data-dependent exits; at B = 1 the exit is
pure profit).

Memory: T is M^2 floats — 4.3 MB (f32) at N = 64, 69 MB at N = 256.
This path is for short-horizon real-time MPC; use solvers.admm for
long horizons or large batches.

Accuracy: T is the exact linear map of the cached-factor solve
evaluated on basis vectors, so the iteration math is identical to
admm.solve with ``rho_update_interval >= max_iter`` up to matmul
reassociation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from pdp_lqr_tpu.config import f32_matmul_precision
from pdp_lqr_tpu.ops import projections, riccati_dense
from pdp_lqr_tpu.problem import LQRProblem, StageParams
from pdp_lqr_tpu.solvers.admm import (
    ADMMInfo,
    ADMMSettings,
    ADMMState,
    _con_mask,
    init_state,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ResolveOperator:
    """Materialized affine inner-solve: w~ = hf @ T + x0 @ J + r.

    T: (M, M) with M = (N+1) nz — linear response to the folded cost
       vector (rows index hf entries, columns index w entries).
    J: (nx, M) — response to the initial state.
    r: (M,)   — constant part (the drift c's contribution).
    rho: ()   — scalar penalty the factorization was built at (for
       caller-side staleness checks; the map itself embeds it).
    """

    T: jax.Array
    J: jax.Array
    r: jax.Array
    rho: jax.Array


@f32_matmul_precision
def build_operator(
    problem: LQRProblem,
    rho: float,
    settings: ADMMSettings = ADMMSettings(),
    cones: Sequence[projections.ConeSpec] = (),
) -> ResolveOperator:
    """Factor once, then materialize the affine solve map.

    One P-form backward (riccati_dense.backward) builds the factor
    cache; M + nx + 1 cached-factor vector solves — batched through one
    vmapped scan — evaluate the map on the hf basis, the x0 basis, and
    zero.  Rebuild whenever rho (or the problem matrices) change; between
    rebuilds every replan and every ADMM iteration reuses (T, J, r).
    """
    dt = problem.H.dtype
    N, nz, nx, nu = problem.N, problem.nz, problem.nx, problem.nu
    M = (N + 1) * nz
    sigma = settings.sigma
    mask = _con_mask(problem, tuple(cones)).astype(dt)
    rho_vec = jnp.asarray(rho, dt) * mask

    eye_z = jnp.eye(nz, dtype=dt)
    zero_g = jnp.zeros(problem.e_lb.shape, dt)
    params0 = StageParams(
        H=problem.H + sigma * eye_z, h=jnp.zeros_like(problem.h), g=zero_g
    )
    factors = riccati_dense.backward(problem, params0, rho_vec)

    prob_c0 = dataclasses.replace(problem, c=jnp.zeros_like(problem.c))

    def resolve(hvec, x0v, prob):
        prm = StageParams(H=params0.H, h=hvec, g=zero_g)
        f2 = riccati_dense.backward_no_refactor(prob, prm, rho_vec, factors)
        return riccati_dense.forward(prob, f2, x0v)

    basis_h = jnp.eye(M, dtype=dt).reshape(M, N + 1, nz)
    zero_h = jnp.zeros((N + 1, nz), dt)
    zero_x = jnp.zeros((nx,), dt)

    r = resolve(zero_h, zero_x, problem).reshape(M)
    cols_T = jax.vmap(lambda hv: resolve(hv, zero_x, prob_c0))(basis_h)
    cols_J = jax.vmap(lambda xv: resolve(zero_h, xv, prob_c0))(
        jnp.eye(nx, dtype=dt)
    )
    # resolve() is affine with constant part r|_{c=0} = 0 (prob_c0 has
    # c = 0 AND h = 0 AND x0 = 0 gives the zero trajectory), so the
    # vmapped evaluations ARE the linear columns directly.
    T = cols_T.reshape(M, M)
    J = cols_J.reshape(nx, M)
    return ResolveOperator(T=T, J=J, r=r, rho=jnp.asarray(rho, dt))


@f32_matmul_precision
def solve(
    problem: LQRProblem,
    x0,
    operator: ResolveOperator,
    cones: Sequence[projections.ConeSpec] = (),
    settings: ADMMSettings = ADMMSettings(),
    state: Optional[ADMMState] = None,
    soc_shift=None,
) -> Tuple[jax.Array, ADMMState, ADMMInfo]:
    """One warm replan: while_loop ADMM with early exit, matvec solves.

    rho is FIXED at operator.rho for the whole replan (a rho change
    invalidates T — rebuild with build_operator between replans; the
    reference pays the same cost as a full refactorization,
    lqr_kernel.hpp:93-101).  Exact OSQP 3.4 residuals drive the exit.

    Returns (ws (N+1, nz), warm state, info).
    """
    cones = tuple(cones)
    dt = problem.H.dtype
    N, nz, nu, nc = problem.N, problem.nz, problem.nu, problem.nc
    M = (N + 1) * nz
    sigma = settings.sigma
    alpha = settings.alpha
    mask = _con_mask(problem, cones).astype(dt)
    rho = jnp.asarray(operator.rho, dt)
    rho_vec = rho * mask
    inv_rho = jnp.where(mask > 0, 1.0 / rho, 0.0)

    if state is None:
        state = init_state(problem, settings)

    # Terminal-u masking of h~ (make_stage_params semantics).
    uterm = jnp.ones((N + 1, nz), dt).at[-1, :nu].set(0.0)
    h_masked = problem.h * uterm
    x0 = jnp.asarray(x0, dt)
    base = x0 @ operator.J + operator.r          # per-replan constant

    Dw = lambda w: jnp.einsum("kcz,kz->kc", problem.D, w)
    DTv = lambda vc: jnp.einsum("kcz,kc->kz", problem.D, vc)
    Hw = lambda w: jnp.einsum("kij,kj->ki", problem.H, w)
    h_scale = jnp.max(jnp.abs(problem.h))

    def body(carry):
        w, z, y, k, _, _, _ = carry
        g = z - inv_rho * y
        hf = (h_masked - sigma * w - DTv(rho_vec * g)) * uterm
        w_t = (hf.reshape(M) @ operator.T + base).reshape(N + 1, nz)
        z_t = Dw(w_t)

        w_new = alpha * w_t + (1.0 - alpha) * w
        v = alpha * z_t + (1.0 - alpha) * z + inv_rho * y
        z_new = projections.project_constraints(
            v, problem.e_lb, problem.e_ub, cones, soc_shift
        ) * mask
        y_new = y + rho_vec * (alpha * z_t + (1.0 - alpha) * z - z_new)

        r_prim = jnp.max(jnp.abs((Dw(w_new) - z_new) * mask))
        dw = w - w_t
        dvec = (
            (1.0 - alpha) * Hw(dw) + sigma * dw
            + DTv(rho_vec * ((alpha - 1.0) * (z_t - z) + (z - z_new)))
        )
        r_dual = jnp.max(jnp.abs(dvec))

        prim_scale = jnp.maximum(
            jnp.max(jnp.abs(Dw(w_new) * mask)), jnp.max(jnp.abs(z_new))
        )
        dual_scale = jnp.maximum(
            jnp.max(jnp.abs(Hw(w_new))),
            jnp.maximum(jnp.max(jnp.abs(DTv(y_new))), h_scale),
        )
        conv = (r_prim <= settings.eps_abs + settings.eps_rel * prim_scale) \
            & (r_dual <= settings.eps_abs + settings.eps_rel * dual_scale)
        return (w_new, z_new, y_new, k + 1, conv, r_prim, r_dual)

    def cond(carry):
        _, _, _, k, conv, _, _ = carry
        return (k < settings.max_iter) & jnp.logical_not(conv)

    carry0 = (
        state.w, state.z, state.y, jnp.asarray(0, jnp.int32),
        jnp.asarray(False), jnp.asarray(jnp.inf, dt),
        jnp.asarray(jnp.inf, dt),
    )
    w, z, y, k, conv, r_prim, r_dual = jax.lax.while_loop(
        cond, body, carry0
    )
    info = ADMMInfo(
        iterations=k, r_prim=r_prim, r_dual=r_dual, converged=conv,
        iter_converged=k,
    )
    return w, ADMMState(w=w, z=z, y=y, rho=rho), info


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchResolveOperator:
    """Affine inner-solve map for a SHARED-STRUCTURE scenario batch.

    Instances share (A, B, H, D, rho) — the factorization — while
    (c, x0, bounds, warm state) vary per instance:

        w~_b = hf_b @ T + c_b @ Tc + x0_b @ J

    T  (M, M):      response to the folded cost vector (M = (N+1) nz)
    Tc (N nx, M):   response to the stacked drift c
    J  (nx, M):     response to the initial state
    rho ():         scalar penalty baked into the factorization
    """

    T: jax.Array
    Tc: jax.Array
    J: jax.Array
    rho: jax.Array


@f32_matmul_precision
def build_batch_operator(
    problem: LQRProblem,
    rho: float,
    settings: ADMMSettings = ADMMSettings(),
    cones: Sequence[projections.ConeSpec] = (),
) -> BatchResolveOperator:
    """Materialize (T, Tc, J) from ONE unbatched problem instance.

    ``problem`` supplies the shared structure; its ``c`` is ignored
    (drift enters per-instance through Tc).  M + N nx + nx cached-
    factor vector solves, batched through one vmapped scan.
    """
    dt = problem.H.dtype
    N, nz, nx = problem.N, problem.nz, problem.nx
    M = (N + 1) * nz
    sigma = settings.sigma
    mask = _con_mask(problem, tuple(cones)).astype(dt)
    rho_vec = jnp.asarray(rho, dt) * mask

    eye_z = jnp.eye(nz, dtype=dt)
    zero_g = jnp.zeros(problem.e_lb.shape, dt)
    params0 = StageParams(
        H=problem.H + sigma * eye_z, h=jnp.zeros_like(problem.h), g=zero_g
    )
    factors = riccati_dense.backward(problem, params0, rho_vec)

    def resolve(hvec, x0v, cvec):
        prob = dataclasses.replace(problem, c=cvec)
        prm = StageParams(H=params0.H, h=hvec, g=zero_g)
        f2 = riccati_dense.backward_no_refactor(prob, prm, rho_vec, factors)
        return riccati_dense.forward(prob, f2, x0v)

    zero_h = jnp.zeros((N + 1, nz), dt)
    zero_x = jnp.zeros((nx,), dt)
    zero_c = jnp.zeros((N, nx), dt)

    T = jax.vmap(
        lambda hv: resolve(hv, zero_x, zero_c)
    )(jnp.eye(M, dtype=dt).reshape(M, N + 1, nz)).reshape(M, M)
    Tc = jax.vmap(
        lambda cv: resolve(zero_h, zero_x, cv)
    )(jnp.eye(N * nx, dtype=dt).reshape(N * nx, N, nx)).reshape(N * nx, M)
    J = jax.vmap(
        lambda xv: resolve(zero_h, xv, zero_c)
    )(jnp.eye(nx, dtype=dt)).reshape(nx, M)
    return BatchResolveOperator(T=T, Tc=Tc, J=J,
                                rho=jnp.asarray(rho, dt))


@f32_matmul_precision
def solve_batch(
    problem: LQRProblem,
    x0,
    operator: BatchResolveOperator,
    cones: Sequence[projections.ConeSpec] = (),
    settings: ADMMSettings = ADMMSettings(),
    state: Optional[ADMMState] = None,
    soc_shift=None,
):
    """Operator-mode batched conic ADMM — MXU matmuls, no scans.

    ``problem`` is BATCHED (leading axis B); every instance must share
    the operator's (A, B, H, D) and rho — c, x0, bounds, and warm
    state vary freely (the scenario-MPC serving shape).  Per iteration
    the whole batch solves with (B, M) @ (M, M) matmuls; projections
    and duals are batched elementwise; runs exactly ``max_iter``
    iterations (SIMD batch semantics, like admm.solve_fused) with
    per-instance convergence tracked in the returned info.

    O(M^2) per solve vs the lane kernels' O(N): the win is for short
    horizons (N <~ 128, where the matvec rides the MXU and the scan's
    serial depth dominates); at N = 512 the lane kernels win.

    Returns (ws (B, N+1, nz), ADMMState (batched), ADMMInfo (batched)).
    """
    cones = tuple(cones)
    dt = problem.H.dtype
    Bb = problem.h.shape[0]
    N, nz, nu, nc, nx = (problem.N, problem.nz, problem.nu, problem.nc,
                         problem.nx)
    M = (N + 1) * nz
    sigma = settings.sigma
    alpha = settings.alpha
    mask = _con_mask(problem, cones).astype(dt)          # (B, N+1, nc)
    rho = jnp.asarray(operator.rho, dt)
    rho_vec = rho * mask
    inv_rho = jnp.where(mask > 0, 1.0 / rho, 0.0)

    if state is None:
        state = ADMMState(
            w=jnp.zeros(problem.h.shape, dt),
            z=jnp.zeros(problem.e_lb.shape, dt),
            y=jnp.zeros(problem.e_lb.shape, dt),
            rho=jnp.full((Bb,), rho, dt),
        )

    uterm = jnp.ones((N + 1, nz), dt).at[-1, :nu].set(0.0)
    h_masked = problem.h * uterm
    base = (jnp.asarray(x0, dt) @ operator.J
            + problem.c.reshape(Bb, N * nx) @ operator.Tc)   # (B, M)

    Dw = lambda w: jnp.einsum("bkcz,bkz->bkc", problem.D, w)
    DTv = lambda vc: jnp.einsum("bkcz,bkc->bkz", problem.D, vc)
    Hw = lambda w: jnp.einsum("bkij,bkj->bki", problem.H, w)
    h_scale = jnp.max(jnp.abs(problem.h), axis=(1, 2))
    shift = None if soc_shift is None else jnp.asarray(soc_shift, dt)

    def project(v):
        out = jnp.clip(v, problem.e_lb, problem.e_ub)
        for off, dim in cones:
            blk = v[..., off:off + dim]
            if shift is not None:
                s = shift[..., off:off + dim]
                blk = projections.project_soc(blk + s, axis=-1) - s
            else:
                blk = projections.project_soc(blk, axis=-1)
            out = out.at[..., off:off + dim].set(blk)
        return out

    def iteration(carry, _):
        w, z, y, stats = carry
        k_it, iter_conv, _, _, _ = stats
        g = z - inv_rho * y
        hf = (h_masked - sigma * w - DTv(rho_vec * g)) * uterm
        w_t = (hf.reshape(Bb, M) @ operator.T + base).reshape(
            Bb, N + 1, nz)
        z_t = Dw(w_t)

        w_new = alpha * w_t + (1.0 - alpha) * w
        v = alpha * z_t + (1.0 - alpha) * z + inv_rho * y
        z_new = project(v) * mask
        y_new = y + rho_vec * (alpha * z_t + (1.0 - alpha) * z - z_new)

        am = lambda x: jnp.max(jnp.abs(x), axis=(1, 2))
        r_prim = am((Dw(w_new) - z_new) * mask)
        dw = w - w_t
        dvec = ((1.0 - alpha) * Hw(dw) + sigma * dw
                + DTv(rho_vec * ((alpha - 1.0) * (z_t - z)
                                 + (z - z_new))))
        r_dual = am(dvec)
        prim_scale = jnp.maximum(am(Dw(w_new) * mask), am(z_new))
        dual_scale = jnp.maximum(
            am(Hw(w_new)), jnp.maximum(am(DTv(y_new)), h_scale))
        conv = (r_prim <= settings.eps_abs
                + settings.eps_rel * prim_scale) \
            & (r_dual <= settings.eps_abs
               + settings.eps_rel * dual_scale)
        k_next = k_it + 1
        iter_conv = jnp.where(conv & (iter_conv < 0), k_next, iter_conv)
        return (w_new, z_new, y_new,
                (k_next, iter_conv, r_prim, r_dual, conv)), None

    stats0 = (
        jnp.asarray(0, jnp.int32), jnp.full((Bb,), -1, jnp.int32),
        jnp.full((Bb,), jnp.inf, dt), jnp.full((Bb,), jnp.inf, dt),
        jnp.zeros((Bb,), bool),
    )
    (w, z, y, stats), _ = jax.lax.scan(
        iteration, (state.w, state.z, state.y, stats0), None,
        length=settings.max_iter)
    k_it, iter_conv, r_prim, r_dual, conv = stats
    info = ADMMInfo(
        iterations=jnp.full((Bb,), k_it), r_prim=r_prim, r_dual=r_dual,
        converged=conv,
        iter_converged=jnp.where(iter_conv < 0, k_it, iter_conv),
    )
    st = ADMMState(w=w, z=z, y=y, rho=jnp.full((Bb,), rho, dt))
    return w, st, info


def replan_fn(
    problem: LQRProblem,
    operator: ResolveOperator,
    cones: Sequence[projections.ConeSpec] = (),
    settings: ADMMSettings = ADMMSettings(),
    soc_shift=None,
):
    """Jitted (x0, state) -> (ws, state, info) closure for the MPC loop.

    One trace covers every replan tick (x0/state are the only moving
    inputs), which is what keeps the while_loop path at microseconds.
    """
    cones = tuple(cones)

    def fn(x0, state):
        return solve(
            problem, x0, operator, cones, settings, state, soc_shift
        )

    return jax.jit(fn)
