"""Multi-chip PDP with fused Pallas segment kernels.

The fully TPU-native realization of the reference's parallel solver
(lqr_solver_parallel.hpp): each "time"-axis device runs the fused
batch-in-lanes PDP segment reduction (ops/pallas_riccati.backward_pdp_lanes)
over its horizon shard, boundary factors (P,F,C,p,f) all-gather over
ICI (each nx*nx per instance), the condensed block-tridiagonal solve
(ops/condensed, Cholesky variant) runs replicated per device, the
boundary dual folds into the feedforward (d' = d + Gp uhat — the
P-form of lqr_kernel_parallel.hpp:197's u += G uhat), and the fused
rollout kernel finishes each segment.

Compared with parallel/pdp_sharded.py (XLA segment scans), this path
keeps all per-stage math in the lane kernels — same ~15-60x advantage
the single-chip fused path shows over the XLA scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pdp_lqr_tpu.config import f32_matmul_precision
from pdp_lqr_tpu.ops import condensed, pallas_riccati as pr
from pdp_lqr_tpu.problem import ADMMIterates, LQRProblem, make_stage_params

_CACHE: dict = {}


def segment_solve_local(S: int, interpret: bool,
                        A_l, B_l, c_l, H_l, h_l, D_l, rho_l, rg_l,
                        PNb, pNb, x0):
    """One time-device's share of the fused-PDP inner solve.

    Runs INSIDE a shard_map body with a "time" axis of size S.  Lanes-
    layout local stage shards (Nl, ..., Bl); PNb/pNb (Bl, nx[, nx]) is
    the already-folded terminal cost (used only by the last device);
    x0 (Bl, nx).  Returns (ws_l (Nl, nz, Bl), xN (Bl, nx) — psum'd so
    every device holds the terminal state).

    Shared by the one-shot sharded solve below and the sharded ADMM
    loop (parallel/admm_sharded.py).
    """
    i = jax.lax.axis_index("time")
    is_last = i == S - 1
    nx = A_l.shape[1]
    dt = A_l.dtype
    Bl = A_l.shape[-1]

    w = is_last.astype(dt)
    Pi = w * jnp.moveaxis(PNb, 0, -1)
    pi = w * jnp.moveaxis(pNb, 0, -1)
    eye = jnp.eye(nx, dtype=dt)[:, :, None]
    Fi = jnp.broadcast_to(eye, (nx, nx, Bl))
    Ci = jnp.zeros((nx, nx, Bl), dt)
    fi = jnp.zeros((nx, Bl), dt)

    K, d, M, v, Gp, P0, p0, F0, C0, f0 = pr.backward_pdp_lanes(
        A_l, B_l, c_l, H_l, h_l, D_l, rho_l, rg_l,
        Pi, pi, Fi, Ci, fi, interpret=interpret,
    )

    # Boundary handoff over ICI; condensed solve replicated.
    gath = lambda x: jnp.moveaxis(
        jax.lax.all_gather(x, "time", axis=0), -1, 1
    )  # (S, ..., Bl) -> (S, Bl, ...) -> moveaxis: (S, Bl, a, b)
    Pg = jnp.swapaxes(gath(P0), 0, 1)  # (Bl, S, nx, nx)
    Fg = jnp.swapaxes(gath(F0), 0, 1)
    Cg = jnp.swapaxes(gath(C0), 0, 1)
    pg = jnp.swapaxes(gath(p0), 0, 1)  # (Bl, S, nx)
    fg = jnp.swapaxes(gath(f0), 0, 1)

    fac = condensed.cholesky_backward(Pg, Fg, Cg)
    xhat, uhat = condensed.cholesky_forward(fac, pg, fg, x0)

    xh_i = jnp.moveaxis(jnp.take(xhat, i, axis=1), 0, -1)  # (nx, Bl)
    uh_i = jnp.moveaxis(jnp.take(uhat, i, axis=1), 0, -1)

    # Boundary-dual feedforward correction (zero on the last
    # segment, where uhat is identically zero).
    dd = jnp.einsum("tuxb,xb->tub", Gp, uh_i)
    d_adj = d + dd
    v_adj = v + jnp.einsum("txub,tub->txb", B_l, dd)

    ws_l, x_end = pr.forward_lanes(M, v_adj, K, d_adj, xh_i,
                                   interpret=interpret)
    xN = jnp.moveaxis(x_end, -1, 0)                  # (Bl, nx)
    xN = jax.lax.psum(
        jnp.where(is_last, xN, jnp.zeros_like(xN)), "time"
    )
    return ws_l, xN


def segment_factors_local(S: int, interpret: bool,
                          A_l, B_l, H_l, D_l, rho_l, PNb):
    """Matrix-only PDP factor build — the cached half of the parallel
    solver's with/without-factorization split
    (lqr_solver_parallel.hpp:148-154).

    Runs INSIDE a shard_map body with a "time" axis of size S.  Every
    matrix quantity of the segment reduction (per-stage K, M, Gp,
    P_{k+1}, chol(Huu), F_{k+1}; boundary P0/F0/C0; the condensed
    Cholesky factorization) is iterate-independent while rho is
    unchanged, so it is built once here from zero vector inputs and
    reused by segment_solve_cached until the penalty moves.

    Returns an opaque factor pytree.
    """
    i = jax.lax.axis_index("time")
    is_last = i == S - 1
    Nl, nx = A_l.shape[0], A_l.shape[1]
    nz = H_l.shape[1]
    nc = D_l.shape[1]
    dt = A_l.dtype
    Bl = A_l.shape[-1]

    w = is_last.astype(dt)
    Pi = w * jnp.moveaxis(PNb, 0, -1)
    pi = jnp.zeros((nx, Bl), dt)
    eye = jnp.eye(nx, dtype=dt)[:, :, None]
    Fi = jnp.broadcast_to(eye, (nx, nx, Bl))
    Ci = jnp.zeros((nx, nx, Bl), dt)
    fi = jnp.zeros((nx, Bl), dt)

    zc = jnp.zeros((Nl, nx, Bl), dt)
    zh = jnp.zeros((Nl, nz, Bl), dt)
    zrg = jnp.zeros((Nl, nc, Bl), dt)
    (K, _, M, _, Gp, Pst, Lst, Fst,
     P0, _, F0, C0, _) = pr.backward_pdp_lanes(
        A_l, B_l, zc, H_l, zh, D_l, rho_l, zrg,
        Pi, pi, Fi, Ci, fi, interpret=interpret, export_factors=True,
    )

    gath = lambda x: jnp.moveaxis(
        jax.lax.all_gather(x, "time", axis=0), -1, 1
    )
    Pg = jnp.swapaxes(gath(P0), 0, 1)  # (Bl, S, nx, nx)
    Fg = jnp.swapaxes(gath(F0), 0, 1)
    Cg = jnp.swapaxes(gath(C0), 0, 1)
    fac = condensed.cholesky_backward(Pg, Fg, Cg)
    return (K, M, Gp, Pst, Lst, Fst, fac)


def segment_solve_cached(S: int, interpret: bool, factors,
                         A_l, B_l, c_l, hf_l, pNb, x0):
    """Cached-factor inner solve: vector-only segment sweep + cached
    condensed forward + cached-map rollout
    (lqr_solver_parallel.hpp:190-211 + :213-238 with reused factors).

    ``hf_l`` (Nl, nz, Bl) is the fully iterate-folded linear cost
    h - sigma w - D^T (rho g); ``pNb`` (Bl, nx) its terminal row.
    Same contract as segment_solve_local otherwise.
    """
    K, M, Gp, Pst, Lst, Fst, fac = factors
    i = jax.lax.axis_index("time")
    is_last = i == S - 1
    dt = A_l.dtype

    w = is_last.astype(dt)
    pi = w * jnp.moveaxis(pNb, 0, -1)

    d, v, p0, f0 = pr.backward_pdp_vectors_lanes(
        A_l, B_l, c_l, hf_l, Pst, K, Lst, Fst, pi, interpret=interpret,
    )

    gath = lambda x: jnp.moveaxis(
        jax.lax.all_gather(x, "time", axis=0), -1, 1
    )
    pg = jnp.swapaxes(gath(p0), 0, 1)  # (Bl, S, nx)
    fg = jnp.swapaxes(gath(f0), 0, 1)
    xhat, uhat = condensed.cholesky_forward(fac, pg, fg, x0)

    xh_i = jnp.moveaxis(jnp.take(xhat, i, axis=1), 0, -1)  # (nx, Bl)
    uh_i = jnp.moveaxis(jnp.take(uhat, i, axis=1), 0, -1)

    dd = jnp.einsum("tuxb,xb->tub", Gp, uh_i)
    d_adj = d + dd
    v_adj = v + jnp.einsum("txub,tub->txb", B_l, dd)

    ws_l, x_end = pr.forward_lanes(M, v_adj, K, d_adj, xh_i,
                                   interpret=interpret)
    xN = jnp.moveaxis(x_end, -1, 0)
    xN = jax.lax.psum(
        jnp.where(is_last, xN, jnp.zeros_like(xN)), "time"
    )
    return ws_l, xN


def fold_terminal(nu: int, HN, hN, DN, rhoN, gN):
    """Penalty-fold the terminal cost (lqr_kernel_parallel.hpp:51-67,
    P-form): (Bl, ...) batched arrays -> (PNb, pNb)."""
    PNb = HN[:, nu:, nu:]
    pNb = hN[:, nu:]
    if DN.shape[1] > 0:
        DNx = DN[:, :, nu:]
        PNb = PNb + jnp.einsum("bci,bc,bcj->bij", DNx, rhoN, DNx)
        pNb = pNb - jnp.einsum("bci,bc->bi", DNx, rhoN * gN)
    return PNb, pNb


def _build(mesh: Mesh, nu: int, interpret: bool):
    S = mesh.shape["time"]

    @f32_matmul_precision
    def body(A, B, c, H, h, D, rho, g, HN, hN, DN, rhoN, gN, x0):
        # Local shapes: stage args (Bl, Nl, ...); terminal args (Bl, ...).
        lanes3 = lambda x: jnp.transpose(x, (1, 2, 3, 0))  # (Nl,a,b,Bl)
        lanes2 = lambda x: jnp.transpose(x, (1, 2, 0))     # (Nl,a,Bl)

        PNb, pNb = fold_terminal(nu, HN, hN, DN, rhoN, gN)
        ws_l, xN = segment_solve_local(
            S, interpret,
            lanes3(A), lanes3(B), lanes2(c), lanes3(H), lanes2(h),
            lanes3(D), lanes2(rho), lanes2(rho * g), PNb, pNb, x0,
        )
        ws_local = jnp.transpose(ws_l, (2, 0, 1))        # (Bl, Nl, nz)
        return ws_local, xN

    stage_spec = P("batch", "time")
    term_spec = P("batch")
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stage_spec,) * 8 + (term_spec,) * 5 + (term_spec,),
        out_specs=(stage_spec, term_spec),
        check_vma=False,
    )
    return jax.jit(f)


def solve(
    mesh: Mesh,
    problem: LQRProblem,
    it: ADMMIterates,
    x0,
    sigma: float,
    *,
    interpret: bool = False,
):
    """Sharded fused-PDP solve of a batch of problems.

    Same contract as parallel.pdp_sharded.solve: ("batch", "time")
    mesh, batched pytrees, returns ws (B, N+1, nz).  Local batch shard
    must satisfy the Pallas lane alignment on hardware (any size in
    interpret mode).
    """
    nu = problem.nu
    key = (mesh, nu, interpret)
    if key not in _CACHE:
        _CACHE[key] = _build(mesh, nu, interpret)
    fn = _CACHE[key]

    params = jax.vmap(lambda p, i: make_stage_params(p, i, sigma))(problem, it)
    ws_stages, xN = fn(
        problem.A, problem.B, problem.c,
        params.H[:, :-1], params.h[:, :-1],
        problem.D[:, :-1], it.rho[:, :-1], params.g[:, :-1],
        params.H[:, -1], params.h[:, -1],
        problem.D[:, -1], it.rho[:, -1], params.g[:, -1],
        x0,
    )
    wN = jnp.concatenate(
        [jnp.zeros(xN.shape[:-1] + (nu,), xN.dtype), xN], axis=-1
    )
    return jnp.concatenate([ws_stages, wN[:, None, :]], axis=1)
