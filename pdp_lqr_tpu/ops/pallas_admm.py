"""Single-kernel fused conic ADMM iteration — one pallas_call per iter.

solvers/admm.solve_fused runs each ADMM iteration as a backward kernel,
a forward kernel, and a tail of XLA elementwise ops.  That splits one
logical iteration across three HBM round-trips: the backward pass
writes the per-stage gains (K, d, M, v) to HBM, the forward pass reads
them back, and the projection/dual/residual tail re-reads the stage
data (D twice, H twice) it just streamed.  At short horizons the whole
gain tensor fits in VMEM, so none of that traffic is necessary.

This kernel fuses the ENTIRE iteration (reference inner step
lqr_solver.hpp:58-77 plus the outer-loop updates the reference omits)
into one pallas_call with a two-phase grid over (lane_chunk, 2N/T),
each grid step covering T consecutive stages streamed as one block
(fewer, larger DMAs — see _pick_stages in ops/pallas_riccati):

  phase 1 (t < N/T)   backward Riccati sweep, T stages in-register
                      per step: in-register penalty fold from the
                      streamed iterates (rg = rho z - y computed
                      in-kernel), (P, p) carried in VMEM scratch,
                      gains (K, d) SPILLED TO VMEM SCRATCH, never to
                      HBM.
  phase 2 (t >= N/T)  forward rollout reusing the streamed (A, B, c)
                      blocks, immediately followed by each stage's
                      relaxation, box/SOC/RSOC projection, dual
                      ascent, and residual-max accumulation — w+, z+,
                      y+ are the only trajectory-sized HBM writes.

Residual maxima (r_prim, r_dual, prim/dual scales) accumulate in a
(4, chunk) scratch and emerge as one (4, B) output; the terminal stage
(no control, tiny) and the convergence/adaptive-rho logic stay in XLA
(solvers/admm.solve_fused(single_kernel=True)).

VMEM cost: the (K, d) spill is N*(nu*nx + nu) words/lane, which bounds
the horizon (~N <= 256 at the 128-lane floor for the quadrotor).  Use
the two-kernel path for longer horizons; _pick_chunk degrades the lane
chunk automatically in between.

Masking note: rows whose D is identically zero (ragged-nc padding)
need no rho mask in the fold or the residuals — every term they
contribute passes through a zero D row.  Only the projection output
and the dual update are explicitly masked (z/y invariantly zero on
padded rows), matching solvers/admm semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdp_lqr_tpu.ops.pallas_riccati import (
    _chol_lanes,
    _chol_solve_lanes,
    _chol_solve_rows,
    _compiler_params,
    _low_rows,
    _mm,
    _mtm,
    _mtm_sym,
    _mtv,
    _mv,
    _pick_chunk,
    _pick_stages,
    _shared_slice,
)


def _soc_lanes(blk, eps=1e-12):
    """Project [t; x] rows (dim, B) onto the SOC, batch-in-lanes."""
    t = blk[0]
    x = blk[1:]
    nxn = jnp.sqrt(jnp.sum(x * x, axis=0))
    scale = 0.5 * (t + nxn)
    inside = nxn <= t
    polar = nxn <= -t
    safe = jnp.where(nxn > eps, nxn, 1.0)
    xdir = x / safe[None]
    t_p = jnp.where(inside, t, jnp.where(polar, 0.0, scale))
    x_p = jnp.where(
        inside[None], x, jnp.where(polar[None], 0.0, scale[None] * xdir)
    )
    return jnp.concatenate([t_p[None], x_p], axis=0)


_SQRT_HALF = 0.7071067811865476


def _rsoc_lanes(blk, eps=1e-12):
    """Rotated SOC on (dim, B) rows [p; q; x] (see projections.project_rsoc)."""
    p = blk[0]
    q = blk[1]
    rot = jnp.concatenate(
        [
            (_SQRT_HALF * (p + q))[None],
            (_SQRT_HALF * (p - q))[None],
            blk[2:],
        ],
        axis=0,
    )
    proj = _soc_lanes(rot, eps)
    return jnp.concatenate(
        [
            (_SQRT_HALF * (proj[0] + proj[1]))[None],
            (_SQRT_HALF * (proj[0] - proj[1]))[None],
            proj[2:],
        ],
        axis=0,
    )


def _project_lanes(v, lb, ub, cones, sh):
    """Box + cone projection on (nc, B) tiles (cone rows on sublanes).

    Assembled by concatenating static row segments rather than
    ``.at[].set`` — in-kernel scatter does not lower on TPU (and the
    update carried a stray empty index constant at trace time); cone
    offsets are static and non-overlapping, so concatenation is exact.
    """
    box = jnp.clip(v, lb, ub)
    segs = []
    pos = 0
    for off, dim, kind in cones:
        if off > pos:
            segs.append(box[pos:off])
        fn = _soc_lanes if kind == "soc" else _rsoc_lanes
        blk = v[off : off + dim]
        if sh is not None:
            s = sh[off : off + dim]
            blk = fn(blk + s) - s
        else:
            blk = fn(blk)
        segs.append(blk)
        pos = off + dim
    if pos < v.shape[0]:
        segs.append(box[pos:])
    return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)


def _admm_iter_kernel(nu, nx, nc, N, T, cones, alpha, sigma, has_shift,
                      cached, *refs):
    (rho_ref, PN_ref, pN_ref, x0_ref,
     A_ref, B_ref, c_ref, Hs_ref, h_ref, D_ref, lb_ref, ub_ref, m_ref,
     *rest) = refs
    if has_shift:
        sh_ref = rest[0]
        rest = rest[1:]
    else:
        sh_ref = None
    if cached:
        # Cached-factor mode: per-stage P_{k+1}, chol(Huu), K streamed
        # from HBM (exported by backward_lanes(export_factors=True));
        # phase 1 is the vector-only sweep and only d spills to VMEM.
        Pf_ref, Lf_ref, Kf_ref, *rest = rest
        (w_ref, z_ref, y_ref,
         wn_ref, zn_ref, yn_ref, xN_ref, res_ref,
         p_scr, x_scr, d_scr, acc_scr) = rest
        K_scr = None
    else:
        (w_ref, z_ref, y_ref,
         wn_ref, zn_ref, yn_ref, xN_ref, res_ref,
         P_scr, p_scr, x_scr, K_scr, d_scr, acc_scr) = rest

    # NT = N // T grid steps per phase; each step covers T consecutive
    # stages streamed as one block (see _backward_kernel for why).
    NT = N // T
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        if not cached:
            P_scr[:] = PN_ref[:]
        p_scr[:] = pN_ref[:]

    # Stage data may be stored narrower (bf16) than the compute/carry
    # dtype — upcast at load (see _backward_kernel); iterates, bounds,
    # and outputs stay in the carry precision.
    cdt = p_scr.dtype

    @pl.when(t < NT)
    def _backward():
        rho = rho_ref[0]                       # (chunk,)
        p = p_scr[:]
        if cached:
            # Vector-only sweep on cached factors (the reference's
            # backward_without_factorization, lqr_kernel.hpp:149-178):
            # matrix quantities are iterate-independent while rho is
            # unchanged; only the affine recursion is redone.
            for i in range(T - 1, -1, -1):
                A = A_ref[i].astype(cdt)
                Bm = B_ref[i].astype(cdt)
                c = c_ref[i].astype(cdt)
                h = h_ref[i].astype(cdt) - sigma * w_ref[i]
                if nc > 0:
                    D = D_ref[i].astype(cdt)
                    z = z_ref[i]
                    y = y_ref[i]
                    m = m_ref[i]
                    for ci in range(nc):
                        rg_c = rho * m[ci] * z[ci] - y[ci]   # (chunk,)
                        h = h - rg_c[None, :] * D[ci]
                P = Pf_ref[i]
                K = Kf_ref[i]
                Lt = Lf_ref[i]
                L = [[Lt[li, lj] if lj <= li else None
                      for lj in range(nu)] for li in range(nu)]

                Pcp = _mv(P, c) + p
                rbar = h[:nu] + _mtv(Bm, Pcp)
                d = -jnp.stack(
                    _chol_solve_lanes(L, [rbar[ri] for ri in range(nu)]),
                    axis=0,
                )
                s_idx = (NT - 1 - t) * T + i
                d_scr[pl.ds(s_idx, 1)] = d[None]
                p = h[nu:] + _mtv(A, Pcp) + _mtv(K, rbar)
            p_scr[:] = p
            return

        P = P_scr[:]
        for i in range(T - 1, -1, -1):
            A = A_ref[i].astype(cdt)
            Bm = B_ref[i].astype(cdt)
            c = c_ref[i].astype(cdt)
            H = Hs_ref[i].astype(cdt)
            h = h_ref[i].astype(cdt) - sigma * w_ref[i]
            # Penalty fold with in-kernel rg = rho_row z - y (z, y are
            # invariantly zero on padded rows).  The mask stream m
            # carries the per-row rho SCALE (0 padded / 1 / eq-boost) —
            # the reference's rho_vecs interface (lqr_solver.hpp:15-22).
            if nc > 0:
                D = D_ref[i].astype(cdt)
                z = z_ref[i]
                y = y_ref[i]
                m = m_ref[i]
                for ci in range(nc):
                    rho_c = rho * m[ci]                # (chunk,)
                    wrow = rho_c[None, :] * D[ci]      # (nz, chunk)
                    rows = []
                    for ri in range(H.shape[0]):
                        rows.append(H[ri] + D[ci, ri][None, :] * wrow)
                    H = jnp.stack(rows, axis=0)
                    rg_c = rho_c * z[ci] - y[ci]       # (chunk,)
                    h = h - rg_c[None, :] * D[ci]

            R = H[:nu, :nu]
            S = H[:nu, nu:]
            Q = H[nu:, nu:]
            r = h[:nu]
            q = h[nu:]

            PA = _mm(P, A)
            PB = _mm(P, Bm)
            Pcp = _mv(P, c) + p
            G = S + _mtm(Bm, PA)
            rbar = r + _mtv(Bm, Pcp)

            L = _chol_lanes(_low_rows(R, Bm, PB))
            # [K d] = -Huu^{-1} [G rbar]: one multi-rhs solve on
            # (nx+1, chunk) row tiles (see _chol_solve_rows).
            sol = _chol_solve_rows(
                L,
                [jnp.concatenate([G[gi], rbar[gi][None, :]], axis=0)
                 for gi in range(nu)],
            )
            K = -jnp.stack([sol[gi][:nx] for gi in range(nu)], axis=0)
            d = -jnp.stack([sol[gi][nx] for gi in range(nu)], axis=0)

            Pn = _mtm_sym([(A, PA), (G, K)], Q)
            pn = q + _mtv(A, Pcp) + _mtv(K, rbar)

            s_idx = (NT - 1 - t) * T + i
            K_scr[pl.ds(s_idx, 1)] = K[None]
            d_scr[pl.ds(s_idx, 1)] = d[None]
            P = Pn
            p = pn
        P_scr[:] = P
        p_scr[:] = p

    @pl.when(t >= NT)
    def _forward_update():
        @pl.when(t == NT)
        def _():
            x_scr[:] = x0_ref[:]
            acc_scr[:] = jnp.zeros_like(acc_scr)

        rho = rho_ref[0]
        x = x_scr[:]
        acc = acc_scr[:]
        for i in range(T):
            s_idx = (t - NT) * T + i
            K = Kf_ref[i] if cached else K_scr[pl.ds(s_idx, 1)][0]
            d = d_scr[pl.ds(s_idx, 1)][0]
            u = _mv(K, x) + d
            w_t = jnp.concatenate([u, x], axis=0)      # (nz, chunk)
            A = A_ref[i].astype(cdt)
            Bm = B_ref[i].astype(cdt)
            c = c_ref[i].astype(cdt)
            x = _mv(A, x) + _mv(Bm, u) + c

            w = w_ref[i]
            z = z_ref[i]
            y = y_ref[i]
            D = D_ref[i].astype(cdt)
            m = m_ref[i]
            lb = lb_ref[i]
            ub = ub_ref[i]
            sh = sh_ref[i] if has_shift else None

            z_t = _mv(D, w_t)                          # (nc, chunk)
            w_new = alpha * w_t + (1.0 - alpha) * w
            # m carries the per-row rho scale; rows with m = 0 are
            # padded (z, y invariantly zero there).
            rho_m = rho[None, :] * m                   # (nc, chunk)
            m01 = jnp.where(m > 0, 1.0, 0.0).astype(cdt)
            v = alpha * z_t + (1.0 - alpha) * z + jnp.where(
                m > 0, y / jnp.maximum(rho_m, 1e-30), 0.0)
            z_new = _project_lanes(v, lb, ub, cones, sh) * m01
            y_new = y + rho_m * (
                alpha * z_t + (1.0 - alpha) * z - z_new
            )
            wn_ref[i] = w_new
            zn_ref[i] = z_new
            yn_ref[i] = y_new

            # Residual partials (exact OSQP 3.4 terms; see solvers/admm).
            Hs = Hs_ref[i].astype(cdt)
            Dw_new = _mv(D, w_new)
            dw = w - w_t
            zt_term = rho_m * (
                (alpha - 1.0) * (z_t - z) + (z - z_new)
            )
            # (1-a) H dw + sigma dw with H = Hs - sigma I
            #   = (1-a) Hs dw + a sigma dw.
            dvec = (
                (1.0 - alpha) * _mv(Hs, dw)
                + (alpha * sigma) * dw
                + _mtv(D, zt_term)
            )
            Hw = _mv(Hs, w_new) - sigma * w_new
            dty = _mtv(D, y_new)

            rp = jnp.max(jnp.abs(Dw_new - z_new), axis=0)
            rd = jnp.max(jnp.abs(dvec), axis=0)
            ps = jnp.maximum(
                jnp.max(jnp.abs(Dw_new), axis=0),
                jnp.max(jnp.abs(z_new), axis=0),
            )
            ds = jnp.maximum(
                jnp.max(jnp.abs(Hw), axis=0), jnp.max(jnp.abs(dty), axis=0)
            )
            acc = jnp.maximum(acc, jnp.stack([rp, rd, ps, ds]))
        x_scr[:] = x
        acc_scr[:] = acc

        @pl.when(t == 2 * NT - 1)
        def _():
            xN_ref[:] = x
            res_ref[:] = acc


# --------------------------------------------- split (two-kernel) iteration
#
# The single-kernel iteration spills (K,) d to VMEM scratch, which (a)
# bounds the horizon and (b) forces the batch chunk to be the MAJOR
# grid dimension — so in shared mode every batch chunk re-streams the
# pinned stage/factor windows from HBM.  At N=512 that re-streaming is
# the dominant cost (measured: the full cached shared iteration ran at
# ~24 ms/iter vs ~6 ms of unique bytes).  The split pair below passes
# (d, v) through HBM instead, which frees the grid to be CHUNK-MINOR:
# the pinned windows' block index is then constant along the minor
# dimension and the pipeline emitter elides their re-fetch — shared
# streams cross HBM once per TIME step, not once per batch chunk
# (measured 1.4x on the shared forward alone).
#
#   kernel A (_admm_bwd_vec_kernel_il): cached-factor vector backward
#     sweep with the IN-KERNEL iterate fold (rg = rho z - y, hf = h -
#     sigma w - D^T rg — the reference's update_problem_data +
#     backward_without_factorization, lqr_solver.hpp:41-70, fused);
#     emits (d, v).
#   kernel B (_admm_fwd_update_kernel_il): closed-loop rollout x+ =
#     M x + v (M = A + B K cached) fused with the relax / project /
#     dual / residual tail of _admm_iter_kernel phase 2.
#
# Both require shared mode with batch-uniform rho (pinned factors).


def _rung_select(full, rows, sel):
    """Per-lane rung selection of a (R*rows, cols, chunk) factor block:
    sum_r full[r*rows:(r+1)*rows] * onehot_r — R broadcast FMAs/row."""
    R = len(sel)
    out = full[:rows] * sel[0][None, None, :]
    for r in range(1, R):
        out = out + full[r * rows : (r + 1) * rows] * sel[r][None, None, :]
    return out


def _admm_bwd_vec_kernel_il(nu, nx, nc, T, chunk, sigma, R, pc_mode,
                            rho_ref, *refs):
    if R > 1:
        oh_ref, *refs = refs
    if pc_mode:
        # P enters the recursion ONLY as P c (both iterate-independent):
        # the caller pre-folds Pc per scenario, dropping the biggest
        # pinned stream AND the biggest in-kernel matvec.
        (pN_ref,
         A_ref, B_ref, h_ref, D_ref, m_ref,
         L_ref, K_ref,
         c_ref, Pc_ref, wzy_ref,
         dv_ref, p_scr) = refs
        P_ref = None
    else:
        (pN_ref,
         A_ref, B_ref, h_ref, D_ref, m_ref,
         P_ref, L_ref, K_ref,
         c_ref, wzy_ref,
         dv_ref, p_scr) = refs
    # rho/pN are UNBLOCKED full-VMEM residents (tiny, fetched once per
    # kernel launch): blocked (0,...,b) windows would re-issue a DMA on
    # every minor grid step — thousands of issues for KBs of data.
    nz = nu + nx
    t = pl.program_id(0)
    ch = pl.program_id(1)
    sl = pl.ds(ch * chunk, chunk)

    @pl.when(t == 0)
    def _():
        p_scr[:, sl] = pN_ref[:, sl]

    cdt = p_scr.dtype
    rho = rho_ref[0, sl]                          # (chunk,)
    sel = [oh_ref[r, sl] for r in range(R)] if R > 1 else None
    p = p_scr[:, sl]
    for i in range(T - 1, -1, -1):
        A = A_ref[i].astype(cdt)
        Bm = B_ref[i].astype(cdt)
        c = c_ref[i].astype(cdt)
        # Per-scenario iterates ride ONE packed window: rows
        # [w (nz) | z (nc) | y (nc)] (fewer DMA issues — the sweeps
        # are per-window-overhead-bound, docs/KERNEL_DESIGN.md).
        wzy = wzy_ref[i]
        h = h_ref[i].astype(cdt) - sigma * wzy[:nz]
        if nc > 0:
            D = D_ref[i].astype(cdt)
            m = m_ref[i]
            for ci in range(nc):
                rg_c = (rho * m[ci] * wzy[nz + ci]
                        - wzy[nz + nc + ci])           # (chunk,)
                h = h - rg_c[None, :] * D[ci]
        if R > 1:
            # Rho-ladder mode: R rungs' factors ride the pinned streams
            # stacked on rows; each lane folds its own rung's factors
            # (per-instance adaptive rho without per-instance factor
            # streams in HBM).
            K = _rung_select(K_ref[i].astype(cdt), nu, sel)
            Lt = _rung_select(L_ref[i].astype(cdt), nu, sel)
            P = _rung_select(P_ref[i].astype(cdt), nx, sel)
        else:
            K = K_ref[i].astype(cdt)
            Lt = L_ref[i].astype(cdt)
            P = None if pc_mode else P_ref[i].astype(cdt)
        L = [[Lt[li, lj] if lj <= li else None for lj in range(nu)]
             for li in range(nu)]

        Pcp = (Pc_ref[i] if pc_mode else _mv(P, c)) + p
        rbar = h[:nu] + _mtv(Bm, Pcp)
        d = -jnp.stack(
            _chol_solve_lanes(L, [rbar[ri] for ri in range(nu)]), axis=0
        )
        dv_ref[i] = jnp.concatenate([d, _mv(Bm, d) + c], axis=0)
        p = h[nu:] + _mtv(A, Pcp) + _mtv(K, rbar)
    p_scr[:, sl] = p


def _admm_bwd_vec_prefold_kernel(nu, nx, T, chunk,
                                 pN_ref, AK_ref, BL_ref,
                                 c_ref, Pc_ref, hf_ref,
                                 dv_ref, p_scr):
    """PREFOLD backward kernel: the iterate fold already happened —
    kernel B emitted hf = h - sigma w - D^T(rho z - y) for THIS
    iteration (valid while rho is unchanged; the refactor cond
    recomputes it in XLA otherwise).  This kernel is then the pure
    cached vector recursion: no D/h/mask streams, no packed-iterate
    read — the slimmest possible backward (measured: kernel A's
    window set dropped ~570 MB/iter at N=512 B=4096 f32).

    The pinned matrix streams ride PACKED on the leading (untiled)
    per-stage row axis — AK = [A; K] (nz, nx, W) and BL = [B; L]
    (nz, nu, W) — so the four shared windows of the unpacked form
    collapse to two (the sweeps are per-window-issue-bound; same
    bytes, half the DMA issues).  Leading-axis slices are free: the
    (8, 128) tiling lives on the trailing (cols, lanes) dims."""
    t = pl.program_id(0)
    ch = pl.program_id(1)
    sl = pl.ds(ch * chunk, chunk)

    @pl.when(t == 0)
    def _():
        p_scr[:, sl] = pN_ref[:, sl]

    cdt = p_scr.dtype
    p = p_scr[:, sl]
    for i in range(T - 1, -1, -1):
        ak = AK_ref[i].astype(cdt)
        A, K = ak[:nx], ak[nx:]
        bl = BL_ref[i].astype(cdt)
        Bm, Lt = bl[:nx], bl[nx:]
        c = c_ref[i].astype(cdt)
        hf = hf_ref[i]
        L = [[Lt[li, lj] if lj <= li else None for lj in range(nu)]
             for li in range(nu)]

        Pcp = Pc_ref[i] + p
        rbar = hf[:nu] + _mtv(Bm, Pcp)
        d = -jnp.stack(
            _chol_solve_lanes(L, [rbar[ri] for ri in range(nu)]), axis=0
        )
        dv_ref[i] = jnp.concatenate([d, _mv(Bm, d) + c], axis=0)
        p = hf[nu:] + _mtv(A, Pcp) + _mtv(K, rbar)
    p_scr[:, sl] = p


def admm_bwd_vec_prefold_lanes(pN, AK, BL, c, Pc, hf, *, nu,
                               interpret=False):
    """Wrapper for the prefold backward kernel (see its docstring).
    Shared streams (packed on the leading row axis): AK = [A; K]
    (N, nz, nx, W), BL = [B; L] (N, nz, nu, W); per-scenario: pN, c,
    Pc, hf.  Returns dv (N, nu+nx, B)."""
    N, nx = AK.shape[0], AK.shape[2]
    Bt = hf.shape[-1]
    nz = nx + nu
    dt = hf.dtype
    c_item = jnp.dtype(dt).itemsize
    sw = jnp.dtype(AK.dtype).itemsize / c_item
    words = int(sw * (nx * nx + nx * nu + nx)      # A B c
                + nu * nu + nu * nx                # L K
                + nx + nz                          # Pc hf
                + nu + nx) + 1                     # dv out
    chunk = _pick_chunk(Bt, words, 24 * nz * nz, c_item)
    AK = _shared_slice("AK", AK, chunk)
    BL = _shared_slice("BL", BL, chunk)
    n_chunks = Bt // chunk
    T = _split_stages(N, words, 24 * nz * nz, chunk, c_item)
    NT = N // T

    stage = lambda *dims: pl.BlockSpec(
        (T,) + dims[:-1] + (chunk,),
        lambda t, b: (NT - 1 - t,) + (0,) * (len(dims) - 1) + (b,),
        memory_space=pltpu.VMEM,
    )
    stage_sh = lambda *dims: pl.BlockSpec(
        (T,) + dims[:-1] + (chunk,),
        lambda t, b: (NT - 1 - t,) + (0,) * (len(dims) - 1) + (0,),
        memory_space=pltpu.VMEM,
    )
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_admm_bwd_vec_prefold_kernel, nu, nx, T,
                               chunk)
    return pl.pallas_call(
        kernel,
        grid=(NT, n_chunks),
        in_specs=[
            resident,
            stage_sh(nz, nx, Bt), stage_sh(nz, nu, Bt),
            stage(nx, Bt), stage(nx, Bt), stage(nz, Bt),
        ],
        out_specs=stage(nu + nx, Bt),
        out_shape=jax.ShapeDtypeStruct((N, nu + nx, Bt), dt),
        scratch_shapes=[pltpu.VMEM((nx, Bt), dt)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(pN, AK, BL, c, Pc, hf)


def _admm_fwd_update_kernel_il(nu, nx, nc, T, chunk, cones, alpha, sigma,
                               has_shift, R, diag_cost, emit_hf, packed,
                               *refs):
    nz = nu + nx
    rho_ref, *refs = refs
    if R > 1:
        oh_ref, *refs = refs
    if packed:
        # Pinned streams packed on the leading (untiled) axis:
        # MK = [M; K] (nz, nx, W) per stage, bnd = stack(lb, ub, mask
        # [, shift]) (3+s, nc, W) — same bytes, 5-6 windows -> 2.
        (x0_ref, MK_ref, Hs_ref, D_ref, bnd_ref, *rest) = refs
        sh_ref = None
    else:
        (x0_ref,
         M_ref, K_ref, Hs_ref, D_ref, lb_ref, ub_ref, m_ref,
         *rest) = refs
        if has_shift:
            sh_ref, *rest = rest
        else:
            sh_ref = None
    if emit_hf:
        h_ref, *rest = rest
        (dv_ref, wzy_ref,
         wzyn_ref, hfn_ref, xN_ref, res_ref,
         x_scr, acc_scr) = rest
    else:
        (dv_ref, wzy_ref,
         wzyn_ref, xN_ref, res_ref,
         x_scr, acc_scr) = rest

    # rho/x0/xN/res are UNBLOCKED full-VMEM residents (see kernel A).
    t = pl.program_id(0)
    ch = pl.program_id(1)
    nt = pl.num_programs(0)
    sl = pl.ds(ch * chunk, chunk)

    @pl.when(t == 0)
    def _():
        x_scr[:, sl] = x0_ref[:, sl]
        acc_scr[:, sl] = jnp.zeros_like(acc_scr[:, sl])

    cdt = x_scr.dtype
    rho = rho_ref[0, sl]
    sel = [oh_ref[r, sl] for r in range(R)] if R > 1 else None
    x = x_scr[:, sl]
    acc = acc_scr[:, sl]
    for i in range(T):
        if packed:
            mk = MK_ref[i].astype(cdt)
            M, K = mk[:nx], mk[nx:]
        elif R > 1:
            K = _rung_select(K_ref[i].astype(cdt), nu, sel)
            M = _rung_select(M_ref[i].astype(cdt), nx, sel)
        else:
            K = K_ref[i].astype(cdt)
            M = M_ref[i].astype(cdt)
        dv = dv_ref[i]                                 # [d (nu) | v (nx)]
        u = _mv(K, x) + dv[:nu]
        w_t = jnp.concatenate([u, x], axis=0)          # (nz, chunk)
        x = _mv(M, x) + dv[nu:]

        wzy = wzy_ref[i]                               # [w | z | y]
        w = wzy[:nz]
        z = wzy[nz : nz + nc]
        y = wzy[nz + nc :]
        D = D_ref[i].astype(cdt)
        if packed:
            bnd = bnd_ref[i]
            lb, ub, m = bnd[0], bnd[1], bnd[2]
            sh = bnd[3] if has_shift else None
        else:
            m = m_ref[i]
            lb = lb_ref[i]
            ub = ub_ref[i]
            sh = sh_ref[i] if has_shift else None

        z_t = _mv(D, w_t)                              # (nc, chunk)
        w_new = alpha * w_t + (1.0 - alpha) * w
        rho_m = rho[None, :] * m
        m01 = jnp.where(m > 0, 1.0, 0.0).astype(cdt)
        v = alpha * z_t + (1.0 - alpha) * z + jnp.where(
            m > 0, y / jnp.maximum(rho_m, 1e-30), 0.0)
        z_new = _project_lanes(v, lb, ub, cones, sh) * m01
        y_new = y + rho_m * (
            alpha * z_t + (1.0 - alpha) * z - z_new
        )
        wzyn_ref[i] = jnp.concatenate([w_new, z_new, y_new], axis=0)
        if emit_hf:
            # Fold the NEXT iteration's linear cost while (w+, z+, y+)
            # are in registers: hf+ = h - sigma w+ - D^T (rho m z+ - y+)
            # — valid while rho is unchanged (the refactor cond
            # recomputes it otherwise), freeing the backward kernel of
            # its D/h/mask streams and packed-iterate read.
            hfn = h_ref[i].astype(cdt) - sigma * w_new
            for ci in range(nc):
                rg_c = rho * m[ci] * z_new[ci] - y_new[ci]
                hfn = hfn - rg_c[None, :] * D[ci]
            hfn_ref[i] = hfn

        # Residual H-terms: for DIAGONAL stage costs (most LQ problems
        # — the quadrotor/centroidal/mass-spring models included) the
        # Hs stream is its nz-row diagonal and the matvecs collapse to
        # elementwise products (drops the kernel's biggest pinned
        # stream, nz^2 rows -> nz, and ~2 nz^2 FMAs/stage).
        Hs = Hs_ref[i].astype(cdt)
        Hmv = (lambda v: Hs * v) if diag_cost else (lambda v: _mv(Hs, v))
        Dw_new = _mv(D, w_new)
        dw = w - w_t
        zt_term = rho_m * (
            (alpha - 1.0) * (z_t - z) + (z - z_new)
        )
        dvec = (
            (1.0 - alpha) * Hmv(dw)
            + (alpha * sigma) * dw
            + _mtv(D, zt_term)
        )
        Hw = Hmv(w_new) - sigma * w_new
        dty = _mtv(D, y_new)

        rp = jnp.max(jnp.abs(Dw_new - z_new), axis=0)
        rd = jnp.max(jnp.abs(dvec), axis=0)
        ps = jnp.maximum(
            jnp.max(jnp.abs(Dw_new), axis=0),
            jnp.max(jnp.abs(z_new), axis=0),
        )
        ds = jnp.maximum(
            jnp.max(jnp.abs(Hw), axis=0), jnp.max(jnp.abs(dty), axis=0)
        )
        acc = jnp.maximum(acc, jnp.stack([rp, rd, ps, ds]))
    x_scr[:, sl] = x
    acc_scr[:, sl] = acc

    @pl.when(t == nt - 1)
    def _():
        xN_ref[:, sl] = x
        res_ref[:, sl] = acc


def _split_stages(N, words_per_stage, temp_words, chunk, dtype_bytes):
    """Stages per grid step for the split kernels — like _pick_stages
    but allowing T=16: these kernels are per-window-overhead-bound and
    their per-stage bodies are vector-only (no nz^2 matrix products),
    so a deeper unroll stays compilable."""
    from pdp_lqr_tpu.ops.pallas_riccati import STAGE_BLOCK_BUDGET

    for T in (16, 8, 4, 2):
        est = (2 * T * words_per_stage + temp_words) * chunk * dtype_bytes
        if N % T == 0 and est <= STAGE_BLOCK_BUDGET:
            return T
    return 1


def _split_words(nx, nu, nc, has_shift, sw):
    """(kernel A, kernel B) streamed words/lane (compute-word units)."""
    nz = nx + nu
    wa = (sw * (nx * nx + nx * nu + nz + nc * nz + nx)   # A B h D c
          + nc                                           # mask
          + nx * nx + nu * nu + nu * nx                  # P L K
          + nz + 2 * nc                                  # wzy
          + nu + nx)                                     # dv out
    wb = (nx * nx + nu * nx                              # M K
          + sw * (nz * nz + nc * nz)                     # Hs D
          + 3 * nc + (nc if has_shift else 0)            # lb ub mask shift
          + nx + nu                                      # dv
          + nz + 2 * nc                                  # wzy
          + nz + 2 * nc)                                 # wzy out
    return wa, wb


def split_width(Bt, nx, nu, nc, has_shift=False, storage_dtype=None,
                compute_dtype=jnp.float32, diag_cost=False) -> int:
    """Replication width for the split iteration's shared streams
    (covers both kernels' lane chunks; pass the diag_cost the kernels
    will run with — fewer words can mean a LARGER chunk)."""
    nz = nx + nu
    c_item = jnp.dtype(compute_dtype).itemsize
    s_item = jnp.dtype(storage_dtype or compute_dtype).itemsize
    sw = s_item / c_item
    wa, wb = _split_words(nx, nu, nc, has_shift, sw)
    wa += nx - nx * nx                 # Pc in, P out (kernel A)
    if diag_cost:
        wb -= sw * (nz * nz - nz)
    ca = _pick_chunk(Bt, int(wa) + 1, 24 * nz * nz, c_item)
    cb = _pick_chunk(Bt, int(wb) + 1, 24 * nz * nz, c_item)
    return max(ca, cb)


def admm_bwd_vec_lanes(rho, pN, A, B, h, D, mask, P, L, K, c, wzy,
                       *, nu, sigma, ladder_oh=None, Pc=None,
                       interpret=False):
    """Split-iteration kernel A: in-kernel iterate fold + cached vector
    sweep, chunk-interleaved, shared-stage streams pinned.

    Shared streams (W lanes, W a multiple of the kernel chunk): A
    (N,nx,nx,W), B (N,nx,nu,W), h (N,nz,W) raw, D (N,nc,nz,W), mask
    (N,nc,W) per-row rho scale, and the cached factors P/L/K from
    backward_lanes(export_factors=True).  Per-scenario: rho (1,B), pN
    (nx,B) the iterate-folded terminal linear cost, c (N,nx,B), and the
    PACKED iterates wzy (N, nz+2nc, B) = [w | z | y] (one window per
    grid step — the sweeps are per-window-overhead-bound).
    Returns dv (N, nu+nx, B) = [d | v].

    ``ladder_oh`` ((R, B) one-hot rung selectors) enables the
    rho-LADDER mode: the factor streams carry R rungs stacked on rows
    (P (N, R*nx, nx, W) etc.) and each lane folds its own rung's
    factors — per-instance adaptive rho on a static rung grid with the
    pinned-stream economics intact.

    ``Pc`` ((N, nx, B) per-scenario, = P_{k+1} c_k) replaces the P
    stream entirely (non-ladder only): P enters the recursion only as
    P c, both iterate-independent, so the caller pre-folds it — one
    fewer pinned stream and the kernel's biggest matvec gone."""
    N, nx = A.shape[0], A.shape[1]
    Bt = wzy.shape[-1]
    nc = D.shape[1]
    nz = nx + nu
    dt = wzy.dtype
    pc_mode = Pc is not None
    R = 1 if pc_mode else P.shape[1] // nx
    if pc_mode and ladder_oh is not None:
        raise ValueError("Pc mode is non-ladder only")
    c_item = jnp.dtype(dt).itemsize
    sw = jnp.dtype(A.dtype).itemsize / c_item
    words, _ = _split_words(nx, nu, nc, False, sw)
    words += (R - 1) * (nx * nx + nu * nu + nu * nx)   # extra rungs
    if pc_mode:
        words += nx - nx * nx                          # Pc in, P out
    chunk = _pick_chunk(Bt, int(words) + 1, 24 * nz * nz, c_item)
    A = _shared_slice("A", A, chunk)
    B = _shared_slice("B", B, chunk)
    h = _shared_slice("h", h, chunk)
    D = _shared_slice("D", D, chunk)
    mask = _shared_slice("mask", mask, chunk)
    if not pc_mode:
        P = _shared_slice("P", P, chunk)
    L = _shared_slice("L", L, chunk)
    K = _shared_slice("K", K, chunk)
    n_chunks = Bt // chunk
    T = _split_stages(N, int(words) + 1, 24 * nz * nz, chunk, c_item)

    NT = N // T
    stage = lambda *dims: pl.BlockSpec(
        (T,) + dims[:-1] + (chunk,),
        lambda t, b: (NT - 1 - t,) + (0,) * (len(dims) - 1) + (b,),
        memory_space=pltpu.VMEM,
    )
    stage_sh = lambda *dims: pl.BlockSpec(
        (T,) + dims[:-1] + (chunk,),
        lambda t, b: (NT - 1 - t,) + (0,) * (len(dims) - 1) + (0,),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_admm_bwd_vec_kernel_il, nu, nx, nc, T,
                               chunk, sigma, R, pc_mode)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)   # tiny, once
    in_specs = [resident]
    args = [rho]
    if R > 1:
        in_specs.append(resident)
        args.append(ladder_oh)
    in_specs += [
        resident,
        stage_sh(nx, nx, Bt), stage_sh(nx, nu, Bt),
        stage_sh(nz, Bt), stage_sh(nc, nz, Bt), stage_sh(nc, Bt),
    ]
    args += [pN, A, B, h, D, mask]
    if not pc_mode:
        in_specs.append(stage_sh(R * nx, nx, Bt))
        args.append(P)
    in_specs += [stage_sh(R * nu, nu, Bt), stage_sh(R * nu, nx, Bt),
                 stage(nx, Bt)]
    args += [L, K, c]
    if pc_mode:
        in_specs.append(stage(nx, Bt))
        args.append(Pc)
    in_specs.append(stage(nz + 2 * nc, Bt))
    args.append(wzy)
    return pl.pallas_call(
        kernel,
        grid=(NT, n_chunks),
        in_specs=in_specs,
        out_specs=stage(nu + nx, Bt),
        out_shape=jax.ShapeDtypeStruct((N, nu + nx, Bt), dt),
        scratch_shapes=[pltpu.VMEM((nx, Bt), dt)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*args)


def admm_fwd_update_lanes(rho, x0, M, K, Hs, D, lb, ub, mask, shift,
                          dv, wzy, *, nu, cones, alpha, sigma,
                          ladder_oh=None, h=None, interpret=False):
    """Split-iteration kernel B: closed-loop rollout + relax / project /
    dual / residual tail, chunk-interleaved, shared streams pinned.

    Shared streams: M (N,nx,nx,W) closed-loop map, K (N,nu,nx,W), Hs
    (N,nz,nz,W) sigma-folded Hessian (residuals only), D, lb, ub, mask
    (rho-scale), shift or None.  Per-scenario: rho (1,B), x0 (nx,B),
    dv = [d | v] from kernel A, and the PACKED iterates wzy
    (N, nz+2nc, B).  Returns (wzy_new, xN, res (4,B)) — the caller
    folds the terminal stage.  ``ladder_oh``: see admm_bwd_vec_lanes
    (M/K then carry R rungs stacked on rows).

    ``Hs`` may be the (N, nz, W) DIAGONAL of a diagonal stage cost
    (detected from its rank): the residual H-matvecs collapse to
    elementwise products and the nz^2-row stream shrinks to nz.

    ``h`` (pinned raw linear cost, (N, nz, W)) enables hf-EMIT mode:
    the kernel additionally outputs the NEXT iteration's folded cost
    hf+ (for admm_bwd_vec_prefold_lanes).

    PACKED mode (``K is None``, non-ladder): ``M`` carries MK = [M; K]
    (N, nz, nx, W) packed on the leading row axis and ``lb`` carries
    bnd = stack(lb, ub, mask[, shift]) (N, 3+s, nc, W) — same bytes,
    5-6 pinned windows collapse to 2 (the kernels are per-window-
    issue-bound); ``ub``/``mask``/``shift`` must be None and the
    shift presence is read off bnd's row count."""
    packed = K is None
    N, nx = M.shape[0], M.shape[2]
    Bt = wzy.shape[-1]
    nc = D.shape[1]
    nz = nx + nu
    dt = wzy.dtype
    if packed:
        if ub is not None or mask is not None or shift is not None \
                or ladder_oh is not None:
            raise ValueError("packed mode (K=None) takes bnd via lb "
                             "and is non-ladder only")
        R = 1
        nbnd = lb.shape[1]
        has_shift = nbnd == 4
    else:
        R = M.shape[1] // nx
        has_shift = shift is not None
    diag_cost = Hs.ndim == 3
    emit_hf = h is not None
    c_item = jnp.dtype(dt).itemsize
    sw = jnp.dtype(Hs.dtype).itemsize / c_item
    _, words = _split_words(nx, nu, nc, has_shift, sw)
    words += (R - 1) * (nx * nx + nu * nx)             # extra rungs
    if diag_cost:
        words -= sw * (nz * nz - nz)
    if emit_hf:
        words += sw * nz + nz                          # h in, hf+ out
    chunk = _pick_chunk(Bt, int(words) + 1, 24 * nz * nz, c_item)
    M = _shared_slice("MK" if packed else "M", M, chunk)
    if not packed:
        K = _shared_slice("K", K, chunk)
    Hs = _shared_slice("Hs", Hs, chunk)
    if emit_hf:
        h = _shared_slice("h", h, chunk)
    D = _shared_slice("D", D, chunk)
    lb = _shared_slice("bnd" if packed else "lb", lb, chunk)
    if not packed:
        ub = _shared_slice("ub", ub, chunk)
        mask = _shared_slice("mask", mask, chunk)
        if has_shift:
            shift = _shared_slice("shift", shift, chunk)
    n_chunks = Bt // chunk
    T = _split_stages(N, int(words) + 1, 24 * nz * nz, chunk, c_item)
    NT = N // T

    stage = lambda *dims: pl.BlockSpec(
        (T,) + dims[:-1] + (chunk,),
        lambda t, b: (t,) + (0,) * (len(dims) - 1) + (b,),
        memory_space=pltpu.VMEM,
    )
    stage_sh = lambda *dims: pl.BlockSpec(
        (T,) + dims[:-1] + (chunk,),
        lambda t, b: (t,) + (0,) * (len(dims) - 1) + (0,),
        memory_space=pltpu.VMEM,
    )
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)   # tiny, once
    in_specs = [resident]
    args = [rho]
    if R > 1:
        in_specs.append(resident)
        args.append(ladder_oh)
    if packed:
        in_specs += [
            resident,
            stage_sh(nz, nx, Bt),
            stage_sh(nz, Bt) if diag_cost else stage_sh(nz, nz, Bt),
            stage_sh(nc, nz, Bt),
            stage_sh(nbnd, nc, Bt),
        ]
        args += [x0, M, Hs, D, lb]
    else:
        in_specs += [
            resident,
            stage_sh(R * nx, nx, Bt), stage_sh(R * nu, nx, Bt),
            stage_sh(nz, Bt) if diag_cost else stage_sh(nz, nz, Bt),
            stage_sh(nc, nz, Bt),
            stage_sh(nc, Bt), stage_sh(nc, Bt), stage_sh(nc, Bt),
        ]
        args += [x0, M, K, Hs, D, lb, ub, mask]
        if has_shift:
            in_specs.append(stage_sh(nc, Bt))
            args.append(shift)
    if emit_hf:
        in_specs.append(stage_sh(nz, Bt))
        args.append(h)
    in_specs += [stage(nu + nx, Bt), stage(nz + 2 * nc, Bt)]
    args += [dv, wzy]

    kernel = functools.partial(
        _admm_fwd_update_kernel_il, nu, nx, nc, T, chunk, tuple(cones),
        alpha, sigma, has_shift, R, diag_cost, emit_hf, packed,
    )
    out_specs = [stage(nz + 2 * nc, Bt)]
    out_shape = [jax.ShapeDtypeStruct((N, nz + 2 * nc, Bt), dt)]
    if emit_hf:
        out_specs.append(stage(nz, Bt))
        out_shape.append(jax.ShapeDtypeStruct((N, nz, Bt), dt))
    out_specs += [resident, resident]
    out_shape += [jax.ShapeDtypeStruct((nx, Bt), dt),
                  jax.ShapeDtypeStruct((4, Bt), dt)]
    return pl.pallas_call(
        kernel,
        grid=(NT, n_chunks),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((nx, Bt), dt),
                        pltpu.VMEM((4, Bt), dt)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*args)


# VMEM sizing for the fused iteration.  The (K, d) spill is modeled
# explicitly, so the budget is sized against the 48 MB scoped limit
# (_compiler_params) rather than _pick_chunk's conservative 12 MB
# default meant to absorb unmodeled temporaries.
_BUDGET = 36 << 20


def _vmem_words(N, nx, nu, nc, has_shift, storage_itemsize,
                compute_itemsize, cached=False):
    """(streamed words/lane, scratch+temp words/lane) in compute-word
    units; streamed stage tensors may be stored narrower."""
    nz = nx + nu
    sw = storage_itemsize / compute_itemsize
    words = (
        sw * (nx * nx + nx * nu + nx + nz * nz + nz + nc * nz)  # A..D
        + 3 * nc + (nc if has_shift else 0)               # lb ub mask shift
        + nz + 2 * nc                                     # w z y
        + nz + 2 * nc                                     # outputs
    )
    if cached:
        # (P, L, K) streamed instead of the K spill; only d spills.
        words += nx * nx + nu * nu + nu * nx
        temp = (
            N * nu                            # d spill
            + 2 * nx * nx + 3 * nx + 4       # p, x, acc (+ slack)
            + 20 * nz * nz                    # live temporaries
        )
    else:
        temp = (
            N * (nu * nx + nu)                # K, d spill
            + 3 * nx * nx + 3 * nx + 4       # P, p, x, acc (+ slack)
            + 20 * nz * nz                    # live temporaries
        )
    return words, temp


def fits_vmem(N, nx, nu, nc, has_shift=False, storage_dtype=None,
              compute_dtype=jnp.float32, cached=False) -> bool:
    """True when the fused iteration fits VMEM at the 128-lane floor —
    the solve_fused(single_kernel="auto") selection predicate.  The
    cached variant spills only d (not K), so it fits much longer
    horizons."""
    c_item = jnp.dtype(compute_dtype).itemsize
    s_item = jnp.dtype(storage_dtype or compute_dtype).itemsize
    words, temp = _vmem_words(N, nx, nu, nc, has_shift, s_item, c_item,
                              cached=cached)
    return (2 * words + temp) * 128 * c_item <= _BUDGET


def admm_chunk(Bt, N, nx, nu, nc, has_shift=False, storage_dtype=None,
               compute_dtype=jnp.float32, cached=False) -> int:
    """Lane chunk admm_iter_lanes picks for batch Bt — shared-stage
    problem streams must be replicated to (a multiple of) this width
    (solvers/admm.solve_fused handles it in shared mode)."""
    c_item = jnp.dtype(compute_dtype).itemsize
    s_item = jnp.dtype(storage_dtype or compute_dtype).itemsize
    words, temp = _vmem_words(N, nx, nu, nc, has_shift, s_item, c_item,
                              cached=cached)
    return _pick_chunk(Bt, words, temp, c_item, budget=_BUDGET)


def admm_iter_lanes(A, B, c, Hs, h, D, lb, ub, mask, shift, w, z, y, rho,
                    PN, pN, x0, *, nu, cones, alpha, sigma,
                    factors=None, shared=False, interpret=False):
    """One fused conic ADMM iteration over stages 0..N-1, batch-in-lanes.

    Stage tensors (lanes layout, stage-major):
      A (N,nx,nx,B), B (N,nx,nu,B), c (N,nx,B), Hs (N,nz,nz,B)
      [sigma-folded H], h (N,nz,B) [raw], D (N,nc,nz,B),
      lb/ub (N,nc,B), mask (N,nc,B) the per-row RHO SCALE (0 on
      padded rows, rho_eq_boost on equality rows, 1 elsewhere — the
      kernel derives the binary projection mask as m > 0),
      shift (N,nc,B) or None,
      w (N,nz,B) / z,y (N,nc,B) current iterates, rho (1,B) per-instance
      penalty, PN/pN the iterate-folded terminal cost-to-go, x0 (nx,B).

    ``cones`` must be normalized (offset, dim, kind) 3-tuples.

    The static stage tensors (A, B, c, Hs, h, D) may be stored in a
    narrower dtype (bf16) than the iterates — the kernel upcasts at
    load, so HBM streaming halves while all arithmetic, iterates, and
    outputs stay in the iterate (compute) precision.

    ``factors`` (optional) enables the cached-factor vector iteration:
    a (P, L, K) triple from backward_lanes(export_factors=True) —
    P (N,nx,nx,B) cost-to-go P_{k+1}, L (N,nu,nu,B) chol(Huu),
    K (N,nu,nx,B) gains.  Phase 1 then redoes only the affine
    recursion (the reference's backward_without_factorization split);
    valid while rho and the problem matrices are unchanged since
    export.

    ``shared=True`` is the broadcast (shared-stage) mode: the problem
    streams (A, B, Hs, h, D, lb, ub, mask, shift) carry ONE replicated
    lane chunk (width a multiple of admm_chunk(B, ...)) pinned to lane
    block 0, while the per-instance tensors (c, iterates, rho, PN, pN,
    x0, outputs) run the full batch — one shared model serving B
    scenarios streams its stage data from HBM once per chunk instead
    of B times.  The per-lane penalty fold works unchanged: rho is a
    per-lane scalar against the replicated D rows.

    Returns (w_new, z_new, y_new, xN, res) with res (4, B) rows
    [r_prim, r_dual, prim_scale, dual_scale] maxima over stages 0..N-1
    (the caller folds in the terminal stage).
    """
    N, nx = A.shape[0], A.shape[1]
    Bt = w.shape[-1]
    nz = nx + nu
    nc = D.shape[1]
    if nc == 0:
        raise ValueError("single-kernel ADMM iteration requires nc > 0")
    dt = w.dtype          # compute/carry dtype (iterates, outputs)
    has_shift = shift is not None
    cached = factors is not None

    # Streamed words/lane (double-buffered by the pipeline) and live
    # scratch: the (K, d) spill dominates and scales with N; stage
    # tensors may be stored narrower (see _vmem_words).  Sizing against
    # _BUDGET instead of the 12 MB default keeps 512 lanes (measured:
    # 256 -> 512 lanes is ~2x throughput at quadrotor N=64); the chunk
    # still degrades for long N / big nz.
    words, temp = _vmem_words(
        N, nx, nu, nc, has_shift,
        jnp.dtype(A.dtype).itemsize, jnp.dtype(dt).itemsize,
        cached=cached,
    )
    chunk = _pick_chunk(Bt, words, temp, jnp.dtype(dt).itemsize,
                        budget=_BUDGET)
    n_chunks = Bt // chunk
    # T consecutive stages per grid step (see _pick_stages): the spill
    # and carries (temp) are chunk-resident regardless of T, only the
    # streamed stage block scales.
    T = _pick_stages(N, words, temp, chunk, jnp.dtype(dt).itemsize)
    NT = N // T

    if shared:
        A = _shared_slice("A", A, chunk)
        B = _shared_slice("B", B, chunk)
        Hs = _shared_slice("Hs", Hs, chunk)
        h = _shared_slice("h", h, chunk)
        D = _shared_slice("D", D, chunk)
        lb = _shared_slice("lb", lb, chunk)
        ub = _shared_slice("ub", ub, chunk)
        mask = _shared_slice("mask", mask, chunk)
        if has_shift:
            shift = _shared_slice("shift", shift, chunk)
        if cached:
            # Shared cached factors (valid only under a batch-uniform
            # rho — solvers/admm enforces uniform_rho): the whole
            # matrix half of the iteration streams from ONE chunk.
            Pf, Lf, Kf = factors
            factors = (
                _shared_slice("P", Pf, chunk),
                _shared_slice("L", Lf, chunk),
                _shared_slice("K", Kf, chunk),
            )

    # Stage-stream specs: time window per phase (both phases / phase-1
    # pinned / phase-2 pinned), lane block b — or 0 for the replicated
    # shared-stage streams (the pinned-lane-block broadcast trick).
    t_both = lambda t: jnp.where(t < NT, NT - 1 - t, t - NT)
    t_ph1 = lambda t: jnp.where(t < NT, NT - 1 - t, NT - 1)
    t_ph2 = lambda t: jnp.where(t < NT, 0, t - NT)

    def _mk(tfn, pin):
        def spec(*dims):
            nd = len(dims) - 1
            if pin:
                idx = lambda b, t: (tfn(t),) + (0,) * nd + (0,)
            else:
                idx = lambda b, t: (tfn(t),) + (0,) * nd + (b,)
            return pl.BlockSpec((T,) + dims[:-1] + (chunk,), idx,
                                memory_space=pltpu.VMEM)
        return spec

    both = _mk(t_both, False)
    ph1 = _mk(t_ph1, False)
    ph2 = _mk(t_ph2, False)
    both_s = _mk(t_both, shared)
    ph1_s = _mk(t_ph1, shared)
    ph2_s = _mk(t_ph2, shared)

    def whole(*dims):
        return pl.BlockSpec(
            dims[:-1] + (chunk,),
            lambda b, t: (0,) * (len(dims) - 1) + (b,),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        whole(1, Bt),                       # rho
        whole(nx, nx, Bt), whole(nx, Bt),   # PN pN
        whole(nx, Bt),                      # x0
        both_s(nx, nx, Bt), both_s(nx, nu, Bt), both(nx, Bt),  # A B c
        # Hs only feeds phase 2 residuals in cached mode (the matrix
        # fold is baked into the factors), so its phase-1 window pins
        # to block 0 and costs one DMA instead of N/T.
        ph2_s(nz, nz, Bt) if cached else both_s(nz, nz, Bt),   # Hs
        ph1_s(nz, Bt),                      # h
        both_s(nc, nz, Bt),                 # D
        # mask carries the per-row rho scale and feeds the phase-1
        # penalty fold too, so it streams in both phases.
        ph2_s(nc, Bt), ph2_s(nc, Bt), both_s(nc, Bt),          # lb ub mask
    ]
    args = [rho, PN, pN, x0, A, B, c, Hs, h, D, lb, ub, mask]
    if has_shift:
        in_specs.append(ph2_s(nc, Bt))
        args.append(shift)
    if cached:
        Pf, Lf, Kf = factors
        in_specs += [ph1_s(nx, nx, Bt), ph1_s(nu, nu, Bt),
                     both_s(nu, nx, Bt)]                     # Pf Lf Kf
        args += [Pf, Lf, Kf]
    in_specs += [both(nz, Bt), both(nc, Bt), both(nc, Bt)]   # w z y
    args += [w, z, y]

    out_specs = (
        ph2(nz, Bt), ph2(nc, Bt), ph2(nc, Bt),               # w+ z+ y+
        whole(nx, Bt), whole(4, Bt),                          # xN res
    )
    out_shape = (
        jax.ShapeDtypeStruct((N, nz, Bt), dt),
        jax.ShapeDtypeStruct((N, nc, Bt), dt),
        jax.ShapeDtypeStruct((N, nc, Bt), dt),
        jax.ShapeDtypeStruct((nx, Bt), dt),
        jax.ShapeDtypeStruct((4, Bt), dt),
    )
    kernel = functools.partial(
        _admm_iter_kernel, nu, nx, nc, N, T, tuple(cones), alpha, sigma,
        has_shift, cached,
    )
    scratch = [
        pltpu.VMEM((nx, nx, chunk), dt),     # P carry (unused cached)
        pltpu.VMEM((nx, chunk), dt),         # p carry
        pltpu.VMEM((nx, chunk), dt),         # x carry
    ]
    if cached:
        scratch = scratch[1:]                # no P carry
    else:
        scratch.append(pltpu.VMEM((N, nu, nx, chunk), dt))   # K spill
    scratch += [
        pltpu.VMEM((N, nu, chunk), dt),      # d spill
        pltpu.VMEM((4, chunk), dt),          # residual acc
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_chunks, 2 * NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*args)
