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
into one pallas_call with a two-phase grid over (lane_chunk, 2N):

  phase 1 (t = 0..N-1)   backward Riccati sweep on stage N-1-t:
                         in-register penalty fold from the streamed
                         iterates (rg = rho z - y computed in-kernel),
                         (P, p) carried in VMEM scratch, gains (K, d)
                         SPILLED TO VMEM SCRATCH, never to HBM.
  phase 2 (t = N..2N-1)  forward rollout on stage t-N reusing the
                         streamed (A, B, c) blocks, immediately
                         followed by the same stage's relaxation,
                         box/SOC/RSOC projection, dual ascent, and
                         residual-max accumulation — w+, z+, y+ are the
                         only trajectory-sized HBM writes.

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
    _compiler_params,
    _mm,
    _mtm,
    _mtv,
    _mv,
    _pick_chunk,
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


def _admm_iter_kernel(nu, nx, nc, N, cones, alpha, sigma, has_shift,
                      *refs):
    (rho_ref, PN_ref, pN_ref, x0_ref,
     A_ref, B_ref, c_ref, Hs_ref, h_ref, D_ref, lb_ref, ub_ref, m_ref,
     *rest) = refs
    if has_shift:
        sh_ref = rest[0]
        rest = rest[1:]
    else:
        sh_ref = None
    (w_ref, z_ref, y_ref,
     wn_ref, zn_ref, yn_ref, xN_ref, res_ref,
     P_scr, p_scr, x_scr, K_scr, d_scr, acc_scr) = rest

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        P_scr[:] = PN_ref[:]
        p_scr[:] = pN_ref[:]

    # Stage data may be stored narrower (bf16) than the compute/carry
    # dtype — upcast at load (see _backward_kernel); iterates, bounds,
    # and outputs stay in the carry precision.
    cdt = P_scr.dtype

    @pl.when(t < N)
    def _backward():
        rho = rho_ref[0]                       # (chunk,)
        A = A_ref[0].astype(cdt)
        Bm = B_ref[0].astype(cdt)
        c = c_ref[0].astype(cdt)
        H = Hs_ref[0].astype(cdt)
        h = h_ref[0].astype(cdt) - sigma * w_ref[0]
        # Penalty fold with in-kernel rg = rho z - y (z, y are
        # invariantly zero on padded rows, so no mask is needed).
        if nc > 0:
            D = D_ref[0].astype(cdt)
            z = z_ref[0]
            y = y_ref[0]
            for ci in range(nc):
                wrow = rho[None, :] * D[ci]            # (nz, chunk)
                rows = []
                for i in range(H.shape[0]):
                    rows.append(H[i] + D[ci, i][None, :] * wrow)
                H = jnp.stack(rows, axis=0)
                rg_c = rho * z[ci] - y[ci]             # (chunk,)
                h = h - rg_c[None, :] * D[ci]

        R = H[:nu, :nu]
        S = H[:nu, nu:]
        Q = H[nu:, nu:]
        r = h[:nu]
        q = h[nu:]
        P = P_scr[:]
        p = p_scr[:]

        PA = _mm(P, A)
        PB = _mm(P, Bm)
        Pcp = _mv(P, c) + p
        G = S + _mtm(Bm, PA)
        Huu = R + _mtm(Bm, PB)
        rbar = r + _mtv(Bm, Pcp)

        L = _chol_lanes(Huu)
        Kcols = []
        for jcol in range(nx):
            x = _chol_solve_lanes(L, [G[i, jcol] for i in range(nu)])
            Kcols.append(jnp.stack(x, axis=0))
        K = -jnp.stack(Kcols, axis=1)                   # (nu, nx, chunk)
        d = -jnp.stack(
            _chol_solve_lanes(L, [rbar[i] for i in range(nu)]), axis=0
        )

        Pn = Q + _mtm(A, PA) + _mtm(G, K)
        Pn = 0.5 * (Pn + jnp.swapaxes(Pn, 0, 1))
        pn = q + _mtv(A, Pcp) + _mtv(K, rbar)

        s_idx = N - 1 - t
        K_scr[pl.ds(s_idx, 1)] = K[None]
        d_scr[pl.ds(s_idx, 1)] = d[None]
        P_scr[:] = Pn
        p_scr[:] = pn

    @pl.when(t >= N)
    def _forward_update():
        @pl.when(t == N)
        def _():
            x_scr[:] = x0_ref[:]
            acc_scr[:] = jnp.zeros_like(acc_scr)

        s_idx = t - N
        x = x_scr[:]
        K = K_scr[pl.ds(s_idx, 1)][0]
        d = d_scr[pl.ds(s_idx, 1)][0]
        u = _mv(K, x) + d
        w_t = jnp.concatenate([u, x], axis=0)          # (nz, chunk)
        A = A_ref[0].astype(cdt)
        Bm = B_ref[0].astype(cdt)
        c = c_ref[0].astype(cdt)
        xn = _mv(A, x) + _mv(Bm, u) + c
        x_scr[:] = xn

        @pl.when(t == 2 * N - 1)
        def _():
            xN_ref[:] = xn

        rho = rho_ref[0]
        w = w_ref[0]
        z = z_ref[0]
        y = y_ref[0]
        D = D_ref[0].astype(cdt)
        m = m_ref[0]
        lb = lb_ref[0]
        ub = ub_ref[0]
        sh = sh_ref[0] if has_shift else None

        z_t = _mv(D, w_t)                              # (nc, chunk)
        w_new = alpha * w_t + (1.0 - alpha) * w
        v = alpha * z_t + (1.0 - alpha) * z + y / rho[None, :]
        z_new = _project_lanes(v, lb, ub, cones, sh) * m
        y_new = y + (rho[None, :] * m) * (
            alpha * z_t + (1.0 - alpha) * z - z_new
        )
        wn_ref[0] = w_new
        zn_ref[0] = z_new
        yn_ref[0] = y_new

        # Residual partials (exact OSQP 3.4 terms; see solvers/admm).
        Hs = Hs_ref[0].astype(cdt)
        Dw_new = _mv(D, w_new)
        dw = w - w_t
        zt_term = rho[None, :] * (
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
            jnp.max(jnp.abs(Dw_new), axis=0), jnp.max(jnp.abs(z_new), axis=0)
        )
        ds = jnp.maximum(
            jnp.max(jnp.abs(Hw), axis=0), jnp.max(jnp.abs(dty), axis=0)
        )
        acc_scr[:] = jnp.maximum(acc_scr[:], jnp.stack([rp, rd, ps, ds]))

        @pl.when(t == 2 * N - 1)
        def _():
            res_ref[:] = acc_scr[:]


# VMEM sizing for the fused iteration.  The (K, d) spill is modeled
# explicitly, so the budget is sized against the 48 MB scoped limit
# (_compiler_params) rather than _pick_chunk's conservative 12 MB
# default meant to absorb unmodeled temporaries.
_BUDGET = 36 << 20


def _vmem_words(N, nx, nu, nc, has_shift, storage_itemsize,
                compute_itemsize):
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
    temp = (
        N * (nu * nx + nu)                # K, d spill
        + 3 * nx * nx + 3 * nx + 4       # P, p, x, acc (+ slack)
        + 20 * nz * nz                    # live temporaries
    )
    return words, temp


def fits_vmem(N, nx, nu, nc, has_shift=False, storage_dtype=None,
              compute_dtype=jnp.float32) -> bool:
    """True when the fused iteration fits VMEM at the 128-lane floor —
    the solve_fused(single_kernel="auto") selection predicate."""
    c_item = jnp.dtype(compute_dtype).itemsize
    s_item = jnp.dtype(storage_dtype or compute_dtype).itemsize
    words, temp = _vmem_words(N, nx, nu, nc, has_shift, s_item, c_item)
    return (2 * words + temp) * 128 * c_item <= _BUDGET


def admm_iter_lanes(A, B, c, Hs, h, D, lb, ub, mask, shift, w, z, y, rho,
                    PN, pN, x0, *, nu, cones, alpha, sigma,
                    interpret=False):
    """One fused conic ADMM iteration over stages 0..N-1, batch-in-lanes.

    Stage tensors (lanes layout, stage-major):
      A (N,nx,nx,B), B (N,nx,nu,B), c (N,nx,B), Hs (N,nz,nz,B)
      [sigma-folded H], h (N,nz,B) [raw], D (N,nc,nz,B),
      lb/ub/mask (N,nc,B), shift (N,nc,B) or None,
      w (N,nz,B) / z,y (N,nc,B) current iterates, rho (1,B) per-instance
      penalty, PN/pN the iterate-folded terminal cost-to-go, x0 (nx,B).

    ``cones`` must be normalized (offset, dim, kind) 3-tuples.

    The static stage tensors (A, B, c, Hs, h, D) may be stored in a
    narrower dtype (bf16) than the iterates — the kernel upcasts at
    load, so HBM streaming halves while all arithmetic, iterates, and
    outputs stay in the iterate (compute) precision.

    Returns (w_new, z_new, y_new, xN, res) with res (4, B) rows
    [r_prim, r_dual, prim_scale, dual_scale] maxima over stages 0..N-1
    (the caller folds in the terminal stage).
    """
    N, nx, _, Bt = A.shape
    nz = nx + nu
    nc = D.shape[1]
    if nc == 0:
        raise ValueError("single-kernel ADMM iteration requires nc > 0")
    dt = w.dtype          # compute/carry dtype (iterates, outputs)
    has_shift = shift is not None

    # Streamed words/lane (double-buffered by the pipeline) and live
    # scratch: the (K, d) spill dominates and scales with N; stage
    # tensors may be stored narrower (see _vmem_words).  Sizing against
    # _BUDGET instead of the 12 MB default keeps 512 lanes (measured:
    # 256 -> 512 lanes is ~2x throughput at quadrotor N=64); the chunk
    # still degrades for long N / big nz.
    words, temp = _vmem_words(
        N, nx, nu, nc, has_shift,
        jnp.dtype(A.dtype).itemsize, jnp.dtype(dt).itemsize,
    )
    chunk = _pick_chunk(Bt, words, temp, jnp.dtype(dt).itemsize,
                        budget=_BUDGET)
    n_chunks = Bt // chunk

    def both(*dims):
        return pl.BlockSpec(
            (1,) + dims[:-1] + (chunk,),
            lambda b, t: (jnp.where(t < N, N - 1 - t, t - N),)
            + (0,) * (len(dims) - 1) + (b,),
            memory_space=pltpu.VMEM,
        )

    def ph1(*dims):
        return pl.BlockSpec(
            (1,) + dims[:-1] + (chunk,),
            lambda b, t: (jnp.where(t < N, N - 1 - t, N - 1),)
            + (0,) * (len(dims) - 1) + (b,),
            memory_space=pltpu.VMEM,
        )

    def ph2(*dims):
        return pl.BlockSpec(
            (1,) + dims[:-1] + (chunk,),
            lambda b, t: (jnp.where(t < N, 0, t - N),)
            + (0,) * (len(dims) - 1) + (b,),
            memory_space=pltpu.VMEM,
        )

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
        both(nx, nx, Bt), both(nx, nu, Bt), both(nx, Bt),   # A B c
        both(nz, nz, Bt),                   # Hs
        ph1(nz, Bt),                        # h
        both(nc, nz, Bt),                   # D
        ph2(nc, Bt), ph2(nc, Bt), ph2(nc, Bt),              # lb ub mask
    ]
    args = [rho, PN, pN, x0, A, B, c, Hs, h, D, lb, ub, mask]
    if has_shift:
        in_specs.append(ph2(nc, Bt))
        args.append(shift)
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
        _admm_iter_kernel, nu, nx, nc, N, tuple(cones), alpha, sigma,
        has_shift,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks, 2 * N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nx, nx, chunk), dt),
            pltpu.VMEM((nx, chunk), dt),
            pltpu.VMEM((nx, chunk), dt),
            pltpu.VMEM((N, nu, nx, chunk), dt),
            pltpu.VMEM((N, nu, chunk), dt),
            pltpu.VMEM((4, chunk), dt),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*args)
