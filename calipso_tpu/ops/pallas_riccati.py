"""Pallas TPU kernel: fused batched block-tridiagonal Cholesky solve.

One grid program per batch element runs the whole T-stage Riccati sweep
(factor + forward + backward substitution) with every block resident in
VMEM -- replacing ~5T separate XLA ops (cholesky, triangular solves,
matmuls per stage) with one fused kernel per scenario. The win is for the
vmapped-solve workload (MPC scenario batches): no per-stage kernel-launch
or relayout overhead, and the batch axis rides the grid.

Small dense factorizations are hand-written (Pallas cannot lower
jnp.linalg): Cholesky and triangular solves as fori loops of masked
rank-1 / axpy updates on (d, d) blocks, all VPU ops.

Falls back transparently: `solve_batched` dispatches to the XLA scan
implementation (ops/riccati.py) when Pallas is unavailable or on CPU.

Status (v5e measurements, f32):
* grid-per-scenario variant: exact but 3.5x SLOWER than the XLA scan
  (10.4 vs 3.0 ms at B=64, T=21, d=8) -- TPU grid programs serialize on
  one core. Kept as documentation of the negative result.
* batch-in-lanes variants ((T, d, d, B), B on the 128-lane axis): the
  round-4 ROW-INDEXED kernels keep the working set in VMEM refs and
  dynamically index rows on the leading (untiled) axis instead of
  masked whole-block extractions, cutting per-pivot overhead from ~4-5
  full-block passes to the one rank-1 update. Split factor/solve
  kernels are wired into the solver through
  jax.custom_batching.custom_vmap (ops/riccati.py factor_cv/solve_cv),
  ON by default in the winning shape regime (d>=6, batch>=32, f32;
  CALIPSO_PALLAS_RICCATI=0 disables). Driver-recorded end-to-end:
  +16-17% on batched rocket T=31 B=128 solves vs the XLA scan
  (rocket_batch_pallas_speedup, BENCH_r04).
* T-streaming variants for horizons that cannot sit resident in VMEM
  (d=54 contact class): single lanes-tile grid + manual double-buffered
  DMA over the horizon. Round 3's formulation (grid (B/Bt, T) with a
  cross-grid-step scratch carry) HUNG when composed into a
  lax.while_loop (BENCH_r03's quadruped device fault; isolated repro:
  fori OK / while hangs) -- the rewrite passes that composition and the
  full batched-quadruped solver nest on TPU (128/128 converged,
  BENCH_r04 quadruped_*). CALIPSO_PALLAS_STREAM=0 fences just this
  route.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _compiler_params():
    """Raise the Mosaic scoped-VMEM limit: the XLA default (16 MB) is far
    below the v5e's physical 128 MB VMEM and rejects lane-tiled kernels
    whose double-buffered blocks + loop temporaries exceed it."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)


def _small_chol(A, d):
    """Lower Cholesky of (d, d) A via right-looking masked updates.
    Mask/reduce formulations only -- Pallas TPU cannot lower dynamic
    slicing of register values."""
    row_ids = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    rvec = row_ids[:, 0]

    def body(k, A):
        pivot = jnp.sqrt(jnp.sum(jnp.where((row_ids == k) & (col_ids == k), A, 0.0)))
        ck = jnp.sum(jnp.where(col_ids == k, A, 0.0), axis=1)  # A[:, k]
        colk = jnp.where(rvec > k, ck / pivot, 0.0)
        A = A - colk[:, None] * colk[None, :]
        A = jnp.where((col_ids == k) & (row_ids > k), colk[:, None], A)
        A = jnp.where((col_ids == k) & (row_ids == k), pivot, A)
        return A

    A = lax.fori_loop(0, d, body, A)
    return jnp.where(row_ids >= col_ids, A, 0.0)


def _tri_solve_lower(L, B, d):
    """Solve L X = B for X with L (d, d) lower-triangular, B (d, m)."""
    m = B.shape[1]
    lrow = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    lcol = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    brow = lax.broadcasted_iota(jnp.int32, (d, m), 0)

    def body(i, X):
        Li = jnp.sum(jnp.where(lrow == i, L, 0.0), axis=0)  # L[i, :]
        Lii = jnp.sum(jnp.where((lrow == i) & (lcol == i), L, 0.0))
        bi = jnp.sum(jnp.where(brow == i, B, 0.0), axis=0)  # B[i, :]
        xi = (bi - jnp.sum(Li[:, None] * X, axis=0)) / Lii  # (m,)
        return jnp.where(brow == i, xi[None, :], X)

    return lax.fori_loop(0, d, body, jnp.zeros_like(B))


def _tri_solve_lower_T(L, B, d):
    """Solve L' X = B (back substitution), B (d, m)."""
    m = B.shape[1]
    lrow = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    lcol = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    brow = lax.broadcasted_iota(jnp.int32, (d, m), 0)

    def body(j, X):
        i = d - 1 - j
        Lci = jnp.sum(jnp.where(lcol == i, L, 0.0), axis=1)  # L[:, i]
        Lii = jnp.sum(jnp.where((lrow == i) & (lcol == i), L, 0.0))
        bi = jnp.sum(jnp.where(brow == i, B, 0.0), axis=0)
        xi = (bi - jnp.sum(Lci[:, None] * X, axis=0)) / Lii
        return jnp.where(brow == i, xi[None, :], X)

    return lax.fori_loop(0, d, body, jnp.zeros_like(B))


def _riccati_kernel(D_ref, O_ref, b_ref, x_ref, L_scr, M_scr, u_scr, d: int, T: int):
    dtype = D_ref.dtype

    # factor + forward substitution
    def fwd_body(t, u_prev):
        Dt = D_ref[0, t]
        M_prev = jnp.where(t > 0, M_scr[jnp.maximum(t - 1, 0)], jnp.zeros((d, d), dtype))
        S = Dt - M_prev.T @ M_prev
        L = _small_chol(S, d)
        L_scr[t] = L
        Ot = jnp.where(
            t < T - 1, O_ref[0, jnp.minimum(t, O_ref.shape[1] - 1)], jnp.zeros((d, d), dtype)
        )
        M_scr[t] = _tri_solve_lower(L, Ot.T, d)
        bt = b_ref[0, t] - jnp.sum(M_prev * u_prev[:, None], axis=0)
        u_t = _tri_solve_lower(L, bt[:, None], d)[:, 0]
        u_scr[t] = u_t
        return u_t

    lax.fori_loop(0, T, fwd_body, jnp.zeros((d,), dtype))

    # backward substitution
    def bwd_body(j, x_next):
        t = T - 1 - j
        Mt = jnp.where(t < T - 1, M_scr[jnp.minimum(t, max(T - 2, 0))], jnp.zeros((d, d), dtype))
        rhs = u_scr[t] - jnp.sum(Mt * x_next[None, :], axis=1)
        x_t = _tri_solve_lower_T(L_scr[t], rhs[:, None], d)[:, 0]
        x_ref[0, t] = x_t
        return x_t

    lax.fori_loop(0, T, bwd_body, jnp.zeros((d,), dtype))


def solve_batched_pallas(D, O, b, interpret=False):
    """Fused factor+solve for a batch: D (B, T, d, d), O (B, T-1, d, d),
    b (B, T, d) -> x (B, T, d). One grid program per batch element."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = D.shape
    dtype = D.dtype
    # O may be empty (T == 1); pad to at least one block for a fixed spec
    O_in = O if T > 1 else jnp.zeros((B, 1, d, d), dtype)
    To = max(T - 1, 1)

    kernel = functools.partial(_riccati_kernel, d=d, T=T)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, d, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, To, d, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, d), dtype),
        scratch_shapes=[
            pltpu.VMEM((T, d, d), dtype),  # L
            pltpu.VMEM((T, d, d), dtype),  # M
            pltpu.VMEM((T, d), dtype),  # u
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(D, O_in, b)


# ---- batch-in-lanes variant -------------------------------------------------
# Layout (T, d, d, B): the batch rides the 128-lane axis, every masked
# Cholesky/substitution op vectorizes across all scenarios at once, and the
# tiny d x d contractions unroll over the (static, small) d.


def _chol_lanes(A, d):
    """A (d, d, B) -> lower Cholesky factors, batched over lanes."""
    row_ids = lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
    rvec = lax.broadcasted_iota(jnp.int32, (d, 1), 0)  # (d, 1)

    def body(k, A):
        pivot = jnp.sqrt(
            jnp.sum(jnp.where((row_ids == k) & (col_ids == k), A, 0.0), axis=(0, 1))
        )  # (B,)
        ck = jnp.sum(jnp.where(col_ids == k, A, 0.0), axis=1)  # (d, B)
        colk = jnp.where(rvec > k, ck / pivot[None, :], 0.0)  # (d, B)
        A = A - colk[:, None, :] * colk[None, :, :]
        A = jnp.where((col_ids == k) & (row_ids > k), colk[:, None, :], A)
        A = jnp.where((col_ids == k) & (row_ids == k), pivot[None, None, :], A)
        return A

    A = lax.fori_loop(0, d, body, A)
    return jnp.where(row_ids >= col_ids, A, 0.0)


def _trisolve_lanes(L, R, d):
    """Solve L X = R batched over lanes: L (d, d, B), R (d, m, B)."""
    lrow = lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
    lcol = lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
    rrow = lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)

    def body(i, X):
        Li = jnp.sum(jnp.where(lrow == i, L, 0.0), axis=0)  # (d, B) = L[i, :, :]
        Lii = jnp.sum(jnp.where((lrow == i) & (lcol == i), L, 0.0), axis=(0, 1))  # (B,)
        Ri = jnp.sum(jnp.where(rrow == i, R, 0.0), axis=0)  # (m, B)
        acc = jnp.sum(Li[:, None, :] * X, axis=0)  # (m, B)
        xi = (Ri - acc) / Lii[None, :]
        return jnp.where(rrow == i, xi[None, :, :], X)

    return lax.fori_loop(0, d, body, jnp.zeros_like(R))


def _trisolve_T_lanes(L, R, d):
    """Solve L' X = R batched over lanes."""
    lrow = lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
    lcol = lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
    rrow = lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0)

    def body(j, X):
        i = d - 1 - j
        Lci = jnp.sum(jnp.where(lcol == i, L, 0.0), axis=1)  # (d, B) = L[:, i, :]
        Lii = jnp.sum(jnp.where((lrow == i) & (lcol == i), L, 0.0), axis=(0, 1))
        Ri = jnp.sum(jnp.where(rrow == i, R, 0.0), axis=0)
        acc = jnp.sum(Lci[:, None, :] * X, axis=0)
        xi = (Ri - acc) / Lii[None, :]
        return jnp.where(rrow == i, xi[None, :, :], X)

    return lax.fori_loop(0, d, body, jnp.zeros_like(R))


def _riccati_lanes_kernel(D_ref, OT_ref, b_ref, x_ref, L_scr, M_scr, u_scr, d: int, T: int):
    dtype = D_ref.dtype
    B = D_ref.shape[-1]

    def mtm(M):  # M' M batched over lanes: (d, d, B)
        out = jnp.zeros((d, d, B), dtype)
        for i in range(d):
            row = jnp.sum(
                jnp.where(lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0) == i, M, 0.0),
                axis=0,
            )  # (d, B) = M[i, :, :]
            out = out + row[:, None, :] * row[None, :, :]
        return out

    def fwd_body(t, u_prev):
        Dt = D_ref[t]
        M_prev = jnp.where(t > 0, M_scr[jnp.maximum(t - 1, 0)], jnp.zeros((d, d, B), dtype))
        S = Dt - mtm(M_prev)
        L = _chol_lanes(S, d)
        L_scr[t] = L
        OtT = jnp.where(
            t < T - 1, OT_ref[jnp.minimum(t, OT_ref.shape[0] - 1)], jnp.zeros((d, d, B), dtype)
        )
        M_scr[t] = _trisolve_lanes(L, OtT, d)
        bt = b_ref[t] - jnp.sum(M_prev * u_prev[:, None, :], axis=0)  # (d, B)
        u_t = _trisolve_lanes(L, bt[:, None, :], d)[:, 0, :]
        u_scr[t] = u_t
        return u_t

    lax.fori_loop(0, T, fwd_body, jnp.zeros((d, B), dtype))

    def bwd_body(j, x_next):
        t = T - 1 - j
        Mt = jnp.where(t < T - 1, M_scr[jnp.minimum(t, max(T - 2, 0))], jnp.zeros((d, d, B), dtype))
        rhs = u_scr[t] - jnp.sum(Mt * x_next[None, :, :], axis=1)
        x_t = _trisolve_T_lanes(L_scr[t], rhs[:, None, :], d)[:, 0, :]
        x_ref[t] = x_t
        return x_t

    lax.fori_loop(0, T, bwd_body, jnp.zeros((d, B), dtype))


def solve_batched_lanes(D, O, b, interpret=False):
    """Batch-in-lanes fused solve: D (B, T, d, d) etc., batch transposed to
    the trailing lane axis inside; one grid program total."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = D.shape
    dtype = D.dtype
    Dl = jnp.transpose(D, (1, 2, 3, 0))  # (T, d, d, B)
    OTl = (
        jnp.transpose(O, (1, 3, 2, 0))  # transposed blocks (T-1, d, d, B)
        if T > 1
        else jnp.zeros((1, d, d, B), dtype)
    )
    bl = jnp.transpose(b, (1, 2, 0))  # (T, d, B)

    kernel = functools.partial(_riccati_lanes_kernel, d=d, T=T)
    xl = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, d, B), dtype),
        scratch_shapes=[
            pltpu.VMEM((T, d, d, B), dtype),  # L
            pltpu.VMEM((T, d, d, B), dtype),  # M
            pltpu.VMEM((T, d, B), dtype),  # u
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Dl, OTl, bl)
    return jnp.transpose(xl, (2, 0, 1))  # (B, T, d)


# ---- blocked-panel primitives (round 5) -------------------------------------
# The round-4 row-indexed kernels still pay one FULL-block pass per pivot:
# the (d, d, B) trailing rank-1 update runs d times per Cholesky and the
# substitution sweeps likewise -- the measured ~1.8x full-width factor
# plus the ~2.5x sequential-pivot chain of the round-4 gap account
# (docs/performance.md). These primitives factor by STATIC width-8 column
# panels instead (d is 8-aligned by construction on the stream route and
# for the flagship shapes): the whole pivot loop is unrolled in Python,
# so every row/column restriction is a static slice (8-aligned on the
# sublane axis, arbitrary on the leading axis), the sequential
# sqrt/divide chain only touches a (d-c, 8, B) panel, and the trailing
# matrix gets ONE rank-8 update per panel -- 8 independent FMAs the
# compiler can pipeline -- with one read+write of the (shrinking)
# trailing block per panel instead of per pivot. Executed element work
# drops from ~d^3 per sweep to ~d^3/3 + O(w d^2) (the counted flops).

_PANEL_W = 8


def _cat_rows(parts):
    """Leading-axis concat that drops zero-length parts (Mosaic rejects
    zero-size vector operands that interpret mode tolerates)."""
    parts = [p for p in parts if p.shape[0] > 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _blocked_chol(S, write_row, read_strip, d: int, Bt: int, dtype):
    """Right-looking blocked Cholesky of the symmetric (d, d, Bt) matrix
    held in the VMEM ref S. Only the lower TILE triangle is read or
    written (diagonal 8x8 tiles stay fully symmetric; tiles above the
    tile diagonal are never touched and may hold garbage). write_row(c,
    v) stores column c of L as a (d, Bt) transposed-factor row;
    read_strip(c, lo, hi) loads rows [lo, hi) of it straight from the
    ref. The trailing update runs as 8x8xBt REGISTER tiles (the
    accumulator stays in vregs across the 8 unrolled terms; a spilled
    full-block accumulator re-reads/re-writes multi-MB VMEM per term --
    the measured VMEM-traffic wall of the first blocked variant).
    Requires d % 8 == 0 (callers pad; see _pad8)."""
    w = _PANEL_W
    iow = lax.broadcasted_iota(jnp.int32, (w, 1), 0)  # (w, 1) panel mask
    iow3 = lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    for p in range(d // w):
        j0 = p * w
        for k in range(w):
            c = j0 + k
            prow = S[c, j0 : j0 + w, :]  # (w, Bt) pivot row, panel cols
            pval = jnp.sum(jnp.where(iow == k, prow, 0.0), axis=0)  # (Bt,)
            inv = lax.rsqrt(pval)
            piv = pval * inv
            if c + 1 < d:
                rest = S[c + 1 :, j0 : j0 + w, :]  # (d-c-1, w, Bt)
                colk = jnp.sum(jnp.where(iow3 == k, rest, 0.0), axis=1) * inv
                write_row(
                    c, _cat_rows([jnp.zeros((c, Bt), dtype), piv[None, :], colk])
                )
                if k < w - 1:
                    # rank-1 update restricted to the remaining panel
                    lrow = _cat_rows(
                        [jnp.zeros((k + 1, Bt), dtype), colk[: w - k - 1]]
                    )  # (w, Bt): l_{panel rows, c}, zero through col c
                    S[c + 1 :, j0 : j0 + w, :] = (
                        rest - colk[:, None, :] * lrow[None, :, :]
                    )
            else:
                write_row(c, _cat_rows([jnp.zeros((c, Bt), dtype), piv[None, :]]))
        if j0 + w < d:
            # rank-8 trailing update, register-tiled, lower tiles only
            r0 = j0 + w
            for rr in range(r0, d, w):
                for cc in range(r0, rr + w, w):
                    acc = jnp.zeros((w, w, Bt), dtype)
                    for k in range(w):
                        rv = read_strip(j0 + k, rr, rr + w)  # (w, Bt)
                        cv = rv if cc == rr else read_strip(j0 + k, cc, cc + w)
                        acc = acc + rv[:, None, :] * cv[None, :, :]
                    S[rr : rr + w, cc : cc + w, :] = (
                        S[rr : rr + w, cc : cc + w, :] - acc
                    )


def _blocked_forward_mat(S, read_strip, d: int, Bt: int, dtype):
    """Solve L X = R in place by blocked column sweep: S holds R
    (d, m, Bt) on entry and X on exit; read_strip(c, lo, hi) -> rows
    [lo, hi) of column c of L in transposed-factor layout. The post-panel
    block update runs as 8x8xBt register tiles like _blocked_chol's
    trailing update. Requires d % 8 == 0 and m % 8 == 0."""
    w = _PANEL_W
    m = S.shape[1]
    assert m % w == 0, (d, m)
    iow = lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    for p in range(d // w):
        j0 = p * w
        for k in range(w):
            c = j0 + k
            ltpan = read_strip(c, j0, j0 + w)  # (w, Bt) panel rows of col c
            pval = jnp.sum(jnp.where(iow == k, ltpan, 0.0), axis=0)  # (Bt,)
            xj = S[c] / pval[None, :]  # (m, Bt)
            S[c] = xj
            if k < w - 1:
                lmask = jnp.where(iow > k, ltpan, 0.0)  # zero through row c
                S[j0 : j0 + w] = S[j0 : j0 + w] - lmask[:, None, :] * xj[None, :, :]
        if j0 + w < d:
            # rank-8 block update of the remaining rows, register-tiled
            r0 = j0 + w
            for rr in range(r0, d, w):
                for cc in range(0, m, w):
                    acc = jnp.zeros((w, w, Bt), dtype)
                    for k in range(w):
                        colv = read_strip(j0 + k, rr, rr + w)  # (w, Bt)
                        xk = S[j0 + k, cc : cc + w, :]  # (w, Bt)
                        acc = acc + colv[:, None, :] * xk[None, :, :]
                    S[rr : rr + w, cc : cc + w, :] = (
                        S[rr : rr + w, cc : cc + w, :] - acc
                    )


def _blocked_mtm_sub(S, read_D_tile, read_M_strip, gate, d: int, Bt: int, dtype):
    """Write the lower tiles of S = D - gate * M'M in 8x8xBt register
    tiles: the d-term contraction runs as a fori over 8-term chunks with
    the inner terms unrolled, so the accumulator stays in vregs within a
    chunk and loads are (8, Bt) strips. read_D_tile(rr, cc) -> the
    (8, 8, Bt) tile of D; read_M_strip(i, lo) -> rows [lo, lo+8) of M row
    i; gate is a traced bool (False -> S = D, with the garbage-input
    contraction still computed but SELECTED away, NaN-safe)."""
    w = _PANEL_W
    nchunks = d // w
    for rr in range(0, d, w):
        for cc in range(0, rr + w, w):

            def chunk(ci, acc, rr=rr, cc=cc):
                for k in range(w):
                    Mr = read_M_strip(ci * w + k, rr)
                    Mc = Mr if cc == rr else read_M_strip(ci * w + k, cc)
                    acc = acc + Mr[:, None, :] * Mc[None, :, :]
                return acc

            acc = lax.fori_loop(0, nchunks, chunk, jnp.zeros((w, w, Bt), dtype))
            S[rr : rr + w, cc : cc + w, :] = read_D_tile(rr, cc) - jnp.where(
                gate, acc, jnp.zeros_like(acc)
            )


def _use_blocked(d: int) -> bool:
    """Blocked panels need an 8-aligned d and only pay off once the panel
    restriction removes meaningful work (d >= 2 panels)."""
    return d % _PANEL_W == 0 and d >= 2 * _PANEL_W


# ---- row-indexed lanes kernels ----------------------------------------------
# The original masked-extract formulation (_chol_lanes/_trisolve_lanes
# above, kept for the fused and T-streaming variants) reads every row and
# column of the (d, d, B) block through jnp.where + reduction masks:
# ~4-5 full-block passes per pivot where the factorization math needs one
# -- the measured 10.7%-of-VPU gap of BENCH_r03 (round-3 verdict weak #7/
# next-round #3). These variants keep the working set in VMEM refs and
# DYNAMICALLY INDEX rows on the leading (untiled) axis -- a direct (d, B)
# load, no mask -- so the per-pivot cost collapses to the one rank-1
# trailing update plus O(d*B) bookkeeping. The factor is produced in
# TRANSPOSED per-stage layout (Lt[k] = column k of L, i.e. L^T rows):
# every substitution then needs only row loads of Lt (column-sweep
# forward, row-sweep backward); the public factor_lanes/solve_lanes
# wrappers transpose at the XLA boundary so the external (B, T, d, d)
# lower-L contract is unchanged.


def _factor_lanes_kernel(D_ref, OT_ref, Lt_ref, M_ref, S_scr, d: int, T: int):
    dtype = D_ref.dtype
    B = D_ref.shape[-1]
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)  # (d, 1) row ids
    blocked = _use_blocked(d)

    def chol_into(t):
        """Right-looking Cholesky of S_scr, L^T rows written to Lt_ref[t]
        (blocked width-8 panels when d is 8-aligned; see the
        blocked-panel primitives above). Row k of the (symmetric)
        trailing matrix IS column k, loaded directly from the scratch
        ref."""
        if blocked:

            def wr(c, v):
                Lt_ref[t, c] = v

            _blocked_chol(
                S_scr, wr, lambda c, lo, hi: Lt_ref[t, c, lo:hi, :], d, B, dtype
            )
            return

        def body(k, _):
            rowk = S_scr[k]  # (d, B)
            pivot = jnp.sqrt(jnp.sum(jnp.where(iod == k, rowk, 0.0), axis=0))  # (B,)
            colk = jnp.where(iod > k, rowk / pivot[None, :], 0.0)  # (d, B)
            Lt_ref[t, k] = colk + jnp.where(iod == k, pivot[None, :], 0.0)
            S_scr[...] = S_scr[...] - colk[:, None, :] * colk[None, :, :]
            return 0

        lax.fori_loop(0, d, body, 0)

    def forward_mat(t, R):
        """Solve L X = R (R (d, m, B)) by column sweep over Lt_ref[t]
        rows, with X swept IN the S scratch (free after chol_into) so the
        per-pivot row read is a direct load, not a full-block mask."""
        S_scr[...] = R
        if blocked:
            _blocked_forward_mat(
                S_scr, lambda c, lo, hi: Lt_ref[t, c, lo:hi, :], d, B, dtype
            )
            return S_scr[...]

        def body(j, _):
            colj = Lt_ref[t, j]  # (d, B) = L[:, j]
            pivot = jnp.sum(jnp.where(iod == j, colj, 0.0), axis=0)  # (B,)
            xj = S_scr[j] / pivot[None, :]  # (m, B)
            colj_s = jnp.where(iod > j, colj, 0.0)
            S_scr[...] = S_scr[...] - colj_s[:, None, :] * xj[None, :, :]
            S_scr[j] = xj
            return 0

        lax.fori_loop(0, d, body, 0)
        return S_scr[...]

    def stage(t, with_mtm: bool):
        Dt = D_ref[t]
        if with_mtm:
            if blocked:
                w = _PANEL_W
                _blocked_mtm_sub(
                    S_scr,
                    lambda rr, cc: D_ref[t, rr : rr + w, cc : cc + w, :],
                    lambda i, lo: M_ref[t - 1, i, lo : lo + w, :],
                    True,
                    d,
                    B,
                    dtype,
                )
            else:
                # M_{t-1}^T M_{t-1} with direct row loads of M_ref
                def mtm_body(i, acc):
                    row = M_ref[t - 1, i]  # (d, B)
                    return acc + row[:, None, :] * row[None, :, :]

                S_scr[...] = Dt - lax.fori_loop(
                    0, d, mtm_body, jnp.zeros((d, d, B), dtype)
                )
        else:
            S_scr[...] = Dt
        chol_into(t)
        if T > 1:
            OtT = OT_ref[jnp.minimum(t, OT_ref.shape[0] - 1)]
            M_t = forward_mat(t, OtT)
            M_t = jnp.where(t < T - 1, M_t, jnp.zeros_like(M_t))
            M_ref[t] = M_t
        else:
            M_ref[t] = jnp.zeros((d, d, B), dtype)

    stage(0, with_mtm=False)
    if T > 1:
        lax.fori_loop(1, T, lambda t, _: (stage(t, with_mtm=True), 0)[1], 0)


def _solve_lanes_kernel(Lt_ref, M_ref, b_ref, x_ref, u_scr, d: int, T: int):
    """Substitution sweeps against the TRANSPOSED per-stage factor
    (Lt_ref[t, k] = column k of L_t)."""
    dtype = Lt_ref.dtype
    B = Lt_ref.shape[-1]
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def fwd_tri(t, b):  # L x = b, b (d, B), column sweep
        def body(j, X):
            colj = Lt_ref[t, j]
            pivot = jnp.sum(jnp.where(iod == j, colj, 0.0), axis=0)
            xj = jnp.sum(jnp.where(iod == j, X, 0.0), axis=0) / pivot  # (B,)
            colj_s = jnp.where(iod > j, colj, 0.0)
            X = X - colj_s * xj[None, :]
            return jnp.where(iod == j, xj[None, :], X)

        return lax.fori_loop(0, d, body, b)

    def bwd_tri(t, u):  # L^T x = u, row sweep (Lt rows ARE L^T rows)
        def body(jj, X):
            j = d - 1 - jj
            rowj = Lt_ref[t, j]  # zeros left of the diagonal
            pivot = jnp.sum(jnp.where(iod == j, rowj, 0.0), axis=0)
            acc = jnp.sum(rowj * X, axis=0)  # X rows <= j still zero
            uj = jnp.sum(jnp.where(iod == j, u, 0.0), axis=0)
            xj = (uj - acc) / pivot
            return jnp.where(iod == j, xj[None, :], X)

        return lax.fori_loop(0, d, body, jnp.zeros_like(u))

    def fwd_body(t, u_prev):
        M_prev = jnp.where(t > 0, M_ref[jnp.maximum(t - 1, 0)], jnp.zeros((d, d, B), dtype))
        bt = b_ref[t] - jnp.sum(M_prev * u_prev[:, None, :], axis=0)
        u_t = fwd_tri(t, bt)
        u_scr[t] = u_t
        return u_t

    lax.fori_loop(0, T, fwd_body, jnp.zeros((d, B), dtype))

    def bwd_body(j, x_next):
        t = T - 1 - j
        Mt = jnp.where(t < T - 1, M_ref[jnp.minimum(t, max(T - 2, 0))], jnp.zeros((d, d, B), dtype))
        rhs = u_scr[t] - jnp.sum(Mt * x_next[None, :, :], axis=1)
        x_t = bwd_tri(t, rhs)
        x_ref[t] = x_t
        return x_t

    lax.fori_loop(0, T, bwd_body, jnp.zeros((d, B), dtype))


def _factor_lanes_t1_kernel(D_ref, Lt_ref, S_scr, d: int):
    """T=1 specialization (the flagship chol_cv path): no coupling
    input, no M output -- the general kernel wrote an all-zeros M block
    that the wrapper discarded, a third of the HBM write traffic on an
    HBM-bound kernel."""
    dtype = D_ref.dtype
    B = D_ref.shape[-1]
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    S_scr[...] = D_ref[0]
    if _use_blocked(d):

        def wr(c, v):
            Lt_ref[0, c] = v

        _blocked_chol(S_scr, wr, lambda c, lo, hi: Lt_ref[0, c, lo:hi, :], d, B, dtype)
        return

    def cbody(k, _):
        rowk = S_scr[k]
        pivot = jnp.sqrt(jnp.sum(jnp.where(iod == k, rowk, 0.0), axis=0))
        colk = jnp.where(iod > k, rowk / pivot[None, :], 0.0)
        Lt_ref[0, k] = colk + jnp.where(iod == k, pivot[None, :], 0.0)
        S_scr[...] = S_scr[...] - colk[:, None, :] * colk[None, :, :]
        return 0

    lax.fori_loop(0, d, cbody, 0)


def _solve_lanes_t1_kernel(Lt_ref, b_ref, x_ref, d: int):
    """T=1 substitution: L L' x = b with no coupling stream."""
    dtype = Lt_ref.dtype
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def fwd(j, X):
        colj = Lt_ref[0, j]
        pivot = jnp.sum(jnp.where(iod == j, colj, 0.0), axis=0)
        xj = jnp.sum(jnp.where(iod == j, X, 0.0), axis=0) / pivot
        colj_s = jnp.where(iod > j, colj, 0.0)
        X = X - colj_s * xj[None, :]
        return jnp.where(iod == j, xj[None, :], X)

    u = lax.fori_loop(0, d, fwd, b_ref[0])

    def bwd(jj, X):
        j = d - 1 - jj
        rowj = Lt_ref[0, j]
        pivot = jnp.sum(jnp.where(iod == j, rowj, 0.0), axis=0)
        acc = jnp.sum(rowj * X, axis=0)
        uj = jnp.sum(jnp.where(iod == j, u, 0.0), axis=0)
        xj = (uj - acc) / pivot
        return jnp.where(iod == j, xj[None, :], X)

    x_ref[0] = lax.fori_loop(0, d, bwd, jnp.zeros_like(u))


def factor_lanes(D, O, interpret=False, batch_tile=None):
    """Batched factor: D (B, T, d, d), O (B, T-1, d, d) -> L (B, T, d, d),
    M (B, T-1, d, d) (lanes layout internally). `batch_tile` grids the
    lanes axis into B/batch_tile programs so large batches stream through
    VMEM tile by tile (each tile still fills the 128-lane axis)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = D.shape
    dtype = D.dtype
    Dl = jnp.transpose(D, (1, 2, 3, 0))
    Bt1 = B if batch_tile is None else batch_tile
    if T == 1:
        spec1 = lambda: pl.BlockSpec(
            (1, d, d, Bt1), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
        )
        Ltl = pl.pallas_call(
            functools.partial(_factor_lanes_t1_kernel, d=d),
            grid=(B // Bt1,),
            in_specs=[spec1()],
            out_specs=spec1(),
            out_shape=jax.ShapeDtypeStruct((1, d, d, B), dtype),
            scratch_shapes=[pltpu.VMEM((d, d, Bt1), dtype)],
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(Dl)
        L = jnp.transpose(Ltl, (3, 0, 2, 1))
        return L, jnp.zeros((B, 0, d, d), dtype)
    OTl = (
        jnp.transpose(O, (1, 3, 2, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    kernel = functools.partial(_factor_lanes_kernel, d=d, T=T)
    Bt = B if batch_tile is None else batch_tile
    assert B % Bt == 0, (B, Bt)
    To = OTl.shape[0]
    spec = lambda t: pl.BlockSpec((t, d, d, Bt), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM)
    Ltl, Ml = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[spec(T), spec(To)],
        out_specs=(spec(T), spec(T)),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((d, d, Bt), dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Dl, OTl)
    # the kernel emits the factor TRANSPOSED per stage (Lt[t, k] = column
    # k of L_t; see the row-indexed-kernel comment); restore lower L at
    # the XLA boundary
    L = jnp.transpose(Ltl, (3, 0, 2, 1))
    M = jnp.transpose(Ml, (3, 0, 1, 2))[:, : max(T - 1, 0)]
    return L, M


def solve_lanes(L, M, b, interpret=False, batch_tile=None):
    """Batched substitution with factors from factor_lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = L.shape
    dtype = L.dtype
    # the kernel consumes the factor TRANSPOSED per stage (rows of Lt =
    # columns of L); fold the transpose into the HBM->lanes relayout
    Ll = jnp.transpose(L, (1, 3, 2, 0))
    Bt1 = B if batch_tile is None else batch_tile
    if T == 1:
        mspec1 = pl.BlockSpec(
            (1, d, d, Bt1), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM
        )
        vspec1 = pl.BlockSpec(
            (1, d, Bt1), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        bl1 = jnp.transpose(b, (1, 2, 0))
        xl = pl.pallas_call(
            functools.partial(_solve_lanes_t1_kernel, d=d),
            grid=(B // Bt1,),
            in_specs=[mspec1, vspec1],
            out_specs=vspec1,
            out_shape=jax.ShapeDtypeStruct((1, d, B), dtype),
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(Ll, bl1)
        return jnp.transpose(xl, (2, 0, 1))
    Ml = (
        jnp.transpose(M, (1, 2, 3, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    # pad M back to T blocks so the kernel's dynamic index stays in range
    if Ml.shape[0] < T:
        Ml = jnp.concatenate([Ml, jnp.zeros((T - Ml.shape[0], d, d, B), dtype)], axis=0)
    bl = jnp.transpose(b, (1, 2, 0))
    kernel = functools.partial(_solve_lanes_kernel, d=d, T=T)
    Bt = B if batch_tile is None else batch_tile
    assert B % Bt == 0, (B, Bt)
    mspec = pl.BlockSpec((T, d, d, Bt), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((T, d, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    xl = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[mspec, mspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((T, d, B), dtype),
        scratch_shapes=[pltpu.VMEM((T, d, Bt), dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Ll, Ml, bl)
    return jnp.transpose(xl, (2, 0, 1))


# ---- T-streaming variants ---------------------------------------------------
# For stage blocks too large to keep the whole horizon resident in VMEM
# (contact problems, d ~ 54): ONE grid dimension (the lanes tiles) and a
# manual double-buffered DMA pipeline over the horizon inside the kernel
# (pallas guide "Patterns: Double Buffering"). The round-3 formulation --
# grid (B/Bt, T) with the Riccati carry in a scratch that persisted
# across sequential grid steps -- HUNG/faulted when the pallas_call was
# composed into a lax.while_loop (repro: fori_loop composition OK,
# while_loop composition hangs past 560 s; BENCH_r03 recorded the device
# fault). With a single grid dimension and explicit make_async_copy
# streaming there is no cross-grid-step carry for the compiler to
# mis-schedule, and the same while_loop composition runs.


def _factor_stream_kernel(
    D_hbm, OT_hbm, Lt_hbm, M_hbm, d: int, T: int, Bt: int, C: int = 1, ablate: tuple = ()
):
    """C is the stage-chunk width: each DMA moves C stages per slot
    (C = 2 halves the copy/wait count -- the measured DMA floor of the
    1-stage pipeline was ~2.3x the pure-volume floor, dominated by
    per-copy issue/wait overhead, docs/performance.md gap table).
    Requires T % C == 0 and OT_hbm padded to T rows. ablate is a
    MEASUREMENT hook (docs/performance.md), not a public switch: any of
    "mtm"/"chol"/"fwd" replaces that phase with a same-buffer copy so
    the kernel's remaining time can be attributed by differencing
    ablated runs against the full kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = D_hbm.dtype
    assert T % C == 0 and OT_hbm.shape[0] == T, (T, C, OT_hbm.shape)
    nsup = T // C
    lane0 = pl.program_id(0) * Bt
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def body(Dbuf, Obuf, Ltbuf, Mbuf, S, sem_in, sem_out):
        def in_dmas(slot, s):
            return (
                pltpu.make_async_copy(
                    D_hbm.at[pl.ds(s * C, C), :, :, pl.ds(lane0, Bt)],
                    Dbuf.at[slot],
                    sem_in.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    OT_hbm.at[pl.ds(s * C, C), :, :, pl.ds(lane0, Bt)],
                    Obuf.at[slot],
                    sem_in.at[slot, 1],
                ),
            )

        def out_dmas(slot, s, ci):
            # per-STAGE output copies (even when the input side moves
            # C-stage chunks): each stage's factor leaves as soon as it
            # is computed, keeping output overlap fine-grained
            t = s * C + ci
            return (
                pltpu.make_async_copy(
                    Ltbuf.at[slot, ci],
                    Lt_hbm.at[t, :, :, pl.ds(lane0, Bt)],
                    sem_out.at[slot, ci, 0],
                ),
                pltpu.make_async_copy(
                    Mbuf.at[slot, ci],
                    M_hbm.at[t, :, :, pl.ds(lane0, Bt)],
                    sem_out.at[slot, ci, 1],
                ),
            )

        blocked = _use_blocked(d)

        def chol_into(slot, ci):
            """Right-looking Cholesky of S, L^T rows into Ltbuf[slot, ci]
            (blocked width-8 panels when d is 8-aligned; see the
            blocked-panel primitives above)."""
            if blocked:

                def wr(c, v):
                    Ltbuf[slot, ci, c] = v

                _blocked_chol(
                    S, wr, lambda c, lo, hi: Ltbuf[slot, ci, c, lo:hi, :], d, Bt, dtype
                )
                return

            def cbody(k, _):
                rowk = S[k]
                pivot = jnp.sqrt(jnp.sum(jnp.where(iod == k, rowk, 0.0), axis=0))
                colk = jnp.where(iod > k, rowk / pivot[None, :], 0.0)
                Ltbuf[slot, ci, k] = colk + jnp.where(iod == k, pivot[None, :], 0.0)
                S[...] = S[...] - colk[:, None, :] * colk[None, :, :]
                return 0

            lax.fori_loop(0, d, cbody, 0)

        def forward_mat(slot, ci, R):
            """L X = R by column sweep over Ltbuf[slot, ci] rows, X swept
            in the S scratch (free after chol_into)."""
            S[...] = R
            if blocked:
                _blocked_forward_mat(
                    S, lambda c, lo, hi: Ltbuf[slot, ci, c, lo:hi, :], d, Bt, dtype
                )
                return S[...]

            def fbody(j, _):
                colj = Ltbuf[slot, ci, j]
                pivot = jnp.sum(jnp.where(iod == j, colj, 0.0), axis=0)
                xj = S[j] / pivot[None, :]
                colj_s = jnp.where(iod > j, colj, 0.0)
                S[...] = S[...] - colj_s[:, None, :] * xj[None, :, :]
                S[j] = xj
                return 0

            lax.fori_loop(0, d, fbody, 0)
            return S[...]

        da, ob = in_dmas(0, 0)
        da.start()
        ob.start()

        def super_stage(s, _):
            slot = s % 2

            @pl.when(s + 1 < nsup)
            def _():
                da, ob = in_dmas((s + 1) % 2, s + 1)
                da.start()
                ob.start()

            da, ob = in_dmas(slot, s)
            da.wait()
            ob.wait()

            # slot reuse: super-stage s-2's output copies must have drained
            @pl.when(s >= 2)
            def _():
                for ci in range(C):
                    dl, dm = out_dmas(slot, s - 2, ci)
                    dl.wait()
                    dm.wait()

            for ci in range(C):
                t = s * C + ci

                # S = D_t - M_{t-1}' M_{t-1} (M_{t-1} resident in the
                # previous chunk slot or earlier in this slot)
                if "mtm" in ablate:
                    S[...] = Dbuf[slot, ci]
                elif blocked:
                    w = _PANEL_W

                    def mprev_strip(i, lo, ci=ci):
                        if ci == 0:
                            return Mbuf[(s - 1) % 2, C - 1, i, lo : lo + w, :]
                        return Mbuf[slot, ci - 1, i, lo : lo + w, :]

                    _blocked_mtm_sub(
                        S,
                        lambda rr, cc, ci=ci: Dbuf[
                            slot, ci, rr : rr + w, cc : cc + w, :
                        ],
                        mprev_strip,
                        t > 0,
                        d,
                        Bt,
                        dtype,
                    )
                else:

                    def mtm_body(i, acc, ci=ci):
                        row = (
                            Mbuf[(s - 1) % 2, C - 1, i]
                            if ci == 0
                            else Mbuf[slot, ci - 1, i]
                        )
                        return acc + row[:, None, :] * row[None, :, :]

                    MtM = lax.fori_loop(
                        0, d, mtm_body, jnp.zeros((d, d, Bt), dtype)
                    )
                    S[...] = Dbuf[slot, ci] - jnp.where(
                        t > 0, MtM, jnp.zeros_like(MtM)
                    )

                if "chol" in ablate:
                    Ltbuf[slot, ci] = Dbuf[slot, ci]  # bounded stand-ins
                else:
                    chol_into(slot, ci)
                if "fwd" in ablate:
                    Mt = Obuf[slot, ci]
                else:
                    Mt = forward_mat(slot, ci, Obuf[slot, ci])
                Mbuf[slot, ci] = jnp.where(t < T - 1, Mt, jnp.zeros_like(Mt))
                dl, dm = out_dmas(slot, s, ci)
                dl.start()
                dm.start()
            return 0

        lax.fori_loop(0, nsup, super_stage, 0)

        @pl.when(nsup >= 2)
        def _():
            for ci in range(C):
                dl, dm = out_dmas(nsup % 2, nsup - 2, ci)
                dl.wait()
                dm.wait()

        for ci in range(C):
            dl, dm = out_dmas((nsup - 1) % 2, nsup - 1, ci)
            dl.wait()
            dm.wait()

    pl.run_scoped(
        body,
        Dbuf=pltpu.VMEM((2, C, d, d, Bt), dtype),
        Obuf=pltpu.VMEM((2, C, d, d, Bt), dtype),
        Ltbuf=pltpu.VMEM((2, C, d, d, Bt), dtype),
        Mbuf=pltpu.VMEM((2, C, d, d, Bt), dtype),
        S=pltpu.VMEM((d, d, Bt), dtype),
        sem_in=pltpu.SemaphoreType.DMA((2, 2)),
        sem_out=pltpu.SemaphoreType.DMA((2, C, 2)),
    )


def _pad8(d):
    return -(-d // 8) * 8


def factor_lanes_stream(D, O, batch_tile, interpret=False, ablate=()):
    """T-streaming batched factor (same contract as factor_lanes):
    single lanes-tile grid + manual double-buffered horizon DMA. Blocks
    are padded to 8-aligned d (identity diagonal, so padded dimensions
    decouple exactly): Mosaic requires manual-DMA slices to be 8-aligned
    along the sublane dimension."""
    from jax.experimental import pallas as pl

    B, T, d0, _ = D.shape
    dtype = D.dtype
    d = _pad8(d0)
    if d != d0:
        pd = d - d0
        eye_pad = jnp.concatenate(
            [jnp.zeros((d0,), dtype), jnp.ones((pd,), dtype)]
        )
        D = jnp.pad(D, ((0, 0), (0, 0), (0, pd), (0, pd))) + jnp.diag(eye_pad)
        O = jnp.pad(O, ((0, 0), (0, 0), (0, pd), (0, pd)))
    Dl = jnp.transpose(D, (1, 2, 3, 0))
    OTl = (
        jnp.transpose(O, (1, 3, 2, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    # the chunked kernel wants exactly T coupling blocks (the last is
    # never read into a factorization, only DMA'd)
    if OTl.shape[0] < T:
        OTl = jnp.concatenate(
            [OTl, jnp.zeros((T - OTl.shape[0], d, d, B), dtype)], axis=0
        )
    Bt = batch_tile
    assert B % Bt == 0, (B, Bt)
    # 2-stage DMA chunks when the horizon allows: halves the per-stage
    # copy/wait overhead that dominates the 1-stage pipeline's DMA floor
    C = 2 if (T % 2 == 0 and T >= 4) else 1
    kernel = functools.partial(
        _factor_stream_kernel, d=d, T=T, Bt=Bt, C=C, ablate=tuple(ablate)
    )
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    Ltl, Ml = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[anyspec, anyspec],
        out_specs=(anyspec, anyspec),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Dl, OTl)
    L = jnp.transpose(Ltl, (3, 0, 2, 1))  # transposed per-stage layout
    M = jnp.transpose(Ml, (3, 0, 1, 2))[:, : max(T - 1, 0)]
    return L[:, :, :d0, :d0], M[:, :, :d0, :d0]


def _solve_fwd_stream_kernel(Lt_hbm, M_hbm, b_hbm, u_hbm, d: int, T: int, Bt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = Lt_hbm.dtype
    To = M_hbm.shape[0]
    lane0 = pl.program_id(0) * Bt
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def body(Lbuf, Mbuf, bbuf, ubuf, ucarry, sem_in, sem_out):
        def in_dmas(slot, t):
            return (
                pltpu.make_async_copy(
                    Lt_hbm.at[t, :, :, pl.ds(lane0, Bt)], Lbuf.at[slot], sem_in.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    M_hbm.at[jnp.minimum(jnp.maximum(t - 1, 0), To - 1), :, :, pl.ds(lane0, Bt)],
                    Mbuf.at[slot],
                    sem_in.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    b_hbm.at[t, :, pl.ds(lane0, Bt)], bbuf.at[slot], sem_in.at[slot, 2]
                ),
            )

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                ubuf.at[slot], u_hbm.at[t, :, pl.ds(lane0, Bt)], sem_out.at[slot]
            )

        def fwd_tri(slot, bv):
            def fbody(j, X):
                colj = Lbuf[slot, j]
                pivot = jnp.sum(jnp.where(iod == j, colj, 0.0), axis=0)
                xj = jnp.sum(jnp.where(iod == j, X, 0.0), axis=0) / pivot
                colj_s = jnp.where(iod > j, colj, 0.0)
                X = X - colj_s * xj[None, :]
                return jnp.where(iod == j, xj[None, :], X)

            return lax.fori_loop(0, d, fbody, bv)

        ucarry[...] = jnp.zeros((d, Bt), dtype)
        for dma in in_dmas(0, 0):
            dma.start()

        def stage(t, _):
            slot = t % 2

            @pl.when(t + 1 < T)
            def _():
                for dma in in_dmas((t + 1) % 2, t + 1):
                    dma.start()

            for dma in in_dmas(slot, t):
                dma.wait()
            Mprev = jnp.where(t > 0, Mbuf[slot], jnp.zeros((d, d, Bt), dtype))
            bt = bbuf[slot] - jnp.sum(Mprev * ucarry[...][:, None, :], axis=0)
            u = fwd_tri(slot, bt)
            ucarry[...] = u

            @pl.when(t >= 2)
            def _():
                out_dma(slot, t - 2).wait()

            ubuf[slot] = u
            out_dma(slot, t).start()
            return 0

        lax.fori_loop(0, T, stage, 0)

        @pl.when(T >= 2)
        def _():
            out_dma((T - 2) % 2, T - 2).wait()

        out_dma((T - 1) % 2, T - 1).wait()

    pl.run_scoped(
        body,
        Lbuf=pltpu.VMEM((2, d, d, Bt), dtype),
        Mbuf=pltpu.VMEM((2, d, d, Bt), dtype),
        bbuf=pltpu.VMEM((2, d, Bt), dtype),
        ubuf=pltpu.VMEM((2, d, Bt), dtype),
        ucarry=pltpu.VMEM((d, Bt), dtype),
        sem_in=pltpu.SemaphoreType.DMA((2, 3)),
        sem_out=pltpu.SemaphoreType.DMA((2,)),
    )


def _solve_bwd_stream_kernel(Lt_hbm, M_hbm, u_hbm, x_hbm, d: int, T: int, Bt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = Lt_hbm.dtype
    To = M_hbm.shape[0]
    lane0 = pl.program_id(0) * Bt
    iod = lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def body(Lbuf, Mbuf, ubuf, xbuf, xcarry, sem_in, sem_out):
        def in_dmas(slot, t):
            s = T - 1 - t  # descending stage order
            return (
                pltpu.make_async_copy(
                    Lt_hbm.at[s, :, :, pl.ds(lane0, Bt)], Lbuf.at[slot], sem_in.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    M_hbm.at[jnp.minimum(s, To - 1), :, :, pl.ds(lane0, Bt)],
                    Mbuf.at[slot],
                    sem_in.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    u_hbm.at[s, :, pl.ds(lane0, Bt)], ubuf.at[slot], sem_in.at[slot, 2]
                ),
            )

        def out_dma(slot, t):
            s = T - 1 - t
            return pltpu.make_async_copy(
                xbuf.at[slot], x_hbm.at[s, :, pl.ds(lane0, Bt)], sem_out.at[slot]
            )

        def bwd_tri(slot, uv):
            def bbody(jj, X):
                j = d - 1 - jj
                rowj = Lbuf[slot, j]  # L^T row j (zeros left of diagonal)
                pivot = jnp.sum(jnp.where(iod == j, rowj, 0.0), axis=0)
                acc = jnp.sum(rowj * X, axis=0)
                uj = jnp.sum(jnp.where(iod == j, uv, 0.0), axis=0)
                xj = (uj - acc) / pivot
                return jnp.where(iod == j, xj[None, :], X)

            return lax.fori_loop(0, d, bbody, jnp.zeros_like(uv))

        xcarry[...] = jnp.zeros((d, Bt), dtype)
        for dma in in_dmas(0, 0):
            dma.start()

        def stage(t, _):
            slot = t % 2
            s = T - 1 - t

            @pl.when(t + 1 < T)
            def _():
                for dma in in_dmas((t + 1) % 2, t + 1):
                    dma.start()

            for dma in in_dmas(slot, t):
                dma.wait()
            Mt = jnp.where(s < T - 1, Mbuf[slot], jnp.zeros((d, d, Bt), dtype))
            rhs = ubuf[slot] - jnp.sum(Mt * xcarry[...][None, :, :], axis=1)
            x = bwd_tri(slot, rhs)
            xcarry[...] = x

            @pl.when(t >= 2)
            def _():
                out_dma(slot, t - 2).wait()

            xbuf[slot] = x
            out_dma(slot, t).start()
            return 0

        lax.fori_loop(0, T, stage, 0)

        @pl.when(T >= 2)
        def _():
            out_dma((T - 2) % 2, T - 2).wait()

        out_dma((T - 1) % 2, T - 1).wait()

    pl.run_scoped(
        body,
        Lbuf=pltpu.VMEM((2, d, d, Bt), dtype),
        Mbuf=pltpu.VMEM((2, d, d, Bt), dtype),
        ubuf=pltpu.VMEM((2, d, Bt), dtype),
        xbuf=pltpu.VMEM((2, d, Bt), dtype),
        xcarry=pltpu.VMEM((d, Bt), dtype),
        sem_in=pltpu.SemaphoreType.DMA((2, 3)),
        sem_out=pltpu.SemaphoreType.DMA((2,)),
    )


def solve_lanes_stream(L, M, b, batch_tile, interpret=False):
    """T-streaming batched substitution (same contract as solve_lanes)."""
    from jax.experimental import pallas as pl

    B, T, d0, _ = L.shape
    dtype = L.dtype
    d = _pad8(d0)
    if d != d0:
        pd = d - d0
        eye_pad = jnp.concatenate(
            [jnp.zeros((d0,), dtype), jnp.ones((pd,), dtype)]
        )
        L = jnp.pad(L, ((0, 0), (0, 0), (0, pd), (0, pd))) + jnp.diag(eye_pad)
        M = jnp.pad(M, ((0, 0), (0, 0), (0, pd), (0, pd)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, pd)))
    # transposed per-stage factor layout, like solve_lanes
    Ll = jnp.transpose(L, (1, 3, 2, 0))
    Ml = (
        jnp.transpose(M, (1, 2, 3, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    To = Ml.shape[0]
    bl = jnp.transpose(b, (1, 2, 0))
    Bt = batch_tile
    assert B % Bt == 0, (B, Bt)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    fwd = functools.partial(_solve_fwd_stream_kernel, d=d, T=T, Bt=Bt)
    Ul = pl.pallas_call(
        fwd,
        grid=(B // Bt,),
        in_specs=[anyspec, anyspec, anyspec],
        out_specs=anyspec,
        out_shape=jax.ShapeDtypeStruct((T, d, B), dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Ll, Ml, bl)
    bwd = functools.partial(_solve_bwd_stream_kernel, d=d, T=T, Bt=Bt)
    xl = pl.pallas_call(
        bwd,
        grid=(B // Bt,),
        in_specs=[anyspec, anyspec, anyspec],
        out_specs=anyspec,
        out_shape=jax.ShapeDtypeStruct((T, d, B), dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Ll, Ml, Ul)
    return jnp.transpose(xl, (2, 0, 1))[:, :, :d0]


def solve_batched(D, O, b, use_pallas=None):
    """Batched block-tridiagonal solve; Pallas on TPU, XLA scan elsewhere."""
    from calipso_tpu.ops import riccati as rc

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        def one(Di, Oi, bi):
            L, M = rc.factor(Di, Oi)
            return rc.solve(L, M, bi)

        return jax.vmap(one)(D, O, b)
    return solve_batched_pallas(D, O, b)
