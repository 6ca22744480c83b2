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
* batch-in-lanes variant ((T, d, d, B), B on the 128-lane axis, small
  contractions unrolled over d): 2.8x FASTER than the XLA vmapped scan
  (1.17 vs 3.24 ms at B=128, T=21, d=8), max diff 2e-7. Split
  factor/solve kernels are wired into the solver through
  jax.custom_batching.custom_vmap (ops/riccati.py factor_cv/solve_cv),
  ON by default in the winning shape regime (d>=6, batch>=32, f32;
  CALIPSO_PALLAS_RICCATI=0 disables). End-to-end: +8-10% on batched
  rocket solves (80.2 vs 74.4 solves/s at B=128, T=31) with identical
  iteration counts. A Mosaic remote-compile hang previously seen with
  pallas_call inside the solver's vmapped while_loop no longer
  reproduces (re-validated at B=32/128, T=31/61/101, d=9).
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


def _factor_lanes_kernel(D_ref, OT_ref, L_ref, M_ref, d: int, T: int):
    dtype = D_ref.dtype
    B = D_ref.shape[-1]

    def mtm(M):
        out = jnp.zeros((d, d, B), dtype)
        for i in range(d):
            row = jnp.sum(
                jnp.where(lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0) == i, M, 0.0),
                axis=0,
            )
            out = out + row[:, None, :] * row[None, :, :]
        return out

    def body(t, M_prev):
        S = D_ref[t] - mtm(M_prev)
        L = _chol_lanes(S, d)
        L_ref[t] = L
        OtT = jnp.where(
            t < T - 1, OT_ref[jnp.minimum(t, OT_ref.shape[0] - 1)], jnp.zeros((d, d, B), dtype)
        )
        M_t = _trisolve_lanes(L, OtT, d)
        M_ref[t] = M_t
        return M_t

    lax.fori_loop(0, T, body, jnp.zeros((d, d, D_ref.shape[-1]), dtype))


def _solve_lanes_kernel(L_ref, M_ref, b_ref, x_ref, u_scr, d: int, T: int):
    dtype = L_ref.dtype
    B = L_ref.shape[-1]

    def fwd_body(t, u_prev):
        M_prev = jnp.where(t > 0, M_ref[jnp.maximum(t - 1, 0)], jnp.zeros((d, d, B), dtype))
        bt = b_ref[t] - jnp.sum(M_prev * u_prev[:, None, :], axis=0)
        u_t = _trisolve_lanes(L_ref[t], bt[:, None, :], d)[:, 0, :]
        u_scr[t] = u_t
        return u_t

    lax.fori_loop(0, T, fwd_body, jnp.zeros((d, B), dtype))

    def bwd_body(j, x_next):
        t = T - 1 - j
        Mt = jnp.where(t < T - 1, M_ref[jnp.minimum(t, max(T - 2, 0))], jnp.zeros((d, d, B), dtype))
        rhs = u_scr[t] - jnp.sum(Mt * x_next[None, :, :], axis=1)
        x_t = _trisolve_T_lanes(L_ref[t], rhs[:, None, :], d)[:, 0, :]
        x_ref[t] = x_t
        return x_t

    lax.fori_loop(0, T, bwd_body, jnp.zeros((d, B), dtype))


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
    OTl = (
        jnp.transpose(O, (1, 3, 2, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    kernel = functools.partial(_factor_lanes_kernel, d=d, T=T)
    Bt = B if batch_tile is None else batch_tile
    assert B % Bt == 0, (B, Bt)
    To = OTl.shape[0]
    spec = lambda t: pl.BlockSpec((t, d, d, Bt), lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM)
    Ll, Ml = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[spec(T), spec(To)],
        out_specs=(spec(T), spec(T)),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
        ),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Dl, OTl)
    L = jnp.transpose(Ll, (3, 0, 1, 2))
    M = jnp.transpose(Ml, (3, 0, 1, 2))[:, : max(T - 1, 0)]
    return L, M


def solve_lanes(L, M, b, interpret=False, batch_tile=None):
    """Batched substitution with factors from factor_lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = L.shape
    dtype = L.dtype
    Ll = jnp.transpose(L, (1, 2, 3, 0))
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
# (e.g. contact problems, d ~ 54): grid (B/Bt, T) streams one stage block
# per grid step; the Riccati carry (M_prev / u_prev / x_next) lives in a
# scratch buffer that persists across the sequential TPU grid steps, reset
# at t == 0 of each batch tile.


def _factor_stream_kernel(D_ref, OT_ref, L_ref, M_ref, Mprev, d: int, T: int):
    from jax.experimental import pallas as pl

    dtype = D_ref.dtype
    B = D_ref.shape[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        Mprev[...] = jnp.zeros((d, d, B), dtype)

    def mtm(M):
        out = jnp.zeros((d, d, B), dtype)
        for i in range(d):
            row = jnp.sum(
                jnp.where(lax.broadcasted_iota(jnp.int32, (d, 1, 1), 0) == i, M, 0.0),
                axis=0,
            )
            out = out + row[:, None, :] * row[None, :, :]
        return out

    S = D_ref[0] - mtm(Mprev[...])
    L = _chol_lanes(S, d)
    L_ref[0] = L
    Mt = _trisolve_lanes(L, OT_ref[0], d)
    Mt = jnp.where(t < T - 1, Mt, jnp.zeros_like(Mt))
    M_ref[0] = Mt
    Mprev[...] = Mt


def factor_lanes_stream(D, O, batch_tile, interpret=False):
    """T-streaming batched factor (same contract as factor_lanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = D.shape
    dtype = D.dtype
    Dl = jnp.transpose(D, (1, 2, 3, 0))
    OTl = (
        jnp.transpose(O, (1, 3, 2, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    To = OTl.shape[0]
    Bt = batch_tile
    assert B % Bt == 0, (B, Bt)
    kernel = functools.partial(_factor_stream_kernel, d=d, T=T)
    spec = lambda imap: pl.BlockSpec((1, d, d, Bt), imap, memory_space=pltpu.VMEM)
    Ll, Ml = pl.pallas_call(
        kernel,
        grid=(B // Bt, T),
        in_specs=[
            spec(lambda i, t: (t, 0, 0, i)),
            spec(lambda i, t: (jnp.minimum(t, To - 1), 0, 0, i)),
        ],
        out_specs=(spec(lambda i, t: (t, 0, 0, i)), spec(lambda i, t: (t, 0, 0, i))),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
            jax.ShapeDtypeStruct((T, d, d, B), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((d, d, Bt), dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Dl, OTl)
    L = jnp.transpose(Ll, (3, 0, 1, 2))
    M = jnp.transpose(Ml, (3, 0, 1, 2))[:, : max(T - 1, 0)]
    return L, M


def _solve_fwd_stream_kernel(L_ref, M_ref, b_ref, u_ref, uprev, d: int, T: int):
    from jax.experimental import pallas as pl

    dtype = L_ref.dtype
    B = L_ref.shape[-1]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        uprev[...] = jnp.zeros((d, B), dtype)

    Mprev = jnp.where(t > 0, M_ref[0], jnp.zeros((d, d, B), dtype))
    bt = b_ref[0] - jnp.sum(Mprev * uprev[...][:, None, :], axis=0)
    u = _trisolve_lanes(L_ref[0], bt[:, None, :], d)[:, 0, :]
    u_ref[0] = u
    uprev[...] = u


def _solve_bwd_stream_kernel(L_ref, M_ref, u_ref, x_ref, xnext, d: int, T: int):
    from jax.experimental import pallas as pl

    dtype = L_ref.dtype
    B = L_ref.shape[-1]
    t = pl.program_id(1)
    s = T - 1 - t

    @pl.when(t == 0)
    def _():
        xnext[...] = jnp.zeros((d, B), dtype)

    Mt = jnp.where(s < T - 1, M_ref[0], jnp.zeros((d, d, B), dtype))
    rhs = u_ref[0] - jnp.sum(Mt * xnext[...][None, :, :], axis=1)
    x = _trisolve_T_lanes(L_ref[0], rhs[:, None, :], d)[:, 0, :]
    x_ref[0] = x
    xnext[...] = x


def solve_lanes_stream(L, M, b, batch_tile, interpret=False):
    """T-streaming batched substitution (same contract as solve_lanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, d, _ = L.shape
    dtype = L.dtype
    Ll = jnp.transpose(L, (1, 2, 3, 0))
    Ml = (
        jnp.transpose(M, (1, 2, 3, 0)) if T > 1 else jnp.zeros((1, d, d, B), dtype)
    )
    To = Ml.shape[0]
    bl = jnp.transpose(b, (1, 2, 0))
    Bt = batch_tile
    assert B % Bt == 0, (B, Bt)
    mspec = lambda imap: pl.BlockSpec((1, d, d, Bt), imap, memory_space=pltpu.VMEM)
    vspec = lambda imap: pl.BlockSpec((1, d, Bt), imap, memory_space=pltpu.VMEM)
    fwd = functools.partial(_solve_fwd_stream_kernel, d=d, T=T)
    Ul = pl.pallas_call(
        fwd,
        grid=(B // Bt, T),
        in_specs=[
            mspec(lambda i, t: (t, 0, 0, i)),
            mspec(lambda i, t: (jnp.minimum(jnp.maximum(t - 1, 0), To - 1), 0, 0, i)),
            vspec(lambda i, t: (t, 0, i)),
        ],
        out_specs=vspec(lambda i, t: (t, 0, i)),
        out_shape=jax.ShapeDtypeStruct((T, d, B), dtype),
        scratch_shapes=[pltpu.VMEM((d, Bt), dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Ll, Ml, bl)
    bwd = functools.partial(_solve_bwd_stream_kernel, d=d, T=T)
    xl = pl.pallas_call(
        bwd,
        grid=(B // Bt, T),
        in_specs=[
            mspec(lambda i, t: (T - 1 - t, 0, 0, i)),
            mspec(lambda i, t: (jnp.minimum(T - 1 - t, To - 1), 0, 0, i)),
            vspec(lambda i, t: (T - 1 - t, 0, i)),
        ],
        out_specs=vspec(lambda i, t: (T - 1 - t, 0, i)),
        out_shape=jax.ShapeDtypeStruct((T, d, B), dtype),
        scratch_shapes=[pltpu.VMEM((d, Bt), dtype)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(Ll, Ml, Ul)
    return jnp.transpose(xl, (2, 0, 1))


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
