"""Pallas fused block-tridiagonal solve vs dense reference (interpreter
mode on CPU; the compiled TPU path is exercised by the benchmarks)."""

import numpy as np
import jax.numpy as jnp

from calipso_tpu.ops import pallas_riccati as pr
from tests.test_riccati import make_block_tridiag


def test_fused_kernel_matches_dense():
    rng = np.random.default_rng(0)
    B, T, d = 3, 6, 4
    D = np.zeros((B, T, d, d))
    O = np.zeros((B, T - 1, d, d))
    b = rng.normal(size=(B, T, d))
    S_ref = []
    for i in range(B):
        Di, Oi, Si = make_block_tridiag(T, d, rng)
        D[i], O[i] = Di, Oi
        S_ref.append(Si)
    x = pr.solve_batched_pallas(
        jnp.asarray(D), jnp.asarray(O), jnp.asarray(b), interpret=True
    )
    for i in range(B):
        want = np.linalg.solve(S_ref[i], b[i].reshape(-1)).reshape(T, d)
        np.testing.assert_allclose(np.asarray(x[i]), want, atol=1e-9)


def test_lanes_kernel_matches_dense():
    # the production variant: batch on the 128-lane axis (2.8x faster than
    # the XLA scan on a v5e at B=128, T=21, d=8)
    rng = np.random.default_rng(2)
    B, T, d = 5, 6, 4
    D = np.zeros((B, T, d, d))
    O = np.zeros((B, T - 1, d, d))
    b = rng.normal(size=(B, T, d))
    S_ref = []
    for i in range(B):
        Di, Oi, Si = make_block_tridiag(T, d, rng)
        D[i], O[i] = Di, Oi
        S_ref.append(Si)
    x = pr.solve_batched_lanes(
        jnp.asarray(D), jnp.asarray(O), jnp.asarray(b), interpret=True
    )
    for i in range(B):
        want = np.linalg.solve(S_ref[i], b[i].reshape(-1)).reshape(T, d)
        np.testing.assert_allclose(np.asarray(x[i]), want, atol=1e-9)


def test_dispatch_falls_back_on_cpu():
    rng = np.random.default_rng(1)
    B, T, d = 2, 4, 3
    D = np.zeros((B, T, d, d))
    O = np.zeros((B, T - 1, d, d))
    b = rng.normal(size=(B, T, d))
    for i in range(B):
        Di, Oi, _ = make_block_tridiag(T, d, rng)
        D[i], O[i] = Di, Oi
    x = pr.solve_batched(jnp.asarray(D), jnp.asarray(O), jnp.asarray(b))
    xp = pr.solve_batched_pallas(
        jnp.asarray(D), jnp.asarray(O), jnp.asarray(b), interpret=True
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(xp), atol=1e-9)
