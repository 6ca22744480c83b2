"""Horizon-sharded block-tridiagonal solve (ops/spike.py): the
sequence-parallel (CP-like) axis. Runs on the 8-virtual-device CPU mesh
(tests/conftest.py), validating the partitioned Schur-complement
elimination against a dense solve and the single-device Riccati sweep."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from calipso_tpu.ops import riccati as rc
from calipso_tpu.ops import spike


def _random_spd_tridiag(rng, T, d, shift=6.0):
    O = jnp.asarray(rng.normal(size=(T - 1, d, d)))
    D = jnp.asarray(
        np.stack([(lambda A: A @ A.T + shift * np.eye(d))(rng.normal(size=(d, d))) for _ in range(T)])
    )
    n = T * d
    S = np.zeros((n, n))
    for t in range(T):
        S[t * d : (t + 1) * d, t * d : (t + 1) * d] = D[t]
    for t in range(T - 1):
        S[(t + 1) * d : (t + 2) * d, t * d : (t + 1) * d] = O[t]
        S[t * d : (t + 1) * d, (t + 1) * d : (t + 2) * d] = O[t].T
    w = np.linalg.eigvalsh(S).min()
    if w < 0.5:
        S += (0.5 - w) * np.eye(n)
        D = D + (0.5 - w) * jnp.eye(d)[None]
    return D, O, S


def _mesh():
    return Mesh(np.array(jax.devices()), axis_names=("stage",))


@pytest.mark.parametrize("T,d", [(16, 3), (32, 5), (64, 4)])
def test_spike_matches_dense(T, d):
    rng = np.random.default_rng(T + d)
    D, O, S = _random_spd_tridiag(rng, T, d)
    b = jnp.asarray(rng.normal(size=(T, d)))
    mesh = _mesh()
    x = jax.jit(lambda D, O, b: spike.solve_sharded(D, O, b, mesh, "stage"))(D, O, b)
    x_ref = np.linalg.solve(S, np.asarray(b).ravel()).reshape(T, d)
    assert np.abs(np.asarray(x) - x_ref).max() < 1e-10


def test_spike_matches_riccati_sweep():
    rng = np.random.default_rng(3)
    T, d = 24, 4
    D, O, _ = _random_spd_tridiag(rng, T, d)
    b = jnp.asarray(rng.normal(size=(T, d)))
    L, M = rc.factor(D, O)
    x_rc = rc.solve(L, M, b)
    x_sp = spike.solve_sharded(D, O, b, _mesh(), "stage")
    assert np.abs(np.asarray(x_sp) - np.asarray(x_rc)).max() < 1e-10


def test_spike_rejects_bad_split():
    rng = np.random.default_rng(0)
    D, O, _ = _random_spd_tridiag(rng, 12, 3)  # 12 not divisible by 8
    b = jnp.zeros((12, 3))
    with pytest.raises(ValueError, match="chunks"):
        spike.solve_sharded(D, O, b, _mesh(), "stage")
