"""Bunny hop: raw flat-NLP contact problem (reference
examples/contact_implicit/bunnyhop.jl) -- variational dynamics with link
pin + contact complementarity solved through the unstructured path."""

import numpy as np
import jax.numpy as jnp
import pytest

from calipso_tpu import Solver, Options
from calipso_tpu.models import bunnyhop as bh

from tests.test_solver_nlp import assert_contract


@pytest.mark.slow
def test_bunnyhop():
    opts = Options(penalty_initial=1e2)
    s = Solver(bh.objective, bh.equality, bh.inequality, bh.NZ, options=opts)
    res = s.solve(jnp.asarray(bh.initial_guess(0)))
    assert_contract(res, opts)
    z = np.asarray(res.variables)
    q_jump = z[bh.IDX_Q[4]]
    # both wheels clear the obstacle heights
    np.testing.assert_allclose(q_jump[[1, 3]], [1.1, 1.15], atol=1e-3)
    # contact gaps nonnegative along the whole motion
    for i in range(bh.N):
        assert np.min(np.asarray(bh.gaps(z[bh.IDX_Q[i]]))) > -1e-4
