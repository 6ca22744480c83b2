"""Contact-implicit receding-horizon MPC on the quadruped (reference
examples/contact_implicit/quadruped_mpc.jl: re-solve a short-horizon
contact problem every control step, warmstarted from the previous
primal-dual point). The reference delegates the controller to
ContactImplicitMPC.jl; here the controller is this solver itself via
apps/mpc.make_mpc_controller — one compiled short-horizon solve, measured
state in the stage-0 parameter, warmstart carry between steps
(reference options.jl:57, solve.jl:10-13)."""

import numpy as np
import pytest

from calipso_tpu import TrajOptSolver, Options
from calipso_tpu.apps.mpc import make_mpc_controller
from calipso_tpu.models import quadruped


@pytest.mark.heavy
def test_quadruped_stance_mpc():
    H = 4
    prob = quadruped.mpc_problem(horizon=H)
    kw = {
        k: v
        for k, v in prob.items()
        if k not in ("state_guess", "state_initial", "action_guess")
    }
    ts = TrajOptSolver(options=Options(), **kw)
    ts.initialize_states(prob["state_guess"])
    ts.initialize_actions(prob["action_guess"])
    guess = ts._guess_buffer()

    controller = make_mpc_controller(ts, guess, lambda x: x, warmstart=True)
    s1 = np.asarray(ts._state_indices[1])

    # perturbed start: body 3 cm high with a slight pitch
    q0 = quadruped._nominal_q()
    q0[1] += 0.03
    q0[2] = 0.05
    x = np.concatenate([q0, q0])

    warm = None
    iters = []
    for _ in range(4):
        action, warm, solved, it = controller(x, warm)
        assert bool(solved), "MPC step failed to converge"
        iters.append(int(it))
        # plant = model-consistent rollout: next measured (q2, q3) is the
        # first predicted stage (the reference's simulator is the same
        # variational integrator the controller transcribes)
        x = np.asarray(warm.x)[s1][: 2 * quadruped.NQ]

    # warmstarted re-solves are cheaper than the cold solve
    assert min(iters[1:]) < iters[0]

    # stance recovered: body height near nominal, pitch flattened,
    # feet on (not through) the ground
    q = x[quadruped.NQ :]
    assert abs(q[1] - (0.3 + quadruped.FOOT_RADIUS)) < 0.03
    assert abs(q[2]) < 0.05
    phi = np.asarray(quadruped.signed_distance(q))
    assert np.all(phi > -1e-4)
