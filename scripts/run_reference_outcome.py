#!/usr/bin/env python
"""Run the ACTUAL reference training to completion to measure its outcomes
(the parity denominator VERDICT r2 #3 asks for).

The reference code predates numpy 2: `simulation_class.model.Model.rollout`
passes the policy output `u` (an array of shape [input_dim]) into
`ode_systems.cartpole`, whose `4 * u` terms then make the returned dy/dt
list inhomogeneous ([scalar, array, scalar, array]), which numpy 2 rejects
inside scipy odeint.  We monkeypatch the ODE with a u-scalarizing wrapper —
identical math, no reference files modified — then exec the shipped script.

Usage: python scripts/run_reference_outcome.py <seed> [script_basename]
"""

import functools
import os
import runpy
import sys

REFERENCE = os.environ.get("MCPILCO_REFERENCE", "/root/reference")


def scalarized_ode(name, y, t, u):
    """Module-level (hence picklable — the reference pickles its config,
    ODE included) wrapper casting the policy output array to a scalar.
    Resolves the original ODE by name at call time: the patched module slot
    no longer holds the original, so capturing it directly would break
    pickle-by-reference."""
    import numpy as np
    import simulation_class.ode_systems as f_ode

    return getattr(f_ode, "_orig_" + name)(y, t, float(np.asarray(u).reshape(-1)[0]))


def main():
    seed = sys.argv[1] if len(sys.argv) > 1 else "1"
    script = sys.argv[2] if len(sys.argv) > 2 else "test_mcpilco_cartpole.py"
    sys.path.insert(0, REFERENCE)
    # gym/mujoco-py shim over modern `mujoco` (scripts/gym_shim/) so the
    # reference MuJoCo scenarios run unmodified (VERDICT r4 item 2)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "gym_shim"))
    # import ourselves as a named module so the partial below pickles by
    # reference (__main__ is about to be replaced by runpy)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import run_reference_outcome as _self

    import simulation_class.ode_systems as f_ode

    f_ode._orig_cartpole = f_ode.cartpole
    f_ode._orig_pend = f_ode.pend
    f_ode.cartpole = functools.partial(_self.scalarized_ode, "cartpole")
    f_ode.pend = functools.partial(_self.scalarized_ode, "pend")

    os.makedirs(os.path.join("results_tmp", seed), exist_ok=True)
    sys.argv = [script, "-seed", seed]
    runpy.run_path(os.path.join(REFERENCE, script), run_name="__main__")


if __name__ == "__main__":
    main()
