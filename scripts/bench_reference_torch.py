#!/usr/bin/env python
"""Measure the reference implementation's policy-optimization hot loop.

Imports the ACTUAL reference code (read-only, from /root/reference) and times
its `apply_policy -> cost -> backward -> Adam.step` inner loop under the
flagship cartpole configuration (400 particles, 60-step horizon, 2 GPs with
SE+P(2) kernel, 200-basis policy, CPU float64, 1 torch thread — matching
test_mcpilco_cartpole.py:42-47,199-216).  The GP posterior cache is built on
a synthetic dataset of the same size the reference reaches in its final trial
(~360 one-step samples; SOD typically keeps most of them in early trials).

Run once; the resulting JSON (bench_baseline.json) is the reference
denominator used by bench.py.
"""

import json
import os
import sys
import time

REFERENCE = os.environ.get("MCPILCO_REFERENCE", "/root/reference")


def main():
    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch

    torch.manual_seed(0)
    np.random.seed(0)
    torch.set_num_threads(1)
    dtype = torch.float64
    device = torch.device("cpu")

    import gpr_lib.Utils.Parameters_covariance_functions  # noqa: F401 (namespace pkg)
    import model_learning.Model_learning as ML
    import policy_learning.Cost_function as Cost_function
    import policy_learning.Policy as Policy

    state_dim, input_dim, num_gp, gp_input_dim = 4, 1, 2, 6
    T_sampling, u_max = 0.05, 10.0
    num_particles, horizon = 400, 60
    n_data = 360

    init_dict_RBF = dict(
        active_dims=np.arange(0, gp_input_dim),
        lengthscales_init=np.ones(gp_input_dim),
        flg_train_lengthscales=True,
        lambda_init=np.ones(1),
        flg_train_lambda=False,
        sigma_n_init=0.05 * np.ones(1),
        flg_train_sigma_n=True,
        sigma_n_num=None,
        dtype=dtype,
        device=device,
    )
    init_dict_MPK = dict(
        active_dims=np.arange(0, gp_input_dim),
        poly_deg=2,
        Sigma_pos_par_init_list=[np.ones(gp_input_dim + 1)]
        + [np.ones((deg + 1) * gp_input_dim) for deg in range(1, 2)],
        flg_train_Sigma_pos_par_list=[True, True],
        dtype=dtype,
        device=device,
    )
    ml = ML.Speed_Model_learning_RBF_MPK_angle_state(
        num_gp=num_gp,
        init_dict_list=[[init_dict_RBF, init_dict_MPK]] * num_gp,
        angle_indeces=[2],
        not_angle_indeces=[0, 1, 3],
        T_sampling=T_sampling,
        vel_indeces=[1, 3],
        not_vel_indeces=[0, 2],
        dtype=dtype,
        device=device,
    )
    # realistic interaction data: random-input cartpole rollouts via the
    # reference's own ODE + scipy integrator
    import simulation_class.ode_systems as f_ode
    from scipy.integrate import odeint

    x = np.zeros(state_dim)
    traj, us = [x.copy()], []
    for i in range(n_data):
        u = u_max * (2 * np.random.rand(input_dim) - 1)
        x = odeint(f_ode.cartpole, x, [0, T_sampling], args=(float(u[0]),))[1]
        traj.append(x.copy())
        us.append(u)
        if i % 60 == 59:
            x = np.zeros(state_dim)  # new trial from rest
    states = np.asarray(traj)
    inputs = np.asarray(us + [np.zeros(input_dim)])
    ml.add_data(states, inputs)

    # brief hyperparameter training through the reference's own path so the
    # model is numerically sane (their configs use 1501 epochs)
    import gpr_lib.Likelihood.Gaussian_likelihood as Likelihood

    opt_dict = {
        "f_optimizer": "lambda p : torch.optim.Adam(p, lr = 0.01)",
        "criterion": Likelihood.Marginal_log_likelihood,
        "N_epoch": 301,
        "N_epoch_print": 1000,
    }
    ml.reinforce_model(optimization_opt_list=[opt_dict] * num_gp)
    ml.set_eval_mode()

    num_basis = 200
    angle_centers = np.pi * 2 * (np.random.rand(num_basis, 1) - 0.5)
    centers_init = np.concatenate(
        [np.pi * 2 * (np.random.rand(num_basis, 3) - 0.5), np.cos(angle_centers), np.sin(angle_centers)], 1
    )
    policy = Policy.Sum_of_gaussians_with_angles(
        state_dim=state_dim,
        input_dim=input_dim,
        num_basis=num_basis,
        angle_indices=np.array([2]),
        non_angle_indices=np.array([0, 1, 3]),
        centers_init=centers_init,
        lengthscales_init=np.ones(state_dim + 1),
        weight_init=u_max * (np.random.rand(input_dim, num_basis) - 0.5),
        flg_squash=True,
        u_max=u_max,
        flg_drop=True,
        dtype=dtype,
        device=device,
    )
    cost = Cost_function.Cart_pole_cost(
        target_state=torch.tensor([np.pi, 0.0], dtype=dtype),
        lengthscales=torch.tensor([3.0, 1.0], dtype=dtype),
        angle_index=2,
        pos_index=0,
    )

    from torch.distributions.multivariate_normal import MultivariateNormal

    mean0 = torch.zeros(state_dim, dtype=dtype)
    var0 = 1e-4 * torch.ones(state_dim, dtype=dtype)

    def apply_policy(p_dropout):
        # reference MC_PILCO.apply_policy (MC_PILCO.py:615-674)
        dist = MultivariateNormal(
            loc=mean0.repeat(num_particles, 1),
            covariance_matrix=torch.stack([torch.diag(var0)] * num_particles),
        )
        states_seq = [dist.rsample()]
        inputs_seq = [policy(states_seq[0], t=0, p_dropout=p_dropout)]
        for t in range(1, horizon):
            particles, _, _ = ml.get_next_state(states_seq[t - 1], inputs_seq[t - 1])
            states_seq.append(particles)
            inputs_seq.append(policy(states_seq[t], t=t, p_dropout=p_dropout))
        return torch.stack(states_seq), torch.stack(inputs_seq)

    optimizer = torch.optim.Adam(policy.parameters(), lr=0.01)
    # warmup
    for _ in range(3):
        optimizer.zero_grad()
        s, u = apply_policy(0.25)
        c, _ = cost(s, u, 0)
        c.backward()
        optimizer.step()

    n_steps = 30
    t0 = time.time()
    for _ in range(n_steps):
        optimizer.zero_grad()
        s, u = apply_policy(0.25)
        c, _ = cost(s, u, 0)
        c.backward()
        optimizer.step()
    per_step_ms = 1e3 * (time.time() - t0) / n_steps

    result = {
        "reference_policy_opt_ms_per_step": per_step_ms,
        "config": {
            "num_particles": num_particles,
            "horizon": horizon,
            "num_gp": num_gp,
            "n_train": n_data,
            "num_basis": num_basis,
            "device": "cpu",
            "dtype": "float64",
            "torch_threads": 1,
        },
        "method": "reference code imported from /root/reference; "
        "apply_policy+cost+backward+Adam timed over 30 steps after 3 warmup",
    }
    print(json.dumps(result, indent=1))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_baseline.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
