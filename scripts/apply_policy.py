#!/usr/bin/env python
"""Replay a trained policy on the true system or on the learned model.

TPU-native equivalent of the reference's four replay scripts
(apply_mcpilco_policy.py, apply_mcpilco4pms_policy.py,
apply_mcpilco_policy_on_model.py, apply_mcpilco4pms_policy_on_model.py):
reload a checkpoint, run the policy N times on the plant (--target system)
or roll N particles through the learned GP model (--target model), and report
the cost statistics.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stored_scenario(checkpoint):
    """Checkpoints are self-describing: the training run stamps its scenario
    name + config into the manifest (the config_log.pkl analog)."""
    try:
        with open(os.path.join(checkpoint, "manifest.json")) as f:
            return json.load(f)["meta"].get("scenario")
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        return None


def _tuplify(v):
    return tuple(_tuplify(x) for x in v) if isinstance(v, list) else v


def build_agent(scenario, seed, checkpoint=None):
    stored = _stored_scenario(checkpoint) if checkpoint else None
    if stored and stored.get("name"):
        scenario = stored["name"]

    if scenario == "cartpole":
        from mcpilco_tpu.scenarios import cartpole as scen

        cfg_cls = scen.CartpoleConfig
    elif scenario == "cartpole_pms":
        from mcpilco_tpu.scenarios import cartpole_pms as scen

        cfg_cls = scen.CartpolePMSConfig
    elif scenario == "cartpole_mujoco":
        from mcpilco_tpu.scenarios import cartpole_mujoco as scen

        cfg_cls = scen.CartpoleMujocoConfig
    elif scenario == "ur5":
        from mcpilco_tpu.scenarios import ur5 as scen

        cfg_cls = scen.UR5Config
    elif scenario == "furuta":
        from mcpilco_tpu.scenarios import furuta as scen

        cfg_cls = scen.FurutaConfig
    else:
        raise SystemExit(f"unknown scenario {scenario}")

    if stored:
        kw = {k: _tuplify(v) for k, v in stored["config"].items()}
        kw["log_dir"] = None  # never write into the training run's log dir
        cfg = cfg_cls(**kw)
        print(f"[apply_policy] rebuilt '{scenario}' from checkpoint config")
    else:
        cfg = cfg_cls(seed=seed)
    agent, _ = scen.build(cfg)
    return agent, cfg


def main():
    p = argparse.ArgumentParser("apply trained policy")
    p.add_argument("checkpoint", help="checkpoint dir (e.g. results_tmp/1/policy_trial4)")
    p.add_argument("--scenario", default="cartpole")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--target", choices=["system", "model"], default="system")
    p.add_argument("--repeats", type=int, default=50)
    p.add_argument("--T", type=float, default=3.0)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    from mcpilco_tpu.utils import prng

    agent, cfg = build_agent(args.scenario, args.seed, checkpoint=args.checkpoint)
    agent.load_checkpoint(args.checkpoint)
    print(f"loaded {args.checkpoint}: {agent.num_collections} collections")

    if args.target == "system":
        # run the policy on the real plant 'repeats' times
        # (apply_mcpilco_policy.py:41-67)
        costs = []
        for r in range(args.repeats):
            k = prng.fold(prng.stream(agent.key, prng.STREAM_SYSTEM), 0xEE, r)
            x0 = agent._sample_x0(1000 + r)
            trial = agent.plant.rollout(k, x0, agent.policy, agent.policy_params, args.T, agent.dt)
            c = agent.cost.stage_costs(
                jnp.asarray(trial.true)[:, None, :], jnp.asarray(trial.inputs)[:, None, :]
            )
            costs.append(float(jnp.sum(c)))
            if r < 5 or r == args.repeats - 1:
                print(f"  run {r}: cumulative cost {costs[-1]:.2f}")
        print(
            f"[apply_policy] system: cost over {args.repeats} runs: "
            f"mean {np.mean(costs):.2f} +- {np.std(costs):.2f} (min {np.min(costs):.2f})"
        )
    else:
        # roll particles through the learned model
        # (apply_mcpilco_policy_on_model.py:59-76)
        engine = agent.optimizer.engine
        horizon = int(args.T / agent.dt)
        s0 = agent.init_dist.sample(jax.random.PRNGKey(0), args.repeats)
        res = engine.simulate(
            jax.random.PRNGKey(1), agent.policy_params, agent.gp_params, agent.posterior,
            s0, horizon, p_dropout=0.0,
        )
        total, spread = agent.cost(res.states, res.inputs)
        print(
            f"[apply_policy] model: {args.repeats} particles x {horizon} steps: "
            f"cost {float(total):.2f} (particle std {float(spread):.2f})"
        )
        st = np.asarray(res.states)
        print(f"  final-state mean: {np.round(st[-1].mean(axis=0), 3)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
