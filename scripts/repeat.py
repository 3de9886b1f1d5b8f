#!/usr/bin/env python
"""Multi-seed ablation driver (the reference's repeat_test.py analog).

Runs a training script for a range of seeds and aggregates the success rate —
the reference's statistical-validation protocol (repeat_test.py:15-23 runs
seeds 1..50 via os.system).  Seeds run sequentially by default (one TPU);
``--jobs N`` parallelizes on CPU.
"""

import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SCRIPTS = {
    "cartpole": "train_cartpole.py",
    "cartpole_multi_init": "train_cartpole.py",
    "cartpole_pms": "train_cartpole_pms.py",
    "cartpole_mujoco": "train_cartpole_mujoco.py",
    "furuta": "train_furuta.py",
    "ur5": "train_ur5.py",
}

# per-scenario extra CLI flags for the training script
SCENARIO_FLAGS = {"cartpole_multi_init": ["--multi-init"]}


# Infrastructure failures (TPU tunnel/worker died, backend never came up) are
# NOT task outcomes: counting them as failures silently corrupts the success
# rate (this happened: a UR5 sweep recorded 0/2 that was entirely a crashed
# tunnel).  Seeds matching these markers are excluded from the denominator and
# reported separately so they get re-run.
_INFRA_MARKERS = (
    "TPU worker process crashed",
    "Unable to initialize backend",
    "UNAVAILABLE: TPU backend setup/compile error",
    "DEADLINE_EXCEEDED",
)


def _is_infra_error(out: str) -> bool:
    return any(m in out for m in _INFRA_MARKERS)


def _classify_infra(out: str, success: bool, rc: int) -> bool:
    """A seed is an infra event only when the run actually DIED on an infra
    marker.  A run that logged a retried transient (e.g. a recovered
    DEADLINE_EXCEEDED on the tunneled runtime) but finished with an outcome
    is a valid protocol sample — dropping it would corrupt the denominator
    in the opposite direction of the crashed-tunnel 0/2 bug."""
    return not success and rc != 0 and _is_infra_error(out)


def _parse_cost(out: str):
    """Final-trial cumulative cost, if the script printed one."""
    for line in out.splitlines():
        if "cumulative cost:" in line:
            try:
                return float(line.rsplit(":", 1)[1])
            except ValueError:
                pass
    return None


def _save_seed_log(scenario, seed, text, tag=""):
    """Persist a seed's captured stdout/stderr — without this, a crashed
    seed's output vanishes with the redirect buffer and the failure is
    undiagnosable after the sweep."""
    d = f"results_tmp/{scenario}{f'_{tag}' if tag else ''}_{seed}"
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "stdout.log"), "w") as f:
        f.write(text)


def run_seed(scenario, seed, extra, platform, tag=""):
    logdir = f"results_tmp/{scenario}{f'_{tag}' if tag else ''}_{seed}"
    cmd = [sys.executable, "-u", os.path.join(HERE, SCRIPTS[scenario]), "--seed", str(seed),
           "--log-dir", logdir] \
        + SCENARIO_FLAGS.get(scenario, []) + extra
    if platform:
        cmd += ["--platform", platform]
    r = subprocess.run(cmd, capture_output=True, text=True)
    _save_seed_log(scenario, seed, r.stdout + "\n==== stderr ====\n" + r.stderr, tag)
    success = "success: True" in r.stdout
    # cost parsed from the FULL output — a print after the cost line must not
    # silently drop the seed's cost from the quartiles
    infra = _classify_infra(r.stdout + r.stderr, success, r.returncode)
    return seed, success, r.returncode, _parse_cost(r.stdout), infra


def run_seed_inprocess(scenario, seed, extra, platform, tag=""):
    """Run one seed by calling the train script's main() in THIS process.

    Sequential seeds then share the in-memory jit cache: the scenario's
    compiled programs key on value-hashed frozen-dataclass configs, so every
    seed after the first skips tracing AND compilation entirely (~3 min/seed
    on the big cartpole programs).  Use for long TPU seed sweeps."""
    import contextlib
    import importlib
    import io

    if HERE not in sys.path:
        sys.path.insert(0, HERE)
    mod = importlib.import_module(SCRIPTS[scenario][:-3])
    argv = [SCRIPTS[scenario], "--seed", str(seed),
            "--log-dir", f"results_tmp/{scenario}{f'_{tag}' if tag else ''}_{seed}"] \
        + SCENARIO_FLAGS.get(scenario, []) + extra
    if platform:
        argv += ["--platform", platform]
    old_argv, sys.argv = sys.argv, argv
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            rc = mod.main()
    except SystemExit as e:  # argparse or explicit exit
        rc = int(e.code or 0)
    except Exception as e:  # one crashed seed must not lose the whole sweep
        print(f"[repeat] seed {seed} raised {type(e).__name__}: {e}", file=sys.stderr)
        import traceback

        buf.write("\n==== exception ====\n" + traceback.format_exc())
        rc = 1
    finally:
        sys.argv = old_argv
    out = buf.getvalue()
    _save_seed_log(scenario, seed, out, tag)
    ok = "success: True" in out
    return seed, ok, rc, _parse_cost(out), _classify_infra(out, ok, rc)


# scenarios whose plant steps on-device (vmappable): farm-able
FARMABLE = ("cartpole", "cartpole_multi_init", "cartpole_pms", "furuta")


def run_farm(args):
    """Vmapped multi-seed training: every seed trains at once in batched
    device programs (parallel/multiseed.SeedFarm), ``--farm-batch`` seeds per
    batch.  Supports the on-device-plant scenarios (cartpole, furuta)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(HERE))
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mcpilco_tpu.parallel.multiseed import SeedFarm

    if args.scenario in ("cartpole", "cartpole_multi_init"):
        from mcpilco_tpu.scenarios import cartpole as scen

        multi = args.scenario == "cartpole_multi_init"
        make_cfg = lambda seed: scen.CartpoleConfig(seed=seed, multi_init=multi)
        success = scen.swingup_success
    elif args.scenario == "furuta":
        from mcpilco_tpu.scenarios import furuta as scen

        make_cfg, success = scen.FurutaConfig, scen.swingup_success
    elif args.scenario == "cartpole_pms":
        from mcpilco_tpu.scenarios import cartpole_pms as scen

        make_cfg, success = scen.CartpolePMSConfig, scen.swingup_success
    else:
        raise SystemExit(
            "--farm supports the on-device scenarios: cartpole, "
            "cartpole_multi_init, cartpole_pms, furuta"
        )
    results, costs = {}, {}
    seeds = list(range(args.first_seed, args.first_seed + args.num_seeds))
    for lo in range(0, len(seeds), args.farm_batch):
        batch = seeds[lo : lo + args.farm_batch]
        cfg = make_cfg(seed=batch[0])
        if args.smoke:
            cfg = cfg.smoke()
        if args.trials is not None or args.scenario_kw:
            import ast
            import dataclasses as _dc

            kw = {}
            for item in args.scenario_kw:
                k, _, v = item.partition("=")
                try:
                    kw[k] = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    kw[k] = v  # bare strings (e.g. vel_est=savgol)
            if args.trials is not None:
                kw["num_trials"] = args.trials
            cfg = _dc.replace(cfg, **kw)
        agent, kwargs = scen.build(cfg)
        farm = SeedFarm(
            agent, batch,
            policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
        )
        res = farm.run(**kwargs, verbose=True)
        for i, s in enumerate(batch):
            final = res.final_true[i]
            ok = success(final)
            stage = agent.cost.stage_costs(
                jnp.asarray(final[:, None, :]), jnp.asarray(res.final_inputs[i][:, None, :])
            )
            results[s] = ok
            costs[s] = round(float(jnp.sum(stage)), 4)
            print(f"[repeat] seed {s}: success={ok} cost={costs[s]}", flush=True)
        _write_summary(args, results, costs, set(), complete=False)
    return results, costs


def main():
    p = argparse.ArgumentParser("repeat over seeds")
    p.add_argument("--scenario", default="cartpole", choices=sorted(SCRIPTS))
    p.add_argument("--first-seed", type=int, default=1)
    p.add_argument("--num-seeds", type=int, default=50)
    p.add_argument("--jobs", type=int, default=1)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--in-process", action="store_true",
                   help="run seeds sequentially in one process (shared jit cache)")
    p.add_argument("--farm", action=argparse.BooleanOptionalAction, default=None,
                   help="train seeds batched on-device (vmapped SeedFarm); "
                        "DEFAULT for the farm-able scenarios (cartpole, "
                        "cartpole_multi_init, cartpole_pms, furuta) — the "
                        "batch-4 farm runs below the plain optimizer's "
                        "ms/seed-step (RESULTS.md); --no-farm opts out")
    p.add_argument("--farm-batch", type=int, default=4,
                   help="seeds per vmapped farm batch (4 is the one-chip sweet spot; larger batches degrade per-seed throughput)")
    p.add_argument("--trials", type=int, default=None,
                   help="override the scenario's trial count (e.g. 4PMS 6-trial sweeps)")
    p.add_argument("--extra-flag", action="append", default=[],
                   help="extra flag passed through to the training script "
                        "(repeatable; use --extra-flag=--delta-cap=2.0 form "
                        "for flags with values). Subprocess/in-process modes "
                        "only — the farm builds configs directly.")
    p.add_argument("--scenario-kw", action="append", default=[],
                   help="farm mode: scenario-config field override as "
                        "key=value (repeatable; e.g. --scenario-kw "
                        "vel_est=savgol). Values parse as Python literals, "
                        "falling back to strings.")
    p.add_argument("--out-tag", type=str, default="",
                   help="suffix for the summary json filename, so A/B arms "
                        "don't overwrite each other")
    args = p.parse_args()

    if args.extra_flag and (args.farm or (args.farm is None and args.scenario in FARMABLE
                                          and not args.in_process and args.jobs == 1)):
        raise SystemExit("--extra-flag requires --no-farm (or a non-farm scenario)")

    if args.farm is None:
        args.farm = args.scenario in FARMABLE and not args.in_process and args.jobs == 1
    if args.scenario_kw and not args.farm:
        raise SystemExit("--scenario-kw is farm-only; sequential runs take "
                         "script flags via --extra-flag")

    extra = ["--smoke"] if args.smoke else []
    if args.trials is not None:
        extra += ["--trials", str(args.trials)]
    for flag in args.extra_flag:
        extra += flag.split("=", 1) if flag.startswith("--") and "=" in flag else [flag]
    seeds = range(args.first_seed, args.first_seed + args.num_seeds)
    results = {}
    costs = {}
    infra = set()
    if args.farm:
        results, costs = run_farm(args)
        seeds = sorted(results)
    elif args.jobs > 1:
        with cf.ThreadPoolExecutor(args.jobs) as ex:
            futs = [ex.submit(run_seed, args.scenario, s, extra, args.platform, args.out_tag)
                    for s in seeds]
            for f in cf.as_completed(futs):
                seed, ok, rc, cost, inf = f.result()
                results[seed] = ok
                costs[seed] = cost
                if inf:
                    infra.add(seed)
                print(f"[repeat] seed {seed}: success={ok} rc={rc} cost={costs[seed]}"
                      + (" [INFRA ERROR — excluded]" if inf else ""))
                _write_summary(args, results, costs, infra, complete=False)
    else:
        runner = run_seed_inprocess if args.in_process else run_seed
        for s in seeds:
            seed, ok, rc, cost, inf = runner(args.scenario, s, extra, args.platform, args.out_tag)
            results[seed] = ok
            costs[seed] = cost
            if inf:
                infra.add(seed)
            print(f"[repeat] seed {seed}: success={ok} rc={rc} cost={costs[seed]}"
                  + (" [INFRA ERROR — excluded]" if inf else ""), flush=True)
            _write_summary(args, results, costs, infra, complete=False)

    summary, out = _write_summary(args, results, costs, infra, complete=True)
    print(json.dumps(summary, indent=1))
    print(f"wrote {out}")
    return 0


def _write_summary(args, results, costs, infra, complete):
    """Build + write the sweep summary. Called after every seed/batch with
    complete=False so a crash (e.g. the tunneled TPU runtime dying mid-sweep)
    leaves a readable partial artifact instead of losing the finished seeds."""
    # infra-errored seeds are not outcomes: drop from the denominator
    results = {s: v for s, v in results.items() if s not in infra}
    costs = {s: v for s, v in costs.items() if s not in infra}
    rate = sum(results.values()) / max(len(results), 1)
    known_costs = sorted(c for c in costs.values() if c is not None)
    quartiles = None
    if known_costs:
        def q(p):
            i = p * (len(known_costs) - 1)
            lo, hi = int(i), min(int(i) + 1, len(known_costs) - 1)
            return round(known_costs[lo] + (i - lo) * (known_costs[hi] - known_costs[lo]), 4)
        quartiles = {"q25": q(0.25), "median": q(0.5), "q75": q(0.75),
                     "min": known_costs[0], "max": known_costs[-1]}
    summary = {"scenario": args.scenario, "seeds": sorted(results), "success_rate": rate,
               "final_trial_cost_quartiles": quartiles,
               "per_seed": {str(k): bool(v) for k, v in sorted(results.items())},
               "per_seed_cost": {str(k): costs[k] for k in sorted(costs)},
               "infra_error_seeds": sorted(infra),
               "tag": args.out_tag, "extra_flags": args.extra_flag,
               "scenario_kw": args.scenario_kw, "complete": complete}
    tag = f"_{args.out_tag}" if args.out_tag else ""
    out = f"results_tmp/repeat_{args.scenario}{tag}.json"
    os.makedirs("results_tmp", exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=1)
    os.replace(tmp, out)
    return summary, out


if __name__ == "__main__":
    raise SystemExit(main())
