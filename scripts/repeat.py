#!/usr/bin/env python
"""Multi-seed ablation driver (the reference's repeat_test.py analog).

Runs a training script for a range of seeds and aggregates the success rate —
the reference's statistical-validation protocol (repeat_test.py:15-23 runs
seeds 1..50 via os.system).  Seeds run sequentially by default (one TPU);
``--jobs N`` parallelizes on CPU.
"""

import argparse
import concurrent.futures as cf
import faulthandler
import json
import os
import subprocess
import sys
import threading
import time

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


# Watchdog state: the in-process runner points "buf" at the current seed's
# captured-stdout buffer; the watchdog thread treats buffer growth as the
# liveness heartbeat (the trainer prints every ~15 s chunk, GP fits every
# trial, so hundreds of seconds of silence means a stuck device call).
WATCHDOG_EXIT_CODE = 87  # distinct from task/infra failures: "stalled, re-run with --resume"
STOP_EXIT_CODE = 86  # deliberate stop-file exit at a seed/batch boundary


def _stop_path(args):
    return _summary_path(args).replace(".json", ".STOP")


def _check_stop(args):
    """Graceful stop: `touch results_tmp/repeat_<scenario>[_<tag>].STOP` and
    the sweep exits at the next seed/batch boundary — i.e. on the host,
    never mid-device-execution (killing a tunneled-TPU client inside a
    device call wedges the runtime for ~25 min).  The file is consumed so
    the next launch runs normally; the partial summary supports --resume.
    Sequential/in-process and farm sweeps only (--jobs>1 is not covered)."""
    path = _stop_path(args)
    if not os.path.exists(path):
        return False
    try:
        os.remove(path)
    except OSError:
        pass
    print(f"[repeat] STOP file {path} — exiting at boundary "
          f"(resume with --resume)", flush=True)
    return True
_WATCH = {"buf": None, "buf_id": None, "pos": -1, "t": 0.0,
          "seed": None, "scenario": None, "tag": ""}


def _start_watchdog(stall_secs):
    """Hard-exit the process when the running seed stops producing output.

    In-process sweeps can futex-hang inside a tunneled-TPU device call
    (observed: a MuJoCo restarts sweep went 72 min silent while the TPU
    backend stayed healthy).  A signal handler cannot fire inside a stuck C
    call, but a daemon THREAD still runs (the stuck call waits outside the
    GIL), so the recovery that works is: watch the stdout heartbeat, persist
    the stuck seed's partial log, dump stacks, and os._exit with a distinct
    code.  The caller re-runs with --resume and loses only the stuck seed."""

    def run():
        while True:
            time.sleep(min(30.0, max(stall_secs / 4.0, 1.0)))
            buf, now = _WATCH["buf"], time.time()
            if buf is None:
                _WATCH["t"] = now  # between seeds: never fires
                continue
            try:
                pos = buf.tell()
            except ValueError:  # buffer closed while we looked
                _WATCH["t"] = now
                continue
            if pos != _WATCH["pos"] or id(buf) != _WATCH["buf_id"]:
                _WATCH.update(pos=pos, buf_id=id(buf), t=now)
                continue
            if now - _WATCH["t"] <= stall_secs:
                continue
            msg = (f"[repeat] WATCHDOG: seed {_WATCH['seed']} produced no "
                   f"output for {int(now - _WATCH['t'])}s — killing the "
                   f"process (re-run with --resume to continue the sweep)\n")
            sys.stderr.write(msg)
            try:
                _save_seed_log(_WATCH["scenario"], _WATCH["seed"],
                               buf.getvalue() + "\n==== " + msg.strip() + " ====\n",
                               _WATCH["tag"])
            except Exception:
                pass
            faulthandler.dump_traceback(file=sys.stderr)
            sys.stderr.flush()
            os._exit(WATCHDOG_EXIT_CODE)

    threading.Thread(target=run, daemon=True, name="repeat-watchdog").start()


def _start_farm_watchdog(stall_secs, state, args):
    """Farm-mode stall detector (the in-process watchdog watches a per-seed
    stdout buffer the farm doesn't have).  The farm bumps ``state["t"]`` via
    SeedFarm.progress_cb at every return-to-host (each optimize chunk, fit,
    collection) — healthy batches tick every ~chunk_target_s even when a
    trial legitimately runs 8+ min with zero printed output (NaN-storm
    trials).  A tunneled-TPU lost dispatch never returns to host (observed:
    a 4-seed R=4 batch frozen 30+ min, host CPU-time constant), so a stale
    heartbeat is unambiguous: exit WATCHDOG_EXIT_CODE for the supervisor to
    relaunch with --resume (partial summaries are written per batch; only
    the in-flight batch is lost)."""

    def run():
        while True:
            time.sleep(min(30.0, max(stall_secs / 4.0, 1.0)))
            silent = time.time() - state["t"]
            # compile grace: until the process has observed ONE host return,
            # a silence may be a legitimate fresh compile (erratic tunnel
            # compiles reach >10 min; killing mid-compile wedges the chip
            # ~25 min) — mirror the trainer heartbeat's chunk-0 budget.
            budget = stall_secs if state.get("ticks") else max(stall_secs, 2700)
            if silent <= budget:
                continue
            sys.stderr.write(
                f"[repeat] FARM WATCHDOG: no host progress for {int(silent)}s "
                f"(batch {state.get('batch')}) — killing the process "
                f"(re-run with --resume; completed batches are saved)\n"
            )
            faulthandler.dump_traceback(file=sys.stderr)
            sys.stderr.flush()
            os._exit(WATCHDOG_EXIT_CODE)

    threading.Thread(target=run, daemon=True, name="repeat-farm-watchdog").start()


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
    _WATCH.update(buf=buf, buf_id=id(buf), pos=-1, t=time.time(),
                  seed=seed, scenario=scenario, tag=tag)
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
        _WATCH["buf"] = None
    out = buf.getvalue()
    _save_seed_log(scenario, seed, out, tag)
    ok = "success: True" in out
    return seed, ok, rc, _parse_cost(out), _classify_infra(out, ok, rc)


# scenarios whose plant steps on-device (vmappable): farm-able
# farm is the DEFAULT for these (on-device plants, proven throughput win)
FARMABLE = ("cartpole", "cartpole_multi_init", "cartpole_pms", "furuta")
# supported with explicit --farm only: the host-plant (MuJoCo) farm loops the
# sim per seed between batched device phases — new in round 5, opt-in
FARM_SUPPORTED = FARMABLE + ("cartpole_mujoco",)


def run_farm(args, seeds=None, results=None, costs=None):
    """Vmapped multi-seed training: every seed trains at once in batched
    device programs (parallel/multiseed.SeedFarm), ``--farm-batch`` seeds per
    batch.  Supports the on-device-plant scenarios (cartpole, furuta).
    ``seeds``/``results``/``costs`` carry --resume state: already-completed
    seeds are skipped but kept in the summary."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(HERE))
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mcpilco_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
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
    elif args.scenario == "cartpole_mujoco":
        # host-plant farm: the MuJoCo sim loops per seed between the
        # batched device phases (multiseed._collect_host)
        from mcpilco_tpu.scenarios import cartpole_mujoco as scen

        make_cfg, success = scen.CartpoleMujocoConfig, scen.swingup_success
    else:
        raise SystemExit(
            "--farm supports: cartpole, cartpole_multi_init, "
            "cartpole_pms, furuta, cartpole_mujoco"
        )
    results = {} if results is None else results
    costs = {} if costs is None else costs
    if seeds is None:
        seeds = list(range(args.first_seed, args.first_seed + args.num_seeds))
    watch_state = {"t": time.time(), "batch": None}
    if args.stall_secs:
        _start_farm_watchdog(args.stall_secs, watch_state, args)
    for lo in range(0, len(seeds), args.farm_batch):
        if _check_stop(args):
            raise SystemExit(STOP_EXIT_CODE)
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
        watch_state["batch"] = batch
        watch_state["t"] = time.time()
        farm = SeedFarm(
            agent, batch,
            policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
            progress_cb=lambda: watch_state.update(
                t=time.time(), ticks=watch_state.get("ticks", 0) + 1
            ),
        )
        res = farm.run(**kwargs, verbose=True)
        for i, s in enumerate(batch):
            final = res.final_true[i]
            ok = success(final)
            # per-trial cost schedules (lengthscale curricula) index by
            # control-trial ordinal: score the final trial with ITS row
            stage = agent.cost.stage_costs(
                jnp.asarray(final[:, None, :]),
                jnp.asarray(res.final_inputs[i][:, None, :]),
                jnp.int32(len(res.trial_logs) - 1),
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
    p.add_argument("--seeds", type=str, default=None,
                   help="explicit comma-separated seed list (e.g. 5,10); "
                        "overrides --first-seed/--num-seeds — for targeted "
                        "re-runs of known failing seeds")
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
    p.add_argument("--resume", action="store_true",
                   help="load the existing summary json for this "
                        "scenario/tag and skip its completed seeds (crash/"
                        "watchdog recovery; infra-errored seeds re-run)")
    p.add_argument("--stall-secs", type=int, default=900,
                   help="kill the process (exit code 87) when the sweep "
                        "stalls this long — a stuck tunneled-TPU device call "
                        "cannot be interrupted any other way. In-process "
                        "mode watches the seed's output; farm mode watches "
                        "the host-return heartbeat (SeedFarm.progress_cb), "
                        "with a 2700s grace before the first return of the "
                        "process (fresh-compile window). 0 disables.")
    p.add_argument("--supervise", type=int, default=0, metavar="N",
                   help="run the sweep in a supervised subprocess and, on a "
                        "watchdog stall (rc 87) or crash, wait for the chip "
                        "to answer a probe (utils/tpu_health.py — stale "
                        "tunnel claims expire in ~25 min) and re-launch with "
                        "--resume, up to N times. Turns the tunnel's "
                        "lost-dispatch stalls into lost minutes instead of "
                        "lost sweeps. 0 = off.")
    args = p.parse_args()

    if args.supervise and os.environ.get("MCPILCO_SUPERVISED") != "1":
        return _supervise(args)

    if args.farm and args.scenario not in FARM_SUPPORTED:
        raise SystemExit(f"--farm does not support scenario {args.scenario}")
    if args.extra_flag and (args.farm or (args.farm is None and args.scenario in FARMABLE
                                          and not args.in_process and args.jobs == 1)):
        raise SystemExit("--extra-flag requires --no-farm (or a non-farm scenario); "
                         "farm runs take config overrides via --scenario-kw")

    if args.farm is None:
        args.farm = args.scenario in FARMABLE and not args.in_process and args.jobs == 1
    if args.scenario_kw and not args.farm:
        raise SystemExit("--scenario-kw is farm-only; sequential runs take "
                         "script flags via --extra-flag")

    extra = ["--smoke"] if args.smoke else []
    if not args.farm and args.resume:
        # ONLY on --resume (the watchdog/supervisor recovery path) does the
        # in-flight seed restart from its newest complete_trial* checkpoint.
        # A fresh sweep must never auto-resume: seed log dirs persist across
        # invocations, so a stale checkpoint from an earlier sweep of the
        # same scenario/tag would be silently replayed as a new sample
        # (auto_resume additionally validates the stored config, mc_pilco.
        # _check_resume_config, so a config change fails loudly either way).
        extra += ["--auto-resume"]
    if args.trials is not None:
        extra += ["--trials", str(args.trials)]
    for flag in args.extra_flag:
        extra += flag.split("=", 1) if flag.startswith("--") and "=" in flag else [flag]
    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",")]
    else:
        seeds = list(range(args.first_seed, args.first_seed + args.num_seeds))
    results = {}
    costs = {}
    infra = set()
    if args.resume:
        results, costs = _load_resume(args)
        seeds = [s for s in seeds if s not in results]
        if not seeds:
            print("[repeat] resume: nothing left to run")
    if args.in_process and args.stall_secs:
        _start_watchdog(args.stall_secs)
    if args.farm:
        results, costs = run_farm(args, seeds, results, costs)
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
            if _check_stop(args):
                return STOP_EXIT_CODE
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


def _supervise(args):
    """Outer recovery loop: run the sweep as a child and auto-resume it.

    The tunneled runtime sporadically swallows a dispatch (observed on ops as
    trivial as an 8x8 reduce); the in-process watchdog then exits 87 with the
    stuck seed's log persisted, but the stale remote claim blocks every fresh
    process for ~25 min.  This loop gates each relaunch on a subprocess chip
    probe so the resume starts the moment the claim expires, not on a human."""
    sys.path.insert(0, os.path.dirname(HERE))
    from mcpilco_tpu.utils.tpu_health import probe_env_window, wait_for_chip

    raw = sys.argv[1:]
    child_argv = []
    skip = False
    for a in raw:  # strip --supervise N / --supervise=N
        if skip:
            skip = False
            continue
        if a == "--supervise":
            skip = True
        elif not a.startswith("--supervise="):
            child_argv.append(a)
    env = dict(os.environ, MCPILCO_SUPERVISED="1")
    for attempt in range(args.supervise + 1):
        argv = child_argv + (["--resume"] if attempt and "--resume" not in child_argv else [])
        print(f"[repeat-supervisor] launch {attempt + 1}/{args.supervise + 1}: "
              f"{' '.join(argv)}", flush=True)
        t0 = time.time()
        rc = subprocess.call([sys.executable, os.path.abspath(__file__)] + argv, env=env)
        child_secs = time.time() - t0
        if rc == 0:
            print("[repeat-supervisor] sweep complete", flush=True)
            return 0
        if rc == STOP_EXIT_CODE:
            print("[repeat-supervisor] sweep stopped via STOP file — "
                  "not relaunching", flush=True)
            return 0
        print(f"[repeat-supervisor] child exited rc={rc} after {child_secs:.0f}s", flush=True)
        # Relaunching only makes sense for stalls (rc 87) and infra deaths
        # that happened after real work started.  A child dying within a
        # minute of launch is a deterministic failure (bad flag, argparse
        # rc=2, broken config, refused auto-resume) — relaunching would just
        # burn N wait_for_chip windows reproducing it.
        if rc != WATCHDOG_EXIT_CODE and child_secs < 60:
            print("[repeat-supervisor] child died immediately with a non-stall "
                  "rc — deterministic failure, not relaunching", flush=True)
            return rc
        if attempt == args.supervise:
            break
        if not wait_for_chip(probe_env_window(), log=lambda *a: print(*a, flush=True)):
            print("[repeat-supervisor] chip never recovered — aborting", flush=True)
            return rc
    print(f"[repeat-supervisor] giving up after {args.supervise + 1} launches (rc={rc})",
          flush=True)
    return rc


def _summary_path(args):
    tag = f"_{args.out_tag}" if args.out_tag else ""
    return f"results_tmp/repeat_{args.scenario}{tag}.json"


def _load_resume(args):
    """Completed seeds from a prior (partial) sweep of the same scenario/tag.
    Infra-errored seeds were excluded from per_seed by _write_summary, so
    they re-run automatically."""
    path = _summary_path(args)
    if not os.path.exists(path):
        return {}, {}
    with open(path) as f:
        prev = json.load(f)
    results = {int(k): bool(v) for k, v in prev.get("per_seed", {}).items()}
    costs = {int(k): prev.get("per_seed_cost", {}).get(k) for k in prev.get("per_seed", {})}
    print(f"[repeat] resume: {len(results)} completed seeds loaded from {path}")
    return results, costs


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
    out = _summary_path(args)
    os.makedirs("results_tmp", exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=1)
    os.replace(tmp, out)
    return summary, out


if __name__ == "__main__":
    raise SystemExit(main())
