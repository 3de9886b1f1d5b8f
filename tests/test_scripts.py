"""Smoke tests of the script tier (scripts/*.py): --help, import, and a
tiny end-to-end run whose artifacts feed the replay and plotting scripts.

The reference ships its scripts with zero automated coverage (SURVEY §4);
a syntax error or stale import in ours must fail CI instead.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(HERE, "scripts")

ALL_SCRIPTS = [
    "train_cartpole.py",
    "train_cartpole_pms.py",
    "train_cartpole_mujoco.py",
    "train_furuta.py",
    "train_ur5.py",
    "apply_policy.py",
    "plot_logs.py",
    "repeat.py",
    "profile_opt.py",
]


def _run(args, timeout=600, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-u"] + args, capture_output=True, text=True,
        timeout=timeout, cwd=cwd or HERE, env=env,
    )


class TestHelp:
    @pytest.mark.parametrize("script", ALL_SCRIPTS)
    def test_help_exits_zero(self, script):
        r = _run([os.path.join(SCRIPTS, script), "--help"], timeout=120)
        assert r.returncode == 0, r.stderr[-800:]
        assert "usage" in r.stdout.lower()


class TestEndToEndArtifacts:
    @pytest.fixture(scope="class")
    def smoke_log_dir(self, tmp_path_factory):
        """One tiny CPU training run shared by the replay/plot tests."""
        log_dir = str(tmp_path_factory.mktemp("script_smoke") / "run1")
        r = _run(
            [os.path.join(SCRIPTS, "train_cartpole.py"), "--seed", "1", "--smoke",
             "--platform", "cpu", "--log-dir", log_dir]
        )
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-800:])
        assert "total wall-clock" in r.stdout
        return log_dir

    def test_train_writes_checkpoints(self, smoke_log_dir):
        stages = os.listdir(smoke_log_dir)
        assert any(s.startswith("policy_trial") for s in stages), stages

    def test_apply_policy_on_model(self, smoke_log_dir):
        ckpt = os.path.join(smoke_log_dir, "complete_trial0")
        if not os.path.isdir(ckpt):
            ckpt = os.path.join(smoke_log_dir, "policy_trial0")
        r = _run(
            [os.path.join(SCRIPTS, "apply_policy.py"), ckpt, "--scenario", "cartpole",
             "--target", "model", "--repeats", "3", "--T", "1.0", "--platform", "cpu"]
        )
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-800:])
        assert "cost" in r.stdout.lower()

    def test_apply_policy_on_system(self, smoke_log_dir):
        ckpt = os.path.join(smoke_log_dir, "complete_trial0")
        if not os.path.isdir(ckpt):
            ckpt = os.path.join(smoke_log_dir, "policy_trial0")
        r = _run(
            [os.path.join(SCRIPTS, "apply_policy.py"), ckpt, "--scenario", "cartpole",
             "--target", "system", "--repeats", "2", "--T", "1.0", "--platform", "cpu"]
        )
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-800:])

    def test_plot_logs(self, smoke_log_dir):
        r = _run([os.path.join(SCRIPTS, "plot_logs.py"), smoke_log_dir], timeout=300)
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-800:])
        pngs = [f for f in os.listdir(smoke_log_dir) if f.endswith(".png")]
        assert pngs, "plot_logs wrote no figures"

    def test_ur5_plateau_rescue_fires_and_recovers(self, tmp_path):
        """Forced plateau (frac=0 makes any positive trial-0 cost 'saturated'):
        the training restarts once with the lengthscale curriculum, reports
        rescue_fired, and completes (scripts/train_ur5.py rescue protocol)."""
        log_dir = str(tmp_path / "ur5")
        r = _run(
            [os.path.join(SCRIPTS, "train_ur5.py"), "--seed", "1", "--smoke",
             "--platform", "cpu", "--log-dir", log_dir,
             "--plateau-rescue-frac", "0.0"],
            timeout=1500,
        )
        assert r.returncode == 0, (r.stdout[-600:], r.stderr[-800:])
        assert "PLATEAU" in r.stdout
        assert "rescue_fired: True" in r.stdout
        # the rescue run trained in its own log dir with the curriculum
        assert os.path.isdir(log_dir + "_rescue")

    def test_repeat_smoke_inprocess(self, tmp_path):
        r = _run(
            [os.path.join(SCRIPTS, "repeat.py"), "--scenario", "cartpole",
             "--num-seeds", "1", "--smoke", "--in-process", "--platform", "cpu"]
        )
        assert r.returncode == 0, (r.stdout[-500:], r.stderr[-800:])
        assert "success_rate" in r.stdout


class TestRepeatInfraClassification:
    """Tunnel/backend crashes are infra events, not task outcomes — they must
    be excluded from the success-rate denominator (a crashed-tunnel sweep once
    recorded a false 0/2)."""

    def _mod(self):
        sys.path.insert(0, SCRIPTS)
        import importlib

        import repeat

        return importlib.reload(repeat)

    def test_markers(self):
        repeat = self._mod()
        assert repeat._is_infra_error(
            "jax.errors.JaxRuntimeError: UNAVAILABLE: TPU worker process "
            "crashed or restarted.")
        assert repeat._is_infra_error(
            "RuntimeError: Unable to initialize backend 'axon'")
        assert not repeat._is_infra_error("success: False\ncumulative cost: 99.2")
        assert not repeat._is_infra_error("ValueError: NaN in posterior")

    def test_completed_runs_are_never_infra(self):
        """A recovered transient (retried DEADLINE_EXCEEDED warning) in a run
        that finished with an outcome must stay in the denominator."""
        repeat = self._mod()
        noisy = "W DEADLINE_EXCEEDED, retrying\nsuccess: True\ncumulative cost: 7.61"
        assert not repeat._classify_infra(noisy, success=True, rc=0)
        assert not repeat._classify_infra(
            "W DEADLINE_EXCEEDED, retrying\nsuccess: False\ncumulative cost: 30.0",
            success=False, rc=0)
        # ... but a run that actually died on the marker IS an infra event
        assert repeat._classify_infra(
            "JaxRuntimeError: UNAVAILABLE: TPU worker process crashed",
            success=False, rc=1)

    def test_parse_cost_uses_full_output(self):
        """The cost line must be found even with later prints after it
        (an early version parsed only the last 500 chars of output)."""
        repeat = self._mod()
        out = "final-trial cumulative cost: 7.6137\n" + "x" * 2000
        assert repeat._parse_cost(out) == 7.6137
        assert repeat._parse_cost("no cost here") is None

    def test_extra_flag_value_splitting(self):
        """--extra-flag=--delta-cap=2.0 must reach the child argv as the
        two tokens argparse expects (['--delta-cap', '2.0'])."""
        flag = "--delta-cap=2.0"
        toks = flag.split("=", 1) if flag.startswith("--") and "=" in flag else [flag]
        assert toks == ["--delta-cap", "2.0"]

    def test_tagged_log_dirs_do_not_collide(self):
        repeat = self._mod()
        import tempfile, os as _os
        with tempfile.TemporaryDirectory() as d:
            cwd = _os.getcwd()
            try:
                _os.chdir(d)
                repeat._save_seed_log("mj", 3, "arm A")
                repeat._save_seed_log("mj", 3, "arm B", tag="cap2")
                a = open("results_tmp/mj_3/stdout.log").read()
                b = open("results_tmp/mj_cap2_3/stdout.log").read()
                assert (a, b) == ("arm A", "arm B")
            finally:
                _os.chdir(cwd)


class TestRepeatResumeAndWatchdog:
    """Crash recovery: --resume skips completed seeds; the in-process
    watchdog hard-exits (code 87) when the running seed stops producing
    output — a futex-stuck tunneled-TPU call cannot be interrupted any
    other way (observed: 72 min of silence on a MuJoCo restarts sweep)."""

    def _mod(self):
        sys.path.insert(0, SCRIPTS)
        import importlib

        import repeat

        return importlib.reload(repeat)

    def test_load_resume_skips_completed_seeds(self, tmp_path):
        repeat = self._mod()
        import argparse as ap
        import json as _json
        import os as _os

        cwd = _os.getcwd()
        try:
            _os.chdir(tmp_path)
            args = ap.Namespace(scenario="mj", out_tag="r3")
            _os.makedirs("results_tmp")
            with open("results_tmp/repeat_mj_r3.json", "w") as f:
                _json.dump({"per_seed": {"1": True, "3": False},
                            "per_seed_cost": {"1": 8.0, "3": 30.0},
                            "infra_error_seeds": [2]}, f)
            results, costs = repeat._load_resume(args)
            assert results == {1: True, 3: False}
            assert costs == {1: 8.0, 3: 30.0}
            # infra seed 2 was excluded from per_seed -> re-runs
            seeds = [s for s in [1, 2, 3, 4] if s not in results]
            assert seeds == [2, 4]
            # no summary yet -> empty resume state
            args2 = ap.Namespace(scenario="other", out_tag="")
            assert repeat._load_resume(args2) == ({}, {})
        finally:
            _os.chdir(cwd)

    def test_stop_file_consumed_at_boundary(self, tmp_path):
        """Graceful stop: a STOP file makes the sweep exit at the next seed
        boundary (host-side, never mid-device-execution) and is consumed so
        the next launch runs normally."""
        repeat = self._mod()
        import argparse as ap
        import os as _os

        cwd = _os.getcwd()
        try:
            _os.chdir(tmp_path)
            args = ap.Namespace(scenario="mj", out_tag="r4")
            assert repeat._check_stop(args) is False
            _os.makedirs("results_tmp")
            open(repeat._stop_path(args), "w").close()
            assert repeat._check_stop(args) is True
            assert not _os.path.exists(repeat._stop_path(args))  # consumed
            assert repeat._check_stop(args) is False
        finally:
            _os.chdir(cwd)

    def test_stop_file_exits_86_before_any_seed(self, tmp_path):
        """End-to-end: a pre-existing STOP file stops the sweep with the
        distinct exit code before any seed runs."""
        import os as _os

        _os.makedirs(tmp_path / "results_tmp", exist_ok=True)
        open(tmp_path / "results_tmp" / "repeat_cartpole.STOP", "w").close()
        r = _run(
            [os.path.join(SCRIPTS, "repeat.py"), "--scenario", "cartpole",
             "--num-seeds", "1", "--smoke", "--in-process", "--platform", "cpu"],
            cwd=str(tmp_path),
        )
        assert r.returncode == 86, (r.stdout[-500:], r.stderr[-500:])
        assert "STOP file" in r.stdout
        assert "success_rate" not in r.stdout  # no seed ran

    def test_watchdog_kills_stalled_process(self):
        """End-to-end in a subprocess: a buffer that never grows must get the
        process killed with WATCHDOG_EXIT_CODE and the partial log saved."""
        code = """
import io, os, sys, time
sys.path.insert(0, %r)
import repeat
os.chdir(%r)
buf = io.StringIO()
buf.write("partial output before the hang")
repeat._WATCH.update(buf=buf, buf_id=id(buf), pos=buf.tell(), t=time.time(),
                     seed=7, scenario="mj", tag="wd")
repeat._start_watchdog(stall_secs=1)
time.sleep(30)  # simulated stuck device call; watchdog must fire first
"""
        import subprocess as sp
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            r = sp.run([sys.executable, "-c", code % (SCRIPTS, d)],
                       capture_output=True, text=True, timeout=25)
            assert r.returncode == 87, (r.returncode, r.stderr[-500:])
            assert "WATCHDOG" in r.stderr
            log = open(os.path.join(d, "results_tmp/mj_wd_7/stdout.log")).read()
            assert "partial output before the hang" in log
            assert "WATCHDOG" in log

    def test_watchdog_heartbeat_keeps_process_alive(self):
        """A buffer that keeps growing must NOT trip the watchdog."""
        code = """
import io, sys, time
sys.path.insert(0, %r)
import repeat
buf = io.StringIO()
repeat._WATCH.update(buf=buf, buf_id=id(buf), pos=-1, t=time.time(),
                     seed=1, scenario="mj", tag="")
repeat._start_watchdog(stall_secs=2)
for _ in range(8):
    buf.write("heartbeat")
    time.sleep(0.5)
print("survived")
"""
        import subprocess as sp

        r = sp.run([sys.executable, "-c", code % (SCRIPTS,)],
                   capture_output=True, text=True, timeout=25)
        assert r.returncode == 0, (r.returncode, r.stderr[-500:])
        assert "survived" in r.stdout


class TestSummarizeResults:
    """summarize_results merges split seed ranges but keeps A/B arms apart."""

    def _mod(self):
        sys.path.insert(0, SCRIPTS)
        import importlib

        import summarize_results

        return importlib.reload(summarize_results)

    def test_merge_ranges_and_separate_arms(self, tmp_path):
        sr = self._mod()
        import json as _json

        def w(name, rec):
            p = tmp_path / name
            p.write_text(_json.dumps(rec))
            return str(p)

        files = [
            w("repeat_mj_a.json", {"scenario": "mj", "per_seed": {"1": True},
                                   "per_seed_cost": {"1": 8.0}}),
            w("repeat_mj_b.json", {"scenario": "mj",
                                   "per_seed": {"1": False, "2": True},
                                   "per_seed_cost": {"1": 30.0, "2": 9.0}}),
            w("repeat_mj_cap2.json", {"scenario": "mj", "tag": "cap2",
                                      "extra_flags": ["--delta-cap=2.0"],
                                      "per_seed": {"1": True},
                                      "per_seed_cost": {"1": 7.0}}),
        ]
        runs = sr.merge(files)
        assert set(runs) == {("mj", ""), ("mj", "--delta-cap=2.0")}
        # later file wins the per-seed collision; ranges merge
        canonical = runs[("mj", "")]
        assert canonical["per_seed"] == {"1": False, "2": True}
        # legacy artifacts without the json fields fall back to the
        # filename marker table
        legacy = w("repeat_mj_legacyvar.json",
                   {"scenario": "mj", "per_seed": {"3": True},
                    "per_seed_cost": {"3": 11.0}})
        assert sr.arm_label(legacy, _json.loads(open(legacy).read())) \
            == "MCPILCO_LEGACY_VAR=1"


class TestTpuHealth:
    """wait_for_chip: the chip-readiness gate bench.py and the sweep
    supervisor share (utils/tpu_health.py).

    Probes run with a hermetic env (no PALLAS_AXON_POOL_IPS): with it set,
    the axon sitecustomize claims the chip at interpreter start, so these
    unit probes would block on whichever real sweep holds the chip."""

    @staticmethod
    def _env():
        env = {k: v for k, v in os.environ.items()
               if k != "PALLAS_AXON_POOL_IPS"}
        env["JAX_PLATFORMS"] = "cpu"
        return env

    def test_succeeds_on_healthy_probe(self):
        from mcpilco_tpu.utils.tpu_health import wait_for_chip

        msgs = []
        ok = wait_for_chip(window_s=30, probe_s=20, log=msgs.append,
                           probe_code="print('pong')", env=self._env())
        assert ok
        assert any("chip ok" in m for m in msgs)

    def test_gives_up_after_window(self):
        from mcpilco_tpu.utils.tpu_health import wait_for_chip

        msgs = []
        ok = wait_for_chip(window_s=0.5, probe_s=5, log=msgs.append,
                           probe_code="raise SystemExit(7)", env=self._env())
        assert not ok
        assert any("rc=7" in m for m in msgs)
        assert any("giving up" in m.lower() for m in msgs)

    def test_hung_probe_is_killed_not_waited(self):
        import time

        from mcpilco_tpu.utils.tpu_health import wait_for_chip

        msgs = []
        t0 = time.time()
        ok = wait_for_chip(window_s=1.0, probe_s=1.0, log=msgs.append,
                           probe_code="import time; time.sleep(60)",
                           env=self._env())
        assert not ok
        assert time.time() - t0 < 30  # killed the probe, not waited out 60s
        assert any("hung" in m for m in msgs)
