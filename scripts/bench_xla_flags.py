#!/usr/bin/env python
"""A/B the headline bench under candidate XLA TPU flag sets.

The round-2 step profile (RESULTS.md "Policy-opt step profile") named the
remaining headroom: per-scan-step fusion overhead round-tripping small [P,M]
intermediates, neither MXU- nor HBM-bound.  Two code-level attacks (a fully
fused Pallas step, scan unrolling) lost and were recorded as negatives; this
script tries the compiler-level knobs instead — scheduler and scoped-VMEM
flags change how XLA overlaps and sizes those per-step fusions without
touching program semantics.

Runs bench.py in a fresh subprocess per flag set (XLA_FLAGS is read at
backend init, so it cannot be A/B'd in-process) and writes
results/bench_xla_flags_r{N}.json.  Unknown/rejected flags fail that arm
only; the arm is recorded with its error.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CONFIGS = {
    "baseline": "",
    # overlap scalar/VPU work with MXU work across the scan's small fusions
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # double the scoped-VMEM budget: lets XLA keep bigger [P,M] intermediates
    # in VMEM across fusion boundaries instead of round-tripping HBM
    "scoped_vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "lhs_plus_vmem": (
        "--xla_tpu_enable_latency_hiding_scheduler=true "
        "--xla_tpu_scoped_vmem_limit_kib=32768"
    ),
}


def _write(out_path, results):
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "results", "bench_xla_flags_r3.json")
    results = {}
    for name, flags in CONFIGS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["MCPILCO_BENCH_SKIP_FAST_PRNG"] = "1"
        print(f"[xla-ab] {name}: XLA_FLAGS={env['XLA_FLAGS']!r}", flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.join(REPO, "bench.py")],
                capture_output=True, text=True, env=env, timeout=1800, cwd=REPO,
            )
        except subprocess.TimeoutExpired as e:
            results[name] = {"flags": flags, "error": f"timeout after {e.timeout}s"}
            print(f"[xla-ab] {name}: TIMEOUT", flush=True)
            _write(out_path, results)
            continue
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            rec = json.loads(line)
            results[name] = {"flags": flags, "ms_per_step": rec["value"],
                             "vs_baseline_ref": rec["vs_baseline"]}
            print(f"[xla-ab] {name}: {rec['value']} ms/step", flush=True)
        except (json.JSONDecodeError, KeyError):
            results[name] = {"flags": flags, "error": r.stderr[-800:]}
            print(f"[xla-ab] {name}: FAILED rc={r.returncode}", flush=True)
        _write(out_path, results)  # incremental: a later crash keeps earlier arms
    _write(out_path, results)
    print(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
