"""Chip-readiness gate for the tunneled single-chip TPU runtime.

The chip is claimed per-process; two failure modes make a FRESH process hang
indefinitely on its first device interaction (measured, RESULTS.md round 3/4):

1. a client killed mid-device-execution leaves the remote claim stale for
   ~25 min;
2. a client whose dispatch stalls client-side (a lost tunnel RPC — observed
   on a trivial 8x8 reduce) HOLDS the claim while stuck, so every other
   process blocks until that client dies and its claim expires.

Probing in a SUBPROCESS is safe to time out and kill: a process stuck
*waiting* for the claim does not hold it (verified: killing one does not
extend the outage).  ``wait_for_chip`` retries such probes inside a bounded
window sized past the observed claim expiry, so callers (bench.py, the
repeat.py sweep supervisor) are delayed by an outage instead of killed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

# a real (small) device execution, not just backend registration —
# jax.devices() can succeed while executions still hang.  The probe prints
# stage markers so a timed-out probe's partial stdout tells WAITING (no
# marker: safe to kill) apart from EXECUTING (killing one of those is the
# documented wedge trigger — the log line lets the operator see which).
_PROBE_CODE = (
    "import sys, jax, jax.numpy as jnp; "
    "print('backend-up', flush=True); "
    "print(float(jnp.ones((8, 8)).sum()))"
)


def wait_for_chip(
    window_s: float = 2100.0,
    probe_s: float = 270.0,
    log=print,
    probe_code: str = _PROBE_CODE,
    env: dict | None = None,
) -> bool:
    """Block until a subprocess can run a trivial device execution.

    Returns True when the chip answered, False when the window expired.
    ``window_s`` defaults past the ~25-min stale-claim expiry; ``probe_s``
    bounds each probe.  HEALTHY probes measure 92-117 s end-to-end on the
    tunneled runtime (interpreter + backend bring-up dominates, not the op),
    so the bound must sit well above that: a probe killed after it reached
    the device is itself the wedge trigger.  Timed-out probes log whether
    they were still waiting for the claim (safe kill) or mid-execution.  ``env`` overrides the probe subprocess environment —
    the tunneled runtime's sitecustomize claims the chip at interpreter start
    when ``PALLAS_AXON_POOL_IPS`` is set, so hermetic callers (unit tests)
    must strip it or their probe blocks on whoever holds the chip.
    """
    if window_s <= 0:
        return True
    deadline = time.time() + window_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_code],
                timeout=probe_s, capture_output=True, text=True, env=env,
            )
            if r.returncode == 0:
                log(f"[tpu-health] chip ok (attempt {attempt}, {time.time() - t0:.0f}s)")
                return True
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
            log(f"[tpu-health] probe attempt {attempt} rc={r.returncode}: {tail[0]}")
        except subprocess.TimeoutExpired as e:
            out = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            stage = "mid-execution" if "backend-up" in out else "waiting for the claim"
            log(f"[tpu-health] probe attempt {attempt} hung >{probe_s:.0f}s "
                f"({stage}) — probe killed, waiting for expiry")
        remaining = deadline - time.time()
        if remaining <= 0:
            log(f"[tpu-health] chip unreachable for {window_s:.0f}s — giving up")
            return False
        time.sleep(min(60.0, remaining))


def probe_env_window() -> float:
    """Window override from the environment (shared by bench + sweeps)."""
    return float(os.environ.get("MCPILCO_CHIP_WAIT_S", "2100"))
