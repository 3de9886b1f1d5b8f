"""Policy optimization: the whole inner loop as one compiled program.

The reference's ``reinforce_policy`` (MC_PILCO.py:375-613) is a Python loop of
2000-5000 iterations, each doing a particle rollout, a BPTT backward pass, an
Adam step, an exponential-smoothing convergence monitor, and learning-rate /
dropout / early-exit logic, with a NaN guard that re-initializes the policy.

Here ALL of it — including the control logic — lives inside a single jitted
``lax.while_loop``:

- no host round-trip per step (the reference syncs every iteration),
- true early exit (the loop predicate includes the convergence flag),
- learning rate, dropout and step budget are *dynamic* scalars, so changing
  them between trials never re-compiles,
- the NaN guard re-samples once with fresh noise and, if the cost is still
  NaN, re-initializes the policy + optimizer in-graph
  (reference: resample up to 10x then reinit — MC_PILCO.py:482-501, 572-607;
  the step budget here is global rather than reset on reinit, which bounds
  total work).

Convergence monitor parity (MC_PILCO.py:507-519, 543-567):

    ES1 <- a*ES1 + (1-a)(c_t - c_{t-1})
    ES2 <- a*(ES2 + (1-a)(c_t - c_{t-1} - ES1_prev)^2)
    dcr <- a*dcr + (1-a) ES1/sqrt(ES2)
    plateau when |dcr| < thr for num_min_diff_cost consecutive steps after
    min_step: halve lr (>= lr_min), thr <- max(thr/2, 0.01), reduce dropout,
    reset Adam moments; at lr_min, stop.

(The reference tests a window of the last n_s values; since a reduction also
pushes the re-check gate n_s steps out, a consecutive-below counter that
resets on reduction is equivalent.)
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.costs import CostBase
from ..parallel import mesh as mesh_mod
from ..utils import prng
from .rollout import InitialStateDistribution, RolloutEngine


# ---------------------------------------------------------------- Adam
# Manual functional Adam (semantics of torch.optim.Adam, which the reference
# builds via eval'd lambda strings — MC_PILCO.py:467, test_mcpilco_cartpole.py:208).
# Implemented by hand (not optax) so the moments can be reset and the lr can
# change inside the compiled while_loop without re-initializing a transform.


class AdamState(NamedTuple):
    m: object
    v: object
    count: jax.Array


def adam_init(params) -> AdamState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(m=z, v=jax.tree_util.tree_map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, lr, b1=0.9, b2=0.999, eps=1e-8):
    count = state.count + 1
    t = count.astype(jnp.float32)
    m = jax.tree_util.tree_map(lambda mm, g: b1 * mm + (1 - b1) * g, state.m, grads)
    v = jax.tree_util.tree_map(lambda vv, g: b2 * vv + (1 - b2) * g * g, state.v, grads)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    new_params = jax.tree_util.tree_map(
        lambda p, mm, vv: p - lr * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps), params, m, v
    )
    return new_params, AdamState(m=m, v=v, count=count)


# ---------------------------------------------------------------- optimizer


class OptResult(NamedTuple):
    policy_params: object
    cost_history: jax.Array  # [max_opt_steps]; entries past steps_done are 0
    std_history: jax.Array
    steps_done: jax.Array
    states: jax.Array  # last rollout [T, P, ds]
    inputs: jax.Array  # last rollout [T, P, du]
    reinit_count: jax.Array
    final_lr: jax.Array
    final_p_dropout: jax.Array
    # per-restart best in-model costs ([num_restarts]) when num_restarts > 1,
    # else None; every other field is already the winning restart's
    restart_costs: Optional[jax.Array] = None
    restart_winner: Optional[jax.Array] = None


class _Carry(NamedTuple):
    step: jax.Array
    done: jax.Array
    params: object
    adam: AdamState
    lr: jax.Array
    p_drop: jax.Array
    thr: jax.Array
    gate_step: jax.Array
    consec: jax.Array
    es1: jax.Array
    es2: jax.Array
    dcr: jax.Array
    cost_prev: jax.Array
    reinit_count: jax.Array
    retry: jax.Array  # consecutive NaN re-samples at the current step
    iters: jax.Array  # TOTAL loop iterations (opt steps + NaN retries)
    cost_hist: jax.Array
    std_hist: jax.Array
    states: jax.Array
    inputs: jax.Array
    lr0: jax.Array
    p_dropout0: jax.Array
    best_cost: jax.Array
    best_params: object
    rid: jax.Array  # restart lane id; 0 on the single-restart path


@dataclasses.dataclass(frozen=True)
class PolicyOptimizer:
    """Static config of the policy-gradient optimizer (the
    policy_optimization_dict analog, test_mcpilco_cartpole.py:198-217)."""

    engine: RolloutEngine
    cost: CostBase
    init_dist: InitialStateDistribution
    num_particles: int
    horizon: int
    max_opt_steps: int
    alpha_diff_cost: float = 0.99
    min_diff_cost: float = 0.1
    num_min_diff_cost: int = 200
    min_step: float = float("inf")
    lr_reduction_ratio: float = 0.5
    lr_min: float = 0.001
    p_drop_reduction: float = 0.0
    thr_floor: float = 0.01
    # Global-norm gradient clipping.  BPTT through the closed loop of learned
    # GP dynamics + policy (+ the 4PMS sensor chain, whose finite-difference
    # velocity estimate multiplies position signals by 1/dt) can produce
    # exploding per-realization gradients — measured up to 1e5x the typical
    # norm on TPU for the 4PMS cartpole at horizon 90 while the cost stays
    # finite.  Clipping bounds the damage of those spikes; typical healthy
    # norms in the shipped scenarios are O(10).
    grad_clip_norm: float = 100.0
    # host-driven chunking of the compiled loop (see optimize docstring).
    # chunk_steps is the FIRST chunk's budget; when chunk_target_s is set,
    # later chunks adapt to the measured step throughput so each device
    # execution stays near the target wall time regardless of dataset size,
    # horizon, or farm batch (tunneled TPU runtimes crash on uninterrupted
    # executions past ~1 min — measured on UR5 and on a furuta seed farm
    # whose per-step cost tripled as the dataset grew across trials).
    chunk_steps: int = 500
    chunk_target_s: float = 15.0
    # Hard per-chunk ITERATION budget, as a multiple of the chunk's step
    # budget.  A NaN-retry storm makes one opt step cost up to
    # max_nan_retries+1 loop iterations, so a chunk sized for chunk_target_s
    # of healthy throughput could otherwise run ~11x longer inside a single
    # uninterrupted device execution — past the tunneled runtime's ~1 min
    # crash threshold (the UR5 seeds-2/3 failure mode).  When the cap fires
    # the chunk returns early to the host, which re-measures throughput and
    # continues; nothing is lost but one extra dispatch.
    chunk_iter_slack: float = 2.0
    # return the best-cost iterate instead of the last one: under noisy or
    # clipped gradients late trials can drift upward after converging, and
    # snapshotting the best params makes that drift harmless
    keep_best: bool = True
    # consecutive fresh-noise re-samples of a NaN rollout before a full
    # policy re-init, matching the reference's inner retry loop
    # (MC_PILCO.py:480-501)
    max_nan_retries: int = 10
    # How the NaN-retry/reinit paths merge into the loop carry:
    #  * "cond" (default): the healthy carry update runs inside lax.cond, so
    #    the common no-NaN step pays zero select/merge traffic when the loop
    #    is not vmapped (the single-seed production path — this recovers the
    #    ~0.4 ms/step the round-3 computed-merge restructure cost it).  Under
    #    the seed farm's vmap the cond lowers to a select over both branches,
    #    but both branches are carry-sized shuffles: the ROLLOUT stays
    #    outside the cond (the round-3 farm lesson — a rollout-sized cond
    #    branch cost 2.7x per seed).
    #  * "where": the round-3 computed-merge structure, kept as A/B control.
    #  * "off": NO NaN protection at all — the body is the bare healthy-step
    #    update.  Measurement ablation ONLY (scripts/bench_attrib.py uses it
    #    to price the guard structure on the real chip); a NaN rollout
    #    poisons the run irrecoverably, so never ship a config with it.
    # The two real styles keep the exact same key/retry/reinit schedule;
    # carries agree to f32 XLA-refusion noise (~1 ulp/step — the cond
    # boundary changes fusion), tested in tests/test_rollout_trainer.py
    # ("off" matches them bit-for-bit on NaN-free runs, same test).
    nan_branch_style: str = "cond"
    # Multi-restart policy optimization (beyond-parity; the reference always
    # optimizes a single policy init).  R > 1 vmaps R independent lanes of
    # the SAME compiled loop over a leading restart axis: lane 0 starts from
    # the incoming params with the exact single-restart key schedule (so
    # R = 1 results are a strict slice of any R), lanes 1..R-1 start from
    # policy.reinit draws with lane-distinct rollout noise streams; the
    # winner is the lane with the best in-model cost.
    # Motivation: the failing MuJoCo/furuta seeds are OPTIMIZATION failures
    # (the optimizer converges to a no-swing-up local optimum in its own
    # model — scripts/analyze_mujoco_failures.py), and restarts attack
    # exactly that.  VMEM note: R multiplies the rollout working set like
    # the seed farm's batch axis; R <= 4 at flagship sizes (profile_farm_r3).
    num_restarts: int = 1
    # How restart lanes execute:
    #  * True (default): all R lanes inside ONE compiled program (vmapped
    #    leading axis) — maximum device utilization, and the form the
    #    ('r', 'p') mesh shards.
    #  * False: R sequential single-lane optimizations reusing the SAME
    #    compiled R=1 chunk program (zero extra compiles), winner by the
    #    same best-cost argmin.  Each lane folds its id into the key stream
    #    exactly like its vmapped counterpart, so the two modes sample the
    #    same lanes (modulo f32 refusion).  This is the operational fallback
    #    for the tunneled-TPU stall on the R=4 vmapped MuJoCo trial-2
    #    program (round 3+4: 3/3 deterministic hangs in that program's
    #    first chunk, while the same checkpoint + program runs fine on CPU
    #    and every R=1 program runs fine on the TPU).
    restart_vmap: bool = True
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # Optional jax.sharding.Mesh with a particle axis (parallel/mesh.py).
    # When set, every rollout inside the compiled while_loop shards the
    # particle batch across the mesh (pure data parallelism: particles are
    # independent given policy + posterior); parameters and the posterior
    # cache replicate, and XLA emits the cost-mean / policy-gradient psums
    # over ICI from the sharding constraints.  None = single device.
    # With num_restarts > 1, a 2D ("r", "p") mesh
    # (parallel.mesh.make_restart_particle_mesh) additionally shards the
    # restart lanes: independent optimizations per lane, zero cross-lane
    # traffic until the final winner argmin.
    # (The reference has no distributed backend at all — SURVEY §2.6.)
    mesh: Optional[object] = None

    # ------------------------------------------------------------------

    def _rollout_cost(self, params, gp_params, posterior, key, p_drop, trial_index):
        s0 = self.init_dist.sample(
            prng.stream(key, prng.STREAM_INIT_PARTICLES), self.num_particles
        )
        if self.mesh is not None:
            # one constraint on the scan's initial carry is enough: the
            # particle axis is preserved by every step, so XLA propagates
            # the sharding through the whole rollout + BPTT
            s0 = mesh_mod.shard_particles(self.mesh, s0)
        res = self.engine.simulate(
            key, params, gp_params, posterior, s0, self.horizon, p_dropout=p_drop
        )
        c, s = self.cost(res.states, res.inputs, trial_index)
        return c, (s, res.states, res.inputs)

    def _first_chunk_budget(self, lanes: int) -> int:
        """Step budget for the first chunk of an optimize() call.

        ``chunk_steps`` is calibrated for a single restart lane; R lanes
        multiply per-step device time ~R-fold, and an oversized first chunk
        is exactly the uninterrupted >1 min device execution that hangs
        tunneled TPU runtimes (observed: a MuJoCo restarts=4 sweep
        futex-hung in its trial-2 first chunk).  Later trials also run
        slower as the dataset grows, so when a previous optimize() on this
        instance measured a throughput, start from that instead of the
        static default — the stored rate is stale by at most one trial's
        dataset growth (<2x), far inside the safety margin."""
        budget = max(25, self.chunk_steps // max(lanes, 1))
        last_rate = getattr(self, "_measured_rate", None)
        if self.chunk_target_s and last_rate:
            budget = min(budget, max(25, int(self.chunk_target_s * last_rate)))
        return budget

    def optimize(
        self,
        key: jax.Array,
        policy_params,
        gp_params,
        posterior,
        num_opt_steps,
        lr0,
        p_dropout0,
        trial_index=0,
    ) -> OptResult:
        """Run up to ``num_opt_steps`` (<= max_opt_steps) Adam steps.

        The compiled while_loop executes in host-driven chunks of
        ``chunk_steps``: one uninterrupted device execution of a long-horizon
        config can run for minutes, which trips RPC deadlines on tunneled
        TPU runtimes (observed as `TPU worker crashed` on the 200-step-horizon
        UR5 program).  The carry stays on device between chunks, so the only
        per-chunk host cost is a scalar `done` readback.
        """
        num_steps = int(min(int(num_opt_steps), self.max_opt_steps))
        multi = self.num_restarts > 1
        if self.mesh is not None and mesh_mod.RESTART_AXIS in self.mesh.axis_names:
            r_shards = self.mesh.shape[mesh_mod.RESTART_AXIS]
            if not multi:
                raise ValueError(
                    "mesh has a restart axis 'r' but num_restarts == 1; use a "
                    "plain particle mesh (parallel.mesh.make_mesh) instead"
                )
            if self.num_restarts % r_shards:
                raise ValueError(
                    f"num_restarts={self.num_restarts} does not tile the "
                    f"mesh's restart axis ({r_shards} shards)"
                )
            if not self.restart_vmap:
                raise ValueError(
                    "restart_vmap=False (sequential lanes) cannot shard a "
                    "restart mesh axis; drop the 'r' axis or keep restart_vmap"
                )
        if multi:
            # lane 0 = the incoming params (exact single-restart schedule);
            # lanes 1..R-1 = fresh reinit draws from a dedicated key stream
            rkeys = jax.random.split(
                prng.fold(key, prng.STREAM_RESTARTS), self.num_restarts - 1
            )
            inits = [policy_params] + [
                self.engine.policy.reinit(policy_params, k) for k in rkeys
            ]
            if not self.restart_vmap:
                carries = []
                for r, p0 in enumerate(inits):
                    c = self._optimize_init(
                        key, p0, gp_params, posterior, lr0, p_dropout0,
                        trial_index, jnp.asarray(r, jnp.int32),
                    )
                    carries.append(self._drive_chunks(
                        c, key, gp_params, posterior, num_steps, trial_index,
                        multi=False, lanes=1,
                    ))
                metric = jnp.stack([
                    c.best_cost if self.keep_best else c.cost_prev for c in carries
                ])
                winner = jnp.argmin(jnp.where(jnp.isfinite(metric), metric, jnp.inf))
                return self._result(carries[int(winner)], metric, winner)
            params_r = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *inits)
            carry = self._optimize_init_multi(
                key, params_r, gp_params, posterior, lr0, p_dropout0, trial_index
            )
        else:
            carry = self._optimize_init(
                key, policy_params, gp_params, posterior, lr0, p_dropout0,
                trial_index, jnp.zeros((), jnp.int32),
            )
        carry = self._drive_chunks(
            carry, key, gp_params, posterior, num_steps, trial_index,
            multi=multi, lanes=self.num_restarts,
        )
        restart_costs = winner = None
        if multi:
            metric = carry.best_cost if self.keep_best else carry.cost_prev
            restart_costs = metric
            winner = jnp.argmin(jnp.where(jnp.isfinite(metric), metric, jnp.inf))
            carry = jax.tree_util.tree_map(lambda l: l[winner], carry)
        return self._result(carry, restart_costs, winner)

    # process-level flag: has ANY optimize() chunk 0 completed yet?  The
    # first call of a process may genuinely compile for tens of minutes
    # (fresh cache, new program shape); after one completion the persistent
    # jit cache is warm and later chunk-0 silences are far more likely the
    # known deterministic first-chunk hang, so the heartbeat budget shrinks
    # and the stall watchdog detects it in ~minutes instead of ~an hour
    # (ADVICE r4).  Class attribute, not a field: the dataclass is frozen
    # and jit-keyed by value-hash.
    _chunk0_completed_in_process = False

    @staticmethod
    def _heartbeat(label: str, every_s: float = 120.0, budget_s: Optional[float] = None):
        """Emit liveness lines while a blocking device call is in flight.

        Output-based stall watchdogs (scripts/repeat.py) cannot distinguish
        "first chunk of a new program shape is compiling on the device" from
        "the dispatch hung": both are silence at the Python level.  Observed
        on the UR5 trial-0 policy opt (rounds 3-4): its first chunk exceeds
        every reasonable stall window, so the watchdog repeatedly killed the
        client mid-call — which wedges tunneled TPU runtimes for ~25 min.
        A daemon thread printing a bounded heartbeat keeps the watchdog fed
        through legitimate compiles; after ``budget_s`` it goes silent so a
        truly hung call is still detected and killed.  Default budget: 2700 s
        for the first optimize() of the process (cold cache), 600 s once any
        chunk 0 has completed (warm cache — bucket-size recompiles are much
        shorter than cold compiles); override with MCPILCO_HEARTBEAT_BUDGET.
        Returns a stop() callable."""
        if budget_s is None:
            env = os.environ.get("MCPILCO_HEARTBEAT_BUDGET")
            if env is not None:
                budget_s = float(env)
            else:
                budget_s = 600.0 if PolicyOptimizer._chunk0_completed_in_process else 2700.0
        stop_evt = threading.Event()
        t0 = time.perf_counter()

        def beat():
            while not stop_evt.wait(every_s):
                elapsed = time.perf_counter() - t0
                if elapsed > budget_s:
                    return
                print(
                    f"[trainer] {label}: device call in flight {int(elapsed)}s "
                    "(first-chunk compile can take minutes)",
                    flush=True,
                )

        threading.Thread(target=beat, daemon=True, name="chunk-heartbeat").start()
        return stop_evt.set

    def _drive_chunks(
        self, carry, key, gp_params, posterior, num_steps, trial_index, *, multi, lanes
    ) -> "_Carry":
        """Host-driven chunked execution of the compiled loop (see optimize)."""
        chunk_sz = self._first_chunk_budget(lanes)
        # the carry comes straight from _optimize_init, whose step counter is
        # zero by construction — reading it back here would cost a device
        # sync (a full RPC round-trip on tunneled runtimes) per optimize()
        step_now = 0
        chunk_index = 0
        while step_now < num_steps:
            end = min(step_now + chunk_sz, num_steps)
            # hard iteration cap: bounds the execution time of a chunk whose
            # steps degenerate into NaN-retry loops (see chunk_iter_slack)
            iter_end = carry.iters + jnp.int32(
                int(self.chunk_iter_slack * (end - step_now)) + 64
            )
            t0 = time.perf_counter()
            step_fn = self._optimize_chunk_multi if multi else self._optimize_chunk
            stop_beat = (
                self._heartbeat(f"optimize chunk 0 (trial {trial_index})")
                if chunk_index == 0 else None
            )
            try:
                carry = step_fn(
                    carry, key, gp_params, posterior, jnp.int32(end), iter_end, trial_index
                )
                done = bool(jnp.all(carry.done))  # device sync; times the chunk
            finally:
                if stop_beat is not None:
                    stop_beat()
            if chunk_index == 0:
                PolicyOptimizer._chunk0_completed_in_process = True
            if done:
                break
            new_step = int(jnp.min(carry.step))
            if self.chunk_target_s:
                # Adapt the next chunk to the measured throughput (steps
                # actually ADVANCED, so retry storms shrink the next chunk).
                # The first chunk of a new shape includes compile time, which
                # biases the rate low — the safe direction; the following
                # chunk corrects.
                rate = max(new_step - step_now, 1) / max(time.perf_counter() - t0, 1e-6)
                chunk_sz = max(25, int(self.chunk_target_s * rate))
                # Remembered across optimize() calls (frozen dataclass: not a
                # field, so jit keying by value-hash is unaffected).  The
                # FIRST chunk of a call is never stored: it may include a
                # fresh compile (20-40s), and a compile-poisoned rate shrinks
                # the NEXT call's first chunk to the 25-step floor, splitting
                # short runs into extra tunneled host round-trips (~0.4
                # ms/step on bench.py's 300-step capture).  Within-call
                # adaptation still uses it — biased low is the safe direction.
                if chunk_index > 0:
                    object.__setattr__(self, "_measured_rate", rate)
            step_now = new_step
            chunk_index += 1
        return carry

    def _result(self, carry: "_Carry", restart_costs, winner) -> OptResult:
        return OptResult(
            restart_costs=restart_costs,
            restart_winner=winner,
            policy_params=jax.tree_util.tree_map(
                lambda b, l: jnp.where(jnp.isfinite(carry.best_cost), b, l),
                carry.best_params, carry.params,
            ) if self.keep_best else carry.params,
            cost_history=carry.cost_hist,
            std_history=carry.std_hist,
            steps_done=carry.step,
            states=carry.states,
            inputs=carry.inputs,
            reinit_count=carry.reinit_count,
            final_lr=carry.lr,
            final_p_dropout=carry.p_drop,
        )

    @partial(jax.jit, static_argnums=0)
    def _optimize_init_multi(
        self, key, params_r, gp_params, posterior, lr0, p_dropout0, trial_index
    ) -> "_Carry":
        """Vmapped `_optimize_init` over a leading restart axis of the params
        (each lane folds its id into the rollout key stream; lane 0's stream
        is bit-identical to the single-restart schedule)."""
        rids = jnp.arange(self.num_restarts, dtype=jnp.int32)
        carry = jax.vmap(
            self._optimize_init, in_axes=(None, 0, None, None, None, None, None, 0)
        )(key, params_r, gp_params, posterior, lr0, p_dropout0, trial_index, rids)
        return self._shard_restart_carry(carry)

    def _shard_restart_carry(self, carry):
        """On a 2D ('r', 'p') mesh, pin the carry's leading (restart-lane)
        axis onto ``"r"``: lanes are independent optimizations, so sharding
        them is pure data parallelism with zero cross-lane traffic until the
        final winner argmin.  No-op on a plain particle mesh (lanes
        replicate; particles still shard from the in-rollout constraint)."""
        if self.mesh is None or mesh_mod.RESTART_AXIS not in self.mesh.axis_names:
            return carry
        return jax.tree_util.tree_map(
            lambda x: mesh_mod.shard_restarts(self.mesh, x), carry
        )

    @partial(jax.jit, static_argnums=0)
    def _optimize_chunk_multi(
        self, carry, key, gp_params, posterior, chunk_end, iter_end, trial_index
    ) -> "_Carry":
        """Vmapped `_optimize_chunk`: lanes advance in lockstep iterations;
        a lane that exits (or hits its iteration cap) freezes while the rest
        continue — the standard while_loop batching rule."""
        out = jax.vmap(
            self._optimize_chunk, in_axes=(0, None, None, None, None, 0, None)
        )(carry, key, gp_params, posterior, chunk_end, iter_end, trial_index)
        return self._shard_restart_carry(out)

    @partial(jax.jit, static_argnums=0)
    def _optimize_init(
        self, key, policy_params, gp_params, posterior, lr0, p_dropout0, trial_index, rid
    ) -> "_Carry":
        f32 = jnp.float32
        lr0 = jnp.asarray(lr0, f32)
        p_dropout0 = jnp.asarray(p_dropout0, f32)
        # --- probe rollout to initialize the convergence monitor
        # (MC_PILCO.py:430-463; dropout IS applied there despite the name);
        # forward only — the probe's gradient is never used
        probe_key = prng.fold(key, 0x9999)
        c0, (s0_, st0, in0) = self._rollout_cost(
            policy_params, gp_params, posterior, probe_key, p_dropout0, trial_index
        )
        cost_prev0 = jnp.where(jnp.isnan(c0), 0.0, c0)
        return _Carry(
            step=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            params=policy_params,
            adam=adam_init(policy_params),
            lr=lr0,
            p_drop=p_dropout0,
            thr=jnp.asarray(self.min_diff_cost, f32),
            gate_step=jnp.asarray(self.min_step, f32),
            consec=jnp.zeros((), jnp.int32),
            es1=jnp.zeros((), f32),
            es2=jnp.zeros((), f32),
            dcr=jnp.zeros((), f32),
            cost_prev=cost_prev0,
            reinit_count=jnp.zeros((), jnp.int32),
            retry=jnp.zeros((), jnp.int32),
            iters=jnp.zeros((), jnp.int32),
            cost_hist=jnp.zeros(self.max_opt_steps, f32),
            std_hist=jnp.zeros(self.max_opt_steps, f32),
            states=st0,
            inputs=in0,
            lr0=lr0,
            p_dropout0=p_dropout0,
            best_cost=jnp.asarray(jnp.inf, f32),
            best_params=policy_params,
            rid=jnp.asarray(rid, jnp.int32),
        )

    @partial(jax.jit, static_argnums=0)
    def _optimize_chunk(
        self,
        carry: "_Carry",
        key: jax.Array,
        gp_params,
        posterior,
        chunk_end: jax.Array,
        iter_end: jax.Array,
        trial_index: jax.Array,
    ) -> "_Carry":
        """Advance the compiled optimization loop until ``chunk_end`` or exit."""
        f32 = jnp.float32
        lr0 = carry.lr0
        p_dropout0 = carry.p_dropout0
        grad_fn = jax.value_and_grad(self._rollout_cost, has_aux=True)
        mask = self.engine.policy.param_mask(carry.params)

        def masked(grads):
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, mask
            )
            if self.grad_clip_norm is not None and self.grad_clip_norm > 0:
                gn = jnp.sqrt(
                    sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
                )
                scale = jnp.minimum(1.0, self.grad_clip_norm / (gn + 1e-12))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            return grads

        def reinit_all(c: _Carry, kt) -> _Carry:
            kp = prng.stream(kt, prng.STREAM_POLICY_INIT)
            new_params = self.engine.policy.reinit(c.params, kp)
            return c._replace(
                params=new_params,
                adam=adam_init(new_params),
                lr=lr0,
                p_drop=p_dropout0,
                thr=jnp.asarray(self.min_diff_cost, f32),
                gate_step=jnp.asarray(self.min_step, f32),
                consec=jnp.zeros((), jnp.int32),
                es1=jnp.zeros((), f32),
                es2=jnp.zeros((), f32),
                dcr=jnp.zeros((), f32),
                cost_prev=jnp.zeros((), f32),
                reinit_count=c.reinit_count + 1,
            )

        def body(c: _Carry) -> _Carry:
            # The retry counter is folded into the key via a high-bit offset so
            # the healthy path (retry = 0) keeps the exact historical key
            # schedule, while each NaN re-sample draws fresh noise.  The
            # restart lane id rides an even higher bit range so that lanes
            # which reinit at the same step draw DISTINCT fresh params
            # (rid = 0 always, on the single-restart path: schedule unchanged).
            kt = prng.fold(
                key, c.step, c.reinit_count + c.retry * (1 << 20) + c.rid * (1 << 26)
            )
            (cost, (std, states, inputs)), grads = grad_fn(
                c.params, gp_params, posterior, kt, c.p_drop, trial_index
            )
            is_nan = jnp.isnan(cost)

            # NaN guard: re-sample with fresh noise WITHOUT advancing the opt
            # step, up to max_nan_retries times (the reference's inner
            # `while num_attempts < 10 and flg_nan` — MC_PILCO.py:480-501).
            # Retries consume loop iterations rather than re-running the
            # rollout inside a cond branch: under the seed farm's vmap a cond
            # executes BOTH branches, so a rollout-sized branch would run
            # every step for every seed (measured 2.7x per-seed overhead).
            # Only the carry-sized bookkeeping below is style-dispatched —
            # see nan_branch_style on the dataclass.

            def advance(c: _Carry, nan_flag) -> _Carry:
                """The healthy-step carry update.  ``nan_flag`` is the python
                literal False under the "cond" style (every NaN select elides
                at trace time) or the traced is_nan under "where" (the
                round-3 computed-merge carry)."""

                def keep_old(old, new):
                    return new if nan_flag is False else jnp.where(nan_flag, old, new)

                # --- Adam step (skipped on NaN)
                new_params, new_adam = adam_update(
                    masked(grads), c.adam, c.params, c.lr,
                    self.adam_b1, self.adam_b2, self.adam_eps
                )
                new_params = jax.tree_util.tree_map(
                    lambda n, o: keep_old(o, n), new_params, c.params
                )

                # --- convergence monitor (MC_PILCO.py:507-519)
                dc = cost - c.cost_prev
                es1 = self.alpha_diff_cost * c.es1 + (1 - self.alpha_diff_cost) * dc
                es2 = self.alpha_diff_cost * (
                    c.es2 + (1 - self.alpha_diff_cost) * (dc - c.es1) ** 2
                )
                dcr = self.alpha_diff_cost * c.dcr + (1 - self.alpha_diff_cost) * (
                    es1 / jnp.sqrt(es2 + jnp.finfo(f32).tiny)
                )

                below = jnp.abs(dcr) < c.thr
                consec = jnp.where(below, c.consec + 1, 0)

                # --- plateau logic (MC_PILCO.py:543-567)
                gate = (c.step.astype(f32) > c.gate_step) & (consec >= self.num_min_diff_cost)
                can_reduce = c.lr > self.lr_min * (1 + 1e-6)
                reduce_lr = gate & can_reduce
                exit_now = gate & ~can_reduce

                lr = jnp.where(
                    reduce_lr, jnp.maximum(c.lr * self.lr_reduction_ratio, self.lr_min), c.lr
                )
                thr = jnp.where(reduce_lr, jnp.maximum(c.thr * 0.5, self.thr_floor), c.thr)
                gate_step = jnp.where(
                    reduce_lr, c.step.astype(f32) + self.num_min_diff_cost, c.gate_step
                )
                p_drop = jnp.where(
                    reduce_lr, jnp.maximum(c.p_drop - self.p_drop_reduction, 0.0), c.p_drop
                )
                consec = jnp.where(reduce_lr, 0, consec)
                fresh_adam = adam_init(new_params)
                new_adam = jax.tree_util.tree_map(
                    lambda f, n: jnp.where(reduce_lr, f, n), fresh_adam, new_adam
                )

                cost_logged = keep_old(c.cost_prev, cost)
                improved = cost < c.best_cost
                if nan_flag is not False:
                    improved = ~nan_flag & improved
                best_cost = jnp.where(improved, cost, c.best_cost)
                best_params = jax.tree_util.tree_map(
                    lambda nb, ob: jnp.where(improved, nb, ob), c.params, c.best_params
                )
                return c._replace(
                    best_cost=best_cost,
                    best_params=best_params,
                    step=c.step + 1,
                    done=c.done | exit_now,
                    params=new_params,
                    adam=new_adam,
                    lr=lr,
                    p_drop=p_drop,
                    thr=thr,
                    gate_step=gate_step,
                    consec=consec,
                    es1=es1,
                    es2=es2,
                    dcr=dcr,
                    cost_prev=cost_logged,
                    retry=jnp.zeros((), jnp.int32),
                    iters=c.iters + 1,
                    cost_hist=c.cost_hist.at[c.step].set(cost_logged),
                    std_hist=c.std_hist.at[c.step].set(keep_old(jnp.asarray(0.0, f32), std)),
                    states=keep_old(c.states, states),
                    inputs=keep_old(c.inputs, inputs),
                )

            if self.nan_branch_style == "off":
                # bare healthy update: every keep_old() elides at trace time
                # and is_nan is dead code (measurement ablation — see the
                # dataclass field docs; NaN rollouts poison the run)
                return advance(c, False)

            if self.nan_branch_style == "cond":

                def handle_nan(c: _Carry) -> _Carry:
                    def retry_fn(c: _Carry) -> _Carry:
                        # identical carry, only the retry/iteration counters move
                        return c._replace(retry=c.retry + 1, iters=c.iters + 1)

                    def give_up_fn(c: _Carry) -> _Carry:
                        # full re-init once the retry budget is exhausted
                        # (MC_PILCO.py:572-607): log cost_prev for this step,
                        # keep best/states/done, reset the optimizer state.
                        # (Matches the "where" style's NaN give-up carry for
                        # every config with num_min_diff_cost >= 1 — all of
                        # them — where the NaN-poisoned plateau gate cannot
                        # fire.)
                        logged = c._replace(
                            step=c.step + 1,
                            iters=c.iters + 1,
                            retry=jnp.zeros((), jnp.int32),
                            cost_hist=c.cost_hist.at[c.step].set(c.cost_prev),
                            std_hist=c.std_hist.at[c.step].set(0.0),
                        )
                        return reinit_all(logged, kt)

                    return jax.lax.cond(
                        c.retry < self.max_nan_retries, retry_fn, give_up_fn, c
                    )

                return jax.lax.cond(is_nan, handle_nan, lambda cc: advance(cc, False), c)

            # "where" style: the round-3 computed merge of all three paths
            new_c = advance(c, is_nan)
            retry_now = is_nan & (c.retry < self.max_nan_retries)
            give_up = is_nan & ~retry_now
            advanced = jax.lax.cond(give_up, lambda cc: reinit_all(cc, kt), lambda cc: cc, new_c)
            retry_c = c._replace(retry=c.retry + 1, iters=c.iters + 1)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(retry_now, a, b), retry_c, advanced
            )

        def cond(c: _Carry):
            return (c.step < chunk_end) & (c.iters < iter_end) & ~c.done

        return jax.lax.while_loop(cond, body, carry)
