"""Vmapped multi-seed MC-PILCO training: the seed-ablation farm.

The reference validates statistically by re-running a scenario for seeds
1..50 sequentially in separate processes (repeat_test.py:15-23).  Because
every stage of this framework is a pure function of a PRNG key — on-device
plant rollout, GP MLL fit, SOD selection, posterior build, and the compiled
policy-opt while_loop — a whole *batch of independent seeds* can train as one
``vmap``-ed program per phase (SURVEY §2.6 row 3, "vmapped or pod-sliced
multi-seed training"):

- **collect**: one device call rolls every seed's plant trial,
- **fit**: one call trains all seeds' GP heads (batched Cholesky over
  ``S x G`` problems) and builds all posteriors (+ per-seed SOD selection),
- **optimize**: the production policy-opt while_loop (convergence monitor,
  NaN guard, chunking) runs vmapped over seeds; the host chunk loop exits
  when *all* seeds' monitors have converged,
- optionally the seed axis is sharded over a device mesh (the pod-sliced
  seed farm — each chip trains its own seeds, no cross-chip traffic).

PRNG-stream parity with the sequential path (control.mc_pilco.MCPilco) is
exact: the same (root-seed, stream, trial) folds drive x0 sampling, plant
noise, SOD permutation and rollout noise, so a farmed seed sees the same
randomness as `scripts/repeat.py` gives it, modulo batched-kernel float
reassociation.

Scope: on-device plants (ODEPlant / PMSODEPlant) batch the plant trial into
the same device call; MuJoCo plants run their (host-side) simulator loop
seed-by-seed between the batched device phases — collection is a tiny
fraction of a trial's wall-clock (60 control steps vs thousands of policy-opt
steps), so the farm's speedup carries over nearly intact.  4PMS offline
filtering runs batched on-device via the pure-JAX filtfilt
(envs.plants.offline_velocity_estimation_jax).  ``num_restarts > 1`` runs as
sequential restart lanes through the one compiled R=1 vmapped program (the
seeds x restarts product would blow the VMEM cliff if vmapped jointly;
RESULTS.md farm profile), keeping the per-seed winner by in-model cost —
the farm analog of PolicyOptimizer's restart_vmap=False path."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..control.mc_pilco import MCPilco, ModelFitOptions, PolicyOptOptions
from ..envs.plants import ODEPlant, offline_velocity_estimation_jax
from ..models import sod as sod_mod
from ..models.gp import GPData
from ..ops import linalg
from ..utils import prng
from . import mesh as mesh_mod


class FarmTrialLog(NamedTuple):
    """Batched per-trial training record (leading axis = seeds)."""

    cost_history: np.ndarray  # [S, max_opt_steps]
    steps_done: np.ndarray  # [S]
    reinit_count: np.ndarray  # [S]
    mll_last: np.ndarray  # [S]
    control_true: np.ndarray  # [S, N+1, ds] executed control trial
    control_inputs: np.ndarray  # [S, N+1, du]
    wall_clock_s: float


class FarmResult(NamedTuple):
    seeds: np.ndarray  # [S]
    trial_logs: List[FarmTrialLog]
    policy_params: object  # batched pytree, leading axis S

    @property
    def final_true(self) -> np.ndarray:
        return self.trial_logs[-1].control_true

    @property
    def final_inputs(self) -> np.ndarray:
        return self.trial_logs[-1].control_inputs


@dataclasses.dataclass
class SeedFarm:
    """Batched multi-seed trainer sharing an MCPilco agent's configuration.

    ``policy_init_fn(key) -> params`` must be a pure-JAX per-seed policy
    initializer (scenario builders that seed custom centers/weights should
    expose one — e.g. scenarios.cartpole.policy_init)."""

    agent: MCPilco
    seeds: Sequence[int]
    mesh: Optional[object] = None
    policy_init_fn: Optional[Callable] = None
    # fixed host-chunk size override (profiling/diagnosis; default: scaled
    # down from the optimizer's chunk_steps by batch size and horizon)
    chunk_steps_override: Optional[int] = None
    # host-progress heartbeat: called (no args) at every return-to-host
    # point — after each optimize chunk, model fit, and plant collection.
    # Drivers use it for stall detection: a tunneled-TPU device call that
    # never returns freezes the process with NO output (observed: a 4-seed
    # MuJoCo R=4 farm batch went silent 30+ min at ~1% CPU in a trial-3
    # chunk, host CPU-time frozen), so output-based watchdogs see a legit
    # slow trial and a lost dispatch identically; a host-return heartbeat
    # distinguishes them (healthy chunks return every ~chunk_target_s).
    progress_cb: Optional[Callable] = None

    def _tick(self):
        if self.progress_cb is not None:
            self.progress_cb()

    def __post_init__(self):
        a = self.agent
        # on-device plants batch the trial into one device call; anything
        # else (MuJoCo, future hardware adapters) runs host-side per seed
        # in _collect_host via the plant's TrialData rollout protocol
        self._device_plant = isinstance(a.plant, ODEPlant)
        if not self._device_plant and not hasattr(a.plant, "rollout"):
            raise ValueError("SeedFarm needs a plant with a rollout() protocol")
        if not self._device_plant and a.offline_filtering:
            raise ValueError(
                "host-plant farm + offline filtering not implemented; "
                "use scripts/repeat.py"
            )
        if a.sor is not None:
            raise ValueError("SOR farm path not implemented; use scripts/repeat.py")
        if a.optimizer.mesh is not None:
            # Composition is allowed on a shared 2D seed x particle mesh:
            # the farm shards seeds on axis "s" while the optimizer's
            # in-rollout constraint shards each seed's particles on "p"
            # (vmap prepends an unconstrained seed dim to that constraint,
            # and XLA propagates the joint ("s", "p") layout).
            m = a.optimizer.mesh
            if not (
                m is self.mesh
                and mesh_mod.SEED_AXIS in m.axis_names
                and mesh_mod.PARTICLE_AXIS in m.axis_names
            ):
                raise ValueError(
                    "the seed farm composes with particle-axis sharding only "
                    "on a shared 2D ('s', 'p') mesh "
                    "(parallel.mesh.make_seed_particle_mesh); a plain "
                    "particle mesh on the optimizer conflicts with the "
                    "farm's seed axis"
                )
        n_groups = (
            None
            if self.mesh is None
            else self.mesh.shape.get(mesh_mod.SEED_AXIS, self.mesh.devices.size)
        )
        if n_groups is not None and len(self.seeds) % n_groups:
            raise ValueError(
                f"{len(self.seeds)} seeds do not tile the mesh's "
                f"{n_groups} seed group(s)"
            )
        self.keys = jax.vmap(prng.root_key)(jnp.asarray(list(self.seeds), jnp.uint32))
        init = self.policy_init_fn or (
            lambda k: self.agent.policy.init_params(
                prng.fold(prng.stream(k, prng.STREAM_POLICY_INIT), 0)
            )
        )
        self.policy_params = jax.vmap(init)(self.keys)
        self.expl_params = jax.vmap(
            lambda k: self.agent.exploration_policy.init_params(
                prng.fold(prng.stream(k, prng.STREAM_EXPLORATION), 0)
            )
        )(self.keys)
        self.gp_params = None
        self.posterior = None
        self.num_collections = 0
        # jitted-callable cache: rebuilding jax.jit(jax.vmap(lambda ...))
        # per call would defeat the jit cache (new function identity) and
        # recompile the big programs every trial
        self._jit_cache = {}
        self._filled = 0  # valid pairs in the data buffers
        self.buf_x = None  # [S, cap, D]
        self.buf_y = None  # [S, G, cap]

    def _cached(self, key, make):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._jit_cache[key] = make()
        return fn

    # ---------------------------------------------------------- seed sharding

    def _shard(self, tree):
        """Constrain the leading (seed) axis onto the mesh, if any."""
        if self.mesh is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: mesh_mod.shard_seeds(self.mesh, x), tree
        )

    # ---------------------------------------------------------- data

    def _grow(self, n_new: int):
        a = self.agent
        s = len(self.seeds)
        need = self._filled + n_new
        cap = linalg.bucket_size(need, a.bucket, a.bucket)
        if self.buf_x is None or cap > self.buf_x.shape[1]:
            bx = jnp.zeros((s, cap, a.model.gp_input_dim), jnp.float32)
            by = jnp.zeros((s, a.gp.num_heads, cap), jnp.float32)
            if self.buf_x is not None:
                bx = bx.at[:, : self.buf_x.shape[1]].set(self.buf_x)
                by = by.at[:, :, : self.buf_y.shape[2]].set(self.buf_y)
            self.buf_x, self.buf_y = bx, by

    def _collect_host(self, T: float, trial_index: int, exploration: bool) -> tuple:
        """Host-plant (MuJoCo) collection: the simulator loop runs seed-by-
        seed on the host with EXACTLY the sequential path's key derivations
        (MCPilco.collect / _sample_x0), then the training pairs are built
        and buffered batched.  The per-seed loop costs one short plant trial
        each — negligible next to the batched fit/optimize phases."""
        a = self.agent
        pol = a.exploration_policy if exploration else a.policy
        params_b = self.expl_params if exploration else self.policy_params
        mean = np.asarray(a.init_dist.mean, np.float32)
        xs, ys, trues, ins = [], [], [], []
        for i in range(len(self.seeds)):
            key = jax.tree_util.tree_map(lambda x: x[i], self.keys)
            params = jax.tree_util.tree_map(lambda x: x[i], params_b)
            if a.fixed_initial_state:
                x0 = np.asarray(mean[0] if mean.ndim == 2 else mean)
            else:
                x0 = np.asarray(a.init_dist.sample_single(
                    prng.fold(prng.stream(key, prng.STREAM_SYSTEM), trial_index, 0xA)
                ))
            k = prng.fold(prng.stream(key, prng.STREAM_SYSTEM), trial_index)
            trial = a.plant.rollout(k, x0, pol, params, T, a.dt)
            x, y = a.model.training_pairs(
                jnp.asarray(trial.measured), jnp.asarray(trial.inputs)
            )
            xs.append(x)
            ys.append(y)
            trues.append(trial.true)
            ins.append(trial.inputs)
        x = jnp.stack(xs)
        y = jnp.stack(ys)
        n = x.shape[1]
        self._grow(n)
        self.buf_x = self.buf_x.at[:, self._filled : self._filled + n].set(x)
        self.buf_y = self.buf_y.at[:, :, self._filled : self._filled + n].set(y)
        self._filled += n
        self.num_collections += 1
        self._tick()
        return np.stack(trues), np.stack(ins)

    def collect(self, T: float, trial_index: int, exploration: bool) -> tuple:
        """One plant trial per seed, in one device call
        (MCPilco.collect semantics, batched)."""
        a = self.agent
        if not self._device_plant:
            return self._collect_host(T, trial_index, exploration)
        num_steps = int(round(T / a.dt))
        pol = a.exploration_policy if exploration else a.policy
        params_b = self.expl_params if exploration else self.policy_params
        fixed = a.fixed_initial_state
        mean = np.asarray(a.init_dist.mean, np.float32)

        def make():
            def one(key, params, t_idx):
                if fixed:
                    x0 = jnp.asarray(mean[0] if mean.ndim == 2 else mean)
                else:
                    x0 = a.init_dist.sample_single(
                        prng.fold(prng.stream(key, prng.STREAM_SYSTEM), t_idx, 0xA)
                    )
                k = prng.fold(prng.stream(key, prng.STREAM_SYSTEM), t_idx)
                run = a.plant._device_rollout(pol, params)
                out = run(k, x0, 0.0, num_steps, a.dt)
                measured, inputs, states = out[0], out[1], out[2]
                if a.offline_filtering:
                    # 4PMS: train on offline-filtered estimates of the RAW
                    # noisy measurements (MC_PILCO.py:908-962), batched
                    # on-device via the pure-JAX filtfilt
                    noisy = out[3]
                    est, inputs_t = offline_velocity_estimation_jax(
                        noisy, inputs, a.dt,
                        a.model.pos_indices, a.model.vel_indices,
                        filt_cutoff=a.offline_filter_cutoff,
                        method=getattr(a, "offline_filter_method", "butter_cd"),
                    )
                    x, y = a.model.training_pairs(est, inputs_t)
                    return x, y, states[1:-1], inputs_t
                x, y = a.model.training_pairs(measured, inputs)
                return x, y, states, inputs

            return jax.jit(jax.vmap(one, in_axes=(0, 0, None)))

        fn = self._cached(("collect", exploration, num_steps), make)
        x, y, true_states, inputs = fn(
            self._shard(self.keys), self._shard(params_b), jnp.int32(trial_index)
        )
        n = x.shape[1]
        self._grow(n)
        self.buf_x = self.buf_x.at[:, self._filled : self._filled + n].set(x)
        self.buf_y = self.buf_y.at[:, :, self._filled : self._filled + n].set(y)
        self._filled += n
        self.num_collections += 1
        self._tick()
        return np.asarray(true_states), np.asarray(inputs)

    # ---------------------------------------------------------- model

    def fit_model(self, opts: ModelFitOptions) -> np.ndarray:
        """Re-init + train all seeds' GP heads and build all posteriors in
        one call (MCPilco.fit_model + _build_posterior, batched).  Returns
        the per-seed final MLL [S].

        Posterior finiteness is guarded in-graph: each seed's posterior is
        built at 1x/10x/100x jitter and the first finite one selected (the
        vmapped analog of MCPilco._build_posterior's escalation retry — the
        TPU's f32 Cholesky can tip over on one seed's dataset, and without
        the guard that seed NaN-storms its whole training).  The two extra
        factorizations are negligible next to the MLL fit."""
        a = self.agent
        mask = np.zeros(self.buf_x.shape[1], np.float32)
        mask[: self._filled] = 1.0

        def make():
            gp_variants = tuple(
                dataclasses.replace(a.gp, jitter=a.gp.jitter * scale)
                for scale in (1.0, 10.0, 100.0)
            )

            def build_post(gp, params, data, key, collections):
                if a.sod is not None:
                    ksel = prng.fold(prng.stream(key, prng.STREAM_MODEL_FIT), collections)
                    sel = sod_mod.select(gp, a.sod, params, data.x, data.y, data.mask, ksel)
                    return gp.posterior(params, data.x, sel, data.y)
                return gp.fit_posterior(params, data)

            def finite(post):
                return jnp.stack(
                    [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(post)]
                ).all()

            def one(key, x, y, mask, collections):
                params = a.gp.init_params(
                    sigma_n=a.gp_sigma_n_init, per_head_overrides=a.gp_init_overrides
                )
                data = GPData(x=x, y=y, mask=mask)
                params, losses = a.gp.fit(
                    params, data,
                    num_epochs=opts.num_epochs, learning_rate=opts.learning_rate,
                )
                posts = [build_post(gv, params, data, key, collections) for gv in gp_variants]
                ok0, ok1 = finite(posts[0]), finite(posts[1])
                post = jax.tree_util.tree_map(
                    lambda p0, p1, p2: jnp.where(ok0, p0, jnp.where(ok1, p1, p2)),
                    *posts,
                )
                return params, post, losses[-1]

            return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None, None)))

        fn = self._cached(("fit", opts.num_epochs, opts.learning_rate, self.buf_x.shape[1]), make)
        self.gp_params, self.posterior, mll_last = fn(
            self._shard(self.keys), self._shard(self.buf_x), self._shard(self.buf_y),
            jnp.asarray(mask), jnp.int32(self.num_collections),
        )
        out = np.asarray(mll_last)  # device sync
        self._tick()
        return out

    # ---------------------------------------------------------- policy

    def improve_policy(self, opts: PolicyOptOptions, trial_index: int) -> tuple:
        """The production compiled policy-opt loop, vmapped over seeds.
        Host chunking is preserved; a chunk ends early only when EVERY
        seed's convergence monitor has fired.

        ``optimizer.num_restarts > 1`` runs as SEQUENTIAL lanes through the
        same compiled R=1 vmapped program (seeds x restarts vmapped jointly
        would cross the VMEM cliff): lane 0 = the incoming per-seed params
        (exact single-restart schedule), lanes 1..R-1 = fresh per-seed reinit
        draws with the sequential path's key derivation
        (trainer.optimize: split(fold(key, STREAM_RESTARTS), R-1)); the
        per-seed winner by in-model cost is kept, per-seed — unlike the
        sequential driver, seed A's lane-2 win never costs seed B its
        lane-0 win."""
        a = self.agent
        opt = a.optimizer
        num_steps = int(min(int(opts.opt_steps), opt.max_opt_steps))
        key_fn = self._cached(
            "opt_keys",
            lambda: jax.jit(jax.vmap(
                lambda k, ti: prng.fold(prng.stream(k, prng.STREAM_ROLLOUT), ti),
                in_axes=(0, None),
            )),
        )
        keys = self._shard(key_fn(self.keys, jnp.int32(trial_index)))
        R = max(int(opt.num_restarts), 1)

        best = None  # (metric [S], params, hist, steps, reinits)
        for r in range(R):
            if r == 0:
                lane_params = self._shard(self.policy_params)
            else:
                reinit_fn = self._cached(
                    ("lane_reinit", R),
                    lambda: jax.jit(jax.vmap(
                        lambda p, k, ri: a.policy.reinit(
                            p,
                            jax.random.split(
                                prng.fold(k, prng.STREAM_RESTARTS), R - 1
                            )[ri],
                        ),
                        in_axes=(0, 0, None),
                    )),
                )
                lane_params = self._shard(
                    reinit_fn(self.policy_params, keys, jnp.int32(r - 1))
                )
            lane = self._optimize_lane(
                opts, trial_index, keys, lane_params, num_steps, lane_id=r
            )
            if best is None:
                best = lane
            else:
                m_best, m_lane = best[0], lane[0]
                better = jnp.isfinite(m_lane) & (
                    ~jnp.isfinite(m_best) | (m_lane < m_best)
                )
                sel = lambda new, old: jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        better.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
                    ),
                    new, old,
                )
                best = tuple(sel(n, o) for n, o in zip(lane, best))
        _, self.policy_params, hist, steps, reinits = best
        return np.asarray(hist), np.asarray(steps), np.asarray(reinits)

    def _optimize_lane(
        self, opts: PolicyOptOptions, trial_index: int, keys, lane_params,
        num_steps: int, lane_id: int,
    ) -> tuple:
        """One restart lane: init + chunk-drive the vmapped compiled loop.
        Returns per-seed (metric, selected params, cost_hist, steps,
        reinits); metric follows trainer.optimize's winner rule
        (best_cost under keep_best, else last cost)."""
        a = self.agent
        opt = a.optimizer

        init = self._cached(
            "opt_init",
            lambda: jax.jit(jax.vmap(
                lambda k, pp, gpp, post, lr, pd, ti, rid: opt._optimize_init(
                    k, pp, gpp, post, lr, pd, ti, rid
                ),
                in_axes=(0, 0, 0, 0, None, None, None, None),
            )),
        )
        carry = init(
            keys, lane_params, self.gp_params, self.posterior,
            jnp.float32(opts.learning_rate), jnp.float32(opts.p_dropout),
            jnp.int32(trial_index), jnp.int32(lane_id),
        )

        chunk = self._cached(
            "opt_chunk",
            lambda: jax.jit(jax.vmap(
                lambda c, k, gpp, post, end, it_end, ti: opt._optimize_chunk(
                    c, k, gpp, post, end, it_end, ti
                ),
                in_axes=(0, 0, 0, 0, None, 0, None),
            )),
        )
        # Per-chunk budget: sized down for the first chunk (batch and horizon
        # scale a chunk's device execution ~linearly), then ADAPTED to the
        # measured throughput so every execution stays near chunk_target_s.
        # Uninterrupted executions past ~1 min crash the tunneled TPU runtime
        # (measured three times: an 8-seed cartpole farm, a 4-seed furuta farm
        # at the first sync, and the same furuta farm at trial 3 after the
        # growing dataset tripled the per-step cost past a statically-safe
        # budget — the same failure class as the long-horizon UR5 config).
        scale = max(len(self.seeds), 1) * max(opt.horizon, 1)
        chunk_steps = self.chunk_steps_override or max(25, 2 * opt.chunk_steps * 60 // scale)
        step_now = 0
        while step_now < num_steps:
            end = min(step_now + chunk_steps, num_steps)
            # per-seed hard iteration cap (trainer.chunk_iter_slack): a seed
            # stuck in NaN retries stops consuming the whole batch's device
            # execution once its budget is spent; the chunk then returns to
            # the host early and throughput is re-measured
            iter_end = carry.iters + jnp.int32(
                int(opt.chunk_iter_slack * (end - step_now)) + 64
            )
            t0 = time.perf_counter()
            carry = chunk(
                carry, keys, self.gp_params, self.posterior,
                jnp.int32(end), iter_end, jnp.int32(trial_index),
            )
            all_done = bool(jnp.all(carry.done))  # sync; times the execution
            self._tick()
            if all_done:
                break
            # progress = the slowest LIVE seed (done seeds no longer advance)
            new_step = int(jnp.min(jnp.where(carry.done, num_steps, carry.step)))
            if self.chunk_steps_override is None and opt.chunk_target_s:
                rate = max(new_step - step_now, 1) / max(time.perf_counter() - t0, 1e-6)
                chunk_steps = max(25, int(opt.chunk_target_s * rate))
            step_now = new_step

        if opt.keep_best:
            params_sel = jax.vmap(
                lambda c: jax.tree_util.tree_map(
                    lambda b, l: jnp.where(jnp.isfinite(c.best_cost), b, l),
                    c.best_params,
                    c.params,
                )
            )(carry)
            metric = carry.best_cost
        else:
            params_sel = carry.params
            metric = carry.cost_prev
        return (metric, params_sel, carry.cost_hist, carry.step, carry.reinit_count)

    # ---------------------------------------------------------- main loop

    def run(
        self,
        *,
        num_trials: int,
        T_exploration: float,
        T_control: float,
        model_fit_options: Sequence[ModelFitOptions],
        policy_opt_options: Sequence[PolicyOptOptions],
        num_explorations: int = 1,
        verbose: bool = True,
    ) -> FarmResult:
        """The full MBRL loop for every seed at once (MCPilco.reinforce,
        batched over the seed axis)."""
        for e in range(num_explorations):
            if verbose:
                print(f"[seed-farm] exploration {e} ({len(self.seeds)} seeds)")
            self.collect(T_exploration, trial_index=e, exploration=True)

        logs: List[FarmTrialLog] = []
        for trial in range(num_trials):
            t0 = time.time()
            mll_last = self.fit_model(
                model_fit_options[min(trial, len(model_fit_options) - 1)]
            )
            if verbose:
                print(
                    f"[seed-farm] trial {trial}: N={self._filled} "
                    f"mll_last median {np.median(mll_last):.1f} "
                    f"({time.time() - t0:.1f}s)"
                )
            t1 = time.time()
            cost_hist, steps, reinits = self.improve_policy(
                policy_opt_options[min(trial, len(policy_opt_options) - 1)], trial
            )
            if verbose:
                last = cost_hist[np.arange(len(self.seeds)), np.maximum(steps - 1, 0)]
                print(
                    f"[seed-farm] trial {trial}: opt steps med {int(np.median(steps))}, "
                    f"final cost med {np.median(last):.2f}, reinits {int(reinits.sum())} "
                    f"({time.time() - t1:.1f}s, "
                    f"{1e3 * (time.time() - t1) / max(int(steps.max()), 1):.2f} "
                    f"ms/step-all-seeds)"
                )
            true_states, inputs = self.collect(
                T_control, trial_index=self.num_collections, exploration=False
            )
            logs.append(
                FarmTrialLog(
                    cost_history=cost_hist,
                    steps_done=steps,
                    reinit_count=reinits,
                    mll_last=mll_last,
                    control_true=true_states,
                    control_inputs=inputs,
                    wall_clock_s=time.time() - t0,
                )
            )
        return FarmResult(
            seeds=np.asarray(list(self.seeds)),
            trial_logs=logs,
            policy_params=self.policy_params,
        )
