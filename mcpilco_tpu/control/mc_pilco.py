"""The MC-PILCO orchestrator: explore -> fit GPs -> optimize policy -> apply.

Host-side trial loop with the same responsibilities as the reference
``MC_PILCO.reinforce`` (policy_learning/MC_PILCO.py:89-258), driving three
compiled programs:

1. model fitting — one jitted multi-head MLL scan (MultiGP.fit) + optional
   on-device SOD selection + posterior build,
2. policy optimization — one jitted while_loop (trainer.PolicyOptimizer),
3. system interaction — on-device plant rollout (envs.plants) or an external
   system behind the same TrialData protocol.

Differences from the reference by design:
- configuration is dataclasses and explicit factories, not eval'd lambda
  strings (MC_PILCO.py:467) — see scenarios/ for the shipped configs;
- checkpoints are npz/json (utils.checkpoint), not pickles;
- datasets are padded to shape buckets so per-trial growth rarely recompiles.

The 4PMS variant (MC_PILCO.py:754-962) is expressed compositionally: give the
engine a ``PMSSensors`` (simulated measurement chain inside rollouts), a
``PMSODEPlant`` (measurement chain on the real system), and set
``offline_filtering=True`` (filtfilt + central differences on collected data).
The hardware-in-the-loop variant (MC_PILCO_Experiment, :965-1068) is an
external plant: pass ``plant=None`` and supply TrialData via
``add_external_trial``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.plants import TrialData, offline_velocity_estimation
from ..models import sod as sod_mod
from ..models.costs import CostBase
from ..models.dynamics import DynamicsModel
from ..models.gp import GPData, GPParams, MultiGP
from ..models.policies import PolicyBase
from ..ops import linalg
from ..utils import checkpoint as ckpt
from ..utils import prng
from .rollout import InitialStateDistribution, RolloutEngine
from .trainer import OptResult, PolicyOptimizer


@dataclasses.dataclass(frozen=True)
class ModelFitOptions:
    """Per-trial GP training options (model_optimization_opt_dict analog,
    test_mcpilco_cartpole.py:190-196)."""

    num_epochs: int = 1501
    learning_rate: float = 0.01


@dataclasses.dataclass(frozen=True)
class PolicyOptOptions:
    """Per-trial knobs of the policy optimizer (the per-trial lists of
    test_mcpilco_cartpole.py:199-217)."""

    opt_steps: int
    learning_rate: float = 0.01
    p_dropout: float = 0.0


@dataclasses.dataclass
class TrialLog:
    cost_history: np.ndarray
    std_history: np.ndarray
    steps_done: int
    particles_states: np.ndarray
    particles_inputs: np.ndarray
    reinit_count: int
    wall_clock_s: float


class MCPilco:
    """Monte-Carlo PILCO on TPU.

    Parameters mirror the reference constructor (MC_PILCO.py:34-87) but take
    constructed config objects instead of factory callables + kwarg dicts.
    """

    def __init__(
        self,
        *,
        dt: float,
        model: DynamicsModel,
        gp: MultiGP,
        policy: PolicyBase,
        exploration_policy: PolicyBase,
        cost: CostBase,
        optimizer: PolicyOptimizer,
        plant=None,
        init_dist: Optional[InitialStateDistribution] = None,
        sod: Optional[sod_mod.SODConfig] = None,
        sor: Optional[sod_mod.SODConfig] = None,
        offline_filtering: bool = False,
        offline_filter_cutoff: float = 0.5,
        offline_filter_method: str = "butter_cd",
        gp_sigma_n_init: float = 1.0,
        gp_init_overrides: Optional[list] = None,
        seed: int = 1,
        log_dir: Optional[str] = None,
        bucket: int = 64,
        fixed_initial_state: bool = False,
        mesh=None,
    ):
        if mesh is not None:
            # shard the production policy-optimization path over the mesh's
            # particle axis (see trainer.PolicyOptimizer.mesh)
            optimizer = dataclasses.replace(optimizer, mesh=mesh)
        self.mesh = mesh
        self.dt = dt
        self.model = model
        self.gp = gp
        self.policy = policy
        self.exploration_policy = exploration_policy
        self.cost = cost
        self.optimizer = optimizer
        self.plant = plant
        self.init_dist = init_dist or optimizer.init_dist
        self.sod = sod
        self.sor = sor
        if sor is not None and gp.approx != "sor":
            raise ValueError("sor config requires MultiGP(approx='sor')")
        self.offline_filtering = offline_filtering
        self.offline_filter_cutoff = offline_filter_cutoff
        self.offline_filter_method = offline_filter_method
        self.gp_sigma_n_init = gp_sigma_n_init
        self.gp_init_overrides = gp_init_overrides
        self.seed = seed
        self.log_dir = log_dir
        self.bucket = bucket
        self.fixed_initial_state = fixed_initial_state
        # provenance for replay tooling: scenario builders stamp these so
        # checkpoints are self-describing (the config_log.pkl analog,
        # test_mcpilco_cartpole.py:233-237)
        self.scenario_name: Optional[str] = None
        self.scenario_config = None

        self.key = prng.root_key(seed)
        self.policy_params = policy.init_params(
            prng.fold(prng.stream(self.key, prng.STREAM_POLICY_INIT), 0)
        )
        self.expl_params = exploration_policy.init_params(
            prng.fold(prng.stream(self.key, prng.STREAM_EXPLORATION), 0)
        )
        self.gp_params: Optional[GPParams] = None
        self.posterior = None

        # dataset accumulators (host side, unpadded)
        self.gp_x = np.zeros((0, model.gp_input_dim), np.float32)
        self.gp_y = np.zeros((gp.num_heads, 0), np.float32)
        self.trials: List[TrialData] = []
        self.trial_logs: List[TrialLog] = []
        self.num_collections = 0
        self.num_exploration_trials = 0
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)

    # ------------------------------------------------------------ data

    def _ingest(self, trial: TrialData) -> None:
        """data_to_gp_IO + append (Model_learning.py:123-147)."""
        states = jnp.asarray(trial.measured, jnp.float32)
        inputs = jnp.asarray(trial.inputs, jnp.float32)
        x, y = self.model.training_pairs(states, inputs)
        self.gp_x = np.concatenate([self.gp_x, np.asarray(x)], axis=0)
        self.gp_y = np.concatenate([self.gp_y, np.asarray(y)], axis=1)
        self.trials.append(trial)
        self.num_collections += 1

    def add_external_trial(
        self, measured: np.ndarray, inputs: np.ndarray, exploration: bool = False
    ) -> None:
        """Hardware-in-the-loop data entry (MC_PILCO_Experiment analog,
        MC_PILCO.py:1016-1068): feed measured states + applied inputs.

        Shapes are validated like the reference's CSV ingestion
        (MC_PILCO.py:1055-1058): measured [T, state_dim], inputs [T, input_dim]
        (a flat input vector is reshaped for input_dim = 1).  Mark operator
        exploration runs with ``exploration=True`` so per-trial cost schedules
        stay aligned with control-trial ordinals.
        """
        measured = np.asarray(measured, np.float32)
        inputs = np.asarray(inputs, np.float32).reshape(-1, self.model.input_dim)
        if measured.ndim != 2 or measured.shape[1] != self.model.state_dim:
            raise ValueError(
                f"measured states must be [T, {self.model.state_dim}], got {measured.shape}"
            )
        if inputs.shape[0] != measured.shape[0]:
            raise ValueError(
                f"inputs have {inputs.shape[0]} rows but measured states have "
                f"{measured.shape[0]} — one input per measured sample required"
            )
        # only count the trial once it is guaranteed to be ingested — a bump
        # before validation would survive a rejected call and skew every
        # later control-trial ordinal (per-trial cost schedules)
        if exploration:
            self.num_exploration_trials += 1
        if self.offline_filtering:
            pos = self.model.pos_indices
            vel = self.model.vel_indices
            states, inputs = offline_velocity_estimation(
                measured, inputs, self.dt, pos, vel,
                filt_cutoff=self.offline_filter_cutoff,
                method=self.offline_filter_method,
            )
        else:
            states = measured
        self._ingest(TrialData(measured=states, inputs=inputs, true=states, noisy=measured))

    # ------------------------------------------------------- HIL file protocol
    # The reference's hardware-in-the-loop variant prompts an operator to drop
    # CSVs into log_path/DATA_<trial>/ and exports the policy parameters as
    # CSVs for the robot-side controller (MC_PILCO.py:1016-1068).  Here both
    # directions are non-interactive library calls with the same file layout.

    def export_policy_csv(self, out_dir: Optional[str] = None) -> List[str]:
        """Write every policy-parameter leaf as ``policy_<name>.csv``
        (MC_PILCO.py:1024-1026).  Returns the written paths."""
        out_dir = out_dir or self.log_dir
        if out_dir is None:
            raise ValueError("export_policy_csv needs an out_dir or a log_dir")
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(self.policy_params)[0]:
            name = "_".join(
                str(getattr(p, "key", None) or getattr(p, "name", None) or getattr(p, "idx", ""))
                for p in path
            )
            fp = os.path.join(out_dir, f"policy_{name}.csv")
            np.savetxt(fp, np.atleast_2d(np.asarray(leaf)), delimiter=",")
            paths.append(fp)
        return paths

    def load_external_trial(
        self,
        trial_index: Optional[int] = None,
        data_dir: Optional[str] = None,
        exploration: bool = False,
    ) -> TrialData:
        """Ingest one hardware trial from ``<log_dir>/DATA_<trial>/
        {noisy_samples.csv, input_samples.csv}`` — the reference's operator
        protocol (MC_PILCO.py:1032-1054) minus the interactive prompt.
        Shape validation + offline filtering happen in
        :meth:`add_external_trial`.  Pass ``exploration=True`` for the
        operator's DATA_0 exploration run so control-trial ordinals (per-trial
        cost schedules) stay aligned, exactly as on the simulated path."""
        if data_dir is None:
            if self.log_dir is None:
                raise ValueError("load_external_trial needs a data_dir or a log_dir")
            idx = self.num_collections if trial_index is None else trial_index
            data_dir = os.path.join(self.log_dir, f"DATA_{idx}")
        noisy_fp = os.path.join(data_dir, "noisy_samples.csv")
        input_fp = os.path.join(data_dir, "input_samples.csv")
        for fp in (noisy_fp, input_fp):
            if not os.path.exists(fp):
                raise FileNotFoundError(f"expected hardware data file {fp}")
        noisy = np.genfromtxt(noisy_fp, delimiter=",")
        inputs = np.genfromtxt(input_fp, delimiter=",")
        self.add_external_trial(noisy, inputs, exploration=exploration)
        return self.trials[-1]

    def _padded_data(self) -> GPData:
        n = self.gp_x.shape[0]
        cap = linalg.bucket_size(n, self.bucket, self.bucket)
        x = np.zeros((cap, self.gp_x.shape[1]), np.float32)
        y = np.zeros((self.gp_y.shape[0], cap), np.float32)
        x[:n] = self.gp_x
        y[:, :n] = self.gp_y
        mask = np.zeros(cap, np.float32)
        mask[:n] = 1.0
        return GPData(x=jnp.asarray(x), y=jnp.asarray(y), mask=jnp.asarray(mask))

    # ------------------------------------------------------------ system IO

    def _sample_x0(self, trial_index: int) -> np.ndarray:
        if self.fixed_initial_state:
            mean = np.asarray(self.init_dist.mean, np.float32)
            return mean[0] if mean.ndim == 2 else mean
        k = prng.fold(prng.stream(self.key, prng.STREAM_SYSTEM), trial_index, 0xA)
        return np.asarray(self.init_dist.sample_single(k))

    def collect(self, T: float, trial_index: int, exploration: bool) -> TrialData:
        """Interact with the plant (get_data_from_system analog,
        MC_PILCO.py:676-699)."""
        if self.plant is None:
            raise RuntimeError(
                "no plant attached: supply data with add_external_trial() "
                "(hardware-in-the-loop mode)"
            )
        pol = self.exploration_policy if exploration else self.policy
        params = self.expl_params if exploration else self.policy_params
        x0 = self._sample_x0(trial_index)
        k = prng.fold(prng.stream(self.key, prng.STREAM_SYSTEM), trial_index)
        trial = self.plant.rollout(k, x0, pol, params, T, self.dt)
        if self.offline_filtering:
            states, inputs = offline_velocity_estimation(
                trial.noisy,
                trial.inputs,
                self.dt,
                self.model.pos_indices,
                self.model.vel_indices,
                filt_cutoff=self.offline_filter_cutoff,
                method=self.offline_filter_method,
            )
            trial = TrialData(
                measured=states, inputs=inputs, true=trial.true[1:-1], noisy=trial.noisy[1:-1]
            )
        self._ingest(trial)
        # ingest-then-count, matching the HIL path's discipline above: a
        # rollout (or filtering) that raises must not bump the exploration
        # ordinal, or every later control trial's per-trial cost schedule
        # shifts by one
        if exploration:
            self.num_exploration_trials += 1
        return trial

    # ------------------------------------------------------------ model

    def fit_model(self, opts: ModelFitOptions) -> dict:
        """Re-init GP hyperparameters from scratch and train all heads
        (reinforce_model analog, Model_learning.py:149-161)."""
        t0 = time.time()
        self.gp_params = self.gp.init_params(
            sigma_n=self.gp_sigma_n_init, per_head_overrides=self.gp_init_overrides
        )
        data = self._padded_data()
        self.gp_params, losses = self.gp.fit(
            self.gp_params, data, num_epochs=opts.num_epochs, learning_rate=opts.learning_rate
        )
        info = {"mll_first": float(losses[0]), "mll_last": float(losses[-1])}

        self.posterior = self._build_posterior(data, info)
        info["wall_clock_s"] = time.time() - t0
        info["num_samples"] = int(self.gp_x.shape[0])
        return info

    def _build_posterior(self, data: GPData, info: Optional[dict] = None):
        """Exact / SOD-subset / SOR posterior, per configuration
        (pretrain_gp dispatch analog, Model_learning.py:163-208).

        Retries with 10x / 100x jitter if any posterior leaf is non-finite:
        the TPU's blocked f32 Cholesky can tip over on datasets the CPU
        factorizes fine (observed: UR5 trial 1, N=448 x D=24, near-noiseless
        heads), and a NaN posterior otherwise NaN-storms every rollout of
        the trial.  One escalation costs a re-factorization, not a re-fit.
        """
        gp0 = self.gp
        params0 = self.gp_params
        try:
            for scale in (1.0, 10.0, 100.0):
                if scale > 1.0:
                    self.gp = dataclasses.replace(gp0, jitter=gp0.jitter * scale)
                    # the SOR path's fit_sor refinement mutates gp_params;
                    # each attempt must start from the same fitted state
                    self.gp_params = params0
                post = self._build_posterior_once(data, info)
                leaves = jax.tree_util.tree_leaves(post)
                if all(bool(jnp.all(jnp.isfinite(l))) for l in leaves):
                    if scale > 1.0:
                        print(f"[mc-pilco] posterior needed {scale:.0f}x jitter")
                        if info is not None:
                            info["jitter_scale"] = scale
                    return post
            # Returning a NaN posterior would just defer the failure into a
            # rollout NaN-storm the guard exists to prevent; fail loudly.
            raise FloatingPointError(
                "GP posterior non-finite even at 100x jitter escalation "
                f"(N={int(jnp.sum(data.mask))}, jitter={gp0.jitter:g}); "
                "the model fit is numerically unusable for this trial"
            )
        finally:
            self.gp = gp0

    def _build_posterior_once(self, data: GPData, info: Optional[dict] = None):
        if self.sod is not None:
            k = prng.fold(prng.stream(self.key, prng.STREAM_MODEL_FIT), self.num_collections)
            sel = sod_mod.select(self.gp, self.sod, self.gp_params, data.x, data.y, data.mask, k)
            if info is not None:
                info["sod_points"] = np.asarray(jnp.sum(sel, axis=-1)).tolist()
            # Compact to the UNION of the per-head subsets, padded to a tight
            # bucket: the rollout re-reads the posterior (K^-1 is O(M^2))
            # every scan step, so shrinking M from the full padded N cuts the
            # hot loop's HBM traffic.  The union keeps x_tr IDENTICAL across
            # heads (broadcast), which lets XLA share the head-independent
            # pairwise-difference tensor inside the vmapped gram — per-head
            # x_tr arrays measurably de-duplicate that work.
            sel_np = np.asarray(sel) > 0.5
            g = self.gp.num_heads
            union = np.where(sel_np.any(axis=0))[0]
            m_cap = linalg.bucket_size(len(union), self.bucket, self.bucket)
            x_np, y_np = np.asarray(data.x), np.asarray(data.y)
            x_tr = np.zeros((m_cap, x_np.shape[1]), np.float32)
            x_tr[: len(union)] = x_np[union]
            y_tr = np.zeros((g, m_cap), np.float32)
            y_tr[:, : len(union)] = y_np[:, union]
            mask = np.zeros((g, m_cap), np.float32)
            mask[:, : len(union)] = sel_np[:, union].astype(np.float32)
            return self.gp.posterior(
                self.gp_params, jnp.asarray(x_tr), jnp.asarray(mask), jnp.asarray(y_tr)
            )
        if self.sor is not None:
            k = prng.fold(prng.stream(self.key, prng.STREAM_MODEL_FIT), self.num_collections)
            sel = sod_mod.select(self.gp, self.sor, self.gp_params, data.x, data.y, data.mask, k)
            if info is not None:
                info["sor_points"] = np.asarray(jnp.sum(sel, axis=-1)).tolist()
            u = None
            refine = getattr(self.sor, "refine_epochs", 0)
            if refine:
                # SOR-MLL refinement of hyperparameters (+ inducing inputs)
                # after the exact fit + greedy selection (the reference's
                # train-then-select order, Model_learning.py:381-396, with
                # the fixed fit_SOR_model as the refinement stage)
                train_u = getattr(self.sor, "train_inducing", False)
                self.gp_params, u_trained, sor_losses = self.gp.fit_sor(
                    self.gp_params, data, sel, num_epochs=refine,
                    learning_rate=getattr(self.sor, "refine_lr", 0.01),
                    train_inducing=train_u,
                )
                if train_u:
                    u = u_trained
                if info is not None:
                    info["sor_mll_first"] = float(sor_losses[0])
                    info["sor_mll_last"] = float(sor_losses[-1])
            return self.gp.sor_posterior(self.gp_params, data, sel, u=u)
        return self.gp.fit_posterior(self.gp_params, data)

    # ------------------------------------------------------------ diagnostics

    def one_step_mse(self, trial_index: int = -1) -> np.ndarray:
        """Per-head one-step prediction MSE on a stored trial
        (get_model_learning_performance analog, MC_PILCO.py:260-306)."""
        trial = self.trials[trial_index]
        states = jnp.asarray(trial.measured, jnp.float32)
        inputs = jnp.asarray(trial.inputs, jnp.float32)
        x, y = self.model.training_pairs(states, inputs)
        mean, _ = self.gp.predict(self.gp_params, self.posterior, x)
        return np.asarray(jnp.mean((mean - y) ** 2, axis=-1))

    def trial_cumulative_cost(self, trial_index: int = -1) -> float:
        """Cumulative cost of an EXECUTED trial on the plant (the per-seed
        statistic the reference's repeat protocol aggregates)."""
        trial = self.trials[trial_index]
        # Per-trial cost schedules (e.g. UR5's tracking cost with per_trial
        # lengthscales) are indexed by CONTROL-trial ordinal, the same index
        # improve_policy optimized with — exploration trials don't count.
        resolved = trial_index if trial_index >= 0 else len(self.trials) + trial_index
        resolved = max(0, resolved - self.num_exploration_trials)
        stage = self.cost.stage_costs(
            jnp.asarray(trial.true[:, None, :]),
            jnp.asarray(trial.inputs[:, None, :]),
            trial_index=resolved,
        )
        return float(jnp.sum(stage))

    def rollout_mse(self, trial_index: int = -1) -> np.ndarray:
        """Open-loop rollout MSE per state dim against a stored trial
        (get_rollout_prediction_performance analog, MC_PILCO.py:308-345)."""
        trial = self.trials[trial_index]
        engine = self.optimizer.engine
        traj = engine.replay(
            self.gp_params,
            self.posterior,
            jnp.asarray(trial.measured[0], jnp.float32),
            jnp.asarray(trial.inputs, jnp.float32),
        )
        return np.asarray(jnp.mean((traj - trial.measured) ** 2, axis=0))

    # ------------------------------------------------------------ policy

    def improve_policy(self, opts: PolicyOptOptions, trial_index: int) -> TrialLog:
        """One compiled policy-optimization run (reinforce_policy analog)."""
        t0 = time.time()
        k = prng.fold(prng.stream(self.key, prng.STREAM_ROLLOUT), trial_index)
        result: OptResult = self.optimizer.optimize(
            k,
            self.policy_params,
            self.gp_params,
            self.posterior,
            num_opt_steps=opts.opt_steps,
            lr0=opts.learning_rate,
            p_dropout0=opts.p_dropout,
            trial_index=trial_index,
        )
        self.policy_params = result.policy_params
        if result.restart_costs is not None:
            rc = ", ".join(f"{float(v):.2f}" for v in result.restart_costs)
            print(
                f"[mc-pilco] restarts: best costs [{rc}], "
                f"winner lane {int(result.restart_winner)}"
            )
        steps = int(result.steps_done)
        log = TrialLog(
            cost_history=np.asarray(result.cost_history)[:steps],
            std_history=np.asarray(result.std_history)[:steps],
            steps_done=steps,
            particles_states=np.asarray(result.states),
            particles_inputs=np.asarray(result.inputs),
            reinit_count=int(result.reinit_count),
            wall_clock_s=time.time() - t0,
        )
        self.trial_logs.append(log)
        return log

    # ------------------------------------------------------------ main loop

    def reinforce(
        self,
        *,
        num_trials: int,
        T_exploration: float,
        T_control: float,
        model_fit_options: List[ModelFitOptions],
        policy_opt_options: List[PolicyOptOptions],
        num_explorations: int = 1,
        verbose: bool = True,
        on_trial_end: Optional[Callable] = None,
    ):
        """The full MBRL loop (MC_PILCO.py:89-258).

        Returns the list of TrialLogs.
        """
        start_trial = len(self.trial_logs)
        if self.num_collections == 0:
            for e in range(num_explorations):
                if verbose:
                    print(f"[mc-pilco] exploration {e}")
                self.collect(T_exploration, trial_index=e, exploration=True)

        for trial in range(start_trial, start_trial + num_trials):
            if verbose:
                print(f"[mc-pilco] ===== trial {trial} =====")
            info = self.fit_model(model_fit_options[min(trial, len(model_fit_options) - 1)])
            if verbose:
                print(
                    f"[mc-pilco] model fit: N={info['num_samples']} "
                    f"mll {info['mll_first']:.1f} -> {info['mll_last']:.1f} "
                    f"({info['wall_clock_s']:.1f}s)"
                    + (f" sod={info.get('sod_points')}" if "sod_points" in info else "")
                )
                print(f"[mc-pilco] one-step MSE (last trial): {self.one_step_mse()}")
                print(f"[mc-pilco] rollout MSE  (last trial): {self.rollout_mse()}")
            self.save_checkpoint(stage=f"model_trial{trial}")

            log = self.improve_policy(
                policy_opt_options[min(trial, len(policy_opt_options) - 1)], trial
            )
            if verbose:
                c = log.cost_history
                cost_span = f"{c[0]:.2f} -> {c[-1]:.2f}" if len(c) else "(no steps)"
                print(
                    f"[mc-pilco] policy opt: {log.steps_done} steps, cost "
                    f"{cost_span}, reinits={log.reinit_count}, "
                    f"{log.wall_clock_s:.1f}s "
                    f"({1e3 * log.wall_clock_s / max(log.steps_done, 1):.2f} ms/step)"
                )
            self.save_checkpoint(stage=f"policy_trial{trial}")

            if self.plant is not None:
                # num_collections keeps control-trial randomness disjoint from
                # exploration trials even when num_explorations > 1 (a
                # trial_index of trial+1 would collide with exploration index
                # trial+1 in collect()/_sample_x0)
                self.collect(T_control, trial_index=self.num_collections, exploration=False)
                if verbose:
                    print(f"[mc-pilco] pre-update one-step MSE: {self.one_step_mse()}")
                    print(f"[mc-pilco] pre-update rollout  MSE: {self.rollout_mse()}")
                # post-interaction checkpoint (MC_PILCO.py:245-250)
                self.save_checkpoint(stage=f"complete_trial{trial}")
            if on_trial_end is not None:
                on_trial_end(self, trial)
        return self.trial_logs

    # ------------------------------------------------------------ persistence

    def auto_resume(self) -> int:
        """Resume from the newest post-interaction checkpoint in log_dir.

        ``reinforce`` continues from the restored state (start_trial =
        len(trial_logs), exploration skipped when num_collections > 0), so a
        seed interrupted mid-trial — e.g. by the sweep watchdog killing a
        stalled tunnel dispatch — re-runs only its in-flight trial instead of
        the whole training.  Returns the number of completed trials loaded
        (0 = nothing to resume)."""
        if not self.log_dir:
            return 0
        import glob
        import re

        dirs = [
            d for d in glob.glob(os.path.join(self.log_dir, "complete_trial*"))
            if re.search(r"complete_trial(\d+)$", d)
        ]
        if not dirs:
            return 0
        latest = max(dirs, key=lambda d: int(re.search(r"(\d+)$", d).group(1)))
        self._check_resume_config(latest)
        self.load_checkpoint(latest)
        return len(self.trial_logs)

    def _check_resume_config(self, path: str) -> None:
        """Refuse to auto-resume from a checkpoint written under a DIFFERENT
        scenario config: seed log dirs persist across sweep invocations, so
        resuming after a config or code-default change would silently replay
        stale state as a fresh sample (or crash on a shape mismatch deep in
        load).  Compares the JSON-normalized scenario config stored in the
        checkpoint meta against the current one, ignoring ``log_dir`` (pure
        bookkeeping).  No-op when either side carries no scenario config."""
        import json as _json

        if self.scenario_config is None:
            return
        stored = ckpt.peek_meta(path).get("scenario")
        if not stored:
            return
        current = _json.loads(
            _json.dumps(
                {"name": self.scenario_name, "config": dataclasses.asdict(self.scenario_config)},
                default=str,
            )
        )
        for side in (stored, current):
            side.get("config", {}).pop("log_dir", None)
        if stored != current:
            diffs = [
                f"{k}: checkpoint={stored.get('config', {}).get(k)!r} "
                f"current={current.get('config', {}).get(k)!r}"
                for k in sorted(set(stored.get("config", {})) | set(current.get("config", {})))
                if stored.get("config", {}).get(k) != current.get("config", {}).get(k)
            ]
            if stored.get("name") != current.get("name"):
                diffs.insert(0, f"scenario: {stored.get('name')!r} vs {current.get('name')!r}")
            raise RuntimeError(
                f"auto-resume refused: checkpoint {path} was written under a "
                f"different scenario config ({'; '.join(diffs) or 'structural change'}). "
                "Delete the stale log dir (or re-run without --auto-resume) to start fresh."
            )

    def save_checkpoint(self, stage: str) -> None:
        if not self.log_dir:
            return
        path = os.path.join(self.log_dir, stage)
        trees = {
            "policy_params": self.policy_params,
            "expl_params": self.expl_params,
            "gp_x": self.gp_x,
            "gp_y": self.gp_y,
        }
        if self.gp_params is not None:
            trees["gp_params"] = self.gp_params
        # full TrialLog fidelity: per-log arrays (incl. particle snapshots,
        # ~0.4-2 MB/trial) go into their own fixed-structure pytrees so a
        # resumed run replays/plots identically to an unbroken one
        for i, l in enumerate(self.trial_logs):
            trees[f"trial_log_{i}"] = {
                "cost": l.cost_history,
                "std": l.std_history,
                "p_states": l.particles_states,
                "p_inputs": l.particles_inputs,
            }
        meta = {
            "seed": self.seed,
            "num_collections": self.num_collections,
            "num_exploration_trials": self.num_exploration_trials,
            "dt": self.dt,
            "stage": stage,
            "scenario": (
                {
                    "name": self.scenario_name,
                    "config": dataclasses.asdict(self.scenario_config),
                }
                if self.scenario_config is not None
                else None
            ),
            "trial_measured": [t.measured.tolist() for t in self.trials],
            "trial_inputs": [t.inputs.tolist() for t in self.trials],
            "trial_true": [t.true.tolist() for t in self.trials],
            "trial_noisy": [t.noisy.tolist() for t in self.trials],
            "num_trial_logs": len(self.trial_logs),
            "trial_log_scalars": [
                {
                    "steps_done": int(l.steps_done),
                    "reinit_count": int(l.reinit_count),
                    "wall_clock_s": float(l.wall_clock_s),
                }
                for l in self.trial_logs
            ],
        }
        ckpt.save(path, trees, meta)

    def load_checkpoint(self, path: str) -> None:
        """Resume from a checkpoint directory (load_model_from_log analog,
        MC_PILCO.py:711-751): restores params + dataset and rebuilds the
        posterior cache."""
        templates = {
            "policy_params": self.policy_params,
            "expl_params": self.expl_params,
            "gp_x": self.gp_x,
            "gp_y": self.gp_y,
        }
        if self.gp_params is None:
            self.gp_params = self.gp.init_params(
                sigma_n=self.gp_sigma_n_init, per_head_overrides=self.gp_init_overrides
            )
        templates["gp_params"] = self.gp_params
        trees, meta = ckpt.load(path, templates)
        self.policy_params = trees["policy_params"]
        self.expl_params = trees["expl_params"]
        self.gp_x = np.asarray(trees["gp_x"], np.float32).reshape(-1, self.model.gp_input_dim)
        self.gp_y = np.asarray(trees["gp_y"], np.float32).reshape(self.gp.num_heads, -1)
        self.gp_params = trees["gp_params"]
        self.num_collections = int(meta["num_collections"])
        self.num_exploration_trials = int(meta.get("num_exploration_trials", 0))
        noisy = meta.get("trial_noisy") or meta["trial_measured"]
        self.trials = [
            TrialData(
                measured=np.asarray(m, np.float32),
                inputs=np.asarray(i, np.float32),
                true=np.asarray(t, np.float32),
                noisy=np.asarray(n, np.float32),
            )
            for m, i, t, n in zip(
                meta["trial_measured"], meta["trial_inputs"], meta["trial_true"], noisy
            )
        ]
        if "num_trial_logs" in meta:
            n_logs = int(meta["num_trial_logs"])
            tmpl = {"cost": np.zeros(0), "std": np.zeros(0),
                    "p_states": np.zeros(0), "p_inputs": np.zeros(0)}
            log_trees, _ = ckpt.load(path, {f"trial_log_{i}": tmpl for i in range(n_logs)})
            self.trial_logs = [
                TrialLog(
                    cost_history=np.asarray(log_trees[f"trial_log_{i}"]["cost"], np.float32),
                    std_history=np.asarray(log_trees[f"trial_log_{i}"]["std"], np.float32),
                    steps_done=int(sc["steps_done"]),
                    particles_states=np.asarray(log_trees[f"trial_log_{i}"]["p_states"]),
                    particles_inputs=np.asarray(log_trees[f"trial_log_{i}"]["p_inputs"]),
                    reinit_count=int(sc["reinit_count"]),
                    wall_clock_s=float(sc["wall_clock_s"]),
                )
                for i, sc in enumerate(meta["trial_log_scalars"])
            ]
        else:  # pre-round-3 checkpoint: cost histories only
            self.trial_logs = [
                TrialLog(
                    cost_history=np.asarray(c, np.float32),
                    std_history=np.zeros(len(c), np.float32),
                    steps_done=len(c),
                    particles_states=np.zeros(0),
                    particles_inputs=np.zeros(0),
                    reinit_count=0,
                    wall_clock_s=0.0,
                )
                for c in meta["cost_histories"]
            ]
        # rebuild posterior cache (pretrain_gp analog, MC_PILCO.py:749-751)
        self.posterior = self._build_posterior(self._padded_data())
