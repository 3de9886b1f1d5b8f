"""Hardware-in-the-loop workflow: external trials via the CSV file protocol,
shape validation, and policy-parameter export (MC_PILCO_Experiment analog,
reference policy_learning/MC_PILCO.py:965-1068)."""

import dataclasses
import os

import numpy as np
import pytest

from mcpilco_tpu.scenarios import cartpole_pms as scen


def _smoke_agent(tmp_path, seed=1, with_plant=True):
    cfg = dataclasses.replace(
        scen.CartpolePMSConfig(seed=seed).smoke(),
        num_particles=16, opt_steps=(4,), gp_epochs=40,
        log_dir=str(tmp_path / f"hil_{seed}_{with_plant}"),
    )
    agent, kwargs = scen.build(cfg)
    if not with_plant:
        agent.plant = None
    return agent, kwargs


class TestExternalTrial:
    @pytest.mark.slow
    def test_add_external_trial_end_to_end(self, tmp_path):
        """Plant-generated data fed through the EXTERNAL path must train the
        same model as the in-loop collect() path (same offline filtering)."""
        from mcpilco_tpu.utils import prng

        src, _ = _smoke_agent(tmp_path, with_plant=True)
        # the RAW rollout the plant produces (collect() stores it trimmed);
        # same key/x0 as collect(trial_index=0) uses internally
        k = prng.fold(prng.stream(src.key, prng.STREAM_SYSTEM), 0)
        raw = src.plant.rollout(k, src._sample_x0(0), src.exploration_policy,
                                src.expl_params, 2.0, src.dt)
        src.collect(2.0, trial_index=0, exploration=True)

        dst, _ = _smoke_agent(tmp_path, with_plant=False)
        assert dst.offline_filtering
        # raw measurements: noisy positions + junk velocities, as a real rig
        # without tachometers would deliver (the reference ignores incoming
        # velocity columns too, MC_PILCO.py:1030-1031)
        dst.add_external_trial(np.array(raw.noisy), raw.inputs)
        # identical GP dataset -> identical model inputs
        np.testing.assert_allclose(dst.gp_x, src.gp_x, atol=1e-6)
        np.testing.assert_allclose(dst.gp_y, src.gp_y, atol=1e-6)
        # and the full downstream pipeline runs on the external data
        info = dst.fit_model(scen.ModelFitOptions(num_epochs=40))
        assert np.isfinite(info["mll_last"])
        log = dst.improve_policy(
            scen.PolicyOptOptions(opt_steps=4, learning_rate=0.01, p_dropout=0.0), 0
        )
        assert np.all(np.isfinite(log.cost_history))

    def test_shape_validation(self, tmp_path):
        agent, _ = _smoke_agent(tmp_path, with_plant=False)
        good_states = np.zeros((10, 4), np.float32)
        with pytest.raises(ValueError, match=r"\[T, 4\]"):
            agent.add_external_trial(np.zeros((10, 3)), np.zeros((10, 1)))
        with pytest.raises(ValueError, match="rows"):
            agent.add_external_trial(good_states, np.zeros((7, 1)))

    def test_rejected_trial_does_not_bump_exploration_ordinal(self, tmp_path):
        """A shape-rejected exploration trial must not skew later control
        ordinals: the counter bumps only on successful ingestion."""
        agent, _ = _smoke_agent(tmp_path, with_plant=False)
        with pytest.raises(ValueError):
            agent.add_external_trial(np.zeros((10, 3)), np.zeros((10, 1)),
                                     exploration=True)
        assert agent.num_exploration_trials == 0
        agent.add_external_trial(np.zeros((10, 4), np.float32),
                                 np.zeros((10, 1)), exploration=True)
        assert agent.num_exploration_trials == 1

    def test_failing_collect_does_not_bump_exploration_ordinal(self, tmp_path):
        """collect() must follow the same ingest-then-count discipline as the
        HIL path (mc_pilco.py): a plant rollout that raises mid-trial leaves
        num_exploration_trials unchanged, so later control-trial cost
        ordinals don't shift."""
        agent, _ = _smoke_agent(tmp_path, with_plant=True)

        class ExplodingPlant:
            def rollout(self, *a, **k):
                raise RuntimeError("rig disconnected mid-trial")

        agent.plant = ExplodingPlant()
        with pytest.raises(RuntimeError, match="rig disconnected"):
            agent.collect(2.0, trial_index=0, exploration=True)
        assert agent.num_exploration_trials == 0
        assert agent.num_collections == 0

    def test_load_external_trial_csv_protocol(self, tmp_path):
        """The reference's file layout: log_dir/DATA_<trial>/noisy_samples.csv
        + input_samples.csv (MC_PILCO.py:1032-1054)."""
        from mcpilco_tpu.utils import prng

        src, _ = _smoke_agent(tmp_path, with_plant=True)
        k = prng.fold(prng.stream(src.key, prng.STREAM_SYSTEM), 0)
        raw = src.plant.rollout(k, src._sample_x0(0), src.exploration_policy,
                                src.expl_params, 2.0, src.dt)
        src.collect(2.0, trial_index=0, exploration=True)

        dst, _ = _smoke_agent(tmp_path, seed=2, with_plant=False)
        data_dir = os.path.join(dst.log_dir, "DATA_0")
        os.makedirs(data_dir)
        np.savetxt(os.path.join(data_dir, "noisy_samples.csv"), raw.noisy, delimiter=",")
        np.savetxt(os.path.join(data_dir, "input_samples.csv"), raw.inputs, delimiter=",")
        loaded = dst.load_external_trial(exploration=True)
        assert dst.num_collections == 1
        # the operator's DATA_0 exploration run must count as exploration so
        # per-trial cost schedules resolve control ordinals correctly
        assert dst.num_exploration_trials == 1
        assert loaded.measured.shape[1] == 4
        np.testing.assert_allclose(dst.gp_x, src.gp_x, atol=1e-5)

    def test_load_external_trial_missing_files(self, tmp_path):
        agent, _ = _smoke_agent(tmp_path, with_plant=False)
        with pytest.raises(FileNotFoundError, match="noisy_samples.csv"):
            agent.load_external_trial(data_dir=str(tmp_path / "nowhere"))


class TestPolicyExport:
    def test_export_policy_csv_roundtrip(self, tmp_path):
        import jax

        agent, _ = _smoke_agent(tmp_path, with_plant=True)
        paths = agent.export_policy_csv()
        leaves = jax.tree_util.tree_flatten_with_path(agent.policy_params)[0]
        assert len(paths) == len(leaves) > 0
        for (path, leaf), fp in zip(leaves, paths):
            assert os.path.exists(fp)
            loaded = np.loadtxt(fp, delimiter=",")
            np.testing.assert_allclose(
                loaded.reshape(np.asarray(leaf).shape), np.asarray(leaf), rtol=1e-5
            )
