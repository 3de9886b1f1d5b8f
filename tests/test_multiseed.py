"""Multi-seed farm: vmapped whole-training parity with the sequential path.

Every stage is a pure function of the per-seed root key, so a farmed seed
must reproduce the sequential MCPilco run of the same seed (same PRNG stream
folds) up to batched-kernel float reassociation.
"""

import dataclasses

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mcpilco_tpu.parallel import mesh as mesh_mod
from mcpilco_tpu.parallel.multiseed import SeedFarm
from mcpilco_tpu.scenarios import cartpole as scen


def _cfg(seed=3):
    return dataclasses.replace(
        scen.CartpoleConfig(seed=seed).smoke(),
        num_particles=32,
        opt_steps=(12,),
        gp_epochs=60,
        std_noise=1e-2,
    )


def _farm(seeds, mesh=None, cfg=None):
    cfg = cfg or _cfg()
    agent, kwargs = scen.build(cfg)
    farm = SeedFarm(
        agent,
        seeds,
        mesh=mesh,
        policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
    )
    res = farm.run(**kwargs, verbose=False)
    return res, kwargs


class TestSeedFarmParity:
    def test_matches_sequential_run(self):
        """Seed 3 farmed alongside other seeds == seed 3 trained alone."""
        cfg = _cfg(seed=3)
        agent, kwargs = scen.build(cfg)
        agent.reinforce(**kwargs, verbose=False)

        res, _ = _farm([2, 3, 5], cfg=_cfg(seed=0))
        i = list(res.seeds).index(3)

        # same exploration data -> same GP -> same optimization trajectory
        log = res.trial_logs[-1]
        seq = agent.trial_logs[-1]
        assert int(log.steps_done[i]) == seq.steps_done
        np.testing.assert_allclose(
            log.cost_history[i, : seq.steps_done], seq.cost_history,
            rtol=5e-3, atol=5e-3,
        )
        # same executed control trial on the plant
        np.testing.assert_allclose(
            log.control_true[i], agent.trials[-1].true, rtol=5e-2, atol=5e-2
        )

    def test_distinct_seeds_distinct_outcomes(self):
        res, _ = _farm([2, 3, 5])
        t = res.final_true
        assert np.all(np.isfinite(t))
        assert not np.allclose(t[0], t[1])
        assert not np.allclose(t[1], t[2])

    @pytest.mark.parametrize("vel_est", ["butter_cd", "savgol"])
    def test_pms_offline_filtering_matches_sequential(self, vel_est):
        """4PMS farm parity: the on-device batched offline estimator
        (filtfilt + central difference, or the savgol fit matrix)
        reproduces the sequential host offline-filtering path
        (VERDICT r2 #5)."""
        from mcpilco_tpu.scenarios import cartpole_pms as pms

        cfg = dataclasses.replace(
            pms.CartpolePMSConfig(seed=2).smoke(),
            num_particles=32, opt_steps=(12,), gp_epochs=60, vel_est=vel_est,
        )
        agent, kwargs = pms.build(cfg)
        agent.reinforce(**kwargs, verbose=False)

        agent_f, kwargs_f = pms.build(dataclasses.replace(cfg, seed=0))
        farm = SeedFarm(
            agent_f, [2, 4],
            policy_init_fn=lambda k: pms.policy_init(cfg, agent_f.policy, k),
        )
        res = farm.run(**kwargs_f, verbose=False)
        i = list(res.seeds).index(2)

        # identical training data (offline filter parity) -> same GP -> same
        # optimization trajectory and executed trial
        log = res.trial_logs[-1]
        seq = agent.trial_logs[-1]
        assert int(log.steps_done[i]) == seq.steps_done
        np.testing.assert_allclose(
            log.cost_history[i, : seq.steps_done], seq.cost_history,
            rtol=5e-3, atol=5e-3,
        )
        np.testing.assert_allclose(
            log.control_true[i], agent.trials[-1].true, rtol=5e-2, atol=5e-2
        )


class TestSeedFarmSharded:
    def test_seed_axis_sharded_over_mesh(self, devices8):
        """Pod-sliced farm: 8 seeds over an 8-device mesh, one seed per
        device, matches the unsharded farm."""
        seeds = list(range(1, 9))
        res1, _ = _farm(seeds)
        res8, _ = _farm(seeds, mesh=mesh_mod.make_mesh(8))
        np.testing.assert_allclose(
            res8.final_true, res1.final_true, rtol=5e-2, atol=5e-2
        )
        log1 = res1.trial_logs[-1]
        log8 = res8.trial_logs[-1]
        np.testing.assert_allclose(
            log8.cost_history[:, :5], log1.cost_history[:, :5], rtol=5e-3, atol=5e-3
        )

    def test_seed_particle_2d_mesh(self, devices8):
        """Composed pod sharding: 4 seed groups x 2-way particle sharding on
        a (4, 2) mesh reproduces the unsharded farm.  The farm constrains
        the seed axis to "s"; the optimizer's in-rollout particle constraint
        ("p") is vmapped over seeds and XLA propagates the joint layout."""
        seeds = [1, 2, 3, 4]
        res1, _ = _farm(seeds)

        mesh2d = mesh_mod.make_seed_particle_mesh(4, 2)
        cfg = _cfg()
        agent, kwargs = scen.build(cfg, mesh=mesh2d)
        farm = SeedFarm(
            agent, seeds, mesh=mesh2d,
            policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
        )
        res2 = farm.run(**kwargs, verbose=False)

        np.testing.assert_allclose(
            res2.final_true, res1.final_true, rtol=5e-2, atol=5e-2
        )
        log1, log2 = res1.trial_logs[-1], res2.trial_logs[-1]
        np.testing.assert_allclose(
            log2.cost_history[:, :5], log1.cost_history[:, :5], rtol=5e-3, atol=5e-3
        )

    def test_restart_lanes_match_sequential(self):
        """num_restarts > 1 farms as sequential lanes with the sequential
        path's exact key derivation, so a farmed seed with R=2 reproduces
        the same seed trained alone with R=2 (round-5 farm lift)."""
        cfg = _cfg(seed=3)
        agent, kwargs = scen.build(cfg)
        agent.optimizer = dataclasses.replace(agent.optimizer, num_restarts=2)
        agent.reinforce(**kwargs, verbose=False)

        cfg0 = _cfg(seed=0)
        agent_f, kwargs_f = scen.build(cfg0)
        agent_f.optimizer = dataclasses.replace(agent_f.optimizer, num_restarts=2)
        farm = SeedFarm(
            agent_f, [2, 3],
            policy_init_fn=lambda k: scen.policy_init(cfg0, agent_f.policy, k),
        )
        res = farm.run(**kwargs_f, verbose=False)
        i = list(res.seeds).index(3)
        np.testing.assert_allclose(
            res.trial_logs[-1].control_true[i], agent.trials[-1].true,
            rtol=5e-2, atol=5e-2,
        )

    def test_mujoco_farm_matches_sequential(self):
        """Host-plant (MuJoCo) farm: per-seed sim loop + batched fit/opt
        reproduces the sequential MuJoCo run (round-5 farm lift)."""
        pytest.importorskip("mujoco")
        from mcpilco_tpu.scenarios import cartpole_mujoco as mj

        cfg = dataclasses.replace(
            mj.CartpoleMujocoConfig(seed=3).smoke(),
            num_particles=32, opt_steps=(12,), gp_epochs=60,
        )
        agent, kwargs = mj.build(cfg)
        agent.reinforce(**kwargs, verbose=False)

        cfg0 = dataclasses.replace(cfg, seed=0)
        agent_f, kwargs_f = mj.build(cfg0)
        farm = SeedFarm(
            agent_f, [2, 3],
            policy_init_fn=lambda k: mj.policy_init(cfg0, agent_f.policy, k),
        )
        res = farm.run(**kwargs_f, verbose=False)
        i = list(res.seeds).index(3)
        np.testing.assert_allclose(
            res.trial_logs[-1].control_true[i], agent.trials[-1].true,
            rtol=5e-2, atol=5e-2,
        )

    def test_rejects_bad_configs(self):
        cfg = _cfg()
        agent, _ = scen.build(cfg)
        with pytest.raises(ValueError):
            SeedFarm(agent, [1, 2, 3], mesh=mesh_mod.make_mesh(2))
        agent2, _ = scen.build(cfg, mesh=mesh_mod.make_mesh(2))
        with pytest.raises(ValueError):
            SeedFarm(agent2, [1, 2])
        # a plain 1D particle mesh on the optimizer cannot compose with a
        # DIFFERENT farm mesh — only the shared 2D ('s', 'p') mesh can
        agent3, _ = scen.build(cfg, mesh=mesh_mod.make_mesh(2))
        with pytest.raises(ValueError):
            SeedFarm(agent3, [1, 2], mesh=mesh_mod.make_mesh(2))


class TestProgressHeartbeat:
    def test_progress_cb_ticks_at_host_returns(self):
        """The farm bumps progress_cb at every return-to-host (chunk, fit,
        collection) — the farm-mode stall watchdog's signal
        (scripts/repeat.py _start_farm_watchdog)."""
        cfg = _cfg()
        agent, kwargs = scen.build(cfg)
        ticks = []
        farm = SeedFarm(
            agent,
            [1, 2],
            policy_init_fn=lambda k: scen.policy_init(cfg, agent.policy, k),
            progress_cb=lambda: ticks.append(1),
        )
        farm.run(**kwargs, verbose=False)
        # 1 trial = exploration collect + fit + >=1 opt chunk + control
        # collect: at least 4 host returns
        assert len(ticks) >= 4
