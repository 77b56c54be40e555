import pytest

from partmanip_tpu import config


class TestProcessCfgs:
    def test_defaults(self):
        cfg, sp = config.process_cfgs([])
        assert cfg["task_name"] == "grasp_cube"
        assert cfg["algo_name"] == "ppo"
        assert cfg["task"]["num_envs"] == cfg["algo"]["num_envs"] == 2048
        assert cfg["task"]["learn_input_mode"] == "normal_state"
        assert cfg["algo"]["succ_value"] == 500
        assert cfg["algo"]["model"]["clipAction"] == 1.0
        assert sp.dt == pytest.approx(1 / 60)
        assert sp.substeps == 4

    def test_task_algo_selection(self):
        cfg, _ = config.process_cfgs(["--taskcfg", "open_drawer",
                                      "--algocfg", "dagger"])
        assert cfg["task_name"] == "open_drawer"
        assert cfg["algo_name"] == "dagger"
        assert cfg["task"]["obs_mode"]["normal_state"] == 53
        assert cfg["task"]["robot"]["assetFile"] == "franka_panda_sdf_mobile"
        assert cfg["algo"]["num_envs"] == 16
        # succ_value is empty for open_drawer (None)
        assert cfg["algo"]["succ_value"] is None

    def test_dotted_overrides(self):
        cfg, _ = config.process_cfgs([
            "--algo.num_envs", "64",
            "--algo.lr", "1e-3",
            "--task.random_reset",           # bool flip: True → False
            "--algo.model.network.hid_dim", "32", "64",
            "--exp_name", "myrun",
        ])
        assert cfg["algo"]["num_envs"] == 64
        assert cfg["task"]["num_envs"] == 64  # cross-copied after override
        assert cfg["algo"]["lr"] == pytest.approx(1e-3)
        assert cfg["task"]["random_reset"] is False
        assert cfg["algo"]["model"]["network"]["hid_dim"] == [32, 64]
        assert cfg["exp_name"] == "myrun"

    def test_bool_flip_true_direction(self):
        cfg, _ = config.process_cfgs(["--test_only"])
        assert cfg["test_only"] is True
        assert cfg["algo"]["test_only"] is True

    def test_sim_override(self):
        _, sp = config.process_cfgs(["--sim.inner_substeps", "2",
                                     "--sim.contact_kn", "5e4"])
        assert sp.inner_substeps == 2
        assert sp.contact_kn == pytest.approx(5e4)
