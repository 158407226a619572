"""Granular-material pipeline integration at miniature scale: the real
granular scene builder (random convex rigid blobs, substeps 12 / iters 6),
datagen -> 5-point flat-pusher eef preprocessing (config/dynamics/
granular.yaml eef block) -> granular_scale physics labels -> training.
Covers the material-specific seams the rope e2e test does not."""

import os

import numpy as np
import pytest

from adaptigraph_tpu.utils import Config


@pytest.fixture(scope="module")
def granular_world(tmp_path_factory):
    import adaptigraph_tpu.sim.env as env_mod
    from adaptigraph_tpu.scenes.build import Caps
    from adaptigraph_tpu.sim.data_gen import gen_episode

    orig_caps = dict(env_mod.MATERIAL_CAPS)
    orig_build = env_mod.build_scene
    # small caps: the sampled granule grid truncates to fit (same mechanism
    # as the 16k production cap); a light solver schedule replaces the
    # reference 12x6 (this test checks pipeline seams, not physics fidelity)
    env_mod.MATERIAL_CAPS["granular"] = Caps(n=1024, s=0, c=8, k=512, m=8)

    def fast_build(material, rng, shapes=None, caps=None, **kw):
        return orig_build(material, rng, shapes=shapes, caps=caps,
                          scene_overrides={"substeps": 2, "iterations": 3})

    env_mod.build_scene = fast_build
    root = tmp_path_factory.mktemp("mini_gran")
    data_dir = str(root / "sim_data")
    cfg = Config({"dataset": {
        "obj": "granular", "pusher_len": 1.3, "robot_speed_inv": 20,
        "screenWidth": 48, "screenHeight": 48, "max_chunks": 4,
        "settle_steps": 15, "action_space": 4, "camera_view": 1, "fps": False,
        "n_timestep": 1, "base": 0, "color_threshold": 1e-6,
        "contact_interval": 40, "non_contact_interval": 40,
    }})
    env = None
    try:
        for epi in range(2):
            env = gen_episode(cfg, epi, True, data_dir, env=env)
    finally:
        env_mod.MATERIAL_CAPS.update(orig_caps)
        env_mod.build_scene = orig_build

    dyn_cfg = Config({
        "dataset_config": {
            "data_name": "granular", "materials": ["granular"],
            "data_dir": data_dir, "prep_data_dir": str(root / "prep"),
            "n_his": 4, "n_future": 3, "dist_thresh": 0.1,
            "ratio": {"train": [0, 0.5], "valid": [0.5, 1]},
            # 5-point flat pusher (config/dynamics/granular.yaml eef)
            "eef": {"max_neef": 5, "name": ["flat_pusher"],
                    "pos": [[0.5, 0.045, 1.25], [-0.5, 0.045, 1.25],
                            [0.0, 0.045, 1.25], [0.25, 0.045, 1.25],
                            [-0.25, 0.0, 1.25]]},
            "datasets": [{"name": "granular", "max_nobj": 48, "max_nR": 300,
                          "fps_radius_range": [0.18, 0.22],
                          "adj_radius_range": [0.38, 0.42], "topk": 5,
                          "connect_tool_all": False}],
            "randomness": {"use": True,
                           "state_noise": {"train": 0.01, "valid": 0.0},
                           "phys_noise": {"train": 0.0, "valid": 0.0}},
        },
        "train_config": {
            "out_dir": str(root / "log"), "phases": ["train", "valid"],
            "random_seed": 42, "batch_size": 8, "n_epochs": 1,
            "n_iters_per_epoch": {"train": 4, "valid": 2}, "log_interval": 10,
        },
        "model_config": {"nf_effect": 16, "pstep": 2, "attr_dim": 2,
                         "state_dim": 0, "action_dim": 3, "density_dim": 0,
                         "rel_particle_dim": 0, "rel_attr_dim": 2,
                         "rel_group_dim": 1, "rel_distance_dim": 3,
                         "rel_density_dim": 0},
        "rollout_config": {"out_dir": str(root / "rollout"), "rollout_steps": 3},
        "material_config": {
            "material_index": {"granular": 0},
            "granular": {"physics_params": [
                {"name": "particle_radius", "use": False, "min": 0.0, "max": 1.0},
                {"name": "granular_scale", "use": True, "min": 0.1, "max": 0.3},
                {"name": "distribution_r", "use": False, "min": 0.0, "max": 1.0},
                {"name": "dynamic_friction", "use": False, "min": 0.0, "max": 2.0},
            ]},
        },
    })
    return {"root": root, "data_dir": data_dir, "dyn_cfg": dyn_cfg}


class TestGranularEpisodes:
    def test_episode_files_and_physics(self, granular_world):
        import pickle

        d = os.path.join(granular_world["data_dir"], "granular")
        for epi in range(2):
            epi_dir = os.path.join(d, f"{epi:06}")
            files = sorted(os.listdir(epi_dir))
            assert "00.h5" in files and "property_params.pkl" in files
            with open(os.path.join(epi_dir, "property_params.pkl"), "rb") as f:
                props = pickle.load(f)
            assert 0.1 <= props["granular_scale"] <= 0.3

    def test_positions_finite_and_settled(self, granular_world):
        from adaptigraph_tpu.sim.episode_io import load_data

        f = os.path.join(granular_world["data_dir"], "granular", "000000", "01.h5")
        d = load_data(f)
        pos = d["positions"]
        assert np.isfinite(pos).all()
        assert d["eef_states"].shape[1:] == (1, 14)  # raw tool state, 1 link
        # granules rest on the floor, not exploded
        assert pos[..., 1].min() > -0.2 and pos[..., 1].max() < 2.0


class TestGranularPreprocessTrain:
    def test_preprocess_5pt_eef(self, granular_world):
        import pickle

        from adaptigraph_tpu.dynamics.preprocess import preprocess

        preprocess(granular_world["dyn_cfg"])
        prep = os.path.join(str(granular_world["root"]), "prep", "granular")
        assert os.path.exists(os.path.join(prep, "phys_range.txt"))
        with open(os.path.join(prep, "positions.pkl"), "rb") as f:
            pos = pickle.load(f)
        # raw 14-dim tool state expands to 5 world keypoints per frame
        assert pos["eef_pos"][0].shape[1:] == (5, 3)
        # the 5 keypoints ride a rigid body: pairwise spans stay constant
        eef = pos["eef_pos"][0]
        d01 = np.linalg.norm(eef[:, 0] - eef[:, 1], axis=-1)
        np.testing.assert_allclose(d01, d01[0], atol=1e-4)

    def test_train_one_epoch(self, granular_world):
        from adaptigraph_tpu.dynamics.train import train

        params, history = train(granular_world["dyn_cfg"])
        assert np.isfinite(history["train"]).all()
