"""Full-pipeline integration: generate episodes -> preprocess -> train ->
rollout eval -> closed-loop planning with physics-param estimation, all at
miniature scale on the CPU mesh. This is the end-to-end seam test the
reference lacks (SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptigraph_tpu.utils import Config


@pytest.fixture(scope="module")
def mini_world(tmp_path_factory):
    """Generate 3 tiny episodes with the miniature scene."""
    import adaptigraph_tpu.sim.env as env_mod
    from adaptigraph_tpu.scenes.build import Caps
    from adaptigraph_tpu.sim.data_gen import gen_episode

    # miniature 36-particle blob standing in for rope (see test_sim)
    from tests.test_sim import _tiny_build

    orig_build = env_mod.build_scene
    orig_caps = dict(env_mod.MATERIAL_CAPS)
    env_mod.build_scene = _tiny_build
    env_mod.MATERIAL_CAPS["rope"] = Caps(n=64, s=4, c=2, k=4, m=8)
    root = tmp_path_factory.mktemp("mini")
    data_dir = str(root / "sim_data")
    cfg = Config({"dataset": {
        "obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 20,
        "screenWidth": 48, "screenHeight": 48, "max_chunks": 4,
        "settle_steps": 20, "action_space": 2, "camera_view": 1, "fps": False,
        "n_timestep": 2, "base": 0, "color_threshold": 1e-5,
        "contact_interval": 40, "non_contact_interval": 40,
    }})
    env = None
    for epi in range(3):
        env = gen_episode(cfg, epi, True, data_dir, env=env)
    env_mod.build_scene = orig_build
    env_mod.MATERIAL_CAPS.update(orig_caps)

    dyn_cfg = Config({
        "dataset_config": {
            "data_name": "rope", "materials": ["rope"],
            "data_dir": data_dir, "prep_data_dir": str(root / "prep"),
            "n_his": 4, "n_future": 3, "dist_thresh": 0.05,
            "ratio": {"train": [0, 0.67], "valid": [0.67, 1]},
            "eef": {"max_neef": 1, "name": ["stick_pusher"], "pos": [[0., 0., 1.]]},
            "datasets": [{"name": "rope", "max_nobj": 32, "max_nR": 200,
                          "fps_radius_range": [0.03, 0.05],
                          "adj_radius_range": [0.3, 0.4], "topk": 5,
                          "connect_tool_all": False}],
            "randomness": {"use": True, "state_noise": {"train": 0.01, "valid": 0.0},
                           "phys_noise": {"train": 0.0, "valid": 0.0}},
        },
        "train_config": {
            "out_dir": str(root / "log"), "phases": ["train", "valid"],
            "random_seed": 42, "batch_size": 8, "n_epochs": 2,
            "n_iters_per_epoch": {"train": 5, "valid": 2}, "log_interval": 10,
        },
        "model_config": {"nf_effect": 16, "pstep": 2, "attr_dim": 2, "state_dim": 0,
                         "action_dim": 3, "density_dim": 0,
                         "rel_particle_dim": 0, "rel_attr_dim": 2,
                         "rel_group_dim": 1, "rel_distance_dim": 3,
                         "rel_density_dim": 0},
        "rollout_config": {"out_dir": str(root / "rollout"), "rollout_steps": 5},
        "material_config": {
            "material_index": {"rope": 0},
            "rope": {"physics_params": [
                {"name": "stiffness", "use": True, "min": 0.0, "max": 1.0}]},
        },
    })
    return {"root": root, "data_dir": data_dir, "dyn_cfg": dyn_cfg}


class TestEpisodes:
    def test_episode_files_exist(self, mini_world):
        d = os.path.join(mini_world["data_dir"], "rope")
        for epi in range(3):
            epi_dir = os.path.join(d, f"{epi:06}")
            files = sorted(os.listdir(epi_dir))
            assert "00.h5" in files and "property_params.pkl" in files
            assert any(f.endswith(".h5") and f != "00.h5" for f in files)
        assert os.path.exists(os.path.join(d, "cameras", "intrinsic.npy"))

    def test_episode_content(self, mini_world):
        from adaptigraph_tpu.sim.episode_io import load_data

        f = os.path.join(mini_world["data_dir"], "rope", "000000", "01.h5")
        d = load_data(f)
        t = d["info"]["timestamp"]
        assert t >= 1
        assert d["positions"].shape == (t, 36, 3)
        assert d["eef_states"].shape == (t, 1, 14)
        assert d["observations"]["color"]["cam_0"].shape == (t, 48, 48, 3)
        # particles moved over the push OR at least positions are finite
        assert np.isfinite(d["positions"]).all()


class TestEpisodeResume:
    def test_resume_continues_at_push_granularity(self, tmp_path):
        """Push-level resume (data_gen resume=True): a partially generated
        episode continues from its checkpoint instead of re-settling, and
        already-stored pushes are untouched. This is the recovery path the
        granular campaign uses after a remote-worker hang + watchdog kill."""
        import adaptigraph_tpu.sim.env as env_mod
        from adaptigraph_tpu.scenes.build import Caps
        from adaptigraph_tpu.sim.data_gen import gen_episode
        from tests.test_sim import _tiny_build

        orig_build = env_mod.build_scene
        orig_caps = dict(env_mod.MATERIAL_CAPS)
        env_mod.build_scene = _tiny_build
        env_mod.MATERIAL_CAPS["rope"] = Caps(n=64, s=4, c=2, k=4, m=8)
        try:
            data_dir = str(tmp_path / "sim_data")
            base = {"obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 20,
                    "screenWidth": 48, "screenHeight": 48, "max_chunks": 4,
                    "settle_steps": 20, "action_space": 2, "camera_view": 1,
                    "fps": False, "base": 0, "color_threshold": 1e-5,
                    "contact_interval": 40, "non_contact_interval": 40}
            cfg1 = Config({"dataset": dict(base, n_timestep=1)})
            env = gen_episode(cfg1, 0, True, data_dir, resume=True)
            epi = os.path.join(data_dir, "rope", "000000")
            assert os.path.exists(os.path.join(epi, "01.h5"))
            assert os.path.exists(os.path.join(epi, "resume_state.npz"))
            push1 = open(os.path.join(epi, "01.h5"), "rb").read()

            # continue the same episode to 2 pushes from the checkpoint
            cfg2 = Config({"dataset": dict(base, n_timestep=2)})
            gen_episode(cfg2, 0, True, data_dir, env=env, resume=True)
            assert os.path.exists(os.path.join(epi, "02.h5"))
            assert open(os.path.join(epi, "01.h5"), "rb").read() == push1
            import numpy as _np

            z = _np.load(os.path.join(epi, "resume_state.npz"))
            assert int(z["t_next"]) == 2
            assert _np.isfinite(z["pos"]).all()
        finally:
            env_mod.build_scene = orig_build
            env_mod.MATERIAL_CAPS.update(orig_caps)


class TestPreprocessTrainRollout:
    def test_preprocess(self, mini_world):
        from adaptigraph_tpu.dynamics.preprocess import preprocess

        preprocess(mini_world["dyn_cfg"])
        prep = os.path.join(str(mini_world["root"]), "prep", "rope")
        assert os.path.exists(os.path.join(prep, "positions.pkl"))
        assert os.path.exists(os.path.join(prep, "phys_range.txt"))
        pairs = os.listdir(os.path.join(prep, "frame_pairs"))
        assert len(pairs) >= 3

    def test_device_dataset_gather_matches_host(self, mini_world):
        """The device-resident gather (train.device_dataset/_gather_raw)
        must reproduce DynDataset.raw_batch bit-for-bit — it replaces the
        host raw gather inside the fused K-step training chunks."""
        from adaptigraph_tpu.dynamics.dataset import DynDataset
        from adaptigraph_tpu.dynamics.train import _gather_raw, device_dataset

        cfg = mini_world["dyn_cfg"]
        d = DynDataset(cfg["dataset_config"], cfg["material_config"], "train")
        common, pairs = device_dataset({"train": d})
        assert common is not None
        idxs = np.arange(min(6, len(d)))
        raw = d.raw_batch(idxs)
        dev = _gather_raw(common, pairs["train"], jnp.asarray(idxs, jnp.int32))
        for k_ in raw:
            np.testing.assert_array_equal(raw[k_], np.asarray(dev[k_]),
                                          err_msg=k_)

    def test_train_fallback_host_loop(self, mini_world):
        """steps_per_call=None routes through the original per-step host
        loop; it must still train."""
        from adaptigraph_tpu.dynamics.train import train

        cfg = mini_world["dyn_cfg"]
        params, history = train(cfg, epochs=1, steps_per_call=None)
        assert np.isfinite(history["train"]).all()

    def test_train_resume_continues_epochs(self, mini_world):
        """train(resume=True) restarts from the latest checkpoint + epoch
        sidecar: a 2-epoch run followed by a resumed 3-epoch run must only
        train the one missing epoch and keep the loss history length."""
        from adaptigraph_tpu.dynamics.train import train

        cfg = mini_world["dyn_cfg"]
        train(cfg, epochs=2)
        _, h = train(cfg, epochs=3, resume=True)
        assert len(h["train"]) == 3

    def test_train_cosine_schedule_and_optstate_fallback(self, mini_world):
        """lr_schedule='cosine' trains, and resuming a plain-adam checkpoint
        under the scheduled optimizer (different opt_state pytree) must
        warm-start params with a FRESH optimizer instead of crashing."""
        import copy

        from adaptigraph_tpu.dynamics.train import train

        cfg = copy.deepcopy(mini_world["dyn_cfg"])
        prep = os.path.join(str(mini_world["root"]), "prep", "rope")
        if not os.path.exists(os.path.join(prep, "positions.pkl")):
            from adaptigraph_tpu.dynamics.preprocess import preprocess

            preprocess(cfg)  # standalone (-k) runs skip test_preprocess
        cfg["train_config"]["out_dir"] = cfg["train_config"]["out_dir"] + "_cos"
        train(cfg, epochs=1)  # plain adam checkpoint
        cfg["train_config"]["lr_schedule"] = "cosine"
        _, h = train(cfg, epochs=2, resume=True)
        assert len(h["train"]) == 2
        assert np.isfinite(h["train"]).all()

    def test_train_and_rollout_and_plan(self, mini_world):
        from adaptigraph_tpu.dynamics.train import train
        from adaptigraph_tpu.dynamics.rollout import rollout

        cfg = mini_world["dyn_cfg"]
        params, history = train(cfg, epochs=2)
        assert len(history["train"]) == 2
        assert np.isfinite(history["train"]).all()
        ckpts = os.listdir(os.path.join(str(mini_world["root"]), "log", "rope",
                                        "checkpoints"))
        assert "latest" in ckpts

        errors = rollout(cfg, ckpt="latest", rollout_steps=5)
        assert len(errors) >= 1
        assert all(np.isfinite(e).all() for e in errors)

        # closed-loop planning + physics-param estimation on the tiny world
        import adaptigraph_tpu.sim.env as env_mod
        from adaptigraph_tpu.scenes.build import Caps
        from adaptigraph_tpu.planning.plan import SimPlanEnv, plan
        from tests.test_sim import _tiny_build

        orig_build = env_mod.build_scene
        orig_caps = dict(env_mod.MATERIAL_CAPS)
        env_mod.build_scene = _tiny_build
        env_mod.MATERIAL_CAPS["rope"] = Caps(n=64, s=4, c=2, k=4, m=8)
        try:
            dg = Config({"dataset": {
                "obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 20,
                "screenWidth": 48, "screenHeight": 48, "max_chunks": 4,
                "settle_steps": 20, "action_space": 2, "camera_view": 1,
                "fps": False,
            }})
            env = SimPlanEnv(dg, seed=5)
            task = {
                "material": "rope", "config": cfg, "material_indices": {"rope": 0},
                "material_dims": {"rope": 1}, "fps_radius": 0.05,
                "adj_thresh": 0.35, "eef_num": 1, "topk": 5,
                "connect_tools_all": False, "sim_real_ratio": 10,
                "push_length": 0.1, "pusher_points": [[0.0, 0.0, 0.12]],
                "bbox": [-0.45, 0.0, -0.25, 0.45, -0.2, 0.05],
                "gripper_enable": False,
                "action_lower_lim": [-2.0, -2.0, -3.14, 2],
                "action_upper_lim": [2.0, 2.0, 3.14, 4],
                "max_n": 1, "max_nobj": 32, "max_nR": 200, "n_his": 4,
                "target_type": "box", "target": [-0.10, 0.10, -0.10, 0.10],
                "penalty_type": "rope", "n_actions": 1, "n_look_ahead": 1,
                "n_sample": 16, "noise_level": 1.0, "reward_weight": 100.0,
            }
            os.environ["PPO_ITERS"] = "6"
            save_dir = str(mini_world["root"] / "plan")

            # plan() loads configs by name; pass the dict config through a
            # patched loader
            import adaptigraph_tpu.planning.plan as plan_mod

            orig_load = plan_mod.load_config
            plan_mod.load_config = lambda name: (cfg if name is cfg or name == cfg
                                                 else orig_load(name))
            try:
                stats = plan(task, env, save_dir, use_ppo=True, n_actions=1,
                             n_sample=16, n_update_iter=2)
            finally:
                plan_mod.load_config = orig_load
            assert len(stats) == 1
            assert os.path.exists(os.path.join(save_dir, "interaction_000.npz"))
            assert os.path.exists(os.path.join(save_dir, "ppo_0.npz"))
            est = np.load(os.path.join(save_dir, "ppo_0.npz"))["physics_param"]
            assert np.all(est >= -0.2) and np.all(est <= 1.2)
        finally:
            env_mod.build_scene = orig_build
            env_mod.MATERIAL_CAPS.update(orig_caps)


class TestObservationSegmentation:
    def test_sim_plan_obs_excludes_tool_and_arm(self):
        """SimPlanEnv.get_obs must be the ground-truth dual of the
        reference's semantic segmentation (DINO+SAM prompted with obj_list,
        perception.py:68-148): perceived tabletop points come from OBJECT
        particles only, never the pusher or the xArm link hulls. r4
        regression: with the arm/pusher rendered, the depth segmenter kept
        their points and every PPO replay error was a flat ~3.0 chamfer."""
        import adaptigraph_tpu.sim.env as env_mod
        from adaptigraph_tpu.scenes.build import Caps
        from adaptigraph_tpu.planning.plan import SimPlanEnv
        from adaptigraph_tpu.planning.perception import PerceptionModule
        from tests.test_sim import _tiny_build

        orig_build = env_mod.build_scene
        orig_caps = dict(env_mod.MATERIAL_CAPS)
        env_mod.build_scene = _tiny_build
        env_mod.MATERIAL_CAPS["rope"] = Caps(n=64, s=4, c=2, k=4, m=8)
        try:
            dg = Config({"dataset": {
                "obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 20,
                "screenWidth": 96, "screenHeight": 96, "max_chunks": 4,
                "settle_steps": 20, "action_space": 2, "camera_view": 1,
                "fps": False,
            }})
            env = SimPlanEnv(dg, seed=3)
            assert env.env.n_arm > 0, "tiny world must include the arm hulls"
            colors, depths = env.get_obs()
            pm = PerceptionModule({"fps_radius": 0.05, "max_nobj": 32,
                                   "k_filter": 1.0})
            pts = pm.get_tabletop_points(colors, depths, env.cam_intr,
                                         env.cam_extr)
            assert len(pts) > 0
            particles = np.asarray(env.env.state.particles.pos)[: env.env.n_active]
            # every perceived point must be near some object particle —
            # arm/pusher surfaces are >1 unit away from the tiny blob
            d = np.linalg.norm(pts[:, None] - particles[None], axis=-1).min(1)
            assert d.max() < 0.5, f"non-object points perceived (max d {d.max():.2f})"
        finally:
            env_mod.build_scene = orig_build
            env_mod.MATERIAL_CAPS.update(orig_caps)
