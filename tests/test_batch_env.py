"""Batched multi-env generation tests (the vmap replacement for mp.Pool)."""

import os

import numpy as np
import pytest

from adaptigraph_tpu.utils import Config


@pytest.fixture
def tiny_batch(monkeypatch):
    import adaptigraph_tpu.sim.env as env_mod
    from adaptigraph_tpu.scenes.build import Caps
    from adaptigraph_tpu.sim.batch_env import BatchSimEnv
    from tests.test_sim import _tiny_build

    monkeypatch.setattr(env_mod, "build_scene", _tiny_build)
    monkeypatch.setitem(env_mod.MATERIAL_CAPS, "rope", Caps(n=64, s=4, c=2, k=4, m=8))
    cfg = Config({"dataset": {
        "obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 10,
        "screenWidth": 32, "screenHeight": 32, "max_chunks": 3,
        "settle_steps": 10, "action_space": 2, "camera_view": 1, "fps": False,
    }})
    return BatchSimEnv(cfg, batch=3)


class TestBatchEnv:
    def test_lockstep_matches_single_env(self, tiny_batch):
        """Env 0 of a batch must evolve identically to a lone SimEnv given
        the same seed and action."""
        tiny_batch.reset([7, 8, 9])
        single = tiny_batch.envs[0]
        # snapshot positions after reset
        p_batch0 = np.asarray(tiny_batch.states.particles.pos[0])

        action = np.array([-1.5, 0.1, 0.8, 0.1])
        pos_rec, plans, nan_any = tiny_batch.run_pushes([action, None, None])
        after0 = np.asarray(tiny_batch.states.particles.pos[0])

        # env 0 was pushed: it moved; env 1 held (parked no-op)
        assert np.abs(after0 - p_batch0).max() > 0.01
        assert pos_rec.shape[0] == 3 and pos_rec.shape[2] == 64
        assert not nan_any.any()
        assert plans[0]["t_push"] > 0 and plans[1]["t_push"] == 0

    def test_batch_capture_contact_gated(self, tiny_batch):
        """capture() must apply the same contact-gated cadence as the single
        env: with the default intervals every stored frame is a CHUNK
        boundary and frame count <= chunk count."""
        tiny_batch.reset([4, 5, 6])
        action = np.array([-1.5, 0.1, 0.8, 0.1])
        pos_rec, plans, _ = tiny_batch.run_pushes([action, action, None])
        data = ([], [], [])
        tiny_batch.envs[0]._eef_prev = None
        tiny_batch.capture(0, pos_rec, plans, data)
        assert 1 <= len(data[0]) <= tiny_batch.envs[0].max_chunks
        assert len(data[0]) == len(data[1]) == len(data[2])

    def test_seed_isolation(self, tiny_batch):
        tiny_batch.reset([1, 2, 3])
        a1 = tiny_batch.envs[0].sample_action()
        a2 = tiny_batch.envs[1].sample_action()
        assert not np.allclose(a1, a2)  # per-env rngs differ


class TestGenerateBatch:
    def test_writes_episodes(self, monkeypatch, tmp_path):
        import adaptigraph_tpu.sim.env as env_mod
        from adaptigraph_tpu.scenes.build import Caps
        from adaptigraph_tpu.sim.batch_env import generate_batch
        from tests.test_sim import _tiny_build

        monkeypatch.setattr(env_mod, "build_scene", _tiny_build)
        monkeypatch.setitem(env_mod.MATERIAL_CAPS, "rope",
                            Caps(n=64, s=4, c=2, k=4, m=8))
        cfg = Config({"dataset": {
            "obj": "rope", "pusher_len": 1.0, "robot_speed_inv": 10,
            "screenWidth": 32, "screenHeight": 32, "max_chunks": 3,
            "settle_steps": 10, "action_space": 2, "camera_view": 1,
            "fps": False, "n_timestep": 1, "contact_interval": 40,
        }})
        generate_batch(cfg, [0, 1], str(tmp_path))
        for epi in (0, 1):
            d = os.path.join(tmp_path, "rope", f"{epi:06}")
            files = os.listdir(d)
            assert "00.h5" in files and "property_params.pkl" in files


class TestGripperBatch:
    def test_gripper_plan_runs_in_batch(self, monkeypatch):
        """Cloth-style gripper pushes must run through the batched scan with
        grasp attachment active and restore inv_mass afterwards."""
        import adaptigraph_tpu.sim.env as env_mod
        from adaptigraph_tpu.scenes.build import Caps
        from adaptigraph_tpu.sim.batch_env import BatchSimEnv
        from tests.test_sim import _tiny_build

        monkeypatch.setattr(env_mod, "build_scene", _tiny_build)
        monkeypatch.setitem(env_mod.MATERIAL_CAPS, "rope",
                            Caps(n=64, s=4, c=2, k=4, m=8))
        cfg = Config({"dataset": {
            "obj": "rope", "gripper": True, "pusher_len": 1.8,
            "robot_speed_inv": 10, "screenWidth": 32, "screenHeight": 32,
            "max_chunks": 3, "settle_steps": 10, "action_space": 2,
            "camera_view": 1, "fps": False,
        }})
        benv = BatchSimEnv(cfg, batch=2)
        benv.reset([11, 12])
        w0 = np.asarray(benv.envs[0]._inv_mass0)
        act = np.array([-0.2, 0.0, 0.6, 0.0])
        pos_rec, plans, nan_any = benv.run_pushes([act, None])
        assert not nan_any.any()
        # grasp schedule existed for env 0, none for the parked env
        assert plans[0]["attach_active"].max() == 1.0
        assert plans[1]["attach_active"].max() == 0.0
        # inv_mass restored after the push
        np.testing.assert_allclose(
            np.asarray(benv.envs[0].state.particles.inv_mass), w0, atol=1e-6)
