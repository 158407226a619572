"""Smoke the shaded-mesh cloth render path on the real TPU.

Renders one captured-style frame group (RENDER_GROUP frames x 4 cameras at
the campaign resolution) for a real built cloth scene through
render_frames_store with cloth_dims set, and checks the mesh actually
covered the sheet footprint. Exit 0 = safe to run the cloth campaign with
mesh rendering; nonzero = caller should fall back to splats
(ADAPTIGRAPH_CLOTH_MESH=0).
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax.numpy as jnp

from adaptigraph_tpu.utils import load_config
from adaptigraph_tpu.sim.env import SimEnv, _fwd_from_angle
from adaptigraph_tpu.sim.render import render_frames_store


def main():
    cfg = load_config('data_gen/cloth')
    cfg['dataset']['settle_steps'] = 3  # just pose the scene
    env = SimEnv(cfg)
    env.reset(seed=3, settle=True)
    assert env._cloth_dims is not None
    H, W = env.screen
    g = env.RENDER_GROUP
    pos = jnp.tile(jnp.asarray(env.state.particles.pos)[None], (g, 1, 1))
    sh = env.state.shapes
    cam_fwd = jnp.asarray(np.stack([_fwd_from_angle(a) for a in env._cam_ang]))
    t0 = time.time()
    color, depth = render_frames_store(
        pos, jnp.asarray(env.colors),
        jnp.tile(env.state.particles.active[None], (g, 1)), sh,
        jnp.tile(sh.pos[None], (g, 1, 1)), jnp.tile(sh.quat[None], (g, 1, 1)),
        jnp.asarray(np.asarray(env._cam_pos, np.float32)), cam_fwd,
        jnp.asarray(env.camera.intrinsics()), width=W, height=H,
        cloth_dims=env._cloth_dims)
    color = np.asarray(color)
    depth = np.asarray(depth)
    dt = time.time() - t0
    # the sheet must show as a solid footprint in the gate camera
    d = depth[0, env.camera_view].astype(np.float32) / 1000.0
    cloth_px = ((d > 0) & (d < 10.0)).mean()
    print(f"render group ({g}x4 cams {W}x{H}) in {dt:.1f}s; "
          f"gate-view depth coverage {cloth_px:.4f}", flush=True)
    assert color.shape == (g, 4, H, W, 3)
    assert cloth_px > 0.5, "implausible coverage; mesh path suspect"
    print("MESH_SMOKE_OK", flush=True)


if __name__ == '__main__':
    main()
