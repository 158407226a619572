from adaptigraph_tpu.sim.cameras import CameraRig
from adaptigraph_tpu.sim.render import render_frame
from adaptigraph_tpu.sim.env import SimEnv
