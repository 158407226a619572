from adaptigraph_tpu.engine.state import (
    ParticleState,
    SpringSet,
    ClusterSet,
    ShapeSet,
    SolverParams,
    SceneSpec,
    SceneState,
    SHAPE_BOX,
    SHAPE_CAPSULE,
    SHAPE_PLANE,
    SHAPE_CONVEX,
)
from adaptigraph_tpu.engine.cells import cell_list_neighbors
from adaptigraph_tpu.engine.neighbors import neighbor_list
from adaptigraph_tpu.engine.solver import xpbd_step, rollout_steps
