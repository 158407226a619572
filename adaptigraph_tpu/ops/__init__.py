from adaptigraph_tpu.ops.fps import farthest_point_sampling, fps_radius, fps_subsample
from adaptigraph_tpu.ops.edges import (EdgeSet, build_edges, build_edges_batch,
                                       build_edges_slotted,
                                       build_edges_slotted_batch,
                                       edges_to_incidence)
from adaptigraph_tpu.ops.losses import chamfer, masked_chamfer, box_loss, hausdorff, earth_mover_distance
