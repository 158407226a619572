"""AdaptiGraph-TPU: a TPU-native material-adaptive graph dynamics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AdaptiGraph
(Boey-li/AdaptiGraph, RSS 2024): particle-based simulation of deformables
(rope, granular, cloth), graph-neural-network dynamics learning, and
MPPI planning with online physics-parameter estimation.

Design stance (TPU-first):
  * The CUDA NvFlex XPBD solver is replaced by a pure-functional JAX
    particle engine (``adaptigraph_tpu.engine``) whose step composes under
    ``jit`` / ``vmap`` / ``lax.scan`` and whose hot kernels are Pallas.
  * The torch/DGL GNN is replaced by a flax model using fixed-size edge
    lists and ``segment_sum`` aggregation (``adaptigraph_tpu.dynamics``).
  * The sequential 500-sample MPPI chunks are replaced by a single vmapped
    population shardable over a TPU mesh (``adaptigraph_tpu.planning``).

All shapes are static and mask-padded so that the entire sim → rollout →
plan pipeline stays resident on device.
"""

__version__ = "0.1.0"
