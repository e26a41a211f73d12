"""gnn_tpu — a TPU-native graph neural network training framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the ICS'22
"Rethinking graph data placement" codebase (HPC-Research-Lab/GNN):
GraphSAGE / GCN with LADIES layer-wise sampling, sparse neighborhood
aggregation (Pallas block-sparse SpMM on the MXU), performance-model-driven
feature placement with a device-resident HBM feature cache, locality-aware
sampling, and data-parallel training over `jax.sharding` meshes.
"""

__version__ = "0.1.0"
