"""BridgeQA-TPU: a TPU-native (JAX/XLA/Pallas) 3D Visual Question Answering framework.

A from-scratch rebuild of the capabilities of BridgeQA (AAAI 2024, 3D-VQA on
ScanQA/SQA3D): a VoteNet-style 3D detection branch over ScanNet point clouds
fused with a BLIP-style 2D vision-language branch through a twin transformer,
plus question-conditional view selection, training/eval drivers, and data
pipeline — all designed TPU-first:

- point-cloud ops (FPS, ball query, grouping, 3-NN interpolation) as pure
  XLA/Pallas programs instead of CUDA kernels;
- models as functional JAX modules jitted end-to-end (no host round-trips in
  the step function);
- parallelism via ``jax.sharding.Mesh`` + collectives instead of DDP/NCCL.
"""

__version__ = "0.1.0"
