"""octfusion_tpu — a TPU-native (JAX/XLA/Pallas) octree diffusion framework.

A from-scratch rebuild of the capabilities of octree-nn/octfusion
("OctFusion: Octree-based Diffusion Models for 3D Shape Generation",
arXiv 2408.14732) designed for TPU hardware:

* octrees / dual-octree graphs as static-capacity struct-of-arrays pytrees,
* graph convolutions as segment-reduce + one large MXU GEMM,
* diffusion sampling as ``lax.scan`` loops compiled once,
* data parallelism via ``jax.sharding`` meshes (ICI collectives), not NCCL.

Nothing in here is a translation of the reference's PyTorch code; file/line
citations in docstrings point at the behaviour being matched, not copied.
"""

__version__ = "0.1.0"
