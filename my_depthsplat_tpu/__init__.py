"""my_depthsplat_tpu — a TPU-native (JAX / XLA / Pallas / pjit) DepthSplat framework.

A from-scratch re-design of the capabilities of the reference
``yuehuarulian/my_depthsplat`` (PyTorch/CUDA feed-forward 3D Gaussian Splatting):

- ``geometry``  — camera projection / ray math (reference: src/geometry/projection.py)
- ``gaussians`` — pixel-aligned Gaussian parameterization + SH
  (reference: src/model/encoder/common/gaussian_adapter.py)
- ``render``    — differentiable 3DGS rasterizer: XLA oracle + Pallas tile kernels
  (reference: external diff-gaussian-rasterization CUDA pkg, driven from
  src/model/decoder/cuda_splatting.py)
- ``models``    — depth branches (MultiViewUniMatch, PromptDA), encoder, decoder
  (reference: src/model/encoder/*)
- ``ops``       — TPU-friendly primitives (grid-sample gather, resize, attention)
- ``data``      — chunked datasets, view samplers, shims (reference: src/dataset/*)
- ``train``     — losses, optimizer, pjit train step, checkpointing
- ``eval``      — metrics (PSNR/SSIM/LPIPS), benchmarking
- ``parallel``  — mesh / sharding helpers (reference used Lightning DDP; here it's
  jax.sharding over an explicit device mesh)
"""

__version__ = "0.1.0"
