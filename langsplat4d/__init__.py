"""langsplat4d — a TPU-native (JAX/XLA/Pallas) 4D Language Gaussian Splatting framework.

A from-scratch rebuild of the capabilities of `pouyaardehkhani/4DLangSplat`
(CVPR 2025, "4D LangSplat") designed TPU-first:

- Gaussian scene state as fixed-capacity padded pytrees (static shapes under jit).
- A differentiable tile-based rasterizer whose per-tile alpha compositing is
  expressed as transmittance-weighted matmuls (MXU) with Pallas kernels for the
  hot paths, replacing the reference's CUDA `4d-langsplat-rasterization`
  submodule (reference: gaussian_renderer/__init__.py:219-228).
- HexPlane (K-Planes) spatio-temporal fields + deformation MLPs as pure
  functional pytrees (reference: scene/hexplane.py, scene/deformation.py).
- Multi-chip scale-out via `jax.sharding.Mesh` (data-parallel over cameras,
  Gaussian-sharded compute) — a new capability, absent in the reference.
"""

__version__ = "0.1.0"
