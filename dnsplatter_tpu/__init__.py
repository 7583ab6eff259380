"""dnsplatter_tpu — a TPU-native differentiable Gaussian-splatting framework.

Re-implements the capabilities of DN-Splatter / AGS-Mesh (reference:
maturk/dn-splatter) from scratch for TPU hardware: JAX/XLA/Pallas compute
path, `jax.sharding` multi-chip scaling, and a self-contained training /
data / mesh-extraction / evaluation stack (the reference delegates these to
nerfstudio + gsplat CUDA; here the framework owns all layers).
"""

__version__ = "0.1.0"
