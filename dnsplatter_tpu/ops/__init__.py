"""Core device-side ops: rotation math, spherical harmonics, cameras,
projection, rasterization (pure-JAX oracle + Pallas production kernels)."""
