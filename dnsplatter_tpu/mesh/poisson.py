"""Poisson surface reconstruction from oriented point clouds (JAX, FFT).

Fills the screened-Poisson role Open3D plays in the reference's
`gs-mesh dn` / `gs-mesh gaussians` / `sugar-coarse` exporters
(export_mesh.py:294-298, 476-487, 614-620): solve for an indicator
function chi whose gradient matches the (smoothed) oriented-normal field,
then extract its level set.

Dense-grid formulation (Kazhdan's equations on a regular grid instead of
an adaptive octree): splat normals into a staggered vector field V,
compute div V, and solve  lap(chi) = div V  spectrally — the FFT
diagonalizes the periodic Laplacian, so the solve is exact, global, and
runs on the TPU in one shot. The iso level is the mean of chi sampled at
the input points (the classic choice). Marching tetrahedra meshes the
level set.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PoissonConfig:
    resolution: int = 128
    padding: float = 0.1  # fraction of extent on each side
    smooth_sigma_vox: float = 1.5  # normal-splat smoothing
    screening: float = 0.0  # alpha: (lap - alpha) chi = div V  (0 = pure)
    # Solver: "fft" (spectral, exact, complex64 memory ~16 B/voxel),
    # "cg" (conjugate gradients on the Dirichlet Laplacian, f32
    # ~4 B/voxel). Recorded v5e runs (perf/tpu_poisson_scale.py,
    # 200k-point analytic sphere): 384^3 solves in 4.65 s at
    # rel-residual 1.3e-4 with radial RMS 0.08 mm, and 512^3 — the
    # reference's Poisson depth-9-effective regime
    # (export_mesh.py:294-298) — in 13.4 s at 2.1e-4 / 0.07 mm; both
    # beat the 192^3 FFT yardstick's 0.14 mm.
    # "auto" = fft up to 192^3, cg above.
    solver: str = "auto"
    cg_tol: float = 1e-5
    cg_maxiter: int = 0  # 0 -> 3 * resolution


def _splat_field(points01: jnp.ndarray, normals: jnp.ndarray,
                 res: int) -> jnp.ndarray:
    """Trilinear splat of unit normals into a (res, res, res, 3) grid."""
    x = points01 * (res - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    frac = x - x0
    grid = jnp.zeros((res, res, res, 3))
    for corner in range(8):
        off = jnp.array(
            [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
            jnp.int32,
        )
        idx = jnp.clip(x0 + off, 0, res - 1)
        w = jnp.prod(
            jnp.where(off == 1, frac, 1.0 - frac), axis=-1, keepdims=True
        )
        grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(w * normals)
    return grid


@jax.jit
def _solve_poisson(vfield: jnp.ndarray, sigma_vox: float,
                   screening: float) -> jnp.ndarray:
    """vfield: (R, R, R, 3) -> chi (R, R, R) with lap(chi) = div(V)."""
    r = vfield.shape[0]
    k = jnp.fft.fftfreq(r) * 2.0 * jnp.pi  # radians per voxel
    kx = k[:, None, None]
    ky = k[None, :, None]
    kz = k[None, None, :]

    vx = jnp.fft.fftn(vfield[..., 0])
    vy = jnp.fft.fftn(vfield[..., 1])
    vz = jnp.fft.fftn(vfield[..., 2])

    # spectral gaussian smoothing of the splatted field
    k2 = kx**2 + ky**2 + kz**2
    smooth = jnp.exp(-0.5 * (sigma_vox**2) * k2)
    vx, vy, vz = vx * smooth, vy * smooth, vz * smooth

    # div V in frequency space: i k . V
    div = 1j * (kx * vx + ky * vy + kz * vz)
    denom = -(k2 + screening)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    chi_hat = jnp.where(k2 < 1e-12, 0.0, div / denom)
    chi = jnp.real(jnp.fft.ifftn(chi_hat))
    return chi


def _laplacian(x: jnp.ndarray) -> jnp.ndarray:
    """6-point Laplacian with Dirichlet-0 boundaries (unit spacing)."""
    p = jnp.pad(x, 1)
    return (p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1]
            + p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1]
            + p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:] - 6.0 * x)


@functools.partial(jax.jit, static_argnames=("sigma_vox", "maxiter"))
def _solve_poisson_cg(vfield: jnp.ndarray, sigma_vox: float,
                      screening: float, tol: float = 1e-5,
                      maxiter: int = 600) -> jnp.ndarray:
    """Conjugate-gradient solve of (lap - screening) chi = div V with
    Dirichlet-0 boundaries (the domain is padded, so the indicator's far
    field is a constant the iso-level choice absorbs).

    f32 throughout (~1/4 the FFT path's complex64 footprint) — this is
    what makes >= 384^3 practical. The splat smoothing is a separable
    binomial approximation of the spectral gaussian; -(lap - screening)
    is SPD, so CG applies directly (one 7-point stencil per iteration,
    bandwidth-bound on TPU)."""
    from jax.scipy.sparse.linalg import cg

    b = _cg_rhs(vfield, sigma_vox)

    def matvec(x):
        return -(_laplacian(x) - screening * x)

    x, _ = cg(matvec, -b, tol=tol, maxiter=maxiter)
    return x


def _cg_rhs(vfield: jnp.ndarray, sigma_vox: float) -> jnp.ndarray:
    """div(smooth(V)) — the CG right-hand side (shared with the residual
    reporter perf/tpu_poisson_scale.py)."""
    # separable smoothing: repeated [1,2,1]/4 passes approximate a
    # gaussian with sigma^2 = reps/2 per axis
    reps = max(int(round(2.0 * sigma_vox * sigma_vox)), 0)

    def blur_axis(x, axis):
        lo = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        hi = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                  axis=axis)
        xp = jnp.concatenate([lo, x, hi], axis=axis)
        n = x.shape[axis]
        return (jax.lax.slice_in_dim(xp, 0, n, axis=axis)
                + 2.0 * jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
                + jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)) * 0.25

    v = vfield
    for _ in range(reps):
        for ax in range(3):
            v = blur_axis(v, ax)

    # div V by central differences (unit voxel spacing)
    def cdiff(x, axis):
        p = jnp.pad(x, [(1, 1) if a == axis else (0, 0) for a in range(3)])
        n = x.shape[axis]
        return 0.5 * (jax.lax.slice_in_dim(p, 2, n + 2, axis=axis)
                      - jax.lax.slice_in_dim(p, 0, n, axis=axis))

    return (cdiff(v[..., 0], 0) + cdiff(v[..., 1], 1)
            + cdiff(v[..., 2], 2))


@functools.partial(jax.jit, static_argnames=("sigma_vox",))
def cg_residual(vfield: jnp.ndarray, chi: jnp.ndarray, sigma_vox: float,
                screening: float) -> jnp.ndarray:
    """Relative residual ||(lap - screening) chi - div(smooth V)|| /
    ||div(smooth V)|| of a CG solution (recorded-run validation)."""
    b = _cg_rhs(vfield, sigma_vox)
    r = (_laplacian(chi) - screening * chi) - b
    return jnp.linalg.norm(r.ravel()) / jnp.maximum(
        jnp.linalg.norm(b.ravel()), 1e-12)


def poisson_reconstruct(
    points: np.ndarray,
    normals: np.ndarray,
    cfg: PoissonConfig = PoissonConfig(),
) -> Tuple[np.ndarray, np.ndarray]:
    """Oriented point cloud -> (vertices (V, 3), faces (F, 3))."""
    from dnsplatter_tpu.mesh.marching import marching_tetrahedra

    pts = np.asarray(points, np.float32)
    nrm = np.asarray(normals, np.float32)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)

    lo = pts.min(0)
    hi = pts.max(0)
    extent = np.maximum(hi - lo, 1e-6)
    lo_p = lo - cfg.padding * extent
    hi_p = hi + cfg.padding * extent
    span = hi_p - lo_p
    p01 = (pts - lo_p) / span

    r = cfg.resolution
    vfield = _splat_field(jnp.asarray(p01), jnp.asarray(nrm), r)
    # account for anisotropic voxel sizes: gradient in voxel units
    vfield = vfield * jnp.asarray(r / span, jnp.float32)[None, None, None, :]
    solver = cfg.solver
    if solver == "auto":
        solver = "fft" if r <= 192 else "cg"
    if solver == "cg":
        maxiter = cfg.cg_maxiter or 3 * r
        chi = _solve_poisson_cg(vfield, cfg.smooth_sigma_vox,
                                cfg.screening, cfg.cg_tol, maxiter)
    else:
        chi = _solve_poisson(vfield, cfg.smooth_sigma_vox, cfg.screening)

    # iso level: mean chi at the sample points
    ip = np.clip((p01 * (r - 1)).astype(int), 0, r - 1)
    chi_np = np.asarray(chi)
    iso = float(chi_np[ip[:, 0], ip[:, 1], ip[:, 2]].mean())

    # inside = chi > iso; marching expects inside = field < level
    verts, faces = marching_tetrahedra(iso - chi_np, 0.0)
    verts_w = lo_p + verts / (r - 1) * span
    return verts_w.astype(np.float32), faces


def trim_mesh_to_points(
    verts: np.ndarray, faces: np.ndarray, points: np.ndarray,
    max_dist: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop faces farther than `max_dist` from any input point (the
    density-quantile vertex cull of export_mesh.py:486-507 in spirit)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(verts, k=1, workers=-1)
    keep_v = d < max_dist
    keep_f = keep_v[faces].all(1)
    f = faces[keep_f]
    used = np.zeros(len(verts), bool)
    used[f] = True
    remap = np.cumsum(used) - 1
    return verts[used], remap[f].astype(np.int32)


def density_quantile_cull(
    verts: np.ndarray, faces: np.ndarray, points: np.ndarray,
    quantile: float = 0.1, k: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop the lowest-support vertices — the reference's Poisson
    density-quantile vertex cull (export_mesh.py:486-508, Open3D returns
    per-vertex densities; here support = -(distance to the k-th nearest
    input point), the same ordering)."""
    from scipy.spatial import cKDTree

    if len(verts) == 0 or len(points) < k:
        return verts, faces
    d, _ = cKDTree(points).query(verts, k=k, workers=-1)
    support = -d[:, -1]
    thr = np.quantile(support, quantile)
    keep_v = support > thr
    keep_f = keep_v[faces].all(1)
    f = faces[keep_f]
    used = np.zeros(len(verts), bool)
    used[f] = True
    remap = np.cumsum(used) - 1
    return verts[used], remap[f].astype(np.int32)
