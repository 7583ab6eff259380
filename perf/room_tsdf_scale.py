"""Room-scale sparse-TSDF fusion + extraction timing (VERDICT r3 weak #5).

Synthetic room (5 x 4 x 2.5 m box interior) fused at the reference's
1 cm voxels (Open3DTSDFFusion defaults, export_mesh.py:939) from 24
analytic depth frames (ray-AABB exit distances — exact depth of the
walls/floor/ceiling). Reports brick count, integrate time/frame, and
extract_mesh wall time. CPU-only (forces jax_platforms=cpu: the brick
update is a host-side pipeline; the tunneled TPU would only add
transfer latency).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from dnsplatter_tpu.mesh.tsdf_sparse import SparseTSDF, SparseTSDFConfig

W, H = 640, 480
FX = FY = 380.0
CX, CY = W / 2, H / 2
ROOM = np.array([5.0, 2.5, 4.0])  # x span, y (height), z span


def depth_box_interior(c2w_cv):
    """Exact depth to the room box walls from inside (ray-AABB exit)."""
    uu, vv = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    d_cam = np.stack([(uu - CX) / FX, (vv - CY) / FY, np.ones_like(uu)], -1)
    R, t = c2w_cv[:3, :3], c2w_cv[:3, 3]
    d_w = d_cam @ R.T
    lo, hi = -ROOM / 2, ROOM / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (lo - t) / d_w
        t2 = (hi - t) / d_w
    t_exit = np.nanmin(np.where(np.maximum(t1, t2) > 0,
                                np.maximum(t1, t2), np.inf), axis=-1)
    z = t_exit * 1.0  # parametric distance; z-depth = t_exit * d_cam_z (=1)
    return z.astype(np.float32)


def main():
    # 6 view directions x 4 positions inside the room
    dirs = [(1, 0, 0), (-1, 0, 0), (0, 0, 1), (0, 0, -1),
            (0, 1, 0.01), (0, -1, 0.01)]
    posns = [(-1.0, 0.0, -0.8), (1.0, 0.0, -0.8), (-1.0, 0.0, 0.8),
             (1.0, 0.0, 0.8)]
    frames = []
    for px, py, pz in posns:
        for dx, dy, dz in dirs:
            fwd = np.array([dx, dy, dz], np.float64)
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, 1.0, 0.0])
            if abs(fwd @ up) > 0.95:
                up = np.array([1.0, 0.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            dn = np.cross(fwd, right)
            c2w_cv = np.eye(4)
            c2w_cv[:3, 0], c2w_cv[:3, 1], c2w_cv[:3, 2] = right, dn, fwd
            c2w_cv[:3, 3] = (px, py, pz)
            frames.append(c2w_cv)

    vol = SparseTSDF(origin=(-3.0, -2.0, -2.5),
                     cfg=SparseTSDFConfig(voxel_size=0.01, sdf_trunc=0.03,
                                          depth_subsample=2))
    rgb = np.full((H, W, 3), 0.6, np.float32)
    gl = np.diag([1.0, -1.0, -1.0, 1.0])
    t0 = time.perf_counter()
    for i, c2w_cv in enumerate(frames):
        depth = depth_box_interior(c2w_cv)
        c2w_gl = c2w_cv @ gl  # integrate() expects the OpenGL c2w
        t1 = time.perf_counter()
        vol.integrate(depth, rgb, c2w_gl, FX, FY, CX, CY)
        if i == 0:
            np.asarray(vol.tsdf).sum()  # force
        print(f"frame {i}: bricks={vol.n_slots} "
              f"({time.perf_counter() - t1:.2f}s)", flush=True)
    np.asarray(vol.tsdf).sum()
    t_int = time.perf_counter() - t0
    print(f"integrate: {len(frames)} frames, {vol.n_slots} bricks, "
          f"{t_int:.1f}s total ({t_int / len(frames):.2f}s/frame)")

    t0 = time.perf_counter()
    verts, faces, cols = vol.extract_mesh()
    t_ext = time.perf_counter() - t0
    print(f"extract_mesh: {len(verts)} verts, {len(faces)} faces "
          f"in {t_ext:.1f}s")
    # sanity: the mesh must span the room extents at ~1 cm accuracy.
    # Use percentile extents — projective TSDF smears a few vertices
    # past the walls at grazing incidence (Open3D's ScalableTSDFVolume
    # shows the same artifact), so the max vertex is not the metric.
    span = (np.percentile(verts, 99.9, axis=0)
            - np.percentile(verts, 0.1, axis=0))
    print(f"mesh span (p99.9-p0.1): {span} (room {ROOM})")
    # distance of each vertex to the box surface (exact for an AABB)
    q = np.abs(verts) - ROOM[None, :] / 2
    dist = np.linalg.norm(np.maximum(q, 0.0), axis=-1) + np.minimum(
        q.max(-1), 0.0)
    rms = float(np.sqrt(np.mean(dist ** 2)))
    frac_off = float(np.mean(np.abs(dist) > 0.03))
    print(f"vertex-to-box distance: rms={rms * 100:.2f} cm, "
          f"|d|>3cm frac={frac_off:.4f}")
    assert np.all(np.abs(span - ROOM) < 0.1), span
    assert rms < 0.03, rms


if __name__ == "__main__":
    main()
