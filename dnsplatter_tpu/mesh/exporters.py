"""Mesh export commands (parity: dn_splatter/export_mesh.py, `gs-mesh`).

Implements the reference's six exporters over a trained checkpoint:
  tsdf          TSDF fusion of rendered RGB-D (vdbfusion role,
                export_mesh.py:823-927)
  o3dtsdf       TSDF fusion with Open3D ScalableTSDFVolume defaults
                (voxel 0.01 / trunc 0.03, export_mesh.py:930-1047)
  dn            backproject rendered depth + surface normals -> oriented
                point cloud (+ TSDF mesh; the reference feeds Poisson,
                export_mesh.py:313-510). Depth-Laplacian edge filtering
                included (find_depth_edges, export_mesh.py:58-90).
  gaussians     Gaussian centers + normals -> oriented point cloud
                (the reference's GaussiansToPoisson input,
                export_mesh.py:128-310) with opacity/color filters.
  sugar-coarse  SuGaR density level-set points + normals
                (export_mesh.py:513-696)
  marching      density-grid marching isosurface (export_mesh.py:699-820)

Each command writes .ply outputs into --output-dir. `dn`/`gaussians`/
`sugar-coarse` also run the FFT Poisson solver (mesh/poisson.py) over the
oriented clouds, producing watertight Poisson meshes like the reference's
Open3D path, plus the raw point clouds and TSDF meshes.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.data import io
from dnsplatter_tpu.mesh import tsdf as tsdf_lib
from dnsplatter_tpu.models.dn_model import ModelConfig, get_outputs
from dnsplatter_tpu.ops.camera import backproject_depth
from dnsplatter_tpu.ops.rasterize import RasterizeConfig


def _render_frames(params, alive, data, model_cfg, sh_degree,
                   pair_capacity=1 << 21):
    """Yield (camera, outputs-dict) over all frames."""
    if sh_degree is None:
        sh_degree = params.sh_degree  # infer from the checkpoint
    fns = {}
    for i in range(len(data)):
        cam, _ = data.get(i)
        key = (cam.width, cam.height)
        if key not in fns:
            backend = (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
            cfg = RasterizeConfig(width=cam.width, height=cam.height,
                                  tile_size=16,
                                  chunk=128 if backend == "pallas" else 64,
                                  tile_block=32,
                                  pair_capacity=pair_capacity,
                                  backend=backend)

            @jax.jit
            def fwd(p, a, c, _cfg=cfg):
                out, _ = get_outputs(p, a, c, model_cfg, _cfg,
                                     sh_degree=sh_degree, training=False,
                                     background=jnp.zeros((3,)))
                return out

            fns[key] = fwd
        yield cam, fns[key](params, alive, cam)


def find_depth_edges(depth: np.ndarray, threshold: float = 0.01,
                     dilation: int = 2) -> np.ndarray:
    """Laplacian depth-discontinuity mask (export_mesh.py:58-90)."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    # edge-clamped Laplacian/dilation: np.roll would wrap the image
    # borders and flag spurious edges along every border row/column
    pad = np.pad(d, 1, mode="edge")
    lap = (
        -4.0 * d
        + pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]
    )
    edges = np.abs(lap) > threshold
    for _ in range(dilation):
        ep = np.pad(edges, 1, mode="edge")
        edges = (
            edges | ep[:-2, 1:-1] | ep[2:, 1:-1]
            | ep[1:-1, :-2] | ep[1:-1, 2:]
        )
    return edges


@dataclasses.dataclass
class TSDFExportConfig:
    voxel_size: float = 0.01
    sdf_trunc: float = 0.03
    depth_max: float = 5.0
    min_weight: float = 2.0
    # dense-grid memory guard: the voxel size is raised so the grid never
    # exceeds max_resolution^3 (the reference's Open3D/vdbfusion volumes
    # are sparse; ours is dense, and camera-AABB + depth_max margins can
    # span 15+ m -> 1500^3 cells at 1 cm would be ~67 GB)
    max_resolution: int = 320
    # Open3DTSDFFusion cleanup (export_mesh.py:1026-1039): drop connected
    # components smaller than max(50th-largest, 50) triangles. The `tsdf`
    # (vdbfusion-role) mode leaves it off, the `o3dtsdf` mode turns it on.
    cleanup_clusters: bool = False
    # TSDFFusion simplification (export_mesh.py:917-919): quadric
    # decimation to this triangle count (None = keep full resolution).
    target_triangles: Optional[int] = None
    # Brick-hash sparse fusion (mesh/tsdf_sparse.py) keeps the REQUESTED
    # voxel size at room scale (the reference's ScalableTSDFVolume /
    # OpenVDB are sparse; the dense grid caps at max_resolution^3).
    # "auto": sparse whenever the dense grid would have to coarsen the
    # voxels; True/False force it.
    sparse: object = "auto"


class _IndexView:
    """Length/get view of a dataset restricted to `indices`."""

    def __init__(self, data, indices):
        self._data = data
        self._idx = list(indices)

    def __len__(self):
        return len(self._idx)

    def get(self, i):
        return self._data.get(self._idx[i])


def export_tsdf(params, alive, data, output_dir: Path,
                model_cfg: ModelConfig = ModelConfig(),
                cfg: TSDFExportConfig = TSDFExportConfig(),
                sh_degree: Optional[int] = None,
                bounds: Optional[Tuple] = None) -> Path:
    """`gs-mesh tsdf` / `gs-mesh o3dtsdf`: fuse rendered RGB-D."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    cams = [data.get(i)[0] for i in range(len(data))]
    if bounds is None:
        bounds = tsdf_lib.scene_bounds_from_cameras(cams, cfg.depth_max)
    span = float(np.max(np.asarray(bounds[1]) - np.asarray(bounds[0])))
    use_sparse = (cfg.sparse is True
                  or (cfg.sparse == "auto"
                      and span / cfg.voxel_size > cfg.max_resolution))
    if use_sparse:
        # Brick-hash volume: keeps cfg.voxel_size (reference 1 cm,
        # export_mesh.py:939) regardless of room span.
        from dnsplatter_tpu.mesh.tsdf_sparse import (
            SparseTSDF, SparseTSDFConfig,
        )

        sp = SparseTSDF(
            origin=np.asarray(bounds[0], np.float32),
            cfg=SparseTSDFConfig(voxel_size=cfg.voxel_size,
                                 sdf_trunc=cfg.sdf_trunc),
        )
        for cam, out in _render_frames(params, alive, data, model_cfg,
                                       sh_degree):
            depth = np.asarray(out["depth"])
            depth = np.where(depth < cfg.depth_max, depth, 0.0)
            sp.integrate(depth, np.asarray(out["rgb"]),
                         np.asarray(cam.c2w), float(cam.fx), float(cam.fy),
                         float(cam.cx), float(cam.cy))
        verts, faces, cols = sp.extract_mesh(cfg.min_weight)
    else:
        voxel = max(cfg.voxel_size, span / cfg.max_resolution)
        vol = tsdf_lib.create_volume(
            bounds[0], bounds[1],
            tsdf_lib.TSDFConfig(voxel_size=voxel,
                                sdf_trunc=max(cfg.sdf_trunc, 3 * voxel)),
        )
        for cam, out in _render_frames(params, alive, data, model_cfg,
                                       sh_degree):
            depth = np.asarray(out["depth"])
            depth = np.where(depth < cfg.depth_max, depth, 0.0)
            vol = tsdf_lib.integrate(
                vol, depth, np.asarray(out["rgb"]), np.asarray(cam.c2w),
                float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
            )
        verts, faces, cols = tsdf_lib.extract_mesh(vol, cfg.min_weight)
    if cfg.cleanup_clusters:
        from dnsplatter_tpu.mesh.postprocess import remove_small_clusters

        verts, faces, cols = remove_small_clusters(verts, faces, cols)
    if cfg.target_triangles and len(faces) > cfg.target_triangles:
        from dnsplatter_tpu.mesh.postprocess import (
            simplify_quadric_decimation,
        )

        verts_pre, cols_pre = verts, cols
        verts, faces = simplify_quadric_decimation(
            verts, faces, cfg.target_triangles
        )
        if cols_pre is not None and len(verts_pre):
            # decimation re-positions vertices: re-sample colors from the
            # nearest pre-decimation vertex (the reference keeps Open3D's
            # interpolated attributes, export_mesh.py:917-919)
            from scipy.spatial import cKDTree

            _, nn = cKDTree(verts_pre).query(verts, k=1, workers=-1)
            cols = cols_pre[nn]
        else:
            cols = None
    out_path = output_dir / "TSDFfusion_mesh.ply"
    io.write_ply(out_path, verts, colors=cols, faces=faces)
    return out_path


def export_dn(params, alive, data, output_dir: Path,
              model_cfg: ModelConfig = ModelConfig(),
              sh_degree: Optional[int] = None,
              edge_threshold: float = 0.01,
              total_points: int = 2_000_000,
              also_tsdf: bool = True,
              poisson_resolution: int = 192) -> Path:
    """`gs-mesh dn`: depth + surface-normal backprojection with edge
    filtering -> oriented point cloud (Poisson input) [+ TSDF mesh]."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pts_all, nrm_all, col_all = [], [], []
    n_frames = max(len(data), 1)
    per_frame = max(1, total_points // n_frames)
    for cam, out in _render_frames(params, alive, data, model_cfg, sh_degree):
        depth = np.asarray(out["depth"])
        edges = find_depth_edges(depth, edge_threshold)
        c2w_cv = np.asarray(cam.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
        pts = np.asarray(
            backproject_depth(jnp.asarray(depth[..., 0]), cam.fx, cam.fy,
                              cam.cx, cam.cy, jnp.asarray(c2w_cv))
        ).reshape(-1, 3)
        # surface_normal is [0,1] camera-frame (flipped); restore world.
        n_cam = 2.0 * np.asarray(out["surface_normal"]).reshape(-1, 3) - 1.0
        n_cam = n_cam * np.array([1.0, -1.0, -1.0])  # undo display flip
        n_world = n_cam @ c2w_cv[:3, :3].T
        cols = np.asarray(out["rgb"]).reshape(-1, 3)
        acc = np.asarray(out["accumulation"]).reshape(-1)
        ok = (acc > 0.5) & ~edges.reshape(-1) & (depth.reshape(-1) > 0)
        idx = np.where(ok)[0]
        if len(idx) > per_frame:
            # uniform random subsample (the reference random-chooses its
            # total_points budget; a stride alias-patterns the cloud)
            rng = np.random.default_rng(len(pts_all))
            idx = rng.choice(idx, per_frame, replace=False)
        pts_all.append(pts[idx])
        nrm_all.append(n_world[idx])
        col_all.append(cols[idx])
    pts = np.concatenate(pts_all)
    nrm = np.concatenate(nrm_all)
    cols = np.concatenate(col_all)
    pcd_path = output_dir / "DepthAndNormals_pcd.ply"
    io.write_ply(pcd_path, pts, colors=cols, normals=nrm)
    # Poisson mesh from the oriented cloud (Open3D's role in the
    # reference; here the FFT solver in mesh/poisson.py).
    from dnsplatter_tpu.mesh.poisson import (
        PoissonConfig, density_quantile_cull, poisson_reconstruct,
        trim_mesh_to_points,
    )

    verts, faces = poisson_reconstruct(
        pts, nrm, PoissonConfig(resolution=poisson_resolution)
    )
    extent = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    verts, faces = trim_mesh_to_points(verts, faces, pts, 0.02 * extent)
    # reference's density-quantile vertex cull (export_mesh.py:486-508)
    verts, faces = density_quantile_cull(verts, faces, pts, quantile=0.1)
    mesh_path = output_dir / "DepthAndNormals_poisson_mesh.ply"
    io.write_ply(mesh_path, verts, faces=faces)
    if also_tsdf:
        export_tsdf(params, alive, data, output_dir, model_cfg,
                    sh_degree=sh_degree)
    return mesh_path


def export_gaussians(params, alive, data, output_dir: Path,
                     min_opacity: float = 0.1,
                     cull_by_color: bool = False,
                     poisson_resolution: int = 192,
                     densify_gaussians: Optional[int] = None) -> Path:
    """`gs-mesh gaussians`: centers + per-Gaussian normals as an oriented
    point cloud (export_mesh.py:128-310). `densify_gaussians` adds that
    many extra volume-weighted in-Gaussian samples carrying their parent
    Gaussian's normal/color (export_mesh.py:254-263)."""
    from dnsplatter_tpu.ops.sh import sh_to_rgb

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    alive_np = np.asarray(alive) > 0.5
    opac = np.asarray(jax.nn.sigmoid(params.opacities))
    keep = alive_np & (opac > min_opacity)
    pts = np.asarray(params.means)[keep]
    nrm = np.asarray(params.normals)[keep]
    all_cols = np.clip(np.asarray(sh_to_rgb(params.features_dc)), 0, 1)
    cols = all_cols[keep]
    if densify_gaussians:
        from dnsplatter_tpu.models.sugar import sample_points_in_gaussians

        extra, gidx = sample_points_in_gaussians(
            jax.random.PRNGKey(0), params,
            jnp.asarray(keep, jnp.float32), int(densify_gaussians),
        )
        gidx = np.asarray(gidx)
        pts = np.concatenate([pts, np.asarray(extra)])
        nrm = np.concatenate([nrm, np.asarray(params.normals)[gidx]])
        cols = np.concatenate([cols, all_cols[gidx]])
    if cull_by_color:
        keep2 = cols.mean(-1) > 0.1
        pts, nrm, cols = pts[keep2], nrm[keep2], cols[keep2]
    out_path = output_dir / "Gaussians_pcd.ply"
    io.write_ply(out_path, pts, colors=cols, normals=nrm)
    if len(pts) > 100:
        from dnsplatter_tpu.mesh.poisson import (
            PoissonConfig, poisson_reconstruct, trim_mesh_to_points,
        )

        verts, faces = poisson_reconstruct(
            pts, nrm, PoissonConfig(resolution=poisson_resolution)
        )
        extent = float(np.linalg.norm(pts.max(0) - pts.min(0)))
        verts, faces = trim_mesh_to_points(verts, faces, pts, 0.03 * extent)
        io.write_ply(output_dir / "Gaussians_poisson_mesh.ply", verts,
                     faces=faces)
    return out_path


def export_sugar_coarse(params, alive, data, output_dir: Path,
                        model_cfg: ModelConfig = ModelConfig(),
                        sh_degree: Optional[int] = None,
                        surface_levels=(0.1, 0.3, 0.5),
                        frame_stride: int = 4,
                        subsample: int = 8) -> Path:
    """`gs-mesh sugar-coarse`: density level-set points + normals
    (export_mesh.py:513-696)."""
    from dnsplatter_tpu.models.sugar import compute_level_surface_points

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    acc: dict = {lv: ([], [], []) for lv in surface_levels}
    # stride the INDICES before rendering (rendering everything and then
    # slicing would do frame_stride times the work and hold every output)
    idxs = list(range(len(data)))[::frame_stride]
    strided = _IndexView(data, idxs)
    for cam, out in _render_frames(params, alive, strided, model_cfg,
                                   sh_degree):
        res = compute_level_surface_points(
            params, alive, cam, np.asarray(out["depth"]),
            np.asarray(out["rgb"]), surface_levels=surface_levels,
            subsample=subsample,
        )
        for lv, d in res.items():
            acc[lv][0].append(d["points"])
            acc[lv][1].append(d["colors"])
            acc[lv][2].append(d["normals"])
    last = None
    for lv, (p, c, n) in acc.items():
        if not p:
            continue
        pp = np.concatenate(p)
        nn = np.concatenate(n)
        path = output_dir / f"sugar_level_{lv:.1f}_pcd.ply"
        io.write_ply(path, pp, colors=np.concatenate(c), normals=nn)
        if len(pp) > 100:
            from dnsplatter_tpu.mesh.poisson import (
                PoissonConfig, poisson_reconstruct,
            )
            from dnsplatter_tpu.mesh.postprocess import (
                filter_smooth_laplacian,
            )

            verts, faces = poisson_reconstruct(pp, nn, PoissonConfig())
            io.write_ply(
                output_dir / f"sugar_level_{lv:.1f}_poisson_mesh.ply",
                verts, faces=faces,
            )
            # the reference saves two successive Laplacian-smoothed
            # variants of each level-set mesh (export_mesh.py:681-693)
            verts = filter_smooth_laplacian(verts, faces)
            io.write_ply(
                output_dir / f"sugar_level_{lv:.1f}_smoothed_1_mesh.ply",
                verts, faces=faces,
            )
            verts = filter_smooth_laplacian(verts, faces)
            io.write_ply(
                output_dir / f"sugar_level_{lv:.1f}_smoothed_2_mesh.ply",
                verts, faces=faces,
            )
        last = path
    return last


def export_isofusion(params, alive, data, output_dir: Path,
                     model_cfg: ModelConfig = ModelConfig(),
                     sh_degree: Optional[int] = None,
                     voxel_size: float = 0.02,
                     depth_max: float = 5.0,
                     adaptive: bool = True,
                     coarse_res: int = 64,
                     octree_levels: int = 3) -> Path:
    """AGS-Mesh two-pass normal-weighted fusion (isooctree_dn.py role):
    render depth + surface normals per train camera, fuse with
    reference-normal weighting and back-face masking, extract the
    isosurface. `adaptive=True` meshes through the octree isosurfacer
    (mesh/octree.py, the IsoOctree analogue: effective resolution
    coarse_res * 2**octree_levels with near-surface-only evaluation);
    `adaptive=False` keeps the dense-grid route at `voxel_size`."""
    from dnsplatter_tpu.mesh.isofusion import (
        IsoFusionConfig, extract, fuse_normal_weighted, make_isofunc,
    )

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    frames = []
    cams = []
    for cam, out in _render_frames(params, alive, data, model_cfg, sh_degree):
        cams.append(cam)
        depth = np.asarray(out["depth"])
        depth = np.where(depth < depth_max, depth, 0.0)
        c2w_cv = np.asarray(cam.c2w) @ np.diag([1.0, -1.0, -1.0, 1.0])
        n_cam = 2.0 * np.asarray(out["surface_normal"]) - 1.0
        n_cam = n_cam * np.array([1.0, -1.0, -1.0])
        n_world = n_cam @ c2w_cv[:3, :3].T
        frames.append(
            dict(depth=depth, normal_w=n_world, c2w_gl=np.asarray(cam.c2w),
                 fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
                 cy=float(cam.cy))
        )
    bounds = tsdf_lib.scene_bounds_from_cameras(cams, depth_max)
    out_path = output_dir / "IsoFusion_mesh.ply"
    if adaptive:
        from dnsplatter_tpu.mesh.octree import adaptive_isosurface

        span = float(np.max(np.asarray(bounds[1]) - np.asarray(bounds[0])))
        cfg = IsoFusionConfig(voxel_size=span / (coarse_res * 2**octree_levels))
        isofunc = make_isofunc(frames, cfg)
        verts, faces = adaptive_isosurface(
            isofunc, bounds[0], bounds[1],
            coarse_res=coarse_res, levels=octree_levels,
        )
        io.write_ply(out_path, verts, faces=faces)
        return out_path
    vol = fuse_normal_weighted(
        frames, bounds, IsoFusionConfig(voxel_size=voxel_size)
    )
    verts, faces, _ = extract(vol)
    # normal-weighted fusion integrates no color — omit the property
    # rather than writing an all-black mesh
    io.write_ply(out_path, verts, faces=faces)
    return out_path


def export_marching(params, alive, data, output_dir: Path,
                    resolution: int = 256, level: float = 0.5,
                    padding: float = 0.1,
                    target_triangles: Optional[int] = 1_000_000) -> Path:
    """`gs-mesh marching`: density grid + isosurface (export_mesh.py:699-820).

    Grid bounds from live Gaussian extent; vertex colors from the nearest
    Gaussian's DC color.
    """
    from scipy.spatial import cKDTree

    from dnsplatter_tpu.models.sugar import get_density
    from dnsplatter_tpu.mesh.marching import marching_tetrahedra
    from dnsplatter_tpu.ops.sh import sh_to_rgb

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    alive_np = np.asarray(alive) > 0.5
    means = np.asarray(params.means)[alive_np]
    lo = means.min(0) - padding
    hi = means.max(0) + padding
    xs = [np.linspace(lo[d], hi[d], resolution) for d in range(3)]
    grid = np.stack(np.meshgrid(*xs, indexing="ij"), -1).reshape(-1, 3)

    dens = np.zeros(len(grid), np.float32)
    chunk = 1 << 17
    for s in range(0, len(grid), chunk):
        e = min(s + chunk, len(grid))
        dens[s:e] = np.asarray(
            get_density(jnp.asarray(grid[s:e], jnp.float32), params, alive,
                        clamp=False)
        )
    field = dens.reshape(resolution, resolution, resolution)
    # marching_tetrahedra extracts "inside = field < level"; density is
    # inside when ABOVE the level, so negate.
    verts, faces = marching_tetrahedra(level - field, 0.0)
    scalefac = (hi - lo) / (resolution - 1)
    verts_w = lo + verts * scalefac
    if target_triangles and len(faces) > target_triangles:
        # export_mesh.py:811-813: simplify_quadric_decimation(1M default)
        from dnsplatter_tpu.mesh.postprocess import (
            simplify_quadric_decimation,
        )

        verts_w, faces = simplify_quadric_decimation(
            verts_w, faces, target_triangles
        )

    cols = None
    if len(verts_w):
        tree = cKDTree(means)
        _, nn = tree.query(verts_w, k=1, workers=-1)
        dc = np.clip(
            np.asarray(sh_to_rgb(params.features_dc))[alive_np][nn], 0, 1
        )
        cols = dc
    out_path = output_dir / "MarchingCubes_mesh.ply"
    io.write_ply(out_path, verts_w.astype(np.float32), colors=cols,
                 faces=faces)
    return out_path
