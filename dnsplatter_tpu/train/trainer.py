"""Training loop: jitted step + host-side refinement cadence + checkpoints.

Owns what the reference delegates to nerfstudio's Trainer (dn_config.py:
13-73): the 30k-iteration loop over sequential full-image batches, per-group
Adam, the BEFORE/AFTER_TRAIN_ITERATION refinement callbacks
(dn_model.py:928-952 -> refinement_after), SH-degree schedule, checkpoint
save/load, and metric logging.

Design: one compiled `train_step` per (image shape, SH degree) pair — the
SH schedule bumps 4 times total, everything else is shape-static. The
refinement cadence (dn_model.py:281-301) is evaluated host-side where
`step` is a Python int, dispatching to the jitted strategy transforms.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dnsplatter_tpu.models.dn_model import (
    ModelConfig,
    apply_binary_opacities,
    compute_loss,
    get_outputs,
    sh_degree_to_use,
)
from dnsplatter_tpu.models.gaussians import GaussianParams
from dnsplatter_tpu.ops.camera import Camera
from dnsplatter_tpu.ops.rasterize import RasterizeConfig
from dnsplatter_tpu.train.optim import (
    AdamState, CamOptState, OptimConfig, adam_step, cam_opt_update,
    init_adam, init_cam_opt,
)
from dnsplatter_tpu.train.strategy import (
    RefineStats,
    cull_only,
    densify_and_cull,
    init_stats,
    reset_opacity,
    update_stats,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    max_iterations: int = 30000
    steps_per_eval_image: int = 500
    steps_per_save: int = 1_000_000  # end-of-run only, like the reference
    seed: int = 42
    pair_capacity: int = 1 << 21
    tile_size: int = 16
    chunk: int = 128  # pallas DMA alignment needs multiples of 128 on TPU
    tile_block: int = 32
    backend: str = "auto"  # auto -> pallas kernels on TPU, xla elsewhere
    # Binning sort scheme passed through to RasterizeConfig. "depthq"
    # (tile + 20-bit quantized depth in one uint32 key, no N-scale depth
    # pre-sort) is the fastest measured scheme at every profiled scale
    # (-61 ms/step at 1M seeds / 2M capacity; equal-or-better at 100k)
    # and differs from the exact schemes only by sub-2^-20-relative
    # depth reorders (on-device render rel 7.5e-6). Set "auto" for the
    # exact packed/tilekey schemes (oracle-exact ordering).
    sort_scheme: str = "depthq"
    # Live-window compaction budget for the backward gradient reduction
    # (RasterizeConfig.compact_frac). < 0 keeps the RasterizeConfig
    # default (0.375); tune toward the scene's measured live-window
    # fraction for extra step time (bench scenes: 0.33 @100k, 0.11 @1M;
    # overflowing budgets fall back at runtime, ~+3 ms, never an error).
    compact_frac: float = -1.0
    # K sequential optimizer steps per device dispatch (lax.scan) —
    # identical math to K single steps, but amortizes per-dispatch launch
    # latency (important behind the TPU tunnel). Must divide the
    # refinement cadence; 1 disables.
    steps_per_dispatch: int = 1
    # Multi-chip: shard the Gaussian state over the first `devices` devices
    # of a 1-D mesh (0/1 = single-device). The per-Gaussian stages run
    # sharded and GSPMD inserts the ICI collectives; refinement
    # (densify/cull/reset) also runs on the sharded state and the layout
    # is re-pinned after each event. CLI: `--train.devices N`.
    devices: int = 0
    # Multi-host / data-parallel training (parallel/distributed.py — the
    # reference's DDP role, dn_pipeline.py:122-128). `distributed=True`
    # calls jax.distributed.initialize (coordinator from the standard
    # JAX_* env) and builds ONE global (dp, gauss) mesh: dp spans
    # processes (each host trains on its own camera shard, gradients
    # pmean'd over DCN), gauss spans each host's chips. `dp` > 1 forces
    # the data-parallel width explicitly (usable single-process for
    # testing: dp*gauss <= visible devices). Checkpoints are
    # process-0-gated. CLI: `--train.distributed true` / `--train.dp N`.
    distributed: bool = False
    dp: int = 1
    # Multi-chip strategy for `devices` > 1:
    #   "gspmd" — Gaussian-axis sharding, GSPMD inserts the collectives
    #             (parallel/sharding.py; collective sizes are pinned by
    #             tests/test_parallel.py).
    #   "tile"  — explicit shard_map: per-slab rasterize fwd/bwd with the
    #             screen-payload all_gather / Gaussian-grad psum
    #             (parallel/tile_sharding.make_tile_train_step).
    parallel_strategy: str = "gspmd"
    # Size pair_capacity from the data at startup: audit raw
    # (gaussian, tile) pair counts over sample frames and take
    # max * auto_capacity_margin (rounded to the chunk). Every sort,
    # gather, and slab in the rasterizer scales with the STATIC
    # capacity, so a 2x-oversized default costs real step time; the
    # margin covers densification growth (overflow degrades gracefully
    # by dropping the deepest Gaussians whole). Default ON: the audit is
    # 8 frames at startup and the right-sized capacity is a measured
    # 45 -> 39 ms/step win vs the 1<<21 default on the bench scene.
    auto_pair_capacity: bool = True
    auto_capacity_margin: float = 3.0
    # Gaussian-state capacity (0 = capacity_margin x the seed count,
    # rounded to 4096). Every N-scale stage — projection, expansion
    # boundary tables, gradient reduction, Adam — scales with CAPACITY,
    # not the live count (measured 247 -> 153 ms/step at 1M seeds when
    # the 2x default padding was cut to 1.2x, perf/tpu_train_1m_diag.py),
    # so the default starts tight and GROWS on demand: when a densify
    # event fills >= 95% of capacity, the state is re-padded to
    # capacity_growth x (a host-side recompile boundary — jit retraces
    # on the new shapes; rare by construction). capacity_growth <= 1
    # disables growth (densify overflow then degrades gracefully by
    # dropping extra children).
    capacity: int = 0
    capacity_margin: float = 1.25
    capacity_growth: float = 1.5
    # Observability (the reference trains with the nerfstudio viewer on
    # and surfaces metrics to wandb/tb writers; dn_config.py:69-70).
    viewer: bool = False
    viewer_port: int = 7007
    tensorboard: bool = False
    # Keep each frame's batch device-resident after its first upload
    # (host->device transfers through the TPU tunnel run at ~30 MB/s and
    # would otherwise dominate the step time on real datasets). Disable
    # for datasets larger than spare HBM.
    cache_batches_on_device: bool = True


def make_train_step(
    model_cfg: ModelConfig,
    optim_cfg: OptimConfig,
    raster_cfg: RasterizeConfig,
    sh_degree: int,
) -> Callable:
    """Build the jitted train step for one (image-shape, sh-degree)."""

    max_size = float(max(raster_cfg.width, raster_cfg.height))

    use_cam_opt = model_cfg.camera_optimizer_mode != "off"

    @jax.jit
    def step_fn(
        params: GaussianParams,
        alive: jax.Array,
        adam: AdamState,
        stats: RefineStats,
        camera: Camera,
        batch: Dict[str, jax.Array],
        step: jax.Array,
        key: jax.Array,
        cam_state: CamOptState,  # device-side pose-opt state (tiny)
        cam_i: jax.Array,  # () int32 — this frame's camera index
    ):
        kbg, kloss = jax.random.split(key)
        params = apply_binary_opacities(params, alive, model_cfg, step)
        sink = jnp.zeros_like(params.means[:, :2])

        def loss_fn(p, abs_sink, adj):
            cam = camera
            if use_cam_opt:
                from dnsplatter_tpu.models.camera_opt import apply_adjustment

                cam = apply_adjustment(camera, adj)
            outputs, info = get_outputs(
                p, alive, cam, model_cfg, raster_cfg,
                sh_degree=sh_degree, absgrad_sink=abs_sink,
                training=True, rng=kbg,
            )
            loss, ld = compute_loss(
                outputs, batch, p, alive, cam, model_cfg, step, kloss
            )
            return loss, (ld, info)

        (loss, (loss_dict, info)), (gparams, gabs, gadj) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(params, sink, cam_state.adj[cam_i])

        # Freeze dead capacity-padding slots.
        am = alive
        gparams = jax.tree.map(
            lambda g: g * am.reshape((-1,) + (1,) * (g.ndim - 1)), gparams
        )
        new_params, new_adam = adam_step(optim_cfg, params, gparams, adam, step)
        new_stats = update_stats(stats, gabs, info.radii, info.valid, max_size)
        new_cam = (cam_opt_update(optim_cfg, cam_state, cam_i, gadj, step)
                   if use_cam_opt else cam_state)
        return new_params, new_adam, new_stats, loss, loss_dict, new_cam

    return step_fn


def make_train_step_multi(
    model_cfg: ModelConfig,
    optim_cfg: OptimConfig,
    raster_cfg: RasterizeConfig,
    sh_degree: int,
    k: int,
) -> Callable:
    """K sequential train steps in one dispatch via lax.scan — bitwise the
    same update sequence as K single-step dispatches."""
    single = make_train_step(model_cfg, optim_cfg, raster_cfg, sh_degree)
    inner = single.__wrapped__ if hasattr(single, "__wrapped__") else single

    @jax.jit
    def multi(params, alive, adam, stats, cameras, batches, step0, keys,
              cam_state, cam_idx):
        def body(carry, xs):
            params, adam, stats, cam_state = carry
            camera, batch, off, key, ci = xs
            params, adam, stats, loss, _, cam_state = inner(
                params, alive, adam, stats, camera, batch, step0 + off,
                key, cam_state, ci,
            )
            return (params, adam, stats, cam_state), loss

        offs = jnp.arange(k, dtype=jnp.int32)
        (params, adam, stats, cam_state), losses = jax.lax.scan(
            body, (params, adam, stats, cam_state),
            (cameras, batches, offs, keys, cam_idx),
        )
        return params, adam, stats, losses, cam_state

    return multi


class Trainer:
    """Single-host trainer over an iterable of (camera, batch) samples.

    `data` must yield (Camera, dict of numpy/JAX arrays) pairs; the
    reference serves full images sequentially, not shuffled
    (dn_datamanager.py:93-96) — the provided datamanagers do the same.
    """

    def __init__(
        self,
        data: "object",  # SceneSource protocol: __len__, get(i) -> (cam, batch)
        seed_points: Optional[Tuple[np.ndarray, ...]] = None,
        model_cfg: ModelConfig = ModelConfig(),
        optim_cfg: OptimConfig = OptimConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        out_dir: Optional[Path] = None,
    ):
        from dnsplatter_tpu.models.gaussians import init_from_points, init_random

        self.data = data
        self.model_cfg = model_cfg
        self.optim_cfg = optim_cfg
        self.train_cfg = train_cfg
        self.out_dir = Path(out_dir) if out_dir else None
        self.key = jax.random.PRNGKey(train_cfg.seed)
        self._batch_cache: Dict[int, tuple] = {}

        self.key, kinit = jax.random.split(self.key)
        if seed_points is not None:
            pts = seed_points[0]
            cols = seed_points[1] if len(seed_points) > 1 else None
            nrms = seed_points[2] if len(seed_points) > 2 else None
            cap = train_cfg.capacity
            if not cap:
                # measured-best default: tight margin + growth-on-overflow
                # (see TrainConfig.capacity docstring)
                n_seed = int(pts.shape[0])
                cap = max(4096, int(np.ceil(
                    train_cfg.capacity_margin * n_seed / 4096) * 4096))
            self.params, self.alive, _ = init_from_points(
                kinit, pts, cols, nrms, sh_degree=model_cfg.sh_degree,
                capacity=cap,
            )
        else:
            self.params, self.alive, _ = init_random(
                kinit,
                num_points=model_cfg.num_random,
                extent=model_cfg.random_scale / 2.0,
                sh_degree=model_cfg.sh_degree,
            )
        self.adam = init_adam(self.params)
        self.stats = init_stats(self.params.capacity)
        if train_cfg.auto_pair_capacity:
            cap = self._audit_pair_capacity()
            if cap is not None:
                self.train_cfg = train_cfg = dataclasses.replace(
                    train_cfg, pair_capacity=cap
                )
                print(f"auto pair capacity: {cap}", flush=True)
        self.mesh = None
        self.dp = 1
        self.dist = None
        if train_cfg.distributed or train_cfg.dp > 1:
            from dnsplatter_tpu.parallel import distributed as D

            self.dist = D.init_distributed()
            self.dp = (train_cfg.dp if train_cfg.dp > 1
                       else max(self.dist.process_count, 1))
            devs = jax.devices()
            ndev = train_cfg.devices or len(devs)
            if model_cfg.num_downscales > 0:
                raise NotImplementedError(
                    "progressive downscaling is not wired into the dp "
                    "step (dn-splatter default num_downscales=0)"
                )
            self.mesh = D.make_hybrid_mesh(dp=self.dp, devices=devs[:ndev])
            self._shard_state()
        elif train_cfg.devices and train_cfg.devices > 1:
            from dnsplatter_tpu.parallel.sharding import make_mesh

            devs = jax.devices()
            if len(devs) < train_cfg.devices:
                raise ValueError(
                    f"--train.devices {train_cfg.devices} but only "
                    f"{len(devs)} devices visible"
                )
            self.mesh = make_mesh(devs[: train_cfg.devices])
            self._shard_state()
        self.step = 0
        self._step_fns: Dict[Tuple[int, int, int], Callable] = {}
        self._history: list = []
        # Camera pose optimizer state (SO3xR3 tangents + its own Adam,
        # lr 1e-3 -> 5e-5 with 100-step accumulation, dn_config.py:57-61).
        # Device-resident: the update runs inside the jitted step, so pose
        # optimization composes with multi-step dispatch and multi-host dp.
        self.cam_opt = init_cam_opt(len(data))
        # observability: live viewer + experiment writers
        self.viewer = None
        if train_cfg.viewer:
            from dnsplatter_tpu.utils.viewer import Viewer

            self.viewer = Viewer(port=train_cfg.viewer_port)
            self.viewer.set_render_fn(self._orbit_render)
            print(f"viewer: http://127.0.0.1:{self.viewer.port}/",
                  flush=True)
        self._writers = []
        if self.out_dir:
            from dnsplatter_tpu.utils.writers import JsonlWriter

            self._writers.append(JsonlWriter(self.out_dir))
            if train_cfg.tensorboard:
                from dnsplatter_tpu.utils.writers import TensorboardWriter

                self._writers.append(TensorboardWriter(self.out_dir / "tb"))

    def _orbit_render(self, az_deg: float, el_deg: float,
                      radius: float,
                      scale: float = 1.0) -> Dict[str, np.ndarray]:
        """Viewer callback: render the CURRENT model from a user-driven
        orbit camera (azimuth/elevation around the alive-Gaussian
        centroid) — the interactive core of the nerfstudio viewer the
        reference trains with (dn_config.py:69-70). Renders at reduced
        resolution on the dashboard's HTTP thread; `scale` is the
        viewer's live resolution setting (quantized there), with one
        compiled fn cached per resolution (pose is a traced argument)."""
        from dnsplatter_tpu.models.dn_model import get_outputs
        from dnsplatter_tpu.ops.camera import Camera, look_at

        base_cam, _ = self.data.get(0)
        bw = max(base_cam.width, 1)
        f = min(1.0, 320.0 / bw) * float(scale)  # relative to the 320px base
        f = max(min(f, 1.0), 16.0 / bw)
        cam_small = base_cam.rescaled(f)
        w, h = cam_small.width, cam_small.height

        if not hasattr(self, "_orbit_fns"):
            self._orbit_fns: Dict[Tuple[int, int], Callable] = {}
        if (w, h) not in self._orbit_fns:
            cfg = self._raster_cfg(cam_small)
            cfg = cfg._replace(
                width=w, height=h,
                pair_capacity=-(-min(cfg.pair_capacity, 1 << 20)
                                // cfg.chunk) * cfg.chunk
            )

            @jax.jit
            def fwd(params, alive, cam):
                out, _ = get_outputs(
                    params, alive, cam, self.model_cfg, cfg,
                    sh_degree=self.model_cfg.sh_degree,
                    training=False, background=jnp.zeros((3,)),
                )
                return out

            self._orbit_fns[(w, h)] = fwd
        self._orbit_fn = self._orbit_fns[(w, h)]

        center = jnp.sum(
            self.params.means * self.alive[:, None], axis=0
        ) / jnp.maximum(jnp.sum(self.alive), 1.0)
        el = np.deg2rad(el_deg)
        az = np.deg2rad(az_deg)
        eye = center + radius * jnp.asarray(
            [np.cos(el) * np.cos(az), np.sin(el), np.cos(el) * np.sin(az)],
            jnp.float32,
        )
        cam = Camera.create(cam_small.fx, cam_small.fy, cam_small.cx,
                            cam_small.cy, look_at(eye, center), w, h)
        out = self._orbit_fn(self.params, self.alive, cam)
        return {k: np.asarray(out[k]) for k in ("rgb", "depth", "normal")}

    def _audit_pair_capacity(self) -> Optional[int]:
        """Max raw pair count over up to 8 sample frames * margin,
        rounded up to the chunk (None if the audit fails)."""
        from dnsplatter_tpu.ops.projection import project_gaussians

        tc = self.train_cfg
        n = len(self.data)
        if n == 0:
            return None
        idxs = sorted({(i * n) // min(8, n) for i in range(min(8, n))})
        worst = 0
        opac = jax.nn.sigmoid(self.params.opacities)

        @jax.jit
        def raw_pairs(means, quats, scales, viewmat, fx, fy, cx, cy, w, h,
                      validf):
            proj = project_gaussians(means, quats, jnp.exp(scales),
                                     viewmat, fx, fy, cx, cy, w, h,
                                     opacities=opac)
            ts = float(tc.tile_size)
            r = proj.radii_xy
            tx = (jnp.floor((proj.means2d[:, 0] + r[:, 0]) / ts)
                  - jnp.floor((proj.means2d[:, 0] - r[:, 0]) / ts) + 1)
            ty = (jnp.floor((proj.means2d[:, 1] + r[:, 1]) / ts)
                  - jnp.floor((proj.means2d[:, 1] - r[:, 1]) / ts) + 1)
            ok = proj.valid & (validf > 0.5)
            return jnp.sum(jnp.where(ok, tx * ty, 0.0))

        for i in idxs:
            cam, _ = self.data.get(i)
            cnt = float(raw_pairs(
                self.params.means, self.params.quats, self.params.scales,
                cam.viewmat(), float(cam.fx), float(cam.fy),
                float(cam.cx), float(cam.cy), cam.width, cam.height,
                self.alive,
            ))
            worst = max(worst, int(cnt))
        if worst <= 0:
            return None
        cap = int(worst * tc.auto_capacity_margin)
        if tc.devices and tc.devices > 1:
            # the tile-sharded renderer divides pair_capacity per slab
            # (parallel/tile_sharding.py slab_config); a content-dense
            # slab can hold most of a frame's pairs, so size every slab
            # for the full-frame worst case
            cap *= tc.devices
        cap = max(cap, 1 << 16)
        return -(-cap // tc.chunk) * tc.chunk

    def _raster_cfg(self, camera: Camera) -> RasterizeConfig:
        tc = self.train_cfg
        backend = tc.backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        kw = {}
        if tc.compact_frac >= 0.0:
            kw["compact_frac"] = tc.compact_frac
        return RasterizeConfig(
            width=camera.width,
            height=camera.height,
            tile_size=tc.tile_size,
            chunk=tc.chunk,
            tile_block=tc.tile_block,
            # pallas binning requires capacity % chunk == 0 (head-window
            # merge): round user-provided capacities up
            pair_capacity=-(-tc.pair_capacity // tc.chunk) * tc.chunk,
            backend=backend,
            sort_scheme=tc.sort_scheme,
            **kw,
        )

    def _shard_state(self) -> None:
        """(Re-)pin the Gaussian state to the mesh's Gaussian-axis layout
        (and dp-replicated on the hybrid mesh)."""
        if self.dp > 1 or (self.mesh is not None and "dp" in self.mesh.shape):
            from dnsplatter_tpu.parallel.distributed import shard_state_hybrid

            self.params, self.alive, self.adam, self.stats = (
                shard_state_hybrid(self.mesh, self.params, self.alive,
                                   self.adam, self.stats)
            )
            return
        from dnsplatter_tpu.parallel.sharding import shard_gaussian_state

        self.params, self.alive, self.adam, self.stats = shard_gaussian_state(
            self.mesh, self.params, self.alive, self.adam, self.stats
        )

    def _get_step_fn(self, camera: Camera, sh_degree: int) -> Callable:
        keyt = (camera.width, camera.height, sh_degree)
        if keyt not in self._step_fns:
            if self.dp > 1:
                from dnsplatter_tpu.parallel.distributed import (
                    make_dp_train_step,
                )

                self._step_fns[keyt] = make_dp_train_step(
                    self.model_cfg, self.optim_cfg, self._raster_cfg(camera),
                    sh_degree, self.mesh,
                )
            elif self.mesh is not None:
                if self.train_cfg.parallel_strategy == "tile":
                    from dnsplatter_tpu.parallel.tile_sharding import (
                        make_tile_train_step,
                    )

                    self._step_fns[keyt] = make_tile_train_step(
                        self.model_cfg, self.optim_cfg,
                        self._raster_cfg(camera), sh_degree, self.mesh,
                    )
                else:
                    from dnsplatter_tpu.parallel.sharding import (
                        make_sharded_train_step,
                    )

                    self._step_fns[keyt] = make_sharded_train_step(
                        self.model_cfg, self.optim_cfg,
                        self._raster_cfg(camera), sh_degree, self.mesh,
                    )
            else:
                self._step_fns[keyt] = make_train_step(
                    self.model_cfg, self.optim_cfg, self._raster_cfg(camera),
                    sh_degree,
                )
        return self._step_fns[keyt]

    def _refinement(self, camera: Camera) -> None:
        """Host-side cadence (dn_model.py:281-301, 359-364)."""
        cfg = self.model_cfg
        step = self.step
        if step <= cfg.warmup_length or step % cfg.refine_every != 0:
            return
        reset_interval = cfg.reset_alpha_every * cfg.refine_every
        num_train = len(self.data)
        do_densify = (
            step < cfg.stop_split_at
            and step % reset_interval > num_train + cfg.refine_every
        )
        max_size = float(max(camera.width, camera.height))
        if do_densify:
            self.key, kref = jax.random.split(self.key)
            self.params, self.alive, self.adam, self.stats = densify_and_cull(
                cfg, self.params, self.alive, self.adam, self.stats,
                kref, step, max_size,
            )
            self._maybe_grow_capacity()
        elif step >= cfg.stop_split_at and cfg.continue_cull_post_densification:
            self.params, self.alive, self.adam, self.stats = cull_only(
                cfg, self.params, self.alive, self.adam, self.stats, step
            )
        if (
            step < cfg.stop_split_at
            and step % reset_interval == cfg.refine_every
        ):
            self.params, self.adam = reset_opacity(cfg, self.params, self.adam)
        if self.mesh is not None:
            # Refinement scatters run under GSPMD on the sharded state but
            # output layouts are compiler-chosen; re-pin so the next train
            # step sees the expected Gaussian-axis sharding.
            self._shard_state()

    def _maybe_grow_capacity(self) -> None:
        """Grow the Gaussian-state capacity after a densify event that
        approaches the ceiling (see TrainConfig.capacity docstring).
        Runs right after densify_and_cull, where RefineStats were just
        re-zeroed — so re-initializing them at the new capacity is
        exact. Adam moments pad with zeros (fresh slots have no
        history, matching the reference's param-group surgery for new
        Gaussians)."""
        tc = self.train_cfg
        if tc.capacity_growth <= 1.0:
            return
        cap = self.params.capacity
        n_alive = int(jnp.sum(self.alive))
        if n_alive < int(0.95 * cap):
            return
        new_cap = int(np.ceil(cap * tc.capacity_growth / 4096) * 4096)
        from dnsplatter_tpu.models.gaussians import grow_capacity

        self.params, self.alive = grow_capacity(self.params, self.alive,
                                                new_cap)
        pad = new_cap - cap

        def padz(x):
            if x.ndim == 0:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )

        self.adam = AdamState(
            mu=jax.tree.map(padz, self.adam.mu),
            nu=jax.tree.map(padz, self.adam.nu),
            count=self.adam.count,
            accum=jax.tree.map(padz, self.adam.accum),
        )
        self.stats = init_stats(new_cap)
        if self.mesh is not None:
            self._shard_state()
        print(f"capacity grown: {cap} -> {new_cap} "
              f"({n_alive} alive)", flush=True)

    def eval_image(self, index: int = 0, eval_data=None) -> Dict[str, float]:
        """Render one eval frame and compute quick metrics (the
        reference's steps_per_eval_image self-reporting,
        dn_config.py:16-17 / dn_model.py:731-807)."""
        from dnsplatter_tpu.eval import metrics as M
        from dnsplatter_tpu.models.dn_model import get_outputs

        data = eval_data or self.data
        cam, batch = data.get(index % len(data))
        sh = sh_degree_to_use(self.step, self.model_cfg)
        out, _ = get_outputs(
            self.params, self.alive, cam, self.model_cfg,
            self._raster_cfg(cam), sh_degree=sh, training=False,
            background=jnp.zeros((3,)),
        )
        if self.viewer is not None:
            self.viewer.update(images={
                "rgb": np.asarray(out["rgb"]),
                "depth": np.asarray(out["depth"]),
            })
        row = {
            f"rgb_{k}": v
            for k, v in M.rgb_metrics(
                out["rgb"], jnp.asarray(batch["image"])
            ).items()
        }
        if "sensor_depth" in batch:
            row.update({
                f"depth_{k}": v for k, v in M.depth_metrics(
                    out["depth"], jnp.asarray(batch["sensor_depth"])
                ).items()
            })
        row["gaussian_count"] = int(jnp.sum(self.alive))
        return row

    def train(self, num_steps: Optional[int] = None, log_every: int = 100,
              eval_data=None):
        total = num_steps or self.train_cfg.max_iterations
        n = len(self.data)
        t0 = time.time()
        k_dispatch = max(1, self.train_cfg.steps_per_dispatch)
        if self.dp > 1:
            k_dispatch = 1  # the dp step already batches dp frames/step
        if k_dispatch > 1:
            assert self.model_cfg.refine_every % k_dispatch == 0, (
                "steps_per_dispatch must divide refine_every"
            )
            assert self.model_cfg.sh_degree_interval % k_dispatch == 0

        target = self.step + total
        while self.step < target:
            k_now = min(k_dispatch, target - self.step)
            cam, batch = self.data.get(self.step % n)
            d = self._downscale_factor()
            if d > 1:
                cam, batch = self._downscaled(self.step % n, cam, batch, d)
            sh = sh_degree_to_use(self.step, self.model_cfg)
            if self.dp > 1:
                loss = self._dispatch_dp(cam, sh, n)
                self.step += 1
            elif k_now > 1 and d == 1:
                loss = self._dispatch_multi(cam, sh, k_now, n)
                self.step += k_now
            else:
                fn = self._get_step_fn(cam, sh)
                self.key, kstep = jax.random.split(self.key)
                cam_i = self.step % n
                batch_j = self._device_batch(cam_i, batch)
                (self.params, self.adam, self.stats, loss, ld,
                 self.cam_opt) = fn(
                    self.params, self.alive, self.adam, self.stats, cam,
                    batch_j, jnp.asarray(self.step, jnp.int32), kstep,
                    self.cam_opt, jnp.asarray(cam_i, jnp.int32),
                )
                self.step += 1
            self._refinement(cam)
            if self.step % log_every == 0 or self.step == target:
                loss_v = float(loss)
                n_alive = int(jnp.sum(self.alive))
                dt = time.time() - t0
                row = dict(step=self.step, loss=loss_v, n_gaussians=n_alive,
                           wall_s=round(dt, 2))
                self._history.append(row)
                for wtr in self._writers:
                    wtr.write_scalars(self.step, row)
                if self.viewer is not None:
                    self.viewer.update(stats=row)
                print(
                    f"step {self.step:6d}  loss {loss_v:.4f}  "
                    f"gaussians {n_alive}  {dt:.1f}s",
                    flush=True,
                )
            if (
                self.train_cfg.steps_per_eval_image
                and self.step % self.train_cfg.steps_per_eval_image == 0
            ):
                m = self.eval_image(
                    self.step // self.train_cfg.steps_per_eval_image,
                    eval_data,
                )
                print(
                    f"  eval @ {self.step}: psnr {m['rgb_psnr']:.2f} "
                    f"ssim {m['rgb_ssim']:.3f} "
                    f"gaussians {m['gaussian_count']}",
                    flush=True,
                )
                self._history.append(dict(step=self.step, **m))
                for wtr in self._writers:
                    wtr.write_scalars(self.step, m)
            if (
                self.out_dir
                and self._is_main()
                and self.train_cfg.steps_per_save
                and self.step % self.train_cfg.steps_per_save == 0
            ):
                self.save_checkpoint()
        if self.out_dir and self._is_main():
            self.save_checkpoint()
        return self._history

    def _is_main(self) -> bool:
        """Checkpoint writes are process-0-gated in multi-host runs (the
        replicated state is identical on every process)."""
        return self.dist is None or self.dist.is_main

    def _device_batch(self, idx: int, batch) -> dict:
        """Device-resident copy of frame `idx`'s batch, cached: the
        tunneled TPU moves ~30 MB/s, so re-uploading a full-resolution
        rgb+depth+normal batch every revisit would dominate wall-clock.
        Invalidated when the served batch's keys/shape change (e.g. the
        downscale schedule)."""
        if not self.train_cfg.cache_batches_on_device:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        sig = tuple(sorted((k, np.shape(v)) for k, v in batch.items()))
        hit = self._batch_cache.get(idx)
        if hit is not None and hit[0] == sig:
            return hit[1]
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        self._batch_cache[idx] = (sig, dev)
        return dev

    def _dispatch_dp(self, cam0: Camera, sh: int, n: int) -> float:
        """One data-parallel step: dp frames rendered concurrently across
        the mesh's dp axis, gradients pmean'd (the reference's DDP step,
        dn_pipeline.py:122-128). Each process feeds only its own
        contiguous dp-rank block of frames."""
        from dnsplatter_tpu.parallel import distributed as D

        dp = self.dp
        ctx = self.dist or D.dist_context()
        pc = max(ctx.process_count, 1)
        dpl = dp // pc
        fn = self._get_step_fn(cam0, sh)
        ranks = range(ctx.process_index * dpl, (ctx.process_index + 1) * dpl)
        gidx = [(self.step * dp + r) % n for r in ranks]
        key_sig = tuple(gidx)
        hit = self._batch_cache.get(("dp", key_sig)) \
            if self.train_cfg.cache_batches_on_device else None
        if hit is not None:
            cam_g, batch_g = hit
        else:
            cams, batches = zip(*[self.data.get(i) for i in gidx])
            cam_g, batch_g = D.stack_frames(self.mesh, cams, batches)
            if self.train_cfg.cache_batches_on_device:
                self._batch_cache[("dp", key_sig)] = (cam_g, batch_g)
        self.key, *ks = jax.random.split(self.key, dp + 1)
        keys = D.put_dp(self.mesh, np.stack([np.asarray(k) for k in ks]))
        all_gidx = jnp.asarray(
            [(self.step * dp + r) % n for r in range(dp)], jnp.int32
        )
        (self.params, self.adam, self.stats, loss, self.cam_opt) = fn(
            self.params, self.alive, self.adam, self.stats, cam_g, batch_g,
            jnp.asarray(self.step, jnp.int32), keys, self.cam_opt, all_gidx,
        )
        return loss

    def _dispatch_multi(self, cam0: Camera, sh: int, k: int, n: int) -> float:
        """Run k sequential steps in one device dispatch (lax.scan)."""
        key = (cam0.width, cam0.height, sh, k, "multi")
        if key not in self._step_fns:
            self._step_fns[key] = make_train_step_multi(
                self.model_cfg, self.optim_cfg, self._raster_cfg(cam0), sh, k
            )
        fn = self._step_fns[key]
        idxs = [(self.step + j) % n for j in range(k)]
        cams, batches = zip(*[self.data.get(i) for i in idxs])
        cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        dev_batches = [self._device_batch(i, b)
                       for i, b in zip(idxs, batches)]
        batch_stack = {
            kk: jnp.stack([b[kk] for b in dev_batches])
            for kk in batches[0]
        }
        # Derive per-step keys exactly as k sequential single dispatches
        # would (sequential pairwise splits), so the two dispatch modes
        # produce the same update sequence.
        keys = []
        for _ in range(k):
            self.key, kj = jax.random.split(self.key)
            keys.append(kj)
        keys = jnp.stack(keys)
        (self.params, self.adam, self.stats, losses, self.cam_opt) = fn(
            self.params, self.alive, self.adam, self.stats, cam_stack,
            batch_stack, jnp.asarray(self.step, jnp.int32), keys,
            self.cam_opt, jnp.asarray(idxs, jnp.int32),
        )
        return losses[-1]

    def _downscale_factor(self) -> int:
        """Progressive resolution (splatfacto num_downscales /
        resolution_schedule; dn-splatter defaults num_downscales=0)."""
        cfg = self.model_cfg
        if cfg.num_downscales <= 0:
            return 1
        d = max(
            0,
            cfg.num_downscales - self.step // cfg.resolution_schedule,
        )
        return 2 ** d

    def _downscaled(self, idx: int, cam: Camera, batch, d: int):
        key = (idx, d)
        cache = getattr(self, "_ds_cache", None)
        if cache is None:
            cache = self._ds_cache = {}
        if key in cache:
            return cache[key]
        from dnsplatter_tpu.data.io import resize_image

        cam2 = cam.rescaled(1.0 / d)
        batch2 = {}
        for k, v in batch.items():
            v = np.asarray(v)
            nearest = k != "image"
            out = resize_image(
                v if v.ndim == 3 else v[..., None],
                cam2.height, cam2.width, nearest=nearest,
            )
            batch2[k] = out
        cache[key] = (cam2, batch2)
        return cam2, batch2

    @property
    def cam_adj(self) -> jax.Array:
        """(n_cams, 6) current pose tangents (state lives in cam_opt)."""
        return self.cam_opt.adj

    # -- checkpointing (orbax-free npz: state is a flat dict of arrays) --

    def save_checkpoint(self, path: Optional[Path] = None) -> Path:
        # host_local_value (not np.asarray): on a true multi-host run the
        # state is gauss-sharded within each host; np.asarray refuses
        # such non-fully-addressable global arrays.
        from dnsplatter_tpu.parallel.distributed import (
            host_local_value as asnp,
        )

        path = path or (self.out_dir / f"ckpt_{self.step:06d}.npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        flat = {
            f"params.{f}": asnp(getattr(self.params, f))
            for f in self.params.__dataclass_fields__
        }
        flat["alive"] = asnp(self.alive)
        flat["step"] = np.asarray(self.step)
        for f in CamOptState._fields:
            flat[f"cam_opt.{f}"] = asnp(getattr(self.cam_opt, f))
        flat["cam_adj"] = asnp(self.cam_opt.adj)  # back-compat alias
        for f in self.adam.mu.__dataclass_fields__:
            flat[f"adam.mu.{f}"] = asnp(getattr(self.adam.mu, f))
            flat[f"adam.nu.{f}"] = asnp(getattr(self.adam.nu, f))
            flat[f"adam.count.{f}"] = asnp(getattr(self.adam.count, f))
            flat[f"adam.accum.{f}"] = asnp(getattr(self.adam.accum, f))
        np.savez_compressed(path, **flat)
        meta = dataclasses.asdict(self.model_cfg)
        (path.parent / "config.json").write_text(json.dumps(meta, indent=2))
        return path

    def load_checkpoint(self, path: Path) -> None:
        z = np.load(path)
        fields = {
            f: jnp.asarray(z[f"params.{f}"])
            for f in GaussianParams.__dataclass_fields__
        }
        self.params = GaussianParams(**fields)
        self.alive = jnp.asarray(z["alive"])
        self.step = int(z["step"])
        def tree(prefix):
            return GaussianParams(**{
                f: jnp.asarray(z[f"adam.{prefix}.{f}"])
                for f in GaussianParams.__dataclass_fields__
            })

        self.adam = AdamState(mu=tree("mu"), nu=tree("nu"),
                              count=tree("count"), accum=tree("accum"))
        if ("cam_opt.adj" in z
                and z["cam_opt.adj"].shape == self.cam_opt.adj.shape):
            self.cam_opt = CamOptState(**{
                f: jnp.asarray(z[f"cam_opt.{f}"]) for f in CamOptState._fields
            })
        elif "cam_adj" in z and z["cam_adj"].shape == self.cam_opt.adj.shape:
            # pre-round-3 checkpoints stored only the tangents
            self.cam_opt = self.cam_opt._replace(
                adj=jnp.asarray(z["cam_adj"])
            )
        self.stats = init_stats(self.params.capacity)
        # Resume hygiene: a densified checkpoint can need a larger pair
        # capacity than the seed audit chose, and cached step functions
        # close over the old config; the sharded layout must be re-pinned.
        if self.train_cfg.auto_pair_capacity:
            cap = self._audit_pair_capacity()
            if cap is not None and cap != self.train_cfg.pair_capacity:
                self.train_cfg = dataclasses.replace(
                    self.train_cfg, pair_capacity=cap
                )
                print(f"auto pair capacity (resume): {cap}", flush=True)
        self._step_fns.clear()
        if self.mesh is not None:
            self._shard_state()


def load_checkpoint_arrays(path: Path):
    """Standalone checkpoint loader for offline tools (mesh export, eval) —
    the eval_setup() equivalent (export_mesh.py:155 et al.)."""
    z = np.load(path)
    params = GaussianParams(**{
        f: jnp.asarray(z[f"params.{f}"])
        for f in GaussianParams.__dataclass_fields__
    })
    return params, jnp.asarray(z["alive"]), int(z["step"])
