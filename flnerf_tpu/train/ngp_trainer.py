"""Instant-NGP training driver with probability-map ray selection.

Reference behavior (ngp-ours):
  * Trainer (nerf/utils.py:288-911): step-based AMP training, Adam
    betas (0.9, 0.99) eps 1e-15, LambdaLR 0.1**(iter/max_iters), occupancy
    update_extra_state every 16 steps (utils.py:837-839), random/white bg.
  * Ray selection (the paper's grafting, nerf/provider.py + quadtree.py):
    per-image probability map (uniform by default, optionally local-variance
    based), multinomial draw WITH replacement (quadtree.py:141), per-ray
    error mask hook (provider.py:353-361), all-pixel switch 10 epochs before
    the end (utils.py:620-621, provider.py:363-366).

TPU structure mirrors train/trainer.py: lax.scan over a chunk of optimizer
steps per dispatch; the occupancy grid refresh runs between chunks (the
chunk length IS the reference's 16-step update cadence).
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flnerf_tpu.core.metrics import compute_ssim, mse2psnr
from flnerf_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicated
from flnerf_tpu.rays.sharpness import sharp_image
from flnerf_tpu.render.ngp import (
    NGPRenderConfig,
    OccupancyState,
    pack_occupancy,
    init_occupancy,
    ngp_render_image,
    ngp_render_rays,
    update_occupancy,
)
from jax.sharding import NamedSharding, PartitionSpec as P


class NGPTrainConfig(NamedTuple):
    max_steps: int = 30000
    batch_rays: int = 4096
    lr: float = 1e-2
    steps_per_chunk: int = 16      # == occupancy update cadence
    occ_update_every: int = 1      # in chunks
    full_refreshes: int = 16       # full-grid updates before switching to
                                   # partial strided-eighth refreshes
                                   # (renderer.py:455-466: 16 full passes)
    use_prob_map: bool = False     # variance-based image probs (quadtree.py:5)
    use_error_map: bool = False    # --error_map: 128x128 EMA maps (utils.py:505-527)
    patch_size: int = 1            # >1: patch-mode draw (utils.py:78-95),
                                   # overrides prob/error-map sampling
    all_pixel_at: float = 1.0      # fraction of training after which probs
                                   # reset to uniform (change_to_allpixel)
    bg_color: float = 1.0
    ema_decay: float = 0.0         # 0 disables; torch-ngp uses 0.95
    time_dependent: bool = False   # D-NeRF: field fns take (params, x, t)
    loss_type: str = "mse"         # 'mse' | 'huber' (loss.py:18)
    huber_delta: float = 0.1
    seed: int = 0


class NGPSampler:
    """Per-image probability-map pixel sampler (provider.py:236-366).

    ``times`` [n_images] enables the D-NeRF per-frame timestamps
    (dnerf/provider.py adds time to each view).
    """

    def __init__(self, images, poses, K, cfg: NGPTrainConfig, seed: int = 0,
                 times=None):
        self.cfg = cfg
        self.times = np.asarray(times, np.float32) if times is not None else None
        images = np.ascontiguousarray(images, np.float32)
        # RGBA inputs keep their alpha for random-background compositing
        # (utils.py:469-480); rgb stays premultiplied-free (raw values)
        self.alphas = (
            images[..., 3:4].reshape(images.shape[0], -1, 1)
            if images.shape[-1] == 4 else None
        )
        self.images = images[..., :3]
        self.n_images, self.H, self.W = images.shape[:3]
        self.rng = np.random.default_rng(seed)
        from flnerf_tpu.rays.camera import get_rays_np

        origins, dirs = [], []
        for p in poses:
            o, d = get_rays_np(self.H, self.W, K, p[:3, :4])
            origins.append(o.reshape(-1, 3))
            d = d.reshape(-1, 3)
            dirs.append(d / np.linalg.norm(d, axis=-1, keepdims=True))
        self.origins = np.stack(origins, 0)   # [n, HW, 3]
        self.dirs = np.stack(dirs, 0)
        self.pixels = self.images.reshape(self.n_images, -1, 3)

        if cfg.use_prob_map:
            # local-variance probability (quadtree.py:get_img_prob)
            probs = []
            for im in self.images:
                s = sharp_image(im).reshape(-1).astype(np.float64) + 1e-6
                probs.append(s / s.sum())
            self.image_probs = np.stack(probs, 0)
        else:
            self.image_probs = None  # uniform (provider.py:236 default)

        # --error_map: per-image 128x128 EMA error maps (provider.py:242-246)
        self.error_map_res = 128
        if cfg.use_error_map:
            self.error_map = np.ones(
                (self.n_images, self.error_map_res ** 2), np.float64
            )
        else:
            self.error_map = None
        self._img_cursor = 0

    def change_to_allpixel(self):
        """provider.py:363-366 — drop the prob maps near the end."""
        self.image_probs = None
        self.error_map = None

    def _sample_patches(self, batch: int):
        """Patch-mode pixel draw (nerf/utils.py:78-95): random top-left
        corners, a patch_size^2 meshgrid of offsets per corner; overrides
        prob/error-map sampling (': if use patch-based sampling, ignore
        error_map').  Used by losses that need image-plane neighborhoods
        (e.g. LPIPS patches / depth smoothness)."""
        p = self.cfg.patch_size
        n_patch = batch // (p * p)
        ix = self.rng.integers(0, self.H - p, n_patch)
        iy = self.rng.integers(0, self.W - p, n_patch)
        pi, pj = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
        px = (ix[:, None] + pi.reshape(-1)[None]).reshape(-1)
        py = (iy[:, None] + pj.reshape(-1)[None]).reshape(-1)
        inds = px * self.W + py
        if inds.shape[0] < batch:      # batch not divisible by p^2: pad
            extra = self.rng.integers(0, self.H * self.W,
                                      batch - inds.shape[0])
            inds = np.concatenate([inds, extra])
        return inds

    def _sample_error_map(self, i: int, batch: int):
        """2-level error-map draw (nerf/utils.py:113-124): multinomial over
        the coarse map, jitter within the coarse cell."""
        em = self.error_map[i]
        p = em / em.sum()
        inds_coarse = self.rng.choice(em.shape[0], size=batch, p=p)
        r = self.error_map_res
        ix, iy = inds_coarse // r, inds_coarse % r
        sx, sy = self.H / r, self.W / r
        px = np.minimum((ix * sx + self.rng.random(batch) * sx).astype(np.int64), self.H - 1)
        py = np.minimum((iy * sy + self.rng.random(batch) * sy).astype(np.int64), self.W - 1)
        return px * self.W + py, inds_coarse

    def update_error_map(self, img_ids, inds_coarse, per_ray_err):
        """EMA update at the sampled coarse cells (utils.py:521-527):
        new = 0.1 * old + 0.9 * err."""
        if self.error_map is None:
            return
        for s in range(img_ids.shape[0]):
            i = img_ids[s]
            em = self.error_map[i]
            em[inds_coarse[s]] = 0.1 * em[inds_coarse[s]] + 0.9 * per_ray_err[s]

    def sample_chunk(self, n_steps: int, batch: int):
        """[n_steps] training batches; each step draws ``batch`` rays from
        one image (ngp's per-step single-image collate, provider.py:289).
        Returns (origins, dirs, rgb [n_steps, batch, 3|4 — alpha appended
        for RGBA datasets], img_ids [n_steps], inds_coarse|None,
        times [n_steps, batch]|None)."""
        origins = np.empty((n_steps, batch, 3), np.float32)
        dirs = np.empty((n_steps, batch, 3), np.float32)
        c_gt = 3 if self.alphas is None else 4
        rgb = np.empty((n_steps, batch, c_gt), np.float32)
        img_ids = np.empty(n_steps, np.int64)
        t_out = (
            np.empty((n_steps, batch), np.float32) if self.times is not None else None
        )
        inds_coarse = (
            np.empty((n_steps, batch), np.int64)
            if self.error_map is not None and self.cfg.patch_size <= 1
            else None
        )
        hw = self.H * self.W
        for s in range(n_steps):
            i = self._img_cursor % self.n_images
            self._img_cursor += 1
            img_ids[s] = i
            if self.cfg.patch_size > 1:
                inds = self._sample_patches(batch)
            elif self.error_map is not None:
                inds, ic = self._sample_error_map(i, batch)
                inds_coarse[s] = ic
            elif self.image_probs is None:
                inds = self.rng.integers(0, hw, batch)
            else:
                inds = self.rng.choice(hw, size=batch, p=self.image_probs[i])
            origins[s] = self.origins[i, inds]
            dirs[s] = self.dirs[i, inds]
            rgb[s, :, :3] = self.pixels[i, inds]
            if self.alphas is not None:
                rgb[s, :, 3:] = self.alphas[i, inds]
            if t_out is not None:
                t_out[s] = self.times[i]
        return origins, dirs, rgb, img_ids, inds_coarse, t_out


class NGPTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None   # EMA shadow weights (utils.py:360-363), optional


class NGPTrainer:
    def __init__(
        self,
        init_fn: Callable,
        density_fn: Callable,
        rgb_fn: Callable,
        render_cfg: NGPRenderConfig,
        train_cfg: NGPTrainConfig,
        mesh=None,
        bg_fn=None,
    ):
        self.density_fn = density_fn
        self.rgb_fn = rgb_fn
        # learned environment-map background (network.py:66-93); None keeps
        # the scalar/random bg_color path
        self.bg_fn = bg_fn
        self.rcfg = render_cfg
        self.cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)

        params = init_fn(jax.random.PRNGKey(train_cfg.seed))
        opt_state = self.tx.init(params)
        ema = (
            jax.tree_util.tree_map(jnp.copy, params)
            if train_cfg.ema_decay > 0
            else None
        )
        rep = replicated(self.mesh)
        self.state = jax.device_put(
            NGPTrainState(params, opt_state, jnp.int32(0), ema), rep
        )
        self.occ = jax.device_put(init_occupancy(render_cfg), rep)
        self._chunk_fn = self._make_chunk_fn()
        self._occ_fn = self._make_occ_fn()
        self.history = []
        # host mirror of state.step: int(self.state.step) at every fit()
        # entry costs a ~28 ms tunnel round trip AND serializes against
        # all in-flight work — interleaved fit(n_steps) callers (CCNeRF
        # level cycling, interactive stepping, the bench rep loop) pay it
        # per call.  None = unknown (external state swap); fit() falls
        # back to the device read once and re-seeds the mirror.
        self._host_step = 0

    # ------------------------------------------------------------------
    def _make_occ_fn(self):
        density_fn = self.density_fn
        rcfg = self.rcfg

        import functools

        if self.cfg.time_dependent:
            # refresh at a random timestamp per update (the dnerf renderer
            # samples t when refreshing its grid)
            @functools.partial(jax.jit, static_argnums=(3,))
            def occ_fn(occ, params, key, partial):
                kt, ku = jax.random.split(key)
                t = jax.random.uniform(kt, ())

                def density_at_t(p, x):
                    return density_fn(p, x, jnp.full(x.shape[:-1], t))

                return update_occupancy(occ, params, density_at_t, ku, rcfg,
                                        partial=partial)

        else:

            @functools.partial(jax.jit, static_argnums=(3,))
            def occ_fn(occ, params, key, partial):
                return update_occupancy(occ, params, density_fn, key, rcfg,
                                        partial=partial)

        return occ_fn

    def _make_chunk_fn(self):
        """Memoized on everything the closure bakes in: CCNeRF's level
        cycling swaps (density_fn, rgb_fn) every few chunks, and without
        the memo each swap re-jits an identical graph."""
        key = (self.density_fn, self.rgb_fn, self.bg_fn, self.rcfg,
               self.cfg)
        memo = getattr(self, "_chunk_fn_memo", None)
        if memo is None:
            memo = self._chunk_fn_memo = {}
        if key not in memo:
            memo[key] = self._build_chunk_fn()
        return memo[key]

    def _build_chunk_fn(self):
        density_fn, rgb_fn = self.density_fn, self.rgb_fn
        rcfg, cfg, tx = self.rcfg, self.cfg, self.tx

        bg_fn = self.bg_fn
        n_dev = int(self.mesh.devices.size)
        # multichip: shard_map the fwd+bwd so each device renders its ray
        # shard through the (opaque-to-GSPMD) Pallas hash kernels locally,
        # then pmean grads — jit auto-sharding cannot partition custom
        # calls and would all-gather the batch instead
        shard_grads = n_dev > 1 and cfg.batch_rays % n_dev == 0

        def fwd_bwd(params, occ, origins, dirs, rgb, key, *t_args):
            times = t_args[0] if t_args else None
            if shard_grads:
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(DATA_AXIS))

            def loss_fn(params):
                kp, kb = jax.random.split(key)
                if rgb.shape[-1] == 4 and bg_fn is None:
                    # pixel-wise random background (utils.py:474-479):
                    # composite the RGBA gt against it and render with it
                    bg = jax.random.uniform(kb, rgb[..., :3].shape)
                    gt = rgb[..., :3] * rgb[..., 3:] + bg * (1.0 - rgb[..., 3:])
                elif rgb.shape[-1] == 4:
                    bg = None  # bg model: gt on white (utils.py:469-471)
                    gt = rgb[..., :3] * rgb[..., 3:] + 1.0 - rgb[..., 3:]
                else:
                    bg = cfg.bg_color
                    gt = rgb
                out = ngp_render_rays(
                    kp, params, density_fn, rgb_fn, occ, origins, dirs, rcfg,
                    perturb=True, bg_color=bg, times=times, bg_fn=bg_fn,
                )
                if cfg.loss_type == "huber":
                    from flnerf_tpu.core.losses import huber_loss

                    per_ray = jnp.mean(
                        huber_loss(out["rgb"], gt, cfg.huber_delta, reduce=False), -1
                    )
                else:
                    per_ray = jnp.mean((out["rgb"] - gt) ** 2, -1)
                return jnp.mean(per_ray), per_ray

            (loss, per_ray), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            if shard_grads:
                loss = jax.lax.pmean(loss, DATA_AXIS)
                grads = jax.lax.pmean(grads, DATA_AXIS)
            return loss, per_ray, grads

        if shard_grads:
            d_spec = P(DATA_AXIS)
            fwd_bwd = jax.shard_map(
                fwd_bwd, mesh=self.mesh,
                in_specs=(P(), P(), d_spec, d_spec, d_spec, P())
                + ((d_spec,) if cfg.time_dependent else ()),
                out_specs=(P(), d_spec, P()),
                check_vma=False,
            )

        def one_step(state: NGPTrainState, occ, xs):
            if cfg.time_dependent:
                origins, dirs, rgb, times, key = xs
                t_args = (times,)
            else:
                origins, dirs, rgb, key = xs
                t_args = ()

            loss, per_ray, grads = fwd_bwd(
                state.params, occ, origins, dirs, rgb, key, *t_args)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            # LambdaLR 0.1 ** (iter / max_steps) (main_nerf.py scheduler)
            lr = cfg.lr * 0.1 ** (
                jnp.minimum(state.step.astype(jnp.float32) / cfg.max_steps, 1.0)
            )
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if state.ema_params is not None:
                d = cfg.ema_decay
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params
                )
            return (
                NGPTrainState(new_params, new_opt, state.step + 1, new_ema),
                (loss, per_ray),
            )

        data_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        rep = replicated(self.mesh)

        if cfg.time_dependent:

            def chunk_fn(state, occ, origins, dirs, rgb, times, base_key):
                keys = jax.random.split(base_key, origins.shape[0])

                def body(st, xs):
                    st, out = one_step(st, occ, xs)
                    return st, out

                state, (losses, per_ray) = jax.lax.scan(
                    body, state, (origins, dirs, rgb, times, keys)
                )
                return state, losses, per_ray

            return jax.jit(
                chunk_fn,
                in_shardings=(rep, rep, data_sh, data_sh, data_sh, data_sh, rep),
                out_shardings=(rep, rep, rep),
                donate_argnums=(0,),
            )

        def chunk_fn(state, occ, origins, dirs, rgb, base_key):
            keys = jax.random.split(base_key, origins.shape[0])

            def body(st, xs):
                st, out = one_step(st, occ, xs)
                return st, out

            state, (losses, per_ray) = jax.lax.scan(
                body, state, (origins, dirs, rgb, keys)
            )
            return state, losses, per_ray

        return jax.jit(
            chunk_fn,
            in_shardings=(rep, rep, data_sh, data_sh, data_sh, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------
    def replace_field(self, density_fn, rgb_fn, params):
        """Swap the field functions + parameters mid-run (the tensorf
        upsample/shrink boundaries, tensoRF/utils.py:112-128): optimizer
        state resets ('reset optimizer since params changed', :127), the
        step counter and occupancy grid carry over, and the chunk/occ
        functions re-jit (a deliberate recompile boundary)."""
        self.density_fn = density_fn
        self.rgb_fn = rgb_fn
        opt_state = self.tx.init(params)
        ema = (
            jax.tree_util.tree_map(jnp.copy, params)
            if self.cfg.ema_decay > 0 else None
        )
        rep = replicated(self.mesh)
        self.state = jax.device_put(
            NGPTrainState(params, opt_state, self.state.step, ema), rep
        )
        self._chunk_fn = self._make_chunk_fn()
        self._occ_fn = self._make_occ_fn()

    def fit(self, sampler: NGPSampler, verbose: bool = True,
            eval_every: int = 0, n_steps: int = None):
        """Train cfg.max_steps steps (or n_steps, for callers that
        interleave fits — e.g. CCNeRF's level cycling — while keeping
        cfg.max_steps as the TOTAL so the compiled lr decay spans the
        whole run)."""
        cfg = self.cfg
        # ceil: n_steps below/astride the chunk size still trains (the
        # floor silently ran 0 chunks for n_steps < steps_per_chunk);
        # interleaved callers get chunk-granular budgets, documented
        n_chunks = -((n_steps or cfg.max_steps) // -cfg.steps_per_chunk)
        data_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        t0 = time.time()
        # host-side step mirror: reading self.state.step costs a ~28 ms
        # tunnel round trip per fit (CLAUDE.md), and the occ cadence
        # only needs the count the host already knows
        if self._host_step is None:
            self._host_step = int(self.state.step)
        base_step = self._host_step
        # fold the resume step into the stream so interleaved fit() calls
        # (n_steps loops, CCNeRF level cycling, interactive stepping)
        # draw fresh per-chunk keys instead of replaying the first call's
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), base_step)
        # results of the PREVIOUS chunk, absorbed after the next chunk is
        # dispatched so the error-map/history syncs overlap device compute
        # (the error-map EMA lags its rays by one chunk — harmless for an
        # EMA of noisy per-ray losses, and the final chunk is absorbed
        # after the loop)
        pending = None

        hist_start = len(self.history)

        def absorb(p):
            img_ids, inds_coarse, per_ray, losses, step_after = p
            if inds_coarse is not None:
                sampler.update_error_map(img_ids, inds_coarse,
                                         np.asarray(per_ray))
            # keep the loss as a DEVICE scalar: float() here costs a
            # ~28 ms tunnel round trip PER CHUNK (~1.75 ms/step at 16
            # steps/chunk) that the async pipeline cannot hide; all of
            # this fit's entries are materialized in one sync at the end
            self.history.append(
                {"step": step_after, "wall_s": time.time() - t0,
                 "loss": losses[-1]})

        # all-pixel switch at a GLOBAL step threshold: computing it from
        # this call's n_chunks made interleaved fit(n_steps=...) callers
        # switch at all_pixel_at of each CALL, discarding the error maps
        # near the start of training
        allpixel_step = int(cfg.max_steps * cfg.all_pixel_at)
        for ci in range(n_chunks):
            if (base_step + ci * cfg.steps_per_chunk >= allpixel_step) and (
                sampler.image_probs is not None or sampler.error_map is not None
            ):
                sampler.change_to_allpixel()
                if verbose:
                    print("switched to all-pixel (uniform) sampling")
            if ci % cfg.occ_update_every == 0:
                key, sub = jax.random.split(key)
                # full sweeps early (grid unconverged), strided-eighth
                # partial refreshes in steady state (renderer.py:455-466;
                # a full 128^3 sweep costs ~1.1s of field evals here)
                n_refresh = (base_step + ci * cfg.steps_per_chunk) // (
                    cfg.occ_update_every * cfg.steps_per_chunk)
                partial = n_refresh >= cfg.full_refreshes
                self.occ = self._occ_fn(self.occ, self.state.params, sub,
                                        partial)

            origins, dirs, rgb, img_ids, inds_coarse, times = sampler.sample_chunk(
                cfg.steps_per_chunk, cfg.batch_rays
            )
            arrays = (origins, dirs, rgb) + ((times,) if cfg.time_dependent else ())
            args = [jax.device_put(a, data_sh) for a in arrays]
            key, sub = jax.random.split(key)
            self.state, losses, per_ray = self._chunk_fn(self.state, self.occ, *args, sub)
            if pending is not None:
                absorb(pending)
            pending = (img_ids, inds_coarse, per_ray, losses,
                       base_step + (ci + 1) * cfg.steps_per_chunk)

            if verbose and (ci % max(1, n_chunks // 20) == 0 or ci == n_chunks - 1):
                # print the PREVIOUS chunk's loss (already absorbed, so
                # the host never blocks on the chunk just dispatched —
                # syncing losses[-1] here re-serialized the pipeline)
                if self.history:
                    h = self.history[-1]
                    print(
                        f"step {h['step']}/{cfg.max_steps}: "
                        f"loss {h['loss']:.5f} "
                        f"psnr {float(mse2psnr(jnp.float32(h['loss']))):.2f} "
                        f"({time.time()-t0:.0f}s)"
                    )
        if pending is not None:
            absorb(pending)
        self._host_step = base_step + n_chunks * cfg.steps_per_chunk
        ent = self.history[hist_start:]
        if ent:
            # ONE stacked transfer for the whole fit: per-entry float()
            # costs a ~28 ms round trip EACH through the tunnel
            vals = np.asarray(jnp.stack([h["loss"] for h in ent]))
            for h, v in zip(ent, vals):
                h["loss"] = float(v)
        return self.state

    # ------------------------------------------------------------------
    def save_checkpoint(self, workspace: str, name: str = None, max_keep: int = 2):
        """Trainer.save_checkpoint analog (nerf/utils.py:1014-1074): params +
        EMA + occupancy + step, with max_keep rotation."""
        import glob
        import os
        import pickle

        ckpt_dir = os.path.join(workspace, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        name = name or f"ngp_ep{int(self.state.step):07d}"
        payload = {
            "format": "flnerf_ngp_v1",
            "step": int(self.state.step),
            "params": jax.tree_util.tree_map(np.asarray, self.state.params),
            "ema_params": (
                jax.tree_util.tree_map(np.asarray, self.state.ema_params)
                if self.state.ema_params is not None else None
            ),
            "occ_density": np.asarray(self.occ.density),
            "occ_mean": float(self.occ.mean_density),
            # full checkpoints carry the optimizer like the reference
            # (utils.py full=True): resuming with fresh Adam moments at
            # the decayed LR spikes the loss on converged params
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                self.state.opt_state),
        }
        path = os.path.join(ckpt_dir, f"{name}.pkl")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        # rotation (utils.py max_keep_ckpt)
        ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "ngp_ep*.pkl")))
        for old in ckpts[:-max_keep]:
            os.remove(old)
        return path

    def load_checkpoint(self, path_or_workspace: str, which: str = "latest"):
        """load_checkpoint analog (utils.py:1076+; latest/path policies)."""
        import glob
        import os
        import pickle

        path = path_or_workspace
        if os.path.isdir(path_or_workspace):
            ckpts = sorted(
                glob.glob(os.path.join(path_or_workspace, "checkpoints", "ngp_ep*.pkl"))
            )
            if not ckpts:
                raise FileNotFoundError(path_or_workspace)
            path = ckpts[-1]
        with open(path, "rb") as f:
            d = pickle.load(f)
        assert d.get("format") == "flnerf_ngp_v1"
        rep = replicated(self.mesh)
        params = jax.tree_util.tree_map(jnp.asarray, d["params"])
        ema = (
            jax.tree_util.tree_map(jnp.asarray, d["ema_params"])
            if d.get("ema_params") is not None else None
        )
        opt_state = self.state.opt_state
        if d.get("opt_state") is not None:
            # restore Adam moments matching the params/step (older
            # checkpoints without the field keep the live opt_state)
            opt_state = jax.tree_util.tree_map(
                lambda live, saved: jnp.asarray(saved, live.dtype)
                if hasattr(live, "dtype") else saved,
                opt_state, d["opt_state"])
        self.state = jax.device_put(
            NGPTrainState(params, opt_state, jnp.int32(d["step"]), ema), rep
        )
        self._host_step = int(d["step"])  # host int from the pickle
        self.occ = jax.device_put(
            OccupancyState(
                jnp.asarray(d["occ_density"]), jnp.float32(d["occ_mean"]),
                bits=pack_occupancy(
                    jnp.asarray(d["occ_density"]),
                    jnp.float32(d["occ_mean"]), self.rcfg)
                if d["occ_density"].size % 32 == 0 else None),
            rep,
        )
        return path

    def eval_images(self, poses, images, H, W, K, chunk: int = 8192,
                    use_ema: bool = False, times=None):
        params = (
            self.state.ema_params
            if use_ema and self.state.ema_params is not None
            else self.state.params
        )
        psnrs, ssims = [], []
        for i in range(poses.shape[0]):
            rgb, _ = ngp_render_image(
                params, self.density_fn, self.rgb_fn, self.occ,
                self.rcfg, H, W, K, poses[i][:3, :4], chunk=chunk,
                time=(float(times[i]) if times is not None else None),
                bg_fn=self.bg_fn,
            )
            gt = np.asarray(images[i])
            if gt.shape[-1] == 4:
                # RGBA gt: composite on the eval bg color (utils.py:471:
                # eval always uses white/bg_color, never the random bg)
                gt = gt[..., :3] * gt[..., 3:] + (
                    self.rcfg.bg_color * (1.0 - gt[..., 3:]))
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(float(mse2psnr(mse)))
            ssims.append(float(compute_ssim(jnp.asarray(gt), jnp.asarray(rgb))))
        return float(np.mean(psnrs)), float(np.mean(ssims))
