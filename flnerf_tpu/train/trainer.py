"""Quadtree-NeRF training driver (TPU-native re-design of run_nerf.py:train).

Reference call stack being replaced (nerf-ours/run_nerf.py:156-546):
  epoch loop: gen_rays (CPU threadpool) -> python while-loop of single
  optimizer steps (with per-iter GPU->CPU prediction copies at 505-506) ->
  adjust_tree_multiThread (CPU) -> torch.save.

TPU-first structure:
  * Each dispatch executes a ``lax.scan`` over ``steps_per_chunk`` optimizer
    steps (one compiled executable reused across epochs), amortizing host
    dispatch overhead that would otherwise dominate at ~1920-ray batches.
  * The per-(img,leaf) loss statistic for subdivision is accumulated ON
    DEVICE inside the scan with a scatter-max/sum into a padded [L] buffer;
    only that buffer crosses to the host, once per epoch.
  * Ray batches are sharded over the ``data`` mesh axis; gradients are
    reduced by XLA collectives under jit (no DataParallel, SURVEY.md §2.8).
  * LR schedule: lrate * 0.1^(iter / (lrate_decay*1000)), run_nerf.py:498-503.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flnerf_tpu.core.metrics import compute_ssim, img2mse, mse2psnr
from flnerf_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
)
from flnerf_tpu.rays.quadtree import RayBudgeter, RayEpoch
from flnerf_tpu.render.renderer import RenderConfig, render_image, render_rays
from jax.sharding import NamedSharding, PartitionSpec as P


class TrainConfig(NamedTuple):
    n_epoch: int = 18
    n_rand: int = 1920             # N_rand rays per optimizer step
    lrate: float = 5e-4
    lrate_decay: int = 500         # in 1000s of iters
    init_level: int = 2
    subdivide_every: int = 3
    subdivide_thres: float = 1e-3
    rand_samp_perc: float = 1.0    # fraction of in-leaf rays drawn uniformly
    prob_sampling: bool = False    # run_nerf.py:452 passes prob=False
    leaf_stat: str = "max"         # 'max' (nerf-ours) or 'mean' (nerf++/plenoxels)
    steps_per_chunk: int = 32      # scan length per device dispatch
    precrop_iters: int = 500
    seed: int = 0


class TrainState(NamedTuple):
    params_coarse: Any
    params_fine: Any
    opt_state: Any
    global_iter: jnp.ndarray  # int32 scalar


def _leaf_buf_size(n_leaves: int) -> int:
    """Bucket the leaf-stat buffer size to limit recompiles across epochs."""
    size = 1024
    while size < n_leaves + 1:
        size *= 2
    return size


def make_optimizer():
    """Adam moments only; LR is applied inside the step from global_iter."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


class NerfTrainer:
    """Trainer for the MLP field backends (nerf, and later nerf++)."""

    def __init__(
        self,
        query_fn: Callable,
        init_fn: Callable,
        render_cfg: RenderConfig,
        train_cfg: TrainConfig,
        mesh=None,
    ):
        self.query_fn = query_fn
        self.render_cfg = render_cfg
        self.cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(self.mesh.devices.size)
        self.tx = make_optimizer()

        key = jax.random.PRNGKey(train_cfg.seed)
        kc, kf = jax.random.split(key)
        params_coarse = init_fn(kc)
        params_fine = init_fn(kf) if render_cfg.n_importance > 0 else None
        opt_state = self.tx.init((params_coarse, params_fine))
        state = TrainState(params_coarse, params_fine, opt_state, jnp.int32(0))
        rep = replicated(self.mesh)
        self.state = jax.device_put(state, rep)

        self._chunk_fn_cache: Dict[int, Callable] = {}
        self.history: list = []  # (wall_s, epoch, psnr) time-to-PSNR record

    # ------------------------------------------------------------------
    def _make_chunk_fn(self, leaf_buf: int) -> Callable:
        """Compiled: scan of steps_per_chunk optimizer steps + leaf-stat
        accumulation into a [leaf_buf] buffer."""
        query_fn = self.query_fn
        rc = self.render_cfg
        cfg = self.cfg
        tx = self.tx
        use_mean = cfg.leaf_stat == "mean"

        def one_step(state: TrainState, buffers, xs):
            origins, dirs, viewdirs, rgb, leaf, mask, key = xs

            def loss_fn(pc_pf):
                pc, pf = pc_pf
                out = render_rays(
                    key, pc, pf, query_fn, origins, dirs, rc, viewdirs=viewdirs
                )
                m = mask[:, None]
                cnt = jnp.sum(mask) * 3.0
                denom = jnp.maximum(cnt, 1.0)
                fine_sq = jnp.sum(m * (out["rgb"] - rgb) ** 2)
                loss = fine_sq / denom
                if "rgb0" in out:
                    loss = loss + jnp.sum(m * (out["rgb0"] - rgb) ** 2) / denom
                per_ray_err = jnp.max(jnp.abs(out["rgb"] - rgb), axis=-1)
                return loss, (fine_sq, cnt, per_ray_err)

            (loss, (fine_sq, cnt, per_ray_err)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )((state.params_coarse, state.params_fine))

            updates, new_opt = tx.update(
                grads, state.opt_state, (state.params_coarse, state.params_fine)
            )
            lr = cfg.lrate * 0.1 ** (
                state.global_iter.astype(jnp.float32) / (cfg.lrate_decay * 1000.0)
            )
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_pc, new_pf = optax.apply_updates(
                (state.params_coarse, state.params_fine), updates
            )

            if use_mean:
                err_sum, err_cnt = buffers
                safe_leaf = jnp.where(mask > 0, leaf, leaf_buf - 1)
                err_sum = err_sum.at[safe_leaf].add(jnp.where(mask > 0, per_ray_err, 0.0))
                err_cnt = err_cnt.at[safe_leaf].add(mask)
                new_buffers = (err_sum, err_cnt)
            else:
                err_max = buffers
                masked_err = jnp.where(mask > 0, per_ray_err, -jnp.inf)
                safe_leaf = jnp.where(mask > 0, leaf, leaf_buf - 1)
                err_max = err_max.at[safe_leaf].max(masked_err)
                new_buffers = err_max

            # padding-only steps (cnt == 0) must be true no-ops: the zero
            # grads would still decay Adam moments and emit a
            # stale-momentum step at full LR (the reference never runs an
            # optimizer step on non-existent rays), so select the old
            # state wholesale and do not advance the LR-decay counter
            has = cnt > 0.0
            sel = lambda a, b: jnp.where(has, a, b)
            new_state = TrainState(
                jax.tree_util.tree_map(sel, new_pc, state.params_coarse),
                jax.tree_util.tree_map(sel, new_pf, state.params_fine),
                jax.tree_util.tree_map(sel, new_opt, state.opt_state),
                state.global_iter + has.astype(state.global_iter.dtype),
            )
            # (sq_sum, value_count): padding-only steps carry zero weight,
            # so the epoch metric can be RAY-WEIGHTED — a plain mean over
            # steps diluted the reported mse by up to the pad fraction
            # (an all-pad step reports 0), overstating train PSNR
            return new_state, new_buffers, (loss, fine_sq, cnt)

        def chunk_fn(state: TrainState, buffers, origins, dirs, viewdirs, rgb, leaf, mask, base_key):
            keys = jax.random.split(base_key, origins.shape[0])

            def body(carry, xs):
                st, buf = carry
                st, buf, metrics = one_step(st, buf, xs)
                return (st, buf), metrics

            (state, buffers), metrics = jax.lax.scan(
                body, (state, buffers), (origins, dirs, viewdirs, rgb, leaf, mask, keys)
            )
            return state, buffers, metrics

        data_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        rep = replicated(self.mesh)
        jitted = jax.jit(
            chunk_fn,
            in_shardings=(rep, rep, data_sh, data_sh, data_sh, data_sh, data_sh, data_sh, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
        return jitted

    def _chunk_fn(self, leaf_buf: int) -> Callable:
        if leaf_buf not in self._chunk_fn_cache:
            self._chunk_fn_cache[leaf_buf] = self._make_chunk_fn(leaf_buf)
        return self._chunk_fn_cache[leaf_buf]

    # ------------------------------------------------------------------
    def _init_buffers(self, leaf_buf: int):
        rep = replicated(self.mesh)
        if self.cfg.leaf_stat == "mean":
            return jax.device_put(
                (jnp.full((leaf_buf,), 0.0), jnp.zeros((leaf_buf,))), rep
            )
        return jax.device_put(jnp.full((leaf_buf,), -jnp.inf), rep)

    def _finalize_leaf_stat(self, buffers, n_leaves: int) -> np.ndarray:
        if self.cfg.leaf_stat == "mean":
            err_sum, err_cnt = buffers
            stat = np.asarray(err_sum)[:n_leaves] / np.maximum(np.asarray(err_cnt)[:n_leaves], 1.0)
            stat[np.asarray(err_cnt)[:n_leaves] == 0] = -np.inf
            return stat
        return np.asarray(buffers)[:n_leaves]

    def run_epoch_rays(
        self, epoch: RayEpoch, epoch_key, log_every: int = 0
    ) -> Tuple[np.ndarray, float]:
        """Train on one epoch's rays; returns (leaf_stat [n_leaves], mean fine MSE)."""
        cfg = self.cfg
        B = cfg.n_rand
        K = cfg.steps_per_chunk
        n = epoch.origins.shape[0]
        n_pad = pad_to_multiple(max(n, 1), B * K)

        def pad(a, fill=0.0):
            out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        origins = pad(epoch.origins)
        dirs = pad(epoch.dirs)
        dirs[n:] = np.array([0, 0, -1.0], np.float32)  # keep norms finite
        if epoch.viewdirs is not None:
            vdirs = pad(epoch.viewdirs)
        else:
            vdirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        vdirs[n:] = np.array([0, 0, -1.0], np.float32)
        rgb = pad(epoch.rgb)
        leaf = pad(epoch.leaf_id.astype(np.int32))
        mask = np.zeros(n_pad, np.float32)
        mask[:n] = 1.0

        leaf_buf = _leaf_buf_size(epoch.n_leaves)
        chunk_fn = self._chunk_fn(leaf_buf)
        buffers = self._init_buffers(leaf_buf)

        n_chunks = n_pad // (B * K)
        data_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        losses = []
        keys = jax.random.split(epoch_key, n_chunks)
        for ci in range(n_chunks):
            sl = slice(ci * B * K, (ci + 1) * B * K)
            args = [
                a[sl].reshape((K, B) + a.shape[1:])
                for a in (origins, dirs, vdirs, rgb, leaf, mask)
            ]
            args = [jax.device_put(a, data_sh) for a in args]
            self.state, buffers, metrics = chunk_fn(self.state, buffers, *args, keys[ci])
            if log_every and ci % log_every == 0:
                loss, sq, cnt = jax.tree_util.tree_map(lambda m: float(m[-1]), metrics)
                print(
                    f"  chunk {ci}/{n_chunks}: loss {loss:.4f} "
                    f"psnr {float(mse2psnr(jnp.float32(sq / max(cnt, 1.0)))):.2f}"
                )
            # device arrays stay put: per-chunk np.asarray costs a ~28 ms
            # tunnel sync each and stalls the dispatch pipeline; one
            # conversion after the loop syncs everything at once
            losses.append((metrics[1], metrics[2]))

        sqs = np.concatenate([np.asarray(l[0]) for l in losses])
        cnts = np.concatenate([np.asarray(l[1]) for l in losses])
        leaf_stat = self._finalize_leaf_stat(buffers, epoch.n_leaves)
        # RAY-WEIGHTED mse over the last up-to-16 steps that actually saw
        # real rays (padding-only steps have zero weight and are skipped)
        real = cnts > 0
        sq_r, cnt_r = sqs[real][-16:], cnts[real][-16:]
        mse = float(sq_r.sum() / max(cnt_r.sum(), 1.0)) if cnt_r.size else 0.0
        return leaf_stat, mse

    # ------------------------------------------------------------------
    def precrop_warmup(self, budgeter: RayBudgeter, key) -> None:
        """Center-crop warmup when starting fresh (run_nerf.py:367-423):
        500*N_rand rays total, drawn without replacement from the central
        half-crop of every training view."""
        cfg = self.cfg
        H, W = budgeter.H, budgeter.W
        dH, dW = H // 4, W // 4
        xs = np.arange(H // 2 - dH, H // 2 + dH)
        ys = np.arange(W // 2 - dW, W // 2 + dW)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        coords = np.stack([gx.ravel(), gy.ravel()], -1)
        rand_num = int(cfg.n_rand * cfg.precrop_iters / budgeter.n_images)
        # the reference runs precrop_iters FULL batches (run_nerf.py:367-423,
        # with replacement across iters) — only fall back to without-
        # replacement when the budget fits inside one pass of the crop.
        # Draw INDEPENDENTLY per image: tiling one coordinate set across
        # all views trains every view on the identical pixel lattice,
        # correlating the warmup batches (the reference redraws per iter)
        sel = np.stack([
            budgeter.rng.choice(coords.shape[0], size=rand_num,
                                replace=rand_num > coords.shape[0])
            for _ in range(budgeter.n_images)
        ])                                           # [n_images, rand_num]
        cs = coords[sel.ravel()]

        img_idx = np.repeat(np.arange(budgeter.n_images), rand_num)
        px = cs[:, 0]
        py = cs[:, 1]
        epoch = RayEpoch(
            origins=budgeter.origins[img_idx, px, py],
            dirs=budgeter.dirs[img_idx, px, py],
            rgb=budgeter.images[img_idx, px, py],
            leaf_id=np.zeros(img_idx.shape[0], np.int32),
            n_leaves=1,
        )
        self.run_epoch_rays(epoch, key)

    def fit(
        self,
        budgeter: RayBudgeter,
        start_epoch: int = 0,
        on_epoch_end: Optional[Callable] = None,
        verbose: bool = True,
    ):
        """Full training run (epoch loop of run_nerf.py:427-546)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()

        if start_epoch == 0 and cfg.precrop_iters > 0:
            key, sub = jax.random.split(key)
            if verbose:
                print(f"center-crop warmup ({cfg.precrop_iters} iters)...")
            self.precrop_warmup(budgeter, sub)

        for epoch_id in range(start_epoch + 1, cfg.n_epoch + 1):
            te = time.time()
            last = epoch_id == cfg.n_epoch
            epoch = budgeter.gen_rays(
                down_scale=1,
                prob=cfg.prob_sampling and not last,
                rand_samp_perc=cfg.rand_samp_perc,
                last_epoch=last,
            )
            key, sub = jax.random.split(key)
            leaf_stat, mse = self.run_epoch_rays(epoch, sub)

            if (
                cfg.subdivide_every > 0
                and epoch_id % cfg.subdivide_every == 0
                and epoch_id < cfg.n_epoch - 1
            ):
                n_split = budgeter.adjust(leaf_stat, cfg.subdivide_thres)
                if verbose:
                    print(f"  subdivided {n_split} leaves -> {budgeter.forest.n_leaves}")

            psnr = float(mse2psnr(jnp.float32(mse)))
            self.history.append(
                {"epoch": epoch_id, "wall_s": time.time() - t0, "train_psnr": psnr,
                 "rays": int(epoch.origins.shape[0])}
            )
            if verbose:
                print(
                    f"epoch {epoch_id}/{cfg.n_epoch}: rays {epoch.origins.shape[0]} "
                    f"train-psnr {psnr:.2f} ({time.time()-te:.1f}s)"
                )
            if on_epoch_end is not None:
                on_epoch_end(self, epoch_id)

        return self.state

    # ------------------------------------------------------------------
    def eval_images(self, poses, images, H, W, K, chunk: int = 8192):
        """PSNR/SSIM over held-out views (render_path analog, render.py:94-146)."""
        psnrs, ssims = [], []
        for i in range(poses.shape[0]):
            rgb, _, _ = render_image(
                self.state.params_coarse, self.state.params_fine, self.query_fn,
                self.render_cfg, H, W, K, poses[i][:3, :4], chunk=chunk,
            )
            mse = float(np.mean((rgb - images[i]) ** 2))
            psnrs.append(float(mse2psnr(mse)))
            ssims.append(float(compute_ssim(jnp.asarray(images[i]), jnp.asarray(rgb))))
        return float(np.mean(psnrs)), float(np.mean(ssims))
