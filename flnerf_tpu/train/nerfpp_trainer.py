"""NeRF++ cascade training driver (ddp_train_nerf.py re-designed for TPU).

Reference flow (nerf++-ours/ddp_train_nerf.py:187-324, 327-427):
  per batch, for each cascade level m: level 0 samples fg depths uniformly
  to the unit-sphere exit + bg depths uniformly in [0,1] (both perturbed);
  level 1 importance-samples from level-0 weights and concat+sorts; each
  level has its OWN Adam and takes its own backward/step per iteration.
  Per-leaf MEAN loss drives quadtree subdivision (tree.py:621-622).

TPU structure: both cascade levels live in one jitted scan step (two
value_and_grads, two optimizer updates per step — same math, one dispatch);
rays shard over the data mesh axis; LR decays by
lrate_decay_factor^(iter/lrate_decay_steps) (flags at ddp_train_nerf.py:470+).
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flnerf_tpu.core.metrics import compute_ssim, mse2psnr
from flnerf_tpu.models.nerfpp import (
    NerfPPConfig,
    init_nerfpp,
    intersect_sphere,
    nerfpp_render,
    perturb_samples,
)
from flnerf_tpu.parallel.mesh import DATA_AXIS, make_mesh, pad_to_multiple, replicated
from flnerf_tpu.rays.quadtree import RayBudgeter, RayEpoch
from flnerf_tpu.render.sampling import sample_pdf
from jax.sharding import NamedSharding, PartitionSpec as P


class NerfPPTrainConfig(NamedTuple):
    n_epoch: int = 6
    batch_size: int = 2880
    lrate: float = 5e-4
    lrate_decay_factor: float = 0.1
    lrate_decay_steps: int = 5000
    subdivide_every: int = 1
    subdivide_thres: float = 0.015
    rand_samp_perc: float = 0.5
    prob_sampling: bool = True      # nerf++ uses sharpness maps (282-284)
    steps_per_chunk: int = 16
    min_depth: float = 1e-4
    seed: int = 777                 # torch.manual_seed(777), :139
    compute_dtype: str = "bfloat16"


class NerfPPState(NamedTuple):
    params: Tuple[Any, ...]      # one param tree per cascade level
    opt_states: Tuple[Any, ...]
    global_iter: jnp.ndarray


def _leaf_buf_size(n: int) -> int:
    size = 1024
    while size < n + 1:
        size *= 2
    return size


class NerfPPTrainer:
    def __init__(self, model_cfg: NerfPPConfig, train_cfg: NerfPPTrainConfig,
                 mesh=None, n_images: int = 0):
        self.mcfg = model_cfg
        self.cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self.dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32

        key = jax.random.PRNGKey(train_cfg.seed)
        keys = jax.random.split(key, len(model_cfg.cascade_samples))
        # n_images > 0 + optim_autoexpo creates the per-image (scale,
        # shift) table (NerfNetWithAutoExpo, ddp_model.py:158-186)
        params = tuple(init_nerfpp(k, model_cfg, n_images) for k in keys)
        opt_states = tuple(self.tx.init(p) for p in params)
        rep = replicated(self.mesh)
        self.state = jax.device_put(
            NerfPPState(params, opt_states, jnp.int32(0)), rep
        )
        self._chunk_fns = {}
        self.history = []

    # ------------------------------------------------------------------
    def _render_level(self, params, key, ray_o, ray_d, fg_z_max, prev, level, n_samples):
        """Depth sampling for one cascade level + render."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if level == 0:
            step = (fg_z_max - self.cfg.min_depth) / (n_samples - 1)
            fg_depth = self.cfg.min_depth + step[..., None] * jnp.arange(n_samples)
            fg_depth = perturb_samples(k1, fg_depth)
            bg_depth = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples), ray_o.shape[:-1] + (n_samples,)
            )
            bg_depth = perturb_samples(k2, bg_depth)
        else:
            fg_w = jax.lax.stop_gradient(prev["fg_weights"])[..., 1:-1]
            fg_mid = 0.5 * (prev["fg_depth_vals"][..., 1:] + prev["fg_depth_vals"][..., :-1])
            fg_new = sample_pdf(k3, fg_mid, fg_w, n_samples)
            fg_depth = jnp.sort(
                jnp.concatenate([prev["fg_depth_vals"], fg_new], -1), -1
            )
            bg_w = jax.lax.stop_gradient(prev["bg_weights"])[..., 1:-1]
            bg_mid = 0.5 * (prev["bg_depth_vals"][..., 1:] + prev["bg_depth_vals"][..., :-1])
            bg_new = sample_pdf(k4, bg_mid, bg_w, n_samples)
            bg_depth = jnp.sort(
                jnp.concatenate([prev["bg_depth_vals"], bg_new], -1), -1
            )

        out = nerfpp_render(
            params, ray_o, ray_d, fg_z_max, fg_depth, bg_depth, self.mcfg, self.dtype
        )
        out["fg_depth_vals"] = fg_depth
        out["bg_depth_vals"] = bg_depth
        return out

    def _make_chunk_fn(self, leaf_buf: int):
        cfg, mcfg, tx = self.cfg, self.mcfg, self.tx

        def one_step(state: NerfPPState, err_buf, xs):
            origins, dirs, rgb, leaf, mask, img, key = xs
            fg_z_max, _ = intersect_sphere(origins, dirs)
            keys = jax.random.split(key, len(mcfg.cascade_samples))

            lr = cfg.lrate * cfg.lrate_decay_factor ** (
                state.global_iter.astype(jnp.float32) / cfg.lrate_decay_steps
            )

            params = list(state.params)
            opts = list(state.opt_states)
            prev = None
            losses = []
            final_rgb = None
            for m, n_samples in enumerate(mcfg.cascade_samples):
                def loss_fn(p, prev=prev, m=m, n_samples=n_samples):
                    out = self._render_level(
                        p, keys[m], origins, dirs, fg_z_max, prev, m, n_samples
                    )
                    mm = mask[:, None]
                    n_real = jnp.maximum(jnp.sum(mask), 1.0)
                    denom = n_real * 3.0
                    pred = out["rgb"]
                    if "autoexpo" in p:
                        # per-image exposure (ddp_model.py:182-186 +
                        # ddp_train_nerf.py:388-396): scale = |a|+0.5,
                        # pred = (rgb - shift)/scale, L1 reg toward (1,0)
                        ae = p["autoexpo"][img]
                        scale = jnp.abs(ae[:, 0:1]) + 0.5
                        shift = ae[:, 1:2]
                        pred = (pred - shift) / scale
                    loss = jnp.sum(mm * (pred - rgb) ** 2) / denom
                    if "autoexpo" in p:
                        reg = jnp.abs(scale[:, 0] - 1.0) + jnp.abs(shift[:, 0])
                        loss = loss + mcfg.lambda_autoexpo * jnp.sum(
                            mask * reg) / n_real
                    return loss, out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params[m])
                updates, opts[m] = tx.update(grads, opts[m], params[m])
                updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
                params[m] = optax.apply_updates(params[m], updates)
                prev = jax.lax.stop_gradient(out)
                losses.append(loss)
                final_rgb = out["rgb"]

            per_ray_err = jnp.max(jnp.abs(final_rgb - rgb), axis=-1)
            safe_leaf = jnp.where(mask > 0, leaf, leaf_buf - 1)
            err_buf = (
                err_buf[0].at[safe_leaf].add(jnp.where(mask > 0, per_ray_err, 0.0)),
                err_buf[1].at[safe_leaf].add(mask),
            )
            # padding-only steps are true no-ops: zero grads would still
            # decay each level's Adam moments and emit a stale-momentum
            # step (see trainer.py one_step)
            has = jnp.sum(mask) > 0.0
            sel = lambda a, b: jnp.where(has, a, b)
            new_state = NerfPPState(
                jax.tree_util.tree_map(sel, tuple(params), state.params),
                jax.tree_util.tree_map(sel, tuple(opts), state.opt_states),
                state.global_iter + has.astype(state.global_iter.dtype),
            )
            # carry the real-ray count so the epoch metric can skip
            # padding-only steps (their losses are 0 and would understate
            # the reported mse)
            return new_state, err_buf, (jnp.stack(losses), jnp.sum(mask))

        def chunk_fn(state, err_buf, origins, dirs, rgb, leaf, mask, img,
                     base_key):
            keys = jax.random.split(base_key, origins.shape[0])

            def body(carry, xs):
                st, buf = carry
                st, buf, losses = one_step(st, buf, xs)
                return (st, buf), losses

            (state, err_buf), losses = jax.lax.scan(
                body, (state, err_buf),
                (origins, dirs, rgb, leaf, mask, img, keys)
            )
            return state, err_buf, losses

        data_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
        rep = replicated(self.mesh)
        return jax.jit(
            chunk_fn,
            in_shardings=(rep, rep, data_sh, data_sh, data_sh, data_sh,
                          data_sh, data_sh, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def _chunk_fn(self, leaf_buf):
        if leaf_buf not in self._chunk_fns:
            self._chunk_fns[leaf_buf] = self._make_chunk_fn(leaf_buf)
        return self._chunk_fns[leaf_buf]

    # ------------------------------------------------------------------
    def run_epoch_rays(self, epoch: RayEpoch, epoch_key):
        cfg = self.cfg
        B, K = cfg.batch_size, cfg.steps_per_chunk
        n = epoch.origins.shape[0]
        # host-side analog of the reference's hard assert
        # (ddp_train_nerf.py:54-70): the jitted intersect_sphere only
        # masks misses, which silently trains fog on unnormalized scenes
        if n:
            o, d = epoch.origins, epoch.dirs
            d1 = -np.sum(d * o, -1) / np.maximum(np.sum(d * d, -1), 1e-12)
            pmid = o + d1[..., None] * d
            n_out = int(np.sum(np.sum(pmid * pmid, -1) >= 1.0))
            if n_out:
                raise ValueError(
                    f"{n_out}/{n} rays never enter the unit sphere — "
                    "nerf++ needs cameras normalized into it "
                    "(data/pose_tools.py normalize_cam_dict)")
        n_pad = pad_to_multiple(max(n, 1), B * K)

        def pad(a, fill=0.0):
            out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        origins = pad(epoch.origins)
        dirs = pad(epoch.dirs)
        dirs[n:] = np.array([0, 0, -1.0], np.float32)
        origins[n:] = 0.0
        rgb = pad(epoch.rgb)
        leaf = pad(epoch.leaf_id.astype(np.int32))
        img = pad(epoch.img.astype(np.int32)) if epoch.img is not None \
            else np.zeros(n_pad, np.int32)
        mask = np.zeros(n_pad, np.float32)
        mask[:n] = 1.0

        leaf_buf = _leaf_buf_size(epoch.n_leaves)
        chunk_fn = self._chunk_fn(leaf_buf)
        rep = replicated(self.mesh)
        err_buf = jax.device_put(
            (jnp.zeros((leaf_buf,)), jnp.zeros((leaf_buf,))), rep
        )
        data_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        n_chunks = n_pad // (B * K)
        keys = jax.random.split(epoch_key, n_chunks)
        all_losses = []
        for ci in range(n_chunks):
            sl = slice(ci * B * K, (ci + 1) * B * K)
            args = [
                a[sl].reshape((K, B) + a.shape[1:])
                for a in (origins, dirs, rgb, leaf, mask, img)
            ]
            args = [jax.device_put(a, data_sh) for a in args]
            self.state, err_buf, losses = chunk_fn(self.state, err_buf, *args, keys[ci])
            # device arrays stay put: per-chunk np.asarray costs a ~28 ms
            # tunnel round trip and serializes dispatch (see trainer.py)
            all_losses.append(losses)

        err_sum, err_cnt = err_buf
        stat = np.asarray(err_sum)[: epoch.n_leaves] / np.maximum(
            np.asarray(err_cnt)[: epoch.n_leaves], 1.0
        )
        stat[np.asarray(err_cnt)[: epoch.n_leaves] == 0] = -np.inf
        # finest-level loss of the last step that saw real rays
        ls = np.concatenate([np.asarray(l) for l, c in all_losses], axis=0)
        cs = np.concatenate([np.asarray(c) for l, c in all_losses], axis=0)
        real = np.nonzero(cs > 0)[0]
        mse = float(ls[real[-1], -1]) if real.size else 0.0
        return stat, mse

    def fit(self, budgeter: RayBudgeter, start_epoch: int = 0, on_epoch_end=None, verbose=True):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()
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

            # mean-loss subdivision (nerf++-ours/tree.py:621-622), same
            # epoch guard as ddp_train_nerf.py:298-304
            if (
                cfg.subdivide_every > 0
                and epoch_id % cfg.subdivide_every == 0
                and epoch_id < cfg.n_epoch - 1
            ):
                n_split = budgeter.adjust(leaf_stat, cfg.subdivide_thres)
                if verbose:
                    print(f"  subdivided {n_split} -> {budgeter.forest.n_leaves} leaves")

            psnr = float(mse2psnr(jnp.float32(mse)))
            self.history.append(
                {"epoch": epoch_id, "wall_s": time.time() - t0, "train_psnr": psnr}
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
    def _eval_rays(self, rays_o, rays_d, chunk: int = 4096):
        """Render arbitrary [N,3] ray batches (chunked, deterministic keys)."""
        if not hasattr(self, "_eval_fn"):
            mcfg = self.mcfg

            @jax.jit
            def eval_fn(params, ro, rd):
                fg_z_max, _ = intersect_sphere(ro, rd)
                prev = None
                out = None
                for m, n_samples in enumerate(mcfg.cascade_samples):
                    key = jax.random.PRNGKey(m)
                    out = self._render_level(
                        params[m], key, ro, rd, fg_z_max, prev, m, n_samples
                    )
                    prev = out
                return out["rgb"]

            self._eval_fn = eval_fn

        n = rays_o.shape[0]
        n_pad = pad_to_multiple(n, chunk)
        if n_pad != n:
            rays_o = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (n_pad - n, 3))])
            rays_d = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (n_pad - n, 3))])
        outs = []
        for i in range(0, n_pad, chunk):
            outs.append(self._eval_fn(self.state.params, rays_o[i:i+chunk], rays_d[i:i+chunk]))
        return jnp.concatenate(outs, 0)[:n]

    def render_image(self, H, W, K, c2w, chunk: int = 4096):
        """Full-image chunked cascade render (render_single_image analog,
        ddp_test_nerf.py:126-227). Uses the OpenCV ray convention of the
        nerf++ data pipeline."""
        from flnerf_tpu.data.nerfpp_dataset import get_rays_opencv_np

        intr4 = np.eye(4, dtype=np.float32)
        intr4[:3, :3] = np.asarray(K)[:3, :3]
        ro, rd = get_rays_opencv_np(H, W, intr4, np.asarray(c2w))
        rgb = self._eval_rays(
            jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)), chunk
        )
        return np.asarray(rgb).reshape(H, W, 3)

    def eval_images(self, poses, images, H, W, K, chunk: int = 4096):
        psnrs, ssims = [], []
        for i in range(poses.shape[0]):
            rgb = self.render_image(H, W, K, poses[i][:3, :4], chunk)
            mse = float(np.mean((rgb - images[i]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            ssims.append(float(compute_ssim(jnp.asarray(images[i]), jnp.asarray(rgb))))
        return float(np.mean(psnrs)), float(np.mean(ssims))
