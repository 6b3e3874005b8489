"""Plenoxels training driver (plenoxels-ours/opt/opt.py re-designed for TPU).

Reference flow (opt.py:228-609): per epoch, replace the dataset's rays from
the quadtree manager; per batch, fused render + MSE + TV-regularized grads +
manual RMSProp steps on (density, sh) with separate exponential(+delayed) LR
schedules (util.py:78 get_expon_lr_func); subdivision by mean leaf loss;
ckpt{epoch}.npz saves; scheduled upsample/prune.

TPU structure: one jitted scan over steps_per_chunk batches; the CUDA fused
volume_render_cuvol_fused (render_lerp_kernel_cuvol.cu) becomes
jax.value_and_grad over the dense-grid renderer — forward, MSE gradient,
and scatter into grid grads all inside one compiled step.  RMSProp runs as
elementwise tree math (optim_kernel.cu:28 analog).  TV gradients come from
autodiff of the dense TV value (loss_kernel.cu:112 analog) or, with
tv_sparsity < 1, from the unbiased random-slab estimator (tv_loss_slab,
the tv_grad_sparse analog at loss_kernel.cu:179) so big-grid configs
don't pay a full O(reso^3) TV sweep per step.
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.core.metrics import compute_ssim, mse2psnr
from flnerf_tpu.models.voxel_sh import (
    VoxelGrid,
    VoxelGridConfig,
    grid_scaling,
    init_voxel_grid,
    msi_background,
    prune_grid,
    sparsify_background,
    tv_loss,
    tv_loss_lumisphere,
    tv_loss_slab,
    tv_loss_background,
    upsample_grid,
    voxel_render_rays,
)
from flnerf_tpu.ops import voxel_pallas as vp
from flnerf_tpu.parallel.mesh import DATA_AXIS, make_mesh, pad_to_multiple, replicated
from flnerf_tpu.rays.quadtree import RayBudgeter, RayEpoch
from jax.sharding import NamedSharding, PartitionSpec as P


def expon_lr(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps):
    """Delayed log-lerp LR (opt/util/util.py:78 get_expon_lr_func)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


class PlenoxelsTrainConfig(NamedTuple):
    n_epoch: int = 8
    batch_size: int = 5000
    lr_sigma: float = 3e1            # opt.py defaults (syn.json)
    lr_sigma_final: float = 5e-2
    lr_sigma_delay_steps: int = 15000
    lr_sigma_delay_mult: float = 1e-2
    lr_sh: float = 1e-2
    lr_sh_final: float = 5e-6
    lr_decay_steps: int = 250000
    rms_beta: float = 0.95
    lambda_tv: float = 1e-5
    lambda_tv_sh: float = 1e-3
    # fraction of z-planes whose TV is sampled per step (1.0 = dense);
    # the tv_grad_sparse analog (loss_kernel.cu:179), see tv_loss_slab
    tv_sparsity: float = 1.0
    # lumisphere TV (loss_kernel.cu:336): spatial TV of the view-dependent
    # radiance at a random per-step direction; the regularizer the
    # reference pairs with learned basis types.  XLA train path only.
    lambda_tv_lumisphere: float = 0.0
    tv_lumisphere_dir_factor: float = 0.0
    # MSI background optimization (opt.py:499-500 optim_background_step +
    # argument_parser.py:95-109 LR schedule, 208-211 TV weights); active
    # whenever the grid carries a background (background_nlayers > 0)
    lr_sigma_bg: float = 3e0
    lr_sigma_bg_final: float = 3e-3
    lr_color_bg: float = 1e-1
    lr_color_bg_final: float = 5e-6
    lambda_tv_background_sigma: float = 1e-2
    lambda_tv_background_color: float = 1e-2
    background_density_thresh: float = 1.0  # sparsify_background threshold
    # learned-basis optimization (svox2.py:2091 optim_basis_step +
    # argument_parser.py:113-124 --lr_basis schedule); active whenever the
    # grid carries a learned basis (basis_type != 'sh')
    lr_basis: float = 1e-6
    lr_basis_final: float = 1e-6
    subdivide_every: int = 1
    subdivide_thres: float = 0.015
    prob_sampling: bool = False
    rand_samp_perc: float = 1.0
    steps_per_chunk: int = 8
    upsample_epochs: Tuple[int, ...] = ()
    prune_sigma_thresh: float = 5.0
    seed: int = 0
    # Pallas fused render path (ops/voxel_pallas.py) — the TPU analog of
    # svox2's use_kernel=True.  Epoch rays are morton-ordered into 64-ray
    # blocks (block order shuffled); blocks whose spatial spread exceeds
    # the kernel's box are dropped from the loss (fraction reported).
    use_kernel: bool = False


class PlenoxelsState(NamedTuple):
    grid: VoxelGrid
    rms_density: jnp.ndarray
    rms_sh: jnp.ndarray
    step: jnp.ndarray
    # MSI background optimizer state (svox2.py:2048 background_rms) and the
    # dense analog of background_links >= 0 (sparsify_background pin mask)
    rms_bg: Optional[jnp.ndarray] = None
    bg_alive: Optional[jnp.ndarray] = None
    rms_basis: Optional[Any] = None   # svox2.py:2091 basis_rms


def _leaf_buf_size(n: int) -> int:
    size = 1024
    while size < n + 1:
        size *= 2
    return size


class PlenoxelsTrainer:
    def __init__(self, grid_cfg: VoxelGridConfig, train_cfg: PlenoxelsTrainConfig, mesh=None):
        self.gcfg = grid_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        if train_cfg.use_kernel and train_cfg.batch_size % vp.RB != 0:
            train_cfg = train_cfg._replace(
                batch_size=-(-train_cfg.batch_size // vp.RB) * vp.RB
            )
        self.cfg = train_cfg
        grid = init_voxel_grid(grid_cfg)
        rep = replicated(self.mesh)
        has_bg = grid.background is not None
        if grid_cfg.basis_type != "sh" and train_cfg.use_kernel:
            raise ValueError(
                "use_kernel supports basis_type='sh' only (the Pallas "
                "table packs closed-form SH); learned bases take the XLA "
                "train path")
        if train_cfg.lambda_tv_lumisphere > 0 and train_cfg.use_kernel:
            raise ValueError(
                "lambda_tv_lumisphere takes the XLA train path (the Pallas "
                "table bakes closed-form SH; radiance TV needs the basis)")
        if grid_cfg.backend != "cuvol" and train_cfg.use_kernel:
            raise ValueError(
                "use_kernel bakes cuvol marching; backend="
                f"{grid_cfg.backend!r} takes the XLA train path")
        self.state = jax.device_put(
            PlenoxelsState(
                grid,
                jnp.zeros_like(grid.density),
                jnp.zeros_like(grid.sh),
                jnp.int32(0),
                rms_bg=jnp.zeros_like(grid.background) if has_bg else None,
                bg_alive=(jnp.ones(grid.background.shape[:2], bool)
                          if has_bg else None),
                rms_basis=(jax.tree_util.tree_map(jnp.zeros_like, grid.basis)
                           if grid.basis is not None else None),
            ),
            rep,
        )
        self._chunk_fns = {}
        self.history = []

    # ------------------------------------------------------------------
    def _make_chunk_fn(self, leaf_buf: int, gcfg: VoxelGridConfig):
        cfg = self.cfg
        use_kernel = cfg.use_kernel
        has_bg = gcfg.background_nlayers > 0
        has_basis = gcfg.basis_type != "sh"
        # multichip kernel path only when each device's ray shard packs into
        # whole RB-ray blocks (never inflate the user's batch for it)
        n_dev = int(self.mesh.devices.size)
        shard_kernel = (use_kernel and n_dev > 1
                        and cfg.batch_size % (vp.RB * n_dev) == 0)

        def _kernel_fwd(density, sh, bgv, bg_alive, alive, origins, dirs,
                        rgb, mask):
            """Pallas-path squared-error sum + grads for a ray shard.
            Returns SUMS (not means) so the multichip psum composes.
            ``bgv``/``bg_alive`` are None without a background."""

            def raw_loss(train_vars):
                if has_bg:
                    density, sh, bgv = train_vars
                else:
                    density, sh = train_vars
                grid = VoxelGrid(density, sh, alive)
                # Fused Pallas path (the volume_render_cuvol_fused analog).
                # Spread-violating blocks drop out of the loss.
                blocks = vp.build_blocks(
                    origins, dirs, gcfg, vp.occupancy_mip(grid, gcfg))
                table = vp.pack_table(grid, gcfg)
                kout = vp.render_blocks(
                    table, blocks.rays, blocks.corners, blocks.valid, gcfg)
                flat = kout.reshape(-1, 8)
                rgb_out = flat[:, 0:3]
                if has_bg:
                    # compose the MSI background on top of the fused kernel:
                    # ch 4 (final logT) is differentiable through the kernel
                    # VJP, so density still feels the bg occlusion gradient
                    # (svox2's fused bg compositing, cuvol.cu:775-860)
                    remaining = jnp.exp(flat[:, 4])
                    viewdirs = dirs / jnp.linalg.norm(
                        dirs, axis=-1, keepdims=True)
                    wstep = gcfg.step_size / jnp.linalg.norm(
                        viewdirs * grid_scaling(gcfg), axis=-1)
                    bgm = jnp.where(bg_alive[:, :, None, None], bgv, 0.0)
                    bg_rgb, bg_rem = msi_background(
                        bgm, origins, viewdirs, remaining, wstep, gcfg)
                    rgb_out = (rgb_out
                               - remaining[:, None] * gcfg.background_brightness
                               + bg_rgb
                               + bg_rem[:, None] * gcfg.background_brightness)
                ray_ok = jnp.repeat(blocks.ok.astype(jnp.float32), vp.RB)
                eff = mask * ray_ok
                sq = jnp.sum(eff[:, None] * (rgb_out - rgb) ** 2)
                per_ray_err = jnp.max(jnp.abs(rgb_out - rgb), -1)
                return sq, (per_ray_err, eff)

            tv = (density, sh, bgv) if has_bg else (density, sh)
            (sq, (per_ray_err, eff)), grads = jax.value_and_grad(
                raw_loss, has_aux=True)(tv)
            g_bg = grads[2] if has_bg else None
            return sq, grads[0], grads[1], g_bg, per_ray_err, eff

        if shard_kernel:
            # Multichip kernel path: rays sharded over the data axis (each
            # device renders its own coherent blocks through the Pallas
            # kernels — grids replicate, grads psum over ICI); the TV
            # regularizer is added once outside the psum (DESIGN.md:
            # multichip plenoxels).
            def _sharded(density, sh, bgv, bg_alive, alive, origins, dirs,
                         rgb, mask):
                sq, g_d, g_s, g_bg, per_ray_err, eff = _kernel_fwd(
                    density, sh, bgv, bg_alive, alive, origins, dirs, rgb,
                    mask)
                sq = jax.lax.psum(sq, DATA_AXIS)
                g_d = jax.lax.psum(g_d, DATA_AXIS)
                g_s = jax.lax.psum(g_s, DATA_AXIS)
                if has_bg:
                    g_bg = jax.lax.psum(g_bg, DATA_AXIS)
                return sq, g_d, g_s, g_bg, per_ray_err, eff

            bg_spec = P()   # ignored (empty subtree) when bg args are None
            sharded_kernel_fwd = jax.shard_map(
                _sharded, mesh=self.mesh,
                in_specs=(P(), P(), bg_spec, bg_spec, P(), P(DATA_AXIS),
                          P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(), P(), P(), bg_spec, P(DATA_AXIS),
                           P(DATA_AXIS)),
                check_vma=False,
            )

        def one_step(state: PlenoxelsState, err_buf, xs):
            origins, dirs, rgb, leaf, mask = xs

            def grid_tv(field):
                """Dense TV, or the unbiased random-slab estimator
                (tv_grad_sparse analog) when tv_sparsity < 1 — 512^3
                training must not pay a full-grid TV sweep per step
                (loss_kernel.cu:179).  PRNG keyed by the step counter:
                deterministic, resume-stable."""
                if cfg.tv_sparsity >= 1.0:
                    return tv_loss(field, state.grid.alive)
                slab = max(4, int(round(field.shape[2] * cfg.tv_sparsity)))
                key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                         state.step)
                return tv_loss_slab(field, key, slab, state.grid.alive)

            def loss_fn(train_vars):
                density, sh = train_vars[0], train_vars[1]
                grid = state.grid._replace(density=density, sh=sh)
                i = 2
                if has_bg:
                    bgv = train_vars[i]
                    i += 1
                    grid = grid._replace(background=jnp.where(
                        state.bg_alive[:, :, None, None], bgv, 0.0))
                if has_basis:
                    grid = grid._replace(basis=train_vars[i])
                out = voxel_render_rays(grid, origins, dirs, gcfg)
                eff_mask = mask
                m = eff_mask[:, None]
                denom = jnp.maximum(jnp.sum(eff_mask), 1.0) * 3.0
                mse = jnp.sum(m * (out["rgb"] - rgb) ** 2) / denom
                reg = cfg.lambda_tv * grid_tv(density)
                reg = reg + cfg.lambda_tv_sh * grid_tv(sh)
                if cfg.lambda_tv_lumisphere > 0.0:
                    lkey = jax.random.fold_in(
                        jax.random.PRNGKey(cfg.seed + 1), state.step)
                    lslab = max(4, int(round(
                        sh.shape[2] * min(cfg.tv_sparsity, 0.25))))
                    reg = reg + cfg.lambda_tv_lumisphere * \
                        tv_loss_lumisphere(
                            grid, gcfg, lkey, lslab,
                            cfg.tv_lumisphere_dir_factor)
                if has_bg:
                    reg = reg + tv_loss_background(
                        bgv, cfg.lambda_tv_background_color,
                        cfg.lambda_tv_background_sigma)
                per_ray_err = jnp.max(jnp.abs(out["rgb"] - rgb), -1)
                return mse + reg, (mse, per_ray_err, eff_mask)

            def reg_grads(train_vars):
                density, sh = train_vars[:2]
                reg = (cfg.lambda_tv * grid_tv(density)
                       + cfg.lambda_tv_sh * grid_tv(sh))
                if has_bg:
                    reg = reg + tv_loss_background(
                        train_vars[2], cfg.lambda_tv_background_color,
                        cfg.lambda_tv_background_sigma)
                return reg

            train_vars = (state.grid.density, state.grid.sh)
            if has_bg:
                train_vars = train_vars + (state.grid.background,)
            if has_basis:
                train_vars = train_vars + (state.grid.basis,)
            g_bg = g_basis = None
            # (loss aux carries eff_mask so the epoch MSE can be weighted by
            # the number of rays that actually contributed)
            if use_kernel:
                fwd = sharded_kernel_fwd if shard_kernel else (
                    lambda *a: _kernel_fwd(*a))
                sq, g_density, g_sh, g_bg, per_ray_err, eff_mask = fwd(
                    state.grid.density, state.grid.sh,
                    state.grid.background, state.bg_alive, state.grid.alive,
                    origins, dirs, rgb, mask)
                denom = jnp.maximum(jnp.sum(eff_mask), 1.0) * 3.0
                mse = sq / denom
                # SUM-loss grads -> mean-loss grads, + TV added once
                rg = jax.grad(reg_grads)(train_vars)
                g_density = g_density / denom + rg[0]
                g_sh = g_sh / denom + rg[1]
                if has_bg:
                    g_bg = g_bg / denom + rg[2]
            else:
                (loss, (mse, per_ray_err, eff_mask)), grads = (
                    jax.value_and_grad(loss_fn, has_aux=True)(train_vars))
                g_density, g_sh = grads[0], grads[1]
                gi = 2
                if has_bg:
                    g_bg = grads[gi]
                    gi += 1
                if has_basis:
                    g_basis = grads[gi]

            step_f = state.step.astype(jnp.float32)
            lr_sigma = expon_lr(
                step_f, cfg.lr_sigma, cfg.lr_sigma_final,
                cfg.lr_sigma_delay_steps, cfg.lr_sigma_delay_mult,
                cfg.lr_decay_steps,
            )
            lr_sh = expon_lr(
                step_f, cfg.lr_sh, cfg.lr_sh_final, 0, 1.0, cfg.lr_decay_steps
            )

            # fused RMSProp (optim_kernel.cu:28 rmsprop_step)
            b = cfg.rms_beta
            rms_d = b * state.rms_density + (1 - b) * g_density ** 2
            rms_s = b * state.rms_sh + (1 - b) * g_sh ** 2
            new_density = state.grid.density - lr_sigma * g_density / (
                jnp.sqrt(rms_d) + 1e-8
            )
            new_sh = state.grid.sh - lr_sh * g_sh / (jnp.sqrt(rms_s) + 1e-8)

            new_bg, rms_bg = state.grid.background, state.rms_bg
            if has_bg:
                # optim_background_step (svox2.py:2048): one RMSProp step
                # with lr_color on rgb channels and lr_sigma_bg on sigma;
                # sparsified cells stay pinned (grads masked)
                lr_s_bg = expon_lr(step_f, cfg.lr_sigma_bg,
                                   cfg.lr_sigma_bg_final, 0, 1.0,
                                   cfg.lr_decay_steps)
                lr_c_bg = expon_lr(step_f, cfg.lr_color_bg,
                                   cfg.lr_color_bg_final, 0, 1.0,
                                   cfg.lr_decay_steps)
                g_bg = jnp.where(state.bg_alive[:, :, None, None], g_bg, 0.0)
                rms_bg = b * state.rms_bg + (1 - b) * g_bg ** 2
                lr_bg = jnp.stack([lr_c_bg, lr_c_bg, lr_c_bg, lr_s_bg])
                new_bg = state.grid.background - lr_bg * g_bg / (
                    jnp.sqrt(rms_bg) + 1e-8)

            safe_leaf = jnp.where(eff_mask > 0, leaf, leaf_buf - 1)
            err_buf = (
                err_buf[0].at[safe_leaf].add(
                    jnp.where(eff_mask > 0, per_ray_err, 0.0)),
                err_buf[1].at[safe_leaf].add(eff_mask),
            )
            new_basis, rms_basis = state.grid.basis, state.rms_basis
            if has_basis:
                # optim_basis_step (svox2.py:2091): RMSProp over the
                # learned basis pytree (texture grid or MLP layer dict)
                lr_b = expon_lr(step_f, cfg.lr_basis, cfg.lr_basis_final,
                                0, 1.0, cfg.lr_decay_steps)
                rms_basis = jax.tree_util.tree_map(
                    lambda r, gg: b * r + (1 - b) * gg ** 2,
                    state.rms_basis, g_basis)
                new_basis = jax.tree_util.tree_map(
                    lambda p, r, gg: p - lr_b * gg / (jnp.sqrt(r) + 1e-8),
                    state.grid.basis, rms_basis, g_basis)

            new_state = PlenoxelsState(
                state.grid._replace(density=new_density, sh=new_sh,
                                    background=new_bg, basis=new_basis),
                rms_d, rms_s, state.step + 1,
                rms_bg=rms_bg, bg_alive=state.bg_alive,
                rms_basis=rms_basis,
            )
            # padding-only steps are true no-ops: zero ray grads give a
            # zero RMSProp step, but the TV term would still fire an
            # extra regularization-only update and decay the RMS stats
            # (see trainer.py one_step)
            has = jnp.sum(mask) > 0.0
            new_state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(has, a, b), new_state, state)
            return new_state, err_buf, (mse, jnp.sum(eff_mask))

        def chunk_fn(state, err_buf, origins, dirs, rgb, leaf, mask):
            def body(carry, xs):
                st, buf = carry
                st, buf, mse_cnt = one_step(st, buf, xs)
                return (st, buf), mse_cnt

            (state, err_buf), mses = jax.lax.scan(
                body, (state, err_buf), (origins, dirs, rgb, leaf, mask)
            )
            return state, err_buf, mses

        data_sh = (
            replicated(self.mesh) if (use_kernel and not shard_kernel)
            else NamedSharding(self.mesh, P(None, DATA_AXIS))
        )
        rep = replicated(self.mesh)
        return jax.jit(
            chunk_fn,
            in_shardings=(rep, rep, data_sh, data_sh, data_sh, data_sh, data_sh),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def _chunk_fn(self, leaf_buf):
        key = (leaf_buf, self.gcfg)
        if key not in self._chunk_fns:
            self._chunk_fns[key] = self._make_chunk_fn(leaf_buf, self.gcfg)
        return self._chunk_fns[key]

    # ------------------------------------------------------------------
    def _block_ok(self, origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        """Host helper: per-64-ray-block spread flags (chunked jit)."""
        if not hasattr(self, "_block_ok_fn") or self._block_ok_cfg != self.gcfg:
            gcfg = self.gcfg

            @jax.jit
            def fn(o, d):
                return vp.build_blocks(o, d, gcfg).ok

            self._block_ok_fn = fn
            self._block_ok_cfg = gcfg
        chunk = 16384
        n = origins.shape[0]
        oks = []
        for i in range(0, n, chunk):
            o, d = origins[i:i + chunk], dirs[i:i + chunk]
            if o.shape[0] < chunk:
                fill = chunk - o.shape[0]
                o = np.concatenate([o, np.broadcast_to(o[-1:], (fill, 3))])
                d = np.concatenate([d, np.broadcast_to(d[-1:], (fill, 3))])
            oks.append(np.asarray(self._block_ok_fn(jnp.asarray(o), jnp.asarray(d))))
        return np.concatenate(oks)[: n // vp.RB]

    def _coherence_order(self, epoch: RayEpoch):
        """Morton-order rays into RB-blocks; re-form blocks whose spread
        violates the kernel box as 16 real rays duplicated 4x (duplicates
        loss-masked) — halves the angular spread so wide-FOV / low-res
        scenes keep training through the kernel path.  Returns reordered
        epoch arrays + the per-ray loss mask."""
        order = vp.morton_order(epoch.px, epoch.py, epoch.img)
        nb = order.shape[0] // vp.RB
        head, tail = order[: nb * vp.RB], order[nb * vp.RB:]
        ok = self._block_ok(epoch.origins[head], epoch.dirs[head])
        blocks = head.reshape(nb, vp.RB)
        good = blocks[ok].reshape(-1)
        bad = blocks[~ok].reshape(-1)
        q = vp.RB // 4
        exp = np.repeat(bad.reshape(-1, q), 4, axis=1).reshape(-1)
        exp_mask = np.zeros((bad.shape[0] // q, q, 4), np.float32)
        exp_mask[:, :, 0] = 1.0
        idx = np.concatenate([good, exp, tail])
        mask = np.concatenate([
            np.ones(good.shape[0], np.float32),
            exp_mask.reshape(-1),
            np.ones(tail.shape[0], np.float32),
        ])
        # shuffle block order for SGD diversity (tail stays last, it pads);
        # the rng persists so the permutation differs across epochs
        if not hasattr(self, "_order_rng"):
            self._order_rng = np.random.default_rng(self.cfg.seed)
        nbl = good.shape[0] // vp.RB + exp.shape[0] // vp.RB
        perm = self._order_rng.permutation(nbl)
        body = idx[: nbl * vp.RB].reshape(nbl, vp.RB)[perm].reshape(-1)
        mbody = mask[: nbl * vp.RB].reshape(nbl, vp.RB)[perm].reshape(-1)
        return (
            np.concatenate([body, idx[nbl * vp.RB:]]),
            np.concatenate([mbody, mask[nbl * vp.RB:]]),
        )

    def run_epoch_rays(self, epoch: RayEpoch):
        cfg = self.cfg
        ray_mask = None
        if cfg.use_kernel and epoch.px is not None:
            order, ray_mask = self._coherence_order(epoch)
            epoch = epoch._replace(
                origins=epoch.origins[order], dirs=epoch.dirs[order],
                rgb=epoch.rgb[order], leaf_id=epoch.leaf_id[order],
            )
        B, K = cfg.batch_size, cfg.steps_per_chunk
        n = epoch.origins.shape[0]
        n_pad = pad_to_multiple(max(n, 1), B * K)

        def pad(a, fill=0.0):
            out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        origins = pad(epoch.origins)
        dirs = pad(epoch.dirs)
        dirs[n:] = np.array([0, 0, -1.0], np.float32)
        rgb = pad(epoch.rgb)
        leaf = pad(epoch.leaf_id.astype(np.int32))
        mask = np.zeros(n_pad, np.float32)
        mask[:n] = 1.0 if ray_mask is None else ray_mask

        leaf_buf = _leaf_buf_size(epoch.n_leaves)
        chunk_fn = self._chunk_fn(leaf_buf)
        rep = replicated(self.mesh)
        err_buf = jax.device_put((jnp.zeros((leaf_buf,)), jnp.zeros((leaf_buf,))), rep)
        n_dev = int(self.mesh.devices.size)
        kernel_replicated = cfg.use_kernel and (
            n_dev == 1 or cfg.batch_size % (vp.RB * n_dev) != 0)
        data_sh = (
            replicated(self.mesh) if kernel_replicated
            else NamedSharding(self.mesh, P(None, DATA_AXIS))
        )

        mses = []
        for ci in range(n_pad // (B * K)):
            sl = slice(ci * B * K, (ci + 1) * B * K)
            args = [
                jax.device_put(a[sl].reshape((K, B) + a.shape[1:]), data_sh)
                for a in (origins, dirs, rgb, leaf, mask)
            ]
            self.state, err_buf, m = chunk_fn(self.state, err_buf, *args)
            # keep on device: a per-chunk np.asarray costs a ~28 ms tunnel
            # sync and stalls the dispatch pipeline; only the LAST chunk's
            # values are read below
            mses.append(m)

        err_sum, err_cnt = err_buf
        stat = np.asarray(err_sum)[: epoch.n_leaves] / np.maximum(
            np.asarray(err_cnt)[: epoch.n_leaves], 1.0
        )
        stat[np.asarray(err_cnt)[: epoch.n_leaves] == 0] = -np.inf
        # ray-count-weighted epoch MSE over the LAST chunk (batches with no
        # contributing rays — padding or dropped blocks — report mse 0 and
        # must not leak into the metric)
        ms, cs = (np.asarray(a) for a in mses[-1])
        epoch_mse = float((ms * cs).sum() / max(cs.sum(), 1.0))
        return stat, epoch_mse

    def fit(self, budgeter: RayBudgeter, on_epoch_end=None, verbose=True):
        cfg = self.cfg
        t0 = time.time()
        for epoch_id in range(1, cfg.n_epoch + 1):
            te = time.time()
            last = epoch_id == cfg.n_epoch
            epoch = budgeter.gen_rays(
                down_scale=1,
                prob=cfg.prob_sampling and not last,
                rand_samp_perc=cfg.rand_samp_perc,
                last_epoch=last,
            )
            leaf_stat, mse = self.run_epoch_rays(epoch)

            if (
                cfg.subdivide_every > 0
                and epoch_id % cfg.subdivide_every == 0
                and epoch_id < cfg.n_epoch - 1
            ):
                n_split = budgeter.adjust(leaf_stat, cfg.subdivide_thres)
                if verbose:
                    print(f"  subdivided {n_split} -> {budgeter.forest.n_leaves} leaves")

            if epoch_id in cfg.upsample_epochs:
                # sparsify the MSI background BEFORE resampling, like
                # opt.py:593-594 (early upsample boundaries only)
                if (self.state.grid.background is not None
                        and epoch_id <= min(cfg.upsample_epochs)):
                    n_dead = self.sparsify_bg()
                    if verbose:
                        print(f"  sparsified background: {n_dead} cells off")
                new_reso = tuple(r * 2 for r in self.gcfg.reso)
                self.resample(new_reso)
                if verbose:
                    print(f"  upsampled grid -> {new_reso}")

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
    def resample(self, new_reso: Tuple[int, int, int], prune: bool = True):
        """Upsample + prune between jitted epochs (a deliberate recompile
        boundary — SURVEY.md §7.4 hard part 4)."""
        grid = upsample_grid(self.state.grid, new_reso)
        if prune:
            grid = prune_grid(grid, self.cfg.prune_sigma_thresh)
        self.gcfg = self.gcfg._replace(reso=new_reso)
        rep = replicated(self.mesh)
        self.state = jax.device_put(
            PlenoxelsState(
                grid,
                jnp.zeros_like(grid.density),
                jnp.zeros_like(grid.sh),
                self.state.step,
                rms_bg=self.state.rms_bg,
                bg_alive=self.state.bg_alive,
                rms_basis=self.state.rms_basis,
            ),
            rep,
        )
        self._chunk_fns.clear()

    def sparsify_bg(self):
        """svox2.py:1431 sparsify_background at the trainer level: empties
        background cells below ``background_density_thresh`` in every layer
        (after dilation) and pins them via the alive mask.  The reference
        runs this at the early upsample boundaries (opt.py:593-594)."""
        if self.state.grid.background is None:
            return 0
        bg, keep = sparsify_background(
            self.state.grid.background, self.cfg.background_density_thresh)
        keep = keep & self.state.bg_alive
        bg = jnp.where(keep[:, :, None, None], bg, 0.0)
        self.state = self.state._replace(
            grid=self.state.grid._replace(background=bg), bg_alive=keep)
        return int(np.sum(~np.asarray(keep)))

    def render_image(self, H, W, K, c2w, chunk: int = 4096,
                     use_kernel: Optional[bool] = None):
        from flnerf_tpu.rays.camera import get_rays

        gcfg = self.gcfg
        use_kernel = self.cfg.use_kernel if use_kernel is None else use_kernel
        if not hasattr(self, "_eval_fn") or self._eval_cfg != gcfg:
            @jax.jit
            def eval_fn(grid, ro, rd):
                return voxel_render_rays(grid, ro, rd, gcfg)["rgb"]

            @jax.jit
            def eval_kernel_fn(grid, ro, rd):
                out = vp.voxel_render_rays_fast(grid, ro, rd, gcfg)
                return out["rgb"], out["ok"]

            self._eval_fn = eval_fn
            self._eval_kernel_fn = eval_kernel_fn
            self._eval_cfg = gcfg

        rays_o, rays_d = get_rays(H, W, K, jnp.asarray(c2w))
        ro = np.asarray(rays_o.reshape(-1, 3))
        rd = np.asarray(rays_d.reshape(-1, 3))
        n = ro.shape[0]

        order = None
        if use_kernel:
            # image tiles: morton order makes every 64-ray block a tile
            yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
            order = vp.morton_order(
                xx.reshape(-1), yy.reshape(-1), np.zeros(n, np.int64))
            ro, rd = ro[order], rd[order]

        chunk = pad_to_multiple(chunk, vp.RB)
        n_pad = pad_to_multiple(n, chunk)
        if n_pad != n:
            ro = np.concatenate([ro, np.broadcast_to(ro[-1:], (n_pad - n, 3))])
            rd = np.concatenate([rd, np.broadcast_to(rd[-1:], (n_pad - n, 3))])

        outs, oks = [], []
        for i in range(0, n_pad, chunk):
            if use_kernel:
                rgb_i, ok_i = self._eval_kernel_fn(
                    self.state.grid, jnp.asarray(ro[i:i + chunk]),
                    jnp.asarray(rd[i:i + chunk]))
                oks.append(np.repeat(np.asarray(ok_i), vp.RB))
            else:
                rgb_i = self._eval_fn(
                    self.state.grid, jnp.asarray(ro[i:i + chunk]),
                    jnp.asarray(rd[i:i + chunk]))
            outs.append(rgb_i)
        rgb = np.array(jnp.concatenate(outs, 0))[:n]

        if use_kernel:
            bad = ~np.concatenate(oks)[:n]
            if bad.any():
                # incoherent blocks (rare for image tiles): XLA twin fallback
                idx = np.nonzero(bad)[0]
                m = pad_to_multiple(len(idx), vp.RB)
                sel = np.concatenate([idx, np.full(m - len(idx), idx[-1])])
                fix = self._eval_fn(
                    self.state.grid, jnp.asarray(ro[sel]), jnp.asarray(rd[sel]))
                rgb[idx] = np.asarray(fix)[: len(idx)]
            inv = np.empty_like(order)
            inv[order] = np.arange(n)
            rgb = rgb[inv]
        return rgb.reshape(H, W, 3)

    def eval_images(self, poses, images, H, W, K, chunk: int = 4096):
        psnrs, ssims = [], []
        for i in range(poses.shape[0]):
            rgb = self.render_image(H, W, K, poses[i][:3, :4], chunk)
            mse = float(np.mean((rgb - images[i]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            ssims.append(float(compute_ssim(jnp.asarray(images[i]), jnp.asarray(rgb))))
        return float(np.mean(psnrs)), float(np.mean(ssims))
