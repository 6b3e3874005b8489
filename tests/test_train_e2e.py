"""End-to-end training tests on the 8-device virtual CPU mesh: the minimum
slice of SURVEY.md §7.3 (quadtree rays -> MLP -> composite -> data-parallel
train step -> eval PSNR)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.data.synthetic import load_synthetic_data
from flnerf_tpu.models.nerf_mlp import make_nerf_field
from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix
from flnerf_tpu.rays.quadtree import RayBudgeter
from flnerf_tpu.render.renderer import RenderConfig
from flnerf_tpu.train.trainer import NerfTrainer, TrainConfig


@pytest.fixture(scope="module")
def tiny_scene():
    images, poses, render_poses, hwf, i_split = load_synthetic_data(
        n_train=6, n_test=1, H=40, W=40
    )
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]
    origins = np.stack([get_rays_np(H, W, K, p[:3, :4])[0] for p in poses[tr]], 0)
    dirs = np.stack([get_rays_np(H, W, K, p[:3, :4])[1] for p in poses[tr]], 0)
    return images, poses, hwf, K, i_split, origins, dirs


def test_data_parallel_training_improves_psnr(tiny_scene):
    images, poses, hwf, K, i_split, origins, dirs = tiny_scene
    H, W, _ = hwf
    tr, te = i_split[0], i_split[2]
    b = RayBudgeter(images[tr], origins, dirs, init_level=2, seed=0)

    init_fn, query_fn = make_nerf_field(
        multires=6, multires_views=2, netdepth=4, netwidth=64, compute_dtype=jnp.float32
    )
    rc = RenderConfig(n_samples=24, n_importance=24, near=1.5, far=6.0, white_bkgd=True)
    tc = TrainConfig(
        n_epoch=8, n_rand=512, steps_per_chunk=8, init_level=2, lrate=5e-4,
        precrop_iters=0, subdivide_every=2, subdivide_thres=0.05,
    )
    t = NerfTrainer(query_fn, init_fn, rc, tc)
    assert t.n_devices == 8  # sharded over the virtual mesh

    psnr_before, _ = t.eval_images(poses[te], images[te], H, W, K, chunk=800)
    t.fit(b, verbose=False)
    psnr_after, ssim_after = t.eval_images(poses[te], images[te], H, W, K, chunk=800)

    assert psnr_after > psnr_before + 2.0
    assert psnr_after > 13.0  # golden pin (verify doc: >13 dB in 6 epochs)
    assert 0.0 < ssim_after <= 1.0
    # history records the time-to-PSNR curve
    assert len(t.history) == tc.n_epoch
    assert all("wall_s" in h and "train_psnr" in h for h in t.history)


def test_subdivision_reacts_to_loss(tiny_scene):
    images, poses, hwf, K, i_split, origins, dirs = tiny_scene
    tr = i_split[0]
    b = RayBudgeter(images[tr], origins, dirs, init_level=2, seed=0)
    n0 = b.forest.n_leaves

    init_fn, query_fn = make_nerf_field(
        multires=4, multires_views=2, netdepth=2, netwidth=32, compute_dtype=jnp.float32
    )
    rc = RenderConfig(n_samples=12, n_importance=0, near=1.5, far=6.0, white_bkgd=True)
    tc = TrainConfig(
        n_epoch=3, n_rand=128, steps_per_chunk=2, precrop_iters=0,
        subdivide_every=1, subdivide_thres=1e-4,  # tiny thres -> must split
    )
    t = NerfTrainer(query_fn, init_fn, rc, tc)
    t.fit(b, verbose=False)
    # with an untrained net and near-zero threshold, leaves must subdivide
    # (except the n_epoch-1 guard epochs)
    assert b.forest.n_leaves > n0


def test_leaf_stat_on_device_matches_host(tiny_scene):
    """The on-device segment-max path must agree with the host grouping."""
    images, poses, hwf, K, i_split, origins, dirs = tiny_scene
    tr = i_split[0]
    b = RayBudgeter(images[tr], origins, dirs, init_level=2, seed=3)
    ep = b.gen_rays(down_scale=4, shuffle=True)

    init_fn, query_fn = make_nerf_field(
        multires=4, multires_views=2, netdepth=2, netwidth=32, compute_dtype=jnp.float32
    )
    rc = RenderConfig(n_samples=8, n_importance=0, near=1.5, far=6.0)
    tc = TrainConfig(n_rand=64, steps_per_chunk=2, precrop_iters=0, leaf_stat="max")
    t = NerfTrainer(query_fn, init_fn, rc, tc)

    # run one epoch; recompute per-ray err on host with the FINAL params is
    # not identical (params evolve per step), so instead check structure:
    stat, _ = t.run_epoch_rays(ep, jax.random.PRNGKey(0))
    assert stat.shape == (ep.n_leaves,)
    counts = np.bincount(ep.leaf_id, minlength=ep.n_leaves)
    # every leaf that received rays has a finite stat; empty leaves are -inf
    assert np.isfinite(stat[counts > 0]).all()
    assert np.all(np.isneginf(stat[counts == 0]))
    assert (stat[counts > 0] >= 0).all()


def test_epoch_mse_ignores_padding_steps(tiny_scene):
    """The reported epoch MSE must be ray-weighted: padding-only scan steps
    carry zero real rays and must not dilute it (they report 0 loss, which
    overstated train PSNR by up to the pad fraction before the fix)."""
    images, poses, hwf, K, i_split, origins, dirs = tiny_scene
    tr = i_split[0]
    b = RayBudgeter(images[tr], origins, dirs, init_level=2, seed=5)
    ep = b.gen_rays(down_scale=4, shuffle=True)

    init_fn, query_fn = make_nerf_field(
        multires=4, multires_views=2, netdepth=2, netwidth=32,
        compute_dtype=jnp.float32)
    rc = RenderConfig(n_samples=8, n_importance=0, near=1.5, far=6.0,
                      white_bkgd=True)

    # n_rand chosen so the last chunk is mostly padding: chunk size is
    # n_rand*steps_per_chunk=1024 against ~1000+ real rays
    tc = TrainConfig(n_rand=128, steps_per_chunk=8, precrop_iters=0)
    t = NerfTrainer(query_fn, init_fn, rc, tc)
    _, mse = t.run_epoch_rays(ep, jax.random.PRNGKey(0))

    # an untrained white render of this scene sits around mse ~0.1;
    # dilution by all-pad steps would push the reported value far below
    # any physically-possible per-ray mse at init
    assert mse > 0.01, mse


def test_padding_steps_are_noops():
    """Identical rays trained with exact chunk fill vs a 50%-padded
    chunk must produce IDENTICAL params: padding-only scan steps used
    to decay Adam moments and emit a stale-momentum step (and advance
    the LR counter) on zero grads."""
    from flnerf_tpu.rays.quadtree import RayEpoch

    init_fn, query_fn = make_nerf_field(
        multires=2, multires_views=2, netdepth=2, netwidth=16,
        compute_dtype=jnp.float32,
    )
    # perturb=0 -> per-step PRNG keys are unused, so the two runs are
    # deterministic and comparable despite different step counts
    rc = RenderConfig(n_samples=6, n_importance=6, near=2.0, far=6.0,
                      perturb=0.0)
    rng = np.random.default_rng(0)
    n = 64
    epoch = RayEpoch(
        origins=rng.standard_normal((n, 3)).astype(np.float32),
        dirs=(rng.standard_normal((n, 3))
              + np.array([0, 0, -2.0])).astype(np.float32),
        rgb=rng.random((n, 3)).astype(np.float32),
        leaf_id=rng.integers(0, 4, n).astype(np.int32),
        n_leaves=4,
    )

    def run(steps_per_chunk):
        tc = TrainConfig(n_rand=8, steps_per_chunk=steps_per_chunk,
                         precrop_iters=0)
        t = NerfTrainer(query_fn, init_fn, rc, tc)
        t.run_epoch_rays(epoch, jax.random.PRNGKey(1))
        return t.state

    s_exact = run(8)    # 64 rays == 8*8: zero padding
    s_padded = run(16)  # pads to 128: 8 padding-only steps
    assert int(s_exact.global_iter) == int(s_padded.global_iter) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s_exact.params_fine),
                    jax.tree_util.tree_leaves(s_padded.params_fine)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_exact.opt_state),
                    jax.tree_util.tree_leaves(s_padded.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
