import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.render.composite import exclusive_cumprod, raw2outputs
from flnerf_tpu.render.sampling import sample_pdf, stratified_z_vals
from flnerf_tpu.render.renderer import RenderConfig, render_rays


def _reference_raw2outputs_np(raw, z_vals, rays_d, white_bkgd):
    """Independent numpy transcription of the published NeRF compositing
    formula (as in nerf-ours/render.py:149-192) for parity checking."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d[..., None, :], axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    alpha = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * dists)
    shifted = np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1)
    T = np.cumprod(shifted, -1)[..., :-1]
    weights = alpha * T
    rgb_map = np.sum(weights[..., None] * rgb, -2)
    acc = weights.sum(-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, weights, acc


def test_raw2outputs_matches_reference_formula():
    rng = np.random.default_rng(0)
    N, S = 16, 32
    raw = rng.normal(size=(N, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2.0, 6.0, size=(N, S)).astype(np.float32), -1)
    rd = rng.normal(size=(N, 3)).astype(np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), white_bkgd=True)
    ref_rgb, ref_w, ref_acc = _reference_raw2outputs_np(raw, z, rd, True)
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), ref_w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), ref_acc, atol=1e-5)


def test_raw2outputs_opaque_and_empty():
    # fully opaque first sample -> rgb == sigmoid(color of first sample)
    N, S = 4, 8
    raw = np.zeros((N, S, 4), np.float32)
    raw[:, 0, 3] = 1e8  # huge sigma
    raw[:, 0, :3] = 3.0
    z = np.tile(np.linspace(2, 6, S, dtype=np.float32), (N, 1))
    rd = np.tile(np.array([[0, 0, -1.0]], np.float32), (N, 1))
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
    np.testing.assert_allclose(np.asarray(out.rgb), 1 / (1 + np.exp(-3.0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), 1.0, atol=1e-5)

    # zero sigma everywhere -> acc 0, white background fills in
    raw[:] = 0
    raw[..., 3] = -100.0
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-5)


def test_exclusive_cumprod():
    x = jnp.array([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(exclusive_cumprod(x)), [[1.0, 2.0, 6.0]])


def test_stratified_z_vals_bounds_and_det():
    key = jax.random.PRNGKey(0)
    z = stratified_z_vals(key, 10, 2.0, 6.0, 16, perturb=1.0)
    assert z.shape == (10, 16)
    zs = np.asarray(z)
    assert (zs >= 2.0).all() and (zs <= 6.0).all()
    assert (np.diff(zs, axis=-1) >= 0).all()
    z0 = stratified_z_vals(key, 3, 2.0, 6.0, 5, perturb=0.0)
    np.testing.assert_allclose(np.asarray(z0)[0], np.linspace(2, 6, 5), atol=1e-6)


def test_sample_pdf_concentrates_mass():
    # all weight in one bin -> samples land inside that bin
    key = jax.random.PRNGKey(1)
    bins = jnp.tile(jnp.linspace(0.0, 1.0, 11), (4, 1))
    weights = jnp.zeros((4, 10)).at[:, 3].set(100.0)
    s = np.asarray(sample_pdf(key, bins, weights, 64))
    frac_inside = ((s >= 0.3 - 1e-3) & (s <= 0.4 + 1e-3)).mean()
    assert frac_inside > 0.95


def test_sample_pdf_det_uniform_weights():
    bins = jnp.tile(jnp.linspace(0.0, 1.0, 6), (2, 1))
    weights = jnp.ones((2, 5))
    s = np.asarray(sample_pdf(jax.random.PRNGKey(0), bins, weights, 11, det=True))
    np.testing.assert_allclose(s[0], np.linspace(0, 1, 11), atol=1e-5)


def test_render_rays_shapes():
    def query_fn(params, pts, viewdirs):
        # analytic field: a soft sphere of radius .5 at origin, red
        d = jnp.linalg.norm(pts, axis=-1, keepdims=True)
        sigma = 20.0 * jnp.maximum(0.5 - d, 0.0)
        rgb = jnp.broadcast_to(jnp.array([2.0, -2.0, -2.0]), pts.shape)
        return jnp.concatenate([rgb, sigma], -1)

    n = 6
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 3.0]]), (n, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    cfg = RenderConfig(n_samples=32, n_importance=32, near=1.0, far=5.0, white_bkgd=False)
    out = render_rays(jax.random.PRNGKey(0), None, None, query_fn, rays_o, rays_d, cfg)
    assert out["rgb"].shape == (n, 3)
    assert out["rgb0"].shape == (n, 3)
    r = np.asarray(out["rgb"])
    # the sphere is hit head-on: red channel dominates, depth ~ 2.5
    assert (r[:, 0] > r[:, 1]).all()
    np.testing.assert_allclose(np.asarray(out["depth"]), 2.5, atol=0.35)
