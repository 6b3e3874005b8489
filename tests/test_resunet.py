"""ResUNet feature extractor (reference: nerf-ours/model.py:224)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.resunet import (
    ResUNetConfig,
    _upsample2_ac,
    apply_resunet,
    init_resunet,
    split_features,
)


def test_output_shape_quarter_resolution():
    cfg = ResUNetConfig()
    params = init_resunet(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y = apply_resunet(params, x, cfg)
    assert y.shape == (2, 8, 8, cfg.out_ch)
    assert bool(jnp.isfinite(y).all())
    coarse, fine = split_features(y, cfg)
    assert coarse.shape[-1] == 32 and fine.shape[-1] == 32


def test_coarse_only_channels():
    cfg = ResUNetConfig(coarse_out_ch=16, coarse_only=True)
    params = init_resunet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 16, 16, 3))
    y = apply_resunet(params, x, cfg)
    assert y.shape[-1] == 16
    coarse, fine = split_features(y, cfg)
    assert fine is None and coarse.shape[-1] == 16


def test_upsample_align_corners_semantics():
    """align_corners=True: corners map exactly, interior is linear in
    index*(H-1)/(out-1) — matches torch F.interpolate(align_corners=True)
    on a ramp."""
    h = 4
    ramp = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    ramp = jnp.broadcast_to(ramp, (1, h, h, 1))
    up = np.asarray(_upsample2_ac(ramp))[0, :, 0, 0]
    want = np.arange(2 * h) * (h - 1) / (2 * h - 1)
    np.testing.assert_allclose(up, want, atol=1e-6)


def test_instance_norm_makes_stem_shift_invariant():
    """InstanceNorm after the stem conv cancels an input DC shift (the
    conv is linear and IN removes per-channel mean)."""
    cfg = ResUNetConfig(layers=(1, 1, 1))
    params = init_resunet(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    y0 = apply_resunet(params, x, cfg)
    y1 = apply_resunet(params, x + 0.37, cfg)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=3e-4)


def test_gradients_flow():
    cfg = ResUNetConfig(layers=(1, 1, 1))
    params = init_resunet(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 3))
    g = jax.grad(lambda p: jnp.sum(apply_resunet(p, x, cfg) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_bf16_compute(dtype):
    cfg = ResUNetConfig(layers=(1, 1, 1))
    params = init_resunet(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3))
    y = apply_resunet(params, x, cfg, compute_dtype=dtype)
    assert y.dtype == dtype and bool(jnp.isfinite(
        y.astype(jnp.float32)).all())
