import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.models.nerf_mlp import (
    apply_nerf_mlp,
    embed_fn,
    embedder_out_dim,
    init_nerf_mlp,
    make_nerf_field,
)


def test_embed_layout_matches_reference():
    """Layout parity with nerf-ours/run_nerf_helpers.py:15-63:
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]."""
    x = jnp.array([[0.3, -1.2, 2.0]])
    multires = 4
    out = np.asarray(embed_fn(x, multires))
    assert out.shape == (1, embedder_out_dim(multires))
    expected = [np.asarray(x)[0]]
    for k in range(multires):
        f = 2.0 ** k
        expected.append(np.sin(np.asarray(x)[0] * f))
        expected.append(np.cos(np.asarray(x)[0] * f))
    np.testing.assert_allclose(out[0], np.concatenate(expected), atol=1e-6)


def test_mlp_shapes_and_grads():
    key = jax.random.PRNGKey(0)
    ic, icv = embedder_out_dim(10), embedder_out_dim(4)
    params = init_nerf_mlp(key, D=8, W=256, input_ch=ic, input_ch_views=icv)
    pts = jax.random.normal(key, (5, 7, ic))
    views = jax.random.normal(key, (5, 7, icv))
    raw = apply_nerf_mlp(params, pts, views, compute_dtype=jnp.float32)
    assert raw.shape == (5, 7, 4)
    assert raw.dtype == jnp.float32

    def loss(p):
        return jnp.sum(apply_nerf_mlp(p, pts, views, compute_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).sum()) > 0 for x in flat)


def test_param_count_matches_reference_arch():
    """D=8 W=256 with skips=(4,): same parameter count as nerf-ours/model.py:8."""
    ic, icv = embedder_out_dim(10), embedder_out_dim(4)  # 63, 27
    params = init_nerf_mlp(jax.random.PRNGKey(0), input_ch=ic, input_ch_views=icv)
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    # trunk: layer0 63->256; layers 1-4,6,7 are 256->256 (six of them);
    # layer5 consumes the skip concat (256+63)->256
    expect = (
        (ic * 256 + 256)
        + 6 * (256 * 256 + 256)
        + ((256 + ic) * 256 + 256)
        + (256 * 256 + 256)  # feature_linear
        + (256 * 1 + 1)      # alpha
        + ((icv + 256) * 128 + 128)  # views
        + (128 * 3 + 3)      # rgb
    )
    assert n == expect


def test_query_fn_broadcasts_viewdirs():
    init_fn, query_fn = make_nerf_field(multires=4, multires_views=2, netdepth=2, netwidth=32, compute_dtype=jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    pts = jnp.zeros((3, 9, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (3, 1))
    raw = query_fn(params, pts, dirs)
    assert raw.shape == (3, 9, 4)
