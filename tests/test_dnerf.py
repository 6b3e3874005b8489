"""D-NeRF (time-conditioned) backend tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.dnerf import DNeRFConfig, deform, init_dnerf, make_dnerf_field
from flnerf_tpu.models.hash_ngp import NGPConfig
from flnerf_tpu.render.ngp import NGPRenderConfig, init_occupancy, ngp_render_rays, update_occupancy, with_density


def _cfg():
    return DNeRFConfig(
        ngp=NGPConfig(num_levels=4, log2_hashmap_size=10, desired_resolution=64),
        num_layers_deform=3, hidden_dim_deform=32,
        deform_multires=4, time_multires=3,
    )


def test_deform_net_shapes_and_time_sensitivity():
    cfg = _cfg()
    params = init_dnerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 3), minval=-1, maxval=1)
    d0 = deform(params, x, jnp.zeros((10, 1)), cfg, jnp.float32)
    d1 = deform(params, x, jnp.ones((10, 1)), cfg, jnp.float32)
    assert d0.shape == (10, 3)
    # different times deform differently (untrained but nonzero weights)
    assert float(jnp.abs(d0 - d1).max()) > 0


def test_dnerf_field_time_conditioned_density():
    cfg = _cfg()
    init_fn, density_fn, rgb_fn = make_dnerf_field(cfg, jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 5, 3), minval=-1, maxval=1)
    t0 = jnp.zeros((6, 5))
    t1 = jnp.ones((6, 5))
    s0, g0 = density_fn(params, x, t0)
    s1, g1 = density_fn(params, x, t1)
    assert s0.shape == (6, 5) and g0.shape == (6, 5, 15)
    assert float(jnp.abs(s0 - s1).max()) >= 0  # well-defined at both times
    rgb = rgb_fn(params, jnp.zeros((6, 5, 3)).at[..., 2].set(1.0), g0)
    assert rgb.shape == (6, 5, 3)

    # gradients flow into BOTH the deform net and the canonical table
    def loss(p):
        s, g = density_fn(p, x, t1)
        return jnp.sum(s)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads["deform_net"][0]).sum()) > 0
    assert float(jnp.abs(grads["canonical"]["table"]).sum()) > 0


def test_dnerf_render_with_times():
    cfg = _cfg()
    init_fn, density_fn, rgb_fn = make_dnerf_field(cfg, jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    rcfg = NGPRenderConfig(n_candidates=32, n_keep=16, grid_size=8, bound=1.0)
    occ = init_occupancy(rcfg)
    occ = with_density(occ, jnp.ones((8, 8, 8)), rcfg)  # everything occupied
    n = 8
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    times = jnp.linspace(0, 1, n)
    out = ngp_render_rays(
        jax.random.PRNGKey(0), params, density_fn, rgb_fn, occ,
        rays_o, rays_d, rcfg, perturb=False, times=times,
    )
    assert out["rgb"].shape == (n, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


@pytest.mark.slow
def test_dnerf_e2e_trainer():
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.train.ngp_trainer import NGPSampler, NGPTrainConfig, NGPTrainer

    images, poses, rp, hwf, i_split = load_synthetic_data(n_train=4, n_test=1, H=24, W=24)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]
    times = np.linspace(0, 1, len(tr))

    cfg = _cfg()._replace(ngp=NGPConfig(num_levels=4, log2_hashmap_size=10,
                                        desired_resolution=64, bound=2.0))
    init_fn, density_fn, rgb_fn = make_dnerf_field(cfg, jnp.float32)
    rcfg = NGPRenderConfig(n_candidates=48, n_keep=24, grid_size=16, bound=2.0)
    tcfg = NGPTrainConfig(max_steps=32, batch_rays=128, steps_per_chunk=8,
                          time_dependent=True, lr=1e-2)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    s = NGPSampler(images[tr], poses[tr], K, tcfg, times=times)
    t.fit(s, verbose=False)
    assert int(t.state.step) == 32
    # time-conditioned eval renders a frame
    p, _ = t.eval_images(poses[tr][:1], images[tr][:1], H, W, K, chunk=576,
                         times=[0.5])
    assert np.isfinite(p)


@pytest.mark.parametrize("variant", ["basis", "hyper"])
def test_dnerf_variant_fields_train(variant):
    """Basis/hyper variants (dnerf/network_basis.py:262, network_hyper.py:261)
    train on a time-varying synthetic scene through the shared protocol."""
    from flnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_variant_field
    from flnerf_tpu.models.hash_ngp import NGPConfig
    from flnerf_tpu.render.ngp import NGPRenderConfig, ngp_render_rays, init_occupancy, with_density

    cfg = DNeRFConfig(
        ngp=NGPConfig(bound=1.5, num_levels=4, log2_hashmap_size=11,
                      hash_backend="xla"),
        variant=variant, num_layers_basis=2, hidden_dim_basis=32,
        num_layers_ambient=2, hidden_dim_ambient=32,
    )
    init_fn, density_fn, rgb_fn = make_dnerf_variant_field(cfg)
    params = init_fn(jax.random.PRNGKey(0))
    rcfg = NGPRenderConfig(n_candidates=32, n_keep=16, grid_size=16, bound=1.5)
    occ = init_occupancy(rcfg)
    occ = with_density(occ, jnp.ones_like(occ.density), rcfg)  # all occupied

    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile([[0, 0, -2.0]], (64, 1)), jnp.float32)
    d = rng.standard_normal((64, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    t = jnp.asarray(rng.random(64), jnp.float32)
    gt = jnp.asarray(rng.random((64, 3)), jnp.float32)

    def loss(p):
        out = ngp_render_rays(jax.random.PRNGKey(1), p, density_fn, rgb_fn,
                              occ, o, d, rcfg, times=t)
        return jnp.mean((out["rgb"] - gt) ** 2)

    l0, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l0))
    # every parameter group receives gradients (incl. the time nets)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    key_net = "basis_net" if variant == "basis" else "ambient_net"
    assert float(jnp.abs(grads[key_net][0]).max()) > 0
    # outputs differ across time (the variant actually uses t)
    out0 = ngp_render_rays(jax.random.PRNGKey(1), params, density_fn, rgb_fn,
                           occ, o, d, rcfg, perturb=False,
                           times=jnp.zeros(64))
    out1 = ngp_render_rays(jax.random.PRNGKey(1), params, density_fn, rgb_fn,
                           occ, o, d, rcfg, perturb=False,
                           times=jnp.ones(64))
    assert float(jnp.abs(out0["rgb"] - out1["rgb"]).max()) > 1e-6


def test_basis_variant_with_split_hash_table():
    """log2_hashmap_size >= 16 (split/sorted engine) must work through the
    basis variant too — it shares make_ngp_spec with the NGP field."""
    from flnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_basis_field
    from flnerf_tpu.models.hash_ngp import NGPConfig

    cfg = DNeRFConfig(
        ngp=NGPConfig(num_levels=6, base_resolution=4,
                      desired_resolution=64, log2_hashmap_size=16,
                      bound=1.0, hidden_dim=16, hidden_dim_color=16),
        variant="basis", sigma_basis_dim=4, color_basis_dim=2,
        num_layers_basis=2, hidden_dim_basis=16,
    )
    init_fn, density_fn, rgb_fn = make_dnerf_basis_field(cfg, jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    assert isinstance(params["table"], tuple)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3)) * 2 - 1
    t = jnp.full((64,), 0.25)

    def loss(p):
        s, geo = density_fn(p, x, t)
        return jnp.sum(s)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["table"][1]).sum()) > 0.0
