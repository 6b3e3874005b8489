"""D-NeRF (time-conditioned) backend tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.dnerf import DNeRFConfig, deform, init_dnerf, make_dnerf_field
from flnerf_tpu.models.hash_ngp import NGPConfig
from flnerf_tpu.render.ngp import NGPRenderConfig, init_occupancy, ngp_render_rays, update_occupancy


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
    occ = occ._replace(density=jnp.ones((8, 8, 8)))  # everything occupied
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
