"""SDF-fitting backend tests: mape loss, analytic-SDF regression, mesh out."""

import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.sdf import SDFConfig, SDFTrainer, mape_loss, sample_sdf_batch


def sphere_sdf(p, r=0.5):
    return np.linalg.norm(np.asarray(p), axis=-1) - r


def test_mape_loss():
    pred = jnp.array([1.0, 2.0])
    gt = jnp.array([1.0, 1.0])
    # (0/(1.01) + 1/1.01)/2
    assert abs(float(mape_loss(pred, gt)) - 0.5 / 1.01) < 1e-6


def test_sample_sdf_batch_surface_bias():
    rng = np.random.default_rng(0)
    pts, sdf = sample_sdf_batch(rng, sphere_sdf, 2000, bound=1.0, surface_frac=0.5)
    assert pts.shape == (2000, 3) and sdf.shape == (2000,)
    # first half clusters near the surface
    near = np.abs(sphere_sdf(pts[:1000]))
    far = np.abs(sphere_sdf(pts[1000:]))
    assert near.mean() < 0.1
    assert near.mean() < far.mean() * 0.5


@pytest.mark.slow
def test_sdf_fit_sphere_and_extract_mesh():
    cfg = SDFConfig(num_levels=6, log2_hashmap_size=12, desired_resolution=64,
                    num_layers=2, hidden_dim=32, bound=1.0)
    t = SDFTrainer(cfg, lr=5e-3)
    losses = t.fit(sphere_sdf, steps=120, batch=2048)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # prediction accuracy near the surface
    rng = np.random.default_rng(1)
    pts, sdf = sample_sdf_batch(rng, sphere_sdf, 1024)
    pred = np.asarray(t.sdf_fn(t.params, jnp.asarray(pts)))
    assert np.abs(pred - sdf).mean() < 0.05

    verts, tris = t.extract_mesh(reso=48)
    assert len(verts) > 0 and len(tris) > 0
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.5) < 0.05, r.mean()
