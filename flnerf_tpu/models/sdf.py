"""SDF-fitting family (ngp-ours/sdf re-designed).

Parity targets:
  * SDFNetwork (sdf/netowrk*.py [sic]): hash/frequency encoder + MLP -> sdf
    scalar (no activation on the output).
  * SDFDataset (sdf/provider.py:28): point/sdf pairs — surface-biased
    samples (perturbed surface points) + uniform volume samples; the
    reference uses pysdf over a mesh, unavailable offline, so training data
    comes from an analytic SDF oracle or precomputed samples.
  * mape_loss (loss.py:7): |pred - gt| / (|gt| + 1e-2).
  * Trainer (sdf/utils.py:83): supervised regression + marching-cubes mesh
    export (ours: ops/marching.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flnerf_tpu.models.hash_ngp import mlp_chain
from flnerf_tpu.ops.hash_pallas import (
    PackedHashSpec,
    hash_encode_pallas,
    hash_encode_xla,
    init_packed_table,
    make_packed_spec,
)

Params = Dict[str, Any]


class SDFConfig(NamedTuple):
    num_levels: int = 16
    level_dim: int = 2
    log2_hashmap_size: int = 15
    desired_resolution: int = 2048
    num_layers: int = 3
    hidden_dim: int = 64
    bound: float = 1.0
    hash_backend: str = "auto"
    hash_chunk: int = 2048


def mape_loss(pred, gt):
    """Mean-absolute-percentage loss (ngp-ours/loss.py:7-15)."""
    return jnp.mean(jnp.abs(pred - gt) / (jnp.abs(gt) + 1e-2))


def init_sdf(key, cfg: SDFConfig) -> Params:
    spec = make_packed_spec(
        num_levels=cfg.num_levels, level_dim=cfg.level_dim,
        log2_hashmap_size=cfg.log2_hashmap_size,
        desired_resolution=cfg.desired_resolution,
    )
    keys = jax.random.split(key, cfg.num_layers + 1)
    params: Params = {"table": init_packed_table(keys[0], spec)}
    dim = spec.output_dim
    net = []
    for l in range(cfg.num_layers):
        out = 1 if l == cfg.num_layers - 1 else cfg.hidden_dim
        bound = 1.0 / np.sqrt(dim)
        net.append(jax.random.uniform(keys[l + 1], (dim, out), jnp.float32, -bound, bound))
        dim = out
    params["net"] = net
    return params


def make_sdf_field(cfg: SDFConfig, compute_dtype=jnp.bfloat16):
    spec = make_packed_spec(
        num_levels=cfg.num_levels, level_dim=cfg.level_dim,
        log2_hashmap_size=cfg.log2_hashmap_size,
        desired_resolution=cfg.desired_resolution,
    )
    use_pallas = cfg.hash_backend == "pallas" or (
        cfg.hash_backend == "auto" and jax.default_backend() == "tpu"
    )

    def init_fn(key):
        return init_sdf(key, cfg)

    def sdf_fn(params, x):
        sh = x.shape[:-1]
        x01 = jnp.clip((x.reshape(-1, 3) / cfg.bound + 1.0) * 0.5, 0.0, 1.0)
        if use_pallas:
            h = hash_encode_pallas(x01, params["table"], spec, cfg.hash_chunk)
        else:
            h = hash_encode_xla(x01, params["table"], spec)
        h = mlp_chain(h, params["net"], compute_dtype)
        return h[..., 0].reshape(sh)

    return init_fn, sdf_fn


# ---------------------------------------------------------------------------
# dataset + trainer
# ---------------------------------------------------------------------------

def sample_sdf_batch(rng: np.random.Generator, oracle: Callable, n: int,
                     bound: float = 1.0, surface_frac: float = 0.5):
    """SDFDataset-style batch (sdf/provider.py): ~half near-surface samples
    (uniform points nudged toward the level set), rest uniform in the cube."""
    n_surf = int(n * surface_frac)
    pts = rng.uniform(-bound, bound, (n, 3)).astype(np.float32)
    if n_surf:
        # project sample toward the surface along the numeric gradient
        p = pts[:n_surf]
        eps = 1e-3
        d = oracle(p)
        grad = np.stack(
            [
                (oracle(p + eps * np.eye(3, dtype=np.float32)[i]) - d) / eps
                for i in range(3)
            ],
            -1,
        )
        g = grad / np.maximum(np.linalg.norm(grad, axis=-1, keepdims=True), 1e-6)
        p = p - d[:, None] * g
        p += rng.normal(0, 0.01, p.shape).astype(np.float32)
        pts[:n_surf] = np.clip(p, -bound, bound)
    sdf = oracle(pts).astype(np.float32)
    return pts, sdf


class SDFTrainer:
    """Supervised SDF regression (sdf/utils.py:83 Trainer analog)."""

    def __init__(self, cfg: SDFConfig, lr: float = 1e-3, seed: int = 0,
                 compute_dtype=jnp.float32):
        self.cfg = cfg
        init_fn, self.sdf_fn = make_sdf_field(cfg, compute_dtype)
        self.params = init_fn(jax.random.PRNGKey(seed))
        self.tx = optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
        self.opt_state = self.tx.init(self.params)
        sdf_fn = self.sdf_fn
        tx = self.tx

        @jax.jit
        def step(params, opt_state, pts, sdf):
            def loss_fn(p):
                return mape_loss(sdf_fn(p, pts), sdf)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def fit(self, oracle: Callable, steps: int = 200, batch: int = 4096, seed: int = 0):
        rng = np.random.default_rng(seed)
        losses = []
        for _ in range(steps):
            pts, sdf = sample_sdf_batch(rng, oracle, batch, self.cfg.bound)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jnp.asarray(pts), jnp.asarray(sdf)
            )
            losses.append(float(loss))
        return losses

    def fit_dataset(self, dataset, steps: int = 200):
        """Train from a provider with ``sample_batch() -> (pts, sdf)``
        (the SDFMeshDataset mesh path, data/mesh_sdf.py — reference
        sdf/provider.py batch mix)."""
        losses = []
        for _ in range(steps):
            pts, sdf = dataset.sample_batch()
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jnp.asarray(pts),
                jnp.asarray(sdf).reshape(-1),
            )
            losses.append(float(loss))
        return losses

    def extract_mesh(self, reso: int = 128, chunk: int = 1 << 16,
                     algo: str = "cubes"):
        """Iso-surface of the learned SDF (save_mesh analog,
        instant-sdf's mcubes path): marching CUBES by default like the
        reference, marching tetrahedra as the denser variant."""
        from flnerf_tpu.ops.marching import marching_cubes, marching_tetrahedra

        b = self.cfg.bound
        g = np.linspace(-b, b, reso, dtype=np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
        out = []
        n = pts.shape[0]
        n_pad = (n + chunk - 1) // chunk * chunk
        pp = np.zeros((n_pad, 3), np.float32)
        pp[:n] = pts
        f = jax.jit(self.sdf_fn)
        for i in range(0, n_pad, chunk):
            out.append(np.asarray(f(self.params, jnp.asarray(pp[i : i + chunk]))))
        field = np.concatenate(out)[:n].reshape(reso, reso, reso)
        # inside = sdf < 0 -> pass -sdf so "inside" is positive
        spacing = (g[1] - g[0],) * 3
        march = marching_cubes if algo == "cubes" else marching_tetrahedra
        return march(-field, iso=0.0, origin=(-b,) * 3, spacing=spacing)
