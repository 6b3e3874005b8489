"""Checkpoint format parity: .tar round-trips, torch state-dict naming, and
optimizer-state conversion (SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flnerf_tpu.core.checkpoint import (
    find_latest_checkpoint,
    load_nerf_checkpoint,
    nerf_params_from_state_dict,
    nerf_params_to_state_dict,
    save_nerf_checkpoint,
)
from flnerf_tpu.models.nerf_mlp import apply_nerf_mlp, embedder_out_dim, init_nerf_mlp


def _params(seed=0):
    ic, icv = embedder_out_dim(4), embedder_out_dim(2)
    return init_nerf_mlp(
        jax.random.PRNGKey(seed), D=3, W=32, input_ch=ic, input_ch_views=icv
    ), ic, icv


def test_state_dict_naming_and_shapes():
    params, ic, icv = _params()
    sd = nerf_params_to_state_dict(params)
    # reference naming with DataParallel 'module.' prefix (run_nerf.py:82)
    assert "module.pts_linears.0.weight" in sd
    assert "module.views_linears.0.weight" in sd
    assert "module.feature_linear.bias" in sd
    assert "module.alpha_linear.weight" in sd
    assert "module.rgb_linear.weight" in sd
    # torch Linear weights are [out, in]
    assert sd["module.pts_linears.0.weight"].shape == (32, ic)
    assert sd["module.rgb_linear.weight"].shape == (3, 16)


def test_params_roundtrip_preserves_function():
    params, ic, icv = _params()
    sd = nerf_params_to_state_dict(params)
    params2 = nerf_params_from_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, ic))
    v = jax.random.normal(jax.random.PRNGKey(2), (5, icv))
    y1 = apply_nerf_mlp(params, x, v, compute_dtype=jnp.float32)
    y2 = apply_nerf_mlp(params2, x, v, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_tar_roundtrip_with_optimizer(tmp_path):
    pc, ic, icv = _params(0)
    pf, _, _ = _params(1)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt = tx.init((pc, pf))
    # take one fake update so moments are non-zero
    grads = jax.tree_util.tree_map(jnp.ones_like, (pc, pf))
    _, opt = tx.update(grads, opt, (pc, pf))

    path = str(tmp_path / "007.tar")
    save_nerf_checkpoint(path, 7, 1234, pc, pf, opt)

    tx2 = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_init = tx2.init((pc, pf))
    epoch, it, pc2, pf2, opt2 = load_nerf_checkpoint(path, opt_init)
    assert (epoch, it) == (7, 1234)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, ic))
    v = jax.random.normal(jax.random.PRNGKey(2), (4, icv))
    for a, b in ((pc, pc2), (pf, pf2)):
        y1 = apply_nerf_mlp(a, x, v, compute_dtype=jnp.float32)
        y2 = apply_nerf_mlp(b, x, v, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

    # Adam moments survive the torch layout round trip
    for m1, m2 in zip(jax.tree_util.tree_leaves(opt.mu), jax.tree_util.tree_leaves(opt2.mu)):
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    for v1, v2 in zip(jax.tree_util.tree_leaves(opt.nu), jax.tree_util.tree_leaves(opt2.nu)):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_reference_torch_checkpoint_loads(tmp_path):
    """A .tar written by torch code with the reference's exact dict layout
    (run_nerf.py:532-539) must load."""
    import torch

    ic, icv = embedder_out_dim(4), embedder_out_dim(2)
    sd = {}
    rng = np.random.default_rng(0)
    dims_in = [ic, 32, 32]
    for i, di in enumerate(dims_in):
        sd[f"module.pts_linears.{i}.weight"] = torch.tensor(
            rng.standard_normal((32, di)).astype(np.float32)
        )
        sd[f"module.pts_linears.{i}.bias"] = torch.tensor(
            rng.standard_normal(32).astype(np.float32)
        )
    sd["module.views_linears.0.weight"] = torch.tensor(rng.standard_normal((16, icv + 32)).astype(np.float32))
    sd["module.views_linears.0.bias"] = torch.tensor(rng.standard_normal(16).astype(np.float32))
    sd["module.feature_linear.weight"] = torch.tensor(rng.standard_normal((32, 32)).astype(np.float32))
    sd["module.feature_linear.bias"] = torch.tensor(rng.standard_normal(32).astype(np.float32))
    sd["module.alpha_linear.weight"] = torch.tensor(rng.standard_normal((1, 32)).astype(np.float32))
    sd["module.alpha_linear.bias"] = torch.tensor(rng.standard_normal(1).astype(np.float32))
    sd["module.rgb_linear.weight"] = torch.tensor(rng.standard_normal((3, 16)).astype(np.float32))
    sd["module.rgb_linear.bias"] = torch.tensor(rng.standard_normal(3).astype(np.float32))

    path = str(tmp_path / "003.tar")
    torch.save(
        {
            "global_epoch": 3,
            "global_iter": 999,
            "network_fn_state_dict": sd,
            "network_fine_state_dict": sd,
        },
        path,
    )
    epoch, it, pc, pf, _ = load_nerf_checkpoint(path)
    assert (epoch, it) == (3, 999)
    x = jnp.zeros((2, ic))
    v = jnp.zeros((2, icv))
    y = apply_nerf_mlp(pc, x, v, compute_dtype=jnp.float32)
    assert y.shape == (2, 4)
    # check an actual value: layer-0 output for zero input is bias
    np.testing.assert_allclose(
        np.asarray(pc["pts_linears"][0]["b"]),
        sd["module.pts_linears.0.bias"].numpy(),
    )


def test_find_latest(tmp_path):
    assert find_latest_checkpoint(str(tmp_path / "nope")) is None
    for name in ("001.tar", "010.tar", "002.tar", "junk.txt"):
        (tmp_path / name).write_bytes(b"x")
    assert find_latest_checkpoint(str(tmp_path)).endswith("010.tar")


def test_orbax_sharded_roundtrip(tmp_path):
    """TPU-native orbax path (SURVEY §5.4): a trainer-state-shaped pytree
    with a mesh-sharded grid round-trips with values, containers, AND
    shardings intact (the production checkpoint for beyond-host grids)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from flnerf_tpu.core.checkpoint import (
        abstract_like, load_orbax, save_orbax,
    )
    from flnerf_tpu.train.plenoxels_trainer import PlenoxelsState
    from flnerf_tpu.models.voxel_sh import VoxelGrid

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    grid = VoxelGrid(
        density=jax.device_put(
            jnp.asarray(rng.random((8, 4, 4)), jnp.float32), sh),
        sh=jax.device_put(
            jnp.asarray(rng.random((8, 4, 4, 27)), jnp.float32), sh),
        alive=jax.device_put(jnp.ones((8, 4, 4), bool), sh),
    )
    state = PlenoxelsState(grid, jnp.zeros((8, 4, 4)), jnp.zeros((8, 4, 4, 27)),
                           jnp.int32(42))

    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, state)
    out = load_orbax(path, abstract_like(state))

    assert isinstance(out, PlenoxelsState) and isinstance(out.grid, VoxelGrid)
    assert int(out.step) == 42
    np.testing.assert_array_equal(np.asarray(out.grid.density),
                                  np.asarray(grid.density))
    assert out.grid.density.sharding == sh
    # target-free restore gives plain containers/values
    raw = load_orbax(path)
    np.testing.assert_array_equal(
        np.asarray(raw["grid"]["sh"]), np.asarray(grid.sh))


def test_our_tar_loads_with_real_torch(tmp_path):
    """The cross-direction of test_reference_torch_checkpoint_loads: a .tar
    written by save_nerf_checkpoint must open with REAL torch.load and carry
    the reference's exact dict layout (run_nerf.py:532-539), so reference
    tooling can resume from our checkpoints."""
    import torch

    pc, ic, icv = _params(0)
    pf, _, _ = _params(1)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt = tx.init((pc, pf))
    path = str(tmp_path / "011.tar")
    save_nerf_checkpoint(path, 11, 4321, pc, pf, opt)

    ck = torch.load(path, map_location="cpu", weights_only=False)
    assert ck["global_epoch"] == 11 and ck["global_iter"] == 4321
    sd = ck["network_fn_state_dict"]
    assert "module.pts_linears.0.weight" in sd
    w = np.asarray(sd["module.pts_linears.0.weight"])
    # torch layout is [out, in] == transpose of our [in, out] leaf
    np.testing.assert_allclose(w, np.asarray(pc["pts_linears"][0]["w"]).T,
                               atol=1e-7)
    assert "optimizer_state_dict" in ck
