"""Checkpointing with reference-format parity.

The BASELINE requires preserving the reference's checkpoint formats
(SURVEY.md §5.4).  For the nerf backend that is:

  * ``{basedir}/{expname}/{epoch:03d}.tar`` — a torch.save dict with keys
    {global_epoch, global_iter, network_fn_state_dict,
    network_fine_state_dict, optimizer_state_dict}
    (nerf-ours/run_nerf.py:532-539), where the model state dicts carry the
    DataParallel ``module.`` prefix (run_nerf.py:82,90) and torch
    nn.Linear naming (``pts_linears.{i}.weight`` of shape [out, in], etc.).
  * ``treeDivide_{epoch:04d}.pkl`` — quadtree state next to the weights
    (run_nerf.py:542-544); handled by QuadTreeForest.save/load.

This module converts between our JAX param pytrees / optax Adam state and
the torch formats so checkpoints are interchangeable in BOTH directions:
a reference .tar loads into this framework, and our .tar loads into the
reference's ``create_nerf`` resume path.  torch is used only for file I/O
here — never on the compute path.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# NeRF-MLP param tree <-> torch state dict
# ---------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def nerf_params_to_state_dict(params: Dict[str, Any], prefix: str = "module.") -> Dict[str, np.ndarray]:
    """Our pytree -> torch-style state dict (numpy values).

    Naming parity: nerf-ours/model.py:20-35 — pts_linears.{i}, views_linears.0,
    feature_linear, alpha_linear, rgb_linear; weights are [out, in].
    """
    sd: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["pts_linears"]):
        sd[f"{prefix}pts_linears.{i}.weight"] = _np(layer["w"]).T
        sd[f"{prefix}pts_linears.{i}.bias"] = _np(layer["b"])
    if "views_linear" in params:
        sd[f"{prefix}views_linears.0.weight"] = _np(params["views_linear"]["w"]).T
        sd[f"{prefix}views_linears.0.bias"] = _np(params["views_linear"]["b"])
        for name, key in (
            ("feature_linear", "feature_linear"),
            ("alpha_linear", "alpha_linear"),
            ("rgb_linear", "rgb_linear"),
        ):
            sd[f"{prefix}{name}.weight"] = _np(params[key]["w"]).T
            sd[f"{prefix}{name}.bias"] = _np(params[key]["b"])
    elif "output_linear" in params:
        sd[f"{prefix}output_linear.weight"] = _np(params["output_linear"]["w"]).T
        sd[f"{prefix}output_linear.bias"] = _np(params["output_linear"]["b"])
    return sd


def nerf_params_from_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch-style state dict -> our pytree (strips optional 'module.')."""

    def get(name):
        for k in (name, "module." + name):
            if k in sd:
                return np.asarray(sd[k], dtype=np.float32)
        raise KeyError(name)

    n_layers = 0
    pat = re.compile(r"(?:module\.)?pts_linears\.(\d+)\.weight")
    for k in sd:
        m = pat.match(k)
        if m:
            n_layers = max(n_layers, int(m.group(1)) + 1)

    params: Dict[str, Any] = {
        "pts_linears": [
            {
                "w": jnp.asarray(get(f"pts_linears.{i}.weight").T),
                "b": jnp.asarray(get(f"pts_linears.{i}.bias")),
            }
            for i in range(n_layers)
        ]
    }
    if any(k.endswith("views_linears.0.weight") for k in sd):
        params["views_linear"] = {
            "w": jnp.asarray(get("views_linears.0.weight").T),
            "b": jnp.asarray(get("views_linears.0.bias")),
        }
        for name, key in (
            ("feature_linear", "feature_linear"),
            ("alpha_linear", "alpha_linear"),
            ("rgb_linear", "rgb_linear"),
        ):
            params[key] = {
                "w": jnp.asarray(get(f"{name}.weight").T),
                "b": jnp.asarray(get(f"{name}.bias")),
            }
    elif any(k.endswith("output_linear.weight") for k in sd):
        params["output_linear"] = {
            "w": jnp.asarray(get("output_linear.weight").T),
            "b": jnp.asarray(get("output_linear.bias")),
        }
    return params


def _flat_param_order(params: Dict[str, Any]) -> List[Tuple[str, str]]:
    """(group, leaf) pairs in torch ``model.parameters()`` order
    (module definition order in nerf-ours/model.py:20-35)."""
    order: List[Tuple[str, str]] = []
    for i in range(len(params["pts_linears"])):
        order += [(f"pts_linears/{i}", "w"), (f"pts_linears/{i}", "b")]
    if "views_linear" in params:
        order += [("views_linear", "w"), ("views_linear", "b")]
        order += [("feature_linear", "w"), ("feature_linear", "b")]
        order += [("alpha_linear", "w"), ("alpha_linear", "b")]
        order += [("rgb_linear", "w"), ("rgb_linear", "b")]
    elif "output_linear" in params:
        order += [("output_linear", "w"), ("output_linear", "b")]
    return order


def _get_leaf(params, group, leaf):
    if "/" in group:
        name, idx = group.split("/")
        return params[name][int(idx)][leaf]
    return params[group][leaf]


def _set_leaf(params, group, leaf, value):
    if "/" in group:
        name, idx = group.split("/")
        params[name][int(idx)][leaf] = value
    else:
        params[group][leaf] = value


def adam_state_to_torch(
    opt_state, params_coarse, params_fine, step: int
) -> Dict[str, Any]:
    """optax.scale_by_adam state -> torch.optim.Adam state-dict layout.

    Param indexing parity: run_nerf.py:83,91 builds grad_vars as
    list(model.parameters()) + list(model_fine.parameters()).
    Weight tensors are transposed to torch's [out, in].
    """
    mu, nu = opt_state.mu, opt_state.nu
    state: Dict[int, Dict[str, Any]] = {}
    idx = 0
    for part_params, part_mu, part_nu in (
        (params_coarse, mu[0], nu[0]),
        (params_fine, mu[1], nu[1]),
    ):
        if part_params is None:
            continue
        for group, leaf in _flat_param_order(part_params):
            m = _np(_get_leaf(part_mu, group, leaf))
            v = _np(_get_leaf(part_nu, group, leaf))
            if leaf == "w":
                m, v = m.T, v.T
            state[idx] = {"step": int(step), "exp_avg": m, "exp_avg_sq": v}
            idx += 1
    return {
        "state": state,
        "param_groups": [
            {
                "lr": 5e-4, "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False, "differentiable": False,
                "fused": None, "params": list(range(idx)),
            }
        ],
    }


def adam_state_from_torch(
    torch_state: Dict[str, Any], opt_state, params_coarse, params_fine
):
    """Inverse of adam_state_to_torch; returns a new optax state."""
    import copy

    state = torch_state["state"]
    mu = jax.tree_util.tree_map(np.asarray, opt_state.mu)
    nu = jax.tree_util.tree_map(np.asarray, opt_state.nu)
    mu = (copy.deepcopy(mu[0]), copy.deepcopy(mu[1]))
    nu = (copy.deepcopy(nu[0]), copy.deepcopy(nu[1]))
    idx = 0
    step = 0
    for part_params, part_mu, part_nu in (
        (params_coarse, mu[0], nu[0]),
        (params_fine, mu[1], nu[1]),
    ):
        if part_params is None:
            continue
        for group, leaf in _flat_param_order(part_params):
            s = state[idx]
            m = np.asarray(s["exp_avg"], dtype=np.float32)
            v = np.asarray(s["exp_avg_sq"], dtype=np.float32)
            step = int(s["step"])
            if leaf == "w":
                m, v = m.T, v.T
            _set_leaf(part_mu, group, leaf, jnp.asarray(m))
            _set_leaf(part_nu, group, leaf, jnp.asarray(v))
            idx += 1
    return opt_state._replace(
        count=jnp.asarray(step, jnp.int32),
        mu=(mu[0], mu[1]),
        nu=(nu[0], nu[1]),
    )


# ---------------------------------------------------------------------------
# .tar save / load (torch container format)
# ---------------------------------------------------------------------------

def save_nerf_checkpoint(
    path: str,
    epoch: int,
    global_iter: int,
    params_coarse,
    params_fine,
    opt_state=None,
) -> None:
    """Write a reference-compatible {epoch:03d}.tar (run_nerf.py:532-539)."""
    import torch

    def to_torch_sd(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    payload = {
        "global_epoch": int(epoch),
        "global_iter": int(global_iter),
        "network_fn_state_dict": to_torch_sd(nerf_params_to_state_dict(params_coarse)),
        "network_fine_state_dict": (
            to_torch_sd(nerf_params_to_state_dict(params_fine))
            if params_fine is not None
            else None
        ),
    }
    if opt_state is not None:
        osd = adam_state_to_torch(opt_state, params_coarse, params_fine, global_iter)
        osd["state"] = {
            i: {
                "step": torch.tensor(float(s["step"])),
                "exp_avg": torch.from_numpy(np.ascontiguousarray(s["exp_avg"])),
                "exp_avg_sq": torch.from_numpy(np.ascontiguousarray(s["exp_avg_sq"])),
            }
            for i, s in osd["state"].items()
        }
        payload["optimizer_state_dict"] = osd
    torch.save(payload, path)


def load_nerf_checkpoint(path: str, opt_state=None):
    """Load a .tar from either this framework or the reference.

    Returns (epoch, global_iter, params_coarse, params_fine, opt_state|None).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np_sd(sd):
        return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in sd.items()}

    params_coarse = nerf_params_from_state_dict(to_np_sd(ckpt["network_fn_state_dict"]))
    params_fine = None
    if ckpt.get("network_fine_state_dict") is not None:
        params_fine = nerf_params_from_state_dict(to_np_sd(ckpt["network_fine_state_dict"]))

    new_opt = None
    if opt_state is not None and "optimizer_state_dict" in ckpt:
        osd = ckpt["optimizer_state_dict"]
        osd = {
            "state": {
                int(i): {
                    "step": float(s["step"]),
                    "exp_avg": s["exp_avg"].numpy() if hasattr(s["exp_avg"], "numpy") else s["exp_avg"],
                    "exp_avg_sq": s["exp_avg_sq"].numpy() if hasattr(s["exp_avg_sq"], "numpy") else s["exp_avg_sq"],
                }
                for i, s in osd["state"].items()
            },
            "param_groups": osd.get("param_groups", []),
        }
        new_opt = adam_state_from_torch(osd, opt_state, params_coarse, params_fine)

    return (
        int(ckpt.get("global_epoch", 0)),
        int(ckpt.get("global_iter", 0)),
        params_coarse,
        params_fine,
        new_opt,
    )


def find_latest_checkpoint(log_dir: str) -> Optional[str]:
    """Auto-resume: lexically-last *.tar in the run dir (run_nerf.py:112-118)."""
    if not os.path.isdir(log_dir):
        return None
    ckpts = sorted(f for f in os.listdir(log_dir) if f.endswith(".tar"))
    return os.path.join(log_dir, ckpts[-1]) if ckpts else None


# ---------------------------------------------------------------------------
# TPU-native checkpointing (orbax) — SURVEY §5.4's "orbax-style" slot
# ---------------------------------------------------------------------------
# The reference formats above are the INTEROP surface; these are the
# production path for large/sharded state: each leaf writes as a
# tensorstore array straight from device (a spatially-sharded voxel grid
# saves one shard per host — no .npz host staging), and restore places
# leaves back onto their recorded shardings.


def abstract_like(tree):
    """jax.Array leaves -> ShapeDtypeStruct carrying the sharding, for
    ``load_orbax(target=...)`` restores that must land sharded."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)
        if isinstance(a, jax.Array) else a,
        tree,
    )


def save_orbax(path: str, tree) -> None:
    """Write a pytree (params / trainer state NamedTuples / sharded
    grids) as an orbax checkpoint directory at ``path``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, target=None):
    """Restore an orbax checkpoint.  ``target`` (e.g. ``abstract_like``
    of a live state) restores leaves onto their shardings and rebuilds
    NamedTuple containers; without it, plain dicts/np arrays return."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), target)
