"""NGP step profiler — breaks the train step into timed pieces on real TPU.

Timing method (CLAUDE.md): scan-chained rep counts inside one jit with a
single float() sync, slope between two rep counts.  Per-call dispatch
(~2.5 ms) and the 28 ms tunnel sync never enter the slope.

Run:  python tools/profile_ngp.py [piece ...]
Pieces default to all.  Prints one line per piece: "<name>: <ms> ms".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = (3, 13)


def slope_ms(mk, *args):
    """mk(n) -> jitted fn(*args) returning a pytree; returns ms per rep."""
    r1, r2 = REPS
    f1, f2 = mk(r1), mk(r2)

    def sync(out):
        return float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    sync(f1(*args))
    sync(f2(*args))
    ts = []
    for f in (f1, f2, f1, f2):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts[1], ts[3]) - min(ts[0], ts[2])) / (r2 - r1) * 1e3


def scan_chain(step):
    """step(carry, i) -> carry;  mk(n) runs it n times."""

    def mk(n):
        @jax.jit
        def f(carry):
            def body(c, i):
                return step(c, i), ()

            c, _ = jax.lax.scan(body, carry, jnp.arange(n))
            return c

        return f

    return mk


def p_sort(levels=14, log_m=17):
    from flnerf_tpu.ops.sort_pallas import bitonic_sort

    m = 1 << log_m
    k = jax.random.randint(jax.random.PRNGKey(0), (levels, m), 0, 1 << 19)
    pay = jnp.arange(levels * m, dtype=jnp.int32).reshape(levels, m)

    def step(c, i):
        keys, p = c
        sk, sp = bitonic_sort(keys ^ (i + 1), p)
        return (sk, sp)

    ms = slope_ms(scan_chain(step), (k, pay))
    print(f"sort_{levels}x2^{log_m}: {ms:.2f} ms", flush=True)


def _engine_spec(log2):
    from flnerf_tpu.ops.hash_sorted import make_split_spec

    return make_split_spec(num_levels=16, level_dim=2, base_resolution=16,
                           log2_hashmap_size=log2, desired_resolution=2048)


def p_engine(log2=19, n_pts=16384, chunk=16384, fwd_only=False):
    from flnerf_tpu.ops.hash_sorted import (
        hash_encode_sorted, init_split_table,
    )

    spec = _engine_spec(log2)
    tables = init_split_table(jax.random.PRNGKey(0), spec)
    tb = tables[1]
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_pts, 3))

    def encode(tb, xx):
        outs = [
            hash_encode_sorted(xx[i:i + chunk], tb, spec)
            for i in range(0, n_pts, chunk)
        ]
        return jnp.concatenate(outs, 0)

    if fwd_only:
        def step(c, i):
            tb, acc = c
            out = encode(tb, x + 1e-7 * i)
            return (tb, acc + jnp.sum(out))

        ms = slope_ms(scan_chain(step), (tb, jnp.float32(0)))
        tag = "fwd"
    else:
        def step(c, i):
            tb = c
            g = jax.grad(lambda t: jnp.sum(encode(t, x + 1e-7 * i) ** 2))(tb)
            return tb + 1e-9 * g

        ms = slope_ms(scan_chain(step), tb)
        tag = "fwdbwd"
    print(f"engine{log2}_{tag}_{n_pts}pts_c{chunk}: {ms:.2f} ms", flush=True)


def p_matmul(log2=15, n_pts=16384):
    from flnerf_tpu.ops.hash_pallas import (
        hash_encode_pallas, init_packed_table, make_packed_spec,
    )

    spec = make_packed_spec(num_levels=16, level_dim=2, base_resolution=16,
                           log2_hashmap_size=log2, desired_resolution=2048)
    table = init_packed_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_pts, 3))

    def step(tb, i):
        g = jax.grad(
            lambda t: jnp.sum(hash_encode_pallas(x + 1e-7 * i, t, spec,
                                                 2048) ** 2))(tb)
        return tb + 1e-9 * g

    ms = slope_ms(scan_chain(step), table)
    print(f"matmul{log2}_fwdbwd_{n_pts}pts: {ms:.2f} ms", flush=True)


def _field(log2=15, engine="auto"):
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=log2, hash_engine=engine)
    return cfg, make_ngp_field(cfg, jnp.bfloat16)


def p_step(log2=15, n_rays=4096, engine="auto"):
    """Full render fwd+bwd at bench shapes (no optimizer/occ update)."""
    from flnerf_tpu.models.hash_ngp import init_ngp
    from flnerf_tpu.render.ngp import (
        NGPRenderConfig, init_occupancy, ngp_render_rays,
    )

    cfg, (init_fn, density_fn, rgb_fn) = _field(log2, engine)
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    params = init_fn(jax.random.PRNGKey(0))
    occ = init_occupancy(rcfg)
    from flnerf_tpu.render.ngp import with_density
    occ = with_density(
        occ, jax.random.uniform(jax.random.PRNGKey(2), occ.density.shape),
        rcfg)
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile([[0, 0, 3.0]], (n_rays, 1)), jnp.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.2
    d[:, 2] -= 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    gt = jnp.asarray(rng.random((n_rays, 3)), np.float32)

    def step(params, i):
        def loss(p):
            out = ngp_render_rays(jax.random.PRNGKey(0), p, density_fn,
                                  rgb_fn, occ, o, d, rcfg, perturb=False)
            return jnp.mean((out["rgb"] - gt) ** 2)

        g = jax.grad(loss)(params)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, params, g)

    ms = slope_ms(scan_chain(step), params)
    print(f"render_fwdbwd_log2={log2}_{n_rays}rays_{engine}: {ms:.2f} ms",
          flush=True)


def p_march(n_rays=4096):
    """Marching prep only: candidates + occupancy + argsort compaction."""
    from flnerf_tpu.render.ngp import (
        NGPRenderConfig, init_occupancy, near_far_from_aabb,
        occupancy_lookup,
    )

    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    occ = init_occupancy(rcfg)
    from flnerf_tpu.render.ngp import with_density
    occ = with_density(
        occ, jax.random.uniform(jax.random.PRNGKey(2), occ.density.shape),
        rcfg)
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile([[0, 0, 3.0]], (n_rays, 1)), jnp.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.2
    d[:, 2] -= 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    S, K = rcfg.n_candidates, rcfg.n_keep

    def step(acc, i):
        near, far, hit = near_far_from_aabb(o, d, rcfg.bound, rcfg.min_near)
        t = jnp.linspace(0.0, 1.0, S)
        z = near[:, None] + (far - near)[:, None] * t[None, :] + 1e-7 * i
        xyz = jnp.clip(o[:, None, :] + d[:, None, :] * z[..., None],
                       -rcfg.bound, rcfg.bound)
        m = occupancy_lookup(occ, xyz, rcfg) & hit[:, None]
        order = jnp.argsort(jnp.logical_not(m), axis=-1, stable=True)[:, :K]
        zk = jnp.take_along_axis(z, order, axis=-1)
        return acc + jnp.sum(zk)

    ms = slope_ms(scan_chain(step), jnp.float32(0))
    print(f"march_prep_{n_rays}rays: {ms:.2f} ms", flush=True)


def p_mlp(n_pts=65536):
    """Sigma+color MLP + SH encode fwd+bwd, hash features faked."""
    from flnerf_tpu.models.hash_ngp import (
        NGPConfig, _mlp, init_ngp, make_ngp_spec,
    )
    from flnerf_tpu.ops.activations import trunc_exp
    from flnerf_tpu.ops.sh_encoding import sh_encode

    cfg = NGPConfig(bound=1.5)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (n_pts, 32))
    d = jax.random.normal(jax.random.PRNGKey(2), (n_pts, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def step(p, i):
        def loss(p):
            h = _mlp(enc + 1e-7 * i, p["sigma_net"], jnp.bfloat16)
            sigma = trunc_exp(h[..., 0])
            sh = sh_encode(d, cfg.sh_degree)
            h2 = jnp.concatenate([sh, h[..., 1:]], -1)
            rgb = jax.nn.sigmoid(_mlp(h2, p["color_net"], jnp.bfloat16))
            return jnp.sum(sigma) * 1e-6 + jnp.sum(rgb)

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, p, g)

    sub = {"sigma_net": params["sigma_net"], "color_net": params["color_net"]}
    ms = slope_ms(scan_chain(step), sub)
    print(f"mlp_fwdbwd_{n_pts}pts: {ms:.2f} ms", flush=True)


def p_train_step(log2=19, n_rays=4096, engine="auto", ema=True):
    """The trainer's EXACT one_step (render fwd+bwd + adam + LambdaLR +
    EMA shadow) as a scan slope — isolates the optimizer/EMA glue when
    diffed against p_step (render fwd+bwd only)."""
    import optax

    from flnerf_tpu.render.ngp import (
        NGPRenderConfig, init_occupancy, ngp_render_rays, with_density,
    )

    cfg, (init_fn, density_fn, rgb_fn) = _field(log2, engine)
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    params = init_fn(jax.random.PRNGKey(0))
    occ = init_occupancy(rcfg)
    occ = with_density(
        occ, jax.random.uniform(jax.random.PRNGKey(2), occ.density.shape),
        rcfg)
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile([[0, 0, 3.0]], (n_rays, 1)), jnp.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.2
    d[:, 2] -= 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    gt = jnp.asarray(rng.random((n_rays, 3)), np.float32)

    tx = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema else None

    def step(carry, i):
        params, opt_state, ema_params = carry

        def loss_fn(p):
            out = ngp_render_rays(jax.random.PRNGKey(0), p, density_fn,
                                  rgb_fn, occ, o, d, rcfg, perturb=False)
            per_ray = jnp.mean((out["rgb"] - gt) ** 2, -1)
            return jnp.mean(per_ray), per_ray

        (loss, per_ray), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        lr = 1e-2 * 0.1 ** jnp.minimum(
            i.astype(jnp.float32) / 30000.0, 1.0)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: 0.95 * e + 0.05 * p, ema_params, new_params)
        return (new_params, new_opt, ema_params)

    ms = slope_ms(scan_chain(step), (params, opt_state, ema_params))
    print(f"train_step_log2={log2}_{n_rays}rays_{engine}_ema={ema}: "
          f"{ms:.2f} ms", flush=True)


def p_march_onehot(n_rays=4096):
    """March prep with the rank-arithmetic (onehot) compaction instead of
    the stable argsort."""
    from flnerf_tpu.render.ngp import (
        NGPRenderConfig, init_occupancy, ngp_render_rays, with_density,
    )
    # time the full render fwd (no bwd) under each compaction mode: the
    # compaction choice also changes the backward graph shape
    for mode in ("argsort", "onehot"):
        rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                               bound=1.5, compaction=mode)
        _p_march_variant(rcfg, n_rays, mode)


def _p_march_variant(rcfg, n_rays, tag):
    from flnerf_tpu.render.ngp import (
        init_occupancy, near_far_from_aabb, occupancy_lookup, with_density,
    )

    occ = init_occupancy(rcfg)
    occ = with_density(
        occ, jax.random.uniform(jax.random.PRNGKey(2), occ.density.shape),
        rcfg)
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile([[0, 0, 3.0]], (n_rays, 1)), jnp.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.2
    d[:, 2] -= 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    S, K = rcfg.n_candidates, rcfg.n_keep

    def step(acc, i):
        near, far, hit = near_far_from_aabb(o, d, rcfg.bound, rcfg.min_near)
        t = jnp.linspace(0.0, 1.0, S)
        z = near[:, None] + (far - near)[:, None] * t[None, :] + 1e-7 * i
        xyz = jnp.clip(o[:, None, :] + d[:, None, :] * z[..., None],
                       -rcfg.bound, rcfg.bound)
        m = occupancy_lookup(occ, xyz, rcfg) & hit[:, None]
        if rcfg.compaction == "onehot":
            mf = m.astype(jnp.float32)
            c_occ = jnp.cumsum(mf, axis=-1)
            n_occ = c_occ[:, -1:]
            c_un = jnp.cumsum(1.0 - mf, axis=-1)
            dest = jnp.where(m, c_occ - 1.0, n_occ + c_un - 1.0)
            kidx = jnp.arange(K, dtype=jnp.float32)
            sel = (dest[:, None, :] == kidx[None, :, None])
            zk = jnp.sum(jnp.where(sel, z[:, None, :], 0.0), -1)
        else:
            order = jnp.argsort(jnp.logical_not(m), axis=-1,
                                stable=True)[:, :K]
            zk = jnp.take_along_axis(z, order, axis=-1)
        return acc + jnp.sum(zk)

    ms = slope_ms(scan_chain(step), jnp.float32(0))
    print(f"march_prep_{tag}_{n_rays}rays: {ms:.2f} ms", flush=True)


def p_occ_gather(n_rays=4096, S=128):
    """The occupancy bitfield gather ALONE (the march prep's dominant
    cost per round-3 notes): 524k word-gathers from the 64K-word table."""
    from flnerf_tpu.render.ngp import (
        NGPRenderConfig, init_occupancy, occupancy_lookup, with_density,
    )

    rcfg = NGPRenderConfig(n_candidates=S, n_keep=16, grid_size=128,
                           bound=1.5)
    occ = init_occupancy(rcfg)
    occ = with_density(
        occ, jax.random.uniform(jax.random.PRNGKey(2), occ.density.shape),
        rcfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (n_rays, S, 3),
                             minval=-1.4, maxval=1.4)

    def step(acc, i):
        m = occupancy_lookup(occ, xyz + 1e-6 * i, rcfg)
        return acc + jnp.sum(m.astype(jnp.int32))

    ms = slope_ms(scan_chain(step), jnp.int32(0))
    print(f"occ_gather_{n_rays}x{S}: {ms:.2f} ms", flush=True)


ALL = {
    "sort17": lambda: p_sort(14, 17),
    "sort15": lambda: p_sort(14, 15),
    "engine19": lambda: p_engine(19, 16384, 16384),
    "engine19_fwd": lambda: p_engine(19, 16384, 16384, fwd_only=True),
    "engine19_c8k": lambda: p_engine(19, 16384, 8192),
    "engine19_c4k": lambda: p_engine(19, 16384, 4096),
    "engine15": lambda: p_engine(15, 16384, 16384),
    "engine15_c4k": lambda: p_engine(15, 16384, 4096),
    "engine15_c2k": lambda: p_engine(15, 16384, 2048),
    "matmul15": lambda: p_matmul(15, 16384),
    "step15": lambda: p_step(15),
    "step19_lattice": lambda: p_step(19, 4096, engine="lattice"),
    "step19_lattice8k": lambda: p_step(19, 8192, engine="lattice"),
    "march": lambda: p_march(),
    "march8k": lambda: p_march(8192),
    "mlp": lambda: p_mlp(),
    "train19": lambda: p_train_step(19, 4096, engine="lattice"),
    "train19_noema": lambda: p_train_step(19, 4096, engine="lattice",
                                          ema=False),
    "march_ab": lambda: p_march_onehot(),
    "occ_gather": lambda: p_occ_gather(),
}


def main():
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:
            print(f"{n}: ERROR {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
