"""ResUNet image feature extractor (reference: nerf-ours/model.py:224).

A ResNet34-style encoder (7x7 s2 stem + BasicBlock stages [3,4,6] at
stride 2, InstanceNorm affine) with a 2-level U-Net decoder (bilinear
align-corners upsampling + skip concats) producing coarse(+fine)
feature maps at 1/4 input resolution.  The reference never calls it
from its training path (dead code imported by run_nerf.py:23 — an
IBRNet-style extractor); it is implemented here for component parity
and as the generalizable-NeRF feature hook.

TPU-native choices: NHWC layout (the MXU conv layout), functional
params pytree (jit/pjit/vmap friendly), reflect padding materialized
with jnp.pad + VALID convs, bf16-ready (pass compute_dtype), and
align_corners=True bilinear via an explicit gather interpolation
(jax.image.resize implements the align_corners=False convention).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ResUNetConfig(NamedTuple):
    coarse_out_ch: int = 32
    fine_out_ch: int = 32
    coarse_only: bool = False
    layers: tuple = (3, 4, 6)        # BasicBlocks per encoder stage
    filters: tuple = (64, 128, 256)  # stage widths (resnet18/34 family)

    @property
    def out_ch(self) -> int:
        return self.coarse_out_ch + (0 if self.coarse_only
                                     else self.fine_out_ch)


def _he(key, kh, kw, cin, cout):
    std = math.sqrt(2.0 / (kh * kw * cin))
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _conv_params(key, kh, kw, cin, cout, norm=True, bias=False):
    p = {"w": _he(key, kh, kw, cin, cout)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    if norm:
        p["g"] = jnp.ones((cout,), jnp.float32)
        p["beta"] = jnp.zeros((cout,), jnp.float32)
    return p


def _conv(x, p, stride=1, pad=0, dtype=None):
    """Reflect-padded NHWC conv (padding_mode='reflect' parity)."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
    w = p["w"].astype(dtype or x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _inorm(x, p, eps=1e-5):
    """InstanceNorm2d(affine, no running stats): per (sample, channel)
    moments over H, W — computed in f32 for bf16 activations."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["beta"]).astype(x.dtype)


def _block_init(key, cin, planes, stride):
    ks = jax.random.split(key, 3)
    p = {"c1": _conv_params(ks[0], 3, 3, cin, planes),
         "c2": _conv_params(ks[1], 3, 3, planes, planes)}
    if stride != 1 or cin != planes:
        p["down"] = _conv_params(ks[2], 1, 1, cin, planes)
    return p


def _block_apply(x, p, stride):
    idn = x
    y = jax.nn.relu(_inorm(_conv(x, p["c1"], stride, pad=1), p["c1"]))
    y = _inorm(_conv(y, p["c2"], 1, pad=1), p["c2"])
    if "down" in p:
        idn = _inorm(_conv(x, p["down"], stride, pad=0), p["down"])
    return jax.nn.relu(y + idn)


def _upsample2_ac(x):
    """x2 bilinear upsample with ALIGN_CORNERS=True semantics (the
    reference's F.interpolate(align_corners=True)): output i maps to
    input i * (H-1) / (2H-1)."""
    n, h, w, c = x.shape

    def axis_weights(size):
        out = 2 * size
        pos = jnp.arange(out, dtype=jnp.float32) * (size - 1) / (out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size - 2)
        t = pos - lo.astype(jnp.float32)
        return lo, t

    lo_h, t_h = axis_weights(h)
    lo_w, t_w = axis_weights(w)
    xh = (x[:, lo_h] * (1.0 - t_h)[None, :, None, None]
          + x[:, lo_h + 1] * t_h[None, :, None, None])
    out = (xh[:, :, lo_w] * (1.0 - t_w)[None, None, :, None]
           + xh[:, :, lo_w + 1] * t_w[None, None, :, None])
    # lerp in f32 (the weights), back to the compute dtype
    return out.astype(x.dtype)


def _skip(up, skip):
    """skipconnect (model.py:301-313): pad the SKIP tensor to the
    upsampled one's spatial size, concat [upsampled, skip].  The pad
    target and channel order match the reference exactly so a ported
    ResNet34/decoder checkpoint maps channel-for-channel."""
    dh = up.shape[1] - skip.shape[1]
    dw = up.shape[2] - skip.shape[2]
    skip = jnp.pad(skip, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
    return jnp.concatenate([up, skip], axis=-1)


def init_resunet(key, cfg: ResUNetConfig = ResUNetConfig()):
    f = cfg.filters
    ks = iter(jax.random.split(key, 8 + sum(cfg.layers)))
    params = {"stem": _conv_params(next(ks), 7, 7, 3, f[0])}
    cin = f[0]
    for si, (n_blocks, planes) in enumerate(zip(cfg.layers, f)):
        stage = []
        for bi in range(n_blocks):
            stage.append(_block_init(next(ks), cin, planes,
                                     stride=2 if bi == 0 else 1))
            cin = planes
        params[f"layer{si + 1}"] = stage
    params["upconv3"] = _conv_params(next(ks), 3, 3, f[2], 128)
    params["iconv3"] = _conv_params(next(ks), 3, 3, f[1] + 128, 128)
    params["upconv2"] = _conv_params(next(ks), 3, 3, 128, 64)
    params["iconv2"] = _conv_params(next(ks), 3, 3, f[0] + 64, cfg.out_ch)
    params["out"] = _conv_params(next(ks), 1, 1, cfg.out_ch, cfg.out_ch,
                                 norm=False, bias=True)
    return params


def apply_resunet(params, images, cfg: ResUNetConfig = ResUNetConfig(),
                  compute_dtype=jnp.float32):
    """images [N, H, W, 3] -> features [N, H/4, W/4, out_ch].

    With coarse_only=False the first coarse_out_ch channels are the
    coarse features and the last fine_out_ch the fine ones (the
    reference returns the packed tensor; split_features unpacks)."""
    x = images.astype(compute_dtype)
    x = jax.nn.relu(_inorm(_conv(x, params["stem"], 2, pad=3),
                           params["stem"]))
    skips = []
    for si in range(len(cfg.layers)):
        for bi, bp in enumerate(params[f"layer{si + 1}"]):
            x = _block_apply(x, bp, stride=2 if bi == 0 else 1)
        skips.append(x)
    x1, x2, x3 = skips

    def upconv(x, p):
        return jax.nn.elu(_inorm(_conv(_upsample2_ac(x), p, 1, pad=1), p))

    x = upconv(x3, params["upconv3"])
    x = _skip(x, x2)
    x = jax.nn.elu(_inorm(_conv(x, params["iconv3"], 1, pad=1),
                          params["iconv3"]))
    x = upconv(x, params["upconv2"])
    x = _skip(x, x1)
    x = jax.nn.elu(_inorm(_conv(x, params["iconv2"], 1, pad=1),
                          params["iconv2"]))
    return _conv(x, params["out"], 1, pad=0)


def split_features(feats, cfg: ResUNetConfig):
    """Packed [N,H,W,out_ch] -> (coarse, fine-or-None)."""
    if cfg.coarse_only:
        return feats, None
    return (feats[..., :cfg.coarse_out_ch],
            feats[..., -cfg.fine_out_ch:])
