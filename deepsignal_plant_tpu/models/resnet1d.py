"""1-D ResNet signal encoder.

Parity target: the reference ships BasicBlock / ResNet_3layers / ResNet3
(deepsignal_plant/models.py:29-95) but leaves them disconnected (the
signal-branch conv stack is commented out, models.py:148,208-210). The
same architecture is implemented functionally here — like the reference it
is NOT wired into ModelBiLSTM's forward; it is available as a standalone,
tested building block (``resnet3(x, params, train)``) for future signal
encoders.

Layout: inputs (B, C, L) channel-major like torch Conv1d. Weights convert
1:1 from the torch modules (models/convert.py handles Linear/LSTM; conv
weights here use torch's (out, in, k) layout transposed at load).
BatchNorm keeps running statistics in the parameter pytree; training mode
normalizes with batch statistics and returns updated running stats.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


def init_conv1d(key, in_ch: int, out_ch: int, ksize: int,
                dtype=jnp.float32) -> Params:
    """torch Conv1d default (kaiming-uniform, a=sqrt(5)):
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)), no bias (reference uses bias=False).
    Weight layout (out, in, k) = torch's."""
    fan_in = in_ch * ksize
    k = 1.0 / math.sqrt(fan_in)
    return {"w": jax.random.uniform(key, (out_ch, in_ch, ksize), dtype,
                                    -k, k)}


def init_bn(out_ch: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones(out_ch, dtype), "bias": jnp.zeros(out_ch, dtype),
            "mean": jnp.zeros(out_ch, dtype), "var": jnp.ones(out_ch, dtype)}


def conv1d(x: jax.Array, w: jax.Array, stride: int = 1,
           padding: int = 0) -> jax.Array:
    """x (B, C, L) conv with torch-layout weight (O, I, K)."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"))


def batchnorm(x: jax.Array, bn: Params, train: bool, eps: float = 1e-5,
              momentum: float = 0.1) -> tuple[jax.Array, Params]:
    """BatchNorm1d over (B, C, L); returns (y, updated_bn)."""
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_bn = {**bn,
                  "mean": (1 - momentum) * bn["mean"] + momentum * mean,
                  "var": (1 - momentum) * bn["var"] + momentum * unbiased}
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    inv = lax.rsqrt(var + eps)
    y = (x - mean[None, :, None]) * (inv * bn["scale"])[None, :, None] \
        + bn["bias"][None, :, None]
    return y, new_bn


def init_basic_block(key, in_planes: int, planes: int, stride: int,
                     dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "conv1": init_conv1d(k1, in_planes, planes, 3, dtype),
        "bn1": init_bn(planes, dtype),
        "conv2": init_conv1d(k2, planes, planes, 3, dtype),
        "bn2": init_bn(planes, dtype),
        "stride": stride,
    }
    if stride != 1 or in_planes != planes:
        p["shortcut_conv"] = init_conv1d(k3, in_planes, planes, 1, dtype)
        p["shortcut_bn"] = init_bn(planes, dtype)
    return p


def basic_block(x: jax.Array, p: Params, train: bool
                ) -> tuple[jax.Array, Params]:
    """Pre-activationless residual block (reference BasicBlock,
    models.py:29-52)."""
    out, bn1 = batchnorm(conv1d(x, p["conv1"]["w"], p["stride"], 1),
                         p["bn1"], train)
    out = jax.nn.relu(out)
    out, bn2 = batchnorm(conv1d(out, p["conv2"]["w"], 1, 1), p["bn2"], train)
    new_p = {**p, "bn1": bn1, "bn2": bn2}
    if "shortcut_conv" in p:
        sc, bns = batchnorm(conv1d(x, p["shortcut_conv"]["w"], p["stride"],
                                   0), p["shortcut_bn"], train)
        new_p["shortcut_bn"] = bns
    else:
        sc = x
    return jax.nn.relu(out + sc), new_p


def init_resnet3(key, out_channels: int = 128, strides=(1, 2, 2),
                 init_channels: int = 1, in_planes: int = 4,
                 dtype=jnp.float32) -> Params:
    """ResNet3 = conv stem + 3 groups of one BasicBlock each
    (reference ResNet_3layers/ResNet3, models.py:55-95)."""
    keys = jax.random.split(key, 8)
    planes_per_group = (16, 64, out_channels)
    p: Params = {
        "conv1": init_conv1d(keys[0], init_channels, in_planes, 3, dtype),
        "bn1": init_bn(in_planes, dtype),
        "layers": [],
    }
    cur = in_planes
    for gi, (planes, stride) in enumerate(zip(planes_per_group, strides)):
        p["layers"].append(init_basic_block(keys[1 + gi], cur, planes,
                                            stride, dtype))
        cur = planes
    return p


def resnet3(x: jax.Array, p: Params, train: bool = False
            ) -> tuple[jax.Array, Params]:
    """x (B, C_init, L) -> (B, out_channels, L_out); returns updated params
    (BN running stats) alongside."""
    out, bn1 = batchnorm(conv1d(x, p["conv1"]["w"], 1, 1), p["bn1"], train)
    out = jax.nn.relu(out)
    new_layers = []
    for blk in p["layers"]:
        out, nblk = basic_block(out, blk, train)
        new_layers.append(nblk)
    return out, {**p, "bn1": bn1, "layers": new_layers}


def get_lout(lin: int, strides) -> int:
    """Output length after strided convs (reference get_lout,
    models.py:85-90)."""
    lout = lin
    for s in strides:
        lout = math.floor(float(lout - 1) / s + 1)
    return lout


def convert_torch_resnet3(sd: dict, prefix: str = "") -> Params:
    """torch ResNet3 state_dict -> our pytree (same tensor layouts)."""
    import numpy as np

    def a(name):
        t = sd[prefix + name]
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    def bn(name):
        return {"scale": a(f"{name}.weight"), "bias": a(f"{name}.bias"),
                "mean": a(f"{name}.running_mean"),
                "var": a(f"{name}.running_var")}

    p: Params = {"conv1": {"w": a("conv1.weight")}, "bn1": bn("bn1"),
                 "layers": []}
    for gi in range(1, 4):
        base = f"layer{gi}.0"
        blk: Params = {
            "conv1": {"w": a(f"{base}.conv1.weight")},
            "bn1": bn(f"{base}.bn1"),
            "conv2": {"w": a(f"{base}.conv2.weight")},
            "bn2": bn(f"{base}.bn2"),
            # stride per reference ResNet3 defaults (1, 2, 2)
            "stride": 1 if gi == 1 else 2,
        }
        if f"{base}.shortcut.0.weight" in {k[len(prefix):] for k in sd}:
            blk["shortcut_conv"] = {"w": a(f"{base}.shortcut.0.weight")}
            blk["shortcut_bn"] = bn(f"{base}.shortcut.1")
        p["layers"].append(blk)
    return p
