"""Policy/value network zoo (flax.linen).

Re-creates the reference architectures (``algorithms/algo_utils/network.py``)
TPU-first: NCDHW→NDHWC layouts for conv (XLA-preferred), orthogonal init with
the stable-baselines gain schedule (√2 hidden, 0.01 policy head, 1 value
head, ``network.py:43-51``), and the same topologies:

* ``MLP`` — hid_dim list, activation from config (``network.py:27-54``);
* ``Conv3DNet`` — 3 strided 3D convs [16,32,32]/k[5,3,3]/s[3,3,2] on the 50³
  TSDF + proprio-concat MLP head (``network.py:67-94``);
* ``PoolConv3DNet`` — [16,32,64]/s2 + 4³ max-pool head (``network.py:97-117``);
* ``PointNet`` — per-point MLP 128-256-512, max(+mean) pool, sub-mean option
  (``network.py:141-198``);
* ``ResNet34`` / ``depthResNet`` — ResNet-34 on 72×128 RGB/depth
  (``network.py:202-270``; ours trains from scratch — no torchvision
  pretrained weights on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_activation(name: str) -> Callable:
    return {
        "elu": nn.elu, "selu": nn.selu, "relu": nn.relu, "crelu": nn.relu,
        "lrelu": nn.leaky_relu, "tanh": nn.tanh, "sigmoid": nn.sigmoid,
    }[name]


def _dense(features, gain, dtype=None):
    return nn.Dense(features, kernel_init=nn.initializers.orthogonal(gain),
                    bias_init=nn.initializers.zeros, dtype=dtype)


def _compute_dtype(net_cfg: dict, default: str = "bf16"):
    """MXU compute dtype for the dense stack.  ``bf16`` (default for MLP)
    runs the matmuls on the bf16 systolic path (~4× the f32 matmul rate on
    v5e) while parameters/optimizer state stay f32 — grads are computed
    against the f32 params, only the contraction is low-precision.
    ``--algo.model.network.dtype f32`` restores exact f32 numerics."""
    v = net_cfg.get("dtype", default)
    table = {"bf16": jnp.bfloat16, "f32": None}
    if v not in table:
        raise ValueError(f"network.dtype must be one of {sorted(table)}, "
                         f"got {v!r}")
    return table[v]


class MLP(nn.Module):
    output_dim: int
    net_cfg: dict
    proprio_shape: int = 0

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.net_cfg["activation"])
        hid = self.net_cfg["hid_dim"]
        dtype = _compute_dtype(self.net_cfg)
        for h in hid:
            x = act(_dense(h, jnp.sqrt(2.0), dtype)(x))
        gain = 1.0 if self.output_dim == 1 else 0.01
        # heads read in f32 downstream (log-prob/KL/value math)
        return _dense(self.output_dim, gain, dtype)(x).astype(jnp.float32)


class Conv3DNet(nn.Module):
    """TSDF 50³ → 3 strided convs → [3,3,3,32] → concat proprio → MLP."""

    output_dim: int
    net_cfg: dict
    proprio_shape: int = 0

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.net_cfg["activation"])
        b = x.shape[0]
        if self.proprio_shape:
            proprio = x[:, -self.proprio_shape:]
            vol = x[:, :-self.proprio_shape]
        else:
            proprio = None
            vol = x
        res = round(vol.shape[-1] ** (1 / 3))
        # NDHWC: channels-last is the XLA-native conv layout
        v = vol.reshape(b, res, res, res, 1)
        for f, k, s in [(16, 5, 3), (32, 3, 3), (32, 3, 2)]:
            v = act(nn.Conv(f, (k, k, k), strides=(s, s, s), padding=k // 2)(v))
        v = v.reshape(b, -1)
        if proprio is not None:
            v = jnp.concatenate([v, proprio], axis=-1)
        v = act(_dense(256, jnp.sqrt(2.0))(v))
        return _dense(self.output_dim, 1.0 if self.output_dim == 1 else 0.01)(v)


class PoolConv3DNet(nn.Module):
    output_dim: int
    net_cfg: dict
    proprio_shape: int = 0

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.net_cfg["activation"])
        b = x.shape[0]
        res = round(x.shape[-1] ** (1 / 3))
        v = x.reshape(b, res, res, res, 1)
        for f, k, s in [(16, 5, 2), (32, 3, 2), (64, 3, 2)]:
            v = act(nn.Conv(f, (k, k, k), strides=(s, s, s), padding=k // 2)(v))
        v = nn.max_pool(v, (4, 4, 4), strides=(4, 4, 4))
        v = v.reshape(b, -1)
        v = act(_dense(32, jnp.sqrt(2.0))(v))
        return _dense(self.output_dim, 1.0 if self.output_dim == 1 else 0.01)(v)


class PointNet(nn.Module):
    """[B, 1024·k(+proprio)] point clouds → shared MLP → max(/mean) pool."""

    output_dim: int
    net_cfg: dict
    proprio_shape: int = 0
    point_num: int = 1024

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.net_cfg["activation"])
        max_mean = self.net_cfg.get("max_mean", False)
        sub_mean = self.net_cfg.get("sub_mean", False)
        b = x.shape[0]
        if self.proprio_shape:
            proprio = x[:, -self.proprio_shape:]
            pc = x[:, :-self.proprio_shape].reshape(b, self.point_num, -1)
        else:
            proprio = None
            pc = x.reshape(b, self.point_num, -1)
        if sub_mean:
            centered = pc[..., :3] - pc[..., :3].mean(axis=1, keepdims=True)
            pc = jnp.concatenate([centered, pc[..., 3:]], axis=-1)
        h = pc
        for f in (128, 256, 512):
            h = _dense(f, jnp.sqrt(2.0))(h)
            if f != 512:
                h = act(h)
        if max_mean:
            h = jnp.concatenate([h.max(axis=1), h.mean(axis=1)], axis=-1)
        else:
            h = h.max(axis=1)
        if proprio is not None:
            h = jnp.concatenate([h, proprio], axis=-1)
        h = act(_dense(128, jnp.sqrt(2.0))(h))
        h = act(_dense(32, jnp.sqrt(2.0))(h))
        return _dense(self.output_dim, 1.0 if self.output_dim == 1 else 0.01)(h)


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if x.shape[-1] != self.features or self.strides != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x + y)


class ResNet34Backbone(nn.Module):
    in_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for features, blocks, stride in [(64, 3, 1), (128, 4, 2),
                                         (256, 6, 2), (512, 3, 2)]:
            for i in range(blocks):
                x = _BasicBlock(features, stride if i == 0 else 1)(x, train)
        return x.mean(axis=(1, 2))  # global average pool → [B, 512]


class ResNet(nn.Module):
    """RGB 72×128 student backbone (≙ ``network.py:202-234``)."""

    output_dim: int
    net_cfg: dict
    proprio_shape: int = 0
    in_channels: int = 3
    h: int = 72
    w: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.net_cfg["activation"])
        b = x.shape[0]
        if self.proprio_shape:
            proprio = x[:, -self.proprio_shape:]
            img = x[:, :-self.proprio_shape]
        else:
            proprio = None
            img = x
        img = img.reshape(b, self.in_channels, self.h, self.w)
        img = jnp.transpose(img, (0, 2, 3, 1))  # NHWC for XLA
        f = ResNet34Backbone(self.in_channels)(img, train)
        if proprio is not None:
            f = jnp.concatenate([f, proprio], axis=-1)
        f = act(_dense(128, jnp.sqrt(2.0))(f))
        f = act(_dense(32, jnp.sqrt(2.0))(f))
        return _dense(self.output_dim, 1.0 if self.output_dim == 1 else 0.01)(f)


class depthResNet(ResNet):
    in_channels: int = 1


def load_resnet34_pretrained(variables, npz_path: str):
    """Graft converted ImageNet ResNet-34 weights (tools/resnet_convert.py)
    into an initialized ResNet/depthResNet variables dict
    (≙ ``torchvision.models.resnet34(pretrained=True)``,
    ``algorithms/algo_utils/network.py:207``).

    For 1-channel (depth) stems the pretrained RGB stem kernel is summed
    over its input-channel axis — the standard grayscale adaptation.
    Returns a new variables dict; the MLP head keeps its fresh init.
    """
    import numpy as np

    flat = dict(np.load(npz_path))
    nested: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = nested
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v

    import jax

    def graft(tree, loaded):
        out = dict(tree)
        for k, v in loaded.items():
            if isinstance(v, dict):
                out[k] = graft(tree[k], v)
            else:
                cur = tree[k]
                v = jnp.asarray(v, cur.dtype)
                if v.shape != cur.shape:
                    # depth stem: [7,7,3,64] → [7,7,1,64] via channel sum
                    assert (v.ndim == 4 and cur.shape[2] == 1
                            and v.shape[2] == 3), (k, v.shape, cur.shape)
                    v = v.sum(axis=2, keepdims=True)
                out[k] = v
        return out

    new_vars = dict(variables)
    for col in ("params", "batch_stats"):
        scope = dict(new_vars[col])
        key = next(k for k in scope if k.startswith("ResNet34Backbone"))
        scope[key] = graft(
            scope[key], {"params": nested["params"],
                         "batch_stats": nested["batch_stats"]}[col])
        new_vars[col] = scope
    return jax.tree.map(jnp.asarray, new_vars)


NETWORKS = {
    "MLP": MLP,
    "Conv3DNet": Conv3DNet,
    "PoolConv3DNet": PoolConv3DNet,
    "PointNet": PointNet,
    "ResNet": ResNet,
    "depthResNet": depthResNet,
}


def make_network(name: str, output_dim: int, net_cfg: dict,
                 proprio_shape: int = 0) -> nn.Module:
    """≙ the reference's ``eval(net_cfg['name'])`` dispatch
    (``actor_critic.py:16-19``) without the eval()."""
    return NETWORKS[name](output_dim=output_dim, net_cfg=net_cfg,
                          proprio_shape=proprio_shape)
