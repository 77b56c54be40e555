"""tools/resnet_convert.py + networks.load_resnet34_pretrained round-trip.

No torchvision in this environment, so a synthetic torchvision-layout
resnet34 state_dict (correct keys/shapes, random values) stands in for the
real ImageNet file; the real flow is identical
(≙ ``torchvision.models.resnet34(pretrained=True)``, reference
``algorithms/algo_utils/network.py:207``).
"""

import sys
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from resnet_convert import convert_state_dict, _flatten, _STAGES  # noqa: E402


def synth_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".bias"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".running_mean"] = rng.randn(c).astype(np.float32)
        sd[prefix + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    bn("bn1", 64)
    cin = 64
    for stage, (cout, blocks) in enumerate(_STAGES, start=1):
        for i in range(blocks):
            pre = f"layer{stage}.{i}"
            c0 = cin if i == 0 else cout
            sd[pre + ".conv1.weight"] = (
                rng.randn(cout, c0, 3, 3).astype(np.float32) * 0.05)
            bn(pre + ".bn1", cout)
            sd[pre + ".conv2.weight"] = (
                rng.randn(cout, cout, 3, 3).astype(np.float32) * 0.05)
            bn(pre + ".bn2", cout)
            if i == 0 and stage > 1:
                sd[pre + ".downsample.0.weight"] = (
                    rng.randn(cout, c0, 1, 1).astype(np.float32) * 0.05)
                bn(pre + ".downsample.1", cout)
        cin = cout
    return sd


@pytest.fixture(scope="module")
def npz_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("rn") / "rn34.npz"
    flat = dict(_flatten(convert_state_dict(synth_state_dict())))
    np.savez(p, **flat)
    return str(p)


def test_graft_shapes_and_values(npz_path):
    from partmanip_tpu.models.networks import (ResNet,
                                               load_resnet34_pretrained)
    net = ResNet(output_dim=4, net_cfg={"activation": "elu"}, h=24, w=32)
    v0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3 * 24 * 32)))
    v1 = load_resnet34_pretrained(v0, npz_path)
    sd = synth_state_dict()
    bb = v1["params"]["ResNet34Backbone_0"]
    # stem kernel transposed OIHW→HWIO
    np.testing.assert_allclose(
        np.asarray(bb["Conv_0"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), rtol=1e-6)
    # a downsample BN running stat lands in batch_stats of block 3 (stage 2)
    bs = v1["batch_stats"]["ResNet34Backbone_0"]["_BasicBlock_3"]
    np.testing.assert_allclose(
        np.asarray(bs["BatchNorm_2"]["mean"]),
        sd["layer2.0.downsample.1.running_mean"], rtol=1e-6)
    # head stays freshly initialized
    assert np.allclose(np.asarray(v1["params"]["Dense_0"]["kernel"]),
                       np.asarray(v0["params"]["Dense_0"]["kernel"]))
    # forward pass runs with the grafted weights
    out = net.apply(v1, jnp.ones((2, 3 * 24 * 32)))
    assert out.shape == (2, 4) and np.isfinite(np.asarray(out)).all()


def test_depth_stem_channel_sum(npz_path):
    from partmanip_tpu.models.networks import (depthResNet,
                                               load_resnet34_pretrained)
    net = depthResNet(output_dim=2, net_cfg={"activation": "elu"},
                      h=24, w=32)
    v0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 24 * 32)))
    v1 = load_resnet34_pretrained(v0, npz_path)
    sd = synth_state_dict()
    got = np.asarray(v1["params"]["ResNet34Backbone_0"]["Conv_0"]["kernel"])
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0)).sum(
        axis=2, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)
