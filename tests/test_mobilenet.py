"""MobileNetV2 feature-stack parity: JAX implementation + BN-folding
converter vs a torch oracle built to torchvision's published architecture
(ConvBNReLU / InvertedResidual, features[0..7] of mobilenet_v2 width 1.0).

This locks down (a) the _STAGES topology, (b) the converter's state-dict
addressing and BN folding, and (c) NHWC/HWIO layout transposes — so a real
torchvision checkpoint converted offline will load bit-compatibly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from d3human_tpu.models.mobilenet import TAPS, MobileNetFeatures  # noqa: E402
from scripts.convert_mobilenet import convert  # noqa: E402


class ConvBNReLU(nn.Sequential):
    def __init__(self, c_in, c_out, k=3, stride=1, groups=1):
        super().__init__(
            nn.Conv2d(c_in, c_out, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(c_out),
            nn.ReLU6(inplace=True),
        )


class InvertedResidual(nn.Module):
    def __init__(self, c_in, c_out, stride, expand_ratio):
        super().__init__()
        hidden = int(round(c_in * expand_ratio))
        self.use_res = stride == 1 and c_in == c_out
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU(c_in, hidden, k=1))
        layers.extend([
            ConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
            nn.Conv2d(hidden, c_out, 1, 1, 0, bias=False),
            nn.BatchNorm2d(c_out),
        ])
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


def build_torch_features():
    """features[0..7] of torchvision mobilenet_v2 (width 1.0)."""
    feats = nn.Sequential(
        ConvBNReLU(3, 32, stride=2),
        InvertedResidual(32, 16, 1, 1),
        InvertedResidual(16, 24, 2, 6),
        InvertedResidual(24, 24, 1, 6),
        InvertedResidual(24, 32, 2, 6),
        InvertedResidual(32, 32, 1, 6),
        InvertedResidual(32, 32, 1, 6),
        InvertedResidual(32, 64, 2, 6),
    )
    # randomize BN stats so folding is actually exercised
    g = torch.Generator().manual_seed(0)
    for m in feats.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.3
            m.running_var = torch.rand(m.num_features, generator=g) + 0.3
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
        elif isinstance(m, nn.Conv2d):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.1)
    return feats.eval()


def test_converter_matches_torch_oracle():
    feats = build_torch_features()
    # rename to torchvision's state_dict addressing: features.N....
    state = {f"features.{k}": v for k, v in feats.state_dict().items()}

    params = {k: jnp.asarray(v) for k, v in convert(state).items()}
    mobile = MobileNetFeatures()

    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        taps_torch = []
        h = x
        for i, layer in enumerate(feats):
            h = layer(h)
            if i in TAPS:
                taps_torch.append(h.permute(0, 2, 3, 1).numpy())

    taps_jax = mobile.features(params, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy()))

    assert len(taps_jax) == 3
    for t_ref, t_jax in zip(taps_torch, taps_jax):
        assert t_jax.shape == t_ref.shape
        np.testing.assert_allclose(np.asarray(t_jax), t_ref,
                                   rtol=2e-4, atol=2e-4)


def test_random_fallback_loss_properties():
    mobile = MobileNetFeatures()
    params = mobile.init(npz_path=None)   # no npz shipped in this image
    a = jnp.zeros((1, 64, 64, 3))
    b = jnp.ones((1, 64, 64, 3)) * 0.5
    assert float(mobile.loss(params, a, a)) == 0.0
    assert float(mobile.loss(params, a, b)) > 0.0
    # tap strides /4, /8, /16
    taps = mobile.features(params, a)
    assert [t.shape[1] for t in taps] == [16, 8, 4]
