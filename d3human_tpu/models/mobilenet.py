"""MobileNetV2 feature extractor (stages 0-7) for the perceptual loss.

The reference's dominant loss terms run normal maps through pretrained
torchvision ``mobilenet_v2(pretrained=True).features`` and take an L1 in
feature space at layer indices [2, 4, 7]
(/root/reference/geometry/hmsdf.py:137-159; applied at :901 init x50,
:1073 split x5 on 448-crops, :1157 seq x20).

This is a from-scratch JAX implementation of exactly the slice of the
architecture those taps need (features[0..7] of the width-1.0 model), NHWC
and MXU-friendly. BatchNorm is *folded into conv weights at conversion
time* (the reference runs the net frozen in eval mode, so BN is an affine
transform), which leaves the runtime graph as pure conv+ReLU6 — XLA fuses
the whole stack.

Pretrained weights: ``scripts/convert_mobilenet.py`` converts a torchvision
``mobilenet_v2`` state_dict (.pth) into the npz this module loads — run it
wherever torch + the checkpoint are available and ship
``data/mobilenet_v2_features.npz``. Without the npz, ``init`` falls back to
deterministic He-init filters with the same topology; the A/B study in
``scripts/ab_perceptual.py`` measures what that substitution does to
convergence on synthetic captures.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

# (kind, stride, expand_ratio, c_in, c_out) for torchvision features[0..7].
# kind: 'conv' = ConvBNReLU 3x3, 'ir' = InvertedResidual.
_STAGES: Tuple[Tuple[str, int, int, int, int], ...] = (
    ("conv", 2, 0, 3, 32),     # features[0]
    ("ir", 1, 1, 32, 16),      # features[1]
    ("ir", 2, 6, 16, 24),      # features[2]  <- tap
    ("ir", 1, 6, 24, 24),      # features[3]  (residual)
    ("ir", 2, 6, 24, 32),      # features[4]  <- tap
    ("ir", 1, 6, 32, 32),      # features[5]  (residual)
    ("ir", 1, 6, 32, 32),      # features[6]  (residual)
    ("ir", 2, 6, 32, 64),      # features[7]  <- tap
)
TAPS = (2, 4, 7)


def _conv2d(x, w, b, stride, groups=1):
    # torch-style explicit padding (k-1)//2 on both sides — NOT XLA "SAME",
    # which pads asymmetrically at stride 2 and would shift every stride-2
    # feature map half a pixel off the torchvision checkpoint's expectation
    k = w.shape[0]
    p = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return out + b


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _stage_convs(kind: str, expand: int, c_in: int, c_out: int):
    """Conv shapes for one stage, in execution order.

    Each entry: (name, kh, kw, in_per_group, out, groups).
    Depthwise convs use HWIO with I=1 and groups=C (XLA convention)."""
    if kind == "conv":
        return [("conv", 3, 3, c_in, c_out, 1)]
    hidden = c_in * expand
    convs = []
    if expand != 1:
        convs.append(("expand", 1, 1, c_in, hidden, 1))
    convs.append(("dw", 3, 3, 1, hidden, hidden))
    convs.append(("project", 1, 1, hidden, c_out, 1))
    return convs


class MobileNetFeatures:
    """features[0..7] of MobileNetV2; ``features()`` returns taps [2,4,7]."""

    def __init__(self, seed: int = 3):
        self.seed = seed

    def init(self, npz_path: Optional[str] = None) -> Params:
        if npz_path and os.path.exists(npz_path):
            z = np.load(npz_path)
            return {k: jnp.asarray(z[k]) for k in z.files}
        if npz_path:
            # a named-but-missing npz is almost always a typo'd path; random
            # features converge measurably differently (PERCEPTUAL_AB.json)
            print(f"[mobilenet] WARNING: weights npz '{npz_path}' not found "
                  f"— falling back to deterministic He-init (random) "
                  f"features", flush=True)
        # deterministic He-init fallback (documented stand-in; see module
        # docstring + scripts/ab_perceptual.py)
        key = jax.random.PRNGKey(self.seed)
        params = {}
        for si, (kind, _s, expand, c_in, c_out) in enumerate(_STAGES):
            for (nm, kh, kw, ipg, out, _g) in _stage_convs(
                    kind, expand, c_in, c_out):
                key, kw_ = jax.random.split(key)
                fan_in = kh * kw * ipg
                w = jax.random.normal(kw_, (kh, kw, ipg, out)) * np.sqrt(
                    2.0 / fan_in)
                params[f"s{si}_{nm}_w"] = w
                params[f"s{si}_{nm}_b"] = jnp.zeros((out,))
        return params

    def features(self, params: Params, img: jnp.ndarray) -> List[jnp.ndarray]:
        """img: [N, H, W, 3] -> feature maps at taps [2, 4, 7].

        Input convention matches the reference call sites: the normal images
        are fed as-is (the reference applies NO ImageNet normalization,
        hmsdf.py:895-901)."""
        x = img
        feats = []
        for si, (kind, stride, expand, c_in, c_out) in enumerate(_STAGES):
            if kind == "conv":
                x = _relu6(_conv2d(x, params[f"s{si}_conv_w"],
                                   params[f"s{si}_conv_b"], stride))
            else:
                h = x
                if expand != 1:
                    h = _relu6(_conv2d(h, params[f"s{si}_expand_w"],
                                       params[f"s{si}_expand_b"], 1))
                hidden = h.shape[-1]
                h = _relu6(_conv2d(h, params[f"s{si}_dw_w"],
                                   params[f"s{si}_dw_b"], stride,
                                   groups=hidden))
                h = _conv2d(h, params[f"s{si}_project_w"],
                            params[f"s{si}_project_b"], 1)
                x = x + h if (stride == 1 and c_in == c_out) else h
            if si in TAPS:
                feats.append(x)
        return feats

    def loss(self, params: Params, x: jnp.ndarray, y: jnp.ndarray):
        """Mean L1 over the 3 taps / 3 (ref hmsdf.py:151-159)."""
        fx = self.features(params, x)
        fy = self.features(params, y)
        losses = [jnp.mean(jnp.abs(a - b)) for a, b in zip(fx, fy)]
        return sum(losses) / len(losses)
