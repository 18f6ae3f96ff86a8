"""Convert a torchvision ``mobilenet_v2`` checkpoint into the npz consumed
by d3human_tpu.models.mobilenet.MobileNetFeatures.

Run wherever torch + the checkpoint file are available (this image has no
network egress and no cached checkpoint, so the conversion happens offline):

    python scripts/convert_mobilenet.py mobilenet_v2-b0353104.pth \
        d3human_tpu/data/mobilenet_v2_features.npz

Only features[0..7] are needed (the perceptual taps are [2,4,7], ref
/root/reference/geometry/hmsdf.py:137-159). BatchNorm is folded into the
conv weights (eval-mode affine), matching the frozen reference usage.

State-dict layout (torchvision):
  features.0.{0,1}                        ConvBNReLU
  features.N.conv.0.{0,1}                 pw expand ConvBNReLU (t!=1)
  features.N.conv.<i>.{0,1}               dw ConvBNReLU
  features.N.conv.<i+1>, features.N.conv.<i+2>   pw-linear conv, BN
"""

import sys

import numpy as np


def _fold_bn(w_oihw, gamma, beta, mean, var, eps=1e-5):
    """Fold eval-mode BN into conv: returns (w_oihw', bias)."""
    scale = gamma / np.sqrt(var + eps)
    return w_oihw * scale[:, None, None, None], beta - mean * scale


def _to_hwio(w_oihw):
    return np.transpose(w_oihw, (2, 3, 1, 0))


def _dw_to_hwio(w_oihw):
    # torch depthwise: [C, 1, H, W] -> XLA grouped HWIO: [H, W, 1, C]
    return np.transpose(w_oihw, (2, 3, 1, 0))


def convert(state: dict) -> dict:
    g = lambda k: state[f"{k}.weight"].detach().cpu().numpy()  # noqa: E731

    def bn(k):
        return tuple(state[f"{k}.{p}"].detach().cpu().numpy()
                     for p in ("weight", "bias", "running_mean",
                               "running_var"))

    out = {}

    def emit(si, nm, conv_key, bn_key, depthwise=False):
        w, b = _fold_bn(g(conv_key), *bn(bn_key))
        out[f"s{si}_{nm}_w"] = (_dw_to_hwio(w) if depthwise
                                else _to_hwio(w)).astype(np.float32)
        out[f"s{si}_{nm}_b"] = b.astype(np.float32)

    emit(0, "conv", "features.0.0", "features.0.1")
    # features[1]: t=1 -> conv.0 = dw ConvBNReLU, conv.1/2 = pw-linear + BN
    emit(1, "dw", "features.1.conv.0.0", "features.1.conv.0.1",
         depthwise=True)
    emit(1, "project", "features.1.conv.1", "features.1.conv.2")
    for si in range(2, 8):
        emit(si, "expand", f"features.{si}.conv.0.0",
             f"features.{si}.conv.0.1")
        emit(si, "dw", f"features.{si}.conv.1.0", f"features.{si}.conv.1.1",
             depthwise=True)
        emit(si, "project", f"features.{si}.conv.2", f"features.{si}.conv.3")
    return out


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    state = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    np.savez(dst, **convert(state))
    print(f"wrote {dst} ({len(convert(state))} arrays)")


if __name__ == "__main__":
    main()
