"""Conditional-BatchNorm decoder (capability slot).

The reference ships a latent-conditioned ResNet decoder family —
ConditionalBatchNorm1d / ConditionalResnetBlock1d /
DecoderConditionalBatchNorm / DisNetwork
(/root/reference/geometry/mlp.py:121-244) — which its MAIN pipeline never
instantiates (the seq stage conditions DeformMLP on fix_code instead,
ref hmsdf.py:659). Rebuilt here as a functional JAX module so the decoder
surface exists for users who wired it in: per-point latent codes modulate
normalized features with a conditional affine (gamma/beta from 1x1 convs,
zero-init so the block starts as identity, matching the reference's
nn.init choices at :132-136, :167).

BatchNorm note: the reference normalizes over (batch x points) per feature
in training mode; this functional version computes the same statistics from
the current call (the decoder is only ever used inside an optimization
step, where torch's momentum running stats are equally step-local).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Params = dict


def _linear_init(key, d_in, d_out, zero=False):
    if zero:
        w = jnp.zeros((d_in, d_out))
    else:
        bound = (1.0 / d_in) ** 0.5
        w = jax.random.uniform(key, (d_in, d_out), jnp.float32, -bound, bound)
    return {"w": w, "b": jnp.zeros((d_out,))}


class CondBNDecoder:
    """DecoderConditionalBatchNorm (+ DisNetwork wrapper semantics):
    apply(params, coords [B,N,Pin], codes [B,D] or [B,N,D]) -> [B,N,out]."""

    def __init__(self, input_dim: int = 3, latent_dim: int = 64,
                 hidden_dim: int = 128, num_hidden_layers: int = 4,
                 out_dim: int = 3):
        self.input_dim = input_dim
        self.latent_dim = latent_dim
        self.hidden_dim = hidden_dim
        self.num_blocks = num_hidden_layers
        self.out_dim = out_dim

    def _cbn_init(self, key):
        # gamma conv: zero weight, ONE bias; beta conv: zero weight+bias
        # (ref mlp.py:132-136) -> initially a plain normalize
        return {
            "gamma": {"w": jnp.zeros((self.latent_dim, self.hidden_dim)),
                      "b": jnp.ones((self.hidden_dim,))},
            "beta": {"w": jnp.zeros((self.latent_dim, self.hidden_dim)),
                     "b": jnp.zeros((self.hidden_dim,))},
        }

    def init(self, key) -> Params:
        ks = jax.random.split(key, 3 + 4 * self.num_blocks)
        blocks = []
        for i in range(self.num_blocks):
            k0, k1 = ks[3 + 4 * i], ks[4 + 4 * i]
            blocks.append({
                "bn0": self._cbn_init(None),
                "bn1": self._cbn_init(None),
                "fc0": _linear_init(k0, self.hidden_dim, self.hidden_dim),
                # fc1 zero-init: the residual starts as identity (ref :167)
                "fc1": _linear_init(k1, self.hidden_dim, self.hidden_dim,
                                    zero=True),
            })
        return {
            "fc_p": _linear_init(ks[0], self.input_dim, self.hidden_dim),
            "blocks": blocks,
            "bn": self._cbn_init(None),
            "fc_out": _linear_init(ks[1], self.hidden_dim, self.out_dim),
        }

    @staticmethod
    def _lin(p, x):
        return x @ p["w"] + p["b"]

    def _cbn(self, p, x, c, eps=1e-5):
        # normalize each feature over (batch x points), then conditional
        # affine per point (ref ConditionalBatchNorm1d.forward)
        mean = jnp.mean(x, axis=(0, 1), keepdims=True)
        var = jnp.var(x, axis=(0, 1), keepdims=True)
        net = (x - mean) * jax.lax.rsqrt(var + eps)
        gamma = self._lin(p["gamma"], c)
        beta = self._lin(p["beta"], c)
        return gamma * net + beta

    def apply(self, params: Params, coords: jnp.ndarray,
              codes: jnp.ndarray) -> jnp.ndarray:
        if codes.ndim == 2:
            codes = jnp.broadcast_to(
                codes[:, None, :], (*coords.shape[:2], codes.shape[-1]))
        net = self._lin(params["fc_p"], coords)
        for blk in params["blocks"]:
            h = self._lin(blk["fc0"],
                          jax.nn.relu(self._cbn(blk["bn0"], net, codes)))
            dx = self._lin(blk["fc1"],
                           jax.nn.relu(self._cbn(blk["bn1"], h, codes)))
            net = net + dx
        out = self._lin(params["fc_out"], self._cbn(params["bn"], net, codes))
        return out
