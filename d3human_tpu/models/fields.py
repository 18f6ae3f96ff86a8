"""Neural field modules: positional encoding + Softplus MLPs.

Functional JAX re-design of the reference field MLPs
(/root/reference/geometry/embedding.py:4-38, /root/reference/geometry/mlp.py:9-118):

  * ``posenc``            — NeRF-style (x, sin 2^k x, cos 2^k x) embedding.
  * ``MLP``               — SDF field: PE(3, n_freq) -> d_hidden x n_hidden with
                            skip connections, Softplus(beta=100) activations.
  * ``DeformMLP``         — pose-conditioned nonrigid offset field: PE + 136-d
                            pose code concatenated at the input.

Everything is a pure function over a params pytree; matmuls run on the MXU
with fp32 accumulation. An optional bfloat16 fast path keeps the first/last
layers in fp32 (SDF signs near zero decide mesh topology, so the output layer
stays full precision).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = dict


def posenc(x: jnp.ndarray, n_freq: int) -> jnp.ndarray:
    """(x, sin(2^k x), cos(2^k x), ...) for k in [0, n_freq).

    Matches /root/reference/geometry/embedding.py:21-38 (input included,
    logscale frequencies). Output channels = C * (2*n_freq + 1).
    """
    if n_freq == 0:
        return x
    freqs = jnp.asarray([2.0 ** k for k in range(n_freq)], dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]                  # [..., n_freq, C]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    enc = jnp.stack([sin, cos], axis=-2)                    # [..., n_freq, 2, C]
    enc = enc.reshape(*x.shape[:-1], 2 * n_freq * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)


def posenc_dim(in_channels: int, n_freq: int) -> int:
    return in_channels * (2 * n_freq + 1)


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100 (ref mlp.py:15). softplus(100x)/100, stable."""
    return jax.nn.softplus(100.0 * x) * 0.01


def _linear_init(key, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    """PyTorch nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def _apply_linear(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if compute_dtype is not None and w.dtype != compute_dtype:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


class MLP:
    """Softplus MLP over positional-encoded 3D points (ref mlp.py:9-45).

    Layer layout matches the reference exactly: input layer, n_hidden hidden
    layers (layer i gets a [h, PE] concat input when i in skip_in), output
    layer. All activations Softplus(beta=100); no output activation.
    """

    def __init__(self, n_freq=6, d_hidden=256, d_out=1, n_hidden=6,
                 skip_in: Sequence[int] = (3,), use_bfloat16=False,
                 d_extra_in: int = 0):
        self.n_freq = n_freq
        self.d_hidden = d_hidden
        self.d_out = d_out
        self.n_hidden = n_hidden
        self.skip_in = tuple(skip_in)
        self.use_bfloat16 = use_bfloat16
        self.d_extra_in = d_extra_in  # extra channels concatenated at input
        self.d_emb = posenc_dim(3, n_freq)

    def init(self, key) -> Params:
        keys = jax.random.split(key, self.n_hidden + 2)
        layers = [_linear_init(keys[0], self.d_emb + self.d_extra_in, self.d_hidden)]
        for i in range(self.n_hidden):
            d_in = self.d_hidden + (self.d_emb if i in self.skip_in else 0)
            layers.append(_linear_init(keys[i + 1], d_in, self.d_hidden))
        layers.append(_linear_init(keys[-1], self.d_hidden, self.d_out))
        return {"layers": layers}

    def apply(self, params: Params, x: jnp.ndarray,
              extra: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: [..., 3] points; extra: [..., d_extra_in] (e.g. pose code)."""
        emb = posenc(x, self.n_freq)
        h = emb if extra is None else jnp.concatenate([extra, emb], axis=-1)
        layers = params["layers"]
        cdt = jnp.bfloat16 if self.use_bfloat16 else None
        h = softplus100(_apply_linear(layers[0], h, cdt))
        for i in range(self.n_hidden):
            if i in self.skip_in:
                h = jnp.concatenate([h, emb.astype(h.dtype)], axis=-1)
            h = softplus100(_apply_linear(layers[i + 1], h, cdt))
        # Output layer always fp32 (SDF signs decide topology).
        return _apply_linear(layers[-1], h.astype(jnp.float32))


class DeformMLP(MLP):
    """Pose-conditioned offset field (ref mlp.py:77-118).

    forward(x, pose_code): concat([pose_code, PE(x)]) -> MLP -> d_out.
    The pose code (136-d, ref hmsdf.py:201) broadcasts over points.
    """

    def __init__(self, n_freq=8, d_hidden=256, d_out=3, n_hidden=6,
                 skip_in: Sequence[int] = (3,), pose_dim=136, use_bfloat16=False):
        super().__init__(n_freq=n_freq, d_hidden=d_hidden, d_out=d_out,
                         n_hidden=n_hidden, skip_in=skip_in,
                         use_bfloat16=use_bfloat16, d_extra_in=pose_dim)
        self.pose_dim = pose_dim

    def apply(self, params: Params, x: jnp.ndarray, pose_code: jnp.ndarray) -> jnp.ndarray:
        code = jnp.broadcast_to(
            pose_code.reshape((1,) * (x.ndim - 1) + (self.pose_dim,)),
            x.shape[:-1] + (self.pose_dim,),
        )
        return super().apply(params, x, extra=code)


def sdf_gradient(mlp: MLP, params: Params, pts: jnp.ndarray) -> jnp.ndarray:
    """Analytic input-gradient of a scalar field at pts [..., 3].

    Used by the eikonal loss (ref hmsdf.py:856-876 uses
    torch.autograd.grad(create_graph=True); here jax.grad composes
    naturally inside the jitted loss for the required double backprop).
    """
    f = lambda p: mlp.apply(params, p).sum()
    return jax.grad(f)(pts)
