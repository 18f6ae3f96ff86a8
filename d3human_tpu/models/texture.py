"""Multiresolution hash-grid neural texture (TPU-native tiny-cuda-nn replacement).

Re-designs /root/reference/render/mlptexture.py:51-116 (tcnn HashGrid encoding
+ 2-hidden-layer ReLU MLP) for XLA: the encoding is an 8-corner gather +
trilinear blend per level, which XLA lowers to efficient TPU gathers; the
scatter-add backward into the table is native XLA scatter. With the shipped
config (5 levels, base 16, growth 1.447, 2^21 table) every level's dense grid
fits in the table, so lookups use *direct* (non-hashed) indexing — perfectly
regular memory access on TPU. Hashing kicks in automatically for levels whose
dense resolution exceeds the table size.

Reference quirks preserved:
  * ``sample`` normalizes coordinates by the hardcoded bbox
    [0.6,0.6,0.2]..[-0.8,-1.2,-0.2] (ref mlptexture.py:94-96).
  * 128x gradient scaling at the MLP input (ref mlptexture.py:78,88 backward
    hook) implemented with a custom-VJP identity; combined with the
    optimizer-side table-gradient /8 (ref train.py:747-750) via
    ``hashgrid_grad_scale``.
  * sigmoid squashing into the [min,max] material range (ref mlptexture.py:104).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Params = dict

_PRIMES = (1, 2654435761, 805459861)


@jax.custom_vjp
def grad_scale(x, s):
    return x


def _grad_scale_fwd(x, s):
    return x, s


def _grad_scale_bwd(s, g):
    return (g * s, None)


grad_scale.defvjp(_grad_scale_fwd, _grad_scale_bwd)


class HashGridEncoding:
    """Instant-NGP style multiresolution feature grid.

    TPU layout insight (measured, scripts/bench_gather.py): XLA's TPU row
    gather costs ~the same for 2..16-float rows — cost is per ROW, not per
    byte. So for dense levels the lookup packs ALL 8 cell corners into one
    16-float row (built per step from the canonical per-level table with 8
    rolls + a concat, whose autodiff transpose is rolls again — no scatter),
    turning 8 gathers/level/point into ONE. Hashed levels (dense extent >
    table budget) fall back to 8 hashed gathers, as locality doesn't survive
    the spatial hash."""

    def __init__(self, n_levels=5, n_features=2, log2_hashmap_size=21,
                 base_resolution=16, desired_resolution=4096,
                 ref_levels_for_scale=16):
        # per_level_scale computed as the reference does — from a *16-level*
        # schedule even though only 5 levels are instantiated
        # (ref mlptexture.py:62-75).
        self.per_level_scale = math.exp(
            math.log(desired_resolution / base_resolution) / (ref_levels_for_scale - 1)
        )
        self.n_levels = n_levels
        self.n_features = n_features
        self.table_size = 2 ** log2_hashmap_size
        self.resolutions = tuple(
            int(math.floor(base_resolution * self.per_level_scale ** l))
            for l in range(n_levels)
        )
        # Direct indexing when the dense grid fits in the table (tcnn behavior)
        self.dense = tuple((r + 1) ** 3 <= self.table_size for r in self.resolutions)
        # per-level row counts: dense levels allocate exactly their extent
        # (the reference's tcnn allocates the full 2^21 for every level; the
        # trainable surface is identical — extra rows were never addressed)
        self.level_sizes = tuple(
            min((r + 1) ** 3, self.table_size) for r in self.resolutions)
        self.out_dim = n_levels * n_features

    def init(self, key) -> Params:
        # tcnn init: U(-1e-4, 1e-4)
        keys = jax.random.split(key, self.n_levels)
        table = [
            jax.random.uniform(keys[l], (self.level_sizes[l], self.n_features),
                               jnp.float32, -1e-4, 1e-4)
            for l in range(self.n_levels)
        ]
        return {"table": table}

    def _corner_index(self, level: int, ix: jnp.ndarray) -> jnp.ndarray:
        """ix: [..., 3] int32 lattice coords -> table index."""
        res = self.resolutions[level]
        if self.dense[level]:
            stride = res + 1
            return (ix[..., 0] * stride + ix[..., 1]) * stride + ix[..., 2]
        # uint32 wraparound multiply is the intended spatial-hash behavior
        ix = ix.astype(jnp.uint32)
        h = ix[..., 0] * jnp.uint32(_PRIMES[0])
        h = h ^ (ix[..., 1] * jnp.uint32(_PRIMES[1]))
        h = h ^ (ix[..., 2] * jnp.uint32(_PRIMES[2]))
        return (h & jnp.uint32(self.table_size - 1)).astype(jnp.int32)

    # corner order: (i, j, k) for i,j,k in {0,1}^3, i-major (matches the
    # trilinear weight order below)
    _CORNERS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]

    def packed_table(self, table_l: jnp.ndarray, level: int) -> jnp.ndarray:
        """[S, F] canonical level table -> [S, 8*F] corner-packed rows:
        packed[r, c*F:(c+1)*F] = table[r + offset(corner c)]. Rolls wrap at
        the array end, but wrapped rows are only ever gathered with zero
        trilinear weight (base index <= res along each axis)."""
        s = self.resolutions[level] + 1
        rolls = [
            jnp.roll(table_l, -(i * s * s + j * s + k), axis=0)
            for (i, j, k) in self._CORNERS
        ]
        return jnp.concatenate(rolls, axis=-1)

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., 3] in [0,1] -> [..., n_levels * n_features]."""
        table = params["table"]
        outs = []
        F = self.n_features
        corners = jnp.asarray(self._CORNERS, dtype=jnp.int32)
        for level in range(self.n_levels):
            res = self.resolutions[level]
            xs = x * res
            x0 = jnp.floor(xs)
            frac = xs - x0
            x0 = x0.astype(jnp.int32)
            # trilinear weights: prod over axes of (frac if corner==1 else 1-frac)
            f = frac[..., None, :]                                   # [..., 1, 3]
            cw = jnp.where(corners > 0, f, 1.0 - f)                  # [..., 8, 3]
            weight = cw[..., 0] * cw[..., 1] * cw[..., 2]            # [..., 8]
            from d3human_tpu.ops.scatter import (
                default_use_pallas, gather_rows,
            )

            if self.dense[level]:
                base = self._corner_index(level, x0)                 # [...]
                packed = self.packed_table(table[level], level)
                # bwd = Pallas sorted-COO scatter into the packed rows
                # (whose own transpose back to the canonical table is
                # rolls — no further scatter)
                rows = gather_rows(packed, base, default_use_pallas())
                feats = rows.reshape(*rows.shape[:-1], 8, F)
            else:
                idx = self._corner_index(level, x0[..., None, :] + corners)
                feats = gather_rows(table[level], idx,
                                    default_use_pallas())           # [..., 8, F]
            outs.append(jnp.sum(feats * weight[..., None], axis=-2))
        return jnp.concatenate(outs, axis=-1)


class MLPTexture3D:
    """Hash-grid encoder + small ReLU MLP, sigmoid-limited to [min,max].

    Mirrors /root/reference/render/mlptexture.py:51-116. ``sample`` ignores
    frame identity just like the reference's unused ``frame_id`` argument.
    """

    def __init__(self, cfg, min_max: Tuple[jnp.ndarray, jnp.ndarray]):
        self.cfg = cfg
        self.encoder = HashGridEncoding(
            n_levels=cfg.n_levels,
            n_features=cfg.n_features_per_level,
            log2_hashmap_size=cfg.log2_hashmap_size,
            base_resolution=cfg.base_resolution,
            desired_resolution=cfg.desired_resolution,
            ref_levels_for_scale=cfg.ref_levels_for_scale,
        )
        self.channels = cfg.channels
        self.internal_dims = cfg.internal_dims
        self.hidden = cfg.hidden
        self.gradient_scaling = cfg.gradient_scaling
        self.min_max = (jnp.asarray(min_max[0], jnp.float32),
                        jnp.asarray(min_max[1], jnp.float32))
        self.bbox_lo = jnp.asarray(cfg.bbox_lo, jnp.float32)
        self.bbox_hi = jnp.asarray(cfg.bbox_hi, jnp.float32)

    def init(self, key) -> Params:
        k_enc, *k_mlp = jax.random.split(key, self.hidden + 2)
        params = {"encoder": self.encoder.init(k_enc)}
        dims = ([self.encoder.out_dim]
                + [self.internal_dims] * self.hidden
                + [self.channels])
        layers = []
        for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            # kaiming uniform, relu gain, no bias (ref mlptexture.py:22-41)
            bound = math.sqrt(6.0 / d_in)
            layers.append({
                "w": jax.random.uniform(k_mlp[i], (d_in, d_out), jnp.float32,
                                        -bound, bound)
            })
        params["net"] = layers
        return params

    def sample(self, params: Params, texc: jnp.ndarray) -> jnp.ndarray:
        """texc: [..., 3] world-space points -> [..., channels] material."""
        lo, hi = self.bbox_lo, self.bbox_hi
        u = (texc - lo) / (hi - lo)              # hardcoded bbox (quirk)
        u = jnp.clip(u, 0.0, 1.0)
        enc = self.encoder.apply(params["encoder"], u)
        h = grad_scale(enc, self.gradient_scaling)
        for layer in params["net"][:-1]:
            h = jax.nn.relu(jnp.dot(h, layer["w"],
                                    preferred_element_type=jnp.float32))
        h = jnp.dot(h, params["net"][-1]["w"],
                    preferred_element_type=jnp.float32)
        mn, mx = self.min_max
        return jax.nn.sigmoid(h) * (mx - mn) + mn
