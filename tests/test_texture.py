import jax
import jax.numpy as jnp
import numpy as np

from d3human_tpu.config import TextureConfig
from d3human_tpu.models.texture import HashGridEncoding, MLPTexture3D, grad_scale


def test_grad_scale_identity_forward_scaled_backward():
    x = jnp.array([1.0, 2.0])
    y = grad_scale(x, 128.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda x: grad_scale(x, 128.0).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 128.0 * np.ones(2))


def test_hashgrid_resolutions_match_tcnn_schedule():
    enc = HashGridEncoding()
    # per_level_scale = exp(log(4096/16)/15) ~= 1.4472692 (ref mlptexture.py:65)
    assert abs(enc.per_level_scale - 1.4472692374403782) < 1e-9
    assert enc.resolutions == (16, 23, 33, 48, 70)
    assert all(enc.dense)  # all shipped levels use direct indexing


def test_hashgrid_interpolation_is_trilinear():
    enc = HashGridEncoding(n_levels=1, n_features=1, base_resolution=4,
                           log2_hashmap_size=10)
    params = enc.init(jax.random.PRNGKey(0))
    # At exact lattice points, output equals the stored corner feature.
    x = jnp.array([[0.25, 0.5, 0.75]])  # lattice coords (1, 2, 3) at res 4
    out = enc.apply(params, x)
    stride = 5
    idx = (1 * stride + 2) * stride + 3
    np.testing.assert_allclose(float(out[0, 0]),
                               float(params["table"][0][idx, 0]), rtol=1e-5)
    # Continuity / linearity along one axis between lattice points
    a = enc.apply(params, jnp.array([[0.25, 0.5, 0.75]]))
    b = enc.apply(params, jnp.array([[0.5, 0.5, 0.75]]))
    mid = enc.apply(params, jnp.array([[0.375, 0.5, 0.75]]))
    np.testing.assert_allclose(np.asarray(mid), np.asarray((a + b) / 2),
                               rtol=1e-4, atol=1e-8)


def test_mlptexture_sample_range_and_grads():
    cfg = TextureConfig(n_levels=2, log2_hashmap_size=12, internal_dims=16)
    mn = jnp.zeros((6,))
    mx = jnp.ones((6,))
    tex = MLPTexture3D(cfg, (mn, mx))
    params = tex.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3)) * 0.3
    out = tex.sample(params, pts)
    assert out.shape == (4, 5, 6)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    @jax.jit
    def loss(p):
        return jnp.mean(tex.sample(p, pts) ** 2)

    g = jax.grad(loss)(params)
    # table receives (scatter-add) gradients
    assert sum(float(jnp.abs(t).sum()) for t in g["encoder"]["table"]) > 0


def test_packed_dense_gather_matches_8corner_oracle():
    """The corner-packed single-row gather (TPU layout, see
    HashGridEncoding docstring) must match a plain 8-gather trilerp,
    including at domain corners, and for hashed (non-dense) levels."""
    # mix of dense (8 -> 9^3 <= 2^10) and hashed (16 -> 17^3 > 2^10)
    enc = HashGridEncoding(n_levels=3, n_features=2, base_resolution=8,
                           log2_hashmap_size=10)
    assert enc.dense[0] and not enc.dense[-1]
    params = enc.init(jax.random.PRNGKey(1))

    corners = jnp.asarray(enc._CORNERS, jnp.int32)

    def oracle(params, x):
        outs = []
        for level in range(enc.n_levels):
            res = enc.resolutions[level]
            xs = x * res
            x0 = jnp.floor(xs)
            frac = xs - x0
            x0 = x0.astype(jnp.int32)
            idx = enc._corner_index(level, x0[..., None, :] + corners)
            idx = jnp.clip(idx, 0, params["table"][level].shape[0] - 1)
            feats = params["table"][level][idx]
            f = frac[..., None, :]
            cw = jnp.where(corners > 0, f, 1.0 - f)
            w = cw[..., 0] * cw[..., 1] * cw[..., 2]
            outs.append(jnp.sum(feats * w[..., None], axis=-2))
        return jnp.concatenate(outs, axis=-1)

    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (257, 3))
    x = jnp.concatenate([x, jnp.zeros((1, 3)), jnp.ones((1, 3))], axis=0)
    got = enc.apply(params, x)
    want = oracle(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)

    # gradients wrt the table agree too (the roll transpose path)
    def loss_a(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    def loss_b(p):
        return jnp.sum(oracle(p, x) ** 2)

    ga = jax.grad(loss_a)(params)["table"]
    gb = jax.grad(loss_b)(params)["table"]
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
