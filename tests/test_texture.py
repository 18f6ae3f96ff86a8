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
                               float(params["table"][0, idx, 0]), rtol=1e-5)
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
    assert float(jnp.abs(g["encoder"]["table"]).sum()) > 0
