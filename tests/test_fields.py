import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3human_tpu.models.fields import (
    MLP, DeformMLP, posenc, posenc_dim, sdf_gradient, softplus100,
)


def test_posenc_shape_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = posenc(x, 4)
    assert out.shape == (1, posenc_dim(3, 4))
    # identity part
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    # first frequency block is sin(x), then cos(x)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x))[0], rtol=1e-5)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.asarray(x))[0], rtol=1e-5)
    # last frequency uses 2^3
    np.testing.assert_allclose(out[0, -3:], np.cos(8 * np.asarray(x))[0], rtol=1e-5)


def test_softplus100_matches_definition():
    x = jnp.linspace(-0.2, 0.2, 41)
    ref = np.log1p(np.exp(100.0 * np.asarray(x, np.float64))) / 100.0
    np.testing.assert_allclose(np.asarray(softplus100(x), np.float64), ref, rtol=1e-4)
    # Saturation: behaves like identity for large x, 0 for very negative x
    assert abs(float(softplus100(jnp.array(5.0))) - 5.0) < 1e-5
    assert float(softplus100(jnp.array(-5.0))) < 1e-6


def test_mlp_shapes_and_skip():
    mlp = MLP(n_freq=6, d_hidden=64, d_out=1, n_hidden=6, skip_in=(3,))
    params = mlp.init(jax.random.PRNGKey(0))
    # layer 4 (hidden idx 3) takes the skip concat
    assert params["layers"][4]["w"].shape[0] == 64 + posenc_dim(3, 6)
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 3))
    y = mlp.apply(params, x)
    assert y.shape == (17, 1)
    assert jnp.all(jnp.isfinite(y))


def test_mlp_jit_and_grad():
    mlp = MLP(n_freq=2, d_hidden=16, n_hidden=2, skip_in=(1,))
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3))

    @jax.jit
    def loss(p):
        return jnp.mean(mlp.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in flat)


def test_deform_mlp_pose_conditioning():
    mlp = DeformMLP(n_freq=4, d_hidden=32, n_hidden=2, skip_in=(), pose_dim=8)
    params = mlp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    c0 = jnp.zeros((8,))
    c1 = jnp.ones((8,))
    y0 = mlp.apply(params, x, c0)
    y1 = mlp.apply(params, x, c1)
    assert y0.shape == (5, 3)
    assert float(jnp.abs(y0 - y1).max()) > 0  # conditioning changes output


def test_sdf_gradient_matches_finite_difference():
    mlp = MLP(n_freq=2, d_hidden=16, n_hidden=2, skip_in=())
    params = mlp.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.1
    g = sdf_gradient(mlp, params, pts)
    eps = 1e-3
    for axis in range(3):
        dp = jnp.zeros((1, 3)).at[0, axis].set(eps)
        fd = (mlp.apply(params, pts + dp) - mlp.apply(params, pts - dp)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[:, axis]),
                                   np.asarray(fd[:, 0]), atol=2e-3)


def test_eikonal_double_grad_compiles():
    """Eikonal loss needs grad-of-grad inside jit (ref hmsdf.py:856-876)."""
    mlp = MLP(n_freq=2, d_hidden=16, n_hidden=2, skip_in=())
    params = mlp.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (16, 3)) * 0.1

    @jax.jit
    def eik_loss(p):
        g = sdf_gradient(mlp, p, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    val, grads = jax.value_and_grad(eik_loss)(params)
    assert jnp.isfinite(val)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(grads))


def test_conv_im2col_matches_lax_conv():
    """The MXU-shaped im2col formulation of the perceptual conv must equal
    lax.conv_general_dilated (SAME, stride 2) to f32 summation tolerance,
    for both even and odd input sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from d3human_tpu.models.perceptual import _conv, _conv_im2col_s2

    key = jax.random.PRNGKey(3)
    for H, W, C, O in ((64, 64, 3, 24), (31, 45, 24, 48)):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (1, H, W, C))
        w = jax.random.normal(k2, (3, 3, C, O)) / np.sqrt(9 * C)
        a = np.asarray(_conv(x, w, 2))
        b = np.asarray(_conv_im2col_s2(x, w))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
