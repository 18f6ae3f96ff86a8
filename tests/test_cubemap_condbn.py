"""Cubemap prefiltering + conditional-BN decoder capability slots."""

import numpy as np

import jax
import jax.numpy as jnp

from d3human_tpu.models.condbn import CondBNDecoder
from d3human_tpu.render.cubemap import (
    cube_dirs, cubemap_to_latlong, diffuse_prefilter, latlong_to_cubemap,
    specular_mip_chain, specular_prefilter, texel_solid_angles,
)


def test_cube_dirs_unit_and_solid_angles_sum_to_sphere():
    d = cube_dirs(16)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-6)
    sa = float(jnp.sum(texel_solid_angles(16)))
    assert abs(sa - 4 * np.pi) < 1e-3


def test_latlong_cubemap_roundtrip_constant():
    ll = jnp.ones((16, 32, 3)) * jnp.asarray([0.2, 0.5, 0.9])
    cube = latlong_to_cubemap(ll, 8)
    np.testing.assert_allclose(np.asarray(cube[..., 2]), 0.9, atol=1e-5)
    back = cubemap_to_latlong(cube, (16, 32))
    np.testing.assert_allclose(np.asarray(back[..., 0]), 0.2, atol=1e-5)


def test_diffuse_prefilter_white_furnace():
    """A constant radiance-1 environment integrates to irradiance/pi = 1."""
    cube = jnp.ones((6, 16, 16, 3))
    out = diffuse_prefilter(cube)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=2e-3)


def test_diffuse_prefilter_directional():
    """Energy concentrated at +y lights up the +y face most."""
    d = cube_dirs(16)
    cube = jnp.maximum(d[..., 1:2], 0.0) ** 8 * jnp.ones((1, 1, 1, 3))
    out = diffuse_prefilter(cube)
    up = float(out[2].mean())          # +y face
    down = float(out[3].mean())        # -y face
    assert up > 5 * down


def test_specular_prefilter_sharp_preserves_and_rough_blurs():
    d = cube_dirs(16)
    cube = jnp.maximum(d[..., 1:2], 0.0) ** 32 * jnp.ones((1, 1, 1, 3))
    sharp = specular_prefilter(cube, 0.05)
    rough = specular_prefilter(cube, 1.0)
    # peak contrast drops with roughness
    c_sharp = float(sharp.max() - sharp.min())
    c_rough = float(rough.max() - rough.min())
    assert c_sharp > 2 * c_rough
    # white furnace at any roughness (normalized weights)
    const = specular_prefilter(jnp.ones((6, 8, 8, 3)), 0.4)
    np.testing.assert_allclose(np.asarray(const), 1.0, rtol=1e-4)


def test_specular_mip_chain_shapes():
    mips = specular_mip_chain(jnp.ones((6, 16, 16, 3)), n_mips=3)
    assert [m.shape[1] for m in mips] == [16, 8, 4]


def test_condbn_decoder_identity_init_and_conditioning():
    dec = CondBNDecoder(input_dim=3, latent_dim=8, hidden_dim=32,
                        num_hidden_layers=2, out_dim=3)
    params = dec.init(jax.random.PRNGKey(0))
    coords = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    c0 = jnp.zeros((2, 8))
    out0 = dec.apply(params, coords, c0)
    assert out0.shape == (2, 64, 3)
    assert np.all(np.isfinite(np.asarray(out0)))
    # conditioning changes the output once gamma/beta weights are nonzero
    # (the residual fc1 layers are zero-init, so the FINAL cbn is the first
    # place conditioning can reach the output)
    params2 = jax.tree.map(lambda x: x, params)
    params2["bn"]["gamma"]["w"] = jnp.ones((8, 32)) * 0.1
    c1 = jnp.ones((2, 8))
    a = dec.apply(params2, coords, c0)
    b = dec.apply(params2, coords, c1)
    assert float(jnp.abs(a - b).max()) > 1e-4
    # per-point codes accepted
    cpp = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 8))
    assert dec.apply(params, coords, cpp).shape == (2, 64, 3)


def test_condbn_decoder_gradients_flow():
    dec = CondBNDecoder(latent_dim=4, hidden_dim=16, num_hidden_layers=1)
    params = dec.init(jax.random.PRNGKey(0))
    coords = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 3))
    codes = jax.random.normal(jax.random.PRNGKey(2), (1, 4))

    def loss(p):
        return jnp.sum(dec.apply(p, coords, codes) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["fc_p"]["w"]).sum()) > 0
    assert float(jnp.abs(g["blocks"][0]["bn0"]["gamma"]["w"]).sum()) >= 0
