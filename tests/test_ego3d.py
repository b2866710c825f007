"""Ego3D backprojection geometry and frequency-MLP tests."""
import numpy as np

import jax
import jax.numpy as jnp

from spatialvla_tpu.config import Ego3DConfig
from spatialvla_tpu.models import ego3d


def test_backproject_constant_depth_pinhole():
    """With constant depth d and K = [[f,0,cx],[0,f,cy],[0,0,1]], the
    back-projected point at pixel (u, v) must be
    ((u-cx) d / f, (v-cy) d / f, d)."""
    image_size, patch_size, reso = 56, 14, 2
    f, cx, cy, d = 100.0, 28.0, 30.0, 1.5
    K = jnp.asarray([[[f, 0, cx], [0, f, cy], [0, 0, 1.0]]])
    depth = jnp.full((1, image_size, image_size), d)
    pts = ego3d.backproject_patch(
        K, depth, image_size=image_size, patch_size=patch_size, reso=reso
    )
    hp = image_size // patch_size
    assert pts.shape == (1, hp * hp, 3 * reso * reso)

    # first patch, first sub-point: pixel center (u, v) = (3.5, 3.5)
    # (step = patch/reso = 7, offset = patch/reso/2 = 3.5)
    u = v = patch_size / reso / 2
    expected = np.array([(u - cx) * d / f, (v - cy) * d / f, d])
    got = np.asarray(pts[0, 0]).reshape(reso * reso, 3)[0]
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    # z-coordinate is d everywhere
    z = np.asarray(pts[0]).reshape(-1, 3)[:, 2]
    np.testing.assert_allclose(z, d, rtol=1e-6)


def test_backproject_subpoint_ordering():
    """Sub-points within a patch are ordered (row-major over the reso grid)
    with xyz fastest — matching the (hp, sub_hp, wp, sub_wp) regrouping of
    the reference (modeling_spatialvla.py:222)."""
    image_size, patch_size, reso = 28, 14, 2
    K = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]])
    # depth = v coordinate so we can read back which pixel each point used
    v_coords = jnp.broadcast_to(
        jnp.arange(image_size, dtype=jnp.float32)[:, None], (image_size, image_size)
    )
    pts = ego3d.backproject_patch(
        K, v_coords[None], image_size=image_size, patch_size=patch_size, reso=reso
    )
    # patch 0 sub-rows: area-pooled v for sub-row 0 = mean(0..6) = 3,
    # sub-row 1 = mean(7..13) = 10
    bundle = np.asarray(pts[0, 0]).reshape(reso, reso, 3)
    np.testing.assert_allclose(bundle[0, :, 2], 3.0, atol=1e-5)
    np.testing.assert_allclose(bundle[1, :, 2], 10.0, atol=1e-5)


def test_frequency_encoding_formula():
    cfg = Ego3DConfig(patch_reso=1, n_freqs=3, num_pos_feats=16)
    xyz = jnp.asarray([[[0.5, -0.25, 2.5]]])
    enc = np.asarray(ego3d.frequency_encoding(xyz, cfg))
    xn = (np.array([0.5, -0.25, 2.5]) - np.array([0.0, 0.0, 2.0])) / 2.0
    bands = 2.0 ** np.linspace(0, 2, 3)
    expected = []
    for c in range(3):
        expected.append(xn[c])
        expected.extend(np.sin(xn[c] * bands))
        expected.extend(np.cos(xn[c] * bands))
    np.testing.assert_allclose(enc[0, 0], expected, rtol=1e-6, atol=1e-6)
    assert enc.shape == (1, 1, cfg.freq_out_channels)


def test_mlp_forward_shapes_and_small_init():
    cfg = Ego3DConfig(patch_reso=2, n_freqs=4, num_pos_feats=24)
    params = ego3d.init_params(jax.random.PRNGKey(0), cfg)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.in_channels))
    out = ego3d.forward(params, cfg, xyz)
    assert out.shape == (2, 16, 24)
    # gain=0.01 xavier init -> small outputs ("stable training",
    # modeling_spatialvla.py:67-71)
    assert np.abs(np.asarray(out)).max() < 1.0
