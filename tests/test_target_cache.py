"""On-device fp16 target cache (data/synthetic.py:CachedTargets) must be an
exact drop-in for SyntheticScene.frame_target up to fp16 quantization of the
cached generators (rgb/alpha/label/normal). PERF.md lever #6."""

import numpy as np

from d3human_tpu.data.synthetic import CachedTargets, make_scene


def test_cached_targets_match_direct_render():
    scene = make_scene(resolution=(48, 48), n_frames=3)
    cache = CachedTargets(scene)
    for frame in range(scene.n_frames + 1):   # +1: wraps like the direct path
        direct = scene.frame_target(frame)
        cached = cache.frame_target(frame)
        assert set(cached) == set(direct)
        for k in direct:
            d, c = np.asarray(direct[k]), np.asarray(cached[k])
            assert d.shape == c.shape, k
            assert d.dtype == c.dtype, k
            # fp16 storage of values in [-1, 1.3]: eps ~ 1e-3; products of
            # two cached channels square it at most
            np.testing.assert_allclose(c, d, atol=3e-3, err_msg=k)


def test_cached_targets_alpha_and_masks_exact():
    """Binary channels (alpha, and labels*alpha where alpha=1) survive fp16
    exactly — mask losses dominate the objective so their GT must not move."""
    scene = make_scene(resolution=(48, 48), n_frames=2)
    cache = CachedTargets(scene)
    d = scene.frame_target(1)
    c = cache.frame_target(1)
    np.testing.assert_array_equal(np.asarray(c["all_img"][..., 3]),
                                  np.asarray(d["all_img"][..., 3]))
    np.testing.assert_array_equal(np.asarray(c["cloth_img"][..., 3]),
                                  np.asarray(d["cloth_img"][..., 3]))
    np.testing.assert_array_equal(np.asarray(c["body_img"][..., 3]),
                                  np.asarray(d["body_img"][..., 3]))
