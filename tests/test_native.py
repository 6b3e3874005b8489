"""Native C++ sampler: builds with g++, matches the numpy distributions."""

import numpy as np
import pytest

from flnerf_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("g++ unavailable — numpy fallback covers functionality")
    return l


def test_uniform_sampler_bounds_and_distribution(lib):
    H = W = 64
    boxes = np.array([[0, 0, 32, 32], [32, 32, 64, 64]], np.float64)
    counts = np.array([5000, 5000], np.int64)
    res = native.sample_leaves_uniform(H, W, boxes, counts, seed=42)
    assert res is not None
    px, py = res
    # first leaf's draws inside its box
    assert (px[:5000] >= 0).all() and (px[:5000] < 32).all()
    assert (py[:5000] >= 0).all() and (py[:5000] < 32).all()
    assert (px[5000:] >= 32).all() and (px[5000:] < 64).all()
    # roughly uniform: mean near box center
    assert abs(px[:5000].mean() - 15.5) < 1.0
    assert abs(py[5000:].mean() - 47.5) < 1.0


def test_weighted_sampler_follows_sharpness(lib):
    H = W = 32
    sharp = np.zeros((1, H, W), np.float32)
    sharp[0, 4:9, 4:9] = 10.0  # a bright 5x5 region inside the box
    boxes = np.array([[0, 0, 32, 32]], np.float64)
    img = np.array([0], np.int32)
    counts = np.array([20000], np.int64)
    res = native.sample_leaves_weighted(sharp, boxes, img, counts, seed=7)
    assert res is not None
    px, py = res
    in_hot = ((px >= 4) & (px < 9) & (py >= 4) & (py < 9)).mean()
    # to_prob_v2: hot cells get weight 10 vs floor 0.01*mean; the hot 25
    # cells should dominate overwhelmingly
    assert in_hot > 0.9, in_hot
    assert (px >= 0).all() and (px < H).all()


def test_weighted_sampler_matches_numpy_marginals(lib):
    """Native and numpy paths draw from the SAME distribution (different RNG
    streams): compare per-cell frequencies on a small block."""
    from flnerf_tpu.rays.sharpness import block_prob

    H = W = 8
    rng = np.random.default_rng(0)
    sharp = rng.random((1, H, W)).astype(np.float32)
    boxes = np.array([[0, 0, 8, 8]], np.float64)
    img = np.array([0], np.int32)
    n = 200000
    counts = np.array([n], np.int64)
    px, py = native.sample_leaves_weighted(sharp, boxes, img, counts, seed=3)
    freq = np.zeros((H, W))
    np.add.at(freq, (px, py), 1.0)
    freq /= n
    expect = block_prob(sharp[0])
    np.testing.assert_allclose(freq, expect, atol=0.01)


def test_sharpness_sampler_uses_native_when_available(lib):
    from flnerf_tpu.rays.sharpness import SharpnessSampler

    rng = np.random.default_rng(0)
    images = rng.random((2, 16, 16, 3)).astype(np.float32)
    s = SharpnessSampler(images)
    boxes = np.array([[0, 0, 8, 8], [8, 8, 16, 16]], np.float64)
    img = np.array([0, 1], np.int32)
    counts = np.array([100, 50], np.int64)
    leaf, px, py = s.sample_in_leaves(boxes, img, counts, rng)
    assert leaf.shape == (150,)
    assert (px[:100] < 8).all()
    assert (px[100:] >= 8).all()
