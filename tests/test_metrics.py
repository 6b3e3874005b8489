import jax.numpy as jnp
import numpy as np

from flnerf_tpu.core.metrics import compute_ssim, img2mse, mse2psnr, psnr, to8b


def test_psnr_known_value():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    assert abs(float(mse2psnr(img2mse(a, b))) - 20.0) < 1e-4
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    s_same = float(compute_ssim(jnp.asarray(img), jnp.asarray(img)))
    assert s_same > 0.999
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    s_noisy = float(compute_ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert s_noisy < s_same
    blurred = img * 0.5 + 0.25
    s_blur = float(compute_ssim(jnp.asarray(img), jnp.asarray(blurred)))
    assert 0.0 < s_blur < 1.0


def test_ssim_matches_scipy_reference():
    """Cross-check against skimage-style SSIM computed by hand with the same
    gaussian window on a small constant-contrast case."""
    img0 = np.zeros((32, 32, 1), np.float32)
    img1 = np.full((32, 32, 1), 0.5, np.float32)
    # constant images: mu diff only; ssim = (2*mu0*mu1+c1)/(mu0^2+mu1^2+c1).
    # The reference clone zero-pads its blurs (SAME), so only the interior
    # (>= filter_size away from borders) matches the closed form.
    c1 = 0.01 ** 2
    expect = (2 * 0 * 0.5 + c1) / (0 + 0.25 + c1)
    smap = np.asarray(compute_ssim(jnp.asarray(img0), jnp.asarray(img1), return_map=True))
    got = smap[11:-11, 11:-11].mean()
    assert abs(got - expect) < 1e-5


def test_to8b():
    x = np.array([-0.5, 0.0, 0.5, 1.0, 2.0])
    np.testing.assert_array_equal(to8b(x), [0, 0, 127, 255, 255])
