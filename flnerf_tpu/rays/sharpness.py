"""Sharpness-probability pixel sampling (ImageProcessor equivalent).

Parity target: nerf-ours/image_process.py (clones in nerf++/plenoxels):
  * get_sharp_img (image_process.py:26-39): per-pixel local 3x3 std
    sqrt(|E[x^2] - E[x]^2|) via box blur, converted to gray with the BGR
    luma weights the reference effectively applies (it flips channels to BGR
    before cv2's RGB2GRAY, so gray = .299*B + .587*G + .114*R on the
    *flipped* image == .299*R + .587*G + .114*B on the original RGB —
    i.e. plain ITU-R BT.601 luma on RGB).
  * to_prob_v2 (image_process.py:60-75): +1e-6, clip to
    [0.01*mean, max], scale by max, normalize to a distribution.
  * sample_pixels (image_process.py:77-96): categorical draw over the block.

The blur/variance maps are computed once per dataset with vectorized numpy
(uniform_filter); per-leaf categorical draws happen once per epoch on the
host, off the device critical path.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def sharp_image(img: np.ndarray) -> np.ndarray:
    """Local 3x3 std-dev gray map of an [H, W, 3] float image."""
    img = np.asarray(img, dtype=np.float32)
    # 'mirror' == cv2.blur's default BORDER_REFLECT_101 (the reference's
    # get_sharp_img border handling); 'nearest' replicated edge pixels
    # and skewed the 1-px border of every sharpness map
    e_sq = uniform_filter(img ** 2, size=(3, 3, 1), mode="mirror")
    sq_e = uniform_filter(img, size=(3, 3, 1), mode="mirror") ** 2
    std = np.sqrt(np.abs(e_sq - sq_e))
    # BT.601 luma (see module docstring on the reference's double flip).
    return 0.299 * std[..., 0] + 0.587 * std[..., 1] + 0.114 * std[..., 2]


def block_prob(gray_block: np.ndarray) -> np.ndarray:
    """to_prob_v2: normalized sampling distribution over one leaf block."""
    g = gray_block.astype(np.float64).ravel() + 1e-6
    g_min = 0.01 * np.mean(g)
    g_max = np.max(g)
    g = np.clip(g, g_min, g_max)
    g = g / g_max if g_max > 0 else np.ones_like(g)
    s = g.sum()
    return (g / s if s > 0 else np.full_like(g, 1.0 / g.size)).reshape(gray_block.shape)


class SharpnessSampler:
    def __init__(self, images: np.ndarray):
        """images: [n, H, W, 3] float32."""
        self.n_images, self.H, self.W = images.shape[:3]
        self.sharp = np.stack([sharp_image(im) for im in images], 0)

    def sample_in_leaves(
        self,
        boxes: np.ndarray,     # [M, 4] leaf boxes
        img: np.ndarray,       # [M] image per leaf
        counts: np.ndarray,    # [M] rays to draw per leaf (may be 0)
        rng: np.random.Generator,
    ):
        """Draw ``counts[i]`` pixels in each leaf from its sharpness prob map.

        Returns (leaf_of_ray, px, py) flat arrays (total = counts.sum()).
        Mirrors tree.py:583-590: the block is images[int(x0):int(x1),
        int(y0):int(y1)] and sampled indices are offset by (int(x0), int(y0)).

        Uses the native C++ sampler (flnerf_tpu/native) when available —
        one pass over all leaves instead of a per-leaf Python loop; falls
        back to numpy otherwise (same distribution, different RNG stream).
        """
        total = int(counts.sum())
        leaf_of_ray = np.repeat(np.arange(boxes.shape[0]), counts)

        try:
            from flnerf_tpu import native

            res = native.sample_leaves_weighted(
                self.sharp, boxes, img, counts, int(rng.integers(0, 2 ** 62))
            )
        except Exception:
            res = None
        if res is not None:
            px, py = res
            px = np.minimum(px, self.H - 1)
            py = np.minimum(py, self.W - 1)
            return leaf_of_ray, px, py

        px = np.empty(total, np.int64)
        py = np.empty(total, np.int64)
        off = 0
        for li in np.nonzero(counts)[0]:
            c = int(counts[li])
            x0, y0, x1, y1 = boxes[li]
            bx0, by0 = int(x0), int(y0)
            bx1 = max(int(x1), bx0 + 1)
            by1 = max(int(y1), by0 + 1)
            block = self.sharp[img[li], bx0:bx1, by0:by1]
            p = block_prob(block)
            idx = rng.choice(p.size, size=c, p=p.ravel())
            bw = block.shape[1]
            px[off : off + c] = bx0 + idx // bw
            py[off : off + c] = by0 + idx % bw
            off += c
        px = np.minimum(px, self.H - 1)
        py = np.minimum(py, self.W - 1)
        return leaf_of_ray, px, py
