"""Quadtree debug visualization (SURVEY.md §5.5 keeps these first-class).

Parity targets: tree-overlay images (tree.py:148-156 visualize_tree,
195-229 visualize_split_and_sample_points), sample-point scatters and
probability heatmaps (image_process.py:98-167), ngp error-map dumps
(nerf/utils.py:513-518).  Implemented with cv2 drawing on numpy images.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from flnerf_tpu.rays.quadtree import QuadTreeForest


def draw_tree_overlay(image: np.ndarray, forest: QuadTreeForest, img_id: int) -> np.ndarray:
    """Leaf-boundary overlay for one view ([H,W,3] float in [0,1])."""
    import cv2

    imgc = (np.asarray(image) * 255.0).astype(np.uint8).copy()
    sel = forest.img == img_id
    for x0, y0, x1, y1 in forest.boxes[sel]:
        cv2.rectangle(imgc, (int(y0), int(x0)), (int(y1), int(x1)), (0, 0, 0), 1)
    return imgc


def draw_sample_points(
    image: np.ndarray, px: np.ndarray, py: np.ndarray, color=(255, 0, 0)
) -> np.ndarray:
    """Scatter selected pixels onto a view."""
    import cv2

    imgc = (np.asarray(image) * 255.0).astype(np.uint8).copy()
    for x, y in zip(np.asarray(px), np.asarray(py)):
        cv2.circle(imgc, (int(y), int(x)), 0, color, -1)
    return imgc


def prob_heatmap(prob: np.ndarray) -> np.ndarray:
    """Red-high / green-low probability heatmap
    (image_process.py visualize_prob_distribution semantics)."""
    p = np.asarray(prob, np.float64)
    lo, mid, hi = p.min(), 2 * p.mean(), p.max()
    img = np.zeros(p.shape + (3,), np.uint8)
    low = p <= mid
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.clip(255 * (p - lo) / max(mid - lo, 1e-9), 0, 255)
        g = np.clip(255 - 255 * (p - mid) / max(hi - mid, 1e-9), 0, 255)
    img[..., 0] = np.where(low, r, 255).astype(np.uint8)
    img[..., 1] = np.where(low, 255, g).astype(np.uint8)
    return img


def save_debug_images(
    out_dir: str,
    images: np.ndarray,
    forest: QuadTreeForest,
    sharp_maps: Optional[np.ndarray] = None,
    prefix: str = "tree",
) -> None:
    """Dump per-view tree overlays (+ prob heatmaps) like the reference's
    debug/ directory."""
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    for i in range(forest.n_images):
        imageio.imwrite(
            os.path.join(out_dir, f"{prefix}_subdivide_{i}.jpg"),
            draw_tree_overlay(images[i], forest, i),
        )
        if sharp_maps is not None:
            imageio.imwrite(
                os.path.join(out_dir, f"{prefix}_prob_{i}.jpg"),
                prob_heatmap(sharp_maps[i]),
            )
