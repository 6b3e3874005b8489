"""Offline pre-sampled ray cache (tree_utils.py analog).

Parity target: nerf-ours/tree_utils.py (clones in nerf++/plenoxels):
SimpleQuadTree (:15) + RaySampler.pre_gen_rays_v3 (:42) pre-generate, for
every tree level and every uniform block at that level, a fixed pixel set
(mixed sharpness-prob / uniform draw), pickled to process/{dset}.pkl and
consumed by gen_rays_v4 (tree.py:430-490) as an index-only fast path.

Vectorized re-design: one numpy pass per level; blocks are the uniform
2^(l-1) x 2^(l-1) partition, each block gets area*rate/down_scale pixels.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from flnerf_tpu.rays.sharpness import SharpnessSampler


class OfflineRaySampler:
    """Pre-generates per-(image, level, block) pixel indices."""

    def __init__(self, images: np.ndarray, max_level: int = 6, seed: int = 0):
        self.images = images
        self.n_images, self.H, self.W = images.shape[:3]
        self.max_level = max_level
        self.rng = np.random.default_rng(seed)
        self.sharpness = SharpnessSampler(images)

    def pre_gen_rays(
        self, down_scale: int = 1, rand_samp_perc: float = 1.0
    ) -> Dict[int, Dict[int, np.ndarray]]:
        """returns {img: {level: [n_side, n_side, rays_per_block, 2] int64}}."""
        out: Dict[int, Dict[int, np.ndarray]] = {}
        rate = 1.0 / down_scale
        for img in range(self.n_images):
            out[img] = {}
            for level in range(1, self.max_level + 1):
                n_side = 2 ** (level - 1)
                bh, bw = self.H / n_side, self.W / n_side
                rays_per_block = max(int(bh * bw * rate), 1)
                blocks = np.empty((n_side, n_side, rays_per_block, 2), np.int64)
                n_prob = int(rays_per_block * (1.0 - rand_samp_perc))
                for bi in range(n_side):
                    for bj in range(n_side):
                        x0, x1 = int(bi * bh), max(int((bi + 1) * bh), int(bi * bh) + 1)
                        y0, y1 = int(bj * bw), max(int((bj + 1) * bw), int(bj * bw) + 1)
                        n_unif = rays_per_block - n_prob
                        px = self.rng.integers(x0, x1, n_unif)
                        py = self.rng.integers(y0, y1, n_unif)
                        if n_prob > 0:
                            boxes = np.array([[x0, y0, x1, y1]], np.float64)
                            _, ppx, ppy = self.sharpness.sample_in_leaves(
                                boxes, np.array([img], np.int32),
                                np.array([n_prob], np.int64), self.rng,
                            )
                            px = np.concatenate([ppx, px])
                            py = np.concatenate([ppy, py])
                        blocks[bi, bj, :, 0] = px
                        blocks[bi, bj, :, 1] = py
                out[img][level] = blocks
        return out

    def save(self, cache: dict, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({"format": "flnerf_offline_rays_v1", "cache": cache}, f)

    @staticmethod
    def load(path: str) -> dict:
        with open(path, "rb") as f:
            d = pickle.load(f)
        assert d.get("format") == "flnerf_offline_rays_v1"
        return d["cache"]


def gen_rays_from_cache(budgeter, cache: dict, cur_level: int):
    """gen_rays_v4 analog (tree.py:430-490): non-deepest leaves draw 10
    fresh uniform pixels; deepest leaves reuse the cached block pixels."""
    forest = budgeter.forest
    counts = budgeter.ray_counts(1, forest)
    areas = forest.areas()
    deepest = areas <= forest.min_area[forest.img] + 0.01

    n_side = 2 ** (cur_level - 1)
    bh, bw = budgeter.H / n_side, budgeter.W / n_side

    all_px, all_py, all_leaf = [], [], []
    for li in range(forest.n_leaves):
        img = int(forest.img[li])
        if deepest[li] and cur_level in cache[img]:
            bi = min(int(forest.boxes[li, 0] // bh), n_side - 1)
            bj = min(int(forest.boxes[li, 1] // bw), n_side - 1)
            pts = cache[img][cur_level][bi, bj]
            px, py = pts[:, 0], pts[:, 1]
        else:
            n = 10 if not deepest[li] else int(counts[li])
            leaf_of, px, py = budgeter._draw_uniform_pixels(
                forest.boxes[li : li + 1], np.array([n])
            )
        all_px.append(px)
        all_py.append(py)
        all_leaf.append(np.full(len(px), li, np.int32))

    px = np.concatenate(all_px)
    py = np.concatenate(all_py)
    leaf = np.concatenate(all_leaf)
    img_of = forest.img[leaf]
    from flnerf_tpu.rays.quadtree import RayEpoch

    perm = budgeter.rng.permutation(px.shape[0])
    return RayEpoch(
        origins=budgeter.origins[img_of, px, py][perm],
        dirs=budgeter.dirs[img_of, px, py][perm],
        rgb=budgeter.images[img_of, px, py][perm],
        leaf_id=leaf[perm],
        n_leaves=forest.n_leaves,
    )
