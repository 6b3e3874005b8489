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


def gen_rays_from_cache(budgeter, cache: dict, cur_level: int,
                        down_scale: int = 1):
    """gen_rays_v4 analog (tree.py:430-490): non-deepest leaves draw 10
    fresh uniform pixels; deepest leaves reuse the cached block pixels.

    Each deepest leaf looks up the cache level matching ITS OWN size:
    min_area drifts per image (divided by 4 only in images that split),
    so different images' deepest leaves live at different levels — using
    one global level grid would map a lagging image's leaves onto a
    single sub-block.  ``cur_level`` caps the lookup.  ``down_scale``
    must match the pre_gen_rays build so the uncached fallback draws the
    same per-area rate as the cached blocks."""
    forest = budgeter.forest
    counts = budgeter.ray_counts(down_scale, forest)
    areas = forest.areas()
    deepest = areas <= forest.min_area[forest.img] + 0.01

    # leaf side -> its uniform-partition level: H / 2^(l-1) px per block
    heights = np.maximum(forest.boxes[:, 2] - forest.boxes[:, 0], 1e-9)
    levels = np.rint(1.0 + np.log2(budgeter.H / heights)).astype(np.int64)

    all_px, all_py, all_leaf = [], [], []
    fresh_leaves, fresh_counts = [], []
    for li in range(forest.n_leaves):
        img = int(forest.img[li])
        lvl = min(int(levels[li]), cur_level)
        if deepest[li] and lvl in cache[img]:
            n_side = 2 ** (lvl - 1)
            bh, bw = budgeter.H / n_side, budgeter.W / n_side
            bi = min(int(forest.boxes[li, 0] // bh), n_side - 1)
            bj = min(int(forest.boxes[li, 1] // bw), n_side - 1)
            pts = cache[img][lvl][bi, bj]
            all_px.append(pts[:, 0])
            all_py.append(pts[:, 1])
            all_leaf.append(np.full(pts.shape[0], li, np.int32))
        else:
            fresh_leaves.append(li)
            fresh_counts.append(10 if not deepest[li] else int(counts[li]))

    if fresh_leaves:
        # ONE batched draw for every uncached leaf (per-leaf calls are a
        # host-side hot spot on the 1-core host, CLAUDE.md)
        idx = np.asarray(fresh_leaves, np.int64)
        leaf_of, px_f, py_f = budgeter._draw_uniform_pixels(
            forest.boxes[idx], np.asarray(fresh_counts, np.int64))
        all_px.append(px_f)
        all_py.append(py_f)
        all_leaf.append(idx[leaf_of].astype(np.int32))

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
        # coherence keys so offline-cache epochs keep the Pallas voxel
        # kernel path (plenoxels_trainer gates on px is not None)
        px=px[perm].astype(np.int32),
        py=py[perm].astype(np.int32),
        img=img_of[perm].astype(np.int32),
    )
