"""Summarize BENCH_ablation_quadtree.json: per-threshold speedup stats
across seeds + the at_allpixel_final equal-quality statistic.

Run: python tools/ablation_stats.py [path]
"""

import json
import sys

import numpy as np


def main(path="BENCH_ablation_quadtree.json"):
    art = json.load(open(path))
    for backend, sps in art["speedups"].items():
        print(f"=== {backend} ({len(sps)} seeds)")
        for t in art["thresholds"]:
            key = f"psnr_{t:g}"
            vals = [sp[key] for sp in sps if key in sp]
            if not vals:
                continue
            mean = float(np.mean(vals))
            med = float(np.median(vals))
            spread = (100.0 * (max(vals) - min(vals)) / mean
                      if len(vals) > 1 else 0.0)
            allseeds = "all" if len(vals) == len(sps) else f"{len(vals)}"
            print(f"  {key:10s} n={allseeds:3s} mean={mean:.3f} "
                  f"median={med:.3f} spread={spread:.0f}% {vals}")
        eq = [sp["at_allpixel_final"] for sp in sps
              if isinstance(sp.get("at_allpixel_final"), dict)]
        good = [e["speedup"] for e in eq if e.get("speedup")]
        if good:
            print(f"  at_allpixel_final: n={len(good)} "
                  f"median={float(np.median(good)):.3f} "
                  f"mean={float(np.mean(good)):.3f} per-seed={good}")
            for e in eq:
                print(f"    allpixel end {e['allpixel_end_psnr']} dB in "
                      f"{e['allpixel_wall_s']} s -> quadtree "
                      f"{e['quadtree_t_s']} s ({e['speedup']}x)")


if __name__ == "__main__":
    main(*sys.argv[1:])
