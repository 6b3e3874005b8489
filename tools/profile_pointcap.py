"""POINT_CAP (scatter p_hi) sweep for the sorted engine — after the v2
sort, smaller chunks' scatter savings may beat the slab-span growth."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import flnerf_tpu.ops.hash_sorted as hs
from tools.profile_ngp import p_engine


def main():
    for cap in (16384, 8192, 4096):
        hs.POINT_CAP = cap
        for log2 in (19, 15):
            try:
                print(f"--- POINT_CAP={cap} log2={log2}", flush=True)
                p_engine(log2, 65536, 65536)
            except Exception as e:
                print(f"cap{cap}/{log2}: ERROR {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
