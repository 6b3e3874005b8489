#!/bin/bash
# Round-4 TPU session 3: validate the lattice promotion end-to-end.
# Sequential (TPU tile is single-claim). NO timeout wrappers (wedge hazard).
cd /root/repo
echo "=== full bench.py (lattice default) $(date)"
python -u bench.py 2>&1
echo "=== __graft_entry__ $(date)"
python -u __graft_entry__.py 2>&1
echo "=== CLI smoke main_nerf (lattice path) $(date)"
python -u -m flnerf_tpu.cli.main_nerf synthetic -O --iters 64 --synth_h 32 2>&1 | tail -5
echo "ALLDONE $(date)"
