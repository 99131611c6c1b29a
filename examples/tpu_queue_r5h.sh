#!/bin/bash
# Round-5 eighth pass: validate the polar_columns HBM rewrite (no rotated
# world-dirs tensor; flattened (E*F) vmap in the multi-frame fusion path).
#   1. Vision B=4096 regression check (BASELINE row: 806.9k steps/s).
#   2. Vision B=8192 probe — previously OOM at compile (16.89G vs 15.75G
#      hbm; the f32[8192,5,30,160,3] world-points temp padded 2.56x).
cd /root/repo
echo "=== r5h queue start $(date +%H:%M:%S)"
echo "--- 1. profile_vision B=4096"
VIS_B=4096 timeout 4800 python examples/profile_vision.py \
    > /tmp/q_vis4096_r5h.log 2>&1
echo "vis4096 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis4096_r5h.log
echo "--- 2. vision B=8192 probe"
VIS_B=8192 VIS_BREAKDOWN=0 VIS_SEGMENTS=2 timeout 4800 \
    python examples/profile_vision.py > /tmp/q_vis8192_r5h.log 2>&1
echo "vis8192 exit=$? $(date +%H:%M:%S)"; tail -6 /tmp/q_vis8192_r5h.log
echo "=== r5h queue done $(date +%H:%M:%S)"
