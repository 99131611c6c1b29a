#!/bin/bash
# Round-5 second measurement pass (VERDICT items 3, 4, 5, 9): quality
# re-certification + reference-budget rows + onboard pipeline + batch probe.
# One TPU job at a time (CLAUDE.md rule 10).
cd /root/repo
echo "=== r5b queue start $(date +%H:%M:%S)"
echo "--- 0. scene-SDF precision A/B (VERDICT item 7; bf16 arm re-run after"
echo "---    the cmpf->abs-form Mosaic fix in _scene_min_dist)"
NEO_SCENE_PRECISION=f32 timeout 2400 python examples/scene_prec_check.py \
    > /tmp/q_prec_f32.log 2>&1
echo "prec_f32 exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_prec_f32.log
NEO_SCENE_PRECISION=bf16 timeout 2400 python examples/scene_prec_check.py \
    > /tmp/q_prec_bf16.log 2>&1
echo "prec_bf16 exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_prec_bf16.log
NEO_SCENE_PRECISION=bf16 timeout 3600 python bench.py \
    > /tmp/q_bench_bf16.log 2>&1
echo "bench_bf16 exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench_bf16.log
echo "--- 1. profile_segment (full deployed profile, iters 32 + 128)"
PS_FULL_ITERS=32,128 timeout 7200 python examples/profile_segment.py \
    > /tmp/q_seg_full.log 2>&1
echo "seg_full exit=$? $(date +%H:%M:%S)"; tail -6 /tmp/q_seg_full.log
echo "--- 2. onboard 640x480 pipeline"
VIS_NET=artifacts/planner_net_resnet640 VIS_B=128 timeout 4800 \
    python examples/profile_vision.py > /tmp/q_vis640.log 2>&1
echo "vis640 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis640.log
echo "--- 2b. scene B=1024 (refresh the stale flagship row)"
BENCH_ENVS=1024 timeout 3600 python bench.py > /tmp/q_bench1024.log 2>&1
echo "bench1024 exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench1024.log
echo "--- 3. scene B=8192 probe"
BENCH_ENVS=8192 timeout 7200 python bench.py > /tmp/q_bench8192.log 2>&1
echo "bench8192 exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_bench8192.log
echo "--- 4. marathon quality re-certification (round-5 default stack)"
timeout 14400 python examples/marathon.py > /tmp/q_marathon.log 2>&1
echo "marathon exit=$? $(date +%H:%M:%S)"; tail -20 /tmp/q_marathon.log
echo "=== r5b queue done $(date +%H:%M:%S)"
