#!/bin/bash
# Round-4 second pass: bf16 scene-SDF A/B (one TPU job at a time).
cd /root/repo
echo "=== r4b queue start $(date +%H:%M:%S)"
echo "--- 1. scene precision exactness, f32 arm"
NEO_SCENE_PRECISION=f32 timeout 2400 python examples/scene_prec_check.py > /tmp/q_prec_f32.log 2>&1
echo "prec-f32 exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_prec_f32.log
echo "--- 2. scene precision exactness, bf16 arm"
NEO_SCENE_PRECISION=bf16 timeout 2400 python examples/scene_prec_check.py > /tmp/q_prec_bf16.log 2>&1
echo "prec-bf16 exit=$? $(date +%H:%M:%S)"; tail -4 /tmp/q_prec_bf16.log
echo "--- 3. bench flagship, bf16 scene SDF"
NEO_SCENE_PRECISION=bf16 timeout 3000 python bench.py > /tmp/q_bench_bf16.log 2>&1
echo "bench-bf16 exit=$? $(date +%H:%M:%S)"; tail -2 /tmp/q_bench_bf16.log
echo "=== r4b queue done $(date +%H:%M:%S)"
