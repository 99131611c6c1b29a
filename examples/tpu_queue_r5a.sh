#!/bin/bash
# Round-5 measurement pass after the lazy bank + new renderer + multi-frame
# fusion land (one TPU job at a time, CLAUDE.md rule 10).
cd /root/repo
echo "=== r5a queue start $(date +%H:%M:%S)"
echo "--- 1. bench.py flagship (lazy bank)"
timeout 3600 python bench.py > /tmp/q_bench.log 2>&1
echo "bench exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_bench.log
echo "--- 2. bench.py lazy-bank A/B (NEO_BANK=full)"
NEO_BANK=full timeout 3600 python bench.py > /tmp/q_bench_full.log 2>&1
echo "bench_full exit=$? $(date +%H:%M:%S)"; tail -3 /tmp/q_bench_full.log
echo "--- 3. profile_vision B=512"
timeout 3600 python examples/profile_vision.py > /tmp/q_vis512.log 2>&1
echo "vis512 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis512.log
echo "--- 4. profile_vision B=4096"
VIS_B=4096 timeout 4800 python examples/profile_vision.py > /tmp/q_vis4096.log 2>&1
echo "vis4096 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis4096.log
echo "--- 5. profile_vision B=2048 (stale-row refresh)"
VIS_B=2048 timeout 4800 python examples/profile_vision.py > /tmp/q_vis2048.log 2>&1
echo "vis2048 exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_vis2048.log
echo "=== r5a queue done $(date +%H:%M:%S)"
