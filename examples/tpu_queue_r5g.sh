#!/bin/bash
# Round-5 seventh pass: the lazy-bank bit-equality probe (see
# examples/probe_lazy_equiv.py docstring). Chains on r5f.
cd /root/repo
if [ -f /tmp/q_r5f.pid ]; then
    while kill -0 "$(cat /tmp/q_r5f.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== r5g queue start $(date +%H:%M:%S)"
timeout 3600 python examples/probe_lazy_equiv.py > /tmp/q_lazy_equiv.log 2>&1
echo "lazy_equiv exit=$? $(date +%H:%M:%S)"; tail -8 /tmp/q_lazy_equiv.log
echo "=== r5g queue done $(date +%H:%M:%S)"
