#!/bin/sh
# Serialized TPU measurement queue — run ONE at a time (the axon tunnel
# serializes remote compiles; concurrent processes block each other).
# Every leg goes through scripts/tpu_run.sh (kill+retry: the tunnel
# intermittently wedges mid-compile — observed ~every other heavy
# process on 2026-08-20). Run the moment the tunnel responds:
#   sh scripts/tpu_queue.sh 2>&1 | tee /tmp/queue_$(date +%H%M).log
#
# Round-5 state: all round-4 asks are flushed and committed
# (BENCH_FPS_r05.json, BENCH_COMP_r05.json, SOAK_r05.json,
# SOAK_SCENE_r05.json, approx-recip decider, DS_BWD_TCAR decider +
# 2x2 A/B). The legs below are the MAINTENANCE set — re-run after any
# kernel change, in this order.
cd /root/repo
RUN="sh scripts/tpu_run.sh"
echo "=== queue start $(date)"
echo "--- 0. full-scale compiled-kernel parity at shipped defaults"
TPU_RUN_TIMEOUT=1800 $RUN python scripts/tpu_parity.py 2>&1 | grep -v WARNING
echo "--- 1. bench (zero-drop headline + cap4 companion + device-steady)"
TPU_RUN_TIMEOUT=1500 $RUN python bench.py 2>&1 | grep -v WARNING
echo "--- 2. trace (per-kernel step budget; compare against SOL.md table)"
TPU_RUN_TIMEOUT=1200 $RUN python scripts/trace_bench.py 2>&1 | tail -3
timeout 300 python scripts/decode_trace.py /tmp/jtrace 2>&1 | head -45
echo "--- 3. A/B harness: interleave gate legs like
---     for leg in off1 on1 off2 on2; do DS_<GATE>=\$g BENCH_SKIP_CAP4=1 \
---       TPU_RUN_TIMEOUT=1200 \$RUN python bench.py; done
---     (device_steady is the decider; host-loop drifts with the tunnel)"
echo "=== queue done $(date)"
