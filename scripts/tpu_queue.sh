#!/bin/sh
# Serialized TPU measurement queue — run ONE at a time (the axon tunnel
# serializes remote compiles; concurrent processes block each other).
# Every leg goes through scripts/tpu_run.sh (kill+retry: the tunnel
# intermittently wedges mid-compile — observed ~every other heavy
# process on 2026-08-20). Run the moment the tunnel responds:
#   sh scripts/tpu_queue.sh 2>&1 | tee /tmp/queue_$(date +%H%M).log
cd /root/repo
RUN="sh scripts/tpu_run.sh"
echo "=== queue start $(date)"
echo "--- 0. TPU parity with DS_APPROX_RECIP=1 (the round-4 default-flip decider)"
DS_APPROX_RECIP=1 TPU_RUN_TIMEOUT=1500 $RUN python scripts/tpu_parity.py 2>&1 | grep -v WARNING
echo "--- 1. bench (defaults; zero-drop headline + cap4@384 + device-steady)"
TPU_RUN_TIMEOUT=1500 $RUN python bench.py 2>&1 | grep -v WARNING
echo "--- 2. FPS step bench (SD2.1 arch, 50K, config #2) -> BENCH_FPS_r04.json"
TPU_RUN_TIMEOUT=2400 $RUN python scripts/bench_fps_step.py 2>&1 | grep -v WARNING | tee /tmp/bench_fps_r04.out
echo "--- 3. compositional 5-obj 800x800 (config #3) -> BENCH_COMP_r04.json"
TPU_RUN_TIMEOUT=1500 $RUN python scripts/bench_compositional.py 2>&1 | grep -v WARNING | tee /tmp/bench_comp_r04.out
echo "--- 4. trace (per-kernel step budget at round-4 defaults)"
TPU_RUN_TIMEOUT=1200 $RUN python scripts/trace_bench.py 2>&1 | tail -3
timeout 300 python scripts/decode_trace.py /tmp/jtrace 2>&1 | head -45
echo "--- 5. grad-gather/sort micro at the new entry counts (VERDICT r3 item 2)"
TPU_RUN_TIMEOUT=1500 $RUN python scripts/micro_grad_gather.py 2>&1 | grep -v WARNING | tail -20
echo "--- 6. on-chip training soak (1500 iters; VERDICT r3 item 5) — LONG"
TPU_RUN_TIMEOUT=7200 TPU_RUN_TRIES=2 $RUN python scripts/soak_object_train.py 2>&1 | grep -v WARNING | tail -5
echo "=== queue done $(date)"
