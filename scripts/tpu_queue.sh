#!/bin/sh
# Serialized TPU measurement queue — run ONE at a time (the axon tunnel
# serializes remote compiles). Run the moment the tunnel responds:
#   sh scripts/tpu_queue.sh 2>&1 | tee /tmp/queue_$(date +%H%M).log
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
echo "=== queue start $(date)"
echo "--- 0. bench (defaults; headline + zero-drop in one JSON line)"
timeout 1800 python bench.py 2>&1 | grep -v WARNING
echo "--- 1. bench A/B: caps-via-sort OFF (the round-2 default-flip decider)"
timeout 900 env BENCH_SKIP_CAP4=1 BENCH_SKIP_DEVICE_STEADY=1 DS_CAPS_VIA_SORT=0 python bench.py 2>&1 | grep -v WARNING
echo "--- 2. TPU parity (compiled vs golden, mid + full-scale fwd/grad)"
timeout 1800 python scripts/tpu_parity.py 2>&1 | grep -v WARNING
echo "--- 3. trace (decode for the per-kernel breakdown)"
timeout 900 python scripts/trace_bench.py 2>&1 | tail -3
timeout 300 python scripts/decode_trace.py /tmp/jtrace 2>&1 | head -45
echo "--- 4. flash attention A/B + parity (SD2.1 arch)"
timeout 1800 python scripts/flash_ab.py 2>&1 | grep -v WARNING
echo "--- 5. FPS step bench (SD2.1 arch, 50K, flash on)"
timeout 2400 python scripts/bench_fps_step.py 2>&1 | grep -v WARNING
echo "--- 6. compositional 5-obj 800x800"
timeout 1200 python scripts/bench_compositional.py 2>&1 | grep -v WARNING
echo "=== queue done $(date)"
