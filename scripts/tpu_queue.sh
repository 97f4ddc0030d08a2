#!/bin/sh
# Serialized TPU measurement queue — run ONE at a time (the axon tunnel
# serializes remote compiles). Run the moment the tunnel responds:
#   sh scripts/tpu_queue.sh 2>&1 | tee /tmp/queue_$(date +%H%M).log
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5
echo "=== queue start $(date)"
echo "--- 0. bench BASELINE (defaults, post mask-redirect)"
timeout 900 python bench.py 2>&1 | grep -v WARNING
echo "--- 1. bench A/B: packed grad gather"
timeout 900 env DS_PACKED_GRAD_GATHER=1 python bench.py 2>&1 | grep -v WARNING
echo "--- 2. bench A/B: both packed gathers"
timeout 900 env DS_PACKED_GRAD_GATHER=1 DS_PACKED_REC_GATHER=1 python bench.py 2>&1 | grep -v WARNING
echo "--- 3. bench A/B: + caps via sort"
timeout 900 env DS_PACKED_GRAD_GATHER=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python bench.py 2>&1 | grep -v WARNING
echo "--- 3a. bench A/B: dense VJP chain (supersedes packed grad gather)"
timeout 900 env DS_DENSE_VJP=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python bench.py 2>&1 | grep -v WARNING
echo "--- 3b. bench A/B: + chunk=512 (re-tune with cheap gathers)"
timeout 900 env BENCH_CHUNK=512 DS_PACKED_GRAD_GATHER=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python bench.py 2>&1 | grep -v WARNING
echo "--- 4. gather microbench (cliff sweep + packed variants)"
timeout 1200 python scripts/micro_gather5.py 2>&1 | grep -v WARNING
echo "--- 5. TPU parity (compiled vs golden, default gates)"
timeout 1500 python scripts/tpu_parity.py 2>&1 | grep -v WARNING
echo "--- 5b. TPU parity with candidate gates (validates any flip)"
timeout 1500 env DS_DENSE_VJP=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python scripts/tpu_parity.py 2>&1 | grep -v WARNING
echo "--- 6. trace with best gates (decode for the misc bucket)"
timeout 900 env DS_PACKED_GRAD_GATHER=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python scripts/trace_bench.py 2>&1 | tail -3
timeout 300 python scripts/decode_trace.py /tmp/jtrace 2>&1 | head -45
echo "--- 6b. HLO padded-bytes ranking with best gates"
timeout 900 env DS_DENSE_VJP=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python scripts/dump_hlo.py 2>&1 | head -3
timeout 120 python scripts/hlo_bytes.py /tmp/bench_hlo.txt 2>&1 | head -40
echo "--- 7. bench zero-drop capacity (8N) best gates"
timeout 900 env BENCH_CAP_MULT=8 DS_PACKED_GRAD_GATHER=1 DS_PACKED_REC_GATHER=1 DS_CAPS_VIA_SORT=1 python bench.py 2>&1 | grep -v WARNING
echo "--- 8. flash attention A/B + parity (SD2.1 arch)"
timeout 1800 python scripts/flash_ab.py 2>&1 | grep -v WARNING
echo "--- 9. FPS step bench (SD2.1 arch, 50K, flash on)"
timeout 2400 python scripts/bench_fps_step.py 2>&1 | grep -v WARNING
echo "--- 10. compositional 5-obj 800x800"
timeout 1200 python scripts/bench_compositional.py 2>&1 | grep -v WARNING
echo "=== queue done $(date)"
