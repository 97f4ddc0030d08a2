#!/bin/sh
# Retry wrapper for TPU jobs over the flaky axon tunnel: the remote
# compile service intermittently wedges (client blocks forever at ~0
# CPU; observed ~every other heavy-compile process on 2026-08-20).
# Kill at $TPU_RUN_TIMEOUT (default 1200s) and retry up to
# $TPU_RUN_TRIES (default 3). A successful run prints its output and
# exits 0; all-attempts-hung exits 124.
#   sh scripts/tpu_run.sh python bench.py
#   TPU_RUN_TIMEOUT=2400 sh scripts/tpu_run.sh python scripts/tpu_parity.py
t=${TPU_RUN_TIMEOUT:-1200}
n=${TPU_RUN_TRIES:-3}
i=1
while [ "$i" -le "$n" ]; do
    echo "--- tpu_run attempt $i/$n (timeout ${t}s): $*" >&2
    timeout "$t" "$@"
    rc=$?
    [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ] && exit "$rc"
    echo "--- tpu_run: attempt $i timed out (rc=$rc); retrying" >&2
    sleep 30   # let the tunnel-side service clean up the dead client
    i=$((i + 1))
done
exit 124
