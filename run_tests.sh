#!/bin/sh
# Hermetic CPU test runner. The session environment injects a TPU-tunnel
# sitecustomize via PYTHONPATH which hijacks every python process onto the
# single remote chip (serialized remote compiles); tests must run on local
# CPU with 8 virtual devices instead.
export PYTHONPATH=""
unset PALLAS_AXON_POOL_IPS
unset PALLAS_AXON_REMOTE_COMPILE
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
exec python -m pytest "$@"
