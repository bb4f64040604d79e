#!/bin/bash
# Staged on-chip sequence to run when the axon tunnel recovers.
# Each stage is its own process under a timeout; stages never overlap
# (docs/TPU_NOTES.md: two concurrent TPU processes can wedge the tunnel).
# Usage: bash experiments/on_recovery.sh 2>&1 | tee /tmp/recovery.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

echo "=== stage 0: health probe"
timeout 300 python -c "
import jax, jax.numpy as jnp
(jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready()
print('TPU OK')" || { echo 'TUNNEL STILL DOWN'; exit 1; }

echo "=== stage 1: v4 compile-only (tiny frame)"
timeout 900 python experiments/v4_safe_probe.py compile || {
  echo 'V4 COMPILE FAILED'; exit 2; }

echo "=== stage 2: v4 tiny frame execute + readback"
timeout 900 python experiments/v4_safe_probe.py tiny || {
  echo 'V4 TINY RUN FAILED (tunnel may be wedged again — STOP)'; exit 3; }

echo "=== stage 3: v4 1080p steady-state timing"
timeout 1500 python experiments/v4_safe_probe.py time || {
  echo 'V4 TIMING FAILED'; exit 4; }

echo "=== stage 4: headline bench, v3 path"
timeout 1500 python bench.py || echo 'V3 BENCH FAILED'

echo "=== stage 5: headline bench, v4 path"
timeout 1500 env VOXELTPU_TRACER=v4 python bench.py || echo 'V4 BENCH FAILED'

echo "=== done"
