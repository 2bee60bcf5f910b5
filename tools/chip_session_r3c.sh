#!/bin/bash
# Round-3 continuation chip session: run queued measurements in priority
# order once the axon relay is back. Each leg is timeout-bounded (the
# relay can die mid-session; a dead relay hangs axon processes silently).
# usage: bash tools/chip_session_r3c.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_r3c}
mkdir -p "$LOG"

run() { # name, timeout_s, cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  echo "--- $name exit=$? tail:"; tail -5 "$LOG/$name.log"
}

# 0. relay sanity — ABORT if the relay is dead (every later leg would
# burn its full timeout hanging silently)
if ! timeout 120 python /tmp/probe_tpu.py >"$LOG/probe.log" 2>&1; then
  echo "relay dead (probe timed out) — aborting"; exit 1
fi
echo "relay alive"

# 1. XLA-path scoped-vmem sweep on the flagship (3 heavy compiles) —
#    the direct lever on the headline bench number
run xla_sweep 3600 python tools/vmem_sweep.py xla

# 2. frozen-BN finetune throughput (2 heavy compiles)
run ft_frozenbn 2400 python tools/profile_train_step.py finetune_frozenbn
run ft_i3d_frozenbn 2400 python tools/profile_train_step.py ft_i3d_frozenbn

# 3. kernel VMEM-fit probes at raised limit (cheap AOT errors)
run vmem_fit 3600 python tools/vmem_sweep.py fit

# 4. fused in-model A/B at raised limit (long Mosaic compiles) — only
#    worth the time if stage 3 showed coarse tiles fitting
run vmem_fused 5400 python tools/vmem_sweep.py fused

echo "=== done ($(date +%H:%M:%S)); logs in $LOG ==="
