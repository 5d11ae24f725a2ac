#!/bin/bash
# Sequential TPU perf queue for round 3 — exactly ONE TPU client at a time
# (the axon tunnel serializes clients; concurrent use wedges everyone).
# Results append to /tmp/perf_queue.log with timestamps.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/perf_queue.log; }

log "=== queue start ==="

log "budget (pruned variants, batch 4)"
python scripts/perf_budget.py --batch 4 --variants \
  baseline,no_attn,attn_relayout_only,no_conv3,conv3_center_tap,no_unet \
  >> /tmp/perf_queue.log 2>&1
log "budget done rc=$?"

log "batch sweep 8 with block_q 0/1024"
python scripts/perf_batch_sweep.py --batches 8 --blocks 0,1024 >> /tmp/perf_queue.log 2>&1
log "sweep8 done rc=$?"

log "budget remainder (ff/gn/conv1)"
python scripts/perf_budget.py --batch 4 --variants \
  baseline,no_ff,no_groupnorm,no_conv1,no_layernorm \
  >> /tmp/perf_queue.log 2>&1
log "budget2 done rc=$?"

log "=== queue end ==="
