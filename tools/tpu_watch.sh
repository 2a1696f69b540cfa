#!/bin/bash
# Tunnel watcher: probe the axon TPU tunnel every INTERVAL seconds; the
# moment a trivial device op succeeds, run the full pending-item runbook
# (tools/tpu_runbook.sh) once and exit.  Designed to sit in a tmux pane
# while CPU-side work continues elsewhere.
#
#   bash tools/tpu_watch.sh            # 900 s interval
#   INTERVAL=300 bash tools/tpu_watch.sh
set -u
cd "$(dirname "$0")/.."
OUT=tools/tpu_results
mkdir -p "$OUT"
INTERVAL=${INTERVAL:-900}

log() { echo "[tpu_watch $(date +%m%d_%H:%M:%S)] $*" | tee -a "$OUT/watch.log"; }

log "watcher started (interval ${INTERVAL}s)"
while true; do
    timeout 180 python bench.py --probe >"$OUT/watch_probe.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
        log "tunnel is UP; starting runbook"
        date > "$OUT/TUNNEL_UP"
        bash tools/tpu_runbook.sh 2>&1 | tee -a "$OUT/watch.log"
        log "runbook finished; watcher exiting"
        exit 0
    fi
    log "tunnel still down (probe rc=$rc)"
    sleep "$INTERVAL"
done
