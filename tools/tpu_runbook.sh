#!/bin/bash
# One-shot TPU session: run the pending TPU work items in sequence the
# moment the tunnel is back.  Each step is individually time-bounded and
# logged; a failed/hung step does not block the rest (except the probe
# gate).  Results land in tools/tpu_results/.
#
#   bash tools/tpu_runbook.sh            # full sequence
#   STEPS="probe bench" bash tools/tpu_runbook.sh
#
# Steps:
#   probe    - trivial device op (gate: abort everything if this hangs)
#   bench    - flagship heat 256^2x64 ParaDiag measurement (+ cache warm)
#   profile  - component-level pc timing breakdown (tools/profile_pc.py)
#   tune     - ParaDiag knob sweep (iterations + seconds per variant)
#   stokes   - BENCH_CONFIG=stokes retry (fused incompressible on TPU)
#   heat3d   - BENCH_CONFIG=heat3d secondary config
set -u
cd "$(dirname "$0")/.."
OUT=tools/tpu_results
mkdir -p "$OUT"
STAMP=$(date +%Y%m%d_%H%M%S)
STEPS=${STEPS:-"probe bench profile tune stokes heat3d nse"}

log() { echo "[tpu_runbook $(date +%H:%M:%S)] $*"; }

run_step() {
    local name=$1 tmo=$2; shift 2
    log "step $name: $*"
    ( timeout "$tmo" "$@" ) >"$OUT/${name}_$STAMP.log" 2>&1
    local rc=$?
    log "step $name done rc=$rc -> $OUT/${name}_$STAMP.log"
    return $rc
}

for s in $STEPS; do
case $s in
probe)
    if ! run_step probe 180 python bench.py --probe; then
        log "tunnel still down; aborting"
        exit 1
    fi
    ;;
bench)
    # full orchestrated bench (probe gate inside, watchdogged measurement,
    # cpu-proxy comparison); also warms the persistent compile cache
    run_step bench 5400 python bench.py
    tail -1 "$OUT/bench_$STAMP.log" | grep -o '{.*}' || true
    ;;
profile)
    run_step profile 3600 python tools/profile_pc.py
    ;;
tune)
    TUNE_GRID='[{}, {"cycles":1}, {"cycles":1,"smooth":[4,4]}, {"cycles":1,"smooth":[6,6]}, {"cycles":1,"smooth":[4,4],"dc":0,"alpha":0.01}, {"cycles":1,"smooth":[4,4],"dc":0,"alpha":0.03}, {"cycles":1,"smooth":[4,4],"weight_dtype":"bfloat16"}, {"cycles":1,"smooth":[4,4],"mass_steps":12}]' \
    TUNE_REPEATS=2 \
    run_step tune 7200 python tools/tune_paradiag.py
    ;;
stokes)
    # fused single-program incompressible solve previously kernel-faulted
    # the axon backend; the pc state is now passed as arguments -- retry
    if ! BENCH_CONFIG=stokes run_step stokes 3600 python bench.py; then
        # first unattended exercise of the vector Pallas smoother: if it
        # is what broke, retry on the XLA vector fallback
        CONTROL_TPU_NO_VECTOR_PALLAS=1 BENCH_CONFIG=stokes \
            run_step stokes_novec 3600 python bench.py
    fi
    ;;
heat3d)
    BENCH_CONFIG=heat3d run_step heat3d 3600 python bench.py
    ;;
nse)
    # nonlinear Picard NSE through the state-as-argument host loop
    BENCH_CONFIG=nse run_step nse 3600 python bench.py
    ;;
*) log "unknown step $s";;
esac
done
log "runbook complete; results in $OUT/"
