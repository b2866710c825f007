#!/bin/bash
# Babysitter for the tagged TPU sweeps: retry a sweep script until it
# completes, waiting out tunnel wedges between attempts.
#
#   bash scripts/babysit_sweep.sh scripts/measure_round5c.sh
#
# Each attempt re-runs the whole script; completed tags are skipped by its
# resume guard, so only missing rows cost TPU time. The sweep scripts exit
# 2 when the health gate fails and 3 on a mid-sweep wedge abort — both are
# retryable. Probes stay >= RETRY_S apart (CLAUDE.md: rapid killed probes
# can EXTEND a wedge; outages can last 5+ hours, so attempts are capped by
# MAX_TRIES not wall-clock).
set -u
SWEEP="${1:?usage: babysit_sweep.sh <sweep-script> [max_tries]}"
MAX_TRIES="${2:-12}"
RETRY_S="${RETRY_S:-1200}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$MAX_TRIES"); do
    echo "=== babysitter attempt $i/$MAX_TRIES ($(date -u +%H:%M:%S)) ==="
    bash "$SWEEP"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "babysitter: sweep completed on attempt $i"
        exit 0
    fi
    echo "babysitter: sweep rc=$rc; retrying in ${RETRY_S}s"
    sleep "$RETRY_S"
done
echo "babysitter: giving up after $MAX_TRIES attempts"
exit 1
