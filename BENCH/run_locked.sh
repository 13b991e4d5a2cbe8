#!/bin/bash
# Run a repo workload without contaminating a measured scaling round.
#
# Protocol (see run_scaling_when_quiet.py): repo-side workloads hold
# /tmp/lshse_busy so the gated driver never LAUNCHES a round while we
# run; but a round already in flight must be allowed to drain first —
# so: take the lock, wait for any bench_scaling java level to exit,
# then run the command, then release.
set -u
touch /tmp/lshse_busy
trap 'rm -f /tmp/lshse_busy' EXIT
for i in $(seq 1 240); do
    if ! pgrep -f "scaling-(4|8|16|2)\b" >/dev/null \
       && ! pgrep -f "bench_scaling.py" >/dev/null; then
        break
    fi
    sleep 15
done
"$@"
