#!/usr/bin/env bash
# Size-sweep timing over the reference's fixture images — the exact
# methodology of the reference's test/time.sh: run the pipeline per
# fixture pair with writes disabled, awk field 15 of the timing line
# (src/stereo.c:324), average over runs.
#
# Usage: tools/time_sweep.sh [tier] [runs]
set -euo pipefail

REF=${REF:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
TIER=${1:-jax}
RUNS=${2:-3}
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

for dir in "$REF"/test/imgs/*/; do
    name=$(basename "$dir")
    total=0
    for _ in $(seq "$RUNS"); do
        line=$(python -m stereomatching_tpu.cli "$dir/a.png" "$dir/b.png" \
            --tier "$TIER" --no-writes)
        t=$(echo "$line" | awk '{print $15}')
        total=$(echo "$total + $t" | bc)
    done
    avg=$(echo "scale=6; $total / $RUNS" | bc)
    echo "$name: $avg s (tier=$TIER, avg of $RUNS)"
done
