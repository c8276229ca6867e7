#!/bin/bash
# Prime the persistent host-keyed XLA compile cache for every bench stage so
# the driver's end-of-round `python bench.py` hits warm compiles instead of
# timing out on cold ones (TPU compiles over the tunnel: 10-600 s each).
#
# Thin wrapper over the canonical implementation, `python bench.py --prime`
# (doubled per-stage ceilings, waits out tunnel outages, exits nonzero if any
# stage stayed cold):
#   bash scripts/prime_bench.sh            # all stages
#   bash scripts/prime_bench.sh detect ... # subset
set -u
cd "$(dirname "$0")/.."
if [ $# -gt 0 ]; then
  EIOKU_PRIME_STAGES="$(IFS=,; echo "$*")" exec python bench.py --prime
fi
exec python bench.py --prime
