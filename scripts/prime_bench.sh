#!/bin/bash
# Prime the persistent host-keyed XLA compile cache for every bench stage so
# the driver's end-of-round `python bench.py` hits warm compiles instead of
# timing out on cold ones (TPU compiles over the tunnel: 10-600 s each).
#
# Run from the repo root once the TPU tunnel is alive:
#   bash scripts/prime_bench.sh            # all stages
#   bash scripts/prime_bench.sh detect ... # subset
# Each stage runs in its own process (same as the orchestrator) and is
# individually timeout-bounded; a failed/slow stage does not stop the rest.
set -u
cd "$(dirname "$0")/.."
STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(query scenes embed detect detect_m combined pipeline clip
          detect_int8 embed_int8 whisper_beam whisper_beam_full whisper_int8 whisper)
fi
for s in "${STAGES[@]}"; do
  echo "=== priming stage: $s ==="
  timeout 900 python bench.py --stage "$s" || echo "stage $s rc=$? (continuing)"
done
echo "=== cache dir ==="
python -c "from eioku_tpu.utils.device import compile_cache_dir as c; print(c())"
