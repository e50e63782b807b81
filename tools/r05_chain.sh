#!/bin/bash
# Round-5 long-measurement chain (run unattended on a quiet host, real TPU).
# Order: shortest artifact first so results land early; the multi-hour
# headline band goes last.  Each step logs to docs/measurements/logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/measurements/logs

echo "[chain] 1/3 release quality + max_batch corpus A/B" >&2
PYTHONPATH=. timeout 7200 python tools/release_quality_run.py \
    > docs/measurements/logs/release_quality_r05.log 2>&1
echo "[chain] 1/3 done rc=$?" >&2

echo "[chain] 2/3 full-budget somatosensory parity cell" >&2
PARITY_OUTER=10 PARITY_CELLS=somatosensory PYTHONPATH=. timeout 10800 \
    python tools/parity_matrix.py \
    > docs/measurements/logs/parity_somato_full_r05.log 2>&1
echo "[chain] 2/3 done rc=$?" >&2

echo "[chain] 3/3 headline bench band (3 interleaved full rounds)" >&2
PYTHONPATH=. timeout 14400 python tools/bench_band.py \
    > docs/measurements/logs/bench_band_r05.log 2>&1
echo "[chain] 3/3 done rc=$?" >&2
echo "[chain] all done" >&2
