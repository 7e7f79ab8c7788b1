#!/bin/bash
# Quiet-box measurement sequence for the round-4 recorded rows.
# Run ONLY after the 1 GB extmem run has finished (serialize!).
set -e
cd "$(dirname "$0")/.."

echo "== 1 GB extmem result =="
grep PEAK /tmp/run1g.log || true
ls -la /tmp/out1g/ | head -5

echo "== ours 16-strain (quiet box) =="
rm -rf /tmp/m_s16_ours
SIBELIA_TPU_TRACE=1 JAX_PLATFORMS=cpu \
  python3 -m sibelia_tpu.cli.sibelia -s loose -o /tmp/m_s16_ours \
  /tmp/s16.fasta > /tmp/m_s16_ours.log 2>&1
grep trace /tmp/m_s16_ours.log || true

echo "== reference 16-strain (quiet box, ~13 min) =="
rm -rf /tmp/m_s16_ref
/usr/bin/env time -v true 2>/dev/null || true
t0=$(date +%s)
.ref_build/Sibelia -s loose -o /tmp/m_s16_ref /tmp/s16.fasta \
  > /tmp/m_s16_ref.log 2>&1
t1=$(date +%s)
echo "reference_s $((t1 - t0))"

diff -q /tmp/m_s16_ours/blocks_coords.txt /tmp/m_s16_ref/blocks_coords.txt \
  && echo BLOCKS_IDENTICAL
diff -q /tmp/m_s16_ours/coverage_report.txt \
  /tmp/m_s16_ref/coverage_report.txt && echo COVERAGE_IDENTICAL
