#!/bin/bash
# Record the round-5 on-chip kernel test tier (VERDICT r4 item 4).
# Runs every Pallas kernel family on the real chip; one recorded command.
set -u
cd /root/repo
OUT=TPU_TESTS_r05.txt
CMD="PMARLO_RUN_PERF=1 PMARLO_TPU_TESTS=1 python -m pytest tests/tpu tests/perf tests/unit -k 'on_tpu or perf or tpu' -q -p no:randomly"
echo "# $CMD  ($(date -u +%Y-%m-%dT%H:%M:%SZ), real v5e chip via axon; round-5 tree: Newton dedup + windowed bonded kernels, PME/lattice HIGHEST pins, TIP4P-Ew vsites, reversible ITS, amber_params loaders)" > "$OUT"
PMARLO_RUN_PERF=1 PMARLO_TPU_TESTS=1 python -m pytest tests/tpu tests/perf tests/unit \
  -k 'on_tpu or perf or tpu' -q -p no:randomly >> "$OUT" 2>&1
echo "[exit $?]" >> "$OUT"
tail -3 "$OUT"
