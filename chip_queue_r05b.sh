#!/bin/bash
# Round-5 phase-2 chip queue: serve diagnosis, full perf matrix
# (BENCH_extra_r05.jsonl, VERDICT r4 #6), quality artifact (EVAL_r05.json,
# VERDICT r4 #8).  Same hygiene as phase 1: sequential, timeout-bounded,
# never killed mid-compile; outputs land in chip_r05/.
set -u
cd "$(dirname "$0")"
mkdir -p chip_r05

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name (cap ${cap}s) start $(date +%T) ===" | tee -a chip_r05/queue.log
  timeout "$cap" "$@" > "chip_r05/${name}.out" 2> "chip_r05/${name}.err"
  local rc=$?
  echo "=== $name rc=$rc end $(date +%T) ===" | tee -a chip_r05/queue.log
}

run s1_serve_diag 1200 python bench_s1_serve_diag.py
EMODIS_EXTRA_SECTION_TIMEOUT=900 run extra_full 4800 python bench_extra.py
grep '^{' chip_r05/extra_full.out > BENCH_extra_r05.jsonl
run eval 2400 python bench_eval.py EVAL_r05.json
echo "PHASE2 DONE $(date +%T)" | tee -a chip_r05/queue.log
