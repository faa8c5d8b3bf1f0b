#!/bin/bash
# Round-5 phase-1 chip queue: the decisive A/Bs, front-loaded per VERDICT r4
# ("run all chip work early in the round, never kill a TPU-side process").
# Each job runs under `timeout` and is allowed to expire naturally; outputs
# land in chip_r05/.  Sequential — the relay serializes anyway and parallel
# host jobs distort timings (CLAUDE.md).
set -u
mkdir -p chip_r05
cd "$(dirname "$0")"

run() {
  local name=$1 cap=$2; shift 2
  echo "=== $name (cap ${cap}s) start $(date +%T) ===" | tee -a chip_r05/queue.log
  timeout "$cap" "$@" > "chip_r05/${name}.out" 2> "chip_r05/${name}.err"
  local rc=$?
  echo "=== $name rc=$rc end $(date +%T) ===" | tee -a chip_r05/queue.log
}

run layout_s1   3600 python bench_s1_layout.py
run layout_ab   3600 python bench_layout_ab.py
run bitecon     2700 python bench_bitecon.py
run s1_serve    2400 python bench_extra.py --sub stage1_serve
echo "PHASE1 DONE $(date +%T)" | tee -a chip_r05/queue.log
