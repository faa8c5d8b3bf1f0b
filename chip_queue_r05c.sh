#!/bin/bash
# Round-5 phase-3 chip queue: pe-op attribution microbench (the serve()
# 45 ms/step mystery) and, numbers permitting, a serve re-measure under the
# winning impls.  Same hygiene: timeout-bounded, never killed mid-compile.
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

run pe_micro 1800 python bench_pe_micro.py
run s1_serve_fixed 1200 python bench_s1_serve_diag.py
# re-run the two sections the re-anchor-window fix unblocked, merging
# their lines into the round matrix artifact
run sampled_gpt2 1500 python bench_extra.py --sub sampled_gpt2
run gpt2_ladder 1800 python bench_extra.py --sub gpt2_ladder
grep -h '^{' chip_r05/sampled_gpt2.out chip_r05/gpt2_ladder.out >> BENCH_extra_r05.jsonl 2>/dev/null
echo "PHASE3 DONE $(date +%T)" | tee -a chip_r05/queue.log
