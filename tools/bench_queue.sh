#!/bin/bash
# Sequential cross-family bench rows (VERDICT r2 item 4). One at a time —
# the axon tunnel exposes a single chip; parallel runs would contend.
# Cheapest compiles first so partial progress still lands rows.
cd /root/repo
LOG=results/bench_queue.log
: > "$LOG"
run() {
  echo "=== $* $(date +%T) ===" >> "$LOG"
  timeout 2400 python tools/bench_row.py "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%T)" >> "$LOG"
}
run ccsds:R1_2:4096 Minsumbf16 1.0 30 512
run ccsds:R1_2:4096 HLMinsumbf16 1.0 30 512
run c2 Minsumbf16 4.0 30 512
run 5g:BG1:384 Minsumbf16 1.0 30 512
run 5g:BG1:384 HLMinsumbf16 1.0 30 512
run dvbs2:R1_2 Minstarapproxf32 1.0 30 512
run dvbs2:R1_2 Aminstari8 1.0 30 512
run dvbs2:R1_2 Phif32 1.0 30 512
echo "QUEUE DONE $(date +%T)" >> "$LOG"
