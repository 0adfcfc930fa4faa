#!/bin/bash
# Regenerate the canonical benchmark table (VERDICT r4 #5): one row per
# (family, decoder, schedule, batch) with the CURRENT kernels, true k
# everywhere, run serialized on an otherwise idle chip. The previous
# table moves to results/bench_table_history.jsonl; RESULTS.md tables
# are rendered from the fresh file by tools/render_bench_table.py.
#
# Operating points: 1.0 dB except C2 (4.0) and R9_10 (3.5) — the
# families' waterfall points, matching rounds 3-4.
set -u
cd "$(dirname "$0")/.."

if [ -f results/bench_table.jsonl ]; then
    cat results/bench_table.jsonl >> results/bench_table_history.jsonl
    rm results/bench_table.jsonl
fi

row() { # code decoder ebn0 iters batch
    echo "=== $* ==="
    timeout 2700 python tools/bench_row.py "$@" || echo "FAILED: $*"
}

# flagship family: layered bf16 (headline), flooding bf16 (aliased
# resident, new), f32 layered (compressed resident, new), i8 layered
row dvbs2:R1_2 HLMinsumbf16 1.0 30 512
row dvbs2:R1_2 Minsumbf16 1.0 30 512
row dvbs2:R1_2 HLMinsumf32 1.0 30 512
row dvbs2:R1_2 HLMinstarapproxi8 1.0 30 512
row dvbs2:R1_2 HLAminstari8 1.0 30 512
row dvbs2:R1_2 Minstarapproxi8 1.0 30 512
# equal-quality operating row (measured budget 18, RESULTS)
row dvbs2:R1_2 HLMinsumbf16 1.0 18 1024

# other DVB-S2 frames
row dvbs2:R1_2short HLMinsumbf16 1.0 30 512
row dvbs2:R9_10 HLMinsumbf16 3.5 30 512

# CCSDS AR4JA + C2
row ccsds:R1_2:4096 HLMinsumbf16 1.0 30 512
row ccsds:R1_2:4096 Minsumbf16 1.0 30 512
row c2 HLMinsumbf16 4.0 30 512
row c2 Minsumbf16 4.0 30 512

# 5G NR
row 5g:BG1:384 HLMinsumbf16 1.0 30 512
# BG1 measured equal-quality budget (15 iters, RESULTS)
row 5g:BG1:384 HLMinsumbf16 1.0 15 1024
row 5g:BG1:384 Minsumbf16 1.0 30 512
row 5g:BG1:384 Minstarapproxi8 1.0 30 512
row 5g:BG1:384 HLMinstarapproxi8 1.0 30 512
row 5g:BG2:384 HLMinsumbf16 1.0 30 512

echo "done: $(wc -l < results/bench_table.jsonl) canonical rows"
