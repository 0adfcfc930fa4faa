#!/bin/bash
# Round-4 phase B: measurement runs after the bench_table queue.
cd /root/repo
set -u

echo "=== re-runs: longer chains for small codes + missing BG2 row ==="
row() { timeout "$1" python tools/bench_row.py "${@:2}" 2>&1 | grep -v WARNING; }
row 1200 5g:BG2:384      HLMinsumbf16 1.0 30 512
row 600  dvbs2:R1_2short HLMinsumbf16 1.0 30 512
row 600  ccsds:R1_2:4096 HLMinsumbf16 1.0 30 512
row 600  c2              HLMinsumbf16 4.0 30 512
row 600  5g:BG1:384      HLMinsumbf16 1.0 30 512

echo "=== flooding resident rows ==="
row() { timeout "$1" python tools/bench_row.py "${@:2}" 2>&1 | grep -v WARNING; }
row 1800 5g:BG1:384      Minstarapproxi8 1.0 30 512   # the 23 Mbit/s cliff
row 1200 5g:BG1:384      Minsumbf16      1.0 30 512
row 1200 ccsds:R1_2:4096 Minsumbf16      1.0 30 512
row 1200 c2              Minsumbf16      4.0 30 512

echo "=== equal quality (15-iter HL vs 30-iter flooding) ==="
timeout 3000 python tools/equal_quality.py results/equal_quality.jsonl 2>&1 | grep -v WARNING

echo "=== on-device selftest (entry subset first: prewarms the driver's compile-check) ==="
timeout 2400 python -m ldpc_toolbox_tpu selftest --families Minsumbf16,Phif32,Minstarapproxi8,HLMinsumbf16,c2:HLMinsumbf16 2>&1 | grep -v WARNING

echo "=== resident kernel bound model ==="
timeout 1200 python tools/prof_bound.py dvbs2:R1_2 30 2>&1 | grep -v WARNING

echo "=== flagship BPSK waterfall (ber CLI, checkpointed) ==="
timeout 3000 python -m ldpc_toolbox_tpu ber dvbs2:1/2 --decoder HLMinsumbf16 \
  --min-ebn0 1.3 --max-ebn0 1.7 --step-ebn0 0.2 --frame-errors 200 \
  --max-iter 30 --batch-size 1024 --max-time 300 \
  --checkpoint results/flagship_bpsk.ckpt \
  --output-file results/flagship_bpsk_waterfall.txt 2>&1 | grep -v WARNING | tail -20
echo QUEUE_R4B_DONE
