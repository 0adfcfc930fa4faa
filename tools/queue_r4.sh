#!/bin/bash
# Round-4 bench_table refresh: chained protocol, new resident kernel.
# Run AFTER any other TPU job finishes; appends to results/bench_table.jsonl.
cd /root/repo
set -u
row() { timeout "$1" python tools/bench_row.py "${@:2}" 2>&1 | grep -v WARNING; }

# flagship family, B=512 + B=2048 (the >=60% ratio evidence)
row 900  dvbs2:R1_2        HLMinsumbf16 1.0 30 512
row 900  dvbs2:R1_2        HLMinsumbf16 1.0 30 1024
row 900  dvbs2:R1_2        HLMinsumbf16 1.0 15 1024
row 900  dvbs2:R1_2short   HLMinsumbf16 1.0 30 512
row 900  dvbs2:R1_2short   HLMinsumbf16 1.0 30 2048
row 900  ccsds:R1_2:4096   HLMinsumbf16 1.0 30 512
row 900  ccsds:R1_2:4096   HLMinsumbf16 1.0 30 2048
row 900  5g:BG1:384        HLMinsumbf16 1.0 30 512
row 900  5g:BG1:384        HLMinsumbf16 1.0 30 2048
row 900  5g:BG2:384        HLMinsumbf16 1.0 30 512
row 900  5g:BG2:384        HLMinsumbf16 1.0 30 2048
row 1200 c2                HLMinsumbf16 4.0 30 512
row 1200 c2                HLMinsumbf16 4.0 30 2048
row 900  dvbs2:R9_10       HLMinsumbf16 3.5 30 512
# i8 rows (flagship compiles are ~16-20 min cold; cached afterwards)
row 2400 dvbs2:R1_2        HLMinstarapproxi8 1.0 30 512
row 2400 dvbs2:R1_2        HLAminstari8      1.0 30 512
row 1200 5g:BG1:384        HLMinstarapproxi8 1.0 30 512
row 1200 5g:BG1:384        Minstarapproxi8   1.0 30 512
# flooding flagship refresh under the chained protocol
row 900  dvbs2:R1_2        Minsumbf16 1.0 30 512
echo QUEUE_R4_DONE
