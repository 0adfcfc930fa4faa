#!/bin/bash
# Run the five BASELINE.json configs end-to-end on the attached TPU via the
# CLI and log each sweep to results/*.log (RESULTS.md is written from these).
# Reproducible: constructions are seeded; sweeps use fixed --seed.
set -e
cd "$(dirname "$0")/.."
mkdir -p results
CLI="python -m ldpc_toolbox_tpu.cli"

# Constructed codes (configs 1, 2, 5). mackay-neal args: rows cols wr wc seed.
[ -f results/mn_512_1024_sys.alist ] || {
  $CLI mackay-neal 512 1024 6 3 42 > results/mn_512_1024.alist
  $CLI systematic results/mn_512_1024.alist > results/mn_512_1024_sys.alist
}
[ -f results/peg_512_1024_sys.alist ] || {
  $CLI peg 512 1024 3 7 > results/peg_512_1024.alist
  $CLI systematic results/peg_512_1024.alist > results/peg_512_1024_sys.alist
}

# Config 1: MacKay-Neal (3,6)-regular rate-1/2 n=1024, flooding min-sum,
# BPSK/AWGN BER sweep.
$CLI ber results/mn_512_1024_sys.alist --decoder Minstarapproxf32 \
  --min-ebn0 1.0 --max-ebn0 3.0 --step-ebn0 0.5 --frame-errors 100 \
  --max-iter 100 --batch-size 2048 --max-time 90 --seed 1 \
  --output-file results/config1_mn_minsum.txt \
  2>&1 | tee results/config1_mn_minsum.log

# Config 2: same code, sum-product (Phi f64) + 8-bit quantized variants.
for dec in Phif64 Tanhf32 Minstarapproxi8 \
           Minstarapproxi8JonesPartialHardLimitDeg1Clip Aminstari8; do
  $CLI ber results/mn_512_1024_sys.alist --decoder "$dec" \
    --min-ebn0 1.0 --max-ebn0 3.0 --step-ebn0 0.5 --frame-errors 100 \
    --max-iter 100 --batch-size 2048 --max-time 90 --seed 1 \
    --output-file "results/config2_mn_${dec}.txt" \
    2>&1 | tee "results/config2_mn_${dec}.log"
done

# Config 3: CCSDS AR4JA r=4/5 k=4096, horizontal-layered min-sum with early
# termination. H has 11 blocks of M=512 columns; the last block is punctured
# (CCSDS 131.0-B-5 / ccsds.rs H layout).
$CLI ber ccsds:4/5:4096 --decoder HLMinstarapproxf32 \
  --puncturing 1,1,1,1,1,1,1,1,1,1,0 \
  --min-ebn0 2.0 --max-ebn0 3.0 --step-ebn0 0.25 --frame-errors 100 \
  --max-iter 60 --batch-size 1024 --max-time 120 --seed 1 \
  --output-file results/config3_ccsds_hl.txt \
  2>&1 | tee results/config3_ccsds_hl.log

# Config 4: DVB-S2 normal frames n=64800 across code rates, batched lifted
# layered decode (fused Pallas path). One waterfall point per rate.
run4() { # rate ebn0 tag
  $CLI ber "dvbs2:$1" --decoder HLMinsumbf16 \
    --min-ebn0 "$2" --max-ebn0 "$2" --step-ebn0 1 --frame-errors 50 \
    --max-iter 50 --batch-size 256 --max-time 150 --seed 1 \
    --output-file "results/config4_dvbs2_$3.txt" \
    2>&1 | tee "results/config4_dvbs2_$3.log"
}
run4 1/4 0.30 r14
run4 1/2 1.30 r12
run4 3/4 2.60 r34
run4 9/10 3.90 r910

# Config 5: PEG-constructed irregular (wc=3) code, full construct -> encode
# -> decode -> BER pipeline, batch sharded over the device mesh (--shard).
$CLI ber results/peg_512_1024_sys.alist --decoder Minstarapproxf32 --shard \
  --min-ebn0 1.0 --max-ebn0 3.0 --step-ebn0 0.5 --frame-errors 100 \
  --max-iter 100 --batch-size 2048 --max-time 90 --seed 1 \
  --output-file results/config5_peg_sharded.txt \
  2>&1 | tee results/config5_peg_sharded.log

echo "ALL CONFIGS DONE"
