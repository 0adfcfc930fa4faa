"""Resident-kernel cost model + achieved-efficiency report (VERDICT r3 #5).

The resident kernel is compute-bound (zero HBM traffic per iteration).
This tool counts its per-iteration plane-ops analytically from the
layout and reports the ACHIEVED per-edge cost from a chained timing
run. A hard "% of peak" is deliberately not printed: three independent
microbenchmarks (serial-chain roll+ALU mix, XLA elementwise FMA chain,
independent-plane roll+add) all measured LOWER op rates than the full
kernel achieves — Mosaic overlaps rotate latency across the unrolled
program better than isolated op timing can, so the microbenchmarks are
not valid ceilings. The quantified, semantics-mandated tax that
remains is the per-iteration syndrome fold (~20-22% of plane-ops;
required every iteration by reference decoder.rs:157-164).

Usage: python tools/prof_bound.py [spec] [iters]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from tools.bench_row import build  # noqa: E402


def op_model(layout):
    """(sweep_ops, syndrome_ops) plane-op counts per iteration."""
    sweep = 0
    syn = 0
    nonzero_rolls = int(np.count_nonzero(layout.syn_rot)) + int(
        np.count_nonzero((layout.Z - layout.syn_rot) % layout.Z)
    )
    for m in layout.chk_meta:
        g = m.g1 - m.g0
        sweep += g * (14 * m.d + 5 * m.d)  # edge fixed + min-sum fold
        syn += g * (5 * m.d + 4)
    sweep += nonzero_rolls  # one op per non-zero static roll
    return sweep, syn


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "dvbs2:R1_2"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
    from ldpc_toolbox_tpu.ops.fused_bp2 import build_fused_layout, rule_for
    from ldpc_toolbox_tpu.ops.resident_layered import resident_pick_bt

    lg, n, k = build(spec)
    layout = build_fused_layout(lg)
    _, arith = make_arithmetic("HLMinsumbf16")
    rule = rule_for(arith)
    bt = resident_pick_bt(layout, rule, rule.qv_dtype(arith), 512) or 128

    sweep, syn = op_model(layout)
    per_iter = sweep + syn
    print(
        f"{spec}: Z={layout.Zp} Bt={bt} E={layout.E} | plane-ops/iter: "
        f"sweep {sweep} + syndrome {syn} = {per_iter} "
        f"({100*syn/per_iter:.0f}% syndrome)"
    )

    from tools.prof_chain import chained_rate

    mbps, dt = chained_rate(spec, "HLMinsumbf16", 512, iters,
                            label="measured")
    ntiles = -(-512 // bt)
    tile_iter = dt / (ntiles * iters)
    per_edge_ns = 1e9 * tile_iter / layout.E
    clk = 0.94e9  # v5e TensorCore clock (approx; for the cycle figure)
    print(
        f"achieved: {1e3*tile_iter:.3f} ms per {bt}-frame tile-iteration "
        f"= {per_edge_ns:.0f} ns (~{per_edge_ns*clk/1e9:.0f} cycles) per "
        f"edge incl. 2 rotations + fold + syndrome share"
    )
    print(
        f"modeled rate: {per_iter/tile_iter/1e6:.0f} M plane-ops/s on "
        f"({layout.Zp},{bt}) planes"
    )


if __name__ == "__main__":
    main()
