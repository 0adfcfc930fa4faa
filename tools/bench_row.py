"""One benchmark-table row: decode throughput for (code, decoder) on the
current backend, appended as a JSON line to results/bench_table.jsonl.

Usage: python tools/bench_row.py <code> <decoder> [ebn0] [max_iters] [batch]

Codes: dvbs2:R1_2 (any dvbs2 enum name), 5g:BG1:384, ccsds:R1_2:4096, c2.

Honest axon timing: single-call latency with a fetched output, plus a
chained sustained rate (each rep's input carries a data dependence on
the previous rep's outputs; one final fetch forces every execution —
see ARCHITECTURE.md "Measuring on axon").
"""

import json
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

import os

OUT = pathlib.Path(
    os.environ.get(
        "LDPC_BENCH_OUT",
        pathlib.Path(__file__).parent.parent / "results" / "bench_table.jsonl",
    )
)


def build(spec: str):
    from ldpc_toolbox_tpu.decoder.lifted import (
        LiftedGraph,
        lifted_graph_for,
        nr5g_maps,
    )

    parts = spec.split(":")
    if parts[0] == "dvbs2":
        from ldpc_toolbox_tpu.codes.dvbs2 import Code

        code = Code[parts[1]]
        return lifted_graph_for(code), code.n, code.k
    if parts[0] == "5g":
        from ldpc_toolbox_tpu.codes.nr5g import BaseGraph

        bg = BaseGraph[parts[1]]
        z = int(parts[2])
        h = bg.h(z)
        lg = LiftedGraph.from_sparse(h, *nr5g_maps(bg, z))
        return lg, h.num_cols, h.num_cols - h.num_rows
    if parts[0] == "ccsds":
        from ldpc_toolbox_tpu.codes.ccsds import (
            AR4JACode,
            AR4JAInfoSize,
            AR4JARate,
        )

        code = AR4JACode(AR4JARate[parts[1]], AR4JAInfoSize[f"K{parts[2]}"])
        h = code.h()
        return lifted_graph_for(code), h.num_cols, h.num_cols - h.num_rows
    if parts[0] == "c2":
        from ldpc_toolbox_tpu.codes.ccsds import C2Code

        code = C2Code()
        h = code.h()
        # H has two redundant rows: the true dimension is 7156, not
        # n - num_rows (codes/ccsds.py C2Code)
        return lifted_graph_for(code), h.num_cols, 7156
    raise SystemExit(f"unknown code spec {spec}")


def main():
    from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
    from ldpc_toolbox_tpu.decoder.lifted_flooding import (
        lifted_flooding_decode,
    )
    from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode
    from ldpc_toolbox_tpu.ops.fused_bp2 import build_fused_layout, rule_for
    from ldpc_toolbox_tpu.ops.resident_layered import (
        resident_layered_supported,
    )

    spec = sys.argv[1]
    decoder = sys.argv[2]
    ebn0_db = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    max_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 512

    lg, n, k = build(spec)
    rate = k / n
    rng = np.random.default_rng(0)
    sigma = float(np.sqrt(0.5 / (rate * 10 ** (0.1 * ebn0_db))))
    x = -1.0 + sigma * rng.standard_normal((batch, n), dtype=np.float32)
    llrs = jax.device_put((-2.0 / sigma**2) * x)

    schedule, arith = make_arithmetic(decoder)
    decode = (
        lifted_layered_decode if schedule == "layered"
        else lifted_flooding_decode
    )
    fused = jax.default_backend() != "cpu"
    fn_raw = partial(decode, lg, arith, max_iterations=max_iters,
                     fused=fused)
    import jax.numpy as jnp

    # chained sustained protocol (ARCHITECTURE.md "Measuring on axon"):
    # each rep's input depends on the previous rep's outputs, one final
    # fetch forces the chain — one tunnel round trip total instead of a
    # serialized ~20 ms fetch per rep
    @jax.jit
    def step(llrs, tok):
        r = fn_raw(llrs + 0.0 * tok)
        tok = (
            jnp.sum(r["iterations"])
            + jnp.sum(r["codeword"].astype(jnp.int32))
            + jnp.sum(r["success"])
        ).astype(jnp.float32)
        return r, tok

    tok0 = jnp.float32(0.0)
    t0 = time.perf_counter()
    r, _ = step(llrs, tok0)
    iters = np.asarray(r["iterations"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    r, _ = step(llrs, tok0)
    iters = np.asarray(r["iterations"])
    latency = time.perf_counter() - t0

    # chain long enough that the one-time end-of-chain fetch round trip
    # (~20 ms) is <3% of the total — short chains understate small codes
    reps = max(8, int(0.8 / max(latency, 1e-3)) + 1)
    t0 = time.perf_counter()
    tok = tok0
    for _ in range(reps):
        _, tok = step(llrs, tok)
    float(np.asarray(tok))
    per_rep = (time.perf_counter() - t0) / reps

    rule = rule_for(arith)
    resident = False
    if fused and rule is not None:
        layout = build_fused_layout(lg)
        if schedule == "layered":
            from ldpc_toolbox_tpu.ops.resident_compressed import (
                compressed_layered_supported,
            )

            if resident_layered_supported(
                layout, rule, rule.qv_dtype(arith)
            ):
                resident = True
            elif compressed_layered_supported(
                layout, rule, rule.qv_dtype(arith)
            ):
                resident = "compressed"
        else:
            from ldpc_toolbox_tpu.ops.resident_compressed import (
                compressed_flooding_supported,
            )
            from ldpc_toolbox_tpu.ops.resident_flooding import (
                resident_flooding_supported,
            )
            from ldpc_toolbox_tpu.ops.resident_flooding_dual import (
                resident_flooding_dual_supported,
            )

            if resident_flooding_dual_supported(
                layout, rule, rule.storage_dtype
            ):
                resident = True  # r4 dual-array form
            elif resident_flooding_supported(
                layout, rule, rule.storage_dtype
            ):
                resident = "aliased"
            elif compressed_flooding_supported(
                layout, rule, rule.storage_dtype
            ):
                resident = "compressed"
    row = {
        "code": spec,
        "n": n,
        "k": k,
        "decoder": decoder,
        "schedule": schedule,
        "resident": resident,
        "ebn0_db": ebn0_db,
        "max_iters": max_iters,
        "batch": batch,
        "avg_iterations": round(float(iters.mean()), 2),
        "iterations_executed": int(iters.max()),
        "success": int(np.asarray(r["success"]).sum()),
        "latency_ms": round(latency * 1e3, 1),
        "mbps_latency": round(1e-6 * k * batch / latency, 1),
        "mbps_sustained": round(1e-6 * k * batch / per_rep, 1),
        "compile_s": round(compile_s, 1),
        "protocol": "chained",
    }
    OUT.parent.mkdir(exist_ok=True)
    with OUT.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
