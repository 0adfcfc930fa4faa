"""Benchmark: decoded info throughput on the flagship workload.

Measures batched belief-propagation decode of the DVB-S2 rate-1/2 n=64800
code (the BASELINE.json headline metric) on the default JAX device and
prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "Mbit/s", "vs_baseline": N}

The flagship decoder is ``HLMinsumbf16`` — the fused Pallas
horizontal-layered schedule (ops/fused_layered.py), which converges in
~half the iterations of flooding at identical quality (reference
horizontal_layered.rs:49-110; BASELINE.md HL floors) and keeps the Qv
posteriors VMEM-resident so HBM sees half the traffic per iteration.
Override with ``BENCH_DECODER`` (any fused rule: min-sum, the i8
families, Phi/Tanh/Minstarapprox/Aminstar f32) and ``BENCH_CODE``.

The reference publishes no numbers and its Rust toolchain is unavailable
in this environment (BASELINE.md), so the baseline is the closest honest
stand-in: the repo's C++ C-ABI shim (capi/), which reimplements the
reference's scalar numeric semantics, driven by a multithreaded benchmark
(capi/bench_capi.cpp) mirroring the reference BER harness's threading
model (one decoder per worker, num_cpus workers, ber.rs:574 throughput).
``vs_baseline`` therefore means "TPU chip vs reference-semantics scalar
C++ using every core of this host", read from the single authoritative
floors file ``results/cpu_floors.json`` (written by
``tools/measure_floors.py`` with a pinned idle-host protocol).
"""

import json
import os
import pathlib
import time
from functools import partial

FLOORS = pathlib.Path(__file__).parent / "results" / "cpu_floors.json"

CODE_NAME = os.environ.get("BENCH_CODE", "R1_2")
EBN0_DB = float(os.environ.get("BENCH_EBN0", "1.0"))
MAX_ITERS = int(os.environ.get("BENCH_MAX_ITERS", "30"))
# 1024 amortizes per-call dispatch over twice the tiles: 331.6 vs 321.2
# Mbit/s sustained at B=512 (results/bench_table.jsonl)
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
# flagship: fused horizontal-layered min-sum with bf16 message storage
DECODER = os.environ.get("BENCH_DECODER", "HLMinsumbf16")


def build(code_name: str):
    from ldpc_toolbox_tpu.codes.dvbs2 import Code
    from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps

    code = Code[code_name]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    graph = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    return code, graph


def make_llrs(code, batch: int):
    import numpy as np

    rng = np.random.default_rng(0)
    ebn0 = 10 ** (0.1 * EBN0_DB)
    rate = code.k / code.n
    sigma = float(np.sqrt(0.5 / (rate * ebn0)))
    # all-zero codeword BPSK (+noise); valid for any linear code's BER
    x = -1.0 + sigma * rng.standard_normal((batch, code.n), dtype=np.float32)
    return (-2.0 / sigma**2) * x


def measure(code, graph, batch: int, reps: int):
    """Returns a dict: Mbit/s, ms/iter, iterations executed, layout info.

    Honest axon timing (ARCHITECTURE.md "Measuring on axon"): the
    runtime completes fetches out of order (fetching one output forces
    only its own dependency chain, so unchained rep loops overstate),
    and every *first* fetch of a distinct result costs a ~20 ms tunnel
    round trip, serialized (so fetch-per-rep loops *under*state small
    workloads several-fold). The sustained protocol therefore CHAINS the
    reps: each rep's input carries a data dependence on the previous
    rep's outputs (iterations + codeword + success all fold into the
    token), and one final fetch forces the whole chain — the same shape
    as the production BER harness, which accumulates statistics on
    device and fetches rarely.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
    from ldpc_toolbox_tpu.decoder.lifted_flooding import lifted_flooding_decode
    from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode
    from ldpc_toolbox_tpu.ops.fused_bp2 import build_fused_layout, rule_for

    # fused Pallas path on TPU; interpreted kernels are far too slow on
    # CPU, so a CPU run (smoke only) uses the plane-gather f32 path
    fused = jax.default_backend() != "cpu"
    name = DECODER if fused else "Minsumf32"
    schedule, arith = make_arithmetic(name)
    decode = (
        lifted_layered_decode if schedule == "layered" else lifted_flooding_decode
    )
    fn_raw = partial(decode, graph, arith, max_iterations=MAX_ITERS, fused=fused)

    @jax.jit
    def step(llrs, tok):
        r = fn_raw(llrs + 0.0 * tok)
        tok = (
            jnp.sum(r["iterations"])
            + jnp.sum(r["codeword"].astype(jnp.int32))
            + jnp.sum(r["success"])
        ).astype(jnp.float32)
        return r, tok

    llrs = jax.device_put(make_llrs(code, batch))
    tok0 = jnp.float32(0.0)
    int(step(llrs, tok0)[0]["iterations"][0])  # compile + warm

    # single-call latency
    t0 = time.perf_counter()
    r, tok = step(llrs, tok0)
    iters = np.asarray(r["iterations"])
    latency = time.perf_counter() - t0

    # sustained throughput: chained reps, one final forcing fetch
    t0 = time.perf_counter()
    tok = tok0
    for _ in range(reps):
        _, tok = step(llrs, tok)
    float(np.asarray(tok))
    dt = (time.perf_counter() - t0) / reps

    # iterations actually executed (converged frames freeze their own
    # count; the slowest frame's count is the executed trip count of its
    # tile/stage)
    iters_run = int(iters.max())
    rule = rule_for(arith)
    resident = False
    if fused and schedule == "layered" and rule is not None:
        from ldpc_toolbox_tpu.ops.resident_layered import (
            resident_layered_supported,
        )

        resident = resident_layered_supported(
            build_fused_layout(graph), rule, rule.qv_dtype(arith)
        )
    return {
        "mbps": 1e-6 * code.k * batch / dt,
        "latency_ms": 1e3 * latency,
        "ms_per_iter": 1e3 * dt / max(iters_run, 1),
        "iterations_executed": iters_run,
        "avg_iterations": float(iters.mean()),
        "schedule": schedule,
        "fused": fused,
        "resident": resident,
        "msg_bytes": rule.storage_dtype.itemsize if rule is not None else 4,
        "qv_bytes": (
            rule.qv_dtype(arith).itemsize
            if (rule is not None and schedule == "layered")
            else 0
        ),
    }


def hbm_traffic_model(graph, batch: int, m) -> float:
    """Modeled HBM bytes per BP iteration for the fused layouts.

    Flooding (ops/fused_bp2.py): each message byte read once + written
    once per phase (4E), channel LLR planes read (n), int8 hard-decision
    planes written then read once by the VMEM-resident syndrome kernel
    (2n — the syndrome reads each bit plane once, not per edge).

    Layered (ops/fused_layered.py): Rcv streamed in+out (2E), Qv tile
    in+out (2n at qv_bytes), bit planes written + syndrome-read (2n).
    """
    E = graph.num_base_edges * graph.Z
    n = graph.n
    mb = m["msg_bytes"]
    if m["schedule"] == "layered":
        per_iter = 2 * E * mb + 2 * n * m["qv_bytes"] + 2 * n
    else:
        per_iter = 4 * E * mb + n * mb + 2 * n
    return batch * per_iter


def cpu_floor(code_name: str):
    """Pinned CPU floor from the single authoritative floors file
    (results/cpu_floors.json, written by tools/measure_floors.py with a
    recorded protocol on an idle host — floors are NOT re-measured here,
    where a loaded host would skew them; VERDICT r3 weak #4).

    bf16 decoder names map to their f32 floor sibling (the scalar shim
    implements the reference's dtypes; bf16 is this repo's extension
    with identical semantics at lower storage precision)."""
    if not FLOORS.exists():
        return None
    floors = json.loads(FLOORS.read_text())
    row = floors.get(f"dvbs2:{code_name}")
    if not isinstance(row, dict):
        return None
    for name in (DECODER, DECODER.replace("bf16", "f32")):
        if name in row:
            return row[name]
    return None


def main():
    from ldpc_toolbox_tpu.cli import _enable_compile_cache

    _enable_compile_cache()  # remote compiles are minutes; reuse across runs
    code, graph = build(CODE_NAME)
    m = measure(code, graph, batch=BATCH, reps=5)
    try:
        floor = cpu_floor(CODE_NAME)
    except Exception:
        floor = None
    result = {
        "metric": (
            f"decoded info throughput, DVB-S2 {CODE_NAME} n={code.n} "
            f"{DECODER if m['fused'] else 'Minsumf32 (cpu smoke)'} "
            f"{m['schedule']}{' resident' if m['resident'] else ''} "
            f"@ {EBN0_DB} dB (max {MAX_ITERS} iters)"
        ),
        "value": round(m["mbps"], 1),
        "unit": "Mbit/s",
        "vs_baseline": round(m["mbps"] / floor, 2) if floor else None,
        "iterations_executed": m["iterations_executed"],
        "avg_iterations": round(m["avg_iterations"], 2),
        "ms_per_iter": round(m["ms_per_iter"], 3),
        "latency_ms": round(m["latency_ms"], 1),
    }
    if m["fused"] and not m["resident"]:
        # HBM traffic model applies to the streaming kernels only (the
        # resident kernel's per-iteration HBM traffic is ~zero)
        gbytes = hbm_traffic_model(graph, BATCH, m) / (
            1e6 * m["ms_per_iter"]
        )
        result["hbm_GBps_model"] = round(gbytes, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
