"""Benchmark: decoded info throughput on the flagship workload.

Measures batched min-sum belief-propagation decode of the DVB-S2 rate-1/2
n=64800 code (the BASELINE.json headline metric) on the default JAX device
and prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "Mbit/s", "vs_baseline": N}

The reference publishes no numbers and its Rust toolchain is unavailable
in this environment (BASELINE.md), so the baseline is the closest honest
stand-in: the repo's C++ C-ABI shim (capi/), which reimplements the
reference's scalar numeric semantics, driven by a multithreaded benchmark
(capi/bench_capi.cpp) that mirrors the reference BER harness's threading
model (one decoder per worker, num_cpus workers, ber.rs:574 throughput).
``vs_baseline`` therefore means "TPU chip vs reference-semantics scalar
C++ using every core of this host", measured once and cached in
``.bench_baseline.json``.
"""

import json
import os
import pathlib
import time
from functools import partial

CACHE = pathlib.Path(__file__).parent / ".bench_baseline.json"

CODE_NAME = "R1_2"
EBN0_DB = 1.0
MAX_ITERS = 30
# override with e.g. BENCH_DECODER=Minstarapproxi8 for the i8 fast path
DECODER = os.environ.get("BENCH_DECODER", "Minsumbf16")


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
    sigma = float(np.sqrt(0.5 / (0.5 * ebn0)))
    # all-zero codeword BPSK (+noise); valid for any linear code's BER
    x = -1.0 + sigma * rng.standard_normal((batch, code.n), dtype=np.float32)
    return (-2.0 / sigma**2) * x


def measure(code, graph, batch: int, reps: int):
    """Returns (decoded info Mbit/s, ms per BP iteration)."""
    import jax

    from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
    from ldpc_toolbox_tpu.decoder.lifted_flooding import lifted_flooding_decode

    # fused Pallas path on TPU; interpreted kernels are far too slow on
    # CPU, so the baseline floor uses the plane-gather fallback
    fused = jax.default_backend() != "cpu"
    _, arith = make_arithmetic(DECODER if fused else "Minsumf32")
    fn = jax.jit(
        partial(
            lifted_flooding_decode,
            graph,
            arith,
            max_iterations=MAX_ITERS,
            fused=fused,
        )
    )
    llrs = jax.device_put(make_llrs(code, batch))
    int(fn(llrs)["iterations"][0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(llrs)
    # fetch one scalar of the LAST result only: TPU executes the queued
    # calls in order on one stream, so its completion bounds them all —
    # fetching per rep added a ~4 ms tunnel round trip to every rep
    int(r["iterations"][0])
    dt = (time.perf_counter() - t0) / reps
    return 1e-6 * code.k * batch / dt, 1e3 * dt / MAX_ITERS


def hbm_traffic_model(graph, batch: int, msg_bytes: int) -> float:
    """Modeled HBM bytes per BP iteration for the fused v2 layout: each
    message byte read once + written once per phase (4*E), channel LLRs
    read (n), int8 hard-decision planes written (n) and re-read per edge
    by the syndrome kernel (E)."""
    E = graph.num_base_edges * graph.Z
    return batch * (4 * E * msg_bytes + graph.n * msg_bytes + graph.n + E)


def cpu_floor(code_name: str) -> float:
    """Measure (or load cached) the reference-semantics scalar C++ decode
    on all host cores (capi/bench_capi.cpp)."""
    if CACHE.exists():
        data = json.loads(CACHE.read_text())
        if data.get("code") == code_name and data.get("decoder") == DECODER:
            return data["cpu_mbps"]
    import subprocess

    capi = pathlib.Path(__file__).parent / "capi"
    subprocess.run(["make", "-s", "-C", str(capi), "bench_capi"], check=True)
    alist = pathlib.Path(__file__).parent / f".bench_{code_name}.alist"
    if not alist.exists():
        from ldpc_toolbox_tpu.codes.dvbs2 import Code

        alist.write_text(Code[code_name].h().alist())
    out = subprocess.run(
        [
            str(capi / "bench_capi"),
            str(alist),
            DECODER,
            str(MAX_ITERS),
            str(EBN0_DB),
            "0.5",
            "20",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    mbps = float(json.loads(out.stdout.strip().splitlines()[-1])["mbps"])
    CACHE.write_text(
        json.dumps({"code": code_name, "decoder": DECODER, "cpu_mbps": mbps})
    )
    return mbps


def main():
    code, graph = build(CODE_NAME)
    batch = 512
    mbps, ms_per_iter = measure(code, graph, batch=batch, reps=5)
    try:
        floor = cpu_floor(CODE_NAME)
    except Exception:
        floor = None
    msg_bytes = 1 if "i8" in DECODER else 2
    gbps = hbm_traffic_model(graph, batch, msg_bytes) / (1e6 * ms_per_iter)
    result = {
        "metric": (
            f"decoded info throughput, DVB-S2 {CODE_NAME} n={code.n} "
            f"{DECODER} flooding {MAX_ITERS} iters @ {EBN0_DB} dB"
        ),
        "value": round(mbps, 1),
        "unit": "Mbit/s",
        "vs_baseline": round(mbps / floor, 2) if floor else None,
        "ms_per_iter": round(ms_per_iter, 3),
        "hbm_gbps_model": round(gbps, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
