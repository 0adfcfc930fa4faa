"""Benchmark: decoded info throughput on the flagship workload.

Measures batched min-sum belief-propagation decode of the DVB-S2 rate-1/2
n=64800 code (the BASELINE.json headline metric) on the default JAX device
and prints ONE JSON line::

    {"metric": ..., "value": N, "unit": "Mbit/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is a
self-measured floor: the same decode workload on the host CPU backend (the
reference is a CPU implementation; this is the "beat the host" ratio).
The CPU floor is measured once and cached in ``.bench_baseline.json``.
"""

import json
import os
import pathlib
import sys
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


def measure(code, graph, batch: int, reps: int) -> float:
    """Returns decoded info Mbit/s."""
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
            use_pallas=False,
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
    return 1e-6 * code.k * batch / dt


def cpu_floor(code_name: str) -> float:
    """Measure (or load cached) the same decode on the host CPU backend."""
    if CACHE.exists():
        data = json.loads(CACHE.read_text())
        if data.get("code") == code_name:
            return data["cpu_mbps"]
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--cpu-floor", code_name],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    line = out.stdout.strip().splitlines()[-1]
    mbps = float(line)
    CACHE.write_text(json.dumps({"code": code_name, "cpu_mbps": mbps}))
    return mbps


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--cpu-floor":
        import jax

        jax.config.update("jax_platforms", "cpu")
        code, graph = build(sys.argv[2])
        print(measure(code, graph, batch=16, reps=1))
        return

    code, graph = build(CODE_NAME)
    mbps = measure(code, graph, batch=512, reps=5)
    try:
        floor = cpu_floor(CODE_NAME)
    except Exception:
        floor = None
    result = {
        "metric": (
            f"decoded info throughput, DVB-S2 {CODE_NAME} n={code.n} "
            f"{DECODER} flooding {MAX_ITERS} iters @ {EBN0_DB} dB"
        ),
        "value": round(mbps, 1),
        "unit": "Mbit/s",
        "vs_baseline": round(mbps / floor, 2) if floor else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
