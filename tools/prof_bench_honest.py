"""Honest decode throughput on axon: fetch EVERY rep's output.

The axon runtime completes fetches out of order — fetching only the last
rep's output forces only that rep's dependency chain, so an unchained rep
loop overstates throughput. Here every rep's iterations vector is
fetched, so all executions are provably forced. Also reports single-call
latency for comparison (overlap factor = latency * reps / total).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from functools import partial

from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.decoder.lifted_flooding import lifted_flooding_decode
from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode

CODE = "R1_2"
BATCH = 512
MAX_ITERS = 30
EBN0_DB = 1.0
REPS = 8


def make_llrs(code, batch):
    rng = np.random.default_rng(0)
    ebn0 = 10 ** (0.1 * EBN0_DB)
    rate = code.k / code.n
    sigma = float(np.sqrt(0.5 / (rate * ebn0)))
    x = -1.0 + sigma * rng.standard_normal((batch, code.n), dtype=np.float32)
    return (-2.0 / sigma**2) * x


def run(name, fn, llrs):
    r = fn(llrs)
    np.asarray(r["iterations"])  # warm + sync

    # single-call latency
    t0 = time.perf_counter()
    r = fn(llrs)
    iters = np.asarray(r["iterations"])
    lat = time.perf_counter() - t0

    # fetch-all throughput
    t0 = time.perf_counter()
    outs = [fn(llrs) for _ in range(REPS)]
    for o in outs:
        np.asarray(o["iterations"])
    tot = time.perf_counter() - t0

    k = Code[CODE].k
    it_run = int(iters.max())
    print(
        f"{name:28s} latency {lat*1e3:8.1f} ms ({lat*1e3/it_run:6.2f} ms/it)"
        f"  fetch-all {tot/REPS*1e3:8.1f} ms/rep"
        f"  overlap x{lat*REPS/tot:4.2f}"
        f"  -> {1e-6*k*BATCH*REPS/tot:7.1f} Mbit/s honest",
        flush=True,
    )


def main():
    code = Code[CODE]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    llrs = jax.device_put(make_llrs(code, BATCH))

    for name, sched in [("Minsumbf16 flooding", "flooding"),
                        ("HLMinsumbf16 layered", "layered")]:
        dn = "Minsumbf16" if sched == "flooding" else "HLMinsumbf16"
        _, arith = make_arithmetic(dn)
        decode = (
            lifted_layered_decode if sched == "layered"
            else lifted_flooding_decode
        )
        fn = jax.jit(
            partial(decode, lg, arith, max_iterations=MAX_ITERS, fused=True)
        )
        run(name, fn, llrs)


if __name__ == "__main__":
    main()
