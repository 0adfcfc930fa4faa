"""Compaction payoff on TPU: layered fused decode at low/high SNR with
and without staged compaction, honest single-call latency."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from functools import partial

from ldpc_toolbox_tpu.codes.dvbs2 import Code
from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
from ldpc_toolbox_tpu.decoder.lifted import LiftedGraph, dvbs2_maps
from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode

CODE = "R1_2"
BATCH = 512
MAX_ITERS = 30


def make_llrs(code, batch, ebn0_db):
    rng = np.random.default_rng(0)
    ebn0 = 10 ** (0.1 * ebn0_db)
    rate = code.k / code.n
    sigma = float(np.sqrt(0.5 / (rate * ebn0)))
    x = -1.0 + sigma * rng.standard_normal((batch, code.n), dtype=np.float32)
    return (-2.0 / sigma**2) * x


def main():
    code = Code[CODE]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    _, arith = make_arithmetic("HLMinsumbf16")

    for ebn0 in (1.0, 2.0, 3.0):
        llrs = jax.device_put(make_llrs(code, BATCH, ebn0))
        for compact in (False, True):
            fn = jax.jit(
                partial(
                    lifted_layered_decode,
                    lg,
                    arith,
                    max_iterations=MAX_ITERS,
                    fused=True,
                    compact=compact,
                )
            )
            r = fn(llrs)
            np.asarray(r["iterations"])  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(llrs)
                iters = np.asarray(r["iterations"])
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            mbps = 1e-6 * code.k * BATCH / t
            print(
                f"ebn0={ebn0} compact={int(compact)}: {t*1e3:7.1f} ms "
                f"avg_it={iters.mean():5.2f} max_it={iters.max()} "
                f"success={(np.asarray(r['success'])).sum():4d} "
                f"-> {mbps:7.1f} Mbit/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
