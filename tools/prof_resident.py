"""Resident layered kernel: compile + run timing on the flagship code."""

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

CODE = sys.argv[1] if len(sys.argv) > 1 else "R1_2"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MAX_ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 30
EBN0 = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0


def main():
    from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode

    code = Code[CODE]
    vm, cm, Z, nvg, ncg = dvbs2_maps(code)
    lg = LiftedGraph.from_sparse(code.h(), vm, cm, Z, nvg, ncg)
    _, arith = make_arithmetic("HLMinsumbf16")
    rng = np.random.default_rng(0)
    ebn0 = 10 ** (0.1 * EBN0)
    sigma = float(np.sqrt(0.5 / ((code.k / code.n) * ebn0)))
    x = -1.0 + sigma * rng.standard_normal((BATCH, code.n), dtype=np.float32)
    llrs = jax.device_put((-2.0 / sigma**2) * x)

    fn = jax.jit(
        partial(
            lifted_layered_decode,
            lg,
            arith,
            max_iterations=MAX_ITERS,
            fused=True,
            resident=True,
        )
    )
    t0 = time.perf_counter()
    r = fn(llrs)
    iters = np.asarray(r["iterations"])
    print(f"first call (compile+run): {time.perf_counter()-t0:.1f} s",
          flush=True)

    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(llrs)
        iters = np.asarray(r["iterations"])
        lat = time.perf_counter() - t0
        print(
            f"latency {lat*1e3:8.1f} ms  avg_it={iters.mean():5.2f} "
            f"max_it={iters.max()}  "
            f"success={np.asarray(r['success']).sum()}  "
            f"-> {1e-6*code.k*BATCH/lat:7.1f} Mbit/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
