"""Chained-dependency decode timing: the honest device-throughput
protocol for the axon tunnel.

Each rep's input carries a data dependence on the previous rep's output
(llrs + 0.0*token), so fetching the final token forces every execution
on device while paying ONE fetch round trip (~20 ms on this tunnel) for
the whole chain — the same shape as the production BER harness, which
accumulates statistics on device and fetches rarely.

Usage: python tools/prof_chain.py <spec> [decoder] [batch] [iters]
                                  [ebn0] [reps]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_toolbox_tpu.cli import _enable_compile_cache

_enable_compile_cache()

from tools.bench_row import build  # noqa: E402


def chained_rate(spec, decoder, batch, iters, ebn0=1.0, reps=16,
                 label=""):
    from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
    from ldpc_toolbox_tpu.decoder.lifted_flooding import (
        lifted_flooding_decode,
    )
    from ldpc_toolbox_tpu.decoder.lifted_layered import lifted_layered_decode

    lg, n, k = build(spec)
    schedule, arith = make_arithmetic(decoder)
    decode = (
        lifted_layered_decode if schedule == "layered"
        else lifted_flooding_decode
    )
    rng = np.random.default_rng(0)
    sigma = float(np.sqrt(0.5 / ((k / n) * 10 ** (0.1 * ebn0))))
    x = -1.0 + sigma * rng.standard_normal((batch, n), dtype=np.float32)
    llrs = jax.device_put((-2.0 / sigma**2) * x)

    dec = partial(decode, lg, arith, max_iterations=iters, fused=True)

    @jax.jit
    def step(llrs, tok):
        r = dec(llrs + 0.0 * tok)
        return jnp.sum(r["iterations"]).astype(jnp.float32)

    t0 = time.perf_counter()
    np.asarray(step(llrs, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    tok = jnp.float32(0.0)
    for _ in range(reps):
        tok = step(llrs, tok)
    it_sum = float(np.asarray(tok))
    dt = (time.perf_counter() - t0) / reps
    mbps = 1e-6 * k * batch / dt
    print(
        f"{spec:18s} {decoder:18s} B={batch:5d} it<={iters:2d} "
        f"{label:10s} {dt*1e3:8.2f} ms/call avg_it={it_sum/batch:5.2f} "
        f"-> {mbps:7.1f} Mbit/s  (compile {compile_s:.0f}s)",
        flush=True,
    )
    return mbps, dt


if __name__ == "__main__":
    spec = sys.argv[1]
    decoder = sys.argv[2] if len(sys.argv) > 2 else "HLMinsumbf16"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    ebn0 = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    chained_rate(spec, decoder, batch, iters, ebn0, reps)
