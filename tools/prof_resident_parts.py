"""Split resident-path decode time into kernel vs prep/post glue.

Times three jitted functions on the same inputs:
  full   — lifted_layered_decode (resident auto)
  kernel — resident_layered_decode on pre-tiled device inputs
  prep   — planes/quantize/tile only (the pre-kernel glue)

Usage: python tools/prof_resident_parts.py <spec> [decoder] [batch] [iters]
Specs as tools/bench_row.py (dvbs2:R1_2, 5g:BG1:384, ccsds:R1_2:4096, c2).
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


def timed(fn, *args, reps=6, fetch=lambda r: r):
    r = fn(*args)
    jax.tree.map(np.asarray, fetch(r))  # compile+warm
    t0 = time.perf_counter()
    r = fn(*args)
    jax.tree.map(np.asarray, fetch(r))
    lat = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        jax.tree.map(np.asarray, fetch(o))
    sus = (time.perf_counter() - t0) / reps
    return lat, sus


def main():
    from ldpc_toolbox_tpu.decoder.factory import make_arithmetic
    from ldpc_toolbox_tpu.decoder.lifted_layered import (
        _planes_of,
        lifted_layered_decode,
    )
    from ldpc_toolbox_tpu.ops.fused_bp2 import BT, build_fused_layout, rule_for
    from ldpc_toolbox_tpu.ops.resident_layered import resident_layered_decode

    spec = sys.argv[1]
    decoder = sys.argv[2] if len(sys.argv) > 2 else "HLMinsumbf16"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    lg, n, k = build(spec)
    _, arith = make_arithmetic(decoder)
    rule = rule_for(arith)
    layout = build_fused_layout(lg)
    rng = np.random.default_rng(0)
    sigma = float(np.sqrt(0.5 / ((k / n) * 10 ** 0.1)))
    x = -1.0 + sigma * rng.standard_normal((batch, n), dtype=np.float32)
    llrs = jax.device_put((-2.0 / sigma**2) * x)

    full = jax.jit(
        partial(lifted_layered_decode, lg, arith, max_iterations=iters,
                fused=True, resident=True)
    )
    lat_f, sus_f = timed(full, llrs, fetch=lambda r: r["iterations"])

    Z, Zp = lg.Z, layout.Zp
    nbt = batch // BT
    qv_store = rule.qv_dtype(arith)

    def prep(llrs):
        llr_planes, _ = _planes_of(lg, llrs, jnp.float32)
        q = arith.quantize(llr_planes)
        qv0 = arith.llr_to_var_llr(q).astype(qv_store)

        def tile(v):
            P = v.shape[0]
            v = v.reshape(P, Z, nbt, BT).transpose(2, 0, 1, 3)
            if Zp != Z:
                v = jnp.pad(v, ((0, 0), (0, 0), (0, Zp - Z), (0, 0)))
            return v

        return tile(qv0), tile((llr_planes <= 0).astype(jnp.int8))

    jprep = jax.jit(prep)
    qv0_t, bits0_t = jax.block_until_ready(jprep(llrs))
    lat_p, sus_p = timed(jprep, llrs)

    kern = jax.jit(
        partial(resident_layered_decode, layout=layout, rule=rule,
                max_iterations=iters)
    )
    lat_k, sus_k = timed(
        kern, qv0_t, bits0_t, fetch=lambda r: r[1]
    )

    def row(name, lat, sus):
        print(f"{name:8s} latency {lat*1e3:8.2f} ms  sustained/rep "
              f"{sus*1e3:8.2f} ms  -> {1e-6*k*batch/sus:7.1f} Mbit/s",
              flush=True)

    print(f"{spec} {decoder} B={batch} iters={iters} nbt={nbt} "
          f"E={layout.E} CG={layout.CG} VG={layout.VG} Z={Z}")
    row("full", lat_f, sus_f)
    row("kernel", lat_k, sus_k)
    row("prep", lat_p, sus_p)
    print(f"glue (full-kernel) sustained: {(sus_f-sus_k)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
