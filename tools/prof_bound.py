"""Speed-of-light model for the resident layered kernel (VERDICT r3 #5).

The resident kernel is compute-bound (zero HBM traffic per iteration),
so its bound is the VPU's elementwise-op rate on (Z, Bt) planes. This
tool (a) counts the kernel's per-iteration plane-ops analytically from
the layout, (b) calibrates the achievable plane-op rate with a
microbenchmark kernel running the same op mix (static roll + add +
select + compare on VMEM-resident planes), and (c) prints modeled bound
vs achieved ms/iter.

Plane-op counting (static-unrolled min-sum sweep, per edge):
  read Rcv + cast(2) | read Qv(1) | roll(1 if shift) | layered_x(1)
  rule fold ~5/edge | sign-select+neg(2) | cast+store Rcv(2)
  sub rold(1) | roll(1) | Qv add+cast+store(3)       ~= 16 + 2 rolls
Syndrome per edge: read Qv + cmp + select(3) | roll(1) | add(1)
Per group: parity odd (floor, mul, sub: 3) + acc max(1).

Usage: python tools/prof_bound.py [spec] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
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


def calibrate(Z=360, Bt=128, ops_per_step=2000, steps=64):
    """Measured plane-ops/s for the representative op mix."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, buf, acc):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            buf[...] = x_ref[...]
            acc[...] = jnp.zeros((Z, Bt), jnp.float32)

        a = buf[...]
        b = acc[...]
        # mix: roll + add + select + compare, 8 ops per unrolled group
        for i in range(ops_per_step // 8):
            r = pltpu.roll(a, (i * 37) % Z or 1, 0)
            b = b + r
            m = b > 100.0
            b = jnp.where(m, b - 100.0, b)
            a = a + 0.0009765625 * r
        buf[...] = a
        acc[...] = b

        @pl.when(step == steps - 1)
        def _():
            o_ref[...] = acc[...]

    x = jnp.ones((Z, Bt), jnp.float32)
    fn = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((Z, Bt), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((Z, Bt), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((Z, Bt), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((Z, Bt), jnp.float32),
                pltpu.VMEM((Z, Bt), jnp.float32),
            ],
        )(x)
    )
    np.asarray(fn(x))  # compile+warm

    @jax.jit
    def chain(x, tok):
        r = fn(x + 0.0 * tok)
        return jnp.sum(r)

    reps = 8
    t0 = time.perf_counter()
    tok = jnp.float32(0.0)
    for _ in range(reps):
        tok = chain(x, tok)
    float(np.asarray(tok))
    dt = (time.perf_counter() - t0) / reps
    total_ops = ops_per_step * steps
    return total_ops / dt  # plane-ops/s at this (Z, Bt)


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

    rate = calibrate(Z=layout.Zp, Bt=bt)
    sweep, syn = op_model(layout)
    per_iter = sweep + syn
    bound_ms = 1e3 * per_iter / rate
    print(
        f"{spec}: Z={layout.Zp} Bt={bt} E={layout.E} | plane-ops/iter: "
        f"sweep {sweep} + syndrome {syn} = {per_iter} "
        f"({100*syn/per_iter:.0f}% syndrome)"
    )
    print(
        f"calibrated plane-op rate @ (Z={layout.Zp},Bt={bt}): "
        f"{rate/1e6:.2f} M plane-ops/s "
        f"({rate*layout.Zp*bt/1e12:.1f} T lane-ops/s)"
    )
    print(f"modeled bound: {bound_ms:.3f} ms per tile-iteration")

    from tools.prof_chain import chained_rate

    mbps, dt = chained_rate(spec, "HLMinsumbf16", 512, iters,
                            label="measured")
    ntiles = -(-512 // bt)
    achieved = 1e3 * dt / (ntiles * iters)
    print(
        f"achieved: {achieved:.3f} ms per tile-iteration -> "
        f"{100*bound_ms/achieved:.0f}% of modeled bound"
    )


if __name__ == "__main__":
    main()
