"""Micro-measure the VPU's achievable elementwise op rate on the decode
kernels' native tile shape, and anchor the flagship kernels' achieved
plane-op rate to it (VERDICT r4 #3: anchor "% of peak" analytically).

Four chained micro-kernels on a VMEM-resident (360, 128) f32 plane (45
(8,128) vregs — the flagship's plane shape, deep enough to hide VPU
latency):

  add   x += c                 1 op / element / round
  fma   x = x*c1 + c2          1 VPU op if the ALU fuses, else 2
  sel   x = where(x>c, x+a, x-b)   cmp + 2 adds + select = 4 ops
  roll  x = roll(x, 37) + c    1 static sublane rotate + 1 add

Analytic ceiling for comparison: the public TPU v5e peak is 197 bf16
TFLOP/s on one TensorCore = 4 MXUs x 128x128 x 2 flop => ~1.5 GHz
clock; the VPU is 8x128 lanes x 4 ALUs at the same clock =>
8*128*4*1.5e9 ~= 6.1e12 f32 elementwise ops/s.

Timing uses the chained-rep protocol (ARCHITECTURE.md "Measuring on
axon"): reps chain through the output, one final fetch.
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

Z, B = 360, 128
K = 128      # unrolled ops per grid step
R = 256      # grid steps
ELEMS = Z * B


def make(fn_name):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body(x):
        if fn_name == "add":
            return x + 1.0000001
        if fn_name == "fma":
            return x * 1.0000001 + 0.0000001
        if fn_name == "sel":
            return jnp.where(x > 0.5, x + 1.0000001, x - 0.9999999)
        if fn_name == "roll":
            return pltpu.roll(x, 37, 0) + 1.0000001
        raise ValueError(fn_name)

    def kernel(a_in, out, x_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[...] = a_in[...]

        x = x_s[...]
        for _ in range(K):
            x = body(x)
        x_s[...] = x

        @pl.when(i == R - 1)
        def _():
            out[...] = x

    import jax.experimental.pallas as pl2

    f = pl2.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl2.BlockSpec((Z, B), lambda i: (0, 0))],
        out_specs=pl2.BlockSpec((Z, B), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Z, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Z, B), jnp.float32)],
    )

    @jax.jit
    def step(a, tok):
        r = f(a + 0.0 * tok)
        return r, jnp.sum(r)

    return step


def measure(name, ops_per_round):
    step = make(name)
    a = jnp.asarray(
        np.random.default_rng(0).uniform(0.4, 0.6, (Z, B)), jnp.float32
    )
    tok = jnp.float32(0.0)
    _, t = step(a, tok)
    float(t)  # compile + run once
    reps = 20
    t0 = time.perf_counter()
    tk = tok
    for _ in range(reps):
        _, tk = step(a, tk)
    float(tk)
    dt = (time.perf_counter() - t0) / reps
    total_ops = R * K * ELEMS * ops_per_round
    rate = total_ops / dt
    print(
        f"{name:5s}: {dt*1e3:7.3f} ms/rep  {rate/1e12:6.3f} Te-ops/s "
        f"({R*K} chained plane-ops, {ops_per_round} op/elem/round)"
    )
    return rate


if __name__ == "__main__":
    print(f"plane ({Z},{B}) f32, K={K} unrolled, R={R} grid steps")
    add = measure("add", 1)
    fma = measure("fma", 1)
    sel = measure("sel", 4)
    roll = measure("roll", 2)
    peak = 8 * 128 * 4 * 1.5e9
    print(f"analytic VPU ceiling (8x128 lanes x 4 ALUs x 1.5 GHz): "
          f"{peak/1e12:.2f} Te-ops/s")
    print(f"measured add rate = {100*add/peak:.0f}% of analytic ceiling")
