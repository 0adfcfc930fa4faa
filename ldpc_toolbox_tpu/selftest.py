"""On-device exactness smoke test: fused Pallas kernels vs plane-gather.

CI runs the fused kernels in interpret mode on CPU, which cannot catch
TPU-only lowering bugs (the Tanh NaN incident: TPU's polynomial tanh
saturates to exactly 1.0 where libm's does not, turning every frame into
a false decode). This module decodes one small batch per rule family on
the *current backend* twice — fused kernels vs the plane-gather path —
and demands identical success masks, iteration counts and codewords.

Wired into ``__graft_entry__.entry()`` (a compact subset, so every driver
compile-check exercises it on real hardware) and the ``selftest`` CLI
subcommand (all families).
"""

from __future__ import annotations

__all__ = ["run_selftest", "SELFTEST_FAMILIES"]

#: one representative per fused rule family (all 7 check-rule kinds),
#: plus the layered schedule (VMEM-resident kernel) for the flagship
#: arithmetic and the i8 family. The ``c2:`` entries rerun both
#: schedules on CCSDS C2, whose Z=511 lift exercises the padded
#: two-roll mod-Z rotation (ops/fused_bp2.py ``_roll``) that no
#: 8-aligned code reaches.
SELFTEST_FAMILIES = [
    "Minsumbf16",
    "Phif32",
    "Tanhf32",
    "Minstarapproxf32",
    "Aminstarf32",
    "Minstarapproxi8",
    "Aminstari8",
    "HLMinsumbf16",
    "HLMinstarapproxi8",
    "c2:Minsumbf16",
    "c2:HLMinsumbf16",
    # the round-5 single-array aliased flooding kernel (small codes
    # route to the dual form by default; the "aliased:" prefix forces
    # it so the flagship's carrying kernel gets on-device coverage)
    "aliased:Minsumbf16",
]


def _workload(batch: int):
    """A DVB-S2 short frame with the staircase corner (the one incomplete
    circulant, codes/dvbs2.py) — the hardest structural case the fused
    layout handles — plus noisy codeword LLRs at its waterfall."""
    import numpy as np

    from .codes.dvbs2 import Code
    from .decoder.lifted import lifted_graph_for
    from .encoder import Encoder

    code = Code.R1_4short
    h = code.h()
    lg = lifted_graph_for(code)
    enc = Encoder(h)
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 2, size=(batch, enc.k))
    cw = np.asarray(enc.encode_batch(msgs))
    sigma = 0.85
    x = np.where(cw == 0, -1.0, 1.0) + sigma * rng.standard_normal(cw.shape)
    llr = ((-2.0 / sigma**2) * x).astype(np.float32)
    return lg, llr


def _workload_c2(batch: int):
    """CCSDS C2 (8176, 7156), all-zero codeword at its waterfall: the
    only standards lift with Z % 8 != 0 (Z=511), covering the padded
    mod-Z roll decomposition on-device."""
    import numpy as np

    from .codes.ccsds import C2Code
    from .decoder.lifted import lifted_graph_for

    lg = lifted_graph_for(C2Code())
    rng = np.random.default_rng(3)
    sigma = 0.45
    x = -1.0 + sigma * rng.standard_normal((batch, 8176))
    llr = ((-2.0 / sigma**2) * x).astype(np.float32)
    return lg, llr


def run_selftest(
    families=None, batch: int = 128, iterations: int = 8, log=None
) -> list[str]:
    """Run fused-vs-plane equality per family; returns failing names.

    ``log`` (name, ok, detail) is called per family when given.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .decoder.factory import make_arithmetic
    from .decoder.lifted_flooding import (
        _fused_flooding_decode,
        lifted_flooding_decode,
    )
    from .ops.fused_bp2 import rule_for

    from .decoder.lifted_layered import (
        _fused_layered_decode,
        lifted_layered_decode,
    )

    workloads = {}

    def workload_for(key):
        if key not in workloads:
            build = _workload_c2 if key == "c2" else _workload
            g, llr_np = build(batch)
            workloads[key] = (g, jax.device_put(jnp.asarray(llr_np)))
        return workloads[key]

    failures = []
    for name in families or SELFTEST_FAMILIES:
        key, _, decoder = name.rpartition(":")
        forced_alias = key == "aliased"
        lg, llr = workload_for("dvbs2" if forced_alias else (key or "dvbs2"))
        schedule, arith = make_arithmetic(decoder)
        rule = rule_for(arith)
        assert rule is not None, f"{name} has no fused rule"
        # no silent fallback: a failure to build/compile the fused path
        # is itself a selftest failure
        import os as _os

        if forced_alias:
            _os.environ["LDPC_FORCE_ALIASED"] = "1"
        try:
            if schedule == "layered":
                # resident kernel when the code fits, streaming otherwise
                fused = _fused_layered_decode(
                    lg, arith, rule, llr, iterations
                )
                plane = lifted_layered_decode(lg, arith, llr, iterations)
            else:
                fused = _fused_flooding_decode(
                    lg, arith, rule, llr, iterations
                )
                plane = lifted_flooding_decode(lg, arith, llr, iterations)
        finally:
            if forced_alias:
                del _os.environ["LDPC_FORCE_ALIASED"]
        sf = np.asarray(fused["success"])
        sp = np.asarray(plane["success"])
        cw_f = np.asarray(fused["codeword"])
        cw_p = np.asarray(plane["codeword"])
        # integer rules are rounding-free: demand full equality incl.
        # unconverged posteriors; float rules may differ in unconverged
        # posteriors (variable-sum rounding order), so compare converged
        # frames — which must agree bit-for-bit
        cw_scope = slice(None) if arith.is_int8 else sf & sp
        same = (
            bool((sf == sp).all())
            and bool(
                (
                    np.asarray(fused["iterations"])
                    == np.asarray(plane["iterations"])
                ).all()
            )
            and bool((cw_f[cw_scope] == cw_p[cw_scope]).all())
        )
        detail = (
            f"converged {int(sf.sum())}/{batch}, "
            f"success match {int((sf == sp).sum())}/{batch}"
        )
        if log is not None:
            log(name, same, detail)
        if not same or not int(sp.sum()):
            failures.append(name)
    return failures
