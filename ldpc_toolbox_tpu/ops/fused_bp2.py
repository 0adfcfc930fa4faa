"""Fused belief-propagation phase kernels, v2 (Pallas TPU).

Replaces the round-1 lane-doubled layout (`fused_bp.py`) after profiling
showed the chip is bandwidth-bound at ~300 GB/s combined read+write and
the doubled writes were pure amplification.  The v2 layout stores every
message plane exactly once, **pre-rolled into its consumer's lane
coordinates** and ordered **consumer-major**:

  * ``v2c``  (nbt, CE, Z, Bt) — check-major, check coordinates
  * ``c2v``  (nbt, VE, Z, Bt) — var-major, var coordinates
  * ``bits`` (nbt, VG, Z, Bt) int8 — posterior hard decisions, var coords

so each phase kernel

  1. reads one fully contiguous ``(d, Z, Bt)`` slab per node group with a
     single double-buffered DMA (streams at copy bandwidth),
  2. applies the check/variable rule on the stacked planes in VMEM,
  3. rotates each output plane into the *other* side's coordinates with a
     dynamic ``pltpu.roll`` (measured ~free) and DMA-writes it to its
     consumer-major position (scattered single-plane writes, measured at
     copy bandwidth with >=3 write slots).

Incomplete circulants (the DVB-S2 staircase corner, dvbs2.rs:92-97) are
neutralized in-kernel: the variable kernel pokes +big into the missing
lane of the v2c planes it produces (min-sum ignores it), the check kernel
pokes 0 into the missing lane of its c2v planes (the variable sum ignores
it), and the syndrome kernel masks the lane out of the XOR — so the hot
loop has no host-side scatter fixups at all.

The syndrome kernel keeps all VG hard-bit planes of a batch tile resident
in VMEM (int8, ~8 MB at Bt=128) and revisits the block across check
groups, so convergence checking costs one 1-byte-per-bit read per
iteration instead of re-reading bf16 posteriors per edge.

Reference semantics covered: flooding schedule check/variable update and
parity test per iteration (reference decoder/flooding.rs:66-125,
decoder.rs:157-164), vectorized over a batch and a Z-lift.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BT",
    "FusedLayout",
    "build_fused_layout",
    "fused_check",
    "fused_var",
    "fused_syndrome_bits",
    "rule_for",
    "MinSumRule",
    "PhiRule",
    "TanhRule",
    "MinstarApproxRule",
    "AminstarRule",
    "MinstarApproxI8Rule",
    "AminstarI8Rule",
]

#: batch-tile width (one VPU lane group)
BT = 128
#: write-DMA slots (in-flight scattered plane writes per kernel)
WS = 3
#: largest slab degree the kernels hold in VMEM at Bt=128
MAX_DEGREE = 36


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@dataclass(frozen=True)
class _SideMeta:
    """Static per-bucket metadata: groups [g0, g1) with degree d whose
    first edge (in this side's flat consumer-major order) is ebase."""

    g0: int
    g1: int
    d: int
    ebase: int


@dataclass(frozen=True)
class FusedLayout:
    """Flat index tensors for the v2 fused kernels, built once per code.

    Edge flat orders: ``chk_*`` arrays are check-major (the order of
    ``v2c`` planes), ``var_*`` arrays are var-major (the order of ``c2v``
    planes).  ``rot`` entries are dynamic `pltpu.roll` amounts applied to
    a kernel's *output* plane to bring it into the consumer's lane
    coordinates; ``omask`` is the single missing lane to poke in the
    output plane (-1 = none).
    """

    Z: int
    Zp: int  # padded sublane count: Z rounded up to a multiple of 8
    E: int  # base edges
    CG: int  # check groups (flattened, bucket-major)
    VG: int  # var groups (flattened, bucket-major)

    chk_meta: tuple  # tuple[_SideMeta], grid order
    var_meta: tuple

    chk_cs: np.ndarray  # (CG,) chunk start plane in v2c
    chk_dest: np.ndarray  # (E,) var-major dest plane in c2v
    chk_rot: np.ndarray  # (E,) roll check->var = (Z - s) % Z
    chk_omask: np.ndarray  # (E,) missing lane in var coords, -1 none

    var_cs: np.ndarray  # (VG,) chunk start plane in c2v
    var_dest: np.ndarray  # (E,) check-major dest plane in v2c
    var_rot: np.ndarray  # (E,) roll var->check = s
    var_omask: np.ndarray  # (E,) missing lane in check coords, -1 none

    syn_vg: np.ndarray  # (E,) check-major: var-group plane of each edge
    syn_rot: np.ndarray  # (E,) roll var->check = s
    syn_mask: np.ndarray  # (E,) missing lane in check coords, -1 none

    # var-major edge -> var group (for building v2c0 on the check-major
    # side we need the inverse; kept for the decode-loop glue)
    cm_vg: np.ndarray  # (E,) check-major edge -> var group (bucket order)
    cm_shift: np.ndarray  # (E,) edge lift shift s

    @property
    def max_chk_degree(self) -> int:
        return max((m.d for m in self.chk_meta), default=0)

    @property
    def max_var_degree(self) -> int:
        return max((m.d for m in self.var_meta), default=0)

    @property
    def pad(self) -> int:
        """Pad lanes per plane (Zp - Z). Non-zero only for codes whose
        lift violates Mosaic's 8-sublane alignment for dynamic rolls
        (CCSDS C2's Z=511): planes are stored (Zp, Bt) and every rotate
        uses the two-roll mod-Z decomposition in ``_roll``."""
        return self.Zp - self.Z

    @property
    def fusable(self) -> bool:
        return (
            self.max_chk_degree <= MAX_DEGREE
            and self.max_var_degree <= MAX_DEGREE
        )


def build_fused_layout(lg) -> FusedLayout:
    """Build the v2 flat layout from a decoder.lifted.LiftedGraph.

    Raises ValueError for graphs whose incomplete circulants are missing
    more than one lane per edge (no standards family here does that);
    callers fall back to the unfused path.
    """
    Z = lg.Z
    E = lg.num_base_edges

    # flat consumer-major metadata per side
    def metas(buckets):
        out = []
        g0 = 0
        ebase = 0
        for b in buckets:
            n = len(b.groups)
            if n == 0:
                continue
            out.append(_SideMeta(g0=g0, g1=g0 + n, d=b.degree, ebase=ebase))
            g0 += n
            ebase += n * b.degree
        return tuple(out), g0, ebase

    chk_meta, CG, ce = metas(lg.chk_buckets)
    var_meta, VG, ve = metas(lg.var_buckets)
    assert ce == E and ve == E, (ce, ve, E)

    chk_cs = np.empty(CG, np.int32)
    for m in chk_meta:
        chk_cs[m.g0 : m.g1] = m.ebase + np.arange(m.g1 - m.g0) * m.d
    var_cs = np.empty(VG, np.int32)
    for m in var_meta:
        var_cs[m.g0 : m.g1] = m.ebase + np.arange(m.g1 - m.g0) * m.d

    # per-edge flat arrays from the LiftedGraph buckets
    def flat(buckets, attr):
        parts = [
            getattr(b, attr).reshape(-1)
            for b in buckets
            if len(b.groups) and b.degree
        ]
        return (
            np.concatenate(parts).astype(np.int32)
            if parts
            else np.zeros(0, np.int32)
        )

    chk_dest = flat(lg.chk_buckets, "planes")  # vm position
    chk_s = flat(lg.chk_buckets, "shifts")  # +s
    chk_rot = ((Z - chk_s) % Z).astype(np.int32)
    syn_vg = flat(lg.chk_buckets, "var_group_pos")
    syn_rot = chk_s.copy()

    var_dest = flat(lg.var_buckets, "planes")  # cm position
    var_ms = flat(lg.var_buckets, "shifts")  # (-s) % Z
    var_rot = ((Z - var_ms) % Z).astype(np.int32)

    chk_omask = np.full(E, -1, np.int32)
    var_omask = np.full(E, -1, np.int32)
    syn_mask = np.full(E, -1, np.int32)
    for vm_posn, cm_posn, lanes_c, lanes_v in lg.missing:
        if len(lanes_c) != 1:
            raise ValueError(
                "fused v2 layout supports single-lane circulant gaps only"
            )
        chk_omask[cm_posn] = int(lanes_v[0])
        var_omask[vm_posn] = int(lanes_c[0])
        syn_mask[cm_posn] = int(lanes_c[0])

    cm_vg = syn_vg.copy()
    cm_shift = chk_s.copy()

    return FusedLayout(
        Z=Z,
        Zp=((Z + 7) // 8) * 8,
        E=E,
        CG=CG,
        VG=VG,
        chk_meta=chk_meta,
        var_meta=var_meta,
        chk_cs=chk_cs,
        chk_dest=chk_dest,
        chk_rot=chk_rot,
        chk_omask=chk_omask,
        var_cs=var_cs,
        var_dest=var_dest,
        var_rot=var_rot,
        var_omask=var_omask,
        syn_vg=syn_vg,
        syn_rot=syn_rot,
        syn_mask=syn_mask,
        cm_vg=cm_vg,
        cm_shift=cm_shift,
    )


def _roll(x, amount, pad=0):
    """Dynamic mod-Z circular shift along the sublane axis.

    ``pad == 0``: plain ``pltpu.roll`` (32-bit lowering).

    ``pad > 0``: the plane has ``Zp = Z + pad`` sublanes but circulant
    semantics are mod ``Z`` (Mosaic's dynamic sublane roll needs the
    sublane count 8-aligned, so Z=511 codes like CCSDS C2 store planes
    padded to Zp=512). A mod-Z rotate of the live lanes decomposes into
    two aligned mod-Zp rolls selected by output lane:

        y[j] = roll(x, s)[j]        for j >= s   (x[j-s], no wrap)
        y[j] = roll(x, s + pad)[j]  for j <  s   (x[j-s+Z], the wrap)

    Live output lanes (< Z) only ever read live input lanes, so garbage
    in the pad lanes cannot leak; the pad lanes of ``y`` are garbage and
    must be re-poked neutral by the caller (same mechanism as the
    missing-lane pokes).
    """
    from jax.experimental.pallas import tpu as pltpu

    if pad == 0:
        return pltpu.roll(x, amount, 0)
    a = pltpu.roll(x, amount, 0)
    b = pltpu.roll(x, amount + pad, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(lane < amount, b, a)


class MinSumRule:
    """(Normalized) min-sum over float planes: two-pass
    min1/min2/argmin/sign-parity fold. Mirrors the min-sum extension
    semantics of decoder/arithmetic.py under batching."""

    #: per-rule degree caps (VMEM / program-size bound)
    max_check_degree = MAX_DEGREE
    max_var_degree = MAX_DEGREE

    def __init__(self, dtype, scale: float = 1.0):
        self.storage_dtype = jnp.dtype(dtype)
        self.compute_dtype = jnp.dtype(jnp.float32)
        self.big = float(jnp.finfo(dtype).max)  # v2c missing-lane poke
        self.scale = float(scale)

    def check(self, planes):
        d = len(planes)
        mags = [jnp.abs(x) for x in planes]
        negs = [x < 0 for x in planes]
        m1 = mags[0]
        m2 = jnp.full_like(m1, self.big)
        arg = jnp.zeros(m1.shape, jnp.int32)
        par = negs[0]
        for k in range(1, d):
            mk = mags[k]
            m2 = jnp.minimum(m2, jnp.maximum(m1, mk))
            take = mk < m1
            m1 = jnp.where(take, mk, m1)
            arg = jnp.where(take, k, arg)
            par = par ^ negs[k]
        outs = []
        for t in range(d):
            loo = jnp.where(arg == t, m2, m1)
            if self.scale != 1.0:
                loo = loo * jnp.float32(self.scale)
            outs.append(jnp.where(par ^ negs[t], -loo, loo))
        return outs

    def var(self, q, xs, degree):
        tot = q
        for x in xs:
            tot = tot + x
        return [tot - x for x in xs], tot

    # layered-schedule helpers (horizontal_layered.rs:105-110)
    def layered_x(self, qv, rold):
        return qv - rold

    def qv_dtype(self, arithmetic):
        return jnp.dtype(arithmetic.var_llr_storage_dtype)


class _FloatRuleBase:
    """Shared float-family plumbing: float storage, f32 compute (f64 when
    the storage is f64 — interpret mode on x64 CPUs; TPUs map f64 names to
    f32 in the factory), plain sum-minus-own variable rule
    (arithmetic.rs:140-156) and Qv-Rcv layered extrinsic."""

    max_check_degree = MAX_DEGREE
    max_var_degree = MAX_DEGREE

    def __init__(self, dtype):
        self.storage_dtype = jnp.dtype(dtype)
        self.compute_dtype = (
            jnp.dtype(jnp.float64)
            if self.storage_dtype == jnp.float64
            else jnp.dtype(jnp.float32)
        )
        # missing-lane poke: behaves as an infinitely reliable bit-0
        # message (phi -> 0, tanh -> tanh(clamp), min*/min -> neutral)
        self.big = float(jnp.finfo(self.storage_dtype).max)

    def var(self, q, xs, degree):
        tot = q
        for x in xs:
            tot = tot + x
        return [tot - x for x in xs], tot

    def layered_x(self, qv, rold):
        return qv - rold

    def qv_dtype(self, arithmetic):
        return jnp.dtype(arithmetic.var_llr_storage_dtype)

    @staticmethod
    def _parity(planes):
        negs = [x < 0 for x in planes]
        par = negs[0]
        for k in range(1, len(planes)):
            par = par ^ negs[k]
        return negs, par


class PhiRule(_FloatRuleBase):
    """phi-involution sum-product (arithmetic.rs:158-298): the fold is
    the sum-of-phis trick — O(d) transcendentals per plane on the VPU.
    Same numerically stable phi as decoder.arithmetic.PhiArithmetic."""

    MIN_X = 1e-30

    def _phi(self, x):
        # Pallas lacks expm1, so 1 - e^-x is computed as a 3-term series
        # below 2^-5 (where direct subtraction cancels) and directly
        # above (max rel err ~2e-6 at the crossover). NOTE: the obvious
        # log(exp(-x))-based correction is NOT safe here — XLA's
        # algebraic simplifier rewrites log(exp(y)) = y inside the fused
        # kernel, turning the "did exp round to 1" test into a tautology
        # and sending phi to inf for strong messages.
        minx = jnp.asarray(self.MIN_X, self.compute_dtype)
        x = jnp.maximum(x, minx)
        t = jnp.exp(-x)
        one_minus_t = jnp.where(
            x < 0.03125,
            x * (1.0 - 0.5 * x + (1.0 / 6.0) * (x * x)),
            1.0 - t,
        )
        ln_1mt = jnp.where(
            t < 0.5, jnp.log1p(-t), jnp.log(one_minus_t)
        )
        return jnp.log1p(t) - ln_1mt

    def check(self, planes):
        d = len(planes)
        negs, par = self._parity(planes)
        phis = [self._phi(jnp.abs(x)) for x in planes]
        tot = phis[0]
        for k in range(1, d):
            tot = tot + phis[k]
        outs = []
        for t in range(d):
            y = self._phi(tot - phis[t])
            outs.append(jnp.where(par ^ negs[t], -y, y))
        return outs


class TanhRule(_FloatRuleBase):
    """tanh product rule (arithmetic.rs:300-435): 2*atanh(prod tanh(x/2))
    with the reference's input clamp and the TPU product clamp below one
    (the Tanh-NaN fix, decoder.arithmetic.TanhArithmetic)."""

    def __init__(self, dtype, clamp, prod_max):
        super().__init__(dtype)
        self.clamp = float(clamp)
        self.prod_max = float(prod_max)

    def check(self, planes):
        d = len(planes)
        negs, par = self._parity(planes)
        del negs, par  # signs ride inside the product itself
        c = jnp.asarray(self.clamp, self.compute_dtype)
        ts = [jnp.tanh(jnp.clip(0.5 * x, -c, c)) for x in planes]
        # exclusive prefix/suffix products: product over the other slots
        # without dividing (tanh can be 0), matching the plane path's
        # cumprod order
        pre = [None] * d
        acc = None
        for k in range(d):
            pre[k] = acc
            acc = ts[k] if acc is None else acc * ts[k]
        suf = [None] * d
        acc = None
        for k in reversed(range(d)):
            suf[k] = acc
            acc = ts[k] if acc is None else acc * ts[k]
        pm = jnp.asarray(self.prod_max, self.compute_dtype)
        one = jnp.ones_like(planes[0])
        outs = []
        for t in range(d):
            p = pre[t] if pre[t] is not None else one
            s = suf[t] if suf[t] is not None else one
            prod = jnp.clip(p * s, -pm, pm)
            # Mosaic has no arctanh: atanh(p) = (log1p(p) - log1p(-p))/2,
            # so 2*atanh(p) = log1p(p) - log1p(-p) (exact for small p,
            # stable at the prod_max clamp)
            outs.append(jnp.log1p(prod) - jnp.log1p(-prod))
        return outs


class MinstarApproxRule(_FloatRuleBase):
    """Pairwise min* approximation in the exact reference fold order
    (arithmetic.rs:487-521) with prefix reuse — the float analog of
    MinstarApproxI8Rule."""

    # O(d^2) unrolled fold: cap program size like the i8 rule. 19 =
    # 5G-NR BG1's widest check row; DVB-S2 rows are narrower still.
    max_check_degree = 19

    def _fold(self, a, b):
        return jnp.maximum(
            jnp.minimum(a, b) - jnp.log1p(jnp.exp(-jnp.abs(a - b))), 0.0
        )

    def check(self, planes):
        d = len(planes)
        negs, par = self._parity(planes)
        mags = [jnp.abs(x) for x in planes]
        pre = [None] * d
        acc = None
        for t in range(d):
            pre[t] = acc
            acc = mags[t] if acc is None else self._fold(acc, mags[t])
        outs = []
        for t in range(d):
            a = pre[t]
            for k in range(t + 1, d):
                a = mags[k] if a is None else self._fold(a, mags[k])
            if a is None:  # degree-1 check
                a = jnp.zeros_like(mags[t])
            outs.append(jnp.where(par ^ negs[t], -a, a))
        return outs


class AminstarRule(_FloatRuleBase):
    """A-Min*-BP (arithmetic.rs:899-1072): exact min* fold over the
    non-minimum edges; the min edge gets the fold, all others share
    min*(fold, vmin). First-minimum argmin, like the plane path."""

    def _minstar_full(self, a, b):
        return (
            jnp.minimum(a, b)
            - jnp.log1p(jnp.exp(-jnp.abs(a - b)))
            + jnp.log1p(jnp.exp(-(a + b)))
        )

    def check(self, planes):
        d = len(planes)
        negs, par = self._parity(planes)
        mags = [jnp.abs(x) for x in planes]
        m1 = mags[0]
        arg = jnp.zeros(m1.shape, jnp.int32)
        for k in range(1, d):
            take = mags[k] < m1
            m1 = jnp.where(take, mags[k], m1)
            arg = jnp.where(take, k, arg)
        acc = jnp.zeros_like(m1)
        cnt = jnp.zeros(m1.shape, jnp.int32)
        for k in range(d):
            elig = arg != k
            first = elig & (cnt == 0)
            folded = self._minstar_full(acc, mags[k])
            acc = jnp.where(first, mags[k], jnp.where(elig, folded, acc))
            cnt = cnt + elig.astype(jnp.int32)
        d_oth = self._minstar_full(acc, m1)
        outs = []
        for t in range(d):
            mag = jnp.where(arg == t, acc, d_oth)
            outs.append(jnp.where(par ^ negs[t], -mag, mag))
        return outs


def _i8_thresholds():
    """The <=127-entry i8 correction table (arithmetic.rs:589-602) as
    compare thresholds: table[t] == sum_k [t <= T_k] because the table is
    non-increasing — an exact in-kernel lookup with ~6 compares instead
    of a VPU gather."""
    from ..decoder.arithmetic import i8_correction_table

    tab = i8_correction_table()
    assert (np.diff(tab) <= 0).all()
    return [int(np.max(np.nonzero(tab >= k)[0])) for k in range(1, int(tab[0]) + 1)]


def _phl(x):
    """Partial hard limit (arithmetic.rs:812-824)."""
    return jnp.where(x <= -100, -127, jnp.where(x >= 100, 127, x))


class _I8RuleBase:
    """Shared i8 plumbing: int8 storage, int32 lanes, reference clips
    (arithmetic.rs:585-897). ``jones``/``hard_limit``/``deg1_clip`` match
    the 8 reference variants per family."""

    max_check_degree = MAX_DEGREE
    max_var_degree = MAX_DEGREE

    def __init__(self, jones=False, hard_limit=False, deg1_clip=False):
        self.storage_dtype = jnp.dtype(jnp.int8)
        self.compute_dtype = jnp.dtype(jnp.int32)
        self.big = 127  # v2c missing-lane poke (one-lane i8 approximation)
        self.jones = jones
        self.hard_limit = hard_limit
        self.deg1_clip = deg1_clip
        self.thr = _i8_thresholds()

    def _tab(self, t):
        import os

        if os.environ.get("LDPC_I8_TAB") == "sum":
            # round-4 form, kept for comparison runs: indicator-sum
            # cascade (same op count as the tree but a serial add chain)
            c = None
            for T in self.thr:
                term = (t <= T).astype(jnp.int32)
                c = term if c is None else c + term
            return c
        return self._tab_tree(t)

    def _tab_tree(self, t):
        """Balanced select-tree evaluation of the monotone correction
        table (default since round 5; VERDICT r4 #8): same op count as
        the indicator sum but log-depth dependencies, which the d^2
        fold chain converts into real ILP — measured +4.3% on the
        flagship HLMinstarapproxi8, +10% on 5G BG1 i8, +3.5% on
        HLAminstari8 (RESULTS "i8 correction fold"). Bit-identical
        values (tested over the full 0..255 input range)."""
        bps = sorted(self.thr)  # ascending breakpoints
        vals = list(range(len(bps), -1, -1))  # tab value per interval

        def tree(bps, vals):
            if len(vals) == 1:
                return jnp.full_like(t, vals[0])
            mid = len(bps) // 2
            left = tree(bps[:mid], vals[: mid + 1])
            right = tree(bps[mid + 1 :], vals[mid + 1 :])
            return jnp.where(t <= bps[mid], left, right)

        return tree(bps, vals)

    def var(self, q, xs, degree):
        inp = jnp.clip(q, -116, 116) if (self.deg1_clip and degree == 1) else q
        tot = inp
        for x in xs:
            tot = tot + x
        if self.jones:
            tot = jnp.clip(tot, -127, 127)
        return [jnp.clip(tot - x, -127, 127) for x in xs], tot

    # layered: x = clip(Qv - Rcv) with i16 posteriors (arithmetic.rs:684-688)
    def layered_x(self, qv, rold):
        return jnp.clip(qv - rold, -127, 127)

    def qv_dtype(self, arithmetic):
        return jnp.dtype(jnp.int16)


class MinstarApproxI8Rule(_I8RuleBase):
    """Quantized pairwise min* (arithmetic.rs:718-754): exact left-fold
    order via prefix reuse — bit-identical to the unfused
    MinstarApproxI8Arithmetic fold sequence."""

    # the exact-order leave-one-out fold is O(d^2): cap the unrolled
    # program size (wider checks fall back to the plane-gather path).
    # 19 = 5G-NR BG1's widest check row.
    max_check_degree = 19

    def _fold(self, a, b):
        return jnp.maximum(
            jnp.minimum(a, b) - self._tab(jnp.abs(a - b)), 0
        )

    def check(self, planes):
        d = len(planes)
        mags = [jnp.abs(x) for x in planes]
        negs = [x < 0 for x in planes]
        par = negs[0]
        for k in range(1, d):
            par = par ^ negs[k]
        pre = [None] * d
        acc = None
        for t in range(d):
            pre[t] = acc
            acc = mags[t] if acc is None else self._fold(acc, mags[t])
        outs = []
        for t in range(d):
            a = pre[t]
            for k in range(t + 1, d):
                a = mags[k] if a is None else self._fold(a, mags[k])
            if a is None:  # degree-1 check: no other edges
                a = jnp.zeros_like(mags[t])
            o = jnp.where(par ^ negs[t], -a, a)
            if self.hard_limit:
                o = _phl(o)
            outs.append(o)
        return outs


class AminstarI8Rule(_I8RuleBase):
    """Quantized A-Min*-BP (arithmetic.rs:1129-1192): full min* fold over
    the non-minimum edges; min edge gets the fold, others share
    min*(fold, vmin). First-minimum argmin matches jnp.argmin."""

    def _minstar_full(self, a, b):
        return jnp.maximum(
            jnp.minimum(a, b)
            - self._tab(jnp.abs(a - b))
            + self._tab(jnp.minimum(a + b, 127)),
            0,
        )

    def check(self, planes):
        d = len(planes)
        mags = [jnp.abs(x) for x in planes]
        negs = [x < 0 for x in planes]
        par = negs[0]
        for k in range(1, d):
            par = par ^ negs[k]
        m1 = mags[0]
        arg = jnp.zeros(m1.shape, jnp.int32)
        for k in range(1, d):
            take = mags[k] < m1
            m1 = jnp.where(take, mags[k], m1)
            arg = jnp.where(take, k, arg)
        acc = jnp.zeros_like(m1)
        cnt = jnp.zeros(m1.shape, jnp.int32)
        for k in range(d):
            elig = arg != k
            first = elig & (cnt == 0)
            folded = self._minstar_full(acc, mags[k])
            acc = jnp.where(first, mags[k], jnp.where(elig, folded, acc))
            cnt = cnt + elig.astype(jnp.int32)
        d_min = _phl(acc) if self.hard_limit else acc
        d_oth = self._minstar_full(acc, m1)
        if self.hard_limit:
            d_oth = _phl(d_oth)
        outs = []
        for t in range(d):
            mag = jnp.where(arg == t, d_min, d_oth)
            outs.append(jnp.where(par ^ negs[t], -mag, mag))
        return outs


def rule_for(arithmetic):
    """Map a decoder.arithmetic instance to its fused kernel rule, or
    None when the arithmetic has no fused implementation. All 18 reference
    rule families (arithmetic.rs:158-1304) plus the min-sum extensions map
    here; the i8 checks come first (they subclass Arithmetic too)."""
    from ..decoder.arithmetic import (
        AminstarArithmetic,
        AminstarI8Arithmetic,
        MinstarApproxArithmetic,
        MinstarApproxI8Arithmetic,
        MinSumArithmetic,
        PhiArithmetic,
        TanhArithmetic,
    )

    if isinstance(arithmetic, MinSumArithmetic):
        return MinSumRule(
            arithmetic.storage_dtype, getattr(arithmetic, "scale", 1.0)
        )
    if isinstance(arithmetic, MinstarApproxI8Arithmetic):
        return MinstarApproxI8Rule(
            arithmetic.jones, arithmetic.hard_limit, arithmetic.deg1_clip
        )
    if isinstance(arithmetic, AminstarI8Arithmetic):
        return AminstarI8Rule(
            arithmetic.jones, arithmetic.hard_limit, arithmetic.deg1_clip
        )
    if isinstance(arithmetic, PhiArithmetic):
        return PhiRule(arithmetic.storage_dtype)
    if isinstance(arithmetic, TanhArithmetic):
        return TanhRule(
            arithmetic.storage_dtype, arithmetic.clamp, arithmetic.prod_max
        )
    if isinstance(arithmetic, MinstarApproxArithmetic):
        return MinstarApproxRule(arithmetic.storage_dtype)
    if isinstance(arithmetic, AminstarArithmetic):
        return AminstarRule(arithmetic.storage_dtype)
    return None


def _phase_call(
    *,
    kernel,
    grid,
    num_prefetch,
    in_specs,
    out_shape,
    out_specs,
    scratch_shapes,
    args,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
        compiler_params=None
        if _interpret()
        else pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 2**20
        ),
    )(*args)


def fused_check(v2c, layout: FusedLayout, rule):
    """Check phase: v2c (nbt, E, Z, Bt) -> c2v (nbt, E, Z, Bt).

    Reads contiguous (d, Z, Bt) slabs per check group (double-buffered),
    applies ``rule.check`` in the rule's compute dtype, rolls outputs into
    var coordinates, scatters them to var-major positions.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, E, Z, Bt = v2c.shape  # Z here is the padded plane height (Zp)
    pad = Z - layout.Z
    CG = layout.CG
    total = nbt * CG
    metas = layout.chk_meta
    dmax = layout.max_chk_degree
    dtype = v2c.dtype
    compute = rule.compute_dtype

    def kernel(cs_ref, dest_ref, rot_ref, mask_ref, src_ref, out_ref,
               in_buf, obuf, sem_in, sem_out):
        bt = pl.program_id(0)
        g = pl.program_id(1)
        idx = bt * CG + g

        def in_copy(idx2, slot, d):
            bt2 = idx2 // CG
            g2 = idx2 % CG
            return pltpu.make_async_copy(
                src_ref.at[bt2, pl.ds(cs_ref[g2], d)],
                in_buf.at[slot, pl.ds(0, d)],
                sem_in.at[slot],
            )

        def each_bucket(idx2, fn):
            g2 = idx2 % CG
            for m in metas:
                if len(metas) == 1:
                    fn(m, idx2)
                else:
                    def _body(m=m):
                        fn(m, idx2)
                    pl.when((g2 >= m.g0) & (g2 < m.g1))(_body)

        def write_copies(m, idx2, slot):
            bt2 = idx2 // CG
            g2 = idx2 % CG
            out = []
            for t in range(m.d):
                e = m.ebase + (g2 - m.g0) * m.d + t
                out.append(
                    pltpu.make_async_copy(
                        obuf.at[slot, t],
                        out_ref.at[bt2, dest_ref[e]],
                        sem_out.at[slot, t],
                    )
                )
            return out

        # input pipeline
        @pl.when(idx == 0)
        def _():
            each_bucket(0, lambda m, i2: in_copy(i2, 0, m.d).start())

        @pl.when(idx + 1 < total)
        def _():
            each_bucket(
                idx + 1,
                lambda m, i2: in_copy(i2, (idx + 1) % 2, m.d).start(),
            )

        each_bucket(idx, lambda m, i2: in_copy(i2, idx % 2, m.d).wait())

        # reclaim the write slot used S steps ago
        wslot = idx % WS

        @pl.when(idx >= WS)
        def _():
            each_bucket(
                idx - WS,
                lambda m, i2: [c.wait() for c in write_copies(m, i2, wslot)],
            )

        def compute_fn(m, idx2):
            islot = idx % 2
            x = [in_buf[islot, t].astype(compute) for t in range(m.d)]
            outs = rule.check(x)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)
            for t in range(m.d):
                e = m.ebase + (g - m.g0) * m.d + t
                o = _roll(outs[t], rot_ref[e], pad)
                poke = lane == mask_ref[e]
                if pad:
                    poke |= lane >= layout.Z
                o = jnp.where(poke, 0, o)
                obuf[wslot, t] = o.astype(dtype)
            for c in write_copies(m, idx2, wslot):
                c.start()

        each_bucket(idx, compute_fn)

        # drain all in-flight writes at the last step
        @pl.when(idx == total - 1)
        def _():
            for j in range(min(WS, total)):
                i2 = total - 1 - j
                each_bucket(
                    i2,
                    lambda m, i2=i2, j=j: [
                        c.wait() for c in write_copies(m, i2, i2 % WS)
                    ],
                )

    return _phase_call(
        kernel=kernel,
        grid=(nbt, CG),
        num_prefetch=4,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((nbt, E, Z, Bt), dtype),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, dmax, Z, Bt), dtype),
            pltpu.VMEM((WS, dmax, Z, Bt), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((WS, dmax)),
        ],
        args=(
            jnp.asarray(layout.chk_cs),
            jnp.asarray(layout.chk_dest),
            jnp.asarray(layout.chk_rot),
            jnp.asarray(layout.chk_omask),
            v2c,
        ),
    )


def fused_var(c2v, q_tiled, layout: FusedLayout, rule):
    """Variable phase: c2v (nbt, E, Z, Bt) + q (nbt, VG, Z, Bt) ->
    (v2c (nbt, E, Z, Bt), bits (nbt, VG, Z, Bt) int8).

    ``rule.var`` applies the sum-minus-own variable rule (reference
    arithmetic.rs:140-156, i8 clips arithmetic.rs:622-654); v2c outputs
    are rolled into check coordinates and scattered check-major;
    hard-decision bit planes stay in var coordinates.

    ``c2v=None`` runs the *init* variant: it emits v2c0[e] = roll(q[vg],
    s) exactly (no variable-rule clips, matching the unfused v2c0) with
    the missing-lane pokes — the flooding initialization
    (flooding.rs:88-100) — without the 232 MB XLA gather+transpose the
    naive prologue costs.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    init = c2v is None
    nbt, _VG, Z, Bt = q_tiled.shape  # Z = padded plane height (Zp)
    pad = Z - layout.Z
    E = layout.E
    VG = layout.VG
    total = nbt * VG
    metas = layout.var_meta
    dmax = layout.max_var_degree
    dtype = q_tiled.dtype
    compute = rule.compute_dtype
    big = rule.big

    def kernel(cs_ref, dest_ref, rot_ref, mask_ref, *refs):
        if init:
            (q_ref, v2c_ref, bits_ref, in_buf, qbuf, obuf, bbuf,
             sem_in, sem_q, sem_out) = refs
            src_ref = None
        else:
            (src_ref, q_ref, v2c_ref, bits_ref, in_buf, qbuf, obuf, bbuf,
             sem_in, sem_q, sem_out) = refs
        bt = pl.program_id(0)
        g = pl.program_id(1)
        idx = bt * VG + g

        def in_copy(idx2, slot, d):
            bt2 = idx2 // VG
            g2 = idx2 % VG
            return pltpu.make_async_copy(
                src_ref.at[bt2, pl.ds(cs_ref[g2], d)],
                in_buf.at[slot, pl.ds(0, d)],
                sem_in.at[slot],
            )

        def q_copy(idx2, slot):
            bt2 = idx2 // VG
            g2 = idx2 % VG
            return pltpu.make_async_copy(
                q_ref.at[bt2, g2], qbuf.at[slot], sem_q.at[slot]
            )

        def each_bucket(idx2, fn):
            g2 = idx2 % VG
            for m in metas:
                if len(metas) == 1:
                    fn(m, idx2)
                else:
                    def _body(m=m):
                        fn(m, idx2)
                    pl.when((g2 >= m.g0) & (g2 < m.g1))(_body)

        def start_in(m, idx2, slot):
            if m.d > 0 and not init:
                in_copy(idx2, slot, m.d).start()
            q_copy(idx2, slot).start()

        def wait_in(m, idx2, slot):
            if m.d > 0 and not init:
                in_copy(idx2, slot, m.d).wait()
            q_copy(idx2, slot).wait()

        def write_copies(m, idx2, slot):
            bt2 = idx2 // VG
            g2 = idx2 % VG
            out = []
            for t in range(m.d):
                e = m.ebase + (g2 - m.g0) * m.d + t
                out.append(
                    pltpu.make_async_copy(
                        obuf.at[slot, t],
                        v2c_ref.at[bt2, dest_ref[e]],
                        sem_out.at[slot, t],
                    )
                )
            out.append(
                pltpu.make_async_copy(
                    bbuf.at[slot],
                    bits_ref.at[bt2, g2],
                    sem_out.at[slot, dmax],
                )
            )
            return out

        @pl.when(idx == 0)
        def _():
            each_bucket(0, lambda m, i2: start_in(m, i2, 0))

        @pl.when(idx + 1 < total)
        def _():
            each_bucket(
                idx + 1, lambda m, i2: start_in(m, i2, (idx + 1) % 2)
            )

        each_bucket(idx, lambda m, i2: wait_in(m, i2, idx % 2))

        wslot = idx % WS

        @pl.when(idx >= WS)
        def _():
            each_bucket(
                idx - WS,
                lambda m, i2: [c.wait() for c in write_copies(m, i2, wslot)],
            )

        def compute_fn(m, idx2):
            islot = idx % 2
            q = qbuf[islot].astype(compute)
            if init:
                outs, tot = [q] * m.d, q
            else:
                x = [in_buf[islot, t].astype(compute) for t in range(m.d)]
                outs, tot = rule.var(q, x, m.d)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)
            for t in range(m.d):
                e = m.ebase + (g - m.g0) * m.d + t
                o = _roll(outs[t], rot_ref[e], pad)
                poke = lane == mask_ref[e]
                if pad:
                    poke |= lane >= layout.Z
                o = jnp.where(poke, big, o)
                obuf[wslot, t] = o.astype(dtype)
            bbuf[wslot] = (tot <= 0).astype(jnp.int8)
            for c in write_copies(m, idx2, wslot):
                c.start()

        each_bucket(idx, compute_fn)

        @pl.when(idx == total - 1)
        def _():
            for j in range(min(WS, total)):
                i2 = total - 1 - j
                each_bucket(
                    i2,
                    lambda m, i2=i2: [
                        c.wait() for c in write_copies(m, i2, i2 % WS)
                    ],
                )

    return _phase_call(
        kernel=kernel,
        grid=(nbt, VG),
        num_prefetch=4,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 if init else 2),
        out_shape=[
            jax.ShapeDtypeStruct((nbt, E, Z, Bt), dtype),
            jax.ShapeDtypeStruct((nbt, VG, Z, Bt), jnp.int8),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, max(dmax, 1), Z, Bt), dtype),
            pltpu.VMEM((2, Z, Bt), dtype),
            pltpu.VMEM((WS, max(dmax, 1), Z, Bt), dtype),
            pltpu.VMEM((WS, Z, Bt), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((WS, dmax + 1)),
        ],
        args=(
            jnp.asarray(layout.var_cs),
            jnp.asarray(layout.var_dest),
            jnp.asarray(layout.var_rot),
            jnp.asarray(layout.var_omask),
        )
        + (() if init else (c2v,))
        + (q_tiled,),
    )


def fused_syndrome_bits(bits, layout: FusedLayout):
    """Syndrome from hard-decision bit planes: (nbt, VG, Z, Bt) int8 ->
    (nbt, 8, Bt) int8 "this frame has an unsatisfied check" flags.

    Holds the whole tile's bit planes in VMEM and XOR-folds rolled planes
    per check group, fully unrolled with *static* roll amounts (a static
    `pltpu.roll` is a single rotate op; the dynamic form lowers to a
    log-step cascade that measured ~10x slower and dominated the
    iteration). Unsatisfied-parity planes OR together and reduce to one
    flag row per frame.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbt, VG, Z, Bt = bits.shape  # Z = padded plane height (Zp)
    pad = Z - layout.Z
    metas = layout.chk_meta

    def kernel(bits_ref, out_ref, fbuf):
        lane = jax.lax.broadcasted_iota(jnp.int32, (Z, Bt), 0)
        # one int8 -> f32 relayout per var group (not per edge: the
        # per-edge upcast was 3.5x more relayout work and dominated)
        for vg in range(VG):
            fbuf[vg] = bits_ref[0, vg].astype(jnp.float32)
        acc = None
        for m in metas:
            for gi in range(m.g0, m.g1):
                par = None
                for t in range(m.d):
                    e = m.ebase + (gi - m.g0) * m.d + t
                    vg = int(layout.syn_vg[e])
                    rot = int(layout.syn_rot[e])
                    mask = int(layout.syn_mask[e])
                    b = fbuf[vg]
                    if rot:
                        # static mod-Z roll; two-roll decomposition on
                        # padded planes (see _roll)
                        b = pltpu.roll(b, rot, 0)
                        if pad:
                            b = jnp.where(
                                lane < rot,
                                pltpu.roll(fbuf[vg], rot + pad, 0),
                                b,
                            )
                    if mask >= 0:
                        b = jnp.where(lane == mask, 0.0, b)
                    par = b if par is None else par + b
                if par is None:
                    continue
                # parity of a small exact integer sum (d <= MAX_DEGREE)
                odd = par - 2.0 * jnp.floor(par * 0.5)
                acc = odd if acc is None else jnp.maximum(acc, odd)
        if acc is None:
            out_ref[...] = jnp.zeros_like(out_ref)
            return
        if pad:
            # pad lanes of acc carry wrapped-garbage parities
            acc = jnp.where(lane >= layout.Z, 0.0, acc)
        bad = (jnp.max(acc, axis=0, keepdims=True) > 0.5).astype(jnp.int8)
        out_ref[0] = jnp.broadcast_to(bad, (8, Bt))

    return pl.pallas_call(
        kernel,
        grid=(nbt,),
        in_specs=[
            pl.BlockSpec((1, VG, Z, Bt), lambda bt: (bt, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, Bt), lambda bt: (bt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbt, 8, Bt), jnp.int8),
        scratch_shapes=[pltpu.VMEM((VG, Z, Bt), jnp.float32)],
        interpret=_interpret(),
        compiler_params=None
        if _interpret()
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(bits)
