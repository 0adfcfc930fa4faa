"""Bit-exact parity of the host RNG stack with the reference's pinned RNG.

Golden values come from the reference's own tests/doctests:
rand.rs:6-13 (seed_from_u64 + next_u64), util.rs:95-130 (sort_by_random_sel
vectors), mackay_neal.rs:266-298 (seed-187 golden alist, Random policy).
"""

from ldpc_toolbox_tpu.mackay_neal import Config as MNConfig
from ldpc_toolbox_tpu.mackay_neal import FillPolicy
from ldpc_toolbox_tpu.utils.chacha import ChaCha8Rng, choose_multiple
from ldpc_toolbox_tpu.utils.rng import Rng, sort_by_random_sel


def test_seed_from_u64_next_u64_golden():
    # reference rand.rs doctest (rand.rs:6-13)
    rng = ChaCha8Rng.seed_from_u64(42)
    assert rng.next_u64() == 12578764544318200737


def test_next_u64_is_two_u32_lo_first():
    a = ChaCha8Rng.seed_from_u64(7)
    b = ChaCha8Rng.seed_from_u64(7)
    lo, hi = a.next_u32(), a.next_u32()
    assert b.next_u64() == lo | (hi << 32)


def test_next_u64_across_refill_boundary():
    # BlockRng::next_u64 at index == len-1 takes lo from the last word of
    # the old buffer and hi from the first word of the new one.
    a = ChaCha8Rng.seed_from_u64(3)
    b = ChaCha8Rng.seed_from_u64(3)
    for _ in range(63):
        a.next_u32()
        b.next_u32()
    lo = b.next_u32()
    hi = b.next_u32()
    assert a.next_u64() == lo | (hi << 32)
    # and the two generators stay in sync afterwards
    assert a.next_u32() == b.next_u32()


def test_rfc_chacha_block_shape():
    # 256 fresh u32 words per 4-block refill, all in [0, 2^32)
    rng = ChaCha8Rng.from_seed(bytes(range(32)))
    words = [rng.next_u32() for _ in range(130)]
    assert all(0 <= w < 2**32 for w in words)
    assert len(set(words)) > 120  # stream is not degenerate


def test_random_range_bounds_and_determinism():
    rng = ChaCha8Rng.seed_from_u64(0)
    vals = [rng.random_range(n) for n in (1, 2, 3, 10, 1000, 2**40)]
    for v, n in zip(vals, (1, 2, 3, 10, 1000, 2**40)):
        assert 0 <= v < n
    rng2 = ChaCha8Rng.seed_from_u64(0)
    assert vals == [rng2.random_range(n) for n in (1, 2, 3, 10, 1000, 2**40)]


def test_choose_multiple_short_input():
    rng = ChaCha8Rng.seed_from_u64(0)
    assert choose_multiple(rng, range(3), 5) == [0, 1, 2]


def test_sort_by_random_sel_all_distinct():
    # util.rs:99-106: distinct keys -> deterministic smallest-4 prefix
    u = sort_by_random_sel(list(range(10)), 4, lambda x: x, Rng(0))
    assert u == [0, 1, 2, 3]


def test_sort_by_random_sel_equal_by_blocks():
    # util.rs:108-120: 100 items in blocks of 10 equal keys, pick 15
    v = [(j, j // 10) for j in range(100)]
    u = sort_by_random_sel(v, 15, lambda t: t[1], Rng(0))
    assert len(u) == 15
    assert sum(1 for _, x in u if x == 0) == 10


def test_sort_by_random_sel_all_equal():
    # util.rs:122-129
    u = sort_by_random_sel([0] * 50, 25, lambda x: x, Rng(0))
    assert len(u) == 25


def test_mackay_neal_golden_alist_seed187():
    # reference mackay_neal.rs small_matrix test: bit-exact seeded
    # construction parity for FillPolicy::Random
    conf = MNConfig(
        nrows=4, ncols=8, wr=4, wc=2, fill_policy=FillPolicy.RANDOM
    )
    h = conf.run(187)
    assert h.alist() == (
        "8 4\n2 4\n2 2 2 2 2 2 2 2\n4 4 4 4\n"
        "1 3\n2 4\n2 3\n1 4\n1 4\n1 4\n2 3\n2 3\n"
        "1 4 5 6\n2 3 7 8\n1 3 7 8\n2 4 5 6\n"
    )
