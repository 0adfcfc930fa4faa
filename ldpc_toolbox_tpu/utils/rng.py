"""Reproducible host RNG and randomized-selection helpers.

The reference pins a crate-wide seedable stream (``Rng = ChaCha8Rng``,
rand.rs:14-19) used by the pseudorandom constructions, plus two
random-tie-breaking selection helpers (util.rs:22-73).

This framework pins numpy's Philox counter-based generator instead: streams
are reproducible across runs and platforms for a given seed, but are *not*
bit-identical to the Rust ChaCha8 stream — seeded constructions are
validated structurally (shape, weights, girth), not against the reference's
golden alists. Construction randomness never touches the TPU path.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, TypeVar

import numpy as np

__all__ = ["Rng", "sort_by_random_sel", "sort_by_random_min", "compare_none_as_inf"]

T = TypeVar("T")


def Rng(seed: int) -> np.random.Generator:
    """Seedable reproducible generator (framework-wide pin)."""
    return np.random.Generator(np.random.Philox(seed))


def compare_none_as_inf(x: Optional[int]) -> tuple[int, int]:
    """Sort key treating ``None`` as +infinity (util.rs:76-86)."""
    return (1, 0) if x is None else (0, x)


def sort_by_random_sel(
    items: Sequence[T],
    nitems: int,
    key: Callable[[T], object],
    rng: np.random.Generator,
) -> Optional[list[T]]:
    """Pick the ``nitems`` smallest elements by ``key`` with random tie-breaks.

    Elements strictly below the cut value are always taken; the remaining
    slots are filled by a uniform random choice among the elements equal to
    the cut value (util.rs:22-55). Returns None if not enough items.
    """
    if len(items) < nitems:
        return None
    if nitems == 0:
        return []
    decorated = sorted(items, key=key)
    cut_key = key(decorated[nitems - 1])
    sure = [x for x in decorated if key(x) < cut_key]
    ties = [x for x in decorated if key(x) == cut_key]
    need = nitems - len(sure)
    pick_idx = rng.choice(len(ties), size=need, replace=False)
    return sure + [ties[i] for i in sorted(pick_idx)]


def sort_by_random_min(
    items: Sequence[T],
    key: Callable[[T], object],
    rng: np.random.Generator,
) -> Optional[T]:
    """A uniformly random element among those minimizing ``key``
    (util.rs:57-73). Returns None for an empty sequence."""
    if not items:
        return None
    min_key = min(key(x) for x in items)
    candidates = [x for x in items if key(x) == min_key]
    return candidates[int(rng.integers(len(candidates)))]
