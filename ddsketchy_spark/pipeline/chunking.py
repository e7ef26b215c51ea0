"""Doc-boundary chunk iteration shared by the batch-vectorized signature
engines (MinHash, SimHash, winnowing).

One implementation of the boundary arithmetic — budget-bounded spans over
a monotone offsets array, always advancing at least one document — so the
engines' chunking can never silently diverge (they are individually
bit-parity-pinned against per-document reference laws, and a one-sided
boundary fix would break exactly one of them).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def iter_doc_chunks(offsets: np.ndarray, budget: int) -> Iterator[tuple[int, int]]:
    """Yield (d0, d1) document ranges whose span ``offsets[d1] -
    offsets[d0]`` is at most ``budget`` units (shingles / words / bytes),
    advancing at least one document per chunk — a single document larger
    than the budget becomes its own chunk (callers grow their reused
    buffer for that case). ``offsets`` is the monotone cumulative array of
    length n_docs + 1; absolute or zero-based both work (the search is
    relative to ``offsets[d0]``)."""
    n = len(offsets) - 1
    d0 = 0
    while d0 < n:
        d1 = int(np.searchsorted(offsets, offsets[d0] + budget,
                                 side="right")) - 1
        d1 = min(max(d1, d0 + 1), n)
        yield d0, d1
        d0 = d1
