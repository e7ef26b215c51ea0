"""Store-level unit tests, porting the reference's store suite
(/root/reference/src/store.rs:230-291): add, negative keys, growth,
collapse, below-floor merge rule."""

import numpy as np
import pytest

from ddsketchy_spark.core.store import Store


def test_empty_store():
    s = Store(64)
    assert s.is_empty() and s.count == 0 and s.length == 0


def test_add_single_and_negative_keys():
    s = Store(4096)
    for k in [5, -3, 0, 100, -200]:
        s.add(k)
    assert s.count == 5
    keys, counts = s.nonzero_items()
    assert sorted(keys.tolist()) == [-200, -3, 0, 5, 100]
    assert counts.sum() == 5
    assert s.min_key == -200 and s.max_key == 100


def test_chunked_growth_and_cap():
    s = Store(256)
    s.add_keys(np.arange(0, 100))
    assert s.length == 128  # chunk-of-128 growth
    s.add_keys(np.arange(100, 200))
    assert s.length == 256
    assert not s.is_collapsed


def test_collapse_lowest_preserves_high():
    s = Store(128)
    s.add_keys(np.arange(0, 1000))  # span 1000 > 128 -> collapse
    assert s.is_collapsed
    assert s.length == 128
    assert s.count == 1000
    assert s.max_key == 999
    # the high keys each hold exactly their own count
    keys, counts = s.nonzero_items()
    assert keys[-1] == 999 and counts[-1] == 1
    # all collapsed mass is in the floor bin
    assert counts[0] == 1000 - 127


def test_below_floor_add_goes_to_first_bin():
    s = Store(64)
    s.add_keys(np.arange(0, 200))
    assert s.is_collapsed
    before_first = s.bins[0]
    s.add(-1000)  # below the collapsed floor
    assert s.bins[0] == before_first + 1
    assert s.count == 201


def test_merge_below_floor_rule():
    """Merging a low-keyed store into a collapsed one sums the below-floor
    bins into bins[0] (/root/reference/src/store.rs:190-198)."""
    a = Store(64)
    a.add_keys(np.arange(500, 700))  # collapsed, floor = 700-64+1 = 637
    b = Store(64)
    b.add_keys(np.arange(600, 650))  # overlaps the floor boundary
    a_floor = a.min_key
    below = sum(1 for k in range(600, 650) if k < a_floor)
    first_before = int(a.bins[0])
    a.merge(b)
    assert a.count == 250
    assert int(a.bins[0]) >= first_before + below


def test_merge_into_empty_copies_config():
    a = Store(64)
    b = Store(64)
    b.add_keys(np.arange(0, 200))
    a.merge(b)
    assert a == b


def test_key_at_rank_strict_greater():
    s = Store(4096)
    s.add_keys(np.asarray([10, 10, 20]), np.asarray([2, 0, 3]))
    # counts: key10 -> 2, key20 -> 3; cum: 2, 5
    assert s.key_at_rank(0) == 10
    assert s.key_at_rank(1) == 10
    assert s.key_at_rank(2) == 20  # strict >: rank 2 passes key10's cum=2
    assert s.key_at_rank(4) == 20
    assert s.key_at_rank(99) == 20  # fallback max_key


def test_codec_roundtrip():
    s = Store(512)
    s.add_keys(np.arange(-50, 450))
    back, pos = Store.from_bytes_at(s.to_bytes(), 0)
    assert back == s
    assert pos == len(s.to_bytes())
