"""Cuckoo filter: membership, deletion, FPR bound, merge-order invariance."""

import pickle

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_ray.state import (
    CuckooFilterSpec,
)
from cardinality_estimation_evaluation_framework_ray.state.base import (
    spec_from_dict,
)


SPEC = CuckooFilterSpec(log2_buckets=14, bucket_size=4, fp_bits=12, seed=7)


def test_no_false_negatives_and_fpr_bound():
    rs = np.random.RandomState(0)
    members = rs.choice(10_000_000, size=30_000, replace=False)
    s = SPEC.new()
    s.update_tokens(members)
    assert s.contains(members).all()            # never a false negative
    non_members = np.setdiff1d(
        rs.choice(10_000_000, size=60_000, replace=False), members)
    fpr = s.contains(non_members).mean()
    bound = SPEC.fpr_bound(s.load_factor)
    assert fpr <= 2.0 * bound                   # small-sample slack
    assert fpr < 0.01


def test_multiset_delete_semantics():
    s = SPEC.new()
    s.update_tokens(np.array([5, 5, 9]))
    assert s.n == 3
    s.delete_tokens(np.array([5]))              # one copy remains
    assert s.contains(np.array([5, 9])).all()
    s.delete_tokens(np.array([5]))
    got = s.contains(np.array([5, 9]))
    assert not got[0] and got[1]
    assert s.n == 1
    with pytest.raises(KeyError, match="absent"):
        s.delete_tokens(np.array([5]))


def test_bulk_delete_clears_membership():
    rs = np.random.RandomState(3)
    keys = rs.choice(1_000_000, size=20_000, replace=False)
    s = SPEC.new()
    s.update_tokens(keys)
    drop = keys[:7_000]
    s.delete_tokens(drop)
    assert s.n == 13_000
    assert s.contains(keys[7_000:]).all()
    # deleted keys may still false-positive via OTHER keys' fingerprints,
    # but only at ~FPR: almost all must be gone
    assert s.contains(drop).mean() < 0.01


def test_answers_partition_and_merge_order_invariant():
    """contains() is a pure function of the inserted multiset: any split
    of the stream and any merge order gives identical answers."""
    rs = np.random.RandomState(1)
    stream = rs.randint(0, 500_000, size=40_000)
    probes = np.arange(0, 1_000_000, 17)
    whole = SPEC.new()
    whole.update_tokens(stream)
    base = whole.contains(probes)
    assert base.sum() > 0
    for n_parts, order in [(3, [2, 0, 1]), (6, [5, 3, 1, 0, 4, 2])]:
        parts = np.array_split(stream, n_parts)
        states = []
        for p in parts:
            st = SPEC.new()
            st.update_tokens(p)
            states.append(st)
        acc = states[order[0]]
        for i in order[1:]:
            acc.merge_in(states[i])
        assert acc.n == whole.n
        np.testing.assert_array_equal(acc.contains(probes), base)


def test_overflow_raises_loudly():
    tiny = CuckooFilterSpec(log2_buckets=4, bucket_size=4, fp_bits=12,
                            seed=2, max_kicks=50)
    s = tiny.new()
    with pytest.raises(RuntimeError, match="cuckoo filter full"):
        s.update_tokens(np.arange(200))         # 3x the 64-slot capacity


def test_bucket_compaction_invariant_after_deletes():
    """Occupied slots stay a prefix of each bucket (the placement fast
    path depends on it)."""
    rs = np.random.RandomState(5)
    keys = rs.choice(100_000, size=5_000, replace=False)
    s = SPEC.new()
    s.update_tokens(keys)
    s.delete_tokens(keys[::3])
    occ = s.table != 0
    first_free = occ.shape[1] - np.fliplr(occ).argmax(axis=1)
    has_any = occ.any(axis=1)
    assert (occ.sum(axis=1) == np.where(has_any, first_free, 0)).all()


def test_serialization_round_trip_and_registry():
    assert spec_from_dict(SPEC.to_dict()) == SPEC
    s = SPEC.new()
    s.update_tokens(np.arange(1000))
    clone = SPEC.new()
    clone.load_state(pickle.loads(s.to_bytes()))
    assert clone.n == s.n
    np.testing.assert_array_equal(clone.table, s.table)
    assert clone.contains(np.arange(1000)).all()


def test_fp_bits_validation_and_estimate():
    with pytest.raises(ValueError, match="fp_bits"):
        CuckooFilterSpec(fp_bits=17).new()
    s = SPEC.new()
    s.update_tokens(np.array([1, 2, 3]))
    assert s.estimate() == [3.0]


def test_delete_is_atomic_on_failure():
    """A failing batch delete rolls the table AND count back — catching the
    documented KeyError must leave a consistent filter."""
    s = SPEC.new()
    keys = np.arange(100, 200)
    s.update_tokens(keys)
    table_before = s.table.copy()
    n_before = s.n
    with pytest.raises(KeyError):
        s.delete_tokens(np.array([150, 151, 999_999_999]))  # last is absent
    np.testing.assert_array_equal(s.table, table_before)
    assert s.n == n_before
    assert s.contains(keys).all()
    s.delete_tokens(np.array([150, 151]))  # clean batch still works
    assert s.n == n_before - 2
