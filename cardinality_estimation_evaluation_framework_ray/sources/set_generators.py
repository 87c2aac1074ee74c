"""Faithful ports of the reference's simulation set generators.

Mirrors ``src/simulations/set_generator.py:32-530`` and
``src/simulations/frequency_set_generator.py:33-341`` semantics exactly
(same sampling structure, same overlap laws, same order variants), expressed
as pure functions ``(params, RandomState) -> list[np.ndarray]`` instead of
stateful iterator classes, with the per-id Python loops vectorized
(np.repeat / choice_fast).

These generators are inherently SEQUENTIAL (pool state threads through the
sets), so they run driver-side at the reference's own scale (<= tens of
millions of ids) and are then sharded into the canonical tokens table by
``SetScenarioSpec.make_table`` — the counter-based ``TokensTableSpec``
(datagen.py) remains the partition-invariant source for the 100 TB path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.randkit import choice_fast

ORDER_ORIGINAL = "original"
ORDER_REVERSED = "reversed"
ORDER_RANDOM = "random"
USER_ACTIVITY_ASSOCIATION_INDEPENDENT = "independent"
USER_ACTIVITY_ASSOCIATION_IDENTICAL = "identical"
CORRELATED_SETS_ALL = "all"
CORRELATED_SETS_ONE = "one"

# Optimal Dirac-mixture approximation of the exponential bow
# (set_generator.py:39-43; Table 1 p.14 of research.google/pubs/pub48387)
DIRAC_MIXTURE_OPTIMAL_ALPHA = [0.164, 0.388, 0.312, 0.136]
DIRAC_MIXTURE_OPTIMAL_X = [0.065, 0.4274, 1.275, 3.140]


def _order_indices(order: str, num_sets: int,
                   random_state: np.random.RandomState) -> list[int]:
    """The original/reversed/random order variants (set_generator.py:272-280)."""
    if order == ORDER_ORIGINAL:
        return list(range(num_sets))
    if order == ORDER_REVERSED:
        return list(reversed(range(num_sets)))
    if order == ORDER_RANDOM:
        return list(random_state.choice(num_sets, num_sets, replace=False))
    raise ValueError(f"order={order} is not supported.")


# ---------------------------------------------------------------------------
# cardinality (reach) scenarios
# ---------------------------------------------------------------------------

def independent_sets(universe_size: int, set_sizes, random_state) -> list[np.ndarray]:
    """IndependentSetGenerator (set_generator.py:46-79)."""
    return [choice_fast(universe_size, int(s), random_state) for s in set_sizes]


def exponential_bow_sets(user_activity_association: str, universe_size: int,
                         set_sizes, random_state) -> list[np.ndarray]:
    """ExponentialBowSetGenerator (set_generator.py:82-197).

    Heterogeneous reach probability via the 4-point Dirac mixture of the
    exponential bow.  ``identical`` association: every set samples from the
    same fixed activity strata (the most active ids at one publisher are the
    most active at every publisher).  ``independent``: the universe is
    re-shuffled before each set, decorrelating activity across publishers
    (mathematically equivalent to independent per-publisher activity,
    set_generator.py:132-138).
    """
    if user_activity_association == USER_ACTIVITY_ASSOCIATION_INDEPENDENT:
        shuffle_user = True
    elif user_activity_association == USER_ACTIVITY_ASSOCIATION_IDENTICAL:
        shuffle_user = False
    else:
        raise ValueError(
            f"user_activity_association={user_activity_association} "
            "is an invalid value.")
    size_list = [int(s) for s in set_sizes]
    if min(size_list) < 50:
        raise ValueError("Too small size is not supported for Dirac bow.")
    universe = np.arange(universe_size)
    alpha = np.array(DIRAC_MIXTURE_OPTIMAL_ALPHA) * universe_size
    cumsum_alpha = np.concatenate([[0], np.cumsum(alpha)])
    x = DIRAC_MIXTURE_OPTIMAL_X

    def _select_ids(lb: float, ub: float, size: int) -> np.ndarray:
        lb, ub = int(lb), int(ub)
        candidate_ids = np.arange(lb, ub)
        if size >= ub - lb:
            return candidate_ids
        return choice_fast(candidate_ids, size, random_state)

    out = []
    for set_size in size_list:
        reach_rate = set_size / universe_size
        ids = np.hstack([
            _select_ids(cumsum_alpha[i], cumsum_alpha[i + 1],
                        int(reach_rate * x[i] * alpha[i]))
            for i in range(len(alpha))])
        if shuffle_user:
            random_state.shuffle(universe)
            ids = universe[ids]
        out.append(ids)
    return out


def fully_overlap_sets(universe_size: int, num_sets: int, set_size: int,
                       random_state) -> list[np.ndarray]:
    """FullyOverlapSetGenerator (set_generator.py:200-224)."""
    ids = choice_fast(universe_size, int(set_size), random_state)
    return [ids.copy() for _ in range(num_sets)]


def subset_sets(order: str, universe_size: int, num_large_sets: int,
                num_small_sets: int, large_set_size: int, small_set_size: int,
                random_state) -> list[np.ndarray]:
    """SubSetGenerator with order original/reversed/random
    (set_generator.py:227-300): num_large copies of a large set, num_small
    copies of a small subset of it, emitted in the chosen order."""
    assert small_set_size <= large_set_size, "Small size must <= large size."
    num_sets = num_large_sets + num_small_sets
    indices = _order_indices(order, num_sets, random_state)
    large_set = choice_fast(universe_size, int(large_set_size), random_state)
    small_set = choice_fast(large_set, int(small_set_size), random_state)
    set_ids_list = ([large_set] * num_large_sets + [small_set] * num_small_sets)
    return [set_ids_list[i].copy() for i in indices]


def _sequentially_correlated_all_previous(shared_prop: float, set_size_list,
                                          random_state) -> list[np.ndarray]:
    """_SequentiallyCorrelatedAllPreviousSetGenerator
    (set_generator.py:303-355): set i takes min(int(size_i*shared_prop),
    |union so far|) ids from the union of ALL previous sets, the rest fresh
    from a pre-shuffled pool."""
    sizes = [int(s) for s in set_size_list]
    num_sets = len(sizes)
    overlap_size_list = [0]
    total_ids_size = sizes[0]
    for i in range(num_sets - 1):
        overlap_size = min(int(sizes[i + 1] * shared_prop), total_ids_size)
        overlap_size_list.append(overlap_size)
        total_ids_size += sizes[i + 1] - overlap_size
    ids_pool = np.arange(total_ids_size)
    random_state.shuffle(ids_pool)
    union_ids = np.array([], dtype=np.int64)
    out = []
    for i in range(num_sets):
        overlap_size = overlap_size_list[i]
        set_ids_overlapped = choice_fast(union_ids, overlap_size, random_state)
        set_ids_non_overlapped = ids_pool[:(sizes[i] - overlap_size)]
        ids_pool = ids_pool[len(set_ids_non_overlapped):]
        union_ids = np.concatenate([union_ids, set_ids_non_overlapped])
        out.append(np.concatenate([set_ids_overlapped, set_ids_non_overlapped]))
    return out


def _sequentially_correlated_the_previous(shared_prop: float, set_size_list,
                                          random_state) -> list[np.ndarray]:
    """_SequentiallyCorrelatedThePreviousSetGenerator
    (set_generator.py:358-400): sliding windows over one shuffled pool, so
    set i overlaps only set i-1 by min(int(size_i*shared_prop), size_{i-1})."""
    sizes = [int(s) for s in set_size_list]
    num_sets = len(sizes)
    overlap_size_list = [
        min(int(sizes[i + 1] * shared_prop), sizes[i])
        for i in range(num_sets - 1)]
    total_ids_size = int(sum(sizes) - sum(overlap_size_list))
    ids_pool = np.arange(total_ids_size)
    random_state.shuffle(ids_pool)
    out, start = [], 0
    for i in range(num_sets):
        out.append(ids_pool[start:start + sizes[i]].copy())
        if i < num_sets - 1:
            start += sizes[i] - overlap_size_list[i]
    return out


def sequentially_correlated_sets(order: str, correlated_sets: str,
                                 shared_prop: float, set_sizes,
                                 random_state) -> list[np.ndarray]:
    """SequentiallyCorrelatedSetGenerator: all/one correlation x
    original/reversed/random order (set_generator.py:403-487)."""
    size_list = [int(s) for s in set_sizes]
    indices = _order_indices(order, len(size_list), random_state)
    if correlated_sets == CORRELATED_SETS_ALL:
        sets = _sequentially_correlated_all_previous(shared_prop, size_list,
                                                     random_state)
    elif correlated_sets == CORRELATED_SETS_ONE:
        sets = _sequentially_correlated_the_previous(shared_prop, size_list,
                                                     random_state)
    else:
        raise ValueError(f"correlated_sets={correlated_sets} is not supported.")
    return [sets[i] for i in indices]


def disjoint_sets(set_sizes) -> list[np.ndarray]:
    """DisjointSetGenerator (set_generator.py:490-530): deterministic ranges."""
    out, start = [], 0
    for s in set_sizes:
        out.append(np.arange(start, start + int(s), dtype=np.int64))
        start += int(s)
    return out


# ---------------------------------------------------------------------------
# frequency (multiset) scenarios
# ---------------------------------------------------------------------------

def truncated_poisson_pmf(mu: float, max_freq: int) -> list[float]:
    """Shifted-truncated-Poisson PMF (frequency_set_generator.py:123-148):
    f(k)=e^-mu mu^k/k! for k<max_freq-1, tail mass folded into the last bin."""
    assert mu > 0, "Invalid rate parameter"
    assert max_freq > 0, "Invalid frequency parameter"
    k = np.arange(max_freq - 1)
    log_k_factorial = np.array([0] + list(np.cumsum(np.log(k[1:]))))
    log_poisson = -mu + k * np.log(mu) - log_k_factorial
    poisson_pmf = list(np.exp(log_poisson))
    poisson_pmf.append(1.0 - sum(poisson_pmf))
    return poisson_pmf


def homogeneous_pmf_multisets(universe_size: int, set_sizes, pmfs,
                              random_state) -> list[np.ndarray]:
    """HomogeneousPmfMultiSetGenerator (frequency_set_generator.py:33-79):
    per set, ids ~ uniform without replacement; per-id frequency ~ its set's
    arbitrary shifted PMF (pmf[j] = P[freq = j+1]); multiset = ids repeated.

    Deviation from the reference: PMFs are validated with np.isclose(sum, 1)
    instead of exact float equality."""
    size_list = [int(s) for s in set_sizes]
    pmf_list = [list(p) for p in pmfs]
    assert len(size_list) == len(pmf_list), (
        "Number of sets does not match number of pmfs")
    assert all(np.isclose(sum(p), 1.0) for p in pmf_list), (
        "At least one PMF does not sum to 1.0")
    out = []
    for set_size, pmf in zip(size_list, pmf_list):
        set_ids = choice_fast(universe_size, set_size, random_state)
        freq_per_id = random_state.choice(len(pmf), size=set_size, p=pmf) + 1
        multiset_ids = np.repeat(set_ids, freq_per_id)
        random_state.shuffle(multiset_ids)
        out.append(multiset_ids)
    return out


def homogeneous_multisets(universe_size: int, set_sizes, freq_rates,
                          random_state, freq_cap: int = 100) -> list[np.ndarray]:
    """HomogeneousMultiSetGenerator (frequency_set_generator.py:82-182):
    freq ~ shifted truncated Poisson(freq_rate), capped at freq_cap."""
    size_list = [int(s) for s in set_sizes]
    rate_list = [float(r) for r in freq_rates]
    assert len(size_list) == len(rate_list), (
        "set_sizes and freq_rates do not have equal length.")
    assert all(r >= 0 for r in rate_list), (
        "Elements of freq_rate_list should be non-negative.")
    assert freq_cap > 0, "freq_cap should be positive."
    pmfs = [truncated_poisson_pmf(mu, freq_cap - 1) for mu in rate_list]
    return homogeneous_pmf_multisets(universe_size, size_list, pmfs,
                                     random_state)


def heterogeneous_multisets(universe_size: int, set_sizes, gamma_params,
                            random_state,
                            freq_cap: int | None = None) -> list[np.ndarray]:
    """HeterogeneousMultiSetGenerator (frequency_set_generator.py:185-282):
    per-id rate ~ Gamma(shape, scale); freq ~ Poisson(rate) + 1, capped."""
    size_list = [int(s) for s in set_sizes]
    params = [tuple(p) for p in gamma_params]
    assert len(size_list) == len(params), (
        "set_sizes and gamma_params do not have equal length.")
    assert all(p[0] > 0 for p in params), "Gamma shape parameters must be positive."
    assert all(p[1] > 0 for p in params), "Gamma rate parameters must be positive."
    assert freq_cap is None or freq_cap > 0, "freq_cap should be None or positive."
    out = []
    for set_size, (shape, scale) in zip(size_list, params):
        set_ids = choice_fast(universe_size, set_size, random_state)
        rates = random_state.gamma(shape=shape, scale=scale, size=set_size)
        frequencies = random_state.poisson(lam=rates, size=set_size) + 1
        if freq_cap:
            frequencies = np.minimum(frequencies, freq_cap)
        multiset_ids = np.repeat(set_ids, frequencies)
        random_state.shuffle(multiset_ids)
        out.append(multiset_ids)
    return out


def publisher_constant_frequency_sets(universe_size: int, set_sizes,
                                      frequency: int,
                                      random_state) -> list[np.ndarray]:
    """PublisherConstantFrequencySetGenerator
    (frequency_set_generator.py:285-341): every reached id has frequency f."""
    assert frequency > 0, "frequency should be positive."
    out = []
    for set_size in set_sizes:
        set_ids = choice_fast(universe_size, int(set_size), random_state)
        multiset_ids = np.repeat(set_ids, frequency)
        random_state.shuffle(multiset_ids)
        out.append(multiset_ids)
    return out


# ---------------------------------------------------------------------------
# scenario spec plugging the faithful generators into Simulator / Evaluator
# ---------------------------------------------------------------------------

_GENERATORS = {
    "independent": independent_sets,
    "exponential_bow": exponential_bow_sets,
    "fully_overlapping": fully_overlap_sets,
    "subset": subset_sets,
    "sequentially_correlated": sequentially_correlated_sets,
    "disjoint": lambda set_sizes, random_state=None: disjoint_sets(set_sizes),
    "homogeneous_pmf": homogeneous_pmf_multisets,
    "homogeneous": homogeneous_multisets,
    "heterogeneous": heterogeneous_multisets,
    "publisher_constant_frequency": publisher_constant_frequency_sets,
}


@dataclasses.dataclass(frozen=True)
class SetScenarioSpec:
    """A reference-faithful scenario as a tokens-table source.

    ``kind`` selects a generator from this module; ``params`` are its kwargs
    (minus random_state, which is derived from ``seed``).  The generated id
    sets are chopped into canonical tokens-table rows: set i becomes source
    ``src{i:02d}`` (zero-padded so lexicographic source order == generation
    order, which sequential estimators rely on), ``tokens_per_row`` ids per
    row.  Duck-types TokensTableSpec's (seed, make_table, make_dataset)
    surface used by the Simulator.
    """

    kind: str
    params: tuple[tuple[str, Any], ...]  # sorted kwargs as an immutable tuple
    tokens_per_row: int = 64
    seed: int = 42

    @staticmethod
    def make(kind: str, *, tokens_per_row: int = 64, seed: int = 42,
             **params) -> "SetScenarioSpec":
        if kind not in _GENERATORS:
            raise ValueError(f"unknown scenario kind {kind!r}")
        return SetScenarioSpec(kind=kind,
                               params=tuple(sorted(params.items())),
                               tokens_per_row=tokens_per_row, seed=seed)

    def make_sets(self) -> list[np.ndarray]:
        rs = np.random.RandomState(self.seed % (2**31 - 1))
        kwargs = dict(self.params)
        if self.kind != "disjoint":
            kwargs["random_state"] = rs
        return _GENERATORS[self.kind](**kwargs)

    def make_table(self) -> pa.Table:
        sets = self.make_sets()
        doc_ids, toks, n_toks, sources = [], [], [], []
        offsets = [0]
        for i, ids in enumerate(sets):
            ids = np.asarray(ids, dtype=np.int64)
            assert ids.size == 0 or ids.max() < 2**31, "ids must fit int32"
            src = f"src{i:02d}"
            tpr = self.tokens_per_row
            n_rows = max(1, math.ceil(len(ids) / tpr))
            for r in range(n_rows):
                chunk = ids[r * tpr:(r + 1) * tpr]
                doc_ids.append(f"{src}-{r:08d}")
                toks.append(chunk.astype(np.int32))
                n_toks.append(len(chunk))
                sources.append(src)
        flat = (np.concatenate(toks) if toks else np.empty(0, np.int32))
        lengths = np.asarray(n_toks, dtype=np.int32)
        off = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        tok_arr = pa.ListArray.from_arrays(pa.array(off),
                                           pa.array(flat, type=pa.int32()))
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tok_arr,
            "n_tok": pa.array(lengths, type=pa.int32()),
            "source": pa.array(sources, type=pa.string()),
        })

    def make_dataset(self):
        import ray.data

        return ray.data.from_arrow(self.make_table())
