import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
    dedup_exact_texts,
    exact_distinct_tokens,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
)

BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest while birds sing loudly above the trees")


def _docs_table():
    texts = [
        BASE,                                   # 0
        BASE,                                   # 1 exact dup of 0
        BASE.replace("quick", "rapid"),         # 2 near dup of 0
        "completely different content about database query engines and vectorized executors running on clusters",  # 3
        "yet another unrelated string talking about sketches cardinality and frequency estimation at scale",       # 4
        BASE + " extra tail words appended here",  # 5 near dup of 0
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s0", "s0", "s1", "s1", "s2", "s2"]),
    })


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact_texts():
    ds = ray.data.from_arrow(_docs_table())
    out = dedup_exact_texts(ds).to_pandas().sort_values("kept_doc_id")
    # docs 0 and 1 identical -> kept 0 with 2 copies; others singletons
    kept = dict(zip(out.kept_doc_id, out.n_copies))
    assert kept[0] == 2
    assert 1 not in kept
    assert all(kept[d] == 1 for d in (2, 3, 4, 5))


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dups_finds_planted_pairs():
    ds = ray.data.from_arrow(_docs_table())
    pairs = minhash_near_dups(ds, num_perm=64, bands=16, threshold=0.5,
                              shingle=3).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (0, 1) in got          # identical
    assert (0, 2) in got or (1, 2) in got  # near dup
    # unrelated docs must not pair with the base family
    for bad in ((0, 3), (0, 4), (3, 4)):
        assert bad not in got


@pytest.mark.usefixtures("ray_session")
def test_simhash_near_dups():
    ds = ray.data.from_arrow(_docs_table())
    pairs = simhash_near_dups(ds, max_hamming=3).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (0, 1) in got
    assert (0, 3) not in got and (0, 4) not in got


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_exact():
    ds = ray.data.from_arrow(_docs_table())
    pairs = ngram_jaccard_pairs(ds, n=1, threshold=0.9).to_pandas()
    got = {tuple(sorted((a, b))): j
           for a, b, j in zip(pairs.doc_a, pairs.doc_b, pairs.jaccard)}
    assert got[(0, 1)] == 1.0  # identical word sets
    # replacing one distinct word of 22: J = 21/23
    pairs2 = ngram_jaccard_pairs(ds, n=1, threshold=0.5).to_pandas()
    got2 = {tuple(sorted((a, b))): j
            for a, b, j in zip(pairs2.doc_a, pairs2.doc_b, pairs2.jaccard)}
    assert (0, 2) in got2 and 0.8 < got2[(0, 2)] < 1.0


@pytest.mark.usefixtures("ray_session")
def test_exact_distinct_tokens_matches_truth():
    tbl = pa.table({
        "source": ["a", "a", "b"],
        "tokens": [[1, 2, 2, 3], [3, 4], [1, 1]],
    })
    ds = ray.data.from_arrow(tbl)
    out = exact_distinct_tokens(ds).to_pandas()
    got = {(r.source, r.token) for r in out.itertuples()}
    assert got == {("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 1)}


def _templated_docs(n: int = 60):
    """n docs sharing a templated header (hot shingles) + unique tails."""
    texts = [f"common header words shared by every doc plus unique tail {i} alpha{i} beta{i}"
             for i in range(n)]
    texts[1] = texts[0]  # one exact dup pair
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s"] * n),
    })


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_max_df_cut_bounds_groups():
    """df-cut semantics: ubiquitous shingles dropped from BOTH sizes and
    pairs; per-group pair output is bounded by max_df^2/2."""
    ds = ray.data.from_arrow(_templated_docs(60))
    max_df = 10
    pairs = ngram_jaccard_pairs(ds, n=1, threshold=0.99,
                                max_df=max_df).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    # the exact-dup pair shares its UNIQUE tail shingles (df=2 <= max_df)
    assert (0, 1) in got
    # template-only pairs (jaccard driven by df>max_df header words) are gone
    assert all(p == (0, 1) for p in got)
    # the pair count is far below the uncapped all-pairs blowup
    assert len(pairs) < 60 * 59 / 2


@pytest.mark.usefixtures("ray_session")
def test_simhash_bucket_guard_star_plus_chain():
    """A hot 16-bit chunk bucket larger than max_bucket_size collapses to
    star + chain edges: every member stays linked, output is O(n) not O(n^2)."""
    n = 40
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["identical text body for everyone"] * n),
        "source": pa.array(["s"] * n),
    })
    ds = ray.data.from_arrow(tbl)
    guarded = simhash_near_dups(ds, max_hamming=3, max_bucket_size=5).to_pandas()
    # star (0,i) for i in 1..n-1 plus chain (i,i+1) for i in 1..n-2:
    # identical docs occupy the same 4 chunk buckets -> 2n-3 distinct edges
    got = {tuple(sorted((a, b))) for a, b in zip(guarded.doc_a, guarded.doc_b)}
    expect = {(0, i) for i in range(1, n)} | {(i, i + 1) for i in range(1, n - 1)}
    assert got == expect
    full = simhash_near_dups(ds, max_hamming=3, max_bucket_size=5000).to_pandas()
    assert len(full) == n * (n - 1) / 2


@pytest.mark.usefixtures("ray_session")
def test_minhash_exact_dups_candidates_then_verify():
    """LSH candidates at threshold 1.0 + digest verification: exactly the
    identical-word-set pairs survive — near-dups (which can share all 64
    mins) are filtered by the exact digest."""
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        minhash_exact_dups,
    )

    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma delta",            # exact dup of 0
        "delta gamma beta alpha alpha",      # same SET as 0 (order/multiplicity differ)
        "alpha beta gamma delta epsilon",    # near dup, superset -> must NOT pair
        "totally different words here",
    ]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s"] * len(texts)),
    })
    out = minhash_exact_dups(ray.data.from_arrow(tbl), shingle=1).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(out.doc_a, out.doc_b)}
    assert got == {(0, 1), (0, 2), (1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_union_find():
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_clusters,
    )

    pairs = pa.table({"doc_a": pa.array([1, 2, 9, 5], type=pa.int64()),
                      "doc_b": pa.array([2, 3, 1, 6], type=pa.int64())})
    df = dedup_clusters(ray.data.from_arrow(pairs))
    got = dict(zip(df.doc_id, df.cluster_id))
    # {1,2,3,9} -> 1 ; {5,6} -> 5 ; singletons absent
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_union_find():
    """Distributed min-label propagation and driver union-find agree label-
    for-label on a graph mixing a long chain (worst diameter), a star, an
    isolated edge and cross links."""
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_clusters,
    )

    rng = np.random.default_rng(4)
    # chain 100..119, star around 200, random extra edges among 300..309
    a = list(range(100, 119)) + [200] * 8 + rng.integers(300, 310, 12).tolist()
    b = list(range(101, 120)) + list(range(201, 209)) + \
        rng.integers(300, 310, 12).tolist()
    pairs = pa.table({"doc_a": pa.array(a, type=pa.int64()),
                      "doc_b": pa.array(b, type=pa.int64())})
    # self-pairs possible in the random block: drop them like LSH output would
    import pyarrow.compute as pc
    pairs = pairs.filter(pc.not_equal(pairs.column("doc_a"), pairs.column("doc_b")))
    ds = ray.data.from_arrow(pairs)
    drv = dedup_clusters(ds, engine="driver")
    dist = dedup_clusters(ds, engine="distributed", num_partitions=2)
    assert dict(zip(drv.doc_id, drv.cluster_id)) == \
        dict(zip(dist.doc_id, dist.cluster_id))


@pytest.mark.usefixtures("ray_session")
def test_minhash_bucket_guard_star_plus_chain():
    """MinHash's hot-bucket guard mirrors SimHash's: star + chain edges keep
    the bucket connected with O(n) output."""
    n = 30
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["same words every single time for all docs"] * n),
        "source": pa.array(["s"] * n),
    })
    ds = ray.data.from_arrow(tbl)
    guarded = minhash_near_dups(ds, num_perm=64, bands=16, threshold=0.9,
                                shingle=1, max_bucket_size=4).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(guarded.doc_a, guarded.doc_b)}
    expect = {(0, i) for i in range(1, n)} | {(i, i + 1) for i in range(1, n - 1)}
    assert got == expect
    unguarded = minhash_near_dups(ds, num_perm=64, bands=16, threshold=0.9,
                                  shingle=1, max_bucket_size=None).to_pandas()
    assert len(unguarded) == n * (n - 1) / 2


def test_levenshtein_kernel_matches_reference():
    """The accumulate-trick DP == the classic O(n*m) per-cell DP."""
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        _levenshtein,
    )

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j] + (ca != cb), prev[j + 1] + 1,
                               cur[j] + 1))
            prev = cur
        return prev[-1]

    rng = np.random.RandomState(13)
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
             ("flaw", "lawn"), ("éàü", "eau"), ("same", "same")]
    for _ in range(30):
        n1, n2 = rng.randint(0, 12, size=2)
        cases.append(("".join(rng.choice(list("abcd"), n1)),
                      "".join(rng.choice(list("abcd"), n2))))
    for a, b in cases:
        assert _levenshtein(a, b) == ref(a, b), (a, b)


def test_edit_distance_pairs_end_to_end(ray_session):
    import pyarrow as pa

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        edit_distance_pairs,
    )

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the quick fox", "the quick fix", "unrelated"],
                         pa.string()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 1], pa.int64()),
        "doc_b": pa.array([2, 3], pa.int64()),
    }))
    out = (edit_distance_pairs(pairs, docs).to_pandas()
           .sort_values("doc_b").reset_index(drop=True))
    assert out["edit_distance"].tolist()[0] == 1          # fox -> fix
    assert out["edit_distance"].tolist()[1] == 13
    assert list(out.columns) == ["doc_a", "doc_b", "edit_distance"]


def test_keep_best_per_duplicate_set(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        keep_best_per_duplicate_set,
    )

    # docs 0/1/2 share a word set (different order/repeats -> lengths
    # differ); 3/4 share another; 5 is a singleton (drops out)
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["a b c", "c b a a", "b a c", "x y", "y x y", "solo doc"],
        "n_chars": [5, 7, 5, 3, 5, 8],
    })
    out = keep_best_per_duplicate_set(
        ray.data.from_pandas(df, override_num_blocks=3),
        score_col="n_chars")
    assert out["kept_doc_id"].tolist() == [1, 4]   # longest; tie -> min id
    assert out["n_members"].tolist() == [3, 2]
    assert out["best_n_chars"].tolist() == [7, 5]
