"""Corpus-filter stages: decontamination, repetition stats, PII scrub."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.filters import (
    benchmark_gram_hashes,
    decontaminate,
    repetition_stats,
    scrub_pii,
)


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


WORDS8 = "alpha bravo charlie delta echo foxtrot golf hotel"


def test_decontaminate_flags_shared_ngram(ray_session):
    bench = _docs([f"{WORDS8} india juliett"], ids=[100])
    corpus = _docs([
        f"prefix words then {WORDS8} and a tail",   # contains a bench 8-gram
        "completely different words with no overlap at all here ok",
        WORDS8,                                      # exactly one bench gram
    ])
    out = decontaminate(corpus, bench, n=8).to_pandas().sort_values("doc_id")
    assert out["contaminated"].tolist() == [True, False, True]
    # doc 0 has 14 words -> 7 grams, exactly one of which is the bench gram
    assert out["n_grams"].tolist() == [7, 3, 1]
    assert out["n_contaminated"].tolist() == [1, 0, 1]


def test_decontaminate_short_and_empty_docs(ray_session):
    # whole-doc fold: a <n-word doc matches only an identical short bench doc
    bench = _docs(["tiny doc"], ids=[0])
    corpus = _docs(["tiny doc", "tiny doc extra", "", "tiny"])
    out = decontaminate(corpus, bench, n=8).to_pandas().sort_values("doc_id")
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out["n_grams"].tolist() == [1, 1, 1, 1]


def test_decontaminate_empty_benchmark(ray_session):
    bench = _docs([]).filter(expr="doc_id < 0")
    corpus = _docs(["some words here"])
    out = decontaminate(corpus, bench, n=2).to_pandas()
    assert not out["contaminated"].any()


def test_benchmark_gram_hashes_dedup(ray_session):
    # identical docs contribute each gram once
    bench = _docs([WORDS8, WORDS8], ids=[0, 1])
    g = benchmark_gram_hashes(bench, n=8)
    assert len(g) == 1


def test_repetition_stats_exact(ray_session):
    out = repetition_stats(_docs([
        "a b a b a",       # bigrams: ab ba ab ba -> 4 total, 2 distinct
        "x y z",           # xy yz -> 2/2
        "solo",            # short fold -> 1/1
        "",                # empty fold -> 1/1
    ]), n=2).to_pandas().sort_values("doc_id")
    assert out["n_grams"].tolist() == [4, 2, 1, 1]
    assert out["n_distinct"].tolist() == [2, 2, 1, 1]
    assert out["dup_frac"].tolist() == pytest.approx([0.5, 0.0, 0.0, 0.0])


def test_repetition_partition_invariance(ray_session):
    texts = [f"w{i % 3} w{(i + 1) % 3} w{i % 3} filler{i}" for i in range(40)]
    a = repetition_stats(_docs(texts).repartition(1), n=2).to_pandas()
    b = repetition_stats(_docs(texts).repartition(16), n=2).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_scrub_pii_redacts_and_counts(ray_session):
    out = scrub_pii(_docs([
        "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567 now",
        "no pii here",
        "two mails a@b.io c@d.org",
    ])).to_pandas().sort_values("doc_id")
    assert out["n_email"].tolist() == [1, 0, 2]
    assert out["n_phone"].tolist() == [1, 0, 0]
    t0 = out["text"].iloc[0]
    assert "<EMAIL>" in t0 and "<PHONE>" in t0
    assert "jane" not in t0 and "555" not in t0
    assert out["text"].iloc[1] == "no pii here"


# ---------------------------------------------------------------------------
# quantile_threshold_filter / build_top_vocab / oov_rate
# ---------------------------------------------------------------------------

def _scored(values):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(values)), pa.int64()),
        "score": pa.array(values, pa.float64()),
    }))


def test_quantile_threshold_filter_exact_top(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        quantile_threshold_filter,
    )

    # scores 1..10: percentile_disc(0.7) = value at rank ceil(7) = 7
    ds = _scored([float(v) for v in range(1, 11)])
    kept = quantile_threshold_filter(ds, "score", 0.7).to_pandas()
    assert sorted(kept["score"]) == [7.0, 8.0, 9.0, 10.0]

    bottom = quantile_threshold_filter(ds, "score", 0.3, keep="bottom").to_pandas()
    assert sorted(bottom["score"]) == [1.0, 2.0, 3.0]


def test_quantile_threshold_filter_null_and_partition_invariance(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        quantile_threshold_filter,
    )

    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "score": pa.array([1.0, None, 3.0, 4.0, None, 6.0], pa.float64()),
    })
    # nulls carry no quality signal -> dropped, like SQL comparison-with-NULL
    for blocks in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        kept = quantile_threshold_filter(ds, "score", 0.5).to_pandas()
        assert sorted(kept["score"]) == [3.0, 4.0, 6.0]


def test_quantile_threshold_filter_kll_close_to_exact(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        quantile_threshold_filter,
    )

    rng = np.random.RandomState(7)
    vals = rng.normal(size=4000)
    ds = _scored(vals.tolist()).repartition(8)
    kept = quantile_threshold_filter(ds, "score", 0.9, mode="kll").to_pandas()
    # KLL(k=200) rank error is well under 2% at n=4000
    assert abs(len(kept) - 400) < 0.02 * 4000

    with pytest.raises(ValueError):
        quantile_threshold_filter(ds, "score", 0.5, keep="middle")


def test_build_top_vocab_and_oov_rate(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        build_top_vocab,
        oov_rate,
    )

    docs = _docs([
        "the cat sat on the mat",
        "the dog sat",
        "zzz qqq",       # fully OOV under a top-3 vocab
        "",              # zero words -> dropped from output
    ])
    vocab = build_top_vocab(docs, top_k=3)
    # counts: the=3, sat=2, cat/dog/mat/on/qqq/zzz=1 -> top-3 ties by word
    assert vocab.tolist() == ["cat", "sat", "the"]

    out = oov_rate(docs, vocab).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1, 2]
    # doc 0 = "the cat sat on the mat": OOV = {on, mat} -> 2 of 6 words
    assert out.loc[0, "n_words"] == 6 and abs(out.loc[0, "oov_rate"] - 2 / 6) < 2e-6
    assert abs(out.loc[1, "oov_rate"] - 1 / 3) < 2e-6  # rates round to 6dp
    assert out.loc[2, "oov_rate"] == 1.0

    # empty vocab: everything is OOV
    all_oov = oov_rate(docs, np.array([], dtype=object)).to_pandas()
    assert (all_oov["oov_rate"] == 1.0).all()


def test_source_overlap_matrix(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        source_overlap_matrix,
    )

    def tagged(texts_sources):
        texts, sources = zip(*texts_sources)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(list(texts), pa.string()),
            "source": pa.array(list(sources), pa.string()),
        }))

    g1 = "one two three"           # < n words -> one folded gram
    g2 = "four five six"
    docs = tagged([
        (g1, "a"), (g2, "a"),
        (g1, "b"),                 # shares g1 with a
        (g1, "c"), (g2, "c"),      # shares g1+g2 with a, g1 with b
        (g1, "c"),                 # repeat within source: not double-counted
    ]).repartition(3)
    out = source_overlap_matrix(docs, n=8)
    got = {(r.source_a, r.source_b): r.shared_grams
           for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("b", "c"): 1}

    # disjoint sources -> empty matrix
    none = source_overlap_matrix(
        tagged([("aa bb", "x"), ("cc dd", "y")]), n=8)
    assert len(none) == 0


def test_cross_doc_dup_stats_matches_brute_force(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        cross_doc_dup_stats,
    )

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c d e",          # shares "a b c" with doc 2
            "a b c x y",          # shares with 1
            "q r s t u",          # fully unique
            "q r s t u",          # exact dup of 3 -> all grams dup
            "zz",                 # short doc: one gram "zz", unique
        ],
    })
    ds = ray.data.from_pandas(docs, override_num_blocks=3)
    out = (cross_doc_dup_stats(ds, n=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # brute force in python
    def grams(t):
        w = [x for x in t.split() if x]
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    gsets = {r.doc_id: grams(r.text) for r in docs.itertuples()}
    for _, row in out.iterrows():
        mine = gsets[row["doc_id"]]
        others = set().union(*(g for d, g in gsets.items()
                               if d != row["doc_id"]))
        n_dup = len(mine & others)
        assert row["n_distinct_grams"] == len(mine)
        assert row["n_dup_grams"] == n_dup
        assert row["dup_frac_micros"] == int(
            n_dup * 1_000_000 / len(mine) + 0.5)


def test_cross_doc_dup_stats_partition_invariance(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        cross_doc_dup_stats,
    )

    rng = np.random.RandomState(17)
    vocab = np.array(["w%d" % i for i in range(40)])
    texts = [" ".join(rng.choice(vocab, size=rng.randint(2, 30)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                       "text": texts})
    outs = []
    for nb in (1, 23):
        ds = ray.data.from_pandas(df, override_num_blocks=nb)
        outs.append(cross_doc_dup_stats(ds, n=2).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bloom_membership_no_false_negatives_and_bounded_fpr(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        build_bloom_membership,
        filter_by_bloom,
    )

    rng = np.random.RandomState(41)
    members = np.unique(rng.randint(0, 10**9, size=3000)).astype(np.int64)
    non_members = np.setdiff1d(
        np.unique(rng.randint(10**9, 2 * 10**9, size=3000)), members)
    keys_ds = ray.data.from_pandas(
        pd.DataFrame({"k": members}), override_num_blocks=5)
    bloom = build_bloom_membership(keys_ds, key_col="k",
                                   length=len(members) * 10, num_hashes=4)

    probe = pd.DataFrame({"k": np.concatenate([members, non_members])})
    kept = filter_by_bloom(
        ray.data.from_pandas(probe, override_num_blocks=7), bloom,
        key_col="k", how="semi").to_pandas()
    kept_set = set(kept["k"])
    # no false negatives: every true member survives
    assert set(members) <= kept_set
    # FPR bound: (1 - e^{-kn/m})^k ~ 1.2% at m=10n, k=4; allow 3x slack
    fpr = (len(kept_set) - len(members)) / len(non_members)
    assert fpr < 0.04, fpr

    # anti is the exact complement of semi on the same probe
    dropped = filter_by_bloom(
        ray.data.from_pandas(probe, override_num_blocks=7), bloom,
        key_col="k", how="anti").to_pandas()
    assert kept_set.isdisjoint(set(dropped["k"]))
    assert len(kept) + len(dropped) == len(probe)


def test_fuzzy_decontaminate_exact_jaccard(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        fuzzy_decontaminate,
    )

    # word (n=1) sets: A={a,b,c,d}, bench B1={a,b,c,e} -> J = 3/5 = 0.6;
    # B2={x,y,z} disjoint from A; doc2={x,y} vs B2 -> J = 2/3
    bench = _docs(["a b c e", "x y z"], ids=[10, 11])
    corpus = _docs(["a b c d", "x y", "q r s t u"], ids=[0, 1, 2])
    out = fuzzy_decontaminate(corpus, bench, n=1, threshold=0.5) \
        .to_pandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["bench_id"].tolist() == [10, 11]
    assert out["n_common"].tolist() == [3, 2]
    assert np.allclose(out["jaccard"], [0.6, round(2 / 3, 6)])
    # recall bound: threshold above both -> empty, never a missed pair
    none = fuzzy_decontaminate(corpus, bench, n=1, threshold=0.7).to_pandas()
    assert none.empty


def test_fuzzy_decontaminate_set_semantics_and_empty_bench(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        fuzzy_decontaminate,
    )

    # repeated words collapse to SETS on both sides: {a,b} vs {a,b} -> J=1
    bench = _docs(["a a b b a"], ids=[5])
    corpus = _docs(["b a b a"], ids=[0])
    out = fuzzy_decontaminate(corpus, bench, n=1, threshold=0.99).to_pandas()
    assert out["n_common"].tolist() == [2]
    assert out["jaccard"].tolist() == [1.0]
    # empty benchmark -> empty result; Dataset schema keeps the contract
    # columns (to_pandas() on an all-empty Dataset drops columns, a Ray
    # quirk, so assert on the Dataset schema)
    empty = fuzzy_decontaminate(corpus, _docs([], ids=[]), n=1,
                                threshold=0.1)
    assert empty.schema().names == ["doc_id", "bench_id", "n_common",
                                    "jaccard"]
    assert empty.count() == 0


def test_fuzzy_decontaminate_postings_guard_and_partition_invariance(
        ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        fuzzy_decontaminate,
    )

    bench = _docs(["a b c d e f", "c d e f g h"], ids=[7, 8])
    corpus_texts = [f"w{i} c d e f extra{i % 3}" for i in range(40)]
    with pytest.raises(ValueError, match="max_bench_postings"):
        fuzzy_decontaminate(_docs(corpus_texts), bench, n=1,
                            max_bench_postings=3)
    one = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(corpus_texts, pa.string())}))
    a = fuzzy_decontaminate(one, bench, n=1, threshold=0.3) \
        .to_pandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    many = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(corpus_texts, pa.string())})) \
        .repartition(8)
    b = fuzzy_decontaminate(many, bench, n=1, threshold=0.3) \
        .to_pandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0


def test_fuzzy_decontaminate_chunked_expansion_invariance(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        fuzzy_decontaminate,
    )

    bench = _docs(["a b c d e", "c d e f g", "x y z w v"], ids=[10, 11, 12])
    corpus = _docs([f"a b c d extra{i % 4} x y" for i in range(30)])
    big = fuzzy_decontaminate(corpus, bench, n=1, threshold=0.2) \
        .to_pandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    tiny = fuzzy_decontaminate(corpus, bench, n=1, threshold=0.2,
                               expand_chunk=3) \
        .to_pandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
    assert len(big) > 0
    assert big.equals(tiny)  # a 3-row chunk forces many slices; same output


def test_cuckoo_membership_build_delete_probe(ray_session):
    """Distributed cuckoo build + driver-fold delete stream + broadcast
    probe: survivors = inserted-minus-deleted keys exactly (no false
    negatives), plus <= FPR-bounded extras."""
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        build_cuckoo_membership,
        filter_by_cuckoo,
    )

    rng = np.random.RandomState(43)
    members = np.unique(rng.randint(0, 10**9, size=4000)).astype(np.int64)
    revoked = members[::4]
    alive = np.setdiff1d(members, revoked)
    non_members = np.setdiff1d(
        np.unique(rng.randint(10**9, 2 * 10**9, size=4000)), members)
    keys_ds = ray.data.from_pandas(
        pd.DataFrame({"k": members}), override_num_blocks=5)
    del_ds = ray.data.from_pandas(
        pd.DataFrame({"k": revoked}), override_num_blocks=3)
    cf = build_cuckoo_membership(keys_ds, key_col="k", delete_ds=del_ds)
    assert cf.n == len(alive)

    probe = pd.DataFrame({"k": np.concatenate([alive, non_members])})
    kept = filter_by_cuckoo(
        ray.data.from_pandas(probe, override_num_blocks=7), cf,
        key_col="k", how="semi").to_pandas()
    kept_set = set(kept["k"])
    assert set(alive) <= kept_set            # no false negatives
    fpr = (len(kept_set) - len(alive)) / len(non_members)
    assert fpr <= 3.0 * cf.spec.fpr_bound(cf.load_factor) + 1e-9

    dropped = filter_by_cuckoo(
        ray.data.from_pandas(probe, override_num_blocks=7), cf,
        key_col="k", how="anti").to_pandas()
    assert kept_set.isdisjoint(set(dropped["k"]))
    assert len(kept) + len(dropped) == len(probe)
