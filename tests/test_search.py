import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.search import (
    bm25_scores,
    corpus_stats,
)


def _docs():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat sat on the mat",
            "cat cat dog",
            "fish swim in water",
            "",
        ]),
    })


def _brute_bm25(texts, terms, k1=1.2, b=0.75):
    tok_lists = [[w for w in t.lower().split() if w] for t in texts]
    N = len(texts)
    avgdl = sum(len(ws) for ws in tok_lists) / N
    out = {}
    for t in terms:
        df = sum(1 for ws in tok_lists if t in ws)
        idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)
        for i, ws in enumerate(tok_lists):
            tf = ws.count(t)
            if tf:
                c = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (len(ws) / avgdl)))
                out.setdefault(i, [0, 0])
                out[i][0] += 1
                out[i][1] += int(np.floor(c * 1e6 + 0.5))
    return out


def test_bm25_matches_bruteforce(ray_session):
    tbl = _docs()
    got = (bm25_scores(ray.data.from_arrow(tbl).repartition(3),
                       ["cat", "mat", "water"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _brute_bm25(tbl.column("text").to_pylist(), ["cat", "mat", "water"])
    assert got["doc_id"].tolist() == sorted(exp)
    for _, r in got.iterrows():
        n, s = exp[r["doc_id"]]
        assert r["n_matched"] == n
        assert r["score_micros"] == s


def test_corpus_stats(ray_session):
    tbl = _docs()
    N, total, df = corpus_stats(ray.data.from_arrow(tbl).repartition(2),
                                ["cat", "dog", "absent"])
    assert N == 4
    assert total == 6 + 3 + 4 + 0
    assert df.tolist() == [2, 1, 0]


def test_bm25_rejects_non_normal_terms(ray_session):
    with pytest.raises(ValueError):
        bm25_scores(ray.data.from_arrow(_docs()), ["Cat!", "ok"])


def test_bm25_partition_invariance(ray_session):
    tbl = _docs()
    outs = []
    for blocks in (1, 4):
        outs.append(bm25_scores(ray.data.from_arrow(tbl).repartition(blocks),
                                ["cat", "dog"]).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_doc_term_frequencies_and_tfidf_topk(ray_session):
    import math

    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.search import (
        doc_term_frequencies,
        tfidf_top_terms,
    )

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "apple apple banana common",
            "banana cherry common",
            "common common",
        ], pa.string()),
    }))

    tf = doc_term_frequencies(docs).to_pandas()
    got = {(r.doc_id, r.word): r.tf for r in tf.itertuples()}
    assert got[(0, "apple")] == 2 and got[(0, "banana")] == 1
    assert got[(2, "common")] == 2 and len(got) == 7

    out = tfidf_top_terms(docs, k=2).to_pandas()
    by_doc = {d: g.sort_values("tfidf", ascending=False)
              for d, g in out.groupby("doc_id")}
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert by_doc[0]["word"].tolist() == ["apple", "banana"]
    assert by_doc[0]["tfidf"].iloc[0] == pytest.approx(
        round(2 * math.log(3), 6), abs=1e-9)
    # doc 2: only "common" (df=3 -> idf 0): one row, score 0
    assert by_doc[2]["word"].tolist() == ["common"]
    assert by_doc[2]["tfidf"].iloc[0] == 0.0
    # ties rank by word ascending: doc 1 cherry (ln 3) > banana (ln 1.5) > common (0)
    assert by_doc[1]["word"].tolist() == ["cherry", "banana"]


def test_boolean_and_search_bruteforce(ray_session):
    import pandas as pd

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.search import (
        boolean_and_search,
    )

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["The cat sat; the DOG ran.", "cat only here",
                 "dog and cat and bird", "nothing relevant"],
    })
    out = (boolean_and_search(ray.data.from_pandas(df), ["cat", "dog"])
           .to_pandas())
    assert sorted(out["doc_id"].tolist()) == ["a", "c"]
