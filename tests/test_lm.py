"""Bigram-LM perplexity scoring: hand-computed model, invariances."""

import numpy as np
import pyarrow as pa

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.lm import (
    lm_perplexity,
    perplexity_scores,
    train_bigram_counts,
)


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_hand_computed_two_doc_corpus(ray_session):
    # corpus: "a b a b" and "a b" -> bigrams: ab, ba, ab | ab
    # c12: ab=3, ba=1 ; c1(prefix): a=3, b=1 ; V = 2 (words a, b)
    ds = _docs(["a b a b", "a b"])
    out = lm_perplexity(ds, k=1.0).to_pandas().sort_values("doc_id")
    p_ab = (3 + 1) / (3 + 2)          # 0.8
    p_ba = (1 + 1) / (1 + 2)          # 0.666...
    ppl0 = np.exp(-(2 * np.log(p_ab) + np.log(p_ba)) / 3)
    ppl1 = np.exp(-np.log(p_ab))
    assert out["n_bigrams"].tolist() == [3, 1]
    assert out["ppl"].tolist() == [round(ppl0, 4), round(ppl1, 4)]


def test_short_and_empty_docs_score_one(ray_session):
    out = lm_perplexity(_docs(["solo", "", "a b"])).to_pandas()
    out = out.sort_values("doc_id")
    assert out["n_bigrams"].tolist() == [0, 0, 1]
    assert out["ppl"].tolist()[:2] == [1.0, 1.0]


def test_partition_invariance(ray_session):
    texts = [" ".join("w%d" % ((i * j) % 7) for j in range(20))
             for i in range(60)]
    a = lm_perplexity(_docs(texts).repartition(1)).to_pandas()
    b = lm_perplexity(_docs(texts).repartition(16)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_cross_corpus_scoring(ray_session):
    # train on a clean corpus, score a different one (the CCNet shape):
    # unseen bigrams get only smoothing mass -> higher perplexity
    model = train_bigram_counts(_docs(["the cat sat on the mat"] * 5))
    out = perplexity_scores(
        _docs(["the cat sat", "zx qv bn"]), model).to_pandas()
    out = out.sort_values("doc_id")
    assert out["ppl"].iloc[1] > out["ppl"].iloc[0]
