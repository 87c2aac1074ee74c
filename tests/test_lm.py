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

def test_capped_model_bounds_driver_memory(ray_session):
    # corpus vocabulary (60 distinct words) far exceeds the cap V=5: the
    # model arrays must be functions of V, not of the corpus vocab
    texts = ["common words here " + " ".join("rare%d" % (i * 3 + j)
                                             for j in range(3))
             for i in range(20)]
    ds = _docs(texts)
    (pk, _), (fk, _), vocab, keep = train_bigram_counts(ds, max_vocab=5)
    assert keep is not None and len(keep) == 5
    assert vocab <= 6                      # top-5 words + <unk>
    assert len(fk) <= 6                    # prefixes live in capped space
    assert len(pk) <= 36                   # <= (V+1)^2, far below corpus grams
    # uncapped model on the same corpus sees the full vocabulary
    (_, _), (_, _), vocab_full, keep_full = train_bigram_counts(ds)
    assert keep_full is None and vocab_full > 6


def test_capped_scoring_matches_manual_unk_fold(ray_session):
    # cap to the 2 most frequent words ("a", "b"); every other word becomes
    # the SAME <unk> token on both the train and score sides, so scoring a
    # doc of two distinct rare words equals scoring "<unk> <unk>"
    ds = _docs(["a b a b a b", "a b zz", "a b qq"])
    model = train_bigram_counts(ds, max_vocab=2)
    out = perplexity_scores(_docs(["zz qq", "qq zz", "a b"]),
                            model).to_pandas().sort_values("doc_id")
    # both rare-rare docs reduce to the (<unk>, <unk>) bigram -> equal ppl
    assert out["ppl"].iloc[0] == out["ppl"].iloc[1]
    # the in-vocabulary bigram (a, b) was observed often -> lower perplexity
    assert out["ppl"].iloc[2] < out["ppl"].iloc[0]


def test_capped_equals_uncapped_when_cap_covers_vocab(ray_session):
    texts = ["a b c a b", "c a b b"]
    full = lm_perplexity(_docs(texts)).to_pandas().sort_values("doc_id")
    capped = lm_perplexity(_docs(texts), max_vocab=10).to_pandas()
    capped = capped.sort_values("doc_id")
    assert full["ppl"].tolist() == capped["ppl"].tolist()
