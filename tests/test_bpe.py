"""BPE trainer/encoder: equality vs an independent reference, determinism,
partition invariance of the corpus reduction."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.bpe import (
    bpe_encode_stats,
    encode_word,
    train_bpe,
    word_count_table,
)


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


# -- independent reference: straight transcription of Sennrich et al. 2016
# Algorithm 1, dict-of-strings form, written without looking at the engine --

def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    vocab = {" ".join(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple, int] = {}
        for w, n in vocab.items():
            syms = w.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs or max(pairs.values()) < 2:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        new = "".join(best)
        out = {}
        for w, n in vocab.items():
            toks = w.split(" ")
            res, i = [], 0
            while i < len(toks):
                if (i + 1 < len(toks) and toks[i] == best[0]
                        and toks[i + 1] == best[1]):
                    res.append(new)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            out[" ".join(res)] = n
        vocab = out
    return merges


def test_train_bpe_matches_reference():
    wc = {"lower": 5, "low": 7, "newest": 6, "widest": 3, "new": 2}
    df = pd.DataFrame({"word": list(wc), "n": list(wc.values())})
    got = train_bpe(df, num_merges=10)
    want = _ref_bpe(wc, 10)
    assert got == want
    assert len(got) >= 4  # the classic corpus yields several merges
    # first merge on this corpus: 'es' appears in newest+widest = 9,
    # beaten by ('w','e')? reference decides — just pin determinism:
    assert train_bpe(df, num_merges=10) == got


def test_train_bpe_stops_when_no_pair_repeats():
    df = pd.DataFrame({"word": ["ab", "cd"], "n": [1, 1]})
    assert train_bpe(df, num_merges=5) == []


def test_encode_word_replays_merges():
    wc = {"banana": 4, "bandana": 3, "ban": 5}
    df = pd.DataFrame({"word": list(wc), "n": list(wc.values())})
    merges = train_bpe(df, num_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wc:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w           # lossless
        assert 1 <= len(toks) <= len(w)     # never longer than chars
    # a word that trains to a single token encodes to itself
    full = encode_word("ban", ranks)
    assert "".join(full) == "ban"


def test_word_count_table_partition_invariance(ray_session):
    texts = [f"alpha beta beta gamma{i % 3} alpha" for i in range(30)]
    a = word_count_table(_docs(texts), max_vocab=10)
    b = word_count_table(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(texts, pa.string())})).repartition(7),
        max_vocab=10)
    pd.testing.assert_frame_equal(a, b)
    assert a.iloc[0]["word"] == "alpha" and a.iloc[0]["n"] == 60
    # cap respected
    assert len(word_count_table(_docs(texts), max_vocab=2)) == 2


def test_bpe_encode_stats_counts(ray_session):
    corpus = _docs(["low lower lowest", "new newest", ""])
    wc = word_count_table(corpus, max_vocab=100)
    merges = train_bpe(wc, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe_encode_stats(corpus, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [3, 2, 0]

    def expect_tokens(text):
        return sum(len(encode_word(w, ranks)) for w in text.split())

    assert out["n_tokens"].tolist() == [
        expect_tokens("low lower lowest"), expect_tokens("new newest"), 0]
    assert out.loc[2, "compression"] == 0.0  # empty doc: no divide-by-zero
    nc = len("lowlowerlowest")
    assert np.isclose(out.loc[0, "compression"],
                      round(nc / out.loc[0, "n_tokens"], 6))


def test_word_count_table_empty_corpus(ray_session):
    empty = _docs(["", "   ", ""])
    wc = word_count_table(empty, max_vocab=5)
    assert list(wc.columns) == ["word", "n"] and wc.empty
    assert train_bpe(wc, num_merges=3) == []
