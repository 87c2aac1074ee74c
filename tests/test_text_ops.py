import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.text import (
    Tokenizer,
    doc_fingerprints,
    lang_id,
    quality_stats,
    token_counts,
    tokenize_documents,
)


def _docs():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "Hello, World! This is the first test document.",
            "the and of to a in is that it for",
            "der die das und ist nicht ein zu mit ich",
            "这是一个中文文档 的 测试",
        ]),
        "source": pa.array(["s0", "s0", "s1", "s1"]),
    })


def test_tokenizer_contract():
    tok = Tokenizer()
    out = tok(_docs())
    assert [f.name for f in out.schema] == ["doc_id", "tokens", "n_tok", "source"]
    # "Hello, World! This is the first test document." -> 8 words
    assert out.column("n_tok").to_pylist()[0] == 8
    toks = out.column("tokens").to_pylist()
    assert len(toks[0]) == 8
    assert all(0 <= t < 2**31 for t in toks[0])
    # same word -> same id across docs: "the" in doc0 & doc1
    t0 = tok(_docs())
    assert t0.column("tokens").to_pylist()[0] == toks[0]  # deterministic


@pytest.mark.usefixtures("ray_session")
def test_tokenize_documents_pipeline_and_actor_pool():
    ds = ray.data.from_arrow(_docs())
    out = tokenize_documents(ds).to_pandas()
    assert len(out) == 4
    out2 = tokenize_documents(ray.data.from_arrow(_docs()), concurrency=2).to_pandas()
    assert sorted(out.n_tok) == sorted(out2.n_tok)


@pytest.mark.usefixtures("ray_session")
def test_quality_stats():
    ds = ray.data.from_arrow(_docs())
    df = quality_stats(ds).to_pandas().set_index("doc_id")
    assert df.loc[0, "n_words"] == 8
    assert df.loc[0, "n_punct"] == 3  # comma, bang, period... "Hello, World! ... document."
    assert df.loc[0, "n_upper"] == 3  # H W T
    assert df.loc[1, "n_punct"] == 0


@pytest.mark.usefixtures("ray_session")
def test_lang_id_heuristic():
    ds = ray.data.from_arrow(_docs())
    df = lang_id(ds).to_pandas().set_index("doc_id")
    assert df.loc[1, "lang_pred"] == "en"
    assert df.loc[2, "lang_pred"] == "de"
    assert df.loc[3, "lang_pred"] == "zh"


@pytest.mark.usefixtures("ray_session")
def test_token_counts_and_fingerprints():
    ds = ray.data.from_arrow(_docs())
    tc = token_counts(ds).to_pandas().set_index("doc_id")
    assert tc.loc[0, "n_tok"] == 8
    fp = doc_fingerprints(ds).to_pandas()
    assert set(fp.doc_id) == {0, 1, 2, 3}
    # identical docs share fingerprints; distinct docs mostly don't
    fp0 = set(fp[fp.doc_id == 0].fingerprint)
    fp1 = set(fp[fp.doc_id == 1].fingerprint)
    assert len(fp0) > 0
    assert len(fp0 & fp1) < max(len(fp0), len(fp1))
