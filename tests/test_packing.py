"""Sequence packing: offsets, boundary straddles, empty docs."""

import numpy as np
import pyarrow as pa

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.packing import (
    pack_sequences,
)


def _ds(rows, reparts=1):
    ids, keys, lens = zip(*rows)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "source": pa.array(keys, pa.string()),
                  "n_tok": pa.array(lens, pa.int64())})
    return ray.data.from_arrow(t).repartition(reparts)


def test_pack_offsets_and_straddles(ray_session):
    # stream a: lengths 100, 200, 50, 300 with seq_len 256
    out = pack_sequences(_ds([(0, "a", 100), (1, "a", 200), (2, "a", 50),
                              (3, "a", 300)]), seq_len=256).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["start_off"].tolist() == [0, 100, 300, 350]
    assert out["end_off"].tolist() == [100, 300, 350, 650]
    assert out["first_pack"].tolist() == [0, 0, 1, 1]
    # doc 1 straddles packs 0-1; doc 3 straddles 1-2
    assert out["last_pack"].tolist() == [0, 1, 1, 2]


def test_pack_empty_doc_and_exact_boundary(ray_session):
    out = pack_sequences(_ds([(0, "a", 256), (1, "a", 0), (2, "a", 1)]),
                         seq_len=256).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # doc 0 fills pack 0 exactly; empty doc 1 sits AT offset 256 (pack 1)
    assert out["last_pack"].tolist() == [0, 1, 1]
    assert out["first_pack"].tolist() == [0, 1, 1]


def test_two_level_scan_equals_single_level(ray_session):
    rows = [(i, "k%d" % (i % 2), (i * 53) % 300) for i in range(300)]
    a = pack_sequences(_ds(rows, 8), seq_len=512).to_pandas()
    b = pack_sequences(_ds(rows, 8), seq_len=512,
                       bucket_size=37).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_keys_independent_and_partition_invariant(ray_session):
    rows = [(i, "k%d" % (i % 3), (i * 37) % 400) for i in range(200)]
    a = pack_sequences(_ds(rows, 1), seq_len=128).to_pandas()
    b = pack_sequences(_ds(rows, 16), seq_len=128).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # per-key offsets restart at zero
    for k, g in a.groupby("source"):
        g = g.sort_values("doc_id")
        assert g["start_off"].iloc[0] == 0
        assert (g["end_off"].to_numpy()[:-1] ==
                g["start_off"].to_numpy()[1:]).all()
