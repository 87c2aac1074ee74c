"""hash_shuffle(): narrow-groupby results match the sort-shuffle plan and
the DataContext is restored afterwards (docs/SCALE_MEM_r05.json finding)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from cardinality_estimation_evaluation_framework_ray.functions.shuffleopt import (
    hash_shuffle,
)


def _counts(ds) -> dict[int, int]:
    t = pa.concat_tables(
        b for b in ds.groupby("k").count().iter_batches(batch_format="pyarrow")
    )
    return dict(
        zip(t.column("k").to_pylist(), t.column("count()").to_pylist())
    )


def test_hash_shuffle_matches_sort_and_restores_context(ray_session):
    from ray.data.context import DataContext, ShuffleStrategy

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 500, size=40_000, dtype=np.int64)
    ctx = DataContext.get_current()
    before = ctx.shuffle_strategy

    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    sort_counts = _counts(ds)

    with hash_shuffle(num_partitions=16) as c:
        assert c.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
        assert c.default_hash_shuffle_parallelism == 16
        hashed = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
        hash_counts = _counts(hashed)

    assert ctx.shuffle_strategy == before
    assert hash_counts == sort_counts
    assert sum(hash_counts.values()) == 40_000


def _docs_table() -> pa.Table:
    texts = [f"doc body {i % 37}" for i in range(500)]
    return pa.table({"doc_id": pa.array(range(500), pa.int64()),
                     "text": pa.array(texts)})


def test_dedup_exact_texts_hash_shuffle_matches_sort(ray_session):
    """stage-level shuffle='hash' (use_hash_shuffle on a created dataset)
    produces identical dedup output to the default sort plan."""
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_exact_texts,
    )

    def rows(ds):
        t = pa.concat_tables(
            b for b in ds.iter_batches(batch_format="pyarrow"))
        return sorted(zip(t.column("kept_doc_id").to_pylist(),
                          t.column("n_copies").to_pylist()))

    a = rows(dedup_exact_texts(
        ray.data.from_arrow(_docs_table()).repartition(6)))
    b = rows(dedup_exact_texts(
        ray.data.from_arrow(_docs_table()).repartition(6), shuffle="hash"))
    assert a == b
    assert len(a) == 37 and sum(n for _, n in a) == 500


def test_exact_distinct_tokens_hash_shuffle_matches_sort(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        exact_distinct_tokens,
    )

    rng = np.random.default_rng(3)
    t = pa.table({
        "source": pa.array([f"s{i % 4}" for i in range(300)]),
        "tokens": pa.array([rng.integers(0, 50, size=8).tolist()
                            for _ in range(300)], pa.list_(pa.int64())),
    })

    def rows(ds):
        tb = pa.concat_tables(
            b for b in ds.iter_batches(batch_format="pyarrow"))
        return sorted(zip(tb.column("source").to_pylist(),
                          tb.column("token").to_pylist()))

    a = rows(exact_distinct_tokens(
        ray.data.from_arrow(t).repartition(5)))
    b = rows(exact_distinct_tokens(
        ray.data.from_arrow(t).repartition(5), shuffle="hash"))
    assert a == b and len(a) == len(set(a)) and len(a) > 0


def test_dedup_shuffle_arg_validated(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_exact_texts,
        exact_distinct_tokens,
    )

    ds = ray.data.from_arrow(_docs_table())
    with pytest.raises(ValueError, match="shuffle must be"):
        dedup_exact_texts(ds, shuffle="spilled")
    with pytest.raises(ValueError, match="shuffle must be"):
        exact_distinct_tokens(ds, shuffle="nope")
    # coalesce needs a size hint to pick its block count — loud contract
    with pytest.raises(ValueError, match="narrow_bytes_hint"):
        dedup_exact_texts(ds, shuffle="coalesce")


def test_narrow_shuffle_blocks_sizing():
    from cardinality_estimation_evaluation_framework_ray.functions.shuffleopt import (
        narrow_shuffle_blocks,
    )

    # floors at min_blocks for small tables, sqrt in the middle, capped
    assert narrow_shuffle_blocks(0, parallelism_floor=8) == 8
    assert narrow_shuffle_blocks(10 << 20, parallelism_floor=8) == 8
    # 1 MB-cell sqrt already exceeds 32 CPUs -> sqrt wins
    assert narrow_shuffle_blocks(2 << 30, parallelism_floor=32) == 45
    # small table on 32 CPUs: parallelism floor wins, cells stay ~200 KB
    assert narrow_shuffle_blocks(200 << 20, parallelism_floor=32) == 32
    # 16 TB narrow table (10^12 rows x 16 B): ~3.9k blocks, MB cells
    assert narrow_shuffle_blocks(16 * 10**12, parallelism_floor=64) == 3906
    assert narrow_shuffle_blocks(10**15, parallelism_floor=64) == 4096
    # every cell clears the inline threshold with margin
    for total in (200 << 20, 2 << 30, 64 << 30):
        n = narrow_shuffle_blocks(total, parallelism_floor=32)
        assert total / (n * n) >= 125_000 or n == 8


def test_dedup_exact_texts_coalesce_matches_sort(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_exact_texts,
    )

    def rows(ds):
        t = pa.concat_tables(
            b for b in ds.iter_batches(batch_format="pyarrow"))
        return sorted(zip(t.column("kept_doc_id").to_pylist(),
                          t.column("n_copies").to_pylist()))

    a = rows(dedup_exact_texts(
        ray.data.from_arrow(_docs_table()).repartition(6)))
    b = rows(dedup_exact_texts(
        ray.data.from_arrow(_docs_table()).repartition(6),
        shuffle="coalesce", narrow_bytes_hint=500 * 16))
    assert a == b
    assert len(a) == 37 and sum(n for _, n in a) == 500


def test_exact_distinct_tokens_coalesce_matches_sort(ray_session):
    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        exact_distinct_tokens,
    )

    rng = np.random.default_rng(3)
    t = pa.table({
        "source": pa.array([f"s{i % 4}" for i in range(300)]),
        "tokens": pa.array([rng.integers(0, 50, size=8).tolist()
                            for _ in range(300)], pa.list_(pa.int64())),
    })

    def rows(ds):
        tb = pa.concat_tables(
            b for b in ds.iter_batches(batch_format="pyarrow"))
        return sorted(zip(tb.column("source").to_pylist(),
                          tb.column("token").to_pylist()))

    a = rows(exact_distinct_tokens(
        ray.data.from_arrow(t).repartition(5)))
    b = rows(exact_distinct_tokens(
        ray.data.from_arrow(t).repartition(5),
        shuffle="coalesce", narrow_bytes_hint=300 * 8 * 24))
    assert a == b and len(a) == len(set(a)) and len(a) > 0


def test_hash_shuffle_restores_on_error(ray_session):
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    before = (ctx.shuffle_strategy, ctx.default_hash_shuffle_parallelism)
    with pytest.raises(RuntimeError):
        with hash_shuffle(num_partitions=4):
            raise RuntimeError("boom")
    assert (ctx.shuffle_strategy, ctx.default_hash_shuffle_parallelism) == before
