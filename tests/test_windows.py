import numpy as np
import pandas as pd
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.windows import (
    windowed_agg,
)


def _events():
    rng = np.random.default_rng(11)
    n = 400
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, 8, n),
        "t": rng.integers(0, 5000, n).astype(np.int64),
        "v": rng.integers(1, 100, n).astype(np.int64),
    })


def _brute(df, window):
    rows = []
    for _, r in df.iterrows():
        m = (df["u"] == r["u"]) & (df["t"] >= r["t"] - window) & (df["t"] <= r["t"])
        rows.append((r["eid"], r["u"], int(m.sum()), int(df.loc[m, "v"].sum())))
    return (pd.DataFrame(rows, columns=["eid", "u", "n_window", "sum_window"])
            .sort_values("eid").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_windowed_agg_matches_bruteforce():
    df = _events()
    got = windowed_agg(ray.data.from_pandas(df).repartition(6),
                       key_col="u", ts_col="t", id_col="eid",
                       value_col="v", window=300).to_pandas()
    got = got.sort_values("eid").reset_index(drop=True)
    exp = _brute(df, 300)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_windowed_agg_includes_ts_peers():
    # RANGE frame semantics: same-key rows at the SAME timestamp count each
    # other (and themselves)
    df = pd.DataFrame({"eid": [0, 1, 2], "u": [5, 5, 5],
                       "t": [100, 100, 400], "v": [1, 2, 4]})
    got = windowed_agg(ray.data.from_pandas(df), key_col="u", ts_col="t",
                       id_col="eid", value_col="v", window=10).to_pandas()
    got = got.sort_values("eid")
    assert got["n_window"].tolist() == [2, 2, 1]
    assert got["sum_window"].tolist() == [3, 3, 4]


@pytest.mark.usefixtures("ray_session")
def test_windowed_agg_bucketed_identical():
    """The two-level (hot-key) plan is output-identical, including one
    dominant key spanning many blocks and bucket-boundary-straddling
    windows."""
    df = _events()
    df.loc[df.index[:200], "u"] = 0  # hot key
    ds = ray.data.from_pandas(df).repartition(8)
    plain = windowed_agg(ds, key_col="u", ts_col="t", id_col="eid",
                         value_col="v", window=300).to_pandas()
    bucketed = windowed_agg(ds, key_col="u", ts_col="t", id_col="eid",
                            value_col="v", window=300,
                            bucket_span=300).to_pandas()
    key = ["eid"]
    plain = plain.sort_values(key).reset_index(drop=True)
    bucketed = bucketed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain.astype("int64"),
                                  bucketed.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_windowed_agg_timestamp_column():
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "eid": [0, 1, 2, 3],
        "u": [1, 1, 1, 2],
        "t": [base, base + pd.Timedelta(minutes=30),
              base + pd.Timedelta(minutes=90), base],
        "v": [1, 2, 4, 8],
    })
    got = windowed_agg(ray.data.from_pandas(df), key_col="u", ts_col="t",
                       id_col="eid", value_col="v",
                       window="1h").to_pandas().sort_values("eid")
    assert got["n_window"].tolist() == [1, 2, 2, 1]
    assert got["sum_window"].tolist() == [1, 3, 6, 8]


@pytest.mark.usefixtures("ray_session")
def test_windowed_agg_bucket_span_validation():
    df = _events()
    with pytest.raises(ValueError):
        windowed_agg(ray.data.from_pandas(df), key_col="u", ts_col="t",
                     id_col="eid", window=300, bucket_span=100).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_windowed_agg_float_ts():
    # fractional timestamps must NOT truncate: 10.7 and 10.2 are distinct
    df = pd.DataFrame({"eid": [0, 1, 2], "u": [1, 1, 1],
                       "t": [10.2, 10.7, 11.9], "v": [1, 2, 4]})
    got = windowed_agg(ray.data.from_pandas(df), key_col="u", ts_col="t",
                       id_col="eid", value_col="v",
                       window=0.6).to_pandas().sort_values("eid")
    # eid0: [9.6,10.2] -> itself; eid1: [10.1,10.7] -> 10.2+10.7;
    # eid2: [11.3,11.9] -> itself
    assert got["n_window"].tolist() == [1, 2, 1]
    assert got["sum_window"].tolist() == [1, 3, 4]
    # bucketed plan agrees in float space too
    got2 = windowed_agg(ray.data.from_pandas(df), key_col="u", ts_col="t",
                        id_col="eid", value_col="v", window=0.6,
                        bucket_span=1.0).to_pandas().sort_values("eid")
    assert got2["n_window"].tolist() == got["n_window"].tolist()


def test_sliding_window_distinct_matches_brute_force(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        sliding_window_distinct,
    )
    from cardinality_estimation_evaluation_framework_ray.state import HllSpec

    rng = np.random.RandomState(13)
    n = 4000
    base = np.datetime64("2025-01-01T00:00:00", "us")
    # spread over ~50 hours with gaps (some hours absent entirely)
    offsets_h = rng.choice(np.delete(np.arange(50), [7, 8, 23]), size=n)
    ts = base + offsets_h * np.timedelta64(3600, "s") \
        + rng.randint(0, 3600, size=n) * np.timedelta64(1, "s")
    uid = rng.randint(0, 300, size=n).astype(np.int64)
    df = pd.DataFrame({"ts": ts, "user_id": uid})
    ds = ray.data.from_pandas(df, override_num_blocks=7)

    out = sliding_window_distinct(ds, HllSpec(p=14, seed=3), ts_col="ts",
                                  id_col="user_id", window_buckets=4,
                                  bucket="hour", out_col="d")

    hours = df["ts"].dt.floor("h")
    for _, row in out.iterrows():
        h = row["bucket_start"]
        mask = (hours > h - pd.Timedelta(hours=4)) & (hours <= h)
        assert row["d"] == df.loc[mask, "user_id"].nunique(), h
    # one row per hour PRESENT in the data, calendar-gap semantics
    assert set(out["bucket_start"]) == set(hours.unique())


def test_rolling_agg_matches_pandas(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        rolling_agg,
    )

    rng = np.random.RandomState(3)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c"], size=n),
        "ts": rng.randint(0, 500, size=n).astype(np.int64),
        "v": rng.randint(-10, 100, size=n).astype(np.int64),
    })
    out = (rolling_agg(ray.data.from_pandas(df, override_num_blocks=7),
                       key_col="k", order_cols=["ts", "id"], id_col="id",
                       frame_rows=4, value_col="v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = df.sort_values(["k", "ts", "id"]).copy()
    ref["roll_sum"] = (ref.groupby("k")["v"]
                       .transform(lambda s: s.rolling(4, min_periods=1).sum())
                       .astype(np.int64))
    ref["roll_n"] = (ref.groupby("k")["v"]
                     .transform(lambda s: s.rolling(4, min_periods=1).count())
                     .astype(np.int64))
    ref = ref.sort_values("id").reset_index(drop=True)
    assert out["roll_sum"].tolist() == ref["roll_sum"].tolist()
    assert out["roll_n"].tolist() == ref["roll_n"].tolist()


def test_rolling_agg_partition_invariance(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        rolling_agg,
    )

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "k": rng.choice(["p", "q"], size=500),
                       "ts": rng.randint(0, 50, size=500).astype(np.int64),
                       "v": rng.randint(0, 9, size=500).astype(np.int64)})
    outs = [rolling_agg(ray.data.from_pandas(df, override_num_blocks=nb),
                        key_col="k", order_cols=["ts", "id"], id_col="id",
                        frame_rows=7, value_col="v")
            .to_pandas().sort_values("id").reset_index(drop=True)
            for nb in (1, 13)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_rolling_agg_group_guard(ray_session):
    import pandas as pd

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        rolling_agg,
    )

    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                       "k": ["hot"] * 100,
                       "ts": np.arange(100, dtype=np.int64),
                       "v": np.ones(100, dtype=np.int64)})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="max_group_rows"):
        rolling_agg(ds, key_col="k", order_cols=["ts", "id"], id_col="id",
                    frame_rows=3, value_col="v",
                    max_group_rows=10).materialize()


def test_resample_counts_zero_fills_gaps(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        resample_counts,
    )

    df = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 03:20",
                              "2024-01-01 01:05"]),
    })
    out = resample_counts(ray.data.from_pandas(df), key_col="k",
                          ts_col="ts", unit="hour")
    # spine: 2 keys x 4 hours (00..03) = 8 rows, zeros where absent
    assert len(out) == 8
    a = out[out["k"] == "a"]["n"].tolist()
    b = out[out["k"] == "b"]["n"].tolist()
    assert a == [1, 0, 0, 1]
    assert b == [0, 1, 0, 0]


def test_sliding_fold_matches_naive_and_is_linear():
    """The two-stack fold equals the naive O(n*W) refold on every window,
    with a LINEAR total merge count (each element merged <= 2 times +
    one combine per query)."""
    import numpy as np

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        _sliding_fold,
    )
    from cardinality_estimation_evaluation_framework_ray.state.base import (
        merge_many,
    )
    from cardinality_estimation_evaluation_framework_ray.state.exact import (
        ExactMultiSetSpec,
        ExactMultiSetSketch,
    )

    spec = ExactMultiSetSpec()
    rng = np.random.default_rng(5)
    n, W = 200, 24
    blobs = []
    for i in range(n):
        s = spec.new()
        s.update_tokens(rng.integers(0, 500, rng.integers(1, 30)))
        blobs.append(s.to_bytes())
    # variable-width trailing windows (gappy lo, non-decreasing)
    lo = np.maximum(0, np.arange(n) - rng.integers(0, W, n))
    lo = np.maximum.accumulate(lo)

    calls = {"n": 0}
    orig = ExactMultiSetSketch.merge_in

    def counting(self, other):
        calls["n"] += 1
        return orig(self, other)

    ExactMultiSetSketch.merge_in = counting
    try:
        got = [int(np.asarray(s.estimate())[0] + 0.5)
               for s in _sliding_fold(spec, blobs, lo)]
    finally:
        ExactMultiSetSketch.merge_in = orig
    exp = [int(np.asarray(merge_many(spec, blobs[lo[i]:i + 1])
                          .estimate())[0] + 0.5) for i in range(n)]
    assert got == exp
    # linear bound: push + flush <= 2n, query combine <= n  ->  <= 3n,
    # far below the naive  sum(i - lo[i] + 1) ~ n*W/2  merge count
    assert calls["n"] <= 3 * n, calls["n"]

    # contract violations fail loudly
    import pytest

    bad = lo.copy()
    bad[10] = 0  # decreasing after accumulate ruined
    bad[9] = 5
    with pytest.raises(ValueError, match="non-decreasing"):
        list(_sliding_fold(spec, blobs, bad))


def test_ewma_by_key_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        ewma_by_key,
    )

    rng = np.random.RandomState(11)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 7, n).astype(np.int64),
        "ts": rng.randint(0, 200, n).astype(np.int64),  # many ts ties
        "value": rng.randn(n) * 50,
    })
    out = ewma_by_key(ray.data.from_pandas(df).repartition(5),
                      key_col="user_id", ts_col="ts", value_col="value",
                      id_col="event_id", alpha=0.3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ref["ewma"] = ref.groupby("user_id")["value"] \
        .transform(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == ref["event_id"].tolist()
    assert np.allclose(out["ewma"], np.round(ref["ewma"], 6), atol=2e-6)


def test_ewma_by_key_validates_alpha_and_single_row(ray_session):
    import pandas as pd
    import pytest

    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        ewma_by_key,
    )

    one = ray.data.from_pandas(pd.DataFrame(
        {"event_id": [1], "user_id": [9], "ts": [0], "value": [42.5]}))
    with pytest.raises(ValueError, match="alpha"):
        ewma_by_key(one, key_col="user_id", ts_col="ts",
                    value_col="value", id_col="event_id", alpha=0.0)
    out = ewma_by_key(one, key_col="user_id", ts_col="ts",
                      value_col="value", id_col="event_id",
                      alpha=0.5).to_pandas()
    assert out["ewma"].tolist() == [42.5]  # s_0 = v_0 seed


def test_interval_union_merges_overlaps_and_touches(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        interval_union,
    )

    def ts(sec):
        return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec)

    # user 1: [0,10] + [5,20] overlap -> [0,20]; [20,25] touches -> [0,25];
    #         [40,50] separate.  user 2: nested [0,100] contains [10,20].
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 2],
        "s": [ts(0), ts(5), ts(20), ts(40), ts(0), ts(10)],
        "e": [ts(10), ts(20), ts(25), ts(50), ts(100), ts(20)],
    })
    out = interval_union(ray.data.from_pandas(df, override_num_blocks=3),
                         key_col="u", start_col="s", end_col="e")
    assert out["u"].tolist() == [1, 2]
    assert out["n_islands"].tolist() == [2, 1]
    assert out["covered_us"].tolist() == [35 * 10**6, 100 * 10**6]


def test_interval_union_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.windows import (
        interval_union,
    )

    rs = np.random.RandomState(11)
    n = 2000
    start = pd.Timestamp("2024-01-01").value // 1000 + rs.randint(
        0, 10**6, n) * 1_000_000
    dur = rs.randint(1, 5000, n) * 1_000_000
    df = pd.DataFrame({
        "u": rs.randint(0, 25, n),
        "s": start.astype("datetime64[us]"),
        "e": (start + dur).astype("datetime64[us]"),
    })
    out = interval_union(ray.data.from_pandas(df, override_num_blocks=6),
                         key_col="u", start_col="s", end_col="e")

    # brute force: per-user boolean coverage over second-resolution grid
    for _, row in out.iterrows():
        g = df[df["u"] == row["u"]]
        ivs = sorted(zip(g["s"].astype("int64"), g["e"].astype("int64")))
        islands, cur_lo, cur_hi = [], None, None
        for s, e in ivs:
            if cur_hi is None or s > cur_hi:
                if cur_hi is not None:
                    islands.append((cur_lo, cur_hi))
                cur_lo, cur_hi = s, e
            else:
                cur_hi = max(cur_hi, e)
        islands.append((cur_lo, cur_hi))
        assert row["n_islands"] == len(islands)
        assert row["covered_us"] == sum(hi - lo for lo, hi in islands)
