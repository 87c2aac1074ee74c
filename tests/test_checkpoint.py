import glob
import os

import numpy as np
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.sources.datagen import (
    TokensTableSpec,
    write_tokens_table,
)
from cardinality_estimation_evaluation_framework_ray.stages.build import (
    build_sketch_states,
    collect_states,
)
from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
    build_sketch_states_resumable,
    checkpoint_progress,
    partition_input_files,
)
from cardinality_estimation_evaluation_framework_ray.state import HllSpec

SPEC = TokensTableSpec(num_sources=4, rows_per_source=300, min_tok=2,
                       max_tok=32, universe_size=30_000, seed=21)


@pytest.fixture(scope="module")
def tokens_files(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("tok"))
    write_tokens_table(SPEC, out, override_num_blocks=6)
    return sorted(glob.glob(os.path.join(out, "*.parquet")))


@pytest.mark.usefixtures("ray_session")
def test_resumable_matches_direct(tokens_files, tmp_path):
    specs = {"hll": HllSpec(p=10, seed=3)}
    ck = str(tmp_path / "ckpt")
    states = build_sketch_states_resumable(tokens_files, specs, ck,
                                           files_per_partition=2)
    per_key = collect_states(states, specs)
    direct = collect_states(
        build_sketch_states(ray.data.read_parquet(tokens_files), specs), specs)
    assert set(per_key) == set(direct)
    for k in per_key:
        assert np.array_equal(per_key[k]["hll"].buckets, direct[k]["hll"].buckets)

    prog = checkpoint_progress(ck)
    assert prog.num_rows > 0
    assert set(prog.column("partition_id").to_pylist()) == {0, 1, 2}


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_valid_checkpoints(tokens_files, tmp_path):
    specs = {"hll": HllSpec(p=9, seed=4)}
    ck = str(tmp_path / "ckpt2")
    build_sketch_states_resumable(tokens_files, specs, ck).count()
    paths = sorted(glob.glob(os.path.join(ck, "part=*", "states.parquet")))
    mtimes = {p: os.path.getmtime(p) for p in paths}
    # rerun: all checkpoints valid -> untouched
    build_sketch_states_resumable(tokens_files, specs, ck).count()
    assert {p: os.path.getmtime(p) for p in paths} == mtimes
    # config change -> rebuild (hash mismatch)
    specs2 = {"hll": HllSpec(p=9, seed=5)}
    build_sketch_states_resumable(tokens_files, specs2, ck).count()
    assert any(os.path.getmtime(p) != mtimes[p] for p in paths)


def test_partitioning():
    files = [f"f{i}" for i in range(7)]
    parts = partition_input_files(files, 3)
    assert [len(p) for p in parts] == [3, 3, 1]


@pytest.mark.usefixtures("ray_session")
def test_epoch_resumable_matches_task_plan(tokens_files, tmp_path):
    from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
        build_sketch_states_epoch_resumable,
    )

    specs = {"hll": HllSpec(p=10, seed=3)}
    ck = str(tmp_path / "ckpt_epoch")
    states = build_sketch_states_epoch_resumable(tokens_files, specs, ck,
                                                 files_per_partition=2)
    per_key = collect_states(states, specs)
    direct = collect_states(
        build_sketch_states(ray.data.read_parquet(tokens_files), specs), specs)
    assert set(per_key) == set(direct)
    for k in per_key:
        assert np.array_equal(per_key[k]["hll"].buckets,
                              direct[k]["hll"].buckets)


@pytest.mark.usefixtures("ray_session")
def test_epoch_resumable_survives_worker_kill(tokens_files, tmp_path):
    """Kill-a-worker: partition 0's task dies (os._exit) on its first
    attempt; Ray's task retry resumes it and the estimates are identical to
    an uninterrupted build — the checkpoint is the recovery unit."""
    from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
        build_sketch_states_epoch_resumable,
    )

    specs = {"hll": HllSpec(p=10, seed=7)}
    clean = collect_states(
        build_sketch_states_epoch_resumable(
            tokens_files, specs, str(tmp_path / "ck_clean")), specs)
    marker = str(tmp_path / "fail_once_marker")
    killed = collect_states(
        build_sketch_states_epoch_resumable(
            tokens_files, specs, str(tmp_path / "ck_killed"),
            _test_fail_once=marker), specs)
    assert os.path.exists(marker)  # the injected death actually happened
    assert set(clean) == set(killed)
    for k in clean:
        assert np.array_equal(clean[k]["hll"].buckets,
                              killed[k]["hll"].buckets)


@pytest.mark.usefixtures("ray_session")
def test_epoch_resumable_skips_valid_checkpoints(tokens_files, tmp_path):
    from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
        build_sketch_states_epoch_resumable,
    )

    specs = {"hll": HllSpec(p=9, seed=4)}
    ck = str(tmp_path / "ck_skip")
    build_sketch_states_epoch_resumable(tokens_files, specs, ck).count()
    paths = sorted(glob.glob(os.path.join(ck, "part=*", "states.parquet")))
    assert paths
    mtimes = {p: os.path.getmtime(p) for p in paths}
    build_sketch_states_epoch_resumable(tokens_files, specs, ck).count()
    assert {p: os.path.getmtime(p) for p in paths} == mtimes


@pytest.mark.usefixtures("ray_session")
def test_incremental_append_reuses_existing_checkpoints(tokens_files, tmp_path):
    """Corpus append: the incremental build reuses every prior partition
    checkpoint verbatim (stable file-path labels, not positional ids),
    builds only the appended file, and the merged estimates equal a full
    rebuild."""
    from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
        build_sketch_states_incremental,
        stable_partition_label,
    )

    specs = {"hll": HllSpec(p=10, seed=5)}
    ck = str(tmp_path / "ckpt_inc")

    initial = tokens_files[:-1]
    _, rep1 = build_sketch_states_incremental(initial, specs, ck)
    assert len(rep1["built"]) == len(initial) and not rep1["reused"]

    # "append" the last file: only its partition builds
    states, rep2 = build_sketch_states_incremental(tokens_files, specs, ck)
    assert sorted(rep2["reused"]) == sorted(rep1["built"])
    assert rep2["built"] == [stable_partition_label([tokens_files[-1]])]

    per_key = collect_states(states, specs)
    direct = collect_states(
        build_sketch_states(ray.data.read_parquet(tokens_files), specs), specs)
    assert set(per_key) == set(direct)
    for k in per_key:
        assert np.array_equal(per_key[k]["hll"].buckets,
                              direct[k]["hll"].buckets)

    # config change invalidates everything (different sketch config hash)
    _, rep3 = build_sketch_states_incremental(
        tokens_files, {"hll": HllSpec(p=11, seed=5)}, ck)
    assert len(rep3["built"]) == len(tokens_files) and not rep3["reused"]


def test_stable_partition_label_distinct_dirs_same_basename():
    """Shard dirs routinely reuse file names (2024/part-0 vs 2025/part-0);
    labels must digest full paths or the checkpoints collide."""
    from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
        stable_partition_label,
    )

    a = stable_partition_label(["/data/2024/part-0.parquet"])
    b = stable_partition_label(["/data/2025/part-0.parquet"])
    assert a != b
    # still order-independent within a partition
    two = ["/d/x.parquet", "/d/y.parquet"]
    assert (stable_partition_label(two)
            == stable_partition_label(list(reversed(two))))


def test_stable_partition_label_root_relative():
    from cardinality_estimation_evaluation_framework_ray.stages.checkpoint import (
        stable_partition_label,
    )

    files_a = ["/mnt/corpus/2024/part-0.parquet",
               "/mnt/corpus/2025/part-0.parquet"]
    files_b = ["/new/mount/2024/part-0.parquet",
               "/new/mount/2025/part-0.parquet"]
    # relocated corpus, same layout: identical labels under a root
    assert (stable_partition_label(files_a, root="/mnt/corpus")
            == stable_partition_label(files_b, root="/new/mount"))
    # without a root the absolute path is the identity (old scheme)
    assert (stable_partition_label(files_a)
            != stable_partition_label(files_b))
    # a root still separates same-basename sibling dirs
    assert (stable_partition_label([files_a[0]], root="/mnt/corpus")
            != stable_partition_label([files_a[1]], root="/mnt/corpus"))


@pytest.mark.usefixtures("ray_session")
def test_reach_report_resumable_equals_epoch(tokens_files, tmp_path):
    """The bench's epoch_ckpt plan produces the SAME report as the
    unresumable epoch plan (associative merges), and a second run over the
    same checkpoint dir reuses every checkpoint (resumability contract the
    bench's timed fresh-dir number deliberately excludes)."""
    import pandas as pd

    from cardinality_estimation_evaluation_framework_ray.pipelines.reach import (
        reach_report,
        reach_report_resumable,
    )

    specs = {"hll": HllSpec(p=10, seed=3)}
    ck = str(tmp_path / "ckpt_rr")
    got = reach_report_resumable(tokens_files, specs, ck,
                                 files_per_partition=2)
    exp = reach_report(ray.data.read_parquet(tokens_files), specs,
                       mode="epoch")
    pd.testing.assert_frame_equal(
        got.sort_values("source").reset_index(drop=True),
        exp.sort_values("source").reset_index(drop=True))
    paths = sorted(glob.glob(os.path.join(ck, "part=*", "states.parquet")))
    mtimes = {p: os.path.getmtime(p) for p in paths}
    again = reach_report_resumable(tokens_files, specs, ck,
                                   files_per_partition=2)
    pd.testing.assert_frame_equal(
        again.sort_values("source").reset_index(drop=True),
        exp.sort_values("source").reset_index(drop=True))
    assert {p: os.path.getmtime(p) for p in paths} == mtimes
