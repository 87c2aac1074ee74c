"""End-to-end training-data curation over the documents table: the chain a
100-TB pretraining pipeline runs, composed from this engine's stages —

  1. exact dedup            (content-hash; hash+id shuffle only)
  2. near-dup pruning       (MinHash+LSH candidates -> drop non-canonical)
  3. decontamination        (broadcast gram-hash semi-join vs a held-out set)
  4. quality filtering      (percentile cut via one-pass KLL quantile)
  5. domain mixing          (mixture_sample: per-source char budgets)
  6. chunk + pack           (RAG chunks -> fixed-length training examples)

Pre-curation diagnostics: cross-source 8-gram overlap matrix + OOV rate
against the corpus top-k vocabulary.

Every stage streams; document bodies move at most once (the final join);
all selection stages exchange metadata (ids, hashes, weights) only.

  python examples/training_data_pipeline.py --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument("--num-cpus", type=int, default=8)
    parser.add_argument("--seq-len", type=int, default=256)
    args = parser.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from cardinality_estimation_evaluation_framework_ray.stages.dedup import (
        dedup_exact_texts,
        minhash_near_dups,
    )
    from cardinality_estimation_evaluation_framework_ray.stages.filters import (
        build_top_vocab,
        decontaminate,
        oov_rate,
        quantile_threshold_filter,
        source_overlap_matrix,
    )
    from cardinality_estimation_evaluation_framework_ray.stages.packing import (
        pack_sequences,
    )
    from cardinality_estimation_evaluation_framework_ray.stages.sampling import (
        mixture_sample,
    )
    from cardinality_estimation_evaluation_framework_ray.stages.text import (
        chunk_documents,
        quality_stats,
    )

    docs = ray.data.read_parquet(f"{args.sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0) pre-curation diagnostics: which crawl sources overlap (joint-dedup
    # candidates) and how well a top-k vocabulary covers the corpus
    overlap = source_overlap_matrix(docs, n=8)
    vocab = build_top_vocab(docs, top_k=20)
    mean_oov = float(oov_rate(docs, vocab).to_pandas()["oov_rate"].mean())

    # 1) exact dedup: survivors carry their own id (metadata-only shuffle)
    survivors = dedup_exact_texts(docs).select_columns(["kept_doc_id"])
    keep_exact = set(survivors.to_pandas()["kept_doc_id"])  # sandbox scale only

    # 2) near-dups: drop the higher id of every candidate pair
    pairs = minhash_near_dups(docs, threshold=0.7).to_pandas()
    drop_near = set(pairs[["doc_a", "doc_b"]].max(axis=1)) if len(pairs) else set()

    # 3) decontamination vs a deterministic 1-in-37 held-out slice
    def bench_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 37 == 0))

    bench = docs.map_batches(bench_slice, batch_format="pyarrow")
    cont = decontaminate(docs, bench, n=8).to_pandas()
    drop_cont = set(cont.loc[cont["contaminated"], "doc_id"])

    # 4) quality: drop the worst decile by mean word length (a cheap
    # gibberish proxy over this synthetic corpus) — percentile cutoff via
    # the one-pass KLL sketch, the no-shuffle 100-TB path
    scores = quality_stats(docs).select_columns(
        ["doc_id", "mean_word_len"]).materialize()
    kept_q = set(quantile_threshold_filter(
        scores, "mean_word_len", 0.1, mode="kll").to_pandas()["doc_id"])
    drop_quality = set(scores.to_pandas()["doc_id"]) - kept_q  # sandbox scale

    drop = (drop_near | drop_cont | drop_quality)
    kept_ids = np.array(sorted(keep_exact - drop), dtype=np.int64)
    kept_ref = ray.put(kept_ids)

    def keep_only(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        k = ray.get(kept_ref)
        pos = np.searchsorted(k, ids)
        ok = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == ids)
        return t.filter(pa.array(ok))

    clean = docs.map_batches(keep_only, batch_format="pyarrow")

    # 5) domain mixing: equal char budget per source
    budgets = {s: 5_000 for s in
               clean.select_columns(["source"]).unique("source")}
    mix = mixture_sample(clean, budgets=budgets)
    mix_ids = mix.to_pandas()["doc_id"].to_numpy()
    mix_ref = ray.put(np.sort(mix_ids.astype(np.int64)))

    def keep_mix(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        k = ray.get(mix_ref)
        pos = np.searchsorted(k, ids)
        ok = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == ids)
        return t.filter(pa.array(ok))

    curated = clean.map_batches(keep_mix, batch_format="pyarrow")

    # 6) chunk to windows, then pack chunks into fixed-length examples
    chunks = chunk_documents(curated, chunk_chars=512, overlap=64)

    def as_pack_input(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False) * 1000
                + t.column("chunk_id").to_numpy(zero_copy_only=False)),
            "source": pa.array(["all"] * t.num_rows),
            "n_tok": t.column("n_chunk_chars").cast(pa.int64()),
        })

    packed = pack_sequences(chunks.map_batches(as_pack_input,
                                               batch_format="pyarrow"),
                            seq_len=args.seq_len)
    pk = packed.to_pandas()
    n_examples = int(pk["last_pack"].max()) + 1 if len(pk) else 0

    # 7) post-curation analytics: the curated corpus' most frequent token
    # ids via the heavy-hitters summary (capacity-bounded shuffle payload)
    from cardinality_estimation_evaluation_framework_ray.stages.build import (
        build_sketch_states,
        collect_states,
        union_across_keys,
    )
    from cardinality_estimation_evaluation_framework_ray.stages.text import (
        tokenize_documents,
    )
    from cardinality_estimation_evaluation_framework_ray.state import (
        HeavyHittersSpec,
    )

    hh_specs = {"hh": HeavyHittersSpec(capacity=4096)}
    hh_states = build_sketch_states(tokenize_documents(curated), hh_specs)
    hh = union_across_keys(collect_states(hh_states, hh_specs),
                           hh_specs)["hh"]
    top_toks, top_counts = hh.topk(5)

    print(f"docs in                 : {n0}")
    if len(overlap):
        hot = overlap.sort_values("shared_grams", ascending=False).iloc[0]
        print(f"hottest source overlap  : {hot.source_a}~{hot.source_b} "
              f"({hot.shared_grams} shared 8-grams)")
    print(f"mean OOV vs top-20      : {mean_oov:.4f}")
    print(f"after exact dedup       : {len(keep_exact)}")
    print(f"dropped near-dup        : {len(drop_near)}")
    print(f"dropped contaminated    : {len(drop_cont)}")
    print(f"dropped low-quality     : {len(drop_quality)}")
    print(f"after curation          : {len(kept_ids)}")
    print(f"after domain mixing     : {len(mix_ids)}")
    print(f"chunks                  : {chunks.count()}")
    print(f"packed {args.seq_len}-char examples : {n_examples}")
    print("top curated token ids   : "
          + ", ".join(f"{t}x{c}" for t, c in zip(top_toks.tolist(),
                                                 top_counts.tolist())))
    ray.shutdown()


if __name__ == "__main__":
    main()
