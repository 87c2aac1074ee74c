"""Ray-Data-native distributed sketch / approximate-aggregation library.

A from-scratch engine with the query capabilities of the WFA
cardinality_estimation_evaluation_framework (reference, read-only at
/root/reference): cardinality (reach) and frequency estimation over unions of
massive token multisets, expressed as mergeable sketch UDAFs over
``ray.data.Dataset`` pipelines of zero-copy Arrow batches.

Layout:
  functions/  vectorized hash / math / sampling kernels
  state/      sketch state objects (HLL++, Bloom/ADBF, VoC, legions, FLL,
              count-min, KLL, t-digest, exact oracle, noisers)
  stages/     Ray Data stages (partial build, merge tree, dedup, ANN, text,
              multimodal, checkpointing)
  sources/    deterministic synthetic token-table generators + readers
  pipelines/  end-to-end pipelines (reach report, simulator, evaluator)
"""

__version__ = "0.1.0"
