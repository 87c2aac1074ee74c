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

# Tune the allocator once per process (driver AND Ray workers — workers
# import this package when deserializing UDFs).  See functions/memtune.py:
# without it, NumPy kernels over >32 MB arrays pay a hypervisor page-fault
# per 4 KB on every call on lazily-faulted-memory hosts.
from .functions.memtune import tune_malloc as _tune_malloc  # noqa: E402

_tune_malloc()
del _tune_malloc
