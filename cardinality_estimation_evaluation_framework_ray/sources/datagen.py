"""Deterministic synthetic tokens-table generators (the engine's "sources").

The reference generates per-publisher ID sets in-process with seeded
``RandomState`` iterators (``src/simulations/set_generator.py:46-530``,
``frequency_set_generator.py:33-341``).  Our sources write the canonical
Parquet tokens table ``(doc_id:string, tokens:list<int32>, n_tok:int32,
source:string)`` (BASELINE.json input_hint) through a streaming Ray Data
pipeline, with every random draw COUNTER-BASED on the global row id — so the
output is bit-identical regardless of block sizes, partitioning or
parallelism, and a 10^12-row table needs no driver-side state.

Scenario overlays control cross-source overlap by giving each source a
token-id window inside the universe (mirrors reference scenarios; FIXTURES.md
§F2):

  independent        every source draws uniformly from the whole universe
  remarketing        universe restricted to a fraction (evaluation_configs.py:162-168)
  fully_overlapping  all sources share one window      (set_generator.py:200-224)
  disjoint           consecutive disjoint windows      (set_generator.py:490-530)
  subset             sources 0..k are "large" windows, the rest nested subsets
                     (set_generator.py:227-300)
  sequential         source i's window slides by (1-shared_prop)*W per step, so
                     adjacent sources overlap by shared_prop (set_generator.py:358-400)

Frequency overlays (FIXTURES.md §F3) shape within-source token repetition:

  natural    tokens drawn independently => Binomial/Poisson-like frequencies
             (the homogeneous multiset shape, frequency_set_generator.py:82-182)
  constant:f every reached token appears exactly f times
             (PublisherConstantFrequencySetGenerator, frequency_set_generator.py:285-341)
  powerlaw:a heavy-tailed per-token rates (heterogeneous multiset shape,
             frequency_set_generator.py:185-282)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import hash64, uniform01


@dataclasses.dataclass(frozen=True)
class TokensTableSpec:
    num_sources: int = 10
    rows_per_source: int = 5000
    min_tok: int = 16
    max_tok: int = 512
    universe_size: int = 200_000
    scenario: str = "independent"
    shared_prop: float = 0.5      # sequential overlap
    window_frac: float = 0.25     # window size as fraction of universe (non-independent)
    frequency: str = "natural"    # natural | constant:<f> | powerlaw:<alpha>
    zipf_sources: bool = False    # skewed rows-per-source (bench skew tier)
    seed: int = 42

    @property
    def total_rows(self) -> int:
        return self.num_sources * self.rows_per_source

    # duck-typed scenario surface shared with SetScenarioSpec -------------
    def make_table(self) -> pa.Table:
        """In-process generation of the whole (small) table."""
        return _gen_batch(np.arange(self.total_rows, dtype=np.int64), self)

    def make_dataset(self) -> "ray.data.Dataset":
        return tokens_dataset(self)

    # -- deterministic layout ----------------------------------------------
    def source_boundaries(self) -> np.ndarray:
        """Row-id boundaries of each source's contiguous row range."""
        if not self.zipf_sources:
            return np.arange(self.num_sources + 1, dtype=np.int64) * self.rows_per_source
        w = 1.0 / np.arange(1, self.num_sources + 1, dtype=np.float64)
        w /= w.sum()
        sizes = np.maximum(1, np.round(w * self.total_rows)).astype(np.int64)
        sizes[-1] += self.total_rows - sizes.sum()
        return np.concatenate([[0], np.cumsum(sizes)])

    def source_windows(self) -> tuple[np.ndarray, np.ndarray]:
        """(lo, size) token-id window per source implementing the scenario."""
        U = self.universe_size
        n = self.num_sources
        W = max(1, int(self.window_frac * U))
        if self.scenario == "independent":
            lo = np.zeros(n, dtype=np.int64)
            size = np.full(n, U, dtype=np.int64)
        elif self.scenario == "remarketing":
            lo = np.zeros(n, dtype=np.int64)
            size = np.full(n, max(1, U // 5), dtype=np.int64)
        elif self.scenario == "fully_overlapping":
            lo = np.zeros(n, dtype=np.int64)
            size = np.full(n, W, dtype=np.int64)
        elif self.scenario == "disjoint":
            size = np.full(n, max(1, U // n), dtype=np.int64)
            lo = np.arange(n, dtype=np.int64) * size
        elif self.scenario == "subset":
            half = max(1, n // 2)
            lo = np.zeros(n, dtype=np.int64)
            size = np.where(np.arange(n) < half, W, max(1, W // 10)).astype(np.int64)
        elif self.scenario == "sequential":
            step = max(1, int(W * (1.0 - self.shared_prop)))
            lo = (np.arange(n, dtype=np.int64) * step) % max(1, U - W)
            size = np.full(n, W, dtype=np.int64)
        else:
            raise ValueError(f"unknown scenario {self.scenario!r}")
        return lo, np.minimum(size, U)


def _gen_batch(ids: np.ndarray, spec: TokensTableSpec) -> pa.Table:
    """Generate rows for global row-ids ``ids`` — pure function of (ids, spec)."""
    bounds = spec.source_boundaries()
    src_idx = np.searchsorted(bounds, ids, side="right") - 1
    src_idx = np.clip(src_idx, 0, spec.num_sources - 1)
    lo, size = spec.source_windows()

    span = spec.max_tok - spec.min_tok + 1
    n_tok = (spec.min_tok + (hash64(ids, spec.seed + 1) % np.uint64(span))).astype(np.int32)

    freq = spec.frequency
    if freq.startswith("constant:"):
        # fixed row length so within-source token positions are closed-form
        f = int(freq.split(":")[1])
        n_tok = np.full(len(ids), spec.min_tok, dtype=np.int32)
        row_in_src = ids - bounds[src_idx]
        base_pos = row_in_src.astype(np.int64) * spec.min_tok
        total = int(n_tok.sum())
        tok_row = np.repeat(np.arange(len(ids)), n_tok)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_tok)[:-1]]).astype(np.int64), n_tok)
        pos = base_pos[tok_row] + within
        # pool index pos//f: each pool slot maps to one token id => exact freq f
        pool_idx = pos // f
        tok_src = src_idx[tok_row]
        draw = hash64(pool_idx * np.int64(spec.num_sources) + tok_src, spec.seed + 2)
        toks = (lo[tok_src] + (draw % size[tok_src].astype(np.uint64)).astype(np.int64)).astype(np.int32)
    else:
        total = int(n_tok.sum())
        tok_row = np.repeat(np.arange(len(ids)), n_tok)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_tok)[:-1]]).astype(np.int64), n_tok)
        counter = ids[tok_row].astype(np.int64) * np.int64(spec.max_tok + 1) + within
        tok_src = src_idx[tok_row]
        if freq == "natural":
            draw = hash64(counter, spec.seed + 2)
            toks = (lo[tok_src] + (draw % size[tok_src].astype(np.uint64)).astype(np.int64)).astype(np.int32)
        elif freq.startswith("powerlaw:"):
            alpha = float(freq.split(":")[1])
            u = uniform01(counter, spec.seed + 2)
            # inverse-CDF of p(i) ∝ (i+1)^-alpha approximated by u^(1/(1-alpha))-ish
            # power transform: heavier mass on small indices => heterogeneous freq
            frac = np.power(u, 1.0 / max(1e-9, 1.0 - alpha)) if alpha < 1.0 else np.power(u, alpha + 1.0)
            idx = np.minimum((frac * size[tok_src]).astype(np.int64), size[tok_src] - 1)
            toks = (lo[tok_src] + idx).astype(np.int32)
        else:
            raise ValueError(f"unknown frequency overlay {freq!r}")

    offsets = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int32)
    tok_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(toks, type=pa.int32()))
    sources = np.array([f"src{int(i)}" for i in range(spec.num_sources)])
    src_col = sources[src_idx]
    row_in_src = (ids - bounds[src_idx]).astype(np.int64)
    doc_ids = np.char.add(np.char.add(src_col, "-"),
                          np.char.zfill(row_in_src.astype(str), 8))
    return pa.table({
        "doc_id": pa.array(doc_ids.tolist(), type=pa.string()),
        "tokens": tok_arr,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(src_col.tolist(), type=pa.string()),
    })


def tokens_dataset(spec: TokensTableSpec, *, override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """A lazy Dataset of the synthetic tokens table (streaming generation)."""
    ds = ray.data.range(spec.total_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return _gen_batch(ids, spec)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=8192)


def write_tokens_table(spec: TokensTableSpec, out_dir: str,
                       override_num_blocks: int | None = None) -> str:
    ds = tokens_dataset(spec, override_num_blocks=override_num_blocks)
    if override_num_blocks:
        # keep one output file per block: predictable partitioned layout for
        # the resumable/checkpointed build (stages/checkpoint.py)
        ds = ds.repartition(override_num_blocks)
    ds.write_parquet(out_dir)
    return out_dir


def exact_distinct_per_source(spec: TokensTableSpec) -> dict[str, int]:
    """Driver-side oracle for SMALL specs: true distinct tokens per source."""
    tbl = _gen_batch(np.arange(spec.total_rows, dtype=np.int64), spec)
    out: dict[str, set] = {}
    for s, t in zip(tbl.column("source").to_pylist(),
                    tbl.column("tokens").to_pylist()):
        out.setdefault(s, set()).update(t)
    return {k: len(v) for k, v in out.items()}
