"""Cogroup-join primitive: attach a key->value table onto a dataset.

Ray Data's native ``Dataset.join`` (hash shuffle aggregators) emits
schema-less empty blocks for empty partitions in this Ray version, which
poisons any downstream join/shuffle of the join output
(``ArrowInvalid: No match ... FieldRef`` in the aggregator finalize) — easy
to hit when the pair table is much smaller than ``num_partitions``.  The
attach below expresses the same inner hash join as ONE union + groupby +
map_groups cogroup: exactly one all-to-all whose payload is the two input
tables, no driver-side materialization, and only battle-tested operators.

Scale notes: the shuffle key is the join key, so per-task memory is one
key-group; a key appearing in millions of left rows is one group — callers
join on near-unique keys (doc ids, node ids), so groups stay tiny.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def attach_by_key(ds: "ray.data.Dataset", key_col: str,
                  kv: "ray.data.Dataset", kv_key: str, val_col: str,
                  out_col: str, *, ds_schema: pa.Schema | None = None,
                  val_type: pa.DataType | None = None) -> "ray.data.Dataset":
    """Inner-join ``kv``'s ``val_col`` onto ``ds`` rows where
    ``ds.key_col == kv.kv_key``; the value lands in ``out_col``.

    ``kv`` must have at most one row per key (sizes/digest/label tables do);
    ``ds`` rows without a match are dropped (inner semantics).  Pass
    ``ds_schema``/``val_type`` when known — otherwise they are probed via
    ``Dataset.schema()``, which executes a sample of a lazy upstream.
    """
    if ds_schema is None:
        sch = ds.schema()
        ds_schema = pa.schema(list(zip(sch.names, sch.types)))
    names = list(ds_schema.names)
    types = {f.name: f.type for f in ds_schema}
    if val_type is None:
        kv_schema = kv.schema()
        val_type = kv_schema.types[kv_schema.names.index(val_col)]
    vtype = val_type
    ktype = types[key_col]

    def melt_ds(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n) for n in names}
        cols["__v"] = pa.nulls(t.num_rows, vtype)
        cols["__k"] = t.column(key_col)
        cols["__is_kv"] = pa.array(np.zeros(t.num_rows, np.int8))
        return pa.table(cols)

    def melt_kv(t: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(t.num_rows, types[n]) for n in names}
        cols["__v"] = t.column(val_col)
        cols["__k"] = t.column(kv_key).cast(ktype)
        cols["__is_kv"] = pa.array(np.ones(t.num_rows, np.int8))
        return pa.table(cols)

    both = ds.map_batches(melt_ds, batch_format="pyarrow").union(
        kv.map_batches(melt_kv, batch_format="pyarrow"))

    empty = pa.table({**{n: pa.array([], types[n]) for n in names},
                      out_col: pa.array([], vtype)})

    def group_attach(t: pa.Table) -> pa.Table:
        is_kv = t.column("__is_kv").to_numpy(zero_copy_only=False)
        vrows = np.flatnonzero(is_kv == 1)
        drows = np.flatnonzero(is_kv == 0)
        if len(vrows) == 0 or len(drows) == 0:
            return empty
        # broadcast the (single) kv value across the group's ds rows
        val = t.column("__v").combine_chunks().take(
            pa.array(np.repeat(vrows[:1], len(drows))))
        sub = t.take(pa.array(drows))
        cols = {n: sub.column(n) for n in names}
        cols[out_col] = val
        return pa.table(cols)

    return both.groupby("__k").map_groups(group_attach, batch_format="pyarrow")
