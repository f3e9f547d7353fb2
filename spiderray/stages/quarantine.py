"""Poison-row quarantine — keep a 10^12-row job alive through bad rows.

At corpus scale some rows WILL crash a UDF (mojibake that breaks a
parser, a 2 GB outlier, a decoder edge case).  Failing the task kills
the whole job and retries reprocess the good 4,095 rows of the block
along with the one poison row — forever.  ``quarantine_map_batches``
wraps the batch UDF with recursive bisection: a failing batch splits in
half until the offending single rows are isolated; good rows flow
through the UDF's normal output, poison rows append to a quarantine
parquet directory (one file per isolation, atomic rename) with the
exception string for later triage.

Determinism note: the SET of quarantined rows is a pure function of the
UDF (each poison row fails alone under bisection; each good row
succeeds in some sub-batch), independent of batch boundaries — which is
what lets a serial oracle pin it.  File COUNT in the quarantine dir is
not deterministic (it depends on batching); the parquet contents are.
"""

from __future__ import annotations

import os
import traceback

import pyarrow as pa
import pyarrow.parquet as pq



def _write_quarantine(out_dir: str, ids: list, errors: list[str],
                      id_col: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    t = pa.table({id_col: pa.array(ids),
                  "error": pa.array(errors, pa.string())})
    import uuid

    path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.parquet")
    tmp = f"{path}.tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def quarantine_map_batches(ds, fn, quarantine_dir: str,
                           id_col: str = "doc_id", **map_kwargs):
    """``ds.map_batches(fn)`` that survives poison rows.  ``fn`` is a
    batch → batch callable over pyarrow Tables.  Rows whose singleton
    batch still raises are written to ``quarantine_dir`` (id + error)
    and omitted from the output.  Extra ``map_kwargs`` pass through to
    map_batches (batch_size, concurrency, ...)."""

    # last successful output schema, held IN the serialized closure (one
    # copy per worker after deserialization).  A module-global dict keyed
    # by id(fn) is unsafe: CPython reuses ids after GC, so two wrapped UDFs
    # on one worker could cross-pollinate schemas (round-3 ADVICE finding).
    schema_cell: list = [None]

    def guarded(batch: pa.Table) -> pa.Table:
        goods: list[pa.Table] = []
        bad_ids: list = []
        bad_errors: list[str] = []

        def attempt(b: pa.Table):
            if b.num_rows == 0:
                return
            try:
                goods.append(fn(b))
                return
            except Exception as e:  # noqa: BLE001 — the entire point
                if b.num_rows == 1:
                    bad_ids.append(b.column(id_col).to_pylist()[0])
                    bad_errors.append(
                        f"{type(e).__name__}: {e}"[:500]
                        or traceback.format_exc(limit=1))
                    return
            mid = b.num_rows // 2
            attempt(b.slice(0, mid))
            attempt(b.slice(mid))

        attempt(batch)
        if bad_ids:
            _write_quarantine(quarantine_dir, bad_ids, bad_errors, id_col)
        if goods:
            schema_cell[0] = goods[0].schema
            return pa.concat_tables(goods, promote_options="default")
        # whole batch was poison: derive the output schema from the UDF
        # on the empty slice; a UDF that also raises on 0 rows falls back
        # to the schema cached from this worker's last success
        try:
            return fn(batch.slice(0, 0))
        except Exception:
            cached = schema_cell[0]
            if cached is not None:
                return cached.empty_table()
            raise RuntimeError(
                "quarantine_map_batches: every row of a batch was poison "
                "AND the UDF raises on 0-row input with no prior success "
                "on this worker — give the UDF a 0-row fast path")

    return ds.map_batches(guarded, batch_format="pyarrow",
                          zero_copy_batch=True, **map_kwargs)


def read_quarantine(quarantine_dir: str,
                    id_col: str = "doc_id") -> pa.Table:
    """All quarantined (id, error) rows; an EMPTY (id_col, error) table —
    same schema as the non-empty case — when nothing ever failed (or the
    directory was never created)."""
    empty = pa.table({id_col: pa.array([], pa.string()),
                      "error": pa.array([], pa.string())})
    if not os.path.isdir(quarantine_dir):
        return empty
    parts = [pq.read_table(os.path.join(quarantine_dir, f))
             for f in sorted(os.listdir(quarantine_dir))
             if f.endswith(".parquet")]
    if not parts:
        return empty
    return pa.concat_tables(parts)
