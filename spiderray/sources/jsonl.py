"""JSONL shard sink/source — the interchange format LLM text corpora
actually ship in (C4, The Pile, Dolma, RedPajama all distribute
newline-delimited JSON).

Mirrors the WebDataset sink's contract (sources/wds.py): rows route to
shards by md5(key), one writer task per shard, deterministic shard BYTES
(rows sorted by key, ``json.dumps(sort_keys=True)``), atomic tmp+rename
writes, and ``.done`` markers so an interrupted run resumes by skipping
finished shards.  The read side is Ray-Data-native ``ray.data.read_json``
(one read task per shard, Arrow JSON parser) — no custom parsing.

Binary columns are not JSON-representable: pass ``b64_cols`` to transport
them base64-encoded (decoded back by ``read_jsonl_shards`` when asked).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

import numpy as np
import pyarrow as pa

from .wds import shard_of


def write_jsonl_shards(ds, out_dir: str, key_col: str,
                       columns: list[str] | None = None,
                       b64_cols: tuple[str, ...] = (),
                       n_shards: int = 64, resume: bool = True):
    """Write ``ds`` as JSONL shards under ``out_dir``; returns a manifest
    Dataset of (shard, path, n_rows, jsonl_md5).  With ``resume=True``
    shards whose ``.done`` marker exists are skipped (their manifest row
    is recomputed from the marker)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        # a fresh (non-resumed) write owns the directory: stale shards from
        # a prior run with different data or n_shards would otherwise be
        # silently globbed back by read_jsonl_shards (shards that receive
        # zero rows this run never overwrite their old file)
        for f in os.listdir(out_dir):
            if f.endswith(".jsonl") or f.endswith(".jsonl.done"):
                os.remove(os.path.join(out_dir, f))

    def route(batch: pa.Table) -> pa.Table:
        cols = columns or batch.column_names
        for c in cols:
            t = batch.schema.field(c).type
            if ((pa.types.is_binary(t) or pa.types.is_large_binary(t))
                    and c not in b64_cols):
                raise ValueError(
                    f"column {c!r} is binary but not in b64_cols — JSON "
                    f"would stringify it lossily; pass b64_cols=({c!r},)")
        keys = [str(k) for k in batch.column(key_col).to_pylist()]
        shards = np.fromiter((shard_of(k, n_shards) for k in keys),
                             dtype=np.int32, count=len(keys))
        col_data = {c: batch.column(c).to_pylist() for c in cols}
        lines = []
        for j in range(len(keys)):
            row = {}
            for c in cols:
                v = col_data[c][j]
                if c in b64_cols and v is not None:  # null stays null
                    v = base64.b64encode(v).decode("ascii")
                row[c] = v
            lines.append(json.dumps(row, sort_keys=True, ensure_ascii=False,
                                    default=str))
        return pa.table({
            "__shard": pa.array(shards),
            "__key": pa.array(keys, pa.string()),
            "__line": pa.array(lines, pa.string()),
        })

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.jsonl")
        marker = f"{path}.done"
        if resume and os.path.exists(marker):
            with open(marker) as f:
                done = json.loads(f.read())
            return pd.DataFrame([{"shard": shard, "path": path,
                                  "n_rows": int(done["n_rows"]),
                                  "jsonl_md5": done["jsonl_md5"]}])
        # sort by (key, line): duplicate keys would otherwise keep Ray's
        # nondeterministic block-arrival order and break byte-stability
        g = g.sort_values(["__key", "__line"], kind="mergesort")
        blob = ("\n".join(g["__line"]) + "\n").encode("utf-8")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        md5 = hashlib.md5(blob).hexdigest()
        with open(marker, "w") as f:
            f.write(json.dumps({"n_rows": len(g), "jsonl_md5": md5}))
        return pd.DataFrame([{"shard": shard, "path": path,
                              "n_rows": len(g), "jsonl_md5": md5}])

    return (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pandas")
    )


def read_jsonl_shards(in_dir: str, b64_cols: tuple[str, ...] = ()):
    """Stream rows back from a JSONL shard directory via the native
    ``ray.data.read_json`` (one Arrow-parsed read task per shard);
    ``b64_cols`` are decoded back to binary."""
    import ray.data as rd

    paths = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".jsonl"))
    if not paths:
        raise FileNotFoundError(f"no .jsonl shards under {in_dir}")
    ds = rd.read_json(paths)
    if not b64_cols:
        return ds

    def decode(batch: pa.Table) -> pa.Table:
        for c in b64_cols:
            if c in batch.column_names:
                vals = [None if v is None else base64.b64decode(v)
                        for v in batch.column(c).to_pylist()]
                batch = batch.set_column(
                    batch.column_names.index(c), c,
                    pa.array(vals, pa.binary()))
        return batch

    return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
