"""WebDataset-style tar-shard sink + source.

The tar-of-samples layout (webdataset.github.io; Aizman et al., "High
Performance I/O For Large Scale Deep Learning") is the de-facto
interchange format for multimodal training corpora: each sample is a
group of files sharing a key (``<key>.bin`` payload + ``<key>.json``
metadata), samples are packed into fixed-count tar shards, and loaders
stream shards sequentially.  Everything here is stdlib ``tarfile`` —
no webdataset package required.

Scale/determinism contract:

* **Shard routing is md5(key) % n_shards** — partition-independent and
  stable across runs, so a re-run (or a resumed run) writes the same
  sample into the same shard.
* **One writer per shard** (groupby(shard) → map_groups): tar files
  are append-only streams, so a shard is exactly one task's output.
  Within a shard samples are sorted by key and tar metadata is
  normalized (mtime=0, uid/gid=0) — shard bytes are REPRODUCIBLE, so
  re-runs can be verified by checksum and resumes can skip shards
  whose ``.done`` marker exists (same promotion pattern as
  state/manifest.py).
* **Reads stream**: the source lists ``*.tar``, one map task per
  shard, samples parsed with stdlib tarfile from an in-memory buffer.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa


def shard_of(key: str, n_shards: int) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16) % n_shards


def _pack_shard(keys: list[str], payloads: list[bytes],
                metas: list[dict]) -> bytes:
    """Samples → deterministic tar bytes (sorted by key, zeroed stat)."""
    order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for j in order:
            key = keys[j]
            for ext, data in (
                ("bin", payloads[j] or b""),
                ("json", json.dumps(metas[j], sort_keys=True,
                                    ensure_ascii=False).encode("utf-8")),
            ):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_tar_shards(ds, out_dir: str, key_col: str, bytes_col: str,
                     meta_cols: list[str], n_shards: int = 64,
                     resume: bool = True):
    """Write ``ds`` as WebDataset tar shards under ``out_dir``; returns a
    manifest Dataset of (shard, path, n_samples, tar_md5).  With
    ``resume=True`` shards whose ``.done`` marker exists are skipped
    (their manifest row is recomputed from the marker)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def route(batch: pa.Table) -> pa.Table:
        keys = [str(k) for k in batch.column(key_col).to_pylist()]
        shards = np.fromiter((shard_of(k, n_shards) for k in keys),
                             dtype=np.int32, count=len(keys))
        meta = [json.dumps(
            {c: v for c, v in zip(meta_cols, row)}, sort_keys=True,
            ensure_ascii=False, default=str)
            for row in zip(*(batch.column(c).to_pylist()
                             for c in meta_cols))] if meta_cols \
            else ["{}"] * len(keys)
        return pa.table({
            "__shard": pa.array(shards),
            "key": pa.array(keys, pa.string()),
            "payload": batch.column(bytes_col).cast(pa.binary()),
            "meta": pa.array(meta, pa.string()),
        })

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        marker = f"{path}.done"
        if resume and os.path.exists(marker):
            with open(marker) as f:
                done = json.loads(f.read())
            return pd.DataFrame([{"shard": shard, "path": path,
                                  "n_samples": int(done["n_samples"]),
                                  "tar_md5": done["tar_md5"]}])
        blob = _pack_shard(g["key"].tolist(),
                           [bytes(b) if b is not None else b""
                            for b in g["payload"]],
                           [json.loads(m) for m in g["meta"]])
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        md5 = hashlib.md5(blob).hexdigest()
        with open(marker, "w") as f:
            f.write(json.dumps({"n_samples": len(g), "tar_md5": md5}))
        return pd.DataFrame([{"shard": shard, "path": path,
                              "n_samples": len(g), "tar_md5": md5}])

    return (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pandas")
    )


def read_tar_shards(in_dir: str):
    """Stream samples back from a shard directory: one map task per tar,
    rows (key, payload, meta_json, shard)."""
    import ray.data as rd

    paths = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".tar"))
    if not paths:
        raise FileNotFoundError(f"no .tar shards under {in_dir}")
    src = rd.from_items([{"path": p} for p in paths])

    def parse(batch: pa.Table) -> pa.Table:
        keys, payloads, metas, shards = [], [], [], []
        for path in batch.column("path").to_pylist():
            with open(path, "rb") as f:
                blob = f.read()
            shard = os.path.basename(path)
            samples: dict[str, dict] = {}
            with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                for info in tf.getmembers():
                    base, dot, ext = info.name.rpartition(".")
                    if not dot:
                        continue
                    samples.setdefault(base, {})[ext] = tf.extractfile(
                        info).read()
            for key in sorted(samples):
                parts = samples[key]
                keys.append(key)
                payloads.append(parts.get("bin", b""))
                metas.append(parts.get("json", b"{}").decode("utf-8"))
                shards.append(shard)
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
            "shard": pa.array(shards, pa.string()),
        })

    return src.map_batches(parse, batch_format="pyarrow", batch_size=1)
