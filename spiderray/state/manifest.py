"""Resumable partitioned output with per-partition lineage manifests
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §4.2 last rows).

Layout:
    out_dir/
      part=00000/ *.parquet          # one directory per hash partition
      manifest_00000.json            # written AFTER the partition dir is
                                     # complete (rename-promoted) → its
                                     # existence IS the commit record

A run processes partitions one wave at a time (the crawler's BFS-wave
structure, /root/reference/spider_news.go:140-149, surviving as the
checkpoint loop): for each incomplete partition, run the pipeline on that
shard only, write to a temp dir, atomically rename, then write the manifest
(row counts, kept/dropped, lang histogram, wall time).  A rerun scans
manifests and skips completed partitions.  On a cluster, multiple partitions
can be in flight at once; the manifest protocol is unchanged because each
partition commits independently.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib


def partition_of(clip_id: str, n_parts: int) -> int:
    """Stable hash partition (crc32 — same value on every worker/run)."""
    return zlib.crc32(clip_id.encode("utf-8")) % n_parts


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"manifest_{part:05d}.json")


def part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("manifest_") and name.endswith(".json"):
            try:
                done.add(int(name[len("manifest_") : -len(".json")]))
            except ValueError:
                continue
    return done


def write_partition(ds, out_dir: str, part: int, extra_meta: dict | None = None) -> dict:
    """Write one partition's decided rows + its manifest atomically:
    temp dir → rename → manifest.  ``ds`` must already be filtered to the
    partition's rows (pipeline output schema with keep/drop_reason/lang)."""
    t0 = time.perf_counter()
    final_dir = part_dir(out_dir, part)
    tmp_dir = final_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(tmp_dir)

    # lineage counters from the written files (label columns only — cheap)
    import pyarrow.dataset as pads

    written = pads.dataset(tmp_dir, format="parquet")
    tbl = written.to_table(columns=["keep", "drop_reason", "lang"])
    n = len(tbl)
    kept = int(sum(1 for v in tbl.column("keep").to_pylist() if v))
    lang_hist: dict[str, int] = {}
    for v in tbl.column("lang").to_pylist():
        lang_hist[v or ""] = lang_hist.get(v or "", 0) + 1
    reason_hist: dict[str, int] = {}
    for v in tbl.column("drop_reason").to_pylist():
        if v:
            reason_hist[v] = reason_hist.get(v, 0) + 1

    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)

    manifest = {
        "part": part,
        "rows": n,
        "kept": kept,
        "dropped": n - kept,
        "lang_hist": lang_hist,
        "drop_reason_hist": reason_hist,
        "wall_sec": round(time.perf_counter() - t0, 3),
        **(extra_meta or {}),
    }
    tmp_manifest = manifest_path(out_dir, part) + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_manifest, manifest_path(out_dir, part))
    return manifest


def run_resumable(
    shard_factory,
    pipeline,
    out_dir: str,
    n_parts: int,
    cfg=None,
) -> dict:
    """Process every incomplete partition: ``shard_factory(part, n_parts)``
    yields that shard's input Dataset; ``pipeline(ds, cfg)`` decides it.
    Returns a summary {completed, skipped, rows, kept}."""
    done = completed_partitions(out_dir)
    skipped = len(done)
    totals = {"rows": 0, "kept": 0}
    completed = []
    for part in range(n_parts):
        if part in done:
            continue
        ds = shard_factory(part, n_parts)
        out = pipeline(ds, cfg) if cfg is not None else pipeline(ds)
        m = write_partition(out, out_dir, part)
        totals["rows"] += m["rows"]
        totals["kept"] += m["kept"]
        completed.append(part)
    return {
        "completed": completed,
        "skipped": skipped,
        "rows": totals["rows"],
        "kept": totals["kept"],
    }


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    for part in sorted(completed_partitions(out_dir)):
        with open(manifest_path(out_dir, part)) as f:
            out.append(json.load(f))
    return out
