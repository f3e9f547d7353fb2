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
    max_concurrent: int = 1,
) -> dict:
    """Process every incomplete partition: ``shard_factory(part, n_parts)``
    yields that shard's input Dataset; ``pipeline(ds, cfg)`` decides it.
    Returns a summary {completed, skipped, rows, kept}.

    ``max_concurrent`` > 1 keeps that many partitions in flight from driver
    threads — safe because each partition's commit (temp dir → rename →
    manifest) is independent and atomic, and concurrent Ray Data executions
    share the streaming executor's resource budget.  One failed partition
    doesn't poison the others: every other partition still runs and
    commits, then a RuntimeError lists the failures (their manifests are
    absent, so the next run retries exactly those partitions)."""
    done = completed_partitions(out_dir)
    skipped = len(done)
    todo = [p for p in range(n_parts) if p not in done]

    def process(part: int) -> dict:
        ds = shard_factory(part, n_parts)
        out = pipeline(ds, cfg) if cfg is not None else pipeline(ds)
        return write_partition(out, out_dir, part)

    manifests: list[dict] = []
    if max_concurrent <= 1:
        for part in todo:
            manifests.append(process(part))
    else:
        from concurrent.futures import ThreadPoolExecutor

        # Ray's write path lazily imports fsspec.implementations.http on
        # EVERY write (the failed import is evicted from sys.modules when
        # aiohttp is absent, so it re-runs each time).  Two threads racing
        # that import see a half-initialized module and raise a bare
        # ImportError that Ray's ModuleNotFoundError guard doesn't catch.
        # If the import fails here, register a minimal stub so the name
        # resolves consistently — local-path writes only isinstance-check
        # against it, which is False for real filesystems either way.
        try:
            from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        except Exception:
            import sys
            import types

            stub = types.ModuleType("fsspec.implementations.http")

            class _NoHTTPFileSystem:  # sentinel: isinstance() is never true
                pass

            stub.HTTPFileSystem = _NoHTTPFileSystem
            sys.modules["fsspec.implementations.http"] = stub

        from concurrent.futures import as_completed

        failures: list[tuple[int, str]] = []
        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            futs = {pool.submit(process, part): part for part in todo}
            for fut in as_completed(futs):
                part = futs[fut]
                try:
                    manifests.append(fut.result())
                except Exception as e:  # one partition must not poison the rest
                    failures.append((part, f"{type(e).__name__}: {e}"))
        if failures:
            # every successful partition HAS committed (manifest on disk; a
            # rerun skips them) — surface the failures loudly afterwards
            raise RuntimeError(
                f"{len(failures)} partition(s) failed after "
                f"{len(manifests)} committed: {failures[:5]}"
            )

    return {
        "completed": [m["part"] for m in manifests],
        "skipped": skipped,
        "rows": sum(m["rows"] for m in manifests),
        "kept": sum(m["kept"] for m in manifests),
    }


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    for part in sorted(completed_partitions(out_dir)):
        with open(manifest_path(out_dir, part)) as f:
            out.append(json.load(f))
    return out
