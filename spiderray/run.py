"""CLI entry: resumable quality-filter run — the ``ray job submit`` payload.

Local (this sandbox):

    python -m spiderray.run --input synth:100000 --output /tmp/out \
        --partitions 16 [--resume] [--num-cpus 32]

Cluster (the north rule's fixed-size N / 4N submission):

    ray job submit --working-dir . -- \
        python -m spiderray.run --address auto \
            --input /data/clips.lance --output s3://bucket/run1 \
            --partitions 4096 --wide-rows

``--input`` forms:
    synth:N            deterministic synthetic clip corpus of N rows
    docs:SF_DIR        clips derived from SF_DIR/documents.parquet
    path/to/table      parquet (or lance, when available) clips table

``--address auto`` (or the RAY_ADDRESS env var the job server sets)
attaches to the submitting cluster instead of starting a local session;
``--num-cpus`` is ignored on attach — the cluster's size is the cluster's.
Partition count should be ≥ 4× total cluster cores so the resumable
manifest granularity (state/manifest.py: one directory + manifest per
partition, finished partitions skipped on resume) stays finer than the
failure domain.  MULTINODE.md documents every knob that changes
off-sandbox.  Locally this module owns its Ray session (guarded — the
driver/test fixture own theirs).
"""

from __future__ import annotations

import argparse
import json
import sys

def _shard_factory(input_spec: str):
    from .sources import clips as clipsrc
    from .state.manifest import partition_of

    if input_spec.startswith("synth:"):
        n = int(input_spec.split(":", 1)[1])

        def factory(part: int, n_parts: int):
            import pyarrow as pa

            ds = clipsrc.synth_clips_dataset(n)

            def shard(batch: pa.Table) -> pa.Table:
                ids = batch.column("clip_id").to_pylist()
                mask = [partition_of(i, n_parts) == part for i in ids]
                return batch.filter(pa.array(mask))

            return ds.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)

        return factory

    if input_spec.startswith("docs:"):
        sf_dir = input_spec.split(":", 1)[1]

        def factory(part: int, n_parts: int):
            import pyarrow as pa

            ds = clipsrc.clips_from_documents(sf_dir)

            def shard(batch: pa.Table) -> pa.Table:
                ids = batch.column("clip_id").to_pylist()
                mask = [partition_of(i, n_parts) == part for i in ids]
                return batch.filter(pa.array(mask))

            return ds.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)

        return factory

    def factory(part: int, n_parts: int):
        import pyarrow as pa

        ds = clipsrc.read_clips(input_spec)

        def shard(batch: pa.Table) -> pa.Table:
            ids = batch.column("clip_id").to_pylist()
            mask = [partition_of(i, n_parts) == part for i in ids]
            return batch.filter(pa.array(mask))

        return ds.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)

    return factory


def resolve_address(flag: str | None) -> str:
    """--address > RAY_ADDRESS env > 'local' — the attach rule a real
    `ray job submit` run takes (factored out so the smoke test exercises
    THIS code, not a mirror of it)."""
    import os

    return flag or os.environ.get("RAY_ADDRESS") or "local"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spiderray.run")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions with existing manifests (default on; kept for explicitness)")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--address", default=None,
                    help="Ray address: omitted -> RAY_ADDRESS env or 'local';"
                         " 'auto' attaches to the cluster under ray job"
                         " submit (num-cpus ignored on attach)")
    ap.add_argument("--wide-rows", action="store_true",
                    help="raise target_max_block_size for multi-hundred-KB"
                         " audio rows (see MULTINODE.md)")
    args = ap.parse_args(argv)

    import ray

    address = resolve_address(args.address)
    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = dict(address=address, include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if address == "local":
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from .config import configure_context

    configure_context(wide_rows=args.wide_rows)

    from .config import PipelineConfig
    from .pipelines.quality_filter import quality_filter
    from .state.manifest import run_resumable

    cfg = PipelineConfig()
    summary = run_resumable(
        _shard_factory(args.input), quality_filter, args.output, args.partitions, cfg
    )
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
