"""CLI entry: resumable quality-filter run.

    python -m spiderray.run --input synth:100000 --output /tmp/out \
        --partitions 16 [--resume] [--num-cpus 32]

``--input`` forms:
    synth:N            deterministic synthetic clip corpus of N rows
    docs:SF_DIR        clips derived from SF_DIR/documents.parquet
    path/to/table      parquet (or lance, when available) clips table

On a cluster this module is the ``ray job submit`` payload; locally it owns
its Ray session (guarded — the driver/test fixture own theirs).
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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="spiderray.run")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions with existing manifests (default on; kept for explicitness)")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .config import configure_context

    configure_context()

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
