"""spiderray — a Ray-Data-native language-ID + quality-filter + PII-scrub engine.

Re-expresses the decision semantics of ``suosi-inc/go-pkg-spider`` (charset
identification, language-ID cascade, link-vs-content classification,
density/ratio quality scoring, regex scrubbing) as streaming Ray Data
pipelines over Arrow batches of audio-clip + transcript rows.

Layout:
  functions/  pure deterministic semantics (the spec; shared with the oracle)
  sources/    table readers + deterministic synthetic clip generation
  stages/     ``fn(ds, cfg) -> ds`` Ray Data stage builders (map_batches etc.)
  pipelines/  end-to-end compositions (quality filter, link stats, dedup, ann)
  state/      partition manifests / resume bookkeeping
"""

__version__ = "0.1.0"

from .config import PipelineConfig  # noqa: E402
from .oracle import oracle_row, oracle_rows  # noqa: E402

__all__ = ["PipelineConfig", "oracle_row", "oracle_rows"]

