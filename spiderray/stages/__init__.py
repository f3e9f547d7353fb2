"""Ray Data stage builders.

Every stage is ``fn(ds: ray.data.Dataset, cfg: PipelineConfig) -> Dataset``
using ``map_batches(..., batch_format="pyarrow", zero_copy_batch=True)``.
Stateless transforms are plain functions (task-based, elastic); model stages
are callable classes on actor pools (state built once per actor in
``__init__``) per SURVEY.md §2.3.
"""

from .charset_stage import charset_stage
from .keepdrop_stage import decide_stage
from .langid_stage import langid_stage
from .quality_stage import quality_stage
from .scrub_stage import scrub_stage

__all__ = [
    "charset_stage",
    "langid_stage",
    "quality_stage",
    "decide_stage",
    "scrub_stage",
]
