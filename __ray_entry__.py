"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship quality-filter pipeline over clips derived from
/root/testdata/sf0.001; ``queries()``/``oracle_sql()`` expose the operator
inventory of SURVEY.md §2 with DuckDB oracles where SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from spiderray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-derived clips →
    charset → langid → quality metrics → keep/drop → scrub."""
    from spiderray.pipelines.queries import q_clips_flagship

    return q_clips_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
