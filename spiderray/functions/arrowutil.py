"""Shared Arrow utilities."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pa_from_pandas(df: pd.DataFrame) -> pa.Table:
    """from_pandas with the pandas schema metadata stripped: the metadata
    dict makes pa.Schema unhashable, which defeats Ray's early-exit schema
    dedup on every block unify (and spams 'Failed to hash the schemas'
    warnings from shuffle aggregators).  Load-bearing perf canonicalization
    — every batch-fn that emits a pandas-derived table must use THIS."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
