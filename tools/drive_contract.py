"""Replicate the grading driver: run queries() vs oracle_sql() with the
dtype-sensitive value hash (sort columns, sort rows, md5 over per-column
dtype + hash_pandas_object).  Usage:

    python tools/drive_contract.py [first_n] [sf_dir]

first_n limits to the first N QUERIES entries (the driver samples 50);
sf_dir defaults to /root/testdata/sf0.01.  NOTE: driving regenerates
fixtures/*.parquet at sf_dir scale — run `git checkout -- fixtures/`
after a non-sf0.01 drive (see .claude/skills/verify/SKILL.md).
"""
import importlib.util
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
import pyarrow as pa
import ray

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

queries = mod.queries()
oracle = mod.oracle_sql()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def vhash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.md5()
    for c in df.columns:
        h.update(str(df[c].dtype).encode())
        h.update(pd.util.hash_pandas_object(df[c], index=False).values.tobytes())
    return h.hexdigest()


if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    # explicit query names: drive just these (targeted per-commit verify)
    names = sys.argv[1].split(",")
    unknown = [n for n in names if n not in oracle]
    if unknown:
        # a typo must not yield "0/0 green" exit 0 — fail loudly
        print(f"ERROR: not in oracle_sql(): {unknown}")
        ray.shutdown()
        sys.exit(2)
else:
    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9
    names = [n for n in list(queries)[:first_n] if n in oracle]
fail = 0
for name in names:
    try:
        res = queries[name](SF)
        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
        elif isinstance(res, pa.Table):
            res = res.to_pandas()
        ora = con.execute(oracle[name]).fetchdf()
        r, o = canon(res), canon(ora)
        ok_rows = len(r) == len(o)
        ok_schema = list(r.columns) == list(o.columns)
        ok_hash = ok_rows and ok_schema and vhash(r) == vhash(o)
        status = "PASS" if ok_hash else "FAIL"
        if not ok_hash:
            fail += 1
            print(f"{status} {name} rows={len(r)}/{len(o)} schema={ok_schema}")
            if ok_rows and ok_schema and len(r):
                for c in r.columns:
                    if str(r[c].dtype) != str(o[c].dtype):
                        print(f"   dtype {c}: {r[c].dtype} vs {o[c].dtype}")
                    elif not r[c].equals(o[c]):
                        print(f"   values differ in {c}")
        else:
            print(f"{status} {name}")
    except Exception as e:
        fail += 1
        print(f"ERR  {name}: {type(e).__name__}: {str(e)[:150]}")

print(f"== {len(names) - fail}/{len(names)} green ==")
ray.shutdown()
