"""Hive-layout value-partitioned sink (sources/hive.py)."""

import json
import os

import pandas as pd
import pytest


def _df():
    return pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "lang": ["en", "zh", "en", "fr"],
                         "n": [5, 6, 7, 8]})


class TestHiveSink:
    def test_roundtrip_and_manifest(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.sources.hive import (read_hive_partitioned,
                                            write_hive_partitioned)

        out = str(tmp_path / "hive")
        m = write_hive_partitioned(rd.from_pandas(_df()), out, ["lang"])
        assert m["n_rows"] == 4
        assert m["partitions"] == {"en": 2, "fr": 1, "zh": 1}
        assert sorted(d for d in os.listdir(out)
                      if d.startswith("lang=")) == \
            ["lang=en", "lang=fr", "lang=zh"]
        back = (read_hive_partitioned(out).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert list(back["lang"]) == ["en", "zh", "en", "fr"]
        assert list(back["n"]) == [5, 6, 7, 8]

    def test_resume_skips_and_stale_cleans(self, ray_session, tmp_path):
        import ray.data as rd

        from spiderray.sources.hive import write_hive_partitioned

        out = str(tmp_path / "hive")
        m1 = write_hive_partitioned(rd.from_pandas(_df()), out, ["lang"])
        # second run with a valid marker: skipped, manifest returned as-is
        m2 = write_hive_partitioned(
            rd.from_pandas(_df().head(1)), out, ["lang"])
        assert m2 == m1
        # kill the marker -> stale dir is cleaned and rewritten
        os.remove(os.path.join(out, "_DONE.json"))
        m3 = write_hive_partitioned(
            rd.from_pandas(_df().head(1)), out, ["lang"])
        assert m3["n_rows"] == 1

    def test_uncommitted_read_refused(self, ray_session, tmp_path):
        from spiderray.sources.hive import (read_hive_partitioned,
                                            write_hive_partitioned)

        with pytest.raises(FileNotFoundError):
            read_hive_partitioned(str(tmp_path))
        import ray.data as rd

        with pytest.raises(ValueError):
            write_hive_partitioned(rd.from_pandas(_df()),
                                   str(tmp_path / "x"), [])
