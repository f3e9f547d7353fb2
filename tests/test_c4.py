"""Intra-document line dedup (stages/c4.line_dedup_within_doc)."""

class TestLineDedupWithinDoc:
    def test_first_occurrence_kept_empty_preserved(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.c4 import line_dedup_within_doc

        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a\nb\na\n\nb\n\nc", "x", None],
        })
        out = (line_dedup_within_doc(rd.from_pandas(df))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out["text"]) == ["a\nb\n\n\nc", "x", None]
        assert list(out["n_lines"]) == [7, 1, 0]
        assert list(out["n_dropped"]) == [2, 0, 0]

    def test_no_cross_doc_effect(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from spiderray.stages.c4 import line_dedup_within_doc

        # the same line in two docs survives in BOTH (intra-doc rule,
        # unlike paragraph_dedup's global first-occurrence)
        df = pd.DataFrame({"doc_id": [1, 2],
                           "text": ["shared", "shared"]})
        out = line_dedup_within_doc(rd.from_pandas(df)).to_pandas()
        assert list(out["text"]) == ["shared", "shared"]
        assert list(out["n_dropped"]) == [0, 0]


class TestBoilerplateStrip:
    def test_frequency_thresholds(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.c4 import boilerplate_strip

        rows = []
        for i in range(20):
            lines = ["NAV menu", f"body text {i}"]
            if i % 2 == 0:
                lines.insert(1, "PROMO half")
            if i == 3:
                lines.append("RARE once")
            rows.append((i, "siteA", "\n".join(lines) + "\nFOOTER"))
        # a tiny source below min_docs keeps everything
        rows.append((100, "tiny", "NAV menu\nonly doc"))
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
        out = (boilerplate_strip(rd.from_arrow(t))
               .to_pandas().set_index("doc_id"))
        # 100% and 50% lines stripped; unique body and 5% line kept
        assert "NAV menu" not in out.loc[0].text
        assert "PROMO half" not in out.loc[0].text
        assert "FOOTER" not in out.loc[0].text
        assert out.loc[0].text == "body text 0"
        assert out.loc[3].text == "body text 3\nRARE once"
        assert out.loc[0].n_stripped == 3 and out.loc[1].n_stripped == 2
        # min_docs exemption: the single-doc source is untouched
        assert out.loc[100].text == "NAV menu\nonly doc"
        assert out.loc[100].n_stripped == 0

    def test_empty_lines_survive_and_partition_invariant(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from spiderray.stages.c4 import boilerplate_strip

        rows = [(i, "s", f"HEAD\n\nbody {i}\n\nTAIL") for i in range(12)]
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
        outs = []
        for blocks in (1, 5):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(boilerplate_strip(ds).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        assert outs[0].equals(outs[1])
        assert outs[0].text.iloc[0] == "\nbody 0\n"  # blanks kept
        assert outs[0].n_stripped.iloc[0] == 2
