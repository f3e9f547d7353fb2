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
