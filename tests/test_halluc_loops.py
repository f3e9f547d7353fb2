"""ASR hallucination-loop gate (functions/halluc.loop_stats)."""

from spiderray.functions.halluc import (
    LOOP_MAX_WORDS,
    loop_stats,
    loop_stats_batch,
)

BASE = "the committee met this morning to discuss the proposed transit changes"


def test_phrase_loop_detected():
    s = loop_stats(BASE + " " + " ".join(["thanks", "for", "watching"] * 8))
    assert s["halluc"]
    assert s["loop_period"] == 3
    assert s["loop_len"] == 24


def test_single_word_loop_detected():
    s = loop_stats(BASE + " yes" * 12)
    assert s["halluc"] and s["loop_period"] == 1 and s["loop_len"] == 12


def test_clean_text_not_flagged():
    s = loop_stats(BASE)
    assert not s["halluc"] and s["loop_len"] == 0 and s["loop_ratio"] == 0.0


def test_three_repeats_below_min_not_flagged():
    # 3 cycles of a 2-word phrase = 6 words: passes the >=3-cycle tail
    # measurement but stays under LOOP_MIN_REPEATS=4 / LOOP_MIN_WORDS=8
    s = loop_stats(BASE + " " + " ".join(["ok", "then"] * 3))
    assert s["loop_period"] == 2 and s["loop_len"] == 6
    assert not s["halluc"]


def test_loop_must_reach_the_tail():
    # a loop followed by clean text is not a terminal collapse
    s = loop_stats(" ".join(["yes"] * 12) + " " + BASE)
    assert not s["halluc"]


def test_short_and_empty_inputs():
    assert loop_stats("")["n_words"] == 0
    assert not loop_stats(None)["halluc"]
    assert not loop_stats("yes yes yes")["halluc"]  # n<6 short-circuit


def test_word_cap_keeps_the_tail():
    long_head = "word " * (LOOP_MAX_WORDS * 2)
    s = loop_stats(long_head + " ".join(["stop", "now"] * 10))
    # head cap must not hide the tail loop … but 'word' itself repeats;
    # the detector reports the LONGEST periodic suffix which ends at the
    # true tail, so the flag still fires
    assert s["halluc"]
    assert s["n_words"] == LOOP_MAX_WORDS


def test_dup3_ratio_monotone():
    rep = loop_stats("spam ham eggs " * 20)["dup3_ratio"]
    clean = loop_stats(BASE)["dup3_ratio"]
    assert rep > 0.9 > clean


def test_batch_wrapper_schema():
    import pyarrow as pa

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([BASE, BASE + " yes" * 12]),
    })
    out = loop_stats_batch(t)
    assert out.column("halluc").to_pylist() == [False, True]
    assert out.column("loop_ratio_milli").type == pa.int64()
