"""Ordered-funnel and cohort-retention analytics (stages/windows.py):
hand-crafted order semantics and partition invariance."""

import pandas as pd
import pyarrow as pa

from spiderray.stages.windows import funnel_counts, retention_cohorts


def _events(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([pd.Timestamp(r[2]) for r in rows],
                       pa.timestamp("us")),
    })


class TestFunnel:
    def test_order_matters(self, ray_session):
        import ray.data as rd

        t = _events([
            # u1 converts fully in order
            (1, "view", "2024-01-01 10:00"),
            (1, "click", "2024-01-01 10:05"),
            (1, "purchase", "2024-01-01 10:10"),
            # u2: purchase BEFORE click -> reaches only stage 2
            (2, "view", "2024-01-02 09:00"),
            (2, "purchase", "2024-01-02 09:01"),
            (2, "click", "2024-01-02 09:02"),
            # u3: click but never viewed -> reaches stage 0
            (3, "click", "2024-01-03 08:00"),
            # u4: view only
            (4, "view", "2024-01-04 07:00"),
        ])
        out = funnel_counts(rd.from_arrow(t), ["view", "click", "purchase"])
        assert out.users.tolist() == [3, 2, 1]
        assert out.stage.tolist() == [
            "view", "view > click", "view > click > purchase"]

    def test_second_chance_event_counts(self, ray_session):
        import ray.data as rd

        # u1's first purchase precedes the click, but a LATER purchase
        # still converts (earliest-qualifying semantics)
        t = _events([
            (1, "view", "2024-01-01 10:00"),
            (1, "purchase", "2024-01-01 10:01"),
            (1, "click", "2024-01-01 10:02"),
            (1, "purchase", "2024-01-01 10:03"),
        ])
        out = funnel_counts(rd.from_arrow(t), ["view", "click", "purchase"])
        assert out.users.tolist() == [1, 1, 1]

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        rows = []
        for u in range(30):
            rows.append((u, "view", f"2024-01-{u % 28 + 1:02d} 08:00"))
            if u % 2 == 0:
                rows.append((u, "click", f"2024-01-{u % 28 + 1:02d} 09:00"))
            if u % 4 == 0:
                rows.append((u, "purchase",
                             f"2024-01-{u % 28 + 1:02d} 10:00"))
        t = _events(rows)
        outs = []
        for blocks in (1, 8):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(funnel_counts(ds, ["view", "click", "purchase"]))
        assert outs[0].equals(outs[1])
        assert outs[0].users.tolist() == [30, 15, 8]


class TestRetention:
    def test_hand_computed_matrix(self, ray_session):
        import ray.data as rd

        t = _events([
            (1, "view", "2024-01-01 10:00"),
            (1, "click", "2024-01-01 23:59"),   # same day, one row
            (1, "view", "2024-01-03 08:00"),    # offset 2
            (2, "view", "2024-01-01 12:00"),
            (2, "view", "2024-01-02 12:00"),    # offset 1
            (3, "view", "2024-01-02 01:00"),    # cohort of the 2nd
        ])
        out = retention_cohorts(rd.from_arrow(t))
        got = list(map(tuple, out.values.tolist()))
        assert got == [
            ("2024-01-01", 0, 2),
            ("2024-01-01", 1, 1),
            ("2024-01-01", 2, 1),
            ("2024-01-02", 0, 1),
        ]

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        rows = [(u, "view", f"2024-01-{(u % 5) + d + 1:02d} 06:00")
                for u in range(40) for d in range(0, u % 4 + 1)]
        t = _events(rows)
        outs = []
        for blocks in (1, 7):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(retention_cohorts(ds))
        assert outs[0].equals(outs[1])


class TestTransitions:
    def test_hand_computed_with_tie(self, ray_session):
        import ray.data as rd

        from spiderray.stages.windows import event_transitions

        t = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(
                ["view", "click", "view", "view", "error", "view"],
                pa.string()),
            # events 4 and 5 share a timestamp: event_id breaks the tie
            "ts": pa.array([pd.Timestamp(x) for x in [
                "2024-01-01 10:00", "2024-01-01 10:01", "2024-01-01 10:02",
                "2024-01-02 09:00", "2024-01-02 09:00",
                "2024-01-03 08:00"]], pa.timestamp("us")),
        })
        out = event_transitions(rd.from_arrow(t))
        got = list(map(tuple, out.values.tolist()))
        assert got == [("click", "view", 1), ("view", "click", 1),
                       ("view", "error", 1)]

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from spiderray.stages.windows import event_transitions

        types = ["view", "click", "purchase", "error"]
        rows = [(i, i % 9, types[(i * 7) % 4],
                 pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i))
                for i in range(200)]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        })
        outs = []
        for blocks in (1, 8):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(event_transitions(ds))
        assert outs[0].equals(outs[1])
        # every event except each user's last contributes one transition
        assert outs[0].n.sum() == 200 - 9


class TestConversionLatency:
    def test_hand_computed(self, ray_session):
        import os
        import sys

        sys.path.insert(0, "/root/repo")
        import tempfile

        from spiderray.pipelines.queries import q_conversion_latency

        # write a tiny events parquet and point the query at it
        t = _events([
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:01:00"),
            (1, "purchase", "2024-01-01 10:02:30"),   # 150 s
            (2, "view", "2024-01-02 09:00:00"),
            (2, "click", "2024-01-02 09:00:10"),
            (2, "purchase", "2024-01-02 09:00:11"),   # 11 s
            (3, "view", "2024-01-03 08:00:00"),       # never converts
        ])
        import pyarrow.parquet as pq

        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                t.append_column("event_id",
                                pa.array(range(len(t)), pa.int64())),
                os.path.join(d, "events.parquet"))
            out = q_conversion_latency(d)
        assert out.n_converted.tolist() == [2]
        assert out.min_s.tolist() == [11]
        assert out.max_s.tolist() == [150]
        # round-half-up mean of (150, 11) = 81 (80.5 rounds up)
        assert out.avg_s.tolist() == [81]


class TestRateSpikes:
    def test_planted_burst_flagged(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import rate_spike_card

        rows = []
        # baseline: 2 clicks per hour over 9 hours; hour 5 bursts to 20
        for h in range(9):
            k = 20 if h == 5 else 2
            for j in range(k):
                rows.append((1, "click", f"2024-01-01 {h:02d}:{j % 60:02d}"))
        # a steady type never flags
        for h in range(9):
            rows.append((2, "view", f"2024-01-01 {h:02d}:30"))
        t = _events([(r[0], r[1], r[2]) for r in rows])
        out = rate_spike_card(rd.from_arrow(t))
        clicks = out[out.event_type == "click"]
        assert clicks.is_spike.sum() == 1
        assert clicks[clicks.is_spike].hour_b.iloc[0] == "2024-01-01 05:00:00"
        assert not out[out.event_type == "view"].is_spike.any()

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from spiderray.stages.stats import rate_spike_card

        rows = [(u % 3, "view",
                 f"2024-01-{(u % 9) + 1:02d} {u % 24:02d}:00")
                for u in range(300)]
        t = _events(rows)
        outs = []
        for blocks in (1, 8):
            ds = rd.from_arrow(t).repartition(blocks)
            outs.append(rate_spike_card(ds))
        assert outs[0].equals(outs[1])
