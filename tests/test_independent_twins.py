"""Independently-written twins for the per-row audio kernels whose serial
oracles share code with the engine (round-4 verdict: "same-kernel twin
burn-down").  Each twin here re-derives the kernel's contract from its
docstring / the public algorithm it implements, in a deliberately different
code structure (scalar per-run loops vs the engine's vectorized passes),
and must match BIT-IDENTICALLY — so a semantics bug in the shared kernel
can no longer pass both sides of the oracle unnoticed.

Reference for the declip contract: the cubic Hermite declip baseline (a
clipped peak is locally smooth; the cubic through the boundary neighbours
with one-sided slopes restores the crest) — see
spiderray/functions/audiofp.py declip()."""

import numpy as np
import pytest

from spiderray.functions.audiofp import (
    DECLIP_THRESHOLD,
    declip,
    flat_clip_ppm,
)


# ---------------------------------------------------------------------------
# Independent declip twin: per-run scalar-loop formulation.  The engine
# kernel concatenates every run into one vectorized Hermite pass with a
# sequential fix-up for gap==1 chains; this twin walks the signal run by
# run, left to right, exactly as the contract reads — runs repaired in
# order, each reading whatever the signal holds at that moment.
# ---------------------------------------------------------------------------

def declip_twin(pcm, threshold=DECLIP_THRESHOLD):
    x = np.asarray(pcm, dtype=np.float64).copy()
    n = len(x)
    if n < 4:
        return x, 0, 0
    clipped = np.abs(x) >= threshold
    n_clip = int(clipped.sum())
    if n_clip == 0:
        return x, 0, 0
    # run discovery by plain scan (the engine diffs a mask)
    runs = []
    i = 0
    while i < n:
        if clipped[i]:
            j = i
            while j + 1 < n and clipped[j + 1]:
                j += 1
            runs.append((i, j))
            i = j + 1
        else:
            i += 1
    for s, e in runs:
        if s == 0 and e == n - 1:
            continue  # whole signal clipped: nothing to anchor on
        if s == 0:
            x[:e + 1] = x[e + 1]
            continue
        if e == n - 1:
            x[s:] = x[s - 1]
            continue
        p0, p1 = x[s - 1], x[e + 1]
        m0 = x[s - 1] - x[s - 2] if s >= 2 else 0.0
        m1 = x[e + 2] - x[e + 1] if e + 2 < n else 0.0
        L = e - s + 2
        t = np.arange(1, e - s + 2, dtype=np.float64) / L
        h00 = 2 * t ** 3 - 3 * t ** 2 + 1
        h10 = t ** 3 - 2 * t ** 2 + t
        h01 = -2 * t ** 3 + 3 * t ** 2
        h11 = t ** 3 - t ** 2
        x[s:e + 1] = h00 * p0 + h10 * m0 * L + h01 * p1 + h11 * m1 * L
    peak = float(np.abs(x).max())
    if peak > 1.0:
        x = x / peak
    return x, n_clip, len(runs)


def _declip_cases():
    rng = np.random.RandomState(7)
    cases = []
    # bench-shaped: over-amplified sines at several amps/freqs
    for amp in (1.5, 2.0, 2.5, 3.5, 4.5):
        for f in (220.0, 440.0, 880.0, 1760.0):
            t = np.arange(16000) / 16000.0
            cases.append(np.clip(amp * np.sin(2 * np.pi * f * t), -1, 1))
    # gap==1 chains: rails separated by exactly one unclipped sample —
    # the later run's left slope reads the previous run's REPAIRED tail
    x = np.ones(200)
    x[::7] = 0.5
    cases.append(x.copy())
    x = np.ones(200)
    x[::2] = 0.2
    cases.append(x.copy())
    # edge-clipped starts/ends, whole-array, tiny arrays
    e = np.zeros(100)
    e[:17] = 1.0
    e[-23:] = -1.0
    e[40:45] = 0.999
    cases.append(e)
    cases.append(np.ones(50))
    cases.append(np.ones(4))
    cases.append(np.array([0.1, 1.0, 1.0, 0.2, -1.0, -1.0, -1.0, 0.3]))
    # random clipped noise, including a heavy gap-1 regime
    for i in range(20):
        cases.append(
            np.clip(rng.randn(rng.randint(10, 5000)) * (0.5 + i * 0.15),
                    -1, 1))
    cases.append(np.clip(rng.randn(8000) * 3.0, -1, 1))
    return cases


class TestDeclipTwin:
    def test_bit_identical_on_adversarial_corpus(self):
        for i, c in enumerate(_declip_cases()):
            ref, n_ref, r_ref = declip_twin(c)
            got, n_got, r_got = declip(c)
            assert n_got == n_ref and r_got == r_ref, f"case {i} counts"
            assert np.array_equal(got, ref), (
                f"case {i}: first diff at "
                f"{np.nonzero(got != ref)[0][:5]}")

    def test_flat_rail_removed_on_isolated_crests(self):
        t = np.arange(16000) / 16000.0
        clip = np.clip(2.0 * np.sin(2 * np.pi * 440 * t), -1, 1)
        rep, n, r = declip(clip)
        assert n > 0 and r > 0
        assert flat_clip_ppm(rep) < flat_clip_ppm(clip)

    def test_quantized_bytes_identical(self):
        # the stage pins repaired BYTES via md5; pin the same quantization
        t = np.arange(8000) / 16000.0
        clip = np.clip(3.5 * np.sin(2 * np.pi * 440 * t), -1, 1)
        for fn in (declip, declip_twin):
            rep = fn(clip)[0]
            q = np.clip(np.floor(rep * 32767.0 + 0.5), -32768, 32767)
            b = q.astype("<i2").tobytes()
            assert len(b) == 2 * len(clip)
        a = declip(clip)[0]
        b = declip_twin(clip)[0]
        qa = np.clip(np.floor(a * 32767.0 + 0.5), -32768, 32767)
        qb = np.clip(np.floor(b * 32767.0 + 0.5), -32768, 32767)
        assert qa.astype("<i2").tobytes() == qb.astype("<i2").tobytes()


class TestAdaptivePool:
    def test_scales_up_on_big_sessions(self, monkeypatch):
        from spiderray.stages import perplexity_stage as ps

        class FakeRay:
            @staticmethod
            def cluster_resources():
                return {"CPU": 32.0}

        monkeypatch.setitem(
            __import__("sys").modules, "ray", FakeRay())
        out = ps._adaptive_pool(4)
        assert out == (4, 16)

    def test_clamps_down_on_small_sessions(self, monkeypatch):
        from spiderray.stages import perplexity_stage as ps

        class FakeRay:
            @staticmethod
            def cluster_resources():
                return {"CPU": 4.0}

        monkeypatch.setitem(
            __import__("sys").modules, "ray", FakeRay())
        out = ps._adaptive_pool(4)
        # min stays 1/4 of the session (deadlock note), max half
        assert out == (1, 2)

    def test_explicit_tuple_passes_through(self):
        from spiderray.stages import perplexity_stage as ps

        assert ps._adaptive_pool((3, 7)) == (3, 7)
