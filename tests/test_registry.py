"""Registry-level invariants: every driver query is oracle-covered,
the registry honors the 50-row driver cap, and the multimodal oracle's
arithmetic restatement matches the actual fake-codec byte functions.

No SparkSession needed — these are pure-Python contract pins.
"""

from __future__ import annotations

from gluestick_ts_spark.operators.multimodal import _fake_frames, _fake_resize
from gluestick_ts_spark.plans.queries import (
    ORACLES,
    QUERIES,
    _mm_synth_payload,
)


def test_registry_within_driver_cap():
    assert len(QUERIES) <= 50


def test_every_query_has_an_oracle():
    """Since r9 the oracle map is TOTAL: no rows-only residue. A new
    query without an oracle_sql entry must consciously delete this
    test, not silently weaken the correctness gate."""
    missing = sorted(set(QUERIES) - set(ORACLES))
    assert missing == []
    stale = sorted(set(ORACLES) - set(QUERIES))
    assert stale == []


def test_mm_synth_payload_deterministic_and_format_cycled():
    from gluestick_ts_spark.operators.media_codecs import sniff_format

    for i in range(12):
        p1, p2 = _mm_synth_payload(i), _mm_synth_payload(i)
        assert p1 == p2
        assert sniff_format(p1) == {0: "bmp", 1: "wav", 2: "png"}[i % 3]


def test_frame_oracle_arithmetic_matches_fake_codecs():
    """The multimodal_frame_pipeline oracle restates the fake resize +
    frame sampler as integer arithmetic over the input byte length;
    brute-force equality against the real byte functions for every
    length up to well past the 64-byte resize cap."""
    for n in range(1, 400):
        payload = bytes(range(256))[:1] * n
        resized = _fake_resize(payload, 16, 4)
        step = max(1, n // 64)
        rn = min(64, (n + step - 1) // step)
        assert len(resized) == rn, n
        frames = _fake_frames(resized, 3)
        fsize = max(1, rn // 3)
        expect = [
            min(fsize, rn - i * fsize) for i in range(min(3, rn))
        ]
        assert [len(f) for f in frames] == expect, n
