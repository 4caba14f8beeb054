"""Acoustic fingerprint dedup (audio_fingerprint_dedup).

The DuckDB oracle pins fingerprints against an independent pure-Python
loop recompute plus an independent dedup formulation; these tests pin
the planted-group semantics, the amplitude-invariance claim, and the
short-clip guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from query_cost_feature_engineering_spark.codecs import encode_wav_pcm16
from query_cost_feature_engineering_spark.functions.multimodal import (
    FP_WIN,
    audio_fingerprint_pandas,
)
from query_cost_feature_engineering_spark.sources.media import (
    generate_audio_dedup_pandas,
)


def _fp(pcm: np.ndarray) -> tuple[int, int]:
    out = audio_fingerprint_pandas(
        pd.Series([encode_wav_pcm16(pcm.astype(np.int16), 16000)])
    )
    return int(out["fingerprint"][0]), int(out["n_frames"][0])


def test_amplitude_doubling_is_invariant():
    rng = np.random.default_rng(11)
    pcm = np.clip(rng.standard_normal(20000) * 2500, -8000, 8000).astype(
        np.int16
    )
    f1, _ = _fp(pcm)
    f2, _ = _fp((pcm.astype(np.int32) * 2).astype(np.int16))
    assert f1 == f2 != 0


def test_different_content_differs():
    rng = np.random.default_rng(12)
    a = (rng.standard_normal(20000) * 2500).astype(np.int16)
    b = (rng.standard_normal(20000) * 2500).astype(np.int16)
    assert _fp(a)[0] != _fp(b)[0]


def test_short_clip_guard():
    pcm = np.arange(FP_WIN - 1, dtype=np.int16)
    fp, nf = _fp(pcm)
    assert fp == 0 and nf == 0


def test_planted_groups_collapse():
    pdf = generate_audio_dedup_pandas(32, 59)
    fp = audio_fingerprint_pandas(pdf["bytes"])["fingerprint"]
    by_id = dict(zip(pdf["clip_id"], fp))
    for _, r in pdf.iterrows():
        if r["dup_of"] is not None:
            assert by_id[r["clip_id"]] == by_id[r["dup_of"]]


def test_query_dedup_verdicts(spark):
    from query_cost_feature_engineering_spark.queries import (
        audio_fingerprint_dedup,
    )

    rows = audio_fingerprint_dedup(spark, "unused").collect()
    assert len(rows) == 96
    canon = {r.clip_id: r.canonical_id for r in rows}
    for r in rows:
        if r.dup_of is not None:
            # a planted duplicate lands in its original's cluster
            assert canon[r.clip_id] == canon[r.dup_of]
            assert r.is_dup  # dup ids sort after their base id


def test_neardup_pairs_recover_planted_and_only_planted(spark):
    from query_cost_feature_engineering_spark.queries import (
        audio_neardup_pairs,
    )
    from query_cost_feature_engineering_spark.sources.media import (
        generate_audio_neardup_pandas,
    )

    rows = audio_neardup_pairs(spark, "unused").collect()
    pdf = generate_audio_neardup_pandas(30, 62)
    planted = {
        (r["near_of"], r["clip_id"])
        for _, r in pdf.iterrows()
        if r["near_of"] is not None
    }
    got = {(r.clip_a, r.clip_b) for r in rows}
    assert got == planted  # all 30 pairs, nothing spurious
    for r in rows:
        assert r.is_planted and 0 <= r.hamming <= 12


def test_noised_copy_is_near_not_exact():
    import numpy as np

    from query_cost_feature_engineering_spark.functions.multimodal import (
        audio_fingerprint_pandas,
    )
    from query_cost_feature_engineering_spark.sources.media import (
        generate_audio_neardup_pandas,
    )

    pdf = generate_audio_neardup_pandas(6, 62)
    fp = audio_fingerprint_pandas(pdf["bytes"])["fingerprint"]
    by_id = dict(zip(pdf["clip_id"], fp))
    diffs = [
        int(by_id[r["clip_id"]]) != int(by_id[r["near_of"]])
        for _, r in pdf.iterrows()
        if r["near_of"] is not None
    ]
    # exact dedup would MISS most of these (a light-noise pair can
    # land at hamming 0 — then exact dedup catches it too, fine)
    assert sum(diffs) >= len(diffs) - 1 and any(diffs)
