"""Unit tests: theta-sketch overlap (accuracy + block-layout invariance)
and BPE encode (vs sequential reference)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _overlap_events(n_a=4000, n_b=4000, n_common=1000):
    """Two keys sharing exactly n_common distinct users."""
    a_users = np.arange(n_a, dtype=np.int64)
    b_users = np.arange(n_a - n_common, n_a - n_common + n_b, dtype=np.int64)
    keys = ["a"] * n_a + ["b"] * n_b
    users = np.r_[a_users, b_users]
    # duplicate some rows: distinctness must be the sketch's job
    keys += ["a"] * 500 + ["b"] * 500
    users = np.r_[users, a_users[:500], b_users[:500]]
    return pa.table({
        "k": pa.array(keys, pa.string()),
        "u": pa.array(users, pa.int64()),
    })


@pytest.mark.parametrize("blocks", [1, 11])
def test_theta_overlap_accuracy_and_invariance(ray_session, blocks):
    import ray

    from prom_tsdb_copyer_ray.stages.sketch import theta_overlap_pairs

    t = _overlap_events()
    out = theta_overlap_pairs(
        ray.data.from_arrow(t).repartition(blocks), "k", "u", k=256,
        round_nd=4,
    ).to_pandas()
    assert len(out) == 1
    est = out["est_overlap"].iloc[0]
    # k=256 → SE ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(est - 1000) / 1000 < 0.25
    # deterministic: same estimate at a different block layout
    out2 = theta_overlap_pairs(
        ray.data.from_arrow(t).repartition(3), "k", "u", k=256, round_nd=4,
    ).to_pandas()
    assert out2["est_overlap"].iloc[0] == est


def test_theta_overlap_exact_when_small(ray_session):
    import ray

    from prom_tsdb_copyer_ray.stages.sketch import theta_overlap_pairs

    # both sets smaller than k → theta = 1.0 → the estimate is EXACT
    t = pa.table({
        "k": pa.array(["x"] * 30 + ["y"] * 40, pa.string()),
        "u": pa.array(list(range(30)) + list(range(20, 60)), pa.int64()),
    })
    out = theta_overlap_pairs(ray.data.from_arrow(t), "k", "u", k=256).to_pandas()
    assert out["est_overlap"].tolist() == [10.0]


def _bpe_ref_counts(texts, merges):
    import re

    word_re = re.compile(r"[A-Za-z]+")
    pairs = [(a, b) for a, b, _ in merges]

    def enc(word):
        symbols = tuple(word)
        for a, b in pairs:
            out, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = tuple(out)
        return len(symbols)

    return [
        sum(enc(w.lower()) for w in word_re.findall(t or "")) for t in texts
    ]


def test_bpe_encode_vs_reference(ray_session):
    import ray

    from prom_tsdb_copyer_ray.stages.textstats import (
        bpe_encode_counts,
        bpe_train,
    )

    texts = [
        "low lower lowest slow slowly",
        "new newer newest news",
        "low low low newer",
        "",
        "xyz",
    ] * 3
    ids = list(range(len(texts)))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    merges = bpe_train(ds, k=6)
    assert len(merges) == 6
    out = (
        bpe_encode_counts(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _bpe_ref_counts(texts, merges)
    assert out["n_bpe"].tolist() == want
    # merges genuinely shorten: fewer subtokens than characters-in-words
    assert out["n_bpe"][0] < sum(len(w) for w in texts[0].split())


def test_audio_loudness_stage(ray_session):
    import hashlib

    import ray

    from prom_tsdb_copyer_ray.stages.multimodal import AudioLoudness, audio_loudness

    media = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["audio", "image"], pa.string()),
        "payload": pa.array([b"abc", b"xyz"], pa.binary()),
        "mime": pa.array(["x", "x"], pa.string()),
        "width": pa.array([None, 640], pa.int32()),
        "height": pa.array([None, 480], pa.int32()),
        "duration_ms": pa.array([1500, 0], pa.int32()),
    })
    out = (
        audio_loudness(ray.data.from_arrow(media), frame_ms=500)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )

    # sequential reference for the audio row: 3 frames of 16 uint16 samples
    def energy(payload, f):
        suffix = b"" if f is None else int(f).to_bytes(4, "little")
        d = hashlib.blake2b(payload + suffix, digest_size=32).digest()
        s = np.frombuffer(d, dtype=np.uint16).astype(np.int64)
        return int((s * s).sum())

    es = [energy(b"abc", f) for f in range(3)]
    assert out.loc[0, "n_frames"] == 3
    assert out.loc[0, "energy_mean"] == sum(es) // 3
    assert out.loc[0, "energy_max"] == max(es)
    # non-audio passthrough: whole-payload energy, 0 frames
    assert out.loc[1, "n_frames"] == 0
    assert out.loc[1, "energy_mean"] == energy(b"xyz", None)
    # real decoder is the declared stub
    with pytest.raises(NotImplementedError):
        AudioLoudness(decoder="real")
