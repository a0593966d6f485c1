"""Tests: dead-letter quarantine split and schema-evolution union read."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_quarantine_split_side_channel(ray_session, tmp_path):
    import ray

    from prom_tsdb_copyer_ray.stages.curation import quarantine_split

    t = pa.table({
        "id": pa.array(list(range(10)), pa.int64()),
        "v": pa.array([1.0, 500.0, 2.0, 600.0, 3.0, 4.0, 5.0, 700.0, 6.0, 7.0]),
    })
    qdir = str(tmp_path / "dead")
    rules = [
        ("too_big", lambda b: b["v"].to_numpy(zero_copy_only=False) >= 500.0),
        ("odd_id", lambda b: b["id"].to_numpy(zero_copy_only=False) % 2 == 1),
    ]
    out = (
        quarantine_split(ray.data.from_arrow(t).repartition(3), rules, qdir)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # first-failing-rule wins: ids 1,3,7 are both big AND odd -> too_big
    want = ["", "too_big", "", "too_big", "", "odd_id", "", "too_big", "",
            "odd_id"]
    assert out["_quarantine_reason"].tolist() == want
    # side channel holds exactly the tagged rows
    parts = [os.path.join(qdir, f) for f in os.listdir(qdir)]
    dead = pa.concat_tables([pq.read_table(p) for p in parts]).to_pandas()
    assert sorted(dead["id"].tolist()) == [1, 3, 5, 7, 9]


def test_union_schema_read_and_conflict(ray_session, tmp_path):
    import ray

    from prom_tsdb_copyer_ray.sources.parquet import (
        read_union_schemas,
        union_schema,
    )

    f1 = str(tmp_path / "f1.parquet")
    f2 = str(tmp_path / "f2.parquet")
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])}),
        f1,
    )
    pq.write_table(
        pa.table({"b": pa.array(["z"]), "c": pa.array([9.5], pa.float64())}),
        f2,
    )
    sch = union_schema([f1, f2])
    assert sch.names == ["a", "b", "c"]

    df = (
        read_union_schemas([f1, f2])
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    assert df["a"].tolist()[:2] == [1, 2] and np.isnan(df["a"][2])
    assert np.isnan(df["c"][0]) and df["c"][2] == 9.5

    # column projection through the union schema
    dfb = read_union_schemas([f1, f2], columns=["b", "c"]).to_pandas()
    assert sorted(dfb.columns) == ["b", "c"]
    assert len(dfb) == 3

    # incompatible same-name types raise instead of silently coercing
    f3 = str(tmp_path / "f3.parquet")
    pq.write_table(pa.table({"a": pa.array([b"\x00"], pa.binary())}), f3)
    with pytest.raises(ValueError, match="schema conflict"):
        union_schema([f1, f3])
