"""Pushdown Parquet source tests (sources/parquet.py): file pruning from
footer stats, exact row-level pushdown, metadata-only range discovery."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from prom_tsdb_copyer_ray.functions.matchers import Matcher
from prom_tsdb_copyer_ray.sources.parquet import (
    file_time_stats,
    prune_files_by_time,
    pushdown_split,
    range_from_metadata,
    read_pruned,
)

DAY = 24 * 3600 * 1000
BASE = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _mk_day_file(path: str, day: int, n: int = 200, unit: str = "us", stats: bool = True):
    ts = BASE + day * DAY + np.linspace(0, DAY - 1000, n).astype(np.int64)
    k = {"ms": 1, "us": 1000, "ns": 1_000_000}[unit]
    t = pa.table(
        {
            "ts": pa.array(ts * k, pa.timestamp(unit)),
            "event_type": pa.array(["click" if i % 2 else "view" for i in range(n)]),
            "value": pa.array(np.arange(n, dtype=np.float64)),
        }
    )
    pq.write_table(t, path, row_group_size=50, write_statistics=stats)
    return t


@pytest.fixture(scope="module")
def day_lake(tmp_path_factory):
    d = tmp_path_factory.mktemp("lake")
    tables = {}
    for day in range(3):
        tables[day] = _mk_day_file(str(d / f"day{day}.parquet"), day)
    return str(d), tables


def test_file_time_stats_exact(day_lake):
    d, tables = day_lake
    lo, hi, n = file_time_stats(os.path.join(d, "day1.parquet"), "ts")
    ts = tables[1]["ts"].cast(pa.int64()).to_numpy() // 1000
    assert (lo, hi, n) == (int(ts.min()), int(ts.max()), 200)


def test_prune_files_by_time(day_lake):
    d, _ = day_lake
    kept, total = prune_files_by_time(d, "ts", BASE + DAY, BASE + 2 * DAY - 1)
    assert total == 3
    assert [os.path.basename(f) for f in kept] == ["day1.parquet"]
    # open range keeps everything
    kept, _ = prune_files_by_time(d, "ts", None, None)
    assert len(kept) == 3


def test_prune_keeps_statless_files(tmp_path):
    p = str(tmp_path / "nostats.parquet")
    _mk_day_file(p, 0, stats=False)
    kept, _ = prune_files_by_time(str(tmp_path), "ts", BASE + 10 * DAY, None)
    assert kept == [p]  # cannot prune without stats
    assert range_from_metadata(str(tmp_path), "ts") is None  # fallback signal


def test_range_from_metadata_matches_scan(day_lake):
    d, tables = day_lake
    lo, hi, n = range_from_metadata(d, "ts")
    allts = pa.concat_tables(tables.values())["ts"].cast(pa.int64()).to_numpy() // 1000
    assert (lo, hi, n) == (int(allts.min()), int(allts.max()), 600)


def test_range_from_metadata_real_testdata():
    meta = range_from_metadata("/root/testdata/sf0.001/events.parquet", "ts")
    assert meta is not None
    lo, hi, n = meta
    t = pq.read_table("/root/testdata/sf0.001/events.parquet", columns=["ts"])
    ms = pc.divide(t["ts"].cast(pa.int64()), 1000).to_numpy()  # us -> ms
    assert (lo, hi, n) == (int(ms.min()), int(ms.max()), t.num_rows)


def test_read_pruned_file_level(ray_session, day_lake):
    d, tables = day_lake
    ds = read_pruned(d, ts_col="ts", t_from_ms=BASE + DAY, t_to_ms=BASE + 2 * DAY - 1)
    # only day1 is opened by read tasks — the pruning evidence
    assert [os.path.basename(f) for f in ds.input_files()] == ["day1.parquet"]
    got = ds.to_pandas().sort_values("value").reset_index(drop=True)
    want = tables[1].to_pandas().sort_values("value").reset_index(drop=True)
    assert len(got) == len(want) == 200
    assert (got["value"].to_numpy() == want["value"].to_numpy()).all()


def test_read_pruned_row_level_exact(ray_session, day_lake):
    """Bounds that split a file mid-way: pushed row filter must be exact."""
    d, tables = day_lake
    lo = BASE + DAY // 2
    hi = BASE + DAY - 1
    ds = read_pruned(d, ts_col="ts", t_from_ms=lo, t_to_ms=hi)
    got = ds.to_pandas()
    ts0 = tables[0]["ts"].cast(pa.int64()).to_numpy() // 1000
    want_n = int(((ts0 >= lo) & (ts0 <= hi)).sum())
    assert len(got) == want_n > 0


def test_read_pruned_matcher_pushdown(ray_session, day_lake):
    d, tables = day_lake
    ds = read_pruned(d, matchers=[Matcher("=", "event_type", "click")])
    got = ds.to_pandas()
    assert len(got) == 300 and set(got["event_type"]) == {"click"}
    # residual ops still apply post-read
    ds2 = read_pruned(
        d, matchers=[Matcher("=", "event_type", "click"), Matcher("=~", "event_type", "cl.*")]
    )
    assert len(ds2.to_pandas()) == 300


def test_pushdown_split_semantics(day_lake):
    d, _ = day_lake
    schema = pq.read_metadata(os.path.join(d, "day0.parquet")).schema.to_arrow_schema()
    push, residual = pushdown_split(
        [
            Matcher("=", "event_type", "click"),      # pushable
            Matcher("=", "event_type", ""),           # empty value -> residual
            Matcher("=", "missing_col", "x"),         # absent column -> residual
            Matcher("!=", "event_type", "view"),      # op -> residual
            Matcher("=~", "event_type", "c.*"),       # op -> residual
            Matcher("=", "value", "3.0"),             # non-string column -> residual
        ],
        schema,
    )
    assert [m.value for m in push] == ["click"]
    assert len(residual) == 5


def test_read_pruned_all_files_pruned_keeps_schema(ray_session, day_lake):
    d, _ = day_lake
    ds = read_pruned(d, ts_col="ts", t_from_ms=BASE + 100 * DAY, t_to_ms=BASE + 101 * DAY)
    assert ds.schema().names == ["ts", "event_type", "value"]
    assert ds.count() == 0


def test_read_pruned_ns_and_ms_units(ray_session, tmp_path):
    for unit in ("ms", "ns"):
        p = str(tmp_path / f"u_{unit}.parquet")
        t = _mk_day_file(p, 0, n=50, unit=unit)
        lo, hi, n = file_time_stats(p, "ts")
        k = {"ms": 1, "ns": 1_000_000}[unit]
        raw = t["ts"].cast(pa.int64()).to_numpy() // k
        assert (lo, hi, n) == (int(raw.min()), int(raw.max()), 50)
        ds = read_pruned(p, ts_col="ts", t_from_ms=int(raw.min()), t_to_ms=int(raw[24]))
        assert len(ds.to_pandas()) == 25


# ---------------------------------------------------------------------------
# Bloom file-skip index
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bloom_lake(tmp_path_factory, ray_session):
    """16 files hash-sharded by user_id (every file spans the full id
    range's min/max, so footer stats prune nothing)."""
    from prom_tsdb_copyer_ray.sources.parquet import build_bloom_index

    root = tmp_path_factory.mktemp("bloomlake")
    data = root / "data"
    data.mkdir()
    rng = np.random.default_rng(7)
    users = rng.integers(0, 4000, size=8000)
    for s in range(16):
        u = users[users % 16 == s]
        pq.write_table(
            pa.table({"user_id": pa.array(u, pa.int64()),
                      "value": pa.array(rng.normal(size=len(u)))}),
            str(data / f"part-{s:02d}.parquet"),
        )
    idx = root / "index"
    n = build_bloom_index(str(data), "user_id", str(idx))
    assert n == 16
    return str(data), str(idx), users


def test_bloom_prune_skips_files(bloom_lake):
    from prom_tsdb_copyer_ray.sources.parquet import bloom_prune_files

    data, idx, users = bloom_lake
    probe = [int(users[0]), int(users[1])]
    keep = bloom_prune_files(idx, probe)
    # the two probes live in <= 2 shards; blooms may add a few false
    # positives but must skip most of the 16 files
    assert 1 <= len(keep) <= 5
    # no false negatives: the true shards are present
    true_files = {f"part-{u % 16:02d}.parquet" for u in probe}
    assert true_files <= {os.path.basename(p) for p in keep}


def test_bloom_read_equals_full_scan(bloom_lake, ray_session):
    import ray.data

    from prom_tsdb_copyer_ray.sources.parquet import read_bloom_pruned

    data, idx, users = bloom_lake
    probe = [int(users[5]), int(users[100]), 999_999]  # last one absent
    pset = pa.array(probe, pa.int64())

    got = (
        read_bloom_pruned(data, idx, probe)
        .map_batches(lambda b: b.filter(pc.is_in(b["user_id"], value_set=pset)),
                     batch_format="pyarrow")
        .to_pandas().sort_values(["user_id", "value"]).reset_index(drop=True)
    )
    want = (
        ray.data.read_parquet(data)
        .map_batches(lambda b: b.filter(pc.is_in(b["user_id"], value_set=pset)),
                     batch_format="pyarrow")
        .to_pandas().sort_values(["user_id", "value"]).reset_index(drop=True)
    )
    assert got.equals(want)
    assert (got["user_id"] != 999_999).all()


def test_bloom_absent_probe_empty_schema(bloom_lake, ray_session):
    from prom_tsdb_copyer_ray.sources.parquet import (
        bloom_prune_files,
        read_bloom_pruned,
    )

    data, idx, _users = bloom_lake
    # an absent key may bloom-hit a few files (false positives) but the
    # schema-preserving empty path must work when nothing survives
    keep = bloom_prune_files(idx, [987_654_321])
    ds = read_bloom_pruned(data, idx, [987_654_321])
    assert set(ds.schema().names) == {"user_id", "value"}
    exact = ds.map_batches(
        lambda b: b.filter(pc.equal(b["user_id"], 987_654_321)),
        batch_format="pyarrow",
    )
    assert exact.count() == 0
    assert len(keep) <= 3


def test_bloom_string_keys(tmp_path, ray_session):
    from prom_tsdb_copyer_ray.sources.parquet import (
        bloom_prune_files,
        build_bloom_index,
    )

    data = tmp_path / "sdata"
    data.mkdir()
    for s in range(8):
        names = [f"host-{i}" for i in range(s * 50, (s + 1) * 50)]
        pq.write_table(pa.table({"name": pa.array(names, pa.string())}),
                       str(data / f"p{s}.parquet"))
    idx = tmp_path / "sidx"
    build_bloom_index(str(data), "name", str(idx))
    keep = bloom_prune_files(str(idx), ["host-125"])
    assert any(os.path.basename(p) == "p2.parquet" for p in keep)
    assert len(keep) <= 3
