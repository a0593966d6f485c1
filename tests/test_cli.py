"""CLI surface tests (O20/O16)."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from prom_tsdb_copyer_ray.cli import build_parser, parse_time_ms
from prom_tsdb_copyer_ray.sources.pages import generate_pages


@pytest.mark.parametrize(
    "s,ms",
    [
        ("2024-01-01T00:00:00+00:00", 1_704_067_200_000),
        ("2024-01-01T00:00:00", 1_704_067_200_000),  # naive -> UTC
        ("2024-01-01", 1_704_067_200_000),
        ("2024-01-01T01:00:00+01:00", 1_704_067_200_000),
    ],
)
def test_parse_time(s, ms):
    assert parse_time_ms(s) == ms


def test_parse_time_rejects_garbage():
    with pytest.raises(ValueError):
        parse_time_ms("not-a-time")


def test_parser_flags():
    p = build_parser()
    a = p.parse_args(["src", "dst", "-l", "lang=en", "-l", "domain=~a.*",
                      "-L", "env=prod", "-t", "4"])
    assert a.label_query == ["lang=en", "domain=~a.*"]
    assert a.label_append == ["env=prod"]
    assert a.thread == 4


def test_cli_end_to_end(tmp_path):
    src = tmp_path / "pages.parquet"
    out = tmp_path / "out"
    pq.write_table(generate_pages(400, seed=42), src)
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.cli", str(src), str(out),
         "-L", "env=test", "--num-cpus", "4", "--show-metrics"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(summary) == {"5m", "1h", "1d", "_timing"}
    assert summary["_timing"].get("extract_batch_ms", {}).get("count", 0) > 0
    assert all(v["status"] == "complete" for k, v in summary.items() if k != "_timing")
    assert (out / "manifests" / "5m.json").exists()


def test_cli_orc_format(tmp_path):
    """--format orc feeds the same pipeline (no pushdown, post-read filter)."""
    from prom_tsdb_copyer_ray.sources.formats import write_pages_orc

    src = tmp_path / "pages.orc"
    out = tmp_path / "out"
    write_pages_orc(generate_pages(300, seed=42), str(src))
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.cli", str(src), str(out),
         "--format", "orc", "-F", "2024-01-01T00:00:00+00:00",
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # without --show-metrics the CLI prints {tier: status}
    assert summary == {"5m": "complete", "1h": "complete", "1d": "complete"}


def test_curate_cli_end_to_end(tmp_path):
    import pyarrow as pa

    texts = [" ".join(f"w{i}x{j}" for j in range(40)) for i in range(38)]
    texts += ["dup " * 40, "dup " * 40]  # repetitive pair: quality-filtered
    docs = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "lang": pa.array(["en"] * 40),
        "source": pa.array(["s"] * 40),
        "text": pa.array(texts),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, src)
    out = tmp_path / "cur"
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.curate_cli", str(src),
         str(out), "--num-shards", "4", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert json.loads(proc.stdout.strip().splitlines()[-1]) == {
        "shards": 4, "status": "complete"}
    kept = pq.read_table(str(out / "docs")).num_rows
    assert kept == 38  # the repetitive pair was quality-filtered

    # degenerate corpus: EVERY doc filtered -> empty-but-complete output
    out2 = tmp_path / "cur2"
    bad = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "lang": pa.array(["en"] * 8),
        "source": pa.array(["s"] * 8),
        "text": pa.array(["rep " * 40] * 8),
    })
    src2 = tmp_path / "bad.parquet"
    pq.write_table(bad, src2)
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.curate_cli", str(src2),
         str(out2), "--num-shards", "4", "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert json.loads(proc.stdout.strip().splitlines()[-1]) == {
        "shards": 4, "status": "complete"}


def test_cli_dry_run_plan(tmp_path):
    """--dry-run prints the metadata-only backfill plan and writes nothing;
    after a real run the same plan reports zero pending days."""
    src = tmp_path / "pages.parquet"
    out = tmp_path / "out"
    pq.write_table(generate_pages(300, seed=7), src)

    def run(*extra):
        proc = subprocess.run(
            [sys.executable, "-m", "prom_tsdb_copyer_ray.cli", str(src),
             str(out), "--num-cpus", "4", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    plan = run("--dry-run")
    assert plan["source_range_ms"] is not None
    assert plan["tiers"]["5m"]["days_done"] == 0
    assert plan["tiers"]["5m"]["pending_days"]
    assert not out.exists()  # a plan writes NOTHING

    run()  # real copy
    plan2 = run("--dry-run")
    for tier in ("5m", "1h", "1d"):
        assert plan2["tiers"][tier]["pending_days"] == []
        assert plan2["tiers"][tier]["days_done"] == plan["tiers"][tier]["days_total"]


def test_cli_retention_lifecycle(tmp_path):
    """--retention-before deletes expired day partitions, ratchets the
    manifest watermark, and a later resume never resurrects them."""
    import os

    src = tmp_path / "pages.parquet"
    out = tmp_path / "out"
    pq.write_table(generate_pages(300, seed=9), src)

    def run(*extra):
        proc = subprocess.run(
            [sys.executable, "-m", "prom_tsdb_copyer_ray.cli", str(src),
             str(out), "--num-cpus", "4", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    run()
    days_before = sorted(os.listdir(out / "tiers" / "5m"))
    assert len(days_before) >= 2

    run("--retention-before", "2024-01-02T00:00:00+00:00")
    days_after = sorted(os.listdir(out / "tiers" / "5m"))
    assert days_after == [d for d in days_before
                          if int(d.split("=")[1]) >= 1_704_153_600_000]

    from prom_tsdb_copyer_ray.state.manifest import (
        completed_days,
        retention_watermark,
    )

    assert retention_watermark(str(out), "5m") == 1_704_153_600_000
    assert all(d >= 1_704_153_600_000 for d in completed_days(str(out), "5m"))

    # resume: expired days are DONE, not pending — nothing resurrected
    run()
    assert sorted(os.listdir(out / "tiers" / "5m")) == days_after

    # the dry-run plan agrees
    plan = run("--dry-run")
    for tier in ("5m", "1h", "1d"):
        assert plan["tiers"][tier]["pending_days"] == []


def test_cli_retention_per_tier(tmp_path):
    """TIER=TIME retention keeps downsampled tiers longer than raw."""
    import os

    src = tmp_path / "pages.parquet"
    out = tmp_path / "out"
    pq.write_table(generate_pages(300, seed=9), src)

    def run(*extra):
        proc = subprocess.run(
            [sys.executable, "-m", "prom_tsdb_copyer_ray.cli", str(src),
             str(out), "--num-cpus", "4", *extra],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]

    run()
    run("--retention-before", "5m=2024-01-02T00:00:00+00:00")
    # raw 5m tier trimmed; 1h/1d keep both days
    assert len(os.listdir(out / "tiers" / "5m")) == 1
    assert len(os.listdir(out / "tiers" / "1h")) == 2
    assert len(os.listdir(out / "tiers" / "1d")) == 2


def test_query_cli_list_and_run(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.query_cli", "--list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert proc.returncode == 0
    names = proc.stdout.split()
    assert "rollup_5m" in names and "ks_statistic" in names

    out = tmp_path / "q_out"
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.query_cli",
         "stddev_1h", "/root/testdata/sf0.001", str(out), "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["rows"] > 0 and info["format"] == "parquet"
    got = pq.read_table(str(out))
    assert got.num_rows == info["rows"]
    assert {"event_type", "window_start", "stddev_v"} <= set(got.column_names)


def test_query_cli_rejects_unknown(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "prom_tsdb_copyer_ray.query_cli",
         "nope_nope", "/root/testdata/sf0.001", str(tmp_path / "x")],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert proc.returncode == 2
    assert "unknown query" in proc.stderr


def test_bench_regression_gate_logic():
    """bench.py's per-query regression gate (round-3 verdict item 5):
    >1.5x slower AND >0.5 s absolute delta, worst-first."""
    import bench

    prior = {"a": 1.0, "b": 0.1, "c": 5.0, "d": 2.0}
    now = {"a": 2.0, "b": 0.4, "c": 5.2, "d": 3.5, "e": 9.9}
    got = bench.find_regressions(now, prior)
    assert [r["query"] for r in got] == ["a", "d"]
    assert got[0]["ratio"] == 2.0
    assert bench.find_regressions(now, {}) == []
