"""Manifest schema-evolution tests (round-3 verdict item 8): a tier lake
written by code version N must be resumable by N+1 — older manifests
migrate forward loss-lessly, newer/corrupt manifests fail LOUDLY instead
of silently mis-resuming."""

from __future__ import annotations

import json
import os

import pytest

from prom_tsdb_copyer_ray.sources.pages import generate_pages
from prom_tsdb_copyer_ray.state.manifest import (
    MANIFEST_VERSION,
    ManifestVersionError,
    load_manifest,
    manifest_path,
    read_tier,
    write_tier,
)


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _run(out_dir, n_pages=900, span_days=3):
    import ray.data

    from prom_tsdb_copyer_ray.pipelines.copy import run_copy

    pages = generate_pages(n_pages, seed=7, span_ms=span_days * 86_400_000)
    return run_copy(
        lambda: ray.data.from_arrow(pages), out_dir, concurrency=(1, 2)
    )


def _rewrite(out_dir, tier, mutate):
    path = manifest_path(out_dir, tier)
    with open(path) as f:
        m = json.load(f)
    mutate(m)
    with open(path, "w") as f:
        json.dump(m, f)


def test_written_manifests_carry_current_version(ray_session, out_dir):
    _run(out_dir)
    for tier in ("5m", "1h", "1d"):
        with open(manifest_path(out_dir, tier)) as f:
            assert json.load(f)["version"] == MANIFEST_VERSION


def test_resume_from_v1_manifest_migrates(ray_session, out_dir):
    """A round-1..3 lake (no 'version' field) resumes cleanly.

    A COMPLETE v1 tier is skipped as-is (the on-disk file is only
    rewritten when the tier is written — migration is in-memory and
    loss-less); a PARTIAL v1 tier goes through write_tier, which
    recomputes only the missing day and re-stamps the manifest at the
    current version."""
    import shutil

    from prom_tsdb_copyer_ray.state.manifest import tier_dir

    _run(out_dir)
    golden = {t: read_tier(out_dir, t).to_pandas() for t in ("5m", "1h", "1d")}
    before_days = {t: set(load_manifest(out_dir, t)["days"])
                   for t in ("5m", "1h", "1d")}

    def strip_version(m):
        m.pop("version", None)

    # make 5m a PARTIAL v1 lake: drop one committed day + its data dir
    victim = sorted(before_days["5m"])[0]

    def make_partial_v1(m):
        strip_version(m)
        del m["days"][victim]
        m["status"] = "partial"

    _rewrite(out_dir, "5m", make_partial_v1)
    shutil.rmtree(os.path.join(tier_dir(out_dir, "5m"),
                               f"window_day={victim}"))
    for tier in ("1h", "1d"):
        _rewrite(out_dir, tier, strip_version)
        m = load_manifest(out_dir, tier)  # in-memory migration on load
        assert m["version"] == MANIFEST_VERSION
        assert set(m["days"]) == before_days[tier]

    _run(out_dir)  # resume over the v1 lake
    # the written tier is re-stamped at the current version, complete again
    with open(manifest_path(out_dir, "5m")) as f:
        on_disk = json.load(f)
    assert on_disk["version"] == MANIFEST_VERSION
    assert set(on_disk["days"]) == before_days["5m"]
    assert on_disk["status"] == "complete"
    for tier in ("5m", "1h", "1d"):
        got = (read_tier(out_dir, tier).to_pandas()
               .sort_values(["series_key", "window_start"])
               .reset_index(drop=True))
        want = (golden[tier]
                .sort_values(["series_key", "window_start"])
                .reset_index(drop=True))
        assert got.equals(want)


def test_future_version_fails_loudly(ray_session, out_dir):
    _run(out_dir)
    _rewrite(out_dir, "5m", lambda m: m.__setitem__("version", 99))
    with pytest.raises(ManifestVersionError, match="NEWER code"):
        load_manifest(out_dir, "5m")
    with pytest.raises(ManifestVersionError, match="NEWER code"):
        _run(out_dir)  # resume path must also refuse


def test_malformed_days_fails_loudly(ray_session, out_dir):
    _run(out_dir)
    _rewrite(out_dir, "1h", lambda m: m.__setitem__("days", "oops"))
    with pytest.raises(ManifestVersionError, match="malformed"):
        load_manifest(out_dir, "1h")
    _rewrite(out_dir, "1d",
             lambda m: m["days"].update({"12345": {"bogus": 1}}))
    with pytest.raises(ManifestVersionError, match="n_rows"):
        load_manifest(out_dir, "1d")


def test_write_tier_rejects_future_version(ray_session, out_dir, tmp_path):
    """write_tier (the resume entry point) refuses a future-version
    manifest before touching any data on disk."""
    _run(out_dir)
    tdir_before = sorted(
        os.listdir(os.path.join(out_dir, "tiers", "5m")))
    _rewrite(out_dir, "5m", lambda m: m.__setitem__("version", 99))
    ds = read_tier(out_dir, "1h")  # any CHUNK_SCHEMA-shaped dataset
    with pytest.raises(ManifestVersionError):
        write_tier(ds, out_dir, "5m")
    assert sorted(
        os.listdir(os.path.join(out_dir, "tiers", "5m"))) == tdir_before
