"""Session-10 extras: pure-video frame sampling, k-hop graph reachability,
l-diversity privacy audit, interpolated quantiles and exact mode.

House protocols as everywhere (pipelines/queries.py): per-batch Arrow
combiners, censuses bounded by value domain / dim cardinality, exact-int
math until one mirrored float expression shared with the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyed import count_distinct_per_group, sharded_grouped_agg


def _read(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def q_video_pure_frames(sf_dir: str):
    """REAL video decode in the battery: every document becomes a 6-frame
    NPMV 'motion netpbm' video (8x8 P5 frames, pixel(f, r, c) =
    (doc_id*31 + f*11 + r*7 + c*3) % 256), REALLY encoded then REALLY
    seek-decoded at stride 2 (frames 0, 2, 4) by the
    PureVideoFrameSampler actor pool — exact integer pixel sums the
    oracle expands arithmetically.  Closes the video path's value check:
    container parse, frame seek, pixel decode and in-batch pooling are
    all real; only MP4-class codecs remain stubbed (need ffmpeg)."""
    from ..stages.multimodal import encode_npmv, sample_pure_video_frames

    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        r = np.arange(8)[:, None]
        c = np.arange(8)[None, :]
        payloads = []
        for d in ids:
            frames = []
            for f in range(6):
                v = ((int(d) * 31 + f * 11 + r * 7 + c * 3) % 256).astype(
                    np.uint8
                )
                frames.append(b"P5\n8 8\n255\n" + v.tobytes())
            payloads.append(encode_npmv(frames))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })

    feats = sample_pure_video_frames(
        ds.map_batches(to_media, batch_format="pyarrow"),
        stride=2, concurrency=(1, 4), batch_size=128,
    )

    def fin(batch: pa.Table) -> pa.Table:
        s = batch["pixel_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["media_id"],
            "n_frames": batch["n_frames_sampled"],
            "pixel_sum": batch["pixel_sum"],
            "mean_pixel": pa.array(s.astype(np.float64) / 192.0, pa.float64()),
        })

    return feats.map_batches(fin, batch_format="pyarrow")


def q_khop_reach(sf_dir: str):
    """3-hop BFS reachability from the min-doc_id seed over the dup
    relation graph (the triangles edge set: star edges of the
    (lang, n_chars//100) and (source, n_chars//100) relations, traversed
    undirected).  Iterative frontier plan: the bounded edge set
    materializes once, each hop broadcasts the frontier (ray.put) and a
    shuffle-free probe pass emits per-batch-distinct neighbors; the
    visited set lives on the driver (bounded by the reach set).  At
    100 TB the frontier broadcast escalates to a hash co-partition of
    (edges, frontier), and visited moves to a sharded membership table.
    Oracle: WITH RECURSIVE over the identical edge definition."""
    import ray

    from ..stages.graph import group_star_edges_multi

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def bucket(batch: pa.Table) -> pa.Table:
        nb = pc.cast(batch["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "lang": batch["lang"],
            "source": batch["source"],
            "cb": pa.array(nb // 100, pa.int64()),
        })

    d = docs.map_batches(bucket, batch_format="pyarrow")
    seed = int(d.min("doc_id"))
    edges = group_star_edges_multi(
        d, [["lang", "cb"], ["source", "cb"]]
    ).materialize()

    visited = {seed}
    frontier = {seed}
    for _hop in range(3):
        f_ref = ray.put(np.sort(np.fromiter(frontier, np.int64)))

        def probe(batch: pa.Table, _f=f_ref) -> pa.Table:
            fa = ray.get(_f)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            nbrs = np.unique(np.r_[b[np.isin(a, fa)], a[np.isin(b, fa)]])
            return pa.table({"node": pa.array(nbrs, pa.int64())})

        hop = edges.map_batches(probe, batch_format="pyarrow").to_pandas()
        new = set(int(x) for x in hop["node"].unique()) - visited
        if not new:
            break
        visited |= new
        frontier = new
    return pa.table({
        "seed": pa.array([seed], pa.int64()),
        "n_reach": pa.array([len(visited)], pa.int64()),
    })


def q_l_diversity(sf_dir: str):
    """l-diversity privacy audit (k_anonymity's companion): for each
    quasi-identifier group (lang, n_chars//1000), the number of DISTINCT
    sensitive values (source) — groups with small l leak the sensitive
    attribute even when k-anonymous.  Exact distinct via
    count_distinct_per_group: only distinct (group, source) combiner rows
    cross the exchange."""
    docs = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def prep(batch: pa.Table) -> pa.Table:
        nb = pc.cast(batch["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": batch["lang"],
            "size_bucket": pa.array(nb // 1000, pa.int64()),
            "source": batch["source"],
        })

    return count_distinct_per_group(
        docs.map_batches(prep, batch_format="pyarrow"),
        ["lang", "size_bucket"], "source", out_col="l", num_shards=8,
    )


def _value_census(sf_dir: str):
    ds = _read(sf_dir, "events", ["value"])

    def census(batch: pa.Table) -> pa.Table:
        cv = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t = pa.table({
            "cv": pa.array(cv),
            "n": pa.array(np.ones(len(cv), np.int64)),
        })
        g = t.group_by(["cv"]).aggregate([("n", "sum")])
        return g.rename_columns(["cv", "n"])

    return sharded_grouped_agg(
        ds.map_batches(census, batch_format="pyarrow"),
        ["cv"], [("n", "sum")], num_shards=8,
    ).to_pandas().sort_values("cv")


def q_quantile_cont(sf_dir: str):
    """Linearly-interpolated (PERCENTILE_CONT) p50/p90/p99 of event value
    from the cent census: the rank position (n-1)*pct is kept as an exact
    integer (index = //100, fraction = %100), the lo/hi census lookups
    are exact, and the interpolation lo + (hi-lo)*(frac/100) is ONE
    mirrored float expression — the SQL oracle runs the identical
    explicit formula (NOT quantile_cont, whose internal float rank could
    differ in the last ulp)."""
    census = _value_census(sf_dir)
    cv = census["cv"].to_numpy()
    cum = census["n"].to_numpy().cumsum()
    n = int(cum[-1])
    pcts, qvals = [], []
    for pct in (50, 90, 99):
        pos = (n - 1) * pct
        lo0, fi = pos // 100, pos % 100
        hi0 = min(lo0 + 1, n - 1)
        lo = int(cv[np.searchsorted(cum, lo0 + 1)])
        hi = int(cv[np.searchsorted(cum, hi0 + 1)])
        q_cents = float(lo) + float(hi - lo) * (fi / 100.0)
        pcts.append(pct)
        qvals.append(q_cents / 100.0)
    return pa.table({
        "pct": pa.array(pcts, pa.int64()),
        "q_value": pa.array(qvals, pa.float64()),
    })


def q_mode_value(sf_dir: str):
    """Exact mode of the event value (cent units): census argmax with the
    smallest-value tiebreak — deterministic, unlike SQL mode()."""
    census = _value_census(sf_dir)
    cv = census["cv"].to_numpy()
    n = census["n"].to_numpy()
    order = np.lexsort((cv, -n))
    i = order[0]
    return pa.table({
        "mode_value": pa.array([float(cv[i]) / 100.0], pa.float64()),
        "n_mode": pa.array([int(n[i])], pa.int64()),
    })
