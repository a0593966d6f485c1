"""Round-3 scale hardening: q_khop_reach's visited/frontier sets must
escalate off the driver when the reach set outgrows the node budget —
sharded co-partition hops + a set_op("except") membership exchange.
Forced here with an artificial 1-node cap on a fixture whose reach set
is the whole corpus; both paths must agree exactly."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _mk_docs(tmp_path, n=400, seed=5):
    """Dense dup relation: few (lang, bucket) cells -> the 3-hop reach
    from the min doc covers every doc in its component (here: all)."""
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de"])[rng.integers(0, 2, n)]
    texts = ["word " * int(rng.integers(3, 9)) for _ in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(list(langs), pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        # all docs share one n_chars bucket -> one giant star per lang
        # plus the shared source star bridges the langs
        "n_chars": pa.array(
            (np.full(n, 50) + rng.integers(0, 40, n)).astype(np.int64)),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return n


def test_khop_sharded_matches_driver_path(ray_session, tmp_path):
    from prom_tsdb_copyer_ray.pipelines.extras import q_khop_reach

    n = _mk_docs(tmp_path)
    base = q_khop_reach(str(tmp_path)).to_pandas()
    forced = q_khop_reach(str(tmp_path), max_driver_nodes=1).to_pandas()
    assert int(base["seed"][0]) == int(forced["seed"][0])
    assert int(base["n_reach"][0]) == int(forced["n_reach"][0])
    # the fixture really exceeds the forced cap: reach = whole corpus
    assert int(base["n_reach"][0]) == n


def test_khop_sharded_mid_run_escalation(ray_session, tmp_path):
    """Cap above the seed but below the final reach: the run starts on
    the driver path and must hand over mid-BFS without losing nodes."""
    from prom_tsdb_copyer_ray.pipelines.extras import q_khop_reach

    n = _mk_docs(tmp_path, n=300, seed=6)
    base = q_khop_reach(str(tmp_path)).to_pandas()
    forced = q_khop_reach(str(tmp_path), max_driver_nodes=10).to_pandas()
    assert int(base["n_reach"][0]) == int(forced["n_reach"][0]) == n
