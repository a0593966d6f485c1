"""Pure-pandas single-process oracle for the rollup pipeline (FIXTURES F5).

Independent implementation of extract -> derive -> dedup -> rollup -> merge
(no Ray, no shared rollup code except the codec for decoding comparisons).
The golden source of truth for the tier outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MS_5M = 300_000
MS_1H = 3_600_000
MS_1D = 86_400_000
TIERS = {"5m": MS_5M, "1h": MS_1H, "1d": MS_1D}


def oracle_samples(pages: pa.Table) -> pd.DataFrame:
    """pages -> samples (crawl_rate=1.0, page_size_bytes=len(html))."""
    df = pages.to_pandas()
    domain = df["url"].str.split("/").str[2]
    ts = df["warc_ts"].astype("datetime64[ns]").astype("int64") // 10**6  # -> ms
    size = df["html"].map(len).astype(float)
    lang = df["lang"].fillna("")
    rows = []
    for name, value in (("crawl_rate", np.ones(len(df))), ("page_size_bytes", size.values)):
        rows.append(
            pd.DataFrame(
                {
                    "__name__": name,
                    "domain": domain.values,
                    "lang": lang.values,
                    "ts": ts.values,
                    "value": value,
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    out["series_key"] = (
        "__name__=" + out["__name__"] + ",domain=" + out["domain"] + ",lang=" + out["lang"]
    )
    return out


def oracle_tier_raw(samples: pd.DataFrame, tier: str = "5m") -> pd.DataFrame:
    """samples -> base tier rows (dedup keep-min-value per ts, then aggregate)."""
    d = TIERS[tier]
    s = samples.sort_values(["series_key", "ts", "value"], kind="mergesort")
    s = s.drop_duplicates(subset=["series_key", "ts"], keep="first")
    s = s.assign(window_start=(s["ts"] // d) * d)
    g = s.groupby(["series_key", "window_start"], sort=True)
    out = g.agg(
        __name__=("__name__", "first"),
        domain=("domain", "first"),
        lang=("lang", "first"),
        min_ts=("ts", "min"),
        max_ts=("ts", "max"),
        agg_count=("value", "size"),
        agg_sum=("value", "sum"),
        agg_min=("value", "min"),
        agg_max=("value", "max"),
        agg_first=("value", "first"),
        agg_last=("value", "last"),
    ).reset_index()
    out["n_samples"] = out["agg_count"]
    out["points"] = [
        (grp["ts"].values.copy(), grp["value"].values.copy()) for _, grp in g
    ]
    out["tier"] = tier
    return out


def oracle_tier_merge(finer: pd.DataFrame, tier: str, finer_ms: int) -> pd.DataFrame:
    """finer tier rows -> coarser tier rows (partial+final merge + NaN gap-fill grid)."""
    d = TIERS[tier]
    f = finer.assign(cw=(finer["window_start"] // d) * d).sort_values(
        ["series_key", "cw", "window_start"], kind="mergesort"
    )
    rows = []
    for (skey, cw), grp in f.groupby(["series_key", "cw"], sort=True):
        grid_ts = np.arange(cw, cw + d, finer_ms, dtype=np.int64)
        grid_vals = np.full(len(grid_ts), np.nan)
        slots = (grp["window_start"].values - cw) // finer_ms
        grid_vals[slots] = grp["agg_sum"].values / grp["agg_count"].values
        i_first = grp["min_ts"].values.argmin()
        i_last = grp["max_ts"].values.argmax()
        rows.append(
            {
                "series_key": skey,
                "window_start": cw,
                "__name__": grp["__name__"].iloc[0],
                "domain": grp["domain"].iloc[0],
                "lang": grp["lang"].iloc[0],
                "min_ts": grp["min_ts"].min(),
                "max_ts": grp["max_ts"].max(),
                "agg_count": grp["agg_count"].sum(),
                "agg_sum": grp["agg_sum"].sum(),
                "agg_min": grp["agg_min"].min(),
                "agg_max": grp["agg_max"].max(),
                "agg_first": grp["agg_first"].iloc[i_first],
                "agg_last": grp["agg_last"].iloc[i_last],
                "n_samples": len(grid_ts),
                "points": (grid_ts, grid_vals),
                "tier": tier,
            }
        )
    return pd.DataFrame(rows)


def oracle_tiers(pages: pa.Table) -> dict[str, pd.DataFrame]:
    samples = oracle_samples(pages)
    t5 = oracle_tier_raw(samples, "5m")
    t1h = oracle_tier_merge(t5, "1h", MS_5M)
    t1d = oracle_tier_merge(t1h, "1d", MS_1H)
    return {"5m": t5, "1h": t1h, "1d": t1d}
