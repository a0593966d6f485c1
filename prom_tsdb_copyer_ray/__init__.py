"""prom_tsdb_copyer_ray — a Ray-Data-native time-series rollup + downsample +
retention engine.

Re-expresses the capabilities of the reference engine (BoringCat/prom-tsdb-copyer,
a Go TSDB-block copier; see SURVEY.md for the file:line operator inventory) as a
block-format-free Ray Data pipeline over Parquet tables of Common-Crawl-style web
pages:

    read_parquet(pages)
      -> map_batches(Extractor actor pool)        # html -> text, derive samples
      -> matcher filter / relabel Arrow kernels   # copyer.go:91-105 semantics
      -> groupby(series_key, window).map_groups   # gap-fill + dod/Gorilla encode
      -> 5m -> 1h -> 1d continuous-aggregate tiers (partial+final merge)
      -> write_parquet per tier + lineage manifests (resumable)

Nothing is copied from the reference; all chunk codecs (delta-of-delta
timestamps, Gorilla XOR floats) are built from scratch on the published
Gorilla paper scheme (Pelkonen et al., VLDB 2015).
"""

__version__ = "0.1.0"
