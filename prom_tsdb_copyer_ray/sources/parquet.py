"""Predicate/partition pushdown Parquet source (operators O1/O2/O6 at the read).

The reference bounds its scan at the querier (``copyer.go:75`` queries only
``[mint, maxt]``) and discovers the copyable time range from block metadata
alone — it reads ``meta.json``, never a sample (``copyer.go:202-222``).  The
Parquet-lake analogues implemented here:

* :func:`prune_files_by_time` — file-level pruning from footer statistics:
  a file whose ``[min(ts), max(ts)]`` cannot overlap the query range is
  never opened by a read task.  Footer reads are metadata-only (a few KB
  per file, no row groups decoded).
* :func:`read_pruned` — ``ray.data.read_parquet`` over the surviving files
  with an exact row-level pyarrow filter expression pushed into the scan
  (``filter=``), which additionally skips non-matching **row groups** via
  their statistics before decoding.  Time bounds and ``=`` label matchers
  on physical columns are pushed; all other matcher ops stay as the
  vectorized post-read kernel (functions/matchers.py).
* :func:`range_from_metadata` — O2 range discovery from footers only
  (row-group min/max/num_rows), exact in milliseconds for any timestamp
  unit because floor-to-ms composes over the unit truncations.  Returns
  ``None`` when any row group lacks statistics (caller falls back to a
  scan).

At 100 TB the footer loop is the *planning* step: it touches O(files)
kilobytes, not O(data) — the same asymmetry the reference exploits with
``meta.json``.  Time-partitioned layouts (the engine's own day-partitioned
tiers, or any lake with time-clustered files) prune all but the queried
slice before a single task is scheduled.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Sequence

import numpy as np
import pyarrow as pa

from ..functions.matchers import EQ, Matcher

_UNIT_PER_MS = {"ms": 1, "us": 1_000, "ns": 1_000_000}


def list_parquet_files(source: str) -> list[str]:
    """Expand a file/dir path into a sorted list of .parquet files."""
    if os.path.isdir(source):
        out = []
        for root, _dirs, files in os.walk(source):
            out.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
        return sorted(out)
    return [source]


def _stat_to_ms(v, unit: str | None) -> int | None:
    """Footer stat value -> exact Unix ms (floor), or None if unconvertible.

    Stats surface as ``datetime`` for timestamp logical types (at microsecond
    resolution) or as raw ints.  Floor-to-ms is exact under composition:
    ``floor_ms(floor_us(x)) == floor_ms(x)`` for the non-negative epoch
    range this engine operates on (windows.py contract).
    """
    if v is None:
        return None
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return int(np.datetime64(v, "ms").astype(np.int64))
    if isinstance(v, (int, np.integer)):
        if unit == "s":
            return int(v) * 1000
        return int(v) // _UNIT_PER_MS.get(unit or "ms", 1)
    return None


def file_time_stats(path: str, ts_col: str):
    """(min_ms, max_ms, n_rows) for one file from its footer, or (None, None, n)
    when any row group lacks usable statistics for ``ts_col``."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    schema = md.schema.to_arrow_schema()
    if ts_col not in schema.names:
        return None, None, md.num_rows
    unit = schema.field(ts_col).type.unit if pa.types.is_timestamp(schema.field(ts_col).type) else "ms"
    idx = schema.names.index(ts_col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None, md.num_rows
        mn, mx = _stat_to_ms(st.min, unit), _stat_to_ms(st.max, unit)
        if mn is None or mx is None:
            return None, None, md.num_rows
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return lo, hi, md.num_rows


def prune_files_by_time(
    source: str, ts_col: str, t_from_ms: int | None, t_to_ms: int | None
) -> tuple[list[str], int]:
    """Files whose footer [min, max] can overlap ``[t_from, t_to]`` (ms,
    inclusive).  Files without statistics are conservatively kept.  Returns
    (kept_files, total_files)."""
    files = list_parquet_files(source)
    if t_from_ms is None and t_to_ms is None:
        return files, len(files)
    kept = []
    for f in files:
        lo, hi, _n = file_time_stats(f, ts_col)
        if lo is None or hi is None:
            kept.append(f)  # no stats -> cannot prune safely
            continue
        # +1 ms slack on the file max guards sub-ms stat truncation; pruning
        # is an optimization — the row-level expr below is the exact filter
        if t_from_ms is not None and hi + 1 < t_from_ms:
            continue
        if t_to_ms is not None and lo > t_to_ms:
            continue
        kept.append(f)
    return kept, len(files)


def _time_bounds_expr(field_type, ts_col: str, t_from_ms, t_to_ms):
    """Exact pyarrow expression for ms-truncation semantics over the column's
    native unit: ``ms(ts) >= lo AND ms(ts) <= hi``."""
    import pyarrow.dataset as pds

    f = pds.field(ts_col)
    expr = None
    if pa.types.is_timestamp(field_type):
        unit = field_type.unit
        if unit == "s":
            lo_u = None if t_from_ms is None else -((-t_from_ms) // 1000)  # ceil
            hi_x = None if t_to_ms is None else (t_to_ms // 1000) + 1
        else:
            k = _UNIT_PER_MS[unit]
            lo_u = None if t_from_ms is None else t_from_ms * k
            hi_x = None if t_to_ms is None else (t_to_ms + 1) * k
        mk = lambda v: pa.scalar(v, pa.int64()).cast(field_type)  # noqa: E731
        if lo_u is not None:
            expr = f >= mk(lo_u)
        if hi_x is not None:
            e2 = f < mk(hi_x)
            expr = e2 if expr is None else expr & e2
    else:  # raw int64 ms
        if t_from_ms is not None:
            expr = f >= t_from_ms
        if t_to_ms is not None:
            e2 = f <= t_to_ms
            expr = e2 if expr is None else expr & e2
    return expr


def pushdown_split(
    matchers: Sequence[Matcher] | None, schema: pa.Schema
) -> tuple[list[Matcher], list[Matcher]]:
    """Split matchers into (pushable, residual).

    Pushable: ``=`` with a non-empty value on a string column physically
    present in the schema — ``col == v`` at the scan drops nulls exactly
    like the missing-label-is-"" kernel drops them for non-empty v.  All
    other ops (!=, =~, !~, empty-value =, absent columns) evaluate
    post-read where missing-label semantics are well-defined.
    """
    push, residual = [], []
    for m in matchers or []:
        if (
            m.op == EQ
            and m.value != ""
            and m.name in schema.names
            and pa.types.is_string(schema.field(m.name).type)
        ):
            push.append(m)
        else:
            residual.append(m)
    return push, residual


def read_pruned(
    source: str,
    *,
    ts_col: str | None = None,
    t_from_ms: int | None = None,
    t_to_ms: int | None = None,
    matchers: Sequence[Matcher] | None = None,
    columns: Sequence[str] | None = None,
    apply_residual: bool = True,
    **read_kwargs,
):
    """Pushdown read: file pruning + row-group/row filter + column pruning.

    Time bounds are inclusive ``[t_from_ms, t_to_ms]`` in ms-truncation
    semantics (the CLI's -F/-T contract).  Returns a Ray Dataset.  When
    ``apply_residual`` is True the non-pushable matchers run as the standard
    post-read kernel, so the result equals read-everything + filter exactly.
    """
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray.data

    from ..functions.matchers import make_filter_fn

    files = list_parquet_files(source)
    if ts_col is not None and (t_from_ms is not None or t_to_ms is not None):
        kept, _total = prune_files_by_time(source, ts_col, t_from_ms, t_to_ms)
        # keep one file when everything pruned: preserves schema, reads ~0 rows
        files = kept or files[:1]

    schema = pq.read_metadata(files[0]).schema.to_arrow_schema()
    expr = None
    if ts_col is not None and ts_col in schema.names and (
        t_from_ms is not None or t_to_ms is not None
    ):
        expr = _time_bounds_expr(schema.field(ts_col).type, ts_col, t_from_ms, t_to_ms)
    push, residual = pushdown_split(matchers, schema)
    for m in push:
        e2 = pds.field(m.name) == m.value
        expr = e2 if expr is None else expr & e2

    kw = dict(read_kwargs)
    if columns is not None:
        kw["columns"] = list(columns)
    if expr is not None:
        kw["filter"] = expr
    if "override_num_blocks" not in kw:
        # Ray packs small files into ~128 MB read tasks; the fused
        # read->extract stage inherits that parallelism, so a CPU-bound
        # extraction over a small input can end up on a handful of cores
        # (measured: 200k pages in 4 tasks).  Fan out to >= 2 tasks/CPU —
        # but ONLY when the input is small enough that default packing
        # would under-parallelise; a big input (>= target x 128 MB)
        # already yields enough read tasks, and forcing one block per
        # file on a 100k-file lake would be worse than the packing.
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        target = 2 * ncpu
        threshold = target * 128 * 2**20
        total = 0
        for f in files:
            try:
                total += os.path.getsize(f)
            except OSError:
                total = threshold  # unknown size: leave Ray's default
                break
            if total >= threshold:
                break
        if total < threshold:
            kw["override_num_blocks"] = target
    ds = ray.data.read_parquet(files, **kw)
    if apply_residual and residual:
        ds = ds.map_batches(make_filter_fn(residual), batch_format="pyarrow")
    return ds


def range_from_metadata(source: str, ts_col: str):
    """O2 metadata-only range discovery: (min_ms, max_ms, n_rows) from
    footers alone (the ``meta.json`` analogue, ``copyer.go:202-222``), or
    ``None`` when any file lacks statistics — caller falls back to a scan."""
    lo = hi = None
    total = 0
    for f in list_parquet_files(source):
        mn, mx, n = file_time_stats(f, ts_col)
        if mn is None or mx is None:
            return None
        total += n
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    if lo is None:
        return None
    return lo, hi, total


def union_schema(paths: list[str]) -> "pa.Schema":
    """Union-by-name schema across Parquet footers (metadata only): the
    schema a lake accumulates as writers add columns over time.  Fields
    keep the first-seen type; a later file with the same name but an
    incompatible (non-castable-by-arrow) type raises rather than silently
    coercing.  Column order = first appearance."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for p in paths:
        sch = pq.read_schema(p)
        for f in sch:
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
                order.append(f.name)
            elif prev.type != f.type:
                # explicit promotion rule: numeric widths widen (any float
                # -> float64, else int64); anything else is a conflict —
                # an empty-array cast probe would accept every pair
                def _num(t):
                    return pa.types.is_integer(t) or pa.types.is_floating(t)

                if _num(prev.type) and _num(f.type):
                    wide = (pa.float64()
                            if (pa.types.is_floating(prev.type)
                                or pa.types.is_floating(f.type))
                            else pa.int64())
                    fields[f.name] = pa.field(f.name, wide)
                else:
                    raise ValueError(
                        f"schema conflict on column {f.name!r}: "
                        f"{prev.type} vs {f.type}"
                    )
    return pa.schema([fields[n] for n in order])


def read_union_schemas(source: str | list[str], columns: list[str] | None = None):
    """Read a directory/list of Parquet files whose schemas EVOLVED
    (columns added, dropped, reordered across files) as one Dataset:
    missing columns come back null, order is normalized — the
    union-by-name semantics every long-lived lake needs.  The union
    schema is computed from footers only and handed to the scan, so the
    fill happens inside the read tasks (no extra pass)."""
    import ray.data

    paths = (list_parquet_files(source)
             if isinstance(source, str) else list(source))
    sch = union_schema(paths)
    ds = ray.data.read_parquet(paths, schema=sch)
    if columns is not None:
        # project AFTER the union fill: pyarrow's scan rejects a column
        # projection that drops fields physically present in some file
        # when an explicit schema is set, so evolved reads trade read-time
        # column pruning for the null fill (an explicit batch select, not
        # select_columns, so the optimizer cannot push it into the scan)
        cols = list(columns)
        ds = ds.map_batches(
            lambda b: b.select(cols), batch_format="pyarrow"
        )
    return ds


def count_rows_metadata(source: str | list[str]) -> int:
    """COUNT(*) from Parquet FOOTERS only (num_rows metadata) — the
    aggregate-pushdown sibling of :func:`range_from_metadata`: O(files)
    kilobytes of planning I/O, zero data pages, exact by the format's
    contract."""
    import pyarrow.parquet as pq

    paths = (list_parquet_files(source)
             if isinstance(source, str) else list(source))
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


# ---------------------------------------------------------------------------
# Bloom-filter file-skip index (point-lookup pruning beyond min/max stats)
# ---------------------------------------------------------------------------

_BLOOM_VERSION = 1


def _bloom_key_hashes(values) -> np.ndarray:
    """Normalize probe/build keys to uint64 hashes.

    Strings hash with the corpus-wide vectorized polynomial hash
    (functions/hashing.poly_hash_column); integers go through a splitmix64
    finalizer so adjacent ids spread over the filter.  Both are
    deterministic across processes (no PYTHONHASHSEED dependence)."""
    import pyarrow.compute as pc

    from ..functions.hashing import poly_hash_column

    if isinstance(values, (list, tuple)):
        values = pa.array(values)
    if isinstance(values, np.ndarray) and values.dtype.kind in "iu":
        h = values.astype(np.uint64)
    elif isinstance(values, (pa.Array, pa.ChunkedArray)) and pa.types.is_integer(values.type):
        h = pc.cast(values, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        return poly_hash_column(values, fold63=False)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Kirsch-Mitzenmacher double hashing: k bit positions per key from one
    64-bit hash, shape (len(h), k).  ``m_bits`` must be a power of two."""
    h1 = h
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i * h2[:, None]
    return (pos & np.uint64(m_bits - 1)).astype(np.int64)


def build_bloom_index(source: str | list[str], key_col: str, index_dir: str,
                      bits_per_key: int = 16, num_hashes: int = 4) -> int:
    """Per-FILE Bloom filters over ``key_col`` — the point-lookup skip
    index that min/max footer stats cannot provide (a hash-sharded or
    unsorted key has full-range stats in every file).

    The file is the skip unit, so the build fans out one Dataset row per
    file (``from_items(paths).map_batches(batch_size=1)``: per-file tasks
    with streaming backpressure), each reading ONLY the key column of its
    file, hashing the distinct keys, and emitting a sized-to-ndv power-of-
    two bitmap (``bits_per_key`` x ndv, >= 0.2% false positives at 16x4).
    Filters land in one small ``blooms.parquet`` + ``meta.json`` under
    ``index_dir`` — O(files) planning bytes at probe time, the same
    asymmetry as :func:`range_from_metadata`.

    Returns the number of files indexed."""
    import json

    import pyarrow.parquet as pq
    import ray.data

    paths = (list_parquet_files(source)
             if isinstance(source, str) else sorted(source))

    def file_bloom(batch: pa.Table) -> pa.Table:
        out_p, out_m, out_bits = [], [], []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=[key_col])
            col = t[key_col].combine_chunks()
            uniq = col.unique()
            h = _bloom_key_hashes(uniq)
            m_bits = 1 << int(max(6, np.ceil(np.log2(max(1, len(h)) * bits_per_key))))
            pos = _bloom_positions(h, m_bits, num_hashes).ravel()
            bits = np.zeros(m_bits >> 3, np.uint8)
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
            out_p.append(path)
            out_m.append(m_bits)
            out_bits.append(bits.tobytes())
        return pa.table({
            "path": pa.array(out_p, pa.string()),
            "m_bits": pa.array(out_m, pa.int64()),
            "bitmap": pa.array(out_bits, pa.binary()),
        })

    rows = ray.data.from_items([{"path": p} for p in paths])
    blooms = pa.concat_tables(
        rows.map_batches(file_bloom, batch_format="pyarrow", batch_size=1)
        .iter_batches(batch_format="pyarrow")
    ).sort_by([("path", "ascending")])
    os.makedirs(index_dir, exist_ok=True)
    import pyarrow.parquet as pqw

    pqw.write_table(blooms, os.path.join(index_dir, "blooms.parquet"))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"version": _BLOOM_VERSION, "key_col": key_col,
                   "num_hashes": num_hashes, "n_files": len(paths)}, f)
    return len(paths)


def bloom_prune_files(index_dir: str, values) -> list[str]:
    """Files that MAY contain any of ``values`` under the index's filters
    (no false negatives; false positives bounded by the build sizing).
    O(files x k) bit probes on the driver — planning work, no data I/O."""
    import json

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    k = int(meta["num_hashes"])
    blooms = pq.read_table(os.path.join(index_dir, "blooms.parquet"))
    h = _bloom_key_hashes(values)
    keep = []
    for path, m_bits, bitmap in zip(blooms["path"].to_pylist(),
                                    blooms["m_bits"].to_pylist(),
                                    blooms["bitmap"].to_pylist()):
        bits = np.frombuffer(bitmap, np.uint8)
        pos = _bloom_positions(h, int(m_bits), k)
        hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        if hit.any():
            keep.append(path)
    return keep


def read_bloom_pruned(source: str | list[str], index_dir: str, values,
                      columns: list[str] | None = None):
    """``read_parquet`` over only the bloom-surviving files.  The caller
    still applies the exact filter (bloom passes are probabilistic); a
    probe set matching no file yields an empty Dataset with the right
    schema (first file's footer)."""
    import ray.data

    all_paths = (list_parquet_files(source)
                 if isinstance(source, str) else sorted(source))
    keep = bloom_prune_files(index_dir, values)
    if not keep:
        import pyarrow.parquet as pq

        sch = pq.read_schema(all_paths[0])
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
        return ray.data.from_arrow(sch.empty_table())
    return ray.data.read_parquet(keep, columns=columns)
