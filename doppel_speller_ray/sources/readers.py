"""Source readers with schema adapters.

S1–S4 of the reference (``/root/reference/doppelspeller/common.py:50-120``):
pipe-delimited CSV + a declared ``(dst_column, (src_column, dtype))`` mapping
validated at read time. Here the mapping is applied as ONE vectorized
rename/cast ``map_batches`` after ``ray.data.read_csv`` — the pandas
column-by-column copy loop (common.py:61-62) becomes an Arrow projection.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

_DTYPES = {
    int: pa.int64(),
    str: pa.string(),
    float: pa.float64(),
    "int": pa.int64(),
    "str": pa.string(),
    "float": pa.float64(),
}


def read_mapped_csv(path: str, column_mapping: list[tuple[str, tuple[str, object]]],
                    delimiter: str = "|"):
    """CSV → Dataset with columns renamed/cast per the mapping.

    column_mapping: [(dst, (src, dtype)), ...] — same shape as the
    reference's ``*_FILE_COLUMNS_MAPPING`` (settings.py:20-43). Missing
    source columns raise at the first batch (mirrors common.py:79-81
    validation).
    """
    import ray.data as rd

    ds = rd.read_csv(path, parse_options=pacsv.ParseOptions(delimiter=delimiter))

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for dst, (src, dtype) in column_mapping:
            if src not in t.column_names:
                raise ValueError(
                    f"column {src!r} required by mapping not in CSV "
                    f"(have {t.column_names})")
            cols[dst] = t[src].cast(_DTYPES.get(dtype, pa.string()))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def read_pages(paths, columns=None, lang: str | None = None):
    """pages Parquet reader (BASELINE input_hint schema) with column pruning
    and optional language row-filter PUSHED TO THE READ (row-group pruning —
    a read that loads all columns for a 2-column transform is wrong)."""
    import pyarrow.compute as pc
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = list(columns)
    if lang is not None:
        kwargs["filter"] = pc.field("lang") == lang
    return rd.read_parquet(paths, **kwargs)


def read_mapped_jsonl(path: str,
                      column_mapping: list[tuple[str, tuple[str, object]]]):
    """JSONL → Dataset with the same declared-mapping contract as
    ``read_mapped_csv`` (rename/cast as ONE Arrow projection, missing
    source columns raise at the first batch).

    JSONL is the dominant interchange format for web-text corpora
    (Common-Crawl derivatives, HF datasets); ``ray.data.read_json`` splits
    by file and streams line-blocks, so the projection stays zero-copy
    Arrow and the reader scales like the Parquet path. No reference
    analogue (the reference reads pipe-CSV only) — source-tier widening.
    """
    import ray.data as rd

    ds = rd.read_json(path)

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for dst, (src, dtype) in column_mapping:
            if src not in t.column_names:
                raise ValueError(
                    f"column {src!r} required by mapping not in JSONL "
                    f"(have {t.column_names})")
            cols[dst] = t[src].cast(_DTYPES.get(dtype, pa.string()))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def single_title_dataset(title: str, test_index: int = 0):
    """S5: 1-row Dataset from a CLI string (common.py:123-137)."""
    import ray.data as rd

    return rd.from_items([{"test_index": test_index, "title": title}])
