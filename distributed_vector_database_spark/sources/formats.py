"""Interchange-format sources/sinks: CSV and JSON-lines round trips.

The reference's only interchange format is JSON-over-HTTP per record
(`reference: src/compute_server.py:55-57`) and JSON-in-TEXT storage
(`reference: src/storage_server.py:43-46`). A Spark engine gets columnar
parquet natively; this module covers the text formats a real ingest edge
still speaks — CSV drops and JSONL event feeds — with settings chosen so a
write→read round trip is LOSSLESS for the engine's types:

  - explicit schema on read (never inferSchema — a schema flip at 100 TB
    is a silent full-corpus corruption);
  - microsecond ``timestampFormat`` both ways (Spark's default CSV/JSON
    pattern keeps only millis);
  - CSV quoting/escaping left at RFC defaults so embedded commas/newlines
    in text columns survive.

Round-trip fidelity is oracle-checked (`csv_roundtrip_orders`,
``json_roundtrip_events``): aggregates over the re-read copy must equal
DuckDB aggregates over the original parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_text_format", "read_text_format", "roundtrip"]

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_FORMATS = ("csv", "json", "orc")


def _opts(fmt: str) -> dict[str, str]:
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt!r}")
    if fmt == "orc":
        # binary columnar — types are self-describing, no text options
        return {}
    # NTZ columns are formatted by the SEPARATE timestampNTZFormat option
    # (default keeps only millis) — set both so the roundtrip is lossless
    # whether the session read the source as TIMESTAMP or TIMESTAMP_NTZ.
    o = {"timestampFormat": _TS_FMT, "timestampNTZFormat": _TS_FMT}
    if fmt == "csv":
        o["header"] = "true"
        # quoted embedded newlines are only parsed back correctly in
        # multiLine mode. Scale caveat: multiLine CSV files are NOT
        # splittable (one task per file) — ingest edges should cap file
        # size at write time (maxRecordsPerFile) instead of relying on
        # block-level splits.
        o["multiLine"] = "true"
    return o


def write_text_format(df: DataFrame, fmt: str, path: str) -> None:
    """Write ``df`` as CSV (RFC quoting, header) or JSON lines with
    microsecond timestamps, or as ORC (the second columnar interchange
    format next to parquet — same splittable/predicate-pushdown scan
    properties)."""
    df.write.mode("overwrite").options(**_opts(fmt)).format(fmt).save(path)


def read_text_format(spark, fmt: str, path: str, schema) -> DataFrame:
    """Read a CSV/JSONL directory with an EXPLICIT schema (a `StructType`
    or DDL string) — schema inference is banned at scale."""
    return (
        spark.read.options(**_opts(fmt)).schema(schema).format(fmt).load(path)
    )


def roundtrip(df: DataFrame, fmt: str, path: str) -> DataFrame:
    """Write ``df`` to ``path`` in ``fmt`` and read it back with the
    original schema. The returned frame must be value-identical to ``df``
    for all supported types (checked by the format oracle queries)."""
    write_text_format(df, fmt, path)
    return read_text_format(df.sparkSession, fmt, path, df.schema)
