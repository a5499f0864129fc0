"""JSON payload access — SURVEY §2.1 S10 (JsonBinaryParser) re-expressed.

The reference ships a 988-LoC MySQL binary-JSON decoder
(``parser/shyiko/JsonBinaryParser.java``) whose entire purpose is to turn the
wire format back into JSON *text*. In the Spark engine JSON payloads are
StringType columns from the start, so the operator surface is access, not
decoding: path extraction, typed parsing, schema inference — all Catalyst
built-ins (codegen'd, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def json_get(col, path: str) -> Column:
    """Extract a JSON path as string (get_json_object; '$.a.b' paths)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def json_get_typed(col, path: str, dtype: str) -> Column:
    return json_get(col, path).cast(dtype)


def json_tuple_cols(df: DataFrame, col: str, *fields: str) -> DataFrame:
    """Explode several top-level fields in one pass (json_tuple)."""
    return df.select("*", F.json_tuple(F.col(col), *fields).alias(*fields))


def parse_json(col, schema: str) -> Column:
    """Full typed parse via from_json with a DDL schema string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def infer_json_schema(df: DataFrame, col: str, sample: int = 1000) -> str:
    """Infer a DDL schema from a sample of the column (driver-side, one
    small job — the analog of the reference's re-infer loop but explicit
    and on-demand)."""
    sdf = df.select(col).limit(sample)
    spark = sdf.sparkSession
    return (
        spark.read.json(sdf.rdd.map(lambda r: r[0] or "{}"))
        .schema.simpleString()
    )
