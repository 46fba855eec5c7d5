"""Typed reader/validator for the engine's primary input table.

BASELINE.json input_hint fixes the schema:
    (url string, warc_ts timestamp, html binary, text string, lang string)

``read_web_documents`` enforces it with an explicit StructType (the
reference infers every schema via pd.read_csv — SURVEY.md §1.3; this engine
never infers). ``validate_web_documents`` returns per-check violation counts
the pipeline can assert on or write as a metrics row.

CSV reading (reference S1/S2, e.g. header offset at
``reference/match_barcode.py:22-25``) is covered by ``read_csv_catalog``:
explicit schema + header handling + column-name normalization via toDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

WEB_DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

RAW_CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("item_uuid", T.StringType(), False),
        T.StructField("item_name", T.StringType(), True),
        T.StructField("number_sku_sold", T.LongType(), True),
        T.StructField("image_url", T.StringType(), True),
    ]
)


def read_web_documents(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.schema(WEB_DOCUMENTS_SCHEMA).parquet(path)
    return df


def validate_web_documents(df: DataFrame) -> dict:
    """Violation counts for the input invariants: url non-null + unique,
    text present. 0 everywhere == clean ingest."""
    row = df.agg(
        F.sum(F.when(F.col("url").isNull(), 1).otherwise(0)).alias("null_url"),
        (F.count("*") - F.countDistinct("url")).alias("dup_url"),
        F.sum(F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)).alias(
            "empty_text"
        ),
    ).collect()[0]
    return {k: int(row[k] or 0) for k in ("null_url", "dup_url", "empty_text")}


def read_csv_catalog(
    spark: SparkSession,
    path: str,
    schema: T.StructType = RAW_CATALOG_SCHEMA,
    header: bool = True,
    normalize_names: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema (S1/S3). With ``normalize_names`` the
    column names are lower/underscore-normalized (S2 analog of the
    reference's rename-after-skip at match_barcode.py:24-25)."""
    df = spark.read.option("header", str(header).lower()).schema(schema).csv(path)
    if normalize_names:
        cleaned = [c.strip().lower().replace(" ", "_") for c in df.columns]
        df = df.toDF(*cleaned)
    return df


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (S4 — reference writes every stage as CSV; here CSV is an
    export format only, snapshots are parquet)."""
    df.write.mode("overwrite").option("header", "true").csv(path)
