"""CSV page-ingestion source (SURVEY §2.1): walk channel directories
of per-document CSV files and produce the canonical page table
``(fn, fp, channel, text, pe_num)`` — the reference's entry point
(`code/python/csv_to_single_df.py:15-36` directory walk,
`code/python/csv_single_3.py:41-48` per-page read with
``PE_num = 1..n``, channels EML/FAX/SCN/WIN
`code/python/csv_single_3.py:12`).

Spark-first shape: ONE distributed ``spark.read.text(wholetext)``
scan over ``root/<channel>/*.csv`` (no driver-side loop over files),
then ``posexplode`` of the line split assigns page numbers — page
order comes from position in the file, not from a nondeterministic
row ordering. Everything is a narrow map; at 100 TB the listing is
partitioned directory discovery and each file is one task input.

Document-sized files (pages-per-doc) fit wholetext comfortably; a
multi-GB single file would instead go through the streaming inbox
(`streaming/ingest.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANNELS = ("EML", "FAX", "SCN", "WIN")


def load_pages_csv(spark: SparkSession, root: str) -> DataFrame:
    """root/<CHANNEL>/<fn>.csv (one page per line) → page table."""
    raw = spark.read.text([f"{root}/{c}/*.csv" for c in CHANNELS], wholetext=True)
    fp = F.input_file_name()
    lines = F.split(F.regexp_replace(F.col("value"), "\r\n", "\n"), "\n")
    # drop a trailing empty line (file ends with \n) without touching
    # intentional blank pages elsewhere
    lines = F.when(
        F.element_at(lines, -1) == "", F.slice(lines, 1, F.size(lines) - 1)
    ).otherwise(lines)
    return (
        raw.select(
            F.regexp_extract(fp, r"([^/]+)\.csv$", 1).alias("fn"),
            fp.alias("fp"),
            F.regexp_extract(fp, r"/(EML|FAX|SCN|WIN)/[^/]+$", 1).alias("channel"),
            F.posexplode(lines).alias("pos", "text"),
        )
        .select(
            "fn", "fp", "channel", "text", (F.col("pos") + 1).cast("int").alias("pe_num")
        )
    )


def pages_to_documents(pages: DataFrame) -> DataFrame:
    """Page table → document table: pages joined with '\\n' in page
    order (`single_file_dff.py:43-53`), plus page count. Rank-ordered
    collect_list (sort_array of struct) keeps assembly deterministic
    under shuffle."""
    assembled = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("pe_num"), F.col("text")))),
            lambda s: s.getField("text"),
        ),
        "\n",
    )
    return pages.groupBy("fn", "channel").agg(
        F.count("*").alias("n_pages"), assembled.alias("doc_text")
    )
