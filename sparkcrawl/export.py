"""Corpus export — K1 (StorageServer.java:183-246).

Format parity with the reference: one line per document,
``url + '$$$' + body-with-newlines-stripped``, at most 10,000 lines per
file (StorageServer.java:210-221 rotation). Spark expresses the rotation
with ``maxRecordsPerFile`` — no driver-side cursor loop."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RECORDS_PER_FILE = 10_000  # StorageServer.java:210
SEPARATOR = "$$$"  # StorageServer.java:219


def corpus_lines(crawled: DataFrame, url_col: str = "url_norm",
                 body_col: str = "text") -> DataFrame:
    """(url, body) -> single-column 'value' lines in reference format."""
    clean = F.regexp_replace(F.col(body_col), "[\\n\\r]", "")
    return crawled.select(
        F.concat(F.col(url_col), F.lit(SEPARATOR), clean).alias("value")
    )


def export_corpus(crawled: DataFrame, out_dir: str,
                  records_per_file: int = RECORDS_PER_FILE,
                  url_col: str = "url_norm", body_col: str = "text") -> None:
    """Write the corpus as text files with reference rotation granularity."""
    (
        corpus_lines(crawled, url_col, body_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .text(out_dir)
    )
