"""JSONL document ingestion — the realistic entry point of a web-scale
curation pipeline (WARC-derived corpora ship as JSONL/JSONL.gz).

100 TB rules baked in:

- **Explicit schema, never inference.** Schema inference is a full extra
  pass over the data before the real read; at corpus scale that doubles
  ingest cost and silently widens types on dirty rows.
- **PERMISSIVE with a captured corrupt column.** A malformed line must
  neither kill a 10⁶-task job (FAILFAST) nor silently vanish
  (DROPMALFORMED loses the ability to audit loss): corrupt lines are
  routed to a second DataFrame the caller can count, sample, and
  quarantine.
- gzip/zstd handled by Spark's codec inference from the file extension
  (note: .gz is NOT splittable — one task per file; prefer many
  medium files or zstd/bzip2 for parallel ingest of huge archives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the driver test corpus's document shape
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.IntegerType()),
])

_CORRUPT = "_xorf_corrupt_record"


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: T.StructType = DOCUMENTS_SCHEMA
                         ) -> tuple[DataFrame, DataFrame]:
    """``(good, corrupt)`` DataFrames for JSONL at ``path``.

    ``good`` carries exactly ``schema``'s columns (rows where every field
    parsed); ``corrupt`` carries ``(raw_line)`` for quarantine/audit.
    A row missing fields is NOT corrupt (nulls are data — filter them
    with the pipeline's quality operators); only unparseable lines land
    in ``corrupt``.
    """
    # read.text + from_json, NOT read.json with columnNameOfCorruptRecord:
    # Spark disallows any plan whose referenced scan columns are only the
    # internal corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    # RECORD_COLUMN) and its suggested workaround is .cache() — a
    # non-starter at corpus scale. Parsing each line with from_json runs
    # the same Jackson parser, keeps both branches plain projections of
    # one text scan, and stays fully column-prunable.
    raw = spark.read.text(path)
    full = T.StructType(list(schema.fields)
                        + [T.StructField(_CORRUPT, T.StringType())])
    # from_json's PERMISSIVE mode fills a struct of nulls on a malformed
    # line (indistinguishable from `{}`, which is DATA) — its own
    # columnNameOfCorruptRecord field is the unambiguous discriminator
    parsed = raw.select(
        F.col("value"),
        F.from_json("value", full,
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": _CORRUPT}).alias("__d"))
    # a line that is the bare JSON literal `null` (or blank) parses to a
    # NULL struct with a NULL corrupt field — data-free, uncountable as
    # an all-null "good" row, so it belongs in the quarantine. `{}` by
    # contrast is a NON-null struct of null fields: data, kept good.
    is_good = F.col("__d").isNotNull() & F.col(f"__d.{_CORRUPT}").isNull()
    good = (parsed.where(is_good)
            .select(*[F.col(f"__d.{f.name}").alias(f.name)
                      for f in schema.fields]))
    corrupt = parsed.where(~is_good).select(F.col("value").alias("raw_line"))
    return good, corrupt
