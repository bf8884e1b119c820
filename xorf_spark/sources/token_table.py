"""Sources for the mandated input shape: an (Iceberg/parquet) table of
pre-tokenized training sequences ``(doc_id string, tokens array<int>,
n_tok int, source string)``.

Two providers:

- ``docs_tokens(spark, n)`` — deterministic synthetic table (FIXTURES.md F1),
  generated entirely with Catalyst expressions from ``spark.range`` so it
  scales to any row count with no driver-side loop and no external data.
  Length distribution: 90% of docs 16–512 tokens, 9% 512–4096, 1% 4096–16384
  (long-tail to exercise shuffle skew); ``source`` is skewed categorical
  (web 80% / books 15% / code 4.9% / rare 0.1%).

- ``tokens_from_documents(df)`` — derives the same shape from the driver's
  ``documents`` test table (deterministic whitespace tokenization + stable
  per-word ids), so the driver's parquet can feed every token-keyed query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50_257


def docs_tokens(spark: SparkSession, n: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic token table, all JVM-side expressions."""
    df = spark.range(0, n, numPartitions=partitions) if partitions else spark.range(n)
    h = lambda salt: F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))  # noqa: E731
    bucket = F.pmod(h("len_bucket"), F.lit(100))
    length = (
        F.when(bucket < 90, F.lit(16) + F.pmod(h("len_a"), F.lit(512 - 16)))
        .when(bucket < 99, F.lit(512) + F.pmod(h("len_b"), F.lit(4096 - 512)))
        .otherwise(F.lit(4096) + F.pmod(h("len_c"), F.lit(16384 - 4096)))
    ).cast("int")
    src_bucket = F.pmod(h("source"), F.lit(1000))
    source = (
        F.when(src_bucket < 800, F.lit("web"))
        .when(src_bucket < 950, F.lit("books"))
        .when(src_bucket < 999, F.lit("code"))
        .otherwise(F.lit("rare"))
    )
    return (
        df.withColumn("n_tok", length)
        .withColumn(
            "tokens",
            F.expr(
                f"transform(sequence(1, n_tok), "
                f"j -> cast(pmod(xxhash64(id, {seed}, 7, j), {VOCAB}) as int))"
            ),
        )
        .select(
            F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
            "tokens",
            "n_tok",
            source.alias("source"),
        )
    )


def tokens_from_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Map the driver's ``documents`` table (doc_id, text, lang, source, …)
    to the mandated token-table shape.

    Tokenization is a deterministic whitespace split; token ids are stable
    per-word hashes into the vocab (``pmod(xxhash64(word), VOCAB)``) — all
    Catalyst expressions, reproducible in ANSI SQL for oracle checks.
    """
    words = F.split(F.col(text_col), " ")
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(
            f"transform(split({text_col}, ' '), "
            f"w -> cast(pmod(xxhash64(w), {VOCAB}) as int))"
        ).alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        F.col("source"),
    )
