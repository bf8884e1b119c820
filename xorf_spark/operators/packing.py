"""Sequence packing: lay documents end-to-end in a deterministic order and
chunk the concatenated token stream into fixed-length training sequences —
the standard LLM-pretraining data op ("pack to seq_len").

The hard part at scale is the GLOBAL running token offset. A naive window
cumsum over one global ordering is a single-reducer bottleneck; this
implementation uses the two-phase pattern:

1. range-repartition + sort by the deterministic pack key (md5 of id —
   a reproducible shuffle of the corpus, same trick as
   ``deterministic_sample``), so partitions hold contiguous key ranges;
2. per-partition window cumsum (parallel) + a tiny driver-side prefix sum
   of per-partition totals broadcast back as offsets.

Every document gets its exact global byte... token offset, start/end pack
ids, and intra-pack position — reproducible across runs and cluster sizes,
and SQL-checkable (the oracle recomputes the same order + cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                   n_tok_col: str = "n_tok", salt: str = "",
                   num_partitions: int | None = None) -> DataFrame:
    """Assign each document its global token offset in the packed stream
    and the pack ids it lands in.

    Output adds: ``pack_key`` (the deterministic order key),
    ``start_offset`` (global token offset of the doc's first token),
    ``start_pack`` / ``end_pack`` (= offset // seq_len of first/last
    token — a doc crossing a boundary spans multiple packs), and
    ``pack_pos`` (offset within its start pack).
    """
    from ..functions.registry import md5long

    key = md5long(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    keyed = df.withColumn("pack_key", key)
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "pack_key")
    else:
        keyed = keyed.repartitionByRange("pack_key")
    keyed = keyed.withColumn("__pid", F.spark_partition_id())

    # parallel per-partition cumsum... (id tie-break for exact determinism
    # in the astronomically-unlikely event of a 60-bit key collision)
    w = (Window.partitionBy("__pid").orderBy("pack_key", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = keyed.withColumn(
        "__local_end", F.sum(F.col(n_tok_col).cast("long")).over(w))

    # ...plus a KB-sized driver prefix-sum of per-partition totals
    totals = sorted(
        (r["__pid"], r["t"]) for r in
        keyed.groupBy("__pid").agg(
            F.sum(F.col(n_tok_col).cast("long")).alias("t")).collect())
    offsets = {}
    running = 0
    for pid, t in totals:
        offsets[pid] = running
        running += int(t)
    off_col = F.coalesce(*[
        F.when(F.col("__pid") == pid, F.lit(off))
        for pid, off in offsets.items()
    ], F.lit(0)) if offsets else F.lit(0)

    start = off_col + F.col("__local_end") - F.col(n_tok_col).cast("long")
    end_incl = off_col + F.col("__local_end") - F.lit(1)
    return (local
            .withColumn("start_offset", start)
            .withColumn("start_pack",
                        (F.col("start_offset") / seq_len).cast("long"))
            .withColumn("end_pack", (end_incl / seq_len).cast("long"))
            .withColumn("pack_pos",
                        F.col("start_offset") % seq_len)
            .drop("__pid", "__local_end"))
