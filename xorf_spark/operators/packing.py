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
    from ._util import reserve_temp_cols

    reserve_temp_cols(df, "__pid")
    keyed = df.withColumn("pack_key", key)
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "pack_key")
    else:
        keyed = keyed.repartitionByRange("pack_key")
    # Materialize the ranged partitioning ONCE before anything reads the
    # partition ids: the totals job and the final projection must both see
    # the same pid→rows mapping, and with AQE free to re-coalesce each
    # independent execution, only a materialized frame pins it.
    # localCheckpoint (eager) rather than persist(): the blocks are
    # reclaimed by the ContextCleaner as soon as the returned frame is
    # garbage-collected — a bare persist() with no unpersist path would
    # pin one cached copy of the corpus per call for the session's
    # lifetime. (localCheckpoint state dies with a lost executor; on a
    # multi-hour cluster run, write the keyed frame to durable storage
    # first and pack from that.)
    keyed = keyed.withColumn("__pid", F.spark_partition_id()) \
        .localCheckpoint(eager=True)

    # parallel per-partition cumsum... (id tie-break for exact determinism
    # in the astronomically-unlikely event of a 60-bit key collision)
    w = (Window.partitionBy("__pid").orderBy("pack_key", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = keyed.withColumn(
        "__local_end", F.sum(F.col(n_tok_col).cast("long")).over(w))

    # ...plus a KB-sized driver prefix-sum of per-partition totals, shipped
    # back as a tiny (__pid, __offset) frame and BROADCAST-joined — a
    # per-row hash probe regardless of partition count, where the previous
    # coalesce(when(__pid==0,...), when(__pid==1,...)) expression chain was
    # O(P) per row and became a multi-MB Catalyst expression at the
    # 10^4-10^5 partitions a 100 TB corpus needs.
    totals = sorted(
        (r["__pid"], r["t"]) for r in
        keyed.groupBy("__pid").agg(
            F.sum(F.col(n_tok_col).cast("long")).alias("t")).collect())
    rows = []
    running = 0
    for pid, t in totals:
        rows.append((int(pid), running))
        running += int(t)
    spark = df.sparkSession
    off_df = spark.createDataFrame(rows or [(0, 0)],
                                   "__pid int, __offset long")
    joined = local.join(F.broadcast(off_df), "__pid", "left").withColumn(
        "__offset", F.coalesce(F.col("__offset"), F.lit(0)))

    start = (F.col("__offset") + F.col("__local_end")
             - F.col(n_tok_col).cast("long"))
    end_incl = F.col("__offset") + F.col("__local_end") - F.lit(1)
    return (joined
            .withColumn("start_offset", start)
            .withColumn("start_pack",
                        (F.col("start_offset") / seq_len).cast("long"))
            .withColumn("end_pack", (end_incl / seq_len).cast("long"))
            .withColumn("pack_pos",
                        F.col("start_offset") % seq_len)
            .drop("__pid", "__local_end", "__offset"))
