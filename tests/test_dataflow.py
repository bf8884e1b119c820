"""End-to-end Spark tests: token table → keys → dedup → sharded build →
broadcast/cogrouped probe → semi/anti joins → checkpoint resume.

These are the distributed counterparts of the reference's in-memory contract
(zero false negatives src/lib.rs:117-119, FPP bounds src/bfuse8.rs:203-217)
plus the north-rule requirements: merge associativity, skew defusal,
checkpoint-resumable builds with per-shard lineage metrics.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from xorf_spark import dataflow as D
from xorf_spark.sources import docs_tokens

N_DOCS = 5_000


@pytest.fixture(scope="module")
def token_df(spark):
    df = docs_tokens(spark, N_DOCS).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def built(spark, token_df):
    keys = D.doc_keys(token_df).select("key")
    shard_df = D.build_filter_df(keys, kind="bfuse8", n_shards=8).cache()
    table = D.FilterTable.from_df(shard_df, n_shards=8)
    return shard_df, table


def test_token_table_shape_and_determinism(spark, token_df):
    assert token_df.columns == ["doc_id", "tokens", "n_tok", "source"]
    # per-row invariant: n_tok == size(tokens) always (BASELINE.json input_hint)
    bad = token_df.where(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0
    # deterministic regeneration: token-array equality per row
    again = docs_tokens(spark, N_DOCS)
    diff = token_df.join(again, "doc_id").where(
        token_df["tokens"] != again["tokens"]).count()
    assert diff == 0
    # skewed source distribution present
    srcs = dict(token_df.groupBy("source").count().collect())
    assert srcs["web"] > srcs["books"] > srcs["code"]


def test_sharded_build_and_probe(spark, token_df, built):
    shard_df, table = built
    rows = shard_df.collect()
    assert 0 < len(rows) <= 8
    n_distinct = D.doc_keys(token_df).select("key").distinct().count()
    assert sum(r["n_keys"] for r in rows) == n_distinct
    # lineage/metrics present per shard (north star)
    for r in rows:
        assert r["retries"] >= 0 and r["build_secs"] > 0 and r["peel_rounds"] > 0
    # bits/entry within the BinaryFuse8 doc bound at aggregate level
    # (small shards carry fixed overhead; allow the documented small-n factor)
    assert table.bits_per_entry() < 13.0
    # zero false negatives through the full distributed path
    keys = np.array([r["key"] for r in
                     D.doc_keys(token_df).select("key").collect()],
                    dtype=np.int64)
    assert table.contains_np(keys).all()
    # FPP on fresh keys
    fresh = np.random.default_rng(5).integers(0, 2**64, 200_000, dtype=np.uint64)
    fpp = table.contains_np(fresh).mean()
    assert fpp < 0.406e-2 * 1.5


def test_contains_udf_in_where_clause(spark, token_df, built):
    _, table = built
    keyed = D.doc_keys(token_df)
    kept = table.where_member(keyed, "key")
    assert kept.count() == token_df.count()  # zero FN: every real key passes


def test_merge_associativity(spark, token_df):
    """Build at 4 shards vs 16 shards → identical membership verdicts
    (north_rule merge criterion: shards are disjoint hash ranges)."""
    keys = D.doc_keys(token_df).select("key")
    t4 = D.FilterTable.from_df(
        D.build_filter_df(keys, kind="bfuse8", n_shards=4), n_shards=4)
    t16 = D.FilterTable.from_df(
        D.build_filter_df(keys, kind="bfuse8", n_shards=16), n_shards=16)
    member = np.array([r["key"] for r in keys.distinct().collect()], dtype=np.int64)
    assert t4.contains_np(member).all()
    assert t16.contains_np(member).all()
    # both reject (almost) everything fresh; exact FPP differs per shard seed
    fresh = np.random.default_rng(6).integers(0, 2**64, 100_000, dtype=np.uint64)
    assert t4.contains_np(fresh).mean() < 0.01
    assert t16.contains_np(fresh).mean() < 0.01


def test_filter_semi_join_equals_exact(spark, token_df):
    probe = token_df.limit(2000).select("doc_id", "tokens")
    build = token_df.where(F.col("source") == "books").select("tokens")
    got = D.filter_semi_join(probe, build, "tokens", "tokens").count()
    want = probe.join(build.distinct(),
                      on=probe["tokens"] == build["tokens"],
                      how="left_semi").count()
    assert got == want


def test_filter_anti_join_equals_exact(spark, token_df):
    probe = token_df.limit(2000).select("doc_id", "tokens")
    build = token_df.where(F.col("source") == "books").select("tokens")
    got = D.filter_anti_join(probe, build, "tokens", "tokens").count()
    want = probe.join(build.distinct(),
                      on=probe["tokens"] == build["tokens"],
                      how="left_anti").count()
    assert got == want


def test_inline_semijoin_shards_by_default(spark, token_df, monkeypatch):
    """Scale-safety of the convenience path: with a small
    ``target_keys_per_shard`` the inline build must produce >1 shard (the old
    default funneled everything into n_shards=1)."""
    seen = {}
    orig = D.build_filter_df

    def spy(keys_df, **kw):
        seen["n_shards"] = kw.get("n_shards")
        return orig(keys_df, **kw)

    monkeypatch.setattr(D, "build_filter_df", spy)
    probe = token_df.limit(500).select("doc_id", "tokens")
    build = token_df.where(F.col("source") == "books").select("tokens")
    got = D.filter_semi_join(probe, build, "tokens", "tokens",
                             target_keys_per_shard=64).count()
    want = probe.join(build.distinct(), on=probe["tokens"] == build["tokens"],
                      how="left_semi").count()
    assert got == want
    assert seen["n_shards"] is not None and seen["n_shards"] > 1


def test_inline_semijoin_cogrouped_above_collect_cap(spark, token_df,
                                                     monkeypatch):
    """Above ``max_collect_fp_bytes`` the inline path must NEVER collect the
    shard table to the driver — probes route through ``probe_cogrouped``."""
    def boom(*a, **kw):
        raise AssertionError("driver collect of fingerprints on the big path")

    monkeypatch.setattr(D.FilterTable, "from_df", classmethod(
        lambda cls, *a, **kw: boom()))
    probe = token_df.limit(1000).select("doc_id", "tokens")
    build = token_df.where(F.col("source") == "books").select("tokens")
    got = D.filter_semi_join(probe, build, "tokens", "tokens",
                             max_collect_fp_bytes=0).count()
    want = probe.join(build.distinct(), on=probe["tokens"] == build["tokens"],
                      how="left_semi").count()
    assert got == want
    got_anti = D.filter_anti_join(probe, build, "tokens", "tokens",
                                  max_collect_fp_bytes=0).count()
    assert got_anti == probe.count() - want


def test_staged_build_pre_dedup_membership_unchanged(spark, tmp_path):
    """pre_dedup (batch np.unique in the spill writer) must not change
    membership: zero FN on the distinct key set, and on an
    already-distinct input the shards are byte-identical to the plain
    staged build (same raw counts -> same layout -> same seed schedule)."""
    distinct = spark.range(40_000).select(F.xxhash64("id").alias("key"))
    dup4 = spark.range(160_000).select(
        F.xxhash64(F.col("id") % 40_000).alias("key"))

    a = {r["shard_id"]: r for r in D.build_filter_df_staged(
        distinct, str(tmp_path / "a"), kind="bfuse8", n_shards=4).collect()}
    b = {r["shard_id"]: r for r in D.build_filter_df_staged(
        distinct, str(tmp_path / "b"), kind="bfuse8", n_shards=4,
        pre_dedup=True).collect()}
    assert set(a) == set(b)
    for sid in a:
        assert a[sid]["fingerprints"] == b[sid]["fingerprints"]

    # duplicate-heavy input: zero FN on the distinct set either way;
    # pre_dedup sizes by the (smaller) deduped count
    c = D.build_filter_df_staged(dup4, str(tmp_path / "c"), kind="bfuse8",
                                 n_shards=4, pre_dedup=True)
    t = D.FilterTable.from_df(c, n_shards=4, check_size=False)
    assert t.where_member(distinct, "key").count() == 40_000
    assert t.n_keys == 40_000  # builder saw the deduped stream


def test_from_df_load_refuse_oversize_driver_collect(spark, token_df,
                                                     tmp_path):
    """r4 verdict finding #2: the PUBLIC FilterTable.load/from_df on a
    multi-GB shard table must refuse (pre-summed from num_slots metadata,
    never by reading the fingerprints) instead of OOMing the driver; the
    message points at the distributed probe paths."""
    import os
    import pytest

    keys = D.doc_keys(token_df).select("key")
    path = os.path.join(str(tmp_path), "ftable")
    D.build_filter_table(keys, path, kind="bfuse8", n_shards=4)
    # tiny cap: the real table exceeds it -> loud refusal, both entry points
    with pytest.raises(ValueError, match="probe_cogrouped"):
        D.FilterTable.load(spark, path, max_collect_fp_bytes=16)
    with pytest.raises(ValueError, match="max_collect_fp_bytes"):
        D.FilterTable.from_df(spark.read.parquet(path),
                              max_collect_fp_bytes=16)
    # default cap (4 GiB) admits the small table; probes still work
    t = D.FilterTable.load(spark, path, n_shards=4)
    assert t.where_member(keys, "key").count() == keys.distinct().count()
    # the estimate is the true byte total (num_slots x width == len(bytes))
    est_true = t.total_fingerprint_bytes
    with pytest.raises(ValueError):
        D.FilterTable.load(spark, path, max_collect_fp_bytes=est_true - 1)
    D.FilterTable.load(spark, path, max_collect_fp_bytes=est_true)


def test_semijoin_backstop_broadcasts_small_build_side(spark, token_df):
    from xorf_spark.plans.inspect import explain_str
    probe = token_df.limit(500).select("doc_id", "tokens")
    build = token_df.where(F.col("source") == "books").select("tokens")
    plan = explain_str(
        D.filter_semi_join(probe, build, "tokens", "tokens"), "formatted")
    assert "BroadcastHashJoin" in plan, plan


def test_shingle_keys(spark, token_df):
    sk = D.shingle_keys(token_df, k=8)
    # every doc with ≥8 tokens yields size-k+... n-k+1 shingles
    want = token_df.where(F.size("tokens") >= 8).select(
        F.sum(F.size("tokens") - 8 + 1)).collect()[0][0]
    assert sk.count() == want
    # shingle keys are long-typed and deduplicable
    assert sk.select("key").distinct().count() > 0


def test_cogrouped_probe_matches_broadcast(spark, token_df, built):
    shard_df, table = built
    keyed = D.doc_keys(token_df).select("key").limit(3000)
    got = D.probe_cogrouped(keyed, shard_df, n_shards=8)
    rows = got.collect()
    keys = np.array([r["key"] for r in rows], dtype=np.int64)
    want = table.contains_np(keys)
    np.testing.assert_array_equal(np.array([r["member"] for r in rows]), want)
    assert all(r["member"] for r in rows)  # all inserted → all true


def test_checkpoint_resume(spark, token_df, tmp_path):
    """Interrupted build resumes to a byte-identical shard table."""
    path_full = os.path.join(str(tmp_path), "full")
    path_resume = os.path.join(str(tmp_path), "resumed")
    keys = D.doc_keys(token_df).select("key")
    D.build_filter_table(keys, path_full, kind="bfuse8", n_shards=8)

    # simulate a killed job: only shards 0..2 committed
    partial = spark.read.parquet(path_full).where(F.col("shard_id") < 3)
    partial.write.parquet(path_resume)
    resumed = D.build_filter_table(keys, path_resume, kind="bfuse8", n_shards=8)

    full = {r["shard_id"]: r for r in spark.read.parquet(path_full).collect()}
    res = {r["shard_id"]: r for r in resumed.collect()}
    assert set(full) == set(res)
    for sid in full:
        assert full[sid]["seed"] == res[sid]["seed"]
        assert full[sid]["fingerprints"] == res[sid]["fingerprints"]


def test_build_filter_table_keydef_guard(spark, token_df, tmp_path):
    """r4 review finding: a resumed table built under an OLD key
    definition must not silently mix with shards built under a new one
    (probes derive the current definition and would miss the old shards
    — silent false negatives). The _XORF_KEYDEF stamp fails the resume
    loudly on mismatch, and refuses to resume an unverifiable legacy
    (unstamped) table under an explicit key_def."""
    import pytest

    keys = D.doc_keys(token_df).select("key")
    tag8 = D.shingle_key_def(8)

    # stamped build + same-tag resume: fine (resume appends nothing new)
    p1 = os.path.join(str(tmp_path), "stamped")
    D.build_filter_table(keys, p1, kind="bfuse8", n_shards=4, key_def=tag8)
    D.build_filter_table(keys, p1, kind="bfuse8", n_shards=4, key_def=tag8)

    # definition changed (k=8 -> k=5): resume must raise, not mix
    with pytest.raises(ValueError, match="key-definition mismatch"):
        D.build_filter_table(keys, p1, kind="bfuse8", n_shards=4,
                             key_def=D.shingle_key_def(5))

    # legacy table (no stamp) + explicit key_def: unverifiable -> raise
    p2 = os.path.join(str(tmp_path), "legacy")
    D.build_filter_table(keys, p2, kind="bfuse8", n_shards=4)
    with pytest.raises(ValueError, match="no key-definition stamp"):
        D.build_filter_table(keys, p2, kind="bfuse8", n_shards=4,
                             key_def=tag8)
    # legacy + key_def=None keeps working (both unversioned)
    D.build_filter_table(keys, p2, kind="bfuse8", n_shards=4)

    # r4 advice #2: resume=False still APPENDS to an existing table, so
    # the stamp must govern it too — previously the guard read the stamp
    # only under resume=True, letting resume=False both mix definitions
    # and overwrite the sidecar with the new tag
    with pytest.raises(ValueError, match="key-definition mismatch"):
        D.build_filter_table(keys, p1, kind="bfuse8", n_shards=4,
                             resume=False, key_def=D.shingle_key_def(5))
    assert D._read_keydef(p1) == tag8  # sidecar NOT overwritten
    # resume=False onto a non-empty UNSTAMPED table with an explicit
    # key_def is equally unverifiable
    with pytest.raises(ValueError, match="no key-definition stamp"):
        D.build_filter_table(keys, p2, kind="bfuse8", n_shards=4,
                             resume=False, key_def=tag8)
    # resume=False on a FRESH path with a key_def stamps and builds
    p3 = os.path.join(str(tmp_path), "fresh_norese")
    D.build_filter_table(keys, p3, kind="bfuse8", n_shards=4,
                         resume=False, key_def=tag8)
    assert D._read_keydef(p3) == tag8


def test_skew_defusal_plan(spark, token_df):
    """Doc-length/source skew cannot reach the build: sharding is on the
    hashed key, which is uniform — assert shard sizes are balanced even
    though doc lengths and sources are heavily skewed."""
    keys = D.doc_keys(token_df).select("key").distinct()
    sizes = (keys.withColumn("shard_id", D.shard_id_col("key", 8))
             .groupBy("shard_id").count().collect())
    counts = np.array([r["count"] for r in sizes], dtype=float)
    assert counts.size == 8
    assert counts.max() / counts.min() < 1.3  # near-uniform


def test_staged_build_equals_oneshot(spark, token_df, tmp_path):
    """build_filter_df_staged (JVM shuffle→parquet stage + file-reading
    python stage) must produce byte-identical shards to the one-shot build
    (same seed schedule, same per-shard key sets)."""
    keys = D.doc_keys(token_df).select("key")
    one = {r["shard_id"]: (r["seed"], r["n_keys"], bytes(r["fingerprints"]))
           for r in D.build_filter_df(
               keys, kind="bfuse8", n_shards=4,
               uniform_random=False).collect()}
    staged = {r["shard_id"]: (r["seed"], r["n_keys"], bytes(r["fingerprints"]))
              for r in D.build_filter_df_staged(
                  keys, str(tmp_path / "stage"), kind="bfuse8", n_shards=4,
                  uniform_random=False).collect()}
    assert staged == one


def test_staged_resumable_table(spark, token_df, tmp_path):
    """Checkpoint-resume through the staged path: half-committed table +
    staged resume == clean build, byte-identical shards."""
    keys = D.doc_keys(token_df).select("key")
    clean = {r["shard_id"]: bytes(r["fingerprints"])
             for r in D.build_filter_df(keys, kind="bfuse8", n_shards=4,
                                        uniform_random=False).collect()}
    path = str(tmp_path / "tbl")
    # pretend shards 0 and 1 were committed by an interrupted run
    full = D.build_filter_df(keys, kind="bfuse8", n_shards=4,
                             uniform_random=False)
    full.where(F.col("shard_id") < 2).write.parquet(path)
    out = D.build_filter_table(keys, path, kind="bfuse8", n_shards=4,
                               stage_dir=str(tmp_path / "stage"),
                               uniform_random=False)
    got = {r["shard_id"]: bytes(r["fingerprints"]) for r in out.collect()}
    assert got == clean


def test_probe_staged_counts_and_members(spark, tmp_path):
    """Staged probe (probe-side twin of the staged build): per-shard counts
    equal the broadcast-UDF verdicts — zero FN on inserted keys, FPP-level
    acceptance on held-out keys — and members_dir materializes exactly the
    passing keys."""
    import pyspark.sql.functions as F

    from xorf_spark import dataflow as D

    keys = spark.range(60_000).select(F.xxhash64("id").alias("key"))
    shard_df = D.build_filter_df(keys, kind="bfuse8", n_shards=4)
    table = D.FilterTable.from_df(shard_df, n_shards=4)

    # all inserted keys must pass (zero FN), counts must cover every probe
    res = D.probe_staged(keys, table, str(tmp_path / "st1")).collect()
    assert sum(r["n_probes"] for r in res) == 60_000
    assert sum(r["n_members"] for r in res) == 60_000

    # held-out keys: acceptance ~ FPP; members_dir holds exactly the passers
    fresh = spark.range(60_000).select(
        F.xxhash64(F.col("id") + 777_000_000).alias("key"))
    mdir = str(tmp_path / "members")
    res2 = D.probe_staged(fresh, table, str(tmp_path / "st2"),
                          members_dir=mdir)
    n_mem = sum(r["n_members"] for r in res2.collect())
    assert n_mem < 60_000 * 0.02  # bfuse8 FPP ≈ 0.39%
    written = spark.read.parquet(mdir)
    assert written.count() == n_mem
    # every materialized key re-probes TRUE through the UDF path
    udf = table.contains_udf(spark)
    assert written.where(~udf("key")).count() == 0

    # null keys are excluded JVM-side, empty probe set yields empty result
    with_null = keys.union(spark.sql("SELECT CAST(NULL AS LONG) AS key"))
    res3 = D.probe_staged(with_null, table, str(tmp_path / "st3")).collect()
    assert sum(r["n_probes"] for r in res3) == 60_000
    empty = D.probe_staged(keys.where("key IS NULL AND key IS NOT NULL"),
                           table, str(tmp_path / "st4"))
    assert empty.count() == 0


def test_probe_staged_member_commit_portable(spark, tmp_path):
    """r4 verdict finding #3: the members_dir task commit must not be
    POSIX-only. The pyarrow.fs committer is retry-idempotent: a re-run of
    the same probe over the same members_dir leaves exactly one committed
    file per shard with identical content, and on rename-REFUSING
    filesystems (HDFS semantics) a second attempt keeps the committed twin
    and discards its temp instead of crashing."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F

    from xorf_spark import dataflow as D

    keys = spark.range(30_000).select(F.xxhash64("id").alias("key"))
    shard_df = D.build_filter_df(keys, kind="bfuse8", n_shards=4)
    table = D.FilterTable.from_df(shard_df, n_shards=4, check_size=False)
    mdir = str(tmp_path / "members")
    D.probe_staged(keys, table, str(tmp_path / "sa"),
                   members_dir=mdir).collect()
    first = sorted(r["key"] for r in spark.read.parquet(mdir).collect())
    # retried task / full job re-run: same dir, same content, no dup files
    D.probe_staged(keys, table, str(tmp_path / "sb"),
                   members_dir=mdir).collect()
    again = sorted(r["key"] for r in spark.read.parquet(mdir).collect())
    assert again == first
    import glob
    for d in glob.glob(f"{mdir}/shard_id=*"):
        visible = [p for p in glob.glob(f"{d}/*")
                   if not p.rsplit("/", 1)[1].startswith(".")]
        assert len(visible) == 1, visible

    # rename-refusing filesystem: commit the same shard twice through a
    # wrapped fs — second attempt must keep the committed file and clean
    # its temp (driver-side direct drive of the worker committer)
    from pyarrow import fs as pafs

    from tests.test_operators import _RenameRefusingFS

    real_from_uri = pafs.FileSystem.from_uri
    fs2 = _RenameRefusingFS()

    class _ShimFS:  # pyarrow's FileSystem type is immutable; shim the
        @staticmethod  # MODULE attribute the committer resolves through
        def from_uri(uri):
            return fs2, real_from_uri(uri)[1]

    commit = D._make_member_committer()
    tbl = pa.table({"key": np.arange(5, dtype=np.int64)})
    hdir = str(tmp_path / "hdfsish")
    orig_fs_cls = pafs.FileSystem
    pafs.FileSystem = _ShimFS  # scoped: restore before any parquet read
    try:
        final = commit(hdir, 0, tbl)
        final2 = commit(hdir, 0, tbl)  # the "speculative twin" attempt
    finally:
        pafs.FileSystem = orig_fs_cls
    assert final == final2
    import pyarrow.parquet as pq
    got = pq.read_table(final, filesystem=pafs.LocalFileSystem())
    assert got.column("key").to_pylist() == [0, 1, 2, 3, 4]
    import os
    # listdir (not glob: it hides dotfiles) — temps cleaned, one file
    assert os.listdir(f"{hdir}/shard_id=0") == ["part-0.parquet"]


def test_where_member_null_semantics_and_members(spark):
    """where_member over a null-bearing probe column: NULL keys are
    excluded for both member and negate, and membership stays exact — an
    absolute member-count bound guards the float64 batch-corruption
    regression (null-bearing batches once silently lost every member:
    892 of ~79.9k found)."""
    import pyspark.sql.functions as F

    from xorf_spark import dataflow as D

    keys = spark.range(80_000).select(F.xxhash64("id").alias("key"))
    table = D.FilterTable.from_df(
        D.build_filter_df(keys, kind="bfuse8", n_shards=4), n_shards=4)
    probes = (spark.range(100_000)
              .select(F.when(F.col("id") % 777 == 0, None)
                      .otherwise(F.xxhash64("id")).alias("key")))
    members = {r["key"] for r in table.where_member(probes).collect()}
    non_members = {r["key"] for r in
                   table.where_member(probes, negate=True).collect()}
    assert None not in members and None not in non_members
    assert len(members) > 79_000            # ids < 80k are all members
    assert not (members & non_members)
    n_null = probes.where("key is null").count()
    assert len(members) + len(non_members) + n_null \
        == probes.select("key").distinct().count() + n_null - 1  # None once
    # wide frames keep all columns through the probe
    wide = probes.withColumn("payload", F.lit("x"))
    out = table.where_member(wide, "key")
    assert out.columns == ["key", "payload"]
    assert out.count() == len(members)



def test_where_member_accepts_narrow_int_keys(spark):
    """Integer key columns narrower than long (int32) widen losslessly
    through the probe (regression: the float64 guard once rejected them)."""
    import pyspark.sql.functions as F

    from xorf_spark import dataflow as D

    keys = spark.range(5_000).select(
        F.col("id").cast("int").alias("key"))
    table = D.FilterTable.from_df(
        D.build_filter_df(keys.select(F.col("key").cast("long")
                                      .alias("key")),
                          kind="bfuse8", n_shards=1), n_shards=1)
    assert table.where_member(keys, "key").count() == 5_000
