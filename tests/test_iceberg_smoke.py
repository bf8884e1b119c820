"""Iceberg round-trip smoke test, gated on the runtime jar being present.

The production input is an Iceberg table (BASELINE.json input_hint); this
sandbox ships no ``iceberg-spark-runtime`` jar, so the test self-skips here
and lights up automatically the moment the environment gains the runtime.
It runs in a subprocess because Iceberg's SQL extensions and catalog must be
configured at SparkSession build time — the shared session fixture is
already up without them.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pyspark
import pytest

_JAR_DIRS = [
    os.path.join(os.path.dirname(pyspark.__file__), "jars"),
    os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars"),
]


def _iceberg_jar_present() -> bool:
    return any(
        glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        for d in _JAR_DIRS
        if os.path.isdir(d)
    )


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="no iceberg-spark-runtime jar on the classpath (sandbox)",
)
def test_iceberg_create_insert_read_time_travel(tmp_path):
    """CREATE an Iceberg table in a local hadoop catalog, append the mandated
    (doc_id, tokens, n_tok, source) shape, read it back through
    ``load_table``'s catalog path, and exercise snapshot time travel."""
    warehouse = str(tmp_path / "wh")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repo!r})
        from pyspark.sql import SparkSession
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("iceberg-smoke")
            .config("spark.sql.extensions",
                    "org.apache.iceberg.spark.extensions"
                    ".IcebergSparkSessionExtensions")
            .config("spark.sql.catalog.ice",
                    "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.ice.type", "hadoop")
            .config("spark.sql.catalog.ice.warehouse", {warehouse!r})
            .config("spark.sql.shuffle.partitions", "2")
            .getOrCreate()
        )
        from xorf_spark.sources.tables import iceberg_available, load_table
        assert iceberg_available(spark)
        spark.sql(
            "CREATE TABLE ice.db.seqs (doc_id string, tokens array<int>, "
            "n_tok int, source string) USING iceberg")
        spark.sql(
            "INSERT INTO ice.db.seqs VALUES "
            "('d0', array(1,2,3), 3, 'web'), ('d1', array(4), 1, 'code')")
        df = load_table(spark, "ice.db.seqs")
        assert df.count() == 2
        snap = spark.sql(
            "SELECT snapshot_id FROM ice.db.seqs.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").collect()[0][0]
        spark.sql("INSERT INTO ice.db.seqs VALUES ('d2', array(9), 1, 'web')")
        assert load_table(spark, "ice.db.seqs").count() == 3
        old = load_table(spark, "ice.db.seqs", snapshot_id=snap)
        assert old.count() == 2
        assert sorted(r.doc_id for r in old.collect()) == ["d0", "d1"]
        print("ICEBERG_SMOKE_OK")
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ICEBERG_SMOKE_OK" in proc.stdout
