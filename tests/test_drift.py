"""PSI drift monitor: a source whose length distribution matches the
corpus scores near zero; a shifted source scores clearly higher; every
per-bucket contribution (p-q)ln(p/q) is sign-aligned so PSI is
non-negative up to ln rounding."""

from __future__ import annotations

from etl_database_spark.queries import load_all


def test_psi_separates_shifted_source(spark, tmp_path):
    rows = []
    # source "same": lengths uniform over [100, 500) — the corpus bulk
    for i in range(475):
        rows.append((i, "x" * (100 + (i * 7) % 400), "same"))
    # source "shifted": lengths concentrated high [800, 1000)
    for i in range(475, 500):
        rows.append((i, "x" * (800 + (i * 7) % 200), "shifted"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df = df.withColumn("n_chars", __import__("pyspark.sql.functions", fromlist=["F"]).length("text"))
    path = str(tmp_path / "documents.parquet")
    df.select("doc_id", "text", "source", "n_chars").write.parquet(path)
    # the query reads <sf_dir>/documents.parquet
    out = {
        r.source: r.psi
        for r in load_all()["source_length_drift_psi"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"same", "shifted"}
    assert out["shifted"] > out["same"]
    assert out["shifted"] > 1.0          # gross shift → large PSI
    assert out["same"] < 0.25            # bulk-matching source stays low
    assert all(v > -1e-6 for v in out.values())
