"""Ad-hoc profiling of the minhash pipeline stages at a given SF.

Usage: python tools/profile_minhash.py [sf_dir] [n_shingle]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_database_spark.functions import dedup as D
from etl_database_spark.queries import table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .appName("profile_minhash")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

d = table(spark, sf_dir, "documents")
t0 = time.time()
print("docs:", d.count(), "avg_chars:", d.agg(F.avg(F.length("text"))).first()[0])

t = time.time()
sh = D.shingles(d, "text", "doc_id", n).cache()
n_sh = sh.count()
print(f"shingle rows: {n_sh}  ({time.time()-t:.2f}s)")

t = time.time()
sigs = D.minhash_signatures(sh, 32).cache()
sigs.count()
print(f"signatures: ({time.time()-t:.2f}s)")

t = time.time()
pairs = D.lsh_candidate_pairs(sigs, 32, 8).cache()
n_pairs = pairs.count()
print(f"LSH candidate pairs: {n_pairs}  ({time.time()-t:.2f}s)")

t = time.time()
agree = sum((F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}")).cast("int") for i in range(32))
est = (
    pairs.join(F.broadcast(sigs.alias("a")), pairs.id_a == F.col("a._id"))
    .join(F.broadcast(sigs.alias("b")), pairs.id_b == F.col("b._id"))
    .withColumn("est_j", agree / F.lit(32))
    .where(F.col("est_j") >= 0.5 - 0.2)
    .select("id_a", "id_b")
    .cache()
)
n_est = est.count()
print(f"est-filtered pairs: {n_est}  ({time.time()-t:.2f}s)")

t = time.time()
out = D.jaccard_verify(est, sh, 0.5)
n_out = out.count()
print(f"verified pairs: {n_out}  ({time.time()-t:.2f}s)")
print(f"TOTAL: {time.time()-t0:.2f}s")
