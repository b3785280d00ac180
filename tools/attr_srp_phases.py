import json, sys, time
sys.path.insert(0, "/root/repo/src"); sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[32]")
    .appName("srp-phases")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import numpy as np
from sparkclone.vector import _srp_buckets_udf, _srp_hyperplanes, auto_n_planes, cosine, parquet_row_count
from pyspark.sql import Window

sf_dir = "/root/testdata/sf0.1"
n_rows = parquet_row_count(f"{sf_dir}/embeddings.parquet")
df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
n_planes = auto_n_planes(n_rows)
n_tables, seed, dim, k = 12, 42, 64, 3
print("n_rows", n_rows, "planes", n_planes)
t = {}
def mark(name, t0): t[name] = round(time.perf_counter()-t0, 3)

base = df.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
planes = np.stack([np.asarray(_srp_hyperplanes(dim, n_planes, seed + 7919 * tt)) for tt in range(n_tables)])
t0=time.perf_counter()
tb = base.select("id", F.posexplode(_srp_buckets_udf(planes)(F.col("v"))).alias("table","bucket")).localCheckpoint(eager=True)
mark("bucket_udf", t0)
left = tb.select("table","bucket",F.col("id").alias("query_id"))
right = tb.select("table","bucket",F.col("id").alias("neighbor_id"))
t0=time.perf_counter()
cand = (left.join(right, ["table","bucket"]).where(F.col("query_id")!=F.col("neighbor_id"))
        .select("query_id","neighbor_id").dropDuplicates()).localCheckpoint(eager=True)
mark("cand_join_dedup", t0)
print("cand rows", cand.count())
qv = base.select(F.col("id").alias("query_id"), F.col("v").alias("__qv"))
cv = base.select(F.col("id").alias("neighbor_id"), F.col("v").alias("__cv"))
t0=time.perf_counter()
scored = (cand.join(qv,"query_id").join(cv,"neighbor_id")
          .withColumn("cosine", F.round(cosine(F.col("__qv"),F.col("__cv")),5)))
w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
out = (scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank")<=3)
       .select("query_id","neighbor_id","cosine","rank"))
out.write.format("noop").mode("overwrite").save()
mark("score_window", t0)
print(json.dumps(t))
# repeat end-to-end for steady state
from sparkclone.vector import srp_topk
for i in range(2):
    t0=time.perf_counter()
    srp_topk(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), k=3, n_planes=None, n_tables=12, seed=42, dim=64, n_rows=n_rows).write.format("noop").mode("overwrite").save()
    print("e2e", round(time.perf_counter()-t0,3))
