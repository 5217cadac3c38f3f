"""Profile the qnorm stall (VERDICT r5 item #3): which half is slow at
sf0.01 — the holistic exact-percentile grid, or the 1001-literal-array
projection?"""
import time, sys

from pyspark.sql import SparkSession, functions as F, Window

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
    "l_returnflag", "l_extendedprice"
)
li.count()  # warm the scan

c = F.col("l_extendedprice")
resolution = 1000
probs = [i / resolution for i in range(resolution + 1)]

# ---- baseline: single-prob exact percentile (isolates holistic agg cost) ----
t0 = time.time()
li.select(F.percentile(c, F.lit(0.5)).alias("g")).collect()
print(f"percentile single prob: {time.time()-t0:.2f}s")

# ---- current code: 1001-lit array percentile ----
t0 = time.time()
grid = li.select(
    F.percentile(c, F.array(*[F.lit(p) for p in probs])).alias("g")
).collect()[0]["g"]
print(f"percentile 1001-lit array: {time.time()-t0:.2f}s")

# ---- again (warm codegen cache?) ----
t0 = time.time()
li.select(
    F.percentile(c, F.array(*[F.lit(p) for p in probs])).alias("g")
).collect()
print(f"percentile 1001-lit array (2nd): {time.time()-t0:.2f}s")

# ---- SQL-literal array string (one parsed literal vs 1001 Column objects) ----
t0 = time.time()
arr_sql = "array(" + ",".join(repr(p) for p in probs) + ")"
li.select(F.expr(f"percentile(l_extendedprice, {arr_sql})").alias("g")).collect()
print(f"percentile sql-string array: {time.time()-t0:.2f}s")

# ---- half 2: projection via 1001-lit element_at ----
w = Window.partitionBy("l_returnflag").orderBy("__cc")
nn = li.where(c.isNotNull()).withColumn("__cc", c)
pos = F.percent_rank().over(w) * resolution
lo = F.least(F.floor(pos), F.lit(resolution - 1)).cast("int")
frac = pos - lo
t0 = time.time()
arr = F.array(*[F.lit(float(v)) for v in grid])
val = F.element_at(arr, lo + 1) * (1 - frac) + F.element_at(arr, lo + 2) * frac
n = nn.withColumn("q", val).agg(F.sum("q")).collect()
print(f"projection 1001-lit element_at: {time.time()-t0:.2f}s  -> {n}")

# ---- half 2b: projection via broadcast grid join ----
t0 = time.time()
grid_rows = [(i, float(grid[i]), float(grid[i + 1])) for i in range(resolution)]
gdf = spark.createDataFrame(grid_rows, "lo int, g_lo double, g_hi double")
staged = nn.withColumn("lo", lo).withColumn("__frac", pos - lo)
j = staged.join(F.broadcast(gdf), "lo")
val = F.col("g_lo") * (1 - F.col("__frac")) + F.col("g_hi") * F.col("__frac")
n = j.withColumn("q", val).agg(F.sum("q")).collect()
print(f"projection broadcast grid join: {time.time()-t0:.2f}s  -> {n}")

spark.stop()

# ---- distributed exact grid prototype ----
import math
spark2 = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
li2 = spark2.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
    "l_extendedprice"
)
t0 = time.time()
nn2 = li2.where(F.col("l_extendedprice").isNotNull()).select(
    F.col("l_extendedprice").alias("v")
)
n = nn2.count()
targets = set()
for p in probs:
    t = p * (n - 1)
    lo_i = math.floor(t)
    targets.add(lo_i)
    targets.add(min(lo_i + 1, n - 1))
P = 8
parts = nn2.repartitionByRange(P, "v").select("v", F.spark_partition_id().alias("pid"))
wp = Window.partitionBy("pid").orderBy("v")
ranked = parts.withColumn("rn", F.row_number().over(wp))
offs = (
    parts.groupBy("pid")
    .agg(F.count(F.lit(1)).alias("cnt"))
    .withColumn(
        "off",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    .select("pid", "off")
)
grank = (F.col("rn") - 1 + F.col("off")).alias("grank")
anchors = (
    ranked.join(F.broadcast(offs), "pid")
    .select(grank, "v")
    .where(F.col("grank").isin([int(x) for x in targets]))
    .collect()
)
rankmap = {r["grank"]: r["v"] for r in anchors}
grid3 = []
for p in probs:
    t = p * (n - 1)
    lo_i = math.floor(t)
    hi_i = min(lo_i + 1, n - 1)
    d = t - lo_i
    vlo, vhi = rankmap[lo_i], rankmap[hi_i]
    grid3.append(vlo + (vhi - vlo) * d)
print(f"distributed exact grid: {time.time()-t0:.2f}s")
same = all(abs(a - b) < 1e-9 for a, b in zip(grid, grid3))
exact = all(a == b for a, b in zip(grid, grid3))
print(f"grid match: approx={same} bitwise={exact}")
spark2.stop()
