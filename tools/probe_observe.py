"""Probe: does DataFrame.observe() inside a broadcast anti-join's
build side report its metrics when the main job runs (no extra job)?
Also: is the call lazy (no jobs at plan time)?"""
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
sc = spark.sparkContext

df = spark.range(10_000).select(
    (F.col("id") % 100).alias("user_id"), F.col("id").alias("v")
)
counts = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
hot = counts.where(F.col("__n") > 50)  # every user has 100 events
obs = Observation()
hot_obs = hot.observe(
    obs,
    F.count(F.lit(1)).alias("dropped_users"),
    F.coalesce(F.sum("__n"), F.lit(0)).alias("dropped_events"),
)
kept = df.join(
    F.broadcast(hot_obs.select("user_id")), "user_id", "left_anti"
)

sc.setJobGroup("plan_time", "plan")
out = kept.groupBy("user_id").count()  # plan only, no action
st = sc.statusTracker()
print("jobs at plan time:", st.getJobIdsForGroup("plan_time"))

sc.setJobGroup("action_time", "action")
n = out.count()
print("result rows:", n)
t0 = time.time()
print("observed:", obs.get, f"(after {time.time()-t0:.2f}s)")
print("jobs for action:", st.getJobIdsForGroup("action_time"))
spark.stop()
