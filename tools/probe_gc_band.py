"""8-rep spread probe for the allocation-heavy ambient band
(VERDICT r11 task #5): dedup_minhash_lsh_docs + similarity_ann_ivfpq
at sf0.1. Run once per JVM config (heap/GC pins are session-wide):

    python .probe/probe_gc_band.py            # current session.py
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from solar_logger_spark.session import get_spark

spark = get_spark(app_name="gc-band-probe")
spark.sparkContext.setLogLevel("ERROR")
print("loadavg", os.getloadavg(), flush=True)
print("heap", spark.sparkContext._conf.get("spark.driver.memory"),
      "extra", spark.sparkContext._conf.get("spark.driver.extraJavaOptions"),
      flush=True)

import __spark_entry__ as entry
qmap = entry.queries()
sf = "/root/testdata/sf0.1"
names = ["dedup_minhash_lsh_docs", "similarity_ann_ivfpq"]

# canary
t0 = time.monotonic()
spark.range(500_000_000).selectExpr("sum(CAST(id AS DOUBLE) * id)").collect()
print(f"canary {time.monotonic()-t0:.3f}s", flush=True)

for name in names:
    qmap[name](spark, sf).write.format("noop").mode("overwrite").save()  # warm
reps = {n: [] for n in names}
for _ in range(8):
    for n in names:
        t0 = time.monotonic()
        qmap[n](spark, sf).write.format("noop").mode("overwrite").save()
        reps[n].append(round(time.monotonic() - t0, 2))
for n in names:
    r = reps[n]
    print(f"{n}: reps={r} min={min(r)} max={max(r)} spread={max(r)/min(r):.2f}",
          flush=True)
