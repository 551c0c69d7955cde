#!/usr/bin/env python
"""Time run_gold full rebuild at 10x on the prepared corpus (fresh gold)."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
ROOT = "/tmp/tickerlake_10x_r9"

from tickerlake_spark.pipeline import run_gold
from tickerlake_spark.session import get_spark
from tickerlake_spark.storage import Catalog, Checkpoints

spark = get_spark(app_name="exp-gold-full")
spark.sparkContext.setLogLevel("ERROR")
catalog = Catalog(root=ROOT)
shutil.rmtree(os.path.join(ROOT, "gold"), ignore_errors=True)
cp = Checkpoints(path=os.path.join(ROOT, "checkpoints.json"))
t0 = time.perf_counter()
g = run_gold(spark, catalog, checkpoints=cp, with_counts=False)
print("GOLD_FULL_SEC", round(time.perf_counter() - t0, 1), flush=True)
print(json.dumps(g.get("timings"), indent=1), flush=True)
