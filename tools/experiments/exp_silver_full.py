#!/usr/bin/env python
"""Time run_silver full rewrite at 10x on the prepared corpus."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
ROOT = "/tmp/tickerlake_10x_r9"

from tickerlake_spark.pipeline import run_silver
from tickerlake_spark.session import get_spark
from tickerlake_spark.storage import Catalog, Checkpoints

spark = get_spark(app_name="exp-silver-full")
spark.sparkContext.setLogLevel("ERROR")
catalog = Catalog(root=ROOT)
shutil.rmtree(os.path.join(ROOT, "silver"), ignore_errors=True)
cp_path = os.path.join(ROOT, "checkpoints.json")
if os.path.exists(cp_path):
    os.remove(cp_path)
cp = Checkpoints(path=cp_path)
t0 = time.perf_counter()
s = run_silver(spark, catalog, cp)
print("SILVER_FULL_SEC", round(time.perf_counter() - t0, 1), flush=True)
print(json.dumps(s.get("timings"), indent=1), flush=True)
print("masks", json.dumps(s.get("indicator_masks")), flush=True)
