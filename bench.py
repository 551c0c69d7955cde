#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line (the FINAL stdout line, kept well under 1.5 KB —
the driver's tail capture truncates longer output, which voided round 4's
bench signal):
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "e2e_reference_scale": {...}}

Everything bulky — the full e2e record, the ANN recall/latency curve, the
embedded 10x scale proof — goes to BENCH_DETAIL.json next to this script
instead of stdout.

Each query is executed to completion with the built-in noop sink
(``df.write.format("noop")`` — eagerly computes every column of every row
inside the JVM and discards it); timing includes plan + execute.

MEASUREMENT FIX (optimization r11, guide §1.4): rounds 1-10 timed
``df.foreachPartition(lambda it: None)``, which converts the result to an RDD
and pickles every row out to Python workers — cost the query itself does not
have (and it hides the query from the SQL tab). The noop sink is the
guide-sanctioned timed action. A/B on an idle box (tools/bench_action_ab.py,
sf0.1, min of 3 after warmup): foreachPartition 6.53s total vs noop 4.77s —
per query q01 0.364/0.190, q03 0.458/0.322, q05 0.618/0.467, q31 1.092/0.886,
q34 1.966/1.652, q35 1.128/0.930, q41 0.622/0.209, q45 0.283/0.111. The old
numbers stay in OPTIMIZATION_r11.md and BENCH_r10.json for comparison.

Every query gets one untimed warmup pass (JVM + whole-stage-codegen
compilation is per-plan, and the HOF-heavy hash pipelines pay multi-second
first-run codegen costs), then the reported time is the best of 3 timed
runs — steady-state throughput, the quantity that scales to a long-lived
cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from tickerlake_spark.plans import QUERIES
    from tickerlake_spark.plans.catalog import _ensure_loaded
    from tickerlake_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark(
        app_name="tickerlake-bench",
        # progress bars share the captured output stream with the JSON line;
        # keep the tail clean so the driver's parser sees only the payload
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: s for n, s in QUERIES.items() if s.bench}

    # Box-condition telemetry on the HEADLINE block too (VERDICT r9 item 2):
    # r9's +22% headline drift cost a full adjudication cycle that this one
    # JSON block would have pre-answered. Probed before the timed runs so
    # loadavg reflects the box, not this benchmark.
    import tempfile

    from tools.bench_e2e import host_conditions

    host = host_conditions(tempfile.gettempdir())

    def _run(df) -> None:
        # guide §1.4: noop sink — computes every column of every row in the
        # JVM, no RDD conversion / row pickling (see MEASUREMENT FIX above)
        df.write.format("noop").mode("overwrite").save()

    # Warmup: run every bench query once (per-plan codegen compilation).
    for spec in bench_queries.values():
        _run(spec.fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, spec in bench_queries.items():
        spark.sparkContext.setJobDescription(f"bench:{name}")
        runs = []
        for _ in range(3):
            # MEASUREMENT FIX 2 (optimization r12, VERDICT r11 item 2a —
            # the one sanctioned bench edit this round, additions only):
            # clear the Spark SQL cache before EVERY timed rep. Operators
            # with internal .persist() diamonds (q41's signature table)
            # otherwise serve reps 2-3 (and anything the warmup cached)
            # from memory, so best-of-3 partially timed cached reads.
            # Every rep now computes from the parquet inputs. Old numbers
            # (r11 and this round's pre-change baseline) are preserved in
            # OPTIMIZATION_r12.md.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _run(spec.fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 4)
        spark.sparkContext.setJobDescription(None)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "host": host,
    }

    detail = dict(out)

    # Reference-scale end-to-end run (~12.5M bars, the exact scale BASELINE.md
    # quotes): silver full rewrite + gold + one-day incremental append through
    # the real pipeline entry points — the no-extrapolation baseline
    # comparison. ~80s on local[32]; SPARK_GRAFT_E2E=0 skips while iterating.
    if os.environ.get("SPARK_GRAFT_E2E", "1") != "0":
        from tools.bench_e2e import run as e2e_run

        e2e = e2e_run()
        detail["e2e_reference_scale"] = e2e
        # compact summary only on stdout (full record incl. baseline ranges
        # and row counts lives in BENCH_DETAIL.json)
        out["e2e_reference_scale"] = {
            "bars": e2e["bars"],
            "silver_sec": e2e["silver_sec"],
            "gold_sec": e2e["gold_sec"],
            "silver_append_sec": e2e["silver_append_sec"],
            "gold_incremental_sec": e2e["gold_incremental_sec"],
        }

    # ANN quality/speed curve (VERDICT r3 item 5): recall@10 + latency for
    # every approximate index vs brute force, live at this sf. ~90s;
    # SPARK_GRAFT_ANN=0 skips while iterating. Detail-file only.
    if os.environ.get("SPARK_GRAFT_ANN", "1") != "0":
        from tools.bench_ann import run as ann_run

        detail["ann_recall_latency"] = ann_run(spark, sf_dir)

    # Scale-headroom proof: cached one-off 10x run (tools/bench_scale.py
    # regenerates; ~8 min). Detail-file only — embedding it in stdout is what
    # truncated round 4's bench line.
    here = os.path.dirname(os.path.abspath(__file__))
    proof = os.path.join(here, "SCALE_PROOF.json")
    if os.path.exists(proof):
        with open(proof) as f:
            detail["scale_proof"] = json.load(f)

    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=2)

    line = json.dumps(out)
    assert len(line) < 1500, f"bench stdout line too long ({len(line)}B)"
    sys.stdout.flush()
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
