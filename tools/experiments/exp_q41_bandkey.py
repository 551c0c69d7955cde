"""q41 dedup A/B under HONEST (cold-cache) timing: dash-joined string band
key vs the raw signature-slice array key, plus a re-measure of the r9
"carry shingles through the band join" alternative.

VERDICT r11 item 2: (a) bench.py now clearCache()s before every timed rep,
so q41 stops timing cached reads; (b/c) with the cache cold every rep, the
repeated cost is the signature pipeline + the band join. Changes measured
here:

- band key = the slice array<long> itself instead of its dash-joined
  decimal string (guide §2.3): both encodings are injective, so the
  candidate pair set is IDENTICAL (asserted below); the array form skips
  4 long→string renders + a join per banded row and hashes/compares
  4 fixed-width longs instead of a ~40-byte UTF8 string.
- carried-shingles variant (VERDICT item 2c): explode band keys WITH the
  shingle arrays attached and compute jaccard straight off the self-join,
  no join-back. Re-measured for the record; at 100 TB this shuffles every
  shingle array 8x (guide §8: shuffle lightweight proxies, never
  payloads), so it is only acceptable if it wins big locally AND the
  corpus is broadcast-sized — it is rejected otherwise regardless of the
  local number.

All timings run `spark.catalog.clearCache()` before every rep (the bench's
new discipline).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickerlake_spark.session import get_spark


def string_band_keys(signatures: DataFrame, bands: int = 8, num_hashes: int = 32):
    """The pre-r12 key encoding, kept here as the A side."""
    rows = num_hashes // bands
    return signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.array_join(
                        F.transform(
                            F.slice(F.col("signature"), b * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                        "-",
                    ).alias("key"),
                ),
            )
        ).alias("__bk"),
    ).select("doc_id", "__bk.band", "__bk.key")


def pairs_with(corpus: DataFrame, bander) -> DataFrame:
    """minhash_lsh_pairs with the band-key builder swapped in."""
    from pyspark import StorageLevel

    from tickerlake_spark.operators.dedup import _band_self_join, signature_table

    sig = (
        signature_table(corpus, "text", "doc_id", 3, 32)
        .select(
            "doc_id",
            F.col("shingles").alias("__shingles"),
            F.col("signature").alias("__sig"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    banded = bander(sig.select("doc_id", F.col("__sig").alias("signature")), 8, 32)
    cand = _band_self_join(banded, 0).dropDuplicates(["id_a", "id_b"])
    shingle_sets = sig.select("doc_id", "__shingles")
    pairs = cand.join(
        shingle_sets.select(F.col("doc_id").alias("id_a"), F.col("__shingles").alias("__sa")),
        "id_a",
    ).join(
        shingle_sets.select(F.col("doc_id").alias("id_b"), F.col("__shingles").alias("__sb")),
        "id_b",
    )
    jacc = F.size(F.array_intersect("__sa", "__sb")) / F.size(F.array_union("__sa", "__sb"))
    return (
        pairs.withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b", "jaccard")
    )


def pairs_carried_shingles(corpus: DataFrame) -> DataFrame:
    """VERDICT 2c alternative: shingles ride the band explode; no join-back."""
    from tickerlake_spark.operators.dedup import band_keys, signature_table

    sig = signature_table(corpus, "text", "doc_id", 3, 32)
    banded = band_keys(
        sig.select("doc_id", "signature"), 8, 32
    ).join(sig.select("doc_id", F.col("shingles").alias("__sh")), "doc_id")
    a, b = banded.alias("a"), banded.alias("b")
    jacc = F.size(F.array_intersect("a.__sh", "b.__sh")) / F.size(
        F.array_union("a.__sh", "b.__sh")
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jacc.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
        .dropDuplicates(["id_a", "id_b"])
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-q41-bandkey")
    spark.sparkContext.setLogLevel("ERROR")

    from tickerlake_spark.operators.dedup import band_keys as array_band_keys
    from tickerlake_spark.plans.q_llm import _mutated_docs

    corpus = _mutated_docs(spark, sf_dir, exact=False)

    # pair-set identity: string key vs array key vs carried-shingles
    ref = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in pairs_with(corpus, string_band_keys).collect()
    }
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in pairs_with(corpus, array_band_keys).collect()
    }
    carried = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in pairs_carried_shingles(corpus).collect()
    }
    print(f"pairs: string={len(ref)} array={len(got)} carried={len(carried)}")
    assert ref == got == carried, "pair sets differ"
    spark.catalog.clearCache()

    def run(df: DataFrame) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    variants = {
        "q41_string_key": lambda: pairs_with(corpus, string_band_keys),
        "q41_array_key": lambda: pairs_with(corpus, array_band_keys),
        "q41_carried_shingles": lambda: pairs_carried_shingles(corpus),
    }
    for f in variants.values():
        run(f())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(8):
        for name, f in variants.items():
            times[name].append(run(f()))
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()
