"""One-decade scale validation on REALISTIC sf1 data (VERDICT r11
item 3).

tools/stress_scale.py's 10x corpus is deliberately ADVERSARIAL for the
dedup/ANN families: every source document becomes a 10-copy near-dup
family (45 extra true pairs per doc) and every embedding a 10-copy
exact-dup cluster, so its ratios measure worst-case pair-volume
growth, not the real-data slope.  This tool builds the complementary
fixture — an sf1 whose replicas are genuinely DISTINCT rows, the way
a real 10x corpus would be — and records min-of-2 sf0.1 -> sf1 wall
ratios for the heavy tier + dedup/ANN families in one session:

- documents: a per-replica token is INTERLEAVED every 4th word (a
  higher-order transform, JVM-side), so every 3-gram shingle window
  crosses an injected token and replica pairs land far BELOW every
  near-dup threshold (measured 3-gram Jaccard ~0.0 vs the stress
  corpus's ~0.97) — duplicate-pair volume stays at the source corpus's
  natural rate instead of growing 45x.
- embeddings: each replica's vector is ROTATED by `rep` positions
  (slice+concat, norm-preserving) — distinct directions, realistic
  cosine distribution, no synthetic exact-dup clusters.
- keyed tables: the same disjoint key shifts as stress_scale (FKs stay
  consistent), which at 10 replicas lands lineitem at ~6M rows = sf1.

Linear ops on 32 cores should land near 10x (the sf0.1 runs leave
cores idle, so <10x is common); anything well past ~12-13x is flagged
SUPER-LINEAR for adjudication in SCALE.md.

Usage: python tools/sf1_validate.py [replicas=10] [query ...]
       python tools/sf1_validate.py all          # every benched query,
           sf0.1 denominators read from BENCH_DETAIL.json (latest full
           quiet bench at this HEAD) instead of re-measured — halves
           the sweep and keeps the denominators the committed ones
Writes /tmp/sf1_real (re-used if present; delete to rebuild) and
prints one JSON line per query: {"query", "sf01_s", "sf1_s", "ratio"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (  # noqa: E402
    get_spark,
)
from tools.stress_scale import KEYED, SRC  # noqa: E402

# The families the 100 TB posture claims rest on (VERDICT r11 item 3):
# the iterative/graph heavy tier, the dedup + ANN surfaces, and two
# linear scan-agg controls to calibrate what "10x" costs on this host.
VALIDATE_QUERIES = [
    # linear controls
    "tpch_q1", "text_stats", "agg_pricing_summary",
    # heavy tier (bench.py HEAVY_TIER)
    "pagerank", "label_propagation", "bpe_encode", "kcore_peel",
    "shortest_hops", "triangle_count", "semantic_decontaminate",
    "table_profile", "countmin_topk", "coactivity_pairs",
    "source_minhash_overlap", "bpe_pair_counts", "mad_outliers",
    "rolling_features", "conformal_interval",
    # r12's two real scale fixes, standing members so their sf1
    # readings re-pin every round (VERDICT r12 item 6)
    "recursive_cte",
    # dedup family
    "dedup_exact", "dedup_minhash", "dedup_jaccard", "dedup_simhash",
    "dedup_containment", "dedup_winnow", "dedup_clusters",
    "dedup_corpus", "duplicated_ngram_coverage", "decontaminate",
    "split_contamination",
    # ANN / embedding family
    "ann_bruteforce", "ann_lsh", "ann_ivf", "ann_quantized",
    "hybrid_rrf", "pq_adc_topk", "embedding_near_dup", "kmeans_topics",
    "link_prediction_ra",
    # r13-continuation's two scale fixes (the BLAS auto-switch),
    # standing members so their sf1 readings re-pin every round —
    # the recursive_cte/jaccard precedent
    "knn_label_agreement", "bitext_margin_mining",
]


def build(spark, out_dir: str, replicas: int) -> None:
    for table, shifts in KEYED.items():
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        if not shifts and table in ("nation", "region"):
            base.write.mode("overwrite").parquet(dst)
            continue
        rep = base.crossJoin(
            spark.range(replicas).select(F.col("id").alias("_rep"))
        )
        for col, k in shifts.items():
            rep = rep.withColumn(col, F.col(col) + F.col("_rep") * k)
        if table == "documents":
            # distinct replicas: interleave a replica token every 4th
            # word so every 3-gram window is disrupted (rep 0 = the
            # original corpus, preserving its natural dup rate)
            tok = F.concat(F.lit("r"), F.col("_rep").cast("string"))
            rep = rep.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.zip_with(
                            F.split(F.col("text"), " "),
                            F.sequence(
                                F.lit(0),
                                F.size(F.split(F.col("text"), " ")) - 1,
                            ),
                            lambda w, i: F.when(
                                i % 4 == 3, F.concat(w, F.lit(" "), tok)
                            ).otherwise(w),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text"))
        if table == "embeddings":
            # distinct directions: rotate the vector by _rep positions
            # (norm-preserving, deterministic, no RNG)
            d = F.size(F.col("embedding"))
            r = F.col("_rep") % d
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(F.col("embedding"), r + 1, d - r),
                        F.slice(F.col("embedding"), 1, r),
                    )
                ),
            )
        # many output files, like a real sf1 ships (stress_scale lesson:
        # a single-file table scans at parallelism ~1)
        rep.drop("_rep").repartition(32).write.mode("overwrite").parquet(dst)


def main() -> int:
    args = sys.argv[1:]
    replicas = int(args[0]) if args and args[0].isdigit() else 10
    names = [a for a in args if not a.isdigit()] or VALIDATE_QUERIES
    bench_times = None
    if names == ["all"]:
        import bench

        names = list(bench.HEADLINE)
        with open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json",
        )) as fh:
            bench_times = json.load(fh)["queries"]
    out_dir = "/tmp/sf1_real"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="sf1-validate")
    t0 = time.perf_counter()
    build(spark, out_dir, replicas)
    print(f"build: {time.perf_counter() - t0:.1f}s -> {out_dir}")
    queries = entrymod.queries()

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-2: strip first-run codegen warmup
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        # bench.py's _drain_blocks lesson: dropped localCheckpoint /
        # broadcast blocks are only unpersisted after a JVM GC proves
        # them unreachable — without an explicit drain, a long sweep
        # piles every query's blocks onto whoever runs LATE (at sf1
        # sizes that read as fake SUPER-LINEAR flags; adjudicate any
        # flag with an isolated re-run before believing it)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return best

    results = []
    for name in names:
        try:
            s01 = bench_times[name] if bench_times else run(name, SRC)
            s1 = run(name, out_dir)
            ratio = round(s1 / s01, 2) if s01 > 0 else None
            row = {"query": name, "sf01_s": round(s01, 3),
                   "sf1_s": round(s1, 3), "ratio": ratio}
            if ratio is not None and ratio > 13:
                row["flag"] = "SUPER-LINEAR"
            results.append(row)
            print(json.dumps(row))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": str(e)[:200]}))
    flagged = [r["query"] for r in results if r.get("flag")]
    print(json.dumps({"n": len(results), "flagged": flagged}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
