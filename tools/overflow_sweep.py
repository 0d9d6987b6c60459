"""Adversarial max-magnitude overflow sweep (VERDICT r10 item 3).

The acf_daily int64 wrap (r9) and the discount_ladder decimal
truncation (r10) were both caught LATE, by DuckDB disagreement on
ordinary test data that happened to reach the failure magnitude.  This
sweep reaches the magnitudes on purpose: it builds a doctored corpus
whose aggregates sit just under the engine's documented int64 bounds
(int64-edge cents sums, a 100k-row single key, refund mirrors, NULLs,
timestamp ties) and runs the whole div/ppm floor-arithmetic family
through the exact driver comparison (tools/check_oracle.py) — DuckDB's
HUGEINT arithmetic is the referee: any silent Spark wrap hash-
mismatches (or DuckDB raises), loudly.

Two tiers:
  --tier a  (default): every ppm/floor oracle over events + orders +
     lineitem, with a $3M-per-period whale (the tightest family bound:
     cuped's n·Σx²·1000 < 2⁶³ caps per-user dollars at ~3e6 for 1e3
     users), a 100k-event single (user, day) key, mirrored negative
     refunds, NULL values, an all-NULL user, and a planted ts tie.
  --tier b: linear-cents-sum ops only, with an ~8e12-cents whale (the
     1e6·sum ppm edge).  Ops with squared/cross sums (cuped,
     ab_uplift_ci, gini's rank·cents) are EXCLUDED by design — their
     documented bounds are tighter; the exclusion list IS the bound
     documentation.

Usage: python tools/overflow_sweep.py [--tier a|b] [--dir /tmp/...]
Record results in SCALE.md; exit code is check_oracle's.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"

# every table check_oracle registers; non-doctored ones copy verbatim
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

TIER_A = [
    # experiment / uplift family (r9 sweep superset)
    "mann_whitney", "ks_two_sample", "gini_concentration",
    "robust_uplift", "quantile_treatment_effect", "srm_check",
    "did_readout", "cuped_adjustment", "ab_uplift_ci",
    "poisson_bootstrap", "ab_sequential_looks", "dow_anomaly",
    "funnel_arm_compare", "growth_accounting", "ndr_retention",
    "l_diversity", "benford_audit",
    # r10 events analytics
    "overdispersion_check", "precedence_mining", "user_feature_matrix",
    "session_gap_histogram", "tenure_hazard", "km_survival",
    "stratified_uplift", "funnel_windowed", "mix_shift_decomposition",
    "repeat_purchase",
    # longer-standing events ppm ops
    "churn_rate", "rate_spikes", "cusum_changepoint",
    "event_transitions", "rolling_active_users", "attribution",
    "top_paths", "session_concurrency", "latency_percentiles",
    "chi2_independence", "seasonal_backtest", "ohlc_bars",
    # orders / lineitem floor-arithmetic ops
    "discount_ladder", "order_backlog", "fk_integrity_audit",
    "rfm_segments", "mad_outliers", "quantile_bins", "trimmed_stats",
    "jackknife_spread",
    # r11 batch: distribution/concentration readouts ($5e12-cents
    # whale exercises the two-step revenue floors and the open-ended
    # top bucket), the cohort/migration/seasonality revenue curves,
    # the OLS slope decimals, the trade matrix ppm terms, and the
    # planted ts tie hits join_asof_nearest's d=0 backward branch
    "user_activity_histogram", "weekday_hour_heatmap",
    "order_size_histogram", "revenue_concentration",
    "fulfillment_lag", "return_rate_by_brand", "dim_coverage_audit",
    "cohort_ltv", "category_penetration", "time_to_conversion",
    "nation_modularity", "discount_elasticity", "spend_migration",
    "join_asof_nearest", "slo_burn", "trade_balance",
    "seasonality_index", "price_realization", "supply_concentration",
    "basket_brand_diversity", "attribution_linear", "revenue_growth",
    # r13 readouts: interpurchase hits the planted ts tie (same-day
    # 0-gap) + whale order volume; price_band_mix runs its cents floor
    # over the refund-mirrored lineitem; dau_mau's distinct-count ratio
    # meets the 100k single (user, day) key
    "interpurchase_time", "price_band_mix", "dau_mau_stickiness",
    "session_length_histogram", "degree_assortativity",
    "credit_exposure", "tax_effective_rate", "line_number_integrity",
    "order_total_reconciliation",
    # r13 late additions: abc's descending-prefix ppm and the brand
    # argmax share both floor over the refund-mirrored whale lineitem;
    # freshness's watermark math meets the whale day + planted ts tie
    "abc_classification", "single_source_risk", "freshness_audit",
]

# documents-side audits exercised on the UNDOCTORED documents table the
# sweep copies verbatim (the doctored whale lives in events/orders/
# lineitem) — included so the registry's sweep coverage stays complete
TIER_A_DOCS = [
    "metadata_consistency_audit",
]
TIER_A = TIER_A + TIER_A_DOCS

# linear-cents-sum ops that tolerate an 8e12-cents group sum (the
# 1e6·sum ppm edge).  Squared/cross-product ops are excluded: cuped &
# ab_uplift_ci (n·Σxy, n·Σx²), gini_concentration (Σrank·cents ~ n·S),
# poisson_bootstrap / robust_uplift / quantile_treatment_effect /
# mann_whitney / ks_two_sample (replicate/rank machinery multiplies
# cents by counts or weights) — their documented bounds are tighter
# than the linear edge, which is exactly what this list records.
TIER_B = [
    "srm_check", "did_readout", "stratified_uplift", "churn_rate",
    "mix_shift_decomposition", "session_gap_histogram", "tenure_hazard",
    "km_survival", "precedence_mining", "user_feature_matrix",
    "funnel_windowed", "overdispersion_check", "repeat_purchase",
    "growth_accounting", "ndr_retention", "dow_anomaly",
    "event_transitions", "rolling_active_users",
]


# Queries whose documented int64 bound this corpus EXCEEDS on purpose:
# their runtime guards must raise loudly (the first sweep run caught
# acf_daily wrapping silently here — the whale day pushes den past the
# _ppm2 bound at any sf; now DECIMAL-accumulated + guarded).
TIER_A_MUST_RAISE = ["acf_daily"]


def _doctor_events(tier: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{SRC}/events.parquet")
    next_eid = int(ev.event_id.max()) + 1
    next_uid = int(ev.user_id.max()) + 1
    rows = []

    def emit(n, uid, etype, value, ts):
        nonlocal next_eid
        rows.append(pd.DataFrame({
            "event_id": np.arange(next_eid, next_eid + n, dtype="int64"),
            "ts": pd.Series([ts] * n, dtype="datetime64[us]"),
            "user_id": np.full(n, uid, dtype="int64"),
            "event_type": etype,
            "value": np.full(n, value, dtype="float64"),
            "props": "{}",
        }))
        next_eid += n

    pre = pd.Timestamp("2024-01-10 09:00:00")
    post = pd.Timestamp("2024-01-20 15:00:00")
    if tier == "a":
        # $3M/period whale: 3000 x $999.99 pre AND post (cuped's
        # n·Σx²·1000 bound caps per-user dollars at ~3e6 here)
        emit(3000, next_uid, "purchase", 999.99, pre)
        emit(3000, next_uid, "purchase", 999.99, post)
        next_uid += 1
        # mirrored refunds: the signed-division law at magnitude
        emit(500, next_uid, "refund", -999.99, pre)
        emit(500, next_uid, "refund", -999.99, post)
        next_uid += 1
        # 100k-row single (user, day) key: count-product machinery
        # (n², rank prefixes, gap histograms, per-day Σc²)
        emit(100_000, next_uid, "view", 0.01, post)
        next_uid += 1
    else:
        # ~8e12-cents whale: 8000 x $9,999,999.99 post-period
        # (8e12 cents ≈ the 1e6·sum ppm edge at 9.2e12)
        emit(8000, next_uid, "purchase", 9_999_999.99, post)
        next_uid += 1
        emit(1000, next_uid, "refund", -9_999_999.99, pre)
        next_uid += 1
    # NULL-value rows + one all-NULL-value user + a planted exact tie
    nulls = pd.DataFrame({
        "event_id": np.arange(next_eid, next_eid + 50, dtype="int64"),
        "ts": pd.Series([post] * 50, dtype="datetime64[us]"),
        "user_id": np.full(50, next_uid, dtype="int64"),
        "event_type": "view",
        "value": np.full(50, np.nan),
        "props": "{}",
    })
    next_eid += 50
    next_uid += 1
    tie = pd.DataFrame({
        "event_id": np.arange(next_eid, next_eid + 2, dtype="int64"),
        "ts": pd.Series([pre, pre], dtype="datetime64[us]"),
        "user_id": np.full(2, next_uid, dtype="int64"),
        "event_type": ["view", "click"],
        "value": [1.0, 2.0],
        "props": "{}",
    })
    return pd.concat([ev, *rows, nulls, tie], ignore_index=True)


def _doctor_orders() -> pd.DataFrame:
    od = pd.read_parquet(f"{SRC}/orders.parquet")
    next_ok = int(od.o_orderkey.max()) + 1
    cust = int(od.o_custkey.iloc[0])
    # one customer with 5000 max-price orders on consecutive days:
    # rfm monetary sums ~5e12 cents, backlog day-carry, repeat-purchase
    # gap histogram all at magnitude
    n = 5000
    big = pd.DataFrame({
        "o_orderkey": np.arange(next_ok, next_ok + n, dtype="int64"),
        "o_custkey": np.full(n, cust, dtype="int64"),
        "o_orderstatus": "F",
        "o_totalprice": np.full(n, 9_999_999.99),
        "o_orderdate": pd.Series(
            pd.date_range("1995-01-01", periods=n, freq="h"),
            dtype="datetime64[us]",
        ),
        "o_orderpriority": "1-URGENT",
    })
    return pd.concat([od, big], ignore_index=True)


def _doctor_lineitem() -> pd.DataFrame:
    li = pd.read_parquet(f"{SRC}/lineitem.parquet")
    ok = int(li.l_orderkey.iloc[0])
    pk = int(li.l_partkey.iloc[0])
    sk = int(li.l_suppkey.iloc[0])
    # max-magnitude revenue rows at every discount bucket boundary —
    # the r10 decimal-truncation trap (rounded-double x100 a hair
    # under the integer) at cents sums ~5e12 per bucket
    n_per = 500
    frames = []
    for disc in (0.0, 0.01, 0.05, 0.10):
        frames.append(pd.DataFrame({
            "l_orderkey": np.full(n_per, ok, dtype="int64"),
            "l_partkey": np.full(n_per, pk, dtype="int64"),
            "l_suppkey": np.full(n_per, sk, dtype="int64"),
            "l_linenumber": np.arange(1, n_per + 1, dtype="int32"),
            "l_quantity": np.full(n_per, 50.0),
            "l_extendedprice": np.full(n_per, 99_999_999.99),
            "l_discount": np.full(n_per, disc),
            "l_tax": np.full(n_per, 0.08),
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Series(
                [pd.Timestamp("1996-06-15")] * n_per, dtype="datetime64[us]"
            ),
        }))
    return pd.concat([li, *frames], ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", choices=["a", "b"], default="a")
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()
    out = args.dir or f"/tmp/overflow_sweep_{args.tier}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        if t == "events":
            _doctor_events(args.tier).to_parquet(f"{out}/{t}.parquet",
                                                 index=False)
        elif t == "orders" and args.tier == "a":
            _doctor_orders().to_parquet(f"{out}/{t}.parquet", index=False)
        elif t == "lineitem" and args.tier == "a":
            _doctor_lineitem().to_parquet(f"{out}/{t}.parquet", index=False)
        elif os.path.exists(src):
            shutil.copy(src, f"{out}/{t}.parquet")
    names = TIER_A if args.tier == "a" else TIER_B
    print(f"doctored corpus at {out}; sweeping {len(names)} queries "
          f"(tier {args.tier})")
    rc = subprocess.call(
        [sys.executable, os.path.join(ROOT, "tools", "check_oracle.py"),
         out, *names],
        cwd=ROOT,
    )
    if args.tier == "a":
        # bound-exceeding ops: the runtime guard must raise LOUDLY here
        # (a silent number would be a wrap) — checked in-process
        sys.path.insert(0, ROOT)
        import __spark_entry__ as entrymod
        from project_market_pulse_etl_pipeline_with_llm_integration_spark.session import (
            get_spark,
        )

        spark = get_spark(app_name="overflow-sweep-guards")
        qs = entrymod.queries()
        for name in TIER_A_MUST_RAISE:
            try:
                qs[name](spark, out).collect()
                print(f"NO-RAISE {name}: guard did not fire past its "
                      "documented bound — silent wrap risk")
                rc = 1
            except Exception as exc:
                first = str(exc).splitlines()[0][:120]
                print(f"RAISE ok {name}: {first}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
