"""Physical-plan audit: verify the plans we claim, write PLANS.md.

Checks, per representative query:
- parquet scans carry PushedFilters / pruned ReadSchema (no full-width
  scans for narrow projections)
- small dims join as BroadcastHashJoin
- aggregations are partial+final HashAggregate (map-side combine)
- hot-path expressions sit inside WholeStageCodegen spans
- pandas UDFs appear as ArrowEvalPython (Arrow-batched), never
  BatchEvalPython (pickled row-at-a-time)

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from ai_data_matching_spark.session import build_session

CHECKS = {
    "q1_pricing_summary": {
        "expect": ["PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate",
                   "HashAggregate"],
        "forbid": ["BatchEvalPython"],
        "note": "filter pushed to parquet scan; partial+final hash agg",
    },
    "q3_top_revenue_orders": {
        "expect": ["BroadcastHashJoin", "HashAggregate", "TakeOrderedAndProject"],
        "forbid": ["BatchEvalPython"],
        "note": "customer dim broadcast; revenue agg map-side combined; top-10 via per-partition heaps, rank window sees only 10 rows",
    },
    "q5_regional_revenue": {
        "expect": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["CartesianProduct", "BatchEvalPython"],
        "note": "nation/region broadcast; no cartesian anywhere",
    },
    "p7_currency_convert": {
        "expect": ["BroadcastHashJoin"],
        "forbid": ["SortMergeJoin", "BatchEvalPython"],
        "note": "17-row rates dim broadcast LEFT join (passthrough keeps rows), fact side never shuffled",
    },
    "j1_exact_block_join": {
        "expect": ["Join Inner"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
        "note": "self-join is an equi-join on (lang, block_key), never nested-loop",
    },
    "o2_o4_top_event_first_seen": {
        # struct-typed max buffers aren't UnsafeRow-fixed-width, so Spark
        # plans SortAggregate — the property that matters at scale is the
        # partial_max/partial_min BEFORE the exchange (map tasks emit one
        # row per user), plus no Window shuffle of every event row.
        "expect": ["partial_max", "partial_min", "Exchange"],
        "forbid": ["Window", "BatchEvalPython"],
        "note": "argmax as max(struct) + min in ONE map-side-combined aggregate — partial agg before the exchange; no per-group window over all rows",
    },
    "o1_global_sort_topk": {
        "expect": ["TakeOrderedAndProject"],
        "forbid": ["BatchEvalPython"],
        "note": "top-k via per-partition heaps; rank window sees only k rows",
    },
    "dedup_exact": {
        "expect": ["HashAggregate", "xxhash64", "LeftSemi"],
        "forbid": ["BatchEvalPython"],
        "note": "groupBy shuffles (hash,id) only; payload attaches via one left-semi join",
    },
    "minhash_lsh_pairs": {
        "expect": ["md5"],
        "forbid": ["BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"],
        "note": "portable sketch is fully native (md5/conv/decimal exprs, zero Python); bucket join is equi-join",
    },
    "near_dup_sim_emb_pairs": {
        "expect": ["md5"],
        "forbid": ["BatchEvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"],
        "note": "simhash branch: native 60-bit simhash, band bucket equi-join, hamming filter JVM-side; embedding branch: hyperplane-LSH bucket equi-join — no cross join in either",
    },
    "ngram_jaccard_pairs": {
        "expect": ["ArrowEvalPython", "HashAggregate"],
        "forbid": ["BatchEvalPython", "CartesianProduct"],
        "note": "shingle UDF Arrow-batched; inverted-index equi-join with hot-shingle anti-join cap",
    },
    "ngram_span_dedup": {
        "expect": ["xxhash64", "HashAggregate"],
        "forbid": ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                   "BroadcastNestedLoopJoin"],
        "note": "tokenize+gram-hash fully native; partial+final agg on the 8-byte gram hash; one slim equi-join, no self-join so no posting cap needed",
    },
    "url_canonicalize": {
        "expect": ["Project"],
        "forbid": ["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        "note": "canonicalization is one narrow zero-shuffle projection inside codegen — no UDF, no exchange",
    },
    "s6_column_mapping": {
        "expect": ["ReadSchema: struct<event_id:bigint,user_id:bigint,value:double>"],
        "forbid": ["BatchEvalPython"],
        "note": "mapper emits a pure projection - column pruning reaches the scan (3 of 5 cols read)",
    },
    "a6_match_type_breakdown": {
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BatchEvalPython"],
        "note": "exact∪fuzzy union rolled up with partial+final agg; both pair joins equi + capped",
    },
    "s7_k3_sample_payload": {
        "expect": ["TakeOrderedAndProject"],
        "forbid": ["BatchEvalPython"],
        "note": "preview = per-partition heaps, no global sort",
    },
    "a5_a7_a8_value_stats": {
        "expect": ["TakeOrderedAndProject"],
        "forbid": ["BatchEvalPython"],
        "note": "grouped stats top-k = partial agg + per-partition heaps",
    },
    "charts_expiry_timeline": {
        "expect": ["[codegen id :"],  # formatted explain's codegen-span marker
        "forbid": ["BatchEvalPython", "Exchange"],
        "note": "pure per-row projection+filter in codegen — no shuffle at any scale",
    },
    "ann_topk_bf_lsh_ivf": {
        "expect": ["BroadcastNestedLoopJoin", "ArrowEvalPython"],
        "forbid": ["BatchEvalPython", "CartesianProduct"],
        "note": "bf branch broadcasts the (small) query side by design; LSH branch replaces the cross join with a bucket equi-join; IVF branch assigns lists Arrow-batched, candidates via list_id equi-join",
    },
    "pii_scrub": {
        "expect": ["[codegen id :"],
        "forbid": ["BatchEvalPython", "ArrowEvalPython", "Exchange"],
        "note": "regexp count+mask is one narrow zero-shuffle projection inside codegen — no UDF, no exchange",
    },
    "gopher_quality_filter": {
        "expect": ["Project", "Generate"],  # explode barrier: struct computed once, fields O(1)
        # the pruned-scan evidence must tolerate suite ordering: when a
        # sibling test has the same documents parquet cached, Catalyst
        # plan-matches the scan to the InMemoryRelation instead
        "expect_any": [["ReadSchema: struct<doc_id:bigint,text:string>",
                        "InMemoryTableScan"]],
        "forbid": ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                   "SortMergeJoin", "BroadcastHashJoin"],
        "note": "all six signals + rule chain are native higher-order expressions in one per-row projection (lambda HOFs evaluate outside codegen by design, still JVM-side) — column-pruned scan, fan_out repartition only, no UDF, no join, bounded O(max_units²) per doc",
    },
    "charts_top_relationships": {
        "expect": ["TakeOrderedAndProject", "BroadcastHashJoin", "HashAggregate"],
        "forbid": ["BatchEvalPython"],
        "note": "top-20 via per-partition heaps AFTER map-side-combined agg; name dim broadcast",
    },
    "charts_score_distribution": {
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BatchEvalPython"],
        "note": "bucket rollup partial+final; pct window runs over the tiny aggregate only",
    },
    "mm_binary_meta": {
        "expect": ["ArrowEvalPython", "MapInPandas"],
        "forbid": ["BatchEvalPython", "CartesianProduct"],
        "note": "PNG encode (pandas UDF) + full decode (mapInPandas) both Arrow-batched; stats join is an equi-join",
    },
    "p13_p14_date_currency_fmt": {
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython"],
        "note": "pure projection — no shuffle at all; date math + formatting fully codegen'd",
    },
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(spark, name: str, spec: dict, sf_dir: str) -> tuple[bool, str, str]:
    """Run one plan check; returns (ok, verdict, plan). Shared by the
    script and the pytest wrapper (tests/test_plan_audit.py) so the
    assertions run on every round's test sweep, not just by hand."""
    df = entry_mod.queries()[name](spark, sf_dir)
    plan = formatted_plan(df)
    missing = [e for e in spec["expect"] if e not in plan]
    for group in spec.get("expect_any", ()):
        if not any(e in plan for e in group):
            missing.append(f"any-of:{group}")
    present_forbidden = [f for f in spec["forbid"] if f in plan]
    ok = not missing and not present_forbidden
    verdict = "PASS" if ok else f"FAIL (missing={missing}, forbidden={present_forbidden})"
    return ok, verdict, plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="plan_audit")
    qs = entry_mod.queries()
    lines = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"Generated by `python scripts/plan_audit.py {sf_dir}`. Each query's",
        "`.explain('formatted')` is checked for the physical features the",
        "engine's design claims (pushdown, broadcast, map-side combine,",
        "whole-stage codegen, Arrow-batched UDFs).",
        "",
        "| query | checks | verdict |",
        "|---|---|---|",
    ]
    n_bad = 0
    details = []
    for name, spec in CHECKS.items():
        ok, verdict, plan = audit_one(spark, name, spec, sf_dir)
        n_bad += 0 if ok else 1
        lines.append(f"| `{name}` | {spec['note']} | {verdict} |")
        details.append((name, plan))
        print(("PASS " if ok else "FAIL ") + name + ("" if ok else f"  {verdict}"))

    lines += ["", "## Key plan excerpts", ""]
    for name, plan in details[:4]:
        lines += [f"### {name}", "", "```", plan.strip()[:2500], "```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\n{len(CHECKS) - n_bad}/{len(CHECKS)} plan checks passed; PLANS.md written")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
