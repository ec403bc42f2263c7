"""Catalog inverse index: query name → SURVEY §2 operators covered →
oracle type → driver-window position.

The r2 verdict's process defect was silent drift between the registry and
the driver's 50-entry verification window. This report is generated FROM
the live registry (import order = driver check order), so any entry past
position 50, any entry missing an oracle, and any registry/operator-map
drift fails loudly here and in the paired test.

Usage: python tools/catalog_report.py [--check]
  default: print the markdown table (pasted into COVERAGE.md §Catalog)
  --check: exit nonzero on any drift (used by tests)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

DRIVER_WINDOW = 50

# query name -> SURVEY §2 operator ids (and beyond-reference tier tags)
OPERATORS: dict[str, str] = {
    "s1_pricing_summary": "S1 A2 A3 A7",
    "p_filtered_orders": "P5 P6 P7",
    "j1_top_revenue_orders": "J1 O1 O2 O3",
    "j2_region_revenue": "J2",
    "j34_urgent_no_open_customers": "J3 J4",
    "j8_customer_order_summary": "J8 A1 A5 A6 A7",
    "bucketed_join_revenue": "S2b J1",
    "w1_best_order_per_customer": "W1",
    "w2_priciest_lines_per_order": "W2 A4",
    "a8_order_priority_counts": "A8 topk-mergeable",
    "f_standardized_part_keys": "F1 F2 F3 F5 F7 F13 M3",
    "jw_similar_part_names": "J6 F11 X2",
    "fs_customer_supplier_scores": "K2 K3 K4 K7 M1 M2",
    "k8_blocking_pair_count": "K8",
    "events_hourly_rollup": "streaming-twin windowed-agg",
    "dedup_exact_documents": "dedup-exact",
    "text_analysis_suite": "F14 lang-id quality tokens fingerprint",
    "f89_phonetic_part_names": "F6 F8 F9 F10 X1",
    "dedup_cluster_canonical": "near-dup-clusters",
    "corpus_curation_pipeline": "curation-capstone",
    "minhash_near_dups": "minhash-lsh",
    "simhash_near_dups": "simhash",
    "dedup_near_exact_pipeline": "ngram-jaccard candidates=lsh",
    "ann_brute_force_topk": "ann-exact",
    "ann_lsh_ivf_topk": "ann-lsh ann-ivf",
    "semantic_dedup_embeddings": "semantic-dedup embedding-near-dup",
    "events_sessionized": "sessionization lag-window",
    "asof_prior_error_state": "asof-join range-join temporal-state",
    "streaming_dedup_first_seen": "streaming-stateful-dedup",
    "streaming_near_dedup_decisions": "streaming-incremental-near-dedup",
    "streaming_incremental_linkage": "streaming-incremental-linkage K10 S2",
    "s7_generated_census": "S7",
    "sampling_strata_and_split": "P11 stratified-sample train-val-test-split",
    "mixture_upsample_documents": "mixture-upsample",
    "pretraining_assembly_pipeline": "assembly-capstone",
    "pack_documents_into_sequences": "sequence-packing",
    "shuffle_documents_for_training": "global-shuffle",
    "mm_media_features": "multimodal-schema mapInPandas-features",
    "profile_orders_table": "A9 K9 table-profiler sql-over-temp-view",
    "mergeable_rollup_capstone": "A8 A9 topk-mergeable profile-mergeable hierarchical-fold",
    "w_d3_order_row_ops": "W-running-total D1 D2 D3 D4 F12",
    "p9_f4_customer_cleanup": "P8 P9 P10 F4",
    "j5_accumulating_merge": "J5 U1 U2",
    "a10_u_estimation": "A10 K5",
    "a11_em_training": "A11 K6",
    "cascade_mini": "K1 K12 J9 S6",
    "k11_mu_parameters": "K11",
    "decontaminate_docs": "decontamination",
    "pii_repetition_signals": "pii-scrubbing repetition-rules",
    "k_tf_adjusted_scores": "K+ tf-adjustment",
}


def build_report() -> tuple[list[str], list[str]]:
    """(markdown lines, drift problems)."""
    from person_linkage_case_study_spark.queries import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    problems: list[str] = []
    lines = [
        "| # | Query | Operators | Oracle |",
        "|---|---|---|---|",
    ]
    for i, name in enumerate(qs, 1):
        ops = OPERATORS.get(name)
        if ops is None:
            problems.append(f"registry entry {name!r} missing from OPERATORS map")
            ops = "???"
        oracle = "full value-hash" if name in oracles else "NONE"
        if name not in oracles:
            problems.append(f"{name!r} has no oracle")
        if i > DRIVER_WINDOW:
            problems.append(
                f"{name!r} is at position {i} — outside the driver's "
                f"{DRIVER_WINDOW}-entry verification window"
            )
        lines.append(f"| {i} | `{name}` | {ops} | {oracle} |")
    for name in OPERATORS:
        if name not in qs:
            problems.append(f"OPERATORS map has stale entry {name!r}")
    return lines, problems


def main() -> None:
    lines, problems = build_report()
    if "--check" in sys.argv:
        for p in problems:
            print(f"DRIFT: {p}", file=sys.stderr)
        sys.exit(1 if problems else 0)
    print("\n".join(lines))
    if problems:
        print()
        for p in problems:
            print(f"DRIFT: {p}")


if __name__ == "__main__":
    main()
