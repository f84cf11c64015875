"""Dump formatted physical plans for the headline queries → PLANS.md.

Reviewable evidence that the plans are what the docstrings claim:
broadcasts where promised, pushed filters, pruned read schemas, no
cartesian products. Regenerate after planner-affecting changes:

    python tools/explain_audit.py

Freshness gate (r8, judge task r8.4 — PLANS.md went stale twice in r7):

    python tools/explain_audit.py --check

re-derives every plan and exits 1 if PLANS.md drifted, comparing
NORMALIZED text (expression ids `#123`, plan ids, codegen stage ids
and subquery ids vary per session and are masked; structural changes
are what the audit exists to catch). tests/test_plans.py runs the
check so a planner-affecting commit cannot land with a stale PLANS.md.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecom_etl_proj_spark.plans import registry  # noqa: E402
from ecom_etl_proj_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "sales_master_join",
    "rfm_segments",
    "revenue_by_nation",
    "events_minutely",
    "dedup_minhash_lsh",
    "embedding_knn",
    "event_attribution",
    "embedding_near_dup",
    "purchase_click_asof",
    "price_band_stats",
    "product_counters",
    "ann_ivf",
    "term_heavy_hitters",
    "incremental_dedup",
    "dedup_spans_removal",
    "mixture_sample",
    "suppliers_kept_waiting",
    "copurchase_pagerank",
    "curation_funnel",
    "term_cooccurrence",
    "curated_pack",
    "packing_efficiency",
    "unigram_logprob",
    "dedup_threshold_sweep",
    "covisitation_pairs",
    "multimodal_decode_bmp",
    "ngram_novelty",
    "dedup_savings_report",
    "oov_rate_by_source",
    "ivf_cell_balance",
    # r10 state paths: rendering these runs the one-time state build at
    # sf0.001 (eager, like any index build — the audit process is fresh
    # per check, so the q_*0 table prefixes are deterministic); the
    # captured plan is the PROBE — the part whose shape the docstrings
    # promise (bucketed state scan, no Exchange on it, no corpus scan).
    "ann_ivf_state",
    "incremental_semantic_dedup",
    "semantic_dedup_state",
    "incremental_dedup_state",
    # r10 cost audits: the point of capture is the single corpus-side
    # exchange — lsh_bucket_profile must show ONE (band, bh) hash
    # partitioning (the same key the dedup join shuffles on) and
    # shingle_df_profile ONE shingle-keyed count, each followed only
    # by the bounded bin rollup and its ≤log2(corpus)-row sort.
    "lsh_bucket_profile",
    "shingle_df_profile",
    # r12: the IVF-PQ serving probe (the captured plan must show the
    # bucketed pqcodes scan broadcast-joined with zero Exchanges on it,
    # no {prefix}_cells raw-vector scan, no corpus scan), the full
    # shortlist+refine pipeline, and the two new row-local/shuffle-
    # audited operators.
    "ann_ivfpq_state",
    "ann_ivfpq_refined",
    "bigram_logprob",
    "embedding_rp",
    # r12 late adds: the cell-keyed kNN-graph self-join (one shuffle on
    # the cell id, bounded per-vector window) and the RP shortlist +
    # exact-refine pipeline (row-local projection, bounded refine).
    "knn_graph",
    # r16: the capped scale path the auto default switches to past
    # scale_threshold — the plan must show row-local probe/assignment
    # folds, the per-cell cap window as the only b-side exchange (at
    # audit SF the capped b-side then broadcasts; at scale the cell
    # join reuses its hash(cell) partitioning), and no dedup exchange
    # (home-only b-side generates each pair once).
    "knn_graph_capped",
    "ann_rp_refined",
    # r13 adds: the graph-recall audit (one max-probe candidate pass,
    # per-level bounded windows, one broadcast exact side), the
    # validate-and-quarantine report (row-local CASE chain + ONE key
    # window + tiny groupBy), and the SemDeDup curation composition
    # (curated_pack's plan with the cell-keyed mutual-kNN anti-join
    # spliced before packing).
    "knn_graph_recall",
    "ingest_quarantine_report",
    "curated_pack_semantic",
    # r13: the persisted-state refine pipeline — the captured plan must
    # show the bucketed pqcodes ADC shortlist + ONE bucketed cells scan
    # with the shortlist broadcast onto it (bounded raw-vector reads),
    # and no embeddings-corpus scan anywhere.
    "ann_ivfpq_state_refined",
    # r13 continuation adds: the SQ8 family (encode must be row-local
    # with the 1-row range broadcast; the state probe must show the
    # bucketed sq8codes scan with zero Exchanges on it, no cells scan,
    # no corpus scan), the DSIR weights (one term-keyed shuffle join,
    # no broadcast on the unbounded vocab side), and the Q9-shape
    # star join (part filter pushed, dims broadcast).
    "sq8_search",
    "ann_sq8_state",
    "dsir_weights",
    "nation_profit",
    # r14 adds: purchase_view_window must show the view/purchase
    # pre-filter PUSHED to the events scan ahead of the single user_id
    # window exchange (the r13 advisory's unpushed-filter fix);
    # dsir_weights_hashed must show the bounded 10k-bucket feature
    # join as a BroadcastHashJoin (the scale win over dsir_weights'
    # vocab shuffle); bpe_tokenize must be ONE projection over the
    # documents scan (chained replaces, zero Exchange, zero
    # BatchEvalPython); prototype_outliers must broadcast both the
    # prototype and moment frames (corpus scans, no corpus shuffle).
    "purchase_view_window",
    "dsir_weights_hashed",
    "bpe_tokenize",
    "prototype_outliers",
    # ccnet_buckets: the unigram-score join must stay a plain shuffle
    # on the unbounded term key (no broadcast) and the NTILE window
    # must be partitioned by lang, never global. The iterative
    # quality_classifier pair is NOT audited here: like
    # bpe_train_merges, its registered plan is checkpoint-backed
    # driver-loop output (RDD scan ids, not a declarative tree).
    "ccnet_buckets",
]

SF_DIR = "/root/testdata/sf0.001"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_PATH = os.path.join(_REPO, "PLANS.md")


def render() -> str:
    # Pin the session shape: plan text embeds partition counts
    # (hashpartitioning(..., N), repartition targets), so the audit
    # must not inherit a caller's core/shuffle env — the pytest gate
    # subprocesses this under conftest's SPARK_GRAFT_CPUS=8 and would
    # otherwise diff every exchange against the committed 32-slot file.
    os.environ["SPARK_GRAFT_CPUS"] = "32"
    os.environ["SPARK_SHUFFLE_PARTITIONS"] = "32"
    spark = get_spark("explain-audit")
    qs = registry.queries()
    out = [
        "# Physical plans (headline queries, sf0.001 statistics)",
        "",
        "Generated by `python tools/explain_audit.py`. What to look for:",
        "`PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` for",
        "dimensions, paired `HashAggregate`s (map-side partial combine),",
        "and the absence of `CartesianProduct`/`BatchEvalPython`.",
        "Freshness-gated: `python tools/explain_audit.py --check` (run by",
        "tests/test_plans.py) fails on structural drift vs the committed",
        "file.",
        "",
    ]
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    spark.stop()
    return "\n".join(out)


# Masks are deliberately NARROW (r9, advisor finding): a blanket
# `(\d+)` / LocalTableScan / Location mask hid genuine structural
# drift — a changed parenthesized literal (RoundRobinPartitioning(32)),
# partition count, LocalTableScan output list, or scan path would all
# normalize away and the gate would report "fresh" on a stale file.
# Operator ids in FORMATTED explain appear in exactly two shapes —
# trailing `(N)` on tree lines and line-leading `(N) ` on the detail
# headers — so only those positions are masked; `#N` expression-id
# masking already covers the volatile part of column lists.
_VOLATILE = [
    (re.compile(r"#\d+L?"), "#N"),          # expression ids
    (re.compile(r"\[plan_id=\d+\]"), "[plan_id=N]"),
    (re.compile(r"\(\d+\)\s*$", re.M), "(N)"),   # trailing operator ids
    (re.compile(r"^\(\d+\) ", re.M), "(N) "),    # detail-header operator ids
    (re.compile(r"Reuses operator id: \d+"), "Reuses operator id: N"),
    (re.compile(r"Subquery:? (?:subquery)?#?\d+", re.I), "Subquery#N"),
    (re.compile(r"cachedrdd-\d+"), "cachedrdd-N"),
    # only the bracketed filesystem path inside Location is volatile
    # (warehouse dirs differ by session cwd); index class + path count
    # stay visible
    (re.compile(r"(Location: \w+(?:\([^)]*\))?)\s*\[[^\]]*\]"), r"\1[...]"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(...)"),
    # lambda-variable counters (x_12, y_13, ...) are a PROCESS-GLOBAL
    # sequence: how many lambda expressions the session built before
    # this plan shifts every suffix (the r10 engine warmup moved all of
    # them by a constant). The variable's base name stays visible —
    # only the counter is masked, so a structural lambda change still
    # diffs.
    (re.compile(r"\blambda ([a-z]+)_\d+"), r"lambda \1_M"),
    # JVM identity hashes of folded literals (UnsafeArrayData@1a2b3c)
    (re.compile(r"@[0-9a-f]{6,}\b"), "@ADDR"),
    # RDD ids in localCheckpoint scan nodes: a per-context counter,
    # shifted by any job the session ran earlier (same noise class as
    # the lambda counters); the RDD class name stays visible
    (re.compile(r"RDD\[\d+\]"), "RDD[N]"),
]


def normalize(text: str) -> str:
    for pat, rep in _VOLATILE:
        text = pat.sub(rep, text)
    return text


def main() -> None:
    check = "--check" in sys.argv[1:]
    fresh = render()
    if not check:
        with open(PLANS_PATH, "w") as f:
            f.write(fresh)
        print(f"wrote {PLANS_PATH} ({len(HEADLINE)} plans)")
        return
    with open(PLANS_PATH) as f:
        committed = f.read()
    if normalize(committed) == normalize(fresh):
        print("PLANS.md is fresh")
        return
    import difflib

    a = normalize(committed).splitlines()
    b = normalize(fresh).splitlines()
    diff = list(difflib.unified_diff(a, b, "PLANS.md", "regenerated", lineterm=""))
    print("\n".join(diff[:120]))
    print(f"\nPLANS.md is STALE ({len(diff)} diff lines) — "
          "rerun: python tools/explain_audit.py")
    sys.exit(1)


if __name__ == "__main__":
    main()
