"""Benchmark runner — times the headline queries and prints ONE JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect). Times are wall-clock seconds per query; the headline
metric is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from melt_spark.plans import analytics_suite as a  # noqa: E402
from melt_spark.plans import pipeline_suite as p  # noqa: E402
from melt_spark.plans import suite as s  # noqa: E402
from melt_spark.session import get_spark  # noqa: E402

# Headliners: the scan/shuffle-heavy queries that dominate real workloads.
# Bound to the operator functions directly (not the consolidated suite
# registry) so the bench measures the same plans round over round.
BENCH_QUERIES = [
    ("message_envelope", s.q_message_envelope),    # scan -> canonical JSON
    ("latest_state", s.q_latest_state),            # compaction (max_by)
    ("sync_plan", s.q_sync_plan),                  # full-outer diff join
    ("cdc_replay", s.q_cdc_replay),                # filter + bcast join
    ("tpch_q1", s.q_tpch_q1),                      # wide aggregation
    ("tpch_q3", s.q_tpch_q3),                      # 3-way join + top-k
    ("tpch_q5", a.q_tpch_q5),                      # 6-table join tree
    ("event_sessions", a.q_event_sessions),        # window lag + cumsum
    ("text_stats", p.q_text_stats),                # full-corpus text scan
    ("dedup_minhash_lsh", p.q_dedup_minhash_lsh),  # minhash band join
    ("ann_cosine_topk", p.q_ann_cosine_topk),      # bcast NL join + folds
    ("tpch_q10", a.q_tpch_q10),                    # join + group + top-k
    ("clean_corpus", p.q_clean_corpus),            # quality + near-dup
]


def _q_udtf_envelope(spark, sf_dir):
    """Envelope messages pushed through the Python UDTF surface — the one
    deliberately row-at-a-time path, benched so its cost stays visible."""
    from melt_spark.functions.udtf_ops import explode_envelope

    return explode_envelope(s.q_message_envelope(spark, sf_dir))


# Operators added in round 3, benched separately so regressions in the new
# code are visible round-over-round. The headline `value` stays the
# BENCH_QUERIES total (comparable with every earlier round's artifact);
# these report under queries/runs and the total_with_r3_ops key.
BENCH_QUERIES_R3 = [
    ("span_dedup", p.q_span_dedup),                # digest-shuffle window
    ("bm25_topk", p.q_bm25_topk),                  # postings + idf folds
    ("rrf_fusion", p.q_rrf_fusion),                # rank fusion (tiny)
    ("udtf_envelope", _q_udtf_envelope),           # row-at-a-time UDTF
    ("stream_broker_sync", s.q_stream_broker_sync),  # streaming sink loop
]

# Round-4 operators, same contract as the r3 group: in queries/runs and the
# extended total only; the headline `value` remains the original 13.
BENCH_QUERIES_R4 = [
    ("semantic_dedup", p.q_semantic_dedup),        # cluster-local pairwise
    ("kmv_distinct", a.q_kmv_distinct),            # k-min-values sketch
    ("stream_enriched", s.q_stream_enriched_counts),  # stream-static bcast
    ("heavy_tokens", p.q_heavy_tokens),            # MG candidates + recount
    ("pagerank", a.q_pagerank),                    # 3 unrolled iterations
]

# Round-4b operators (same contract): the corpus-model LM scorer is the
# heavy one (two bigram explodes + a model join); the rest are benched so
# their cost is on record from birth.
BENCH_QUERIES_R4B = [
    ("lm_perplexity", p.q_lm_perplexity),          # bigram LM train+score
    ("gapfill_hourly", a.q_gapfill_hourly),        # spine + 2 window passes
    ("jl_projection", p.q_jl_projection),          # 16 codegen folds/row
    ("cms_user_counts", a.q_cms_user_counts),      # fixed-size sketch build
    ("bpe_train", p.q_bpe_train),                  # 3 unrolled BPE rounds
    ("butterflies", a.q_butterflies),              # bipartite wedge census
]

# Round-5 operators (same contract as the r3/r4 groups): benched from
# birth so round 6 has a per-query number of record.
BENCH_QUERIES_R5 = [
    ("dsir_topk", p.q_dsir_topk),              # hashed-ngram LLR scoring
    ("incremental_minhash", p.q_incremental_minhash),  # batch-vs-store LSH
    ("triangles", a.q_triangles),              # degree-ordered census
    ("pq_adc", p.q_pq_adc),                    # code-space ANN search
    ("bloom_filter", a.q_bloom_filter),        # bit_or build + probe
    ("cusum_monitor", a.q_cusum_monitor),      # per-key ordered fold
    ("ngram_novelty", p.q_ngram_novelty),      # digest membership join
]

# Round-5b operators (the second round-5 wave, same contract): the
# iterative ones (kcore, kmeans) and the edit-distance join are the heavy
# entries; the rerankers are tiny but benched so their cost is on record.
BENCH_QUERIES_R5B = [
    ("tfidf_keywords", p.q_tfidf_keywords),    # df join + per-doc top-k
    ("pmi_collocations", p.q_pmi_collocations),  # bigram x unigram join
    ("bq_rerank", p.q_bq_rerank),              # 1-bit Hamming + rerank
    ("kcore", a.q_kcore),                      # unrolled peeling rounds
    ("adamic_adar", a.q_adamic_adar),          # wedge join on digests
    ("fuzzy_match", a.q_fuzzy_match),          # q-gram prefilter + edit
    ("kmeans_train", p.q_kmeans_train),        # 2 Lloyd iterations
    ("greedy_coverage", p.q_greedy_coverage),  # 3 coverage rounds
    ("hits", a.q_hits),                        # 2 HITS iterations
    ("containment", p.q_containment),          # overlap-coefficient pairs
    ("nb_classify", p.q_nb_classify),          # NB train + score + argmax
    ("ewma", a.q_ewma),                        # integer EWMA recurrence
    ("kmeans_outliers", p.q_kmeans_outliers),  # top-N farthest vectors
    ("ppr", a.q_ppr),                          # 3 seeded PPR iterations
    ("winnow", p.q_winnow),                    # MOSS window-min selection
    ("waterfill", p.q_waterfill),              # budget allocation (tiny)
    ("canonical_docs", p.q_canonical_docs),    # cluster + keep verdicts
    ("skew_report", a.q_skew_report),          # pre-flight skew stats
    ("diversity", p.q_diversity),              # TTR/Zipf per source
    ("leakage", p.q_leakage),                  # cross-source near-dups
    ("trimmed_mean", a.q_trimmed_mean),        # robust mean (cents)
    ("match_quality", a.q_match_quality),      # matcher P/R vs truth
]

# Per-constituent timing inside the heaviest merged entries (r4 verdict
# item 8): when a merged entry's time shifts round-over-round, this block
# shows WHICH branch moved — exactly the diagnosis the r4 clean_corpus
# regression lacked. Names resolve through the shared registry
# (plans/registry.py), so a renamed constituent fails loudly here too.
CONSTITUENT_GROUPS: dict[str, list[str]] = {
    "clean_corpus": ["clean_corpus", "mixture_weights", "dsir_topk",
                     "greedy_coverage", "waterfill", "diversity", "leakage"],
    "text_quality": ["text_stats", "quality_scores", "repetition",
                     "rep_ngrams", "pii_scrub", "lm_perplexity",
                     "nb_classify"],
    "dedup_minhash_lsh": ["dedup_minhash_lsh", "incremental_minhash"],
    "ann_cosine_topk": ["ann_cosine_topk", "bm25_topk", "rrf_fusion",
                        "rrf_recall", "phrase_match"],
    "ivf_search": ["ivf_topk", "ivf_recall", "semantic_dedup",
                   "semantic_summary", "pq_codes", "pq_adc", "ivf_pq",
                   "kmeans_train", "kmeans_outliers"],
    "dedup_clusters": ["dedup_clusters", "pagerank", "butterflies",
                       "hits", "ppr", "canonical_docs"],
    "rollup_grouping_sets": ["rollup_revenue", "cube_revenue",
                             "grouping_sets", "time_bucket_rollup",
                             "gapfill_hourly", "event_twa"],
}


def _force(df) -> int:
    """Execute the full plan without materializing on the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("melt-spark-bench")

    # warm-up (not timed): run each query once at the smallest SF so
    # whole-stage-codegen compilation and JVM JIT are paid before timing —
    # the generated code is plan-shaped, so it's reused at the real SF
    warm_dir = "/root/testdata/sf0.001"
    for _name, fn in (BENCH_QUERIES + BENCH_QUERIES_R3
                      + BENCH_QUERIES_R4 + BENCH_QUERIES_R4B
                      + BENCH_QUERIES_R5 + BENCH_QUERIES_R5B):
        try:
            _force(fn(spark, warm_dir))
        except Exception:
            pass
    s.q_load_counts(spark, sf_dir).collect()

    # Per-query fault isolation: one failing headliner must not destroy the
    # other measurements (round-2 lesson — a single AnalysisException left
    # the whole round without a bench artifact). Failures are recorded per
    # query and the totals JSON is ALWAYS emitted.
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name, fn in (BENCH_QUERIES + BENCH_QUERIES_R3
                     + BENCH_QUERIES_R4 + BENCH_QUERIES_R4B
                     + BENCH_QUERIES_R5 + BENCH_QUERIES_R5B):
        try:
            # min of 2 is the headline (drops scheduler noise, stays
            # honest); BOTH raw runs are recorded so run-to-run variance —
            # including cold-cache behavior min-of-2 would hide — is
            # visible in the artifact
            rs = []
            for _ in range(2):
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                rs.append(round(time.perf_counter() - t0, 3))
            runs[name] = rs
            timings[name] = min(rs)
        except Exception as exc:  # noqa: BLE001 — isolate, record, keep going
            errors[name] = f"{type(exc).__name__}: {str(exc)[:500]}"

    # one timed pass per constituent of the heavy merged entries (the
    # branch-attribution block; single run — these are diagnostic, the
    # regression gate stays the min-of-2 headliners above)
    from melt_spark.plans.registry import constituents as _constituents
    reg = _constituents()
    constituent_times: dict[str, dict[str, float]] = {}
    for entry, names in CONSTITUENT_GROUPS.items():
        group: dict[str, float] = {}
        for cname in names:
            try:
                fn = reg[cname][0]
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                group[cname] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors[f"{entry}:{cname}"] = \
                    f"{type(exc).__name__}: {str(exc)[:200]}"
        constituent_times[entry] = group

    core = {k for k, _ in BENCH_QUERIES}
    total = round(sum(v for k, v in timings.items() if k in core), 3)
    out = {
        "metric": "headline_queries_total",
        # `value` = the original 13-headliner total, directly comparable
        # with every earlier round's artifact
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "total_with_new_ops": round(sum(timings.values()), 3),
        "constituents": constituent_times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
