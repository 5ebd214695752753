"""Benchmark runner — times the headline queries and prints ONE COMPACT
JSON line; full detail goes to docs/BENCH_DETAIL.json.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect). Times are wall-clock seconds per query; the
headline metric is the 13-headliner total (comparable with every
earlier round's artifact).

Artifact contract (round-5 verdict item #1): the driver captures only a
bounded stdout tail, and round 5's single line — 84 queries + raw runs +
per-constituent blocks — overflowed it, leaving BENCH_r05.json
unparseable. The printed line is now capped (tests/test_bench_contract.py
pins the byte budget): metric, value, unit, sf, and the 13 headliner
seconds only. Everything else (extended-group timings, raw runs,
per-constituent attribution, errors) is written to
docs/BENCH_DETAIL.json, where size is free.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from melt_spark.plans import suite as s  # noqa: E402
from melt_spark.session import get_spark  # noqa: E402

# Headliners: the scan/shuffle-heavy queries that dominate real workloads.
# Bound to the operator functions directly (not the consolidated suite
# registry) so the bench measures the same plans round over round.
from melt_spark.plans import analytics_suite as _a  # noqa: E402
from melt_spark.plans import pipeline_suite as _p  # noqa: E402

BENCH_QUERIES = [
    ("message_envelope", s.q_message_envelope),      # scan -> canonical JSON
    ("latest_state", s.q_latest_state),              # compaction (max_by)
    ("sync_plan", s.q_sync_plan),                    # full-outer diff join
    ("cdc_replay", s.q_cdc_replay),                  # filter + bcast join
    ("tpch_q1", s.q_tpch_q1),                        # wide aggregation
    ("tpch_q3", s.q_tpch_q3),                        # 3-way join + top-k
    ("tpch_q5", _a.q_tpch_q5),                       # 6-table join tree
    ("event_sessions", _a.q_event_sessions),         # window lag + cumsum
    ("text_stats", _p.q_text_stats),                 # full-corpus text scan
    ("dedup_minhash_lsh", _p.q_dedup_minhash_lsh),   # minhash band join
    ("ann_cosine_topk", _p.q_ann_cosine_topk),       # bcast NL join + folds
    ("tpch_q10", _a.q_tpch_q10),                     # join + group + top-k
    ("clean_corpus", _p.q_clean_corpus),             # quality + near-dup
]


def _q_udtf_envelope(spark, sf_dir):
    """Envelope messages pushed through the Python UDTF surface — the one
    deliberately row-at-a-time path, benched so its cost stays visible."""
    from melt_spark.functions.udtf_ops import explode_envelope

    return explode_envelope(s.q_message_envelope(spark, sf_dir))


# Operators added in later rounds, benched so regressions in the new code
# are visible round-over-round. The headline `value` stays the
# BENCH_QUERIES total; these report in docs/BENCH_DETAIL.json only.
#
# Names resolve through the shared registry (plans/registry.py) — the same
# unification check_one/CLI/SUITE_MAP use — so a renamed constituent fails
# loudly here instead of silently dropping out of the bench surface
# (round-5 verdict item #8). The few non-registry wrappers (the UDTF seam
# and the streaming-sink loops, which need a writeStream harness rather
# than a plain DataFrame) stay bound explicitly.
BENCH_GROUPS_BY_NAME: dict[str, list[str]] = {
    "r3": ["span_dedup", "bm25_topk", "rrf_fusion"],
    "r4": ["semantic_dedup", "kmv_distinct", "heavy_tokens", "pagerank",
           "lm_perplexity", "gapfill_hourly", "jl_projection",
           "cms_user_counts", "bpe_train", "butterflies"],
    "r5": ["dsir_topk", "incremental_minhash", "triangles", "pq_adc",
           "bloom_filter", "cusum_monitor", "ngram_novelty",
           "tfidf_keywords", "pmi_collocations", "bq_rerank", "kcore",
           "adamic_adar", "fuzzy_match", "kmeans_train", "greedy_coverage",
           "hits", "containment", "nb_classify", "ewma", "kmeans_outliers",
           "ppr", "winnow", "waterfill", "canonical_docs", "skew_report",
           "diversity", "leakage", "trimmed_mean", "match_quality"],
    "r6": ["kmv_intersect", "kmv_overlap", "kmv_difference",
           "holt_trend", "ohlc_bars", "ab_test", "lpa_communities",
           "random_walks", "knn_graph", "graph_ann", "golden_records",
           "lsh_planner", "nb_calibration", "theil_sen", "nb_abstain",
           "incremental_knn", "hilbert_values", "rfm_scores",
           "otsu_threshold", "minhash_recall"],
    "r7": ["exact_substring", "exact_quantiles", "simhash",
           "contrastive", "monthly_revenue", "hll_distinct",
           "pareto_docs", "dbscan_customers", "mann_whitney",
           "benford_prices", "kaplan_meier", "chi2_weekday",
           "log_rank", "mad_outliers", "modularity", "attribution", "pruning_eval",
           "random_group_ci", "cuped", "target_encoding",
           "fdr_battery"],
    "r8": ["bpe_encode", "pack_bpe", "km_variants", "domain_gate",
           "welch_ttest", "spearman_drift", "kruskal_wallis",
           "acf_daily", "msprt", "heaps_law", "conformal_nb",
           "gini_spend", "cochran_armitage", "srm_check", "did"],
    "r9": ["incremental_bpe", "embedding_pca", "url_dedup",
           "regex_pretokenize", "ccnet_buckets"],
    "r10": ["abtt_ann", "kn_perplexity", "luhn_cards", "ann_int8_rerank",
            "ccnet_assign", "cluster_split", "pretoken_fertility",
            "embedding_drift", "gopher_gate"],
}

EXTRA_QUERIES = [
    ("udtf_envelope", _q_udtf_envelope),             # row-at-a-time UDTF
    ("stream_broker_sync", s.q_stream_broker_sync),  # streaming sink loop
    ("stream_enriched", s.q_stream_enriched_counts),  # stream-static bcast
]

# Per-constituent timing inside the heaviest merged entries (r4 verdict
# item 8): when a merged entry's time shifts round-over-round, this block
# shows WHICH branch moved. Names resolve through the shared registry too.
CONSTITUENT_GROUPS: dict[str, list[str]] = {
    "clean_corpus": ["clean_corpus", "mixture_weights", "dsir_topk",
                     "greedy_coverage", "waterfill", "diversity", "leakage"],
    "text_quality": ["text_stats", "quality_scores", "repetition",
                     "rep_ngrams", "pii_scrub", "lm_perplexity",
                     "nb_classify", "nb_calibration", "nb_abstain",
                     "ccnet_buckets", "kn_perplexity"],
    "numeric_profiles": ["embedding_pca", "abtt_ann", "embedding_drift",
                         "pruning_eval", "exact_quantiles",
                         "quantize_int8"],
    "dedup_minhash_lsh": ["dedup_minhash_lsh", "incremental_minhash",
                          "lsh_planner", "minhash_recall"],
    "ann_cosine_topk": ["ann_cosine_topk", "bm25_topk", "rrf_fusion",
                        "rrf_recall", "phrase_match"],
    "ivf_search": ["ivf_topk", "ivf_recall", "semantic_dedup",
                   "semantic_summary", "pq_codes", "pq_adc", "ivf_pq",
                   "kmeans_train", "kmeans_outliers"],
    "dedup_clusters": ["dedup_clusters", "pagerank", "butterflies",
                       "hits", "ppr", "canonical_docs",
                       "lpa_communities", "random_walks"],
    "embedding_lsh": ["lsh_buckets", "embedding_near_dup", "bq_rerank",
                      "knn_graph", "graph_ann", "incremental_knn"],
    "rollup_grouping_sets": ["rollup_revenue", "cube_revenue",
                             "grouping_sets", "time_bucket_rollup",
                             "gapfill_hourly", "event_twa"],
}

# The printed line must survive the driver's stdout tail capture.
# tests/test_bench_contract.py pins this; the 13 headliners at ~30 bytes
# each plus the envelope keys sit well under it.
MAX_STDOUT_BYTES = 2048

# Contention canary (r8 verdict What's-wrong #2): the driver's r8 bench
# recorded a ~170 s external-contention window that inflated a contiguous
# block of measurements 9-28x and masqueraded as a regression. A fixed
# cheap probe (message_envelope at sf0.001 — one tiny scan, no shuffle)
# now runs every CANARY_EVERY measurements; a canary reading more than
# CANARY_FACTOR x the series median marks every measurement between it
# and its neighbors as "contended" in the detail artifact, so corrupted
# blocks self-identify instead of silently recording garbage.
CANARY_EVERY = 10
CANARY_FACTOR = 3.0
CANARY_SF_DIR = "/root/testdata/sf0.001"


def contended_names(canaries: list[dict], name_seqs: list[tuple[str, int]],
                    factor: float = CANARY_FACTOR) -> tuple[float, list[str]]:
    """(median canary sec, names whose enclosing canaries include an
    excursion > factor x median). ``canaries`` is [{'seq': n, 'sec': t}]
    in chronological order; ``name_seqs`` is [(name, seq-at-measurement)].
    Pure function — pinned by tests/test_bench_contract.py."""
    import statistics

    if not canaries:
        return 0.0, []
    med = statistics.median(c["sec"] for c in canaries)
    bad = {c["seq"] for c in canaries if med > 0 and c["sec"] > factor * med}
    if not bad:
        return med, []
    out = []
    seqs = [c["seq"] for c in canaries]
    for name, at in name_seqs:
        prev = max((q for q in seqs if q <= at), default=None)
        nxt = min((q for q in seqs if q > at), default=None)
        if (prev in bad) or (nxt in bad):
            out.append(name)
    return med, out


def box_speed(spark) -> dict:
    """Fixed JVM arithmetic workloads, recorded per run so round-over-round
    bench totals can be HARDWARE-NORMALIZED: the r9 close-run measured the
    untouched, plan-pinned headliners ~45% slower than r8 on a box whose
    pure-Python loop was equally slower — plan pins prove no plan changed,
    and this denominator proves (or refutes) 'the box, not the code' for
    any future such shift. Single-partition run = per-core speed;
    32-partition run = whole-box throughput."""
    def best_of(n_rows: int, parts: int) -> float:
        best = None
        for _ in range(2):   # first run pays JIT — min is the warm number
            t0 = time.perf_counter()
            spark.range(0, n_rows, 1, parts).selectExpr(
                "sum(id * 2 + 7) AS s").collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    return {"jvm_1core_sec": best_of(50_000_000, 1),
            "jvm_32core_sec": best_of(800_000_000, 32)}


# Committed reference box (r9 verdict What's-wrong #3): the r9 round-close
# calibration readings (NOTES.md r9 bench context — jvm_1core 0.34 s /
# jvm_32core 0.44 s, the box whose 18.1 s close-run the judge's A/B traced
# to hardware). Every future run normalizes its headline against THESE
# numbers, so a uniformly slow box — which inflates measurements AND the
# contention-canary median together, evading the burst canary — reads as
# a box-speed ratio instead of a fake regression.
BOX_BASELINE = {"jvm_1core_sec": 0.34, "jvm_32core_sec": 0.44}


def box_normalized(total: float, box: dict,
                   baseline: dict | None = None) -> float | None:
    """Headline seconds re-expressed in REFERENCE-BOX time: multiply by
    the geometric mean of the (baseline/measured) speed ratios of the
    1-core and 32-core calibration workloads (the headliners mix serial
    driver/stage-boundary time with parallel scan time, so neither ratio
    alone is right; the geomean is the symmetric compromise). A box
    measuring 2x slower than the committed baseline halves its raw total.
    Pure function — pinned by tests/test_bench_contract.py. Returns None
    when a calibration reading is missing or non-positive (the raw value
    then stands alone, never a fabricated normalization)."""
    baseline = baseline or BOX_BASELINE
    try:
        r1 = baseline["jvm_1core_sec"] / box["jvm_1core_sec"]
        r32 = baseline["jvm_32core_sec"] / box["jvm_32core_sec"]
    except (KeyError, TypeError, ZeroDivisionError):
        return None
    if r1 <= 0 or r32 <= 0:
        return None
    return round(total * (r1 * r32) ** 0.5, 3)


def norm_band(total: float, box: dict,
              baseline: dict | None = None) -> list[float] | None:
    """The box normalization as a BAND, not a point (r10 verdict
    What's-wrong #2): [total x 1-core-ratio, total x 32-core-ratio],
    sorted. The true workload sits between the serial and parallel
    extremes (Amdahl: per-query fixed driver/stage-boundary costs scale
    with core speed, scan time with whole-box throughput), so the band
    brackets the reference-box time the geomean point can only estimate.
    Pure function — pinned by tests/test_bench_contract.py."""
    baseline = baseline or BOX_BASELINE
    try:
        r1 = baseline["jvm_1core_sec"] / box["jvm_1core_sec"]
        r32 = baseline["jvm_32core_sec"] / box["jvm_32core_sec"]
    except (KeyError, TypeError, ZeroDivisionError):
        return None
    if r1 <= 0 or r32 <= 0:
        return None
    return sorted([round(total * r1, 3), round(total * r32, 3)])


# Workload-matched calibration (r10 verdict next-round #1b): the JVM
# arithmetic loops normalize by CORE speed, but headliner time mixes
# serial driver/stage-boundary cost with parallel scan cost, and the
# mix differs per box — identical code normalized to 23.2-40.5 s
# across three boxes (a 1.7x spread). The fix the verdict prescribed:
# calibrate with a MINI-HEADLINER whose serial/parallel mix matches the
# workload — message_envelope + tpch_q1 at sf0.01, min-of-2 warm, the
# exact two queries the r10 verdict named. MINI_BASELINE is the
# committed r11 anchor-box reading (measured beside the r11 headline on
# a canary-quiet box, calibration jvm_1core/32core recorded in
# BENCH_DETAIL at the time); value_box_normalized is the headline
# re-expressed in anchor-box time through THIS ratio, with the JVM
# geomean kept in the detail for continuity with r9/r10 artifacts.
MINI_SF_DIR = "/root/testdata/sf0.01"
# r11 anchor box: FULLY-WARM mini-headliner converged at ~0.75 s over
# repeated quiet-box trials (jvm_1core ~0.15 / jvm_32core ~0.20 at
# measurement time — the same calibration the r10 verdict records for
# the builder's close-run box). bench.main() measures mini at the END
# of the sweep, i.e. fully warm, matching this anchor's condition.
MINI_BASELINE = {"mini_sec": 0.75}


def mini_headliner_speed(spark) -> dict:
    """min-of-2 warm seconds for the two-query mini-headliner at
    sf0.01 — the workload-matched denominator for box normalization."""
    def best_of(fn) -> float:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _force(fn(spark, MINI_SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    return {"mini_sec": round(best_of(s.q_message_envelope)
                              + best_of(s.q_tpch_q1), 3)}


def box_normalized_mini(total: float, mini: dict,
                        baseline: dict | None = None) -> float | None:
    """Headline seconds re-expressed in ANCHOR-BOX time via the
    mini-headliner ratio. Same degradation contract as box_normalized:
    None when the reading is missing or non-positive. Pure function —
    pinned by tests/test_bench_contract.py."""
    baseline = baseline or MINI_BASELINE
    try:
        r = baseline["mini_sec"] / mini["mini_sec"]
    except (KeyError, TypeError, ZeroDivisionError):
        return None
    if r <= 0:
        return None
    return round(total * r, 3)


def detail_name() -> str:
    """Round-stamped detail artifact (r7 verdict item #6): with
    SPARK_GRAFT_ROUND=N set, detail goes to BENCH_DETAIL_r{N}.json so
    driver/judge re-runs stop clobbering the round-close working tree;
    unstamped runs keep the stable BENCH_DETAIL.json path."""
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "").strip()
    return f"BENCH_DETAIL_r{rnd}.json" if rnd else "BENCH_DETAIL.json"


def extended_queries() -> list[tuple[str, object]]:
    """(name, fn) for every non-headliner benched query, resolved via the
    registry — KeyError (loud) if a constituent was renamed."""
    from melt_spark.plans.registry import constituents

    reg = constituents()
    out: list[tuple[str, object]] = []
    for names in BENCH_GROUPS_BY_NAME.values():
        for n in names:
            out.append((n, reg[n][0]))
    out.extend(EXTRA_QUERIES)
    return out


def compact_line(total: float, sf, timings: dict[str, float],
                 n_errors: int, box_norm: float | None = None,
                 band: list[float] | None = None,
                 total_no_retry: float | None = None) -> str:
    """The ONE stdout JSON line: headline metric + 13 headliner seconds
    (+ the box-normalized headline when calibration succeeded, + the
    JVM-ratio normalization band, + the PRE-RETRY total — r11 verdict
    #6: the canary-gated retry's min(original, retry) is one-sided, so
    the line always carries the no-retry total too; when the retry never
    fires the two are equal and headlines stay comparable either way).
    Kept under MAX_STDOUT_BYTES by construction (pinned by pytest)."""
    core = [k for k, _ in BENCH_QUERIES]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in core if k in timings},
        "sf": sf,
        "detail": "docs/BENCH_DETAIL.json",
    }
    if total_no_retry is not None:
        out["value_no_retry"] = total_no_retry
    if box_norm is not None:
        out["value_box_normalized"] = box_norm
    if band is not None:
        out["norm_band"] = band
    if n_errors:
        out["n_errors"] = n_errors
    return json.dumps(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf) if sf.replace(".", "").isdigit() else sf
    spark = get_spark("melt-spark-bench")

    ext = extended_queries()

    # warm-up (not timed): run each query once at the smallest SF so
    # whole-stage-codegen compilation and JVM JIT are paid before timing —
    # the generated code is plan-shaped, so it's reused at the real SF
    warm_dir = "/root/testdata/sf0.001"
    for _name, fn in BENCH_QUERIES + ext:
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
    canaries: list[dict] = []
    name_seqs: list[tuple[str, int]] = []
    seq = 0

    def _canary() -> None:
        # same fault-isolation rule as the measurements: a failing canary
        # (missing probe fixture, transient executor loss) must not abort
        # the run and cost the round its bench artifact — it just leaves
        # a gap in the series
        try:
            t0 = time.perf_counter()
            _force(s.q_message_envelope(spark, CANARY_SF_DIR))
            canaries.append({"seq": seq,
                             "sec": round(time.perf_counter() - t0, 3)})
        except Exception as exc:  # noqa: BLE001
            errors[f"canary@{seq}"] = \
                f"{type(exc).__name__}: {str(exc)[:200]}"

    for name, fn in BENCH_QUERIES + ext:
        if seq % CANARY_EVERY == 0:
            _canary()
        name_seqs.append((name, seq))
        seq += 1
        try:
            # min of 2 is the headline (drops scheduler noise, stays
            # honest); BOTH raw runs are recorded so run-to-run variance —
            # including cold-cache behavior min-of-2 would hide — is
            # visible in the detail artifact
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
            if seq % CANARY_EVERY == 0:
                _canary()
            name_seqs.append((f"{entry}:{cname}", seq))
            seq += 1
            try:
                fn = reg[cname][0]
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                group[cname] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors[f"{entry}:{cname}"] = \
                    f"{type(exc).__name__}: {str(exc)[:200]}"
        constituent_times[entry] = group

    _canary()   # closing reading so the last block has a right edge
    med, contended_initial = contended_names(canaries, name_seqs)

    # Canary-gated retry (r10 verdict next-round #1a): the r10 artifact
    # PROVED its own contention (canary excursions to 5x median around
    # headliner runs swinging 1.8-2.4x) and still committed the inflated
    # minutes. Any HEADLINER whose enclosing canaries flagged contention
    # re-runs once after the sweep, bracketed by its own canaries; the
    # headline takes min(original, retry) — the honest best reading —
    # and the detail records every reading plus both contended lists, so
    # the committed artifact is self-correcting instead of
    # self-incriminating.
    core = {k for k, _ in BENCH_QUERIES}
    timings_no_retry = dict(timings)   # pre-retry snapshot (lineage)
    retry_runs: dict[str, list[float]] = {}
    flagged = [n for n in contended_initial if n in core and n in timings]
    by_name = dict(BENCH_QUERIES)
    for name in flagged:
        _canary()
        name_seqs.append((f"retry:{name}", seq))
        seq += 1
        try:
            t0 = time.perf_counter()
            _force(by_name[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            retry_runs[name] = [dt]
            timings[name] = min(timings[name], dt)
        except Exception as exc:  # noqa: BLE001
            errors[f"retry:{name}"] = \
                f"{type(exc).__name__}: {str(exc)[:200]}"
    if flagged:
        _canary()
    med, contended = contended_names(canaries, name_seqs)

    total = round(sum(v for k, v in timings.items() if k in core), 3)
    total_no_retry = round(sum(v for k, v in timings_no_retry.items()
                               if k in core), 3)
    box = box_speed(spark)
    mini = mini_headliner_speed(spark)
    norm_geo = box_normalized(total, box)
    norm = box_normalized_mini(total, mini)
    # normalization lineage (r11 verdict #6): value_box_normalized's
    # meaning changed across rounds (r10 JVM geomean → r11 mini anchor);
    # the detail now NAMES which denominator produced it
    normalization = "mini_anchor" if norm is not None else \
        ("jvm_geomean" if norm_geo is not None else "none")
    if norm is None:
        norm = norm_geo
    band = norm_band(total, box)

    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "value_no_retry": total_no_retry,
        "value_box_normalized": norm,
        "value_box_normalized_jvm_geomean": norm_geo,
        "normalization": normalization,
        "norm_band": band,
        "unit": "sec",
        "sf": sf,
        "queries": timings,
        "runs": runs,
        "retries": retry_runs,
        "total_with_new_ops": round(sum(timings.values()), 3),
        "constituents": constituent_times,
        "errors": errors,
        "box": box,
        "box_baseline": BOX_BASELINE,
        "mini": mini,
        "mini_baseline": MINI_BASELINE,
        "canary": {
            "query": f"message_envelope@{CANARY_SF_DIR.rsplit('/', 1)[-1]}",
            "every": CANARY_EVERY,
            "factor": CANARY_FACTOR,
            "median_sec": med,
            "series": canaries,
            "contended_initial": contended_initial,
            "contended": contended,
        },
    }
    detail_path = Path(__file__).resolve().parent / "docs" / detail_name()
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")

    line = compact_line(total, sf, timings, len(errors), box_norm=norm,
                        band=band, total_no_retry=total_no_retry)
    assert len(line.encode()) <= MAX_STDOUT_BYTES, \
        f"bench stdout line {len(line.encode())}B exceeds budget"
    print(line)


def _force(df) -> int:
    """Execute the full plan without materializing on the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


if __name__ == "__main__":
    main()
