"""Text analysis for large-scale training-data pipelines.

Beyond-reference operators (driver north star, BASELINE.json): language ID,
quality scoring, token counting, document fingerprinting — all pure Catalyst
expressions (whole-stage codegen; no Python on the hot path), so they scan
100 TB at parquet-read speed and shuffle nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .util import one_partition
from pyspark.sql.window import Window

# Distinctive stopwords per language for the n-gram/stopword heuristic.
# Deliberately small + ASCII so the same literal lists embed in oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "por", "como"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3"],  # pinyin-ish placeholder
}

# BPE-ish token regex: word runs or single non-space punctuation.
TOKEN_REGEX = r"\w+|[^\w\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space split — matches the fixture
    corpus; swap for regex split on messy corpora)."""
    return F.split(col, " ")


def token_count_ws(col: Column | str) -> Column:
    return F.size(tokens(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish: count of word/punct tokens under TOKEN_REGEX."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0)))


# Simplified GPT-2 pre-tokenization pattern (Radford et al. 2019; the
# pattern ships in the public gpt-2 encoder.py): contractions split off,
# letter runs / digit runs / punct runs each with the optional LEADING
# space glued on (the '▁'-free way GPT-2 marks word starts). Two
# deliberate simplifications keep Java (Spark) and RE2 (DuckDB)
# bit-agreeing: ASCII classes instead of \p{L}/\p{N}, and no
# trailing-whitespace lookahead (RE2 has no lookarounds) — standalone
# whitespace RUNS between tokens are consumed by the leading-space
# alternatives one space at a time, surplus spaces are skipped.
GPT2_PRETOKEN_REGEX = (r"'s|'t|'re|'ve|'m|'ll|'d"
                       r"| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+")


def regex_pretokens(col: Column | str) -> Column:
    """GPT-2-style pre-token ARRAY — what a BPE trainer/encoder consumes
    upstream of merges: 'don't stop!' -> [don, 't, ' stop', !]."""
    return F.regexp_extract_all(col, F.lit(GPT2_PRETOKEN_REGEX), F.lit(0))


def pretoken_fertility(docs, id_col: str = "doc_id",
                       text_col: str = "text",
                       group_col: str = "source"):
    """Per-source tokenizer-fertility readout: pretokens per whitespace
    word and characters per pretoken under the GPT-2 pre-tokenization —
    the two numbers tokenizer comparisons lead with (HF tokenizer docs
    call pretokens-per-word "fertility"; chars-per-token is the
    compression rate). High fertility on a source means the tokenizer
    fragments it (more compute per character at train time) — the
    readout a corpus-mixing decision consults next to diversity and
    quality.

    Exact integers end-to-end (counts and lengths), the two ratios
    quantized once to e6 via portable half-up floor(x+0.5). One
    map-side-combined groupBy on the source — scan-speed otherwise."""
    grp = F.col(group_col).alias("grp")
    per = docs.select(
        grp,
        F.size(regex_pretokens(text_col)).cast("bigint").alias("npt"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("nw"),
        F.length(text_col).cast("bigint").alias("nc"))
    agg = (per.groupBy("grp")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("npt").cast("bigint").alias("n_pretokens"),
                F.sum("nw").cast("bigint").alias("n_words"),
                F.sum("nc").cast("bigint").alias("n_chars")))
    ppw = F.floor(F.col("n_pretokens").cast("double")
                  / F.col("n_words") * F.lit(1e6) + F.lit(0.5))
    cpp = F.floor(F.col("n_chars").cast("double")
                  / F.col("n_pretokens") * F.lit(1e6) + F.lit(0.5))
    return agg.select(F.col("grp").alias(group_col), "n_docs",
                      "n_pretokens", "n_words", "n_chars",
                      ppw.cast("bigint").alias("ppw_e6"),
                      cpp.cast("bigint").alias("cpp_e6"))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Distinct stopwords of `lang` present in the text."""
    return F.size(F.array_intersect(
        tokens(col), F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax stopword hits, ties broken by language
    code order, 'und' (undetermined) when no stopword matches at all."""
    scores = {lang: stopword_hits(col, lang) for lang in sorted(STOPWORDS)}
    best = None
    best_score = None
    for lang in sorted(STOPWORDS):  # later langs must win strictly
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def punct_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), F.lit(0)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0,1]:
    length, token stats, punctuation ratio, English-stopword ratio.
    All ratios are single divisions of exact ints — bit-deterministic."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        (n_chars.cast("double") / n_tokens).alias("q_mean_tok_len"),
        (punct_count(c).cast("double") / n_tokens).alias("q_punct_ratio"),
        (stopword_hits(c, "en").cast("double")
         / F.lit(len(STOPWORDS["en"]))).alias("q_stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite score: rewards stopword coverage and sane token lengths,
    penalizes punctuation soup. Formula kept to portable arithmetic so the
    oracle can restate it exactly."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("q_stopword_ratio") * 2, F.lit(1.0)) * 0.5
        + F.when((F.col("q_mean_tok_len") >= 3) & (F.col("q_mean_tok_len") <= 10),
                 F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(F.col("q_punct_ratio") < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return feats.withColumn("quality", score)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    — the exact-dedup key. (md5 is engine-portable; a rolling/karp-rabin
    hash would not hash-match any SQL oracle.)"""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(normalized)


def pmi_collocations(docs: DataFrame, min_count: int = 5, k: int = 20,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information (Church &
    Hanks, "Word association norms, mutual information, and lexicography",
    Computational Linguistics 1990) — the standard corpus-statistics lens
    for multiword expressions ("new york", "neural network") that phrase-
    aware tokenizers, query segmenters and stop-phrase lists consume.

        pmi(a, b) = ln( p(a,b) / (p(a)·p(b)) )
                  = ln( (c_ab·N) / (T·c_a) · (N / c_b) )

    with c_ab the adjacent-bigram count, T the total bigram count, c_a/c_b
    unigram counts and N the total token count. The ln argument is a fixed
    chain of IEEE divides/multiplies of exact integers (written with the
    SAME structure in the oracle, and never forming N² which would
    overflow BIGINT at 100 TB scale); the result is scaled to an integer
    pmi_e9 = round(ln(·)·1e9) once, so ranking and hashing are exact
    BIGINT arithmetic (the repo's ln-ulp discipline, made integer).

    Scale shape (100 TB): this is word-count — the bigram and unigram
    aggregations are map-side combined, so each shuffle moves one row per
    DISTINCT type per partition (vocabulary-sized, Heaps-bounded), never
    per token; the unigram table broadcasts into the bigram table twice;
    the two totals are broadcast scalars. min_count prunes the hapax tail
    before the ranking sort, which runs over the (tiny) surviving type
    table only.
    """
    from .util import spread_input

    docs = spread_input(docs, id_col)
    toks = tokens(text_col)
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, i + 1).alias("b")))
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    c2 = (docs.select(F.explode(pairs).alias("p"))
          .select("p.a", "p.b")
          .groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab")))
    uni = (docs.select(F.explode(toks).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    totals = (uni.agg(F.sum("c").cast("bigint").alias("n_tokens"))
              .crossJoin(c2.agg(F.sum("c_ab").cast("bigint")
                                .alias("n_bigrams"))))

    arg = ((F.col("c_ab").cast("double") * F.col("n_tokens").cast("double"))
           / (F.col("n_bigrams").cast("double") * F.col("c_a").cast("double"))
           * (F.col("n_tokens").cast("double") / F.col("c_b").cast("double")))
    scored = (c2.filter(F.col("c_ab") >= min_count)
              .join(F.broadcast(uni.select(F.col("tok").alias("a"),
                                           F.col("c").alias("c_a"))), "a")
              .join(F.broadcast(uni.select(F.col("tok").alias("b"),
                                           F.col("c").alias("c_b"))), "b")
              .crossJoin(F.broadcast(totals))
              .select(F.concat_ws(" ", "a", "b").alias("bigram"), "c_ab",
                      F.round(F.log(arg) * F.lit(1e9)).cast("bigint")
                      .alias("pmi_e9")))
    from pyspark.sql.window import Window

    top = scored.orderBy(F.desc("pmi_e9"), F.asc("bigram")).limit(k)
    w = Window.partitionBy(one_partition(F.col("pmi_e9")))\
        .orderBy(F.desc("pmi_e9"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(w))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass convenience projection: counts, language, fingerprint."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )

_WINNOW_PACK = 1 << 48       # packed gram = pos * 2^48 + hash48
_WINNOW_MAX_POS = (1 << 15) - 1   # pos budget: 2^15·2^48 stays positive


def winnow_fingerprints(df: DataFrame, k: int = 4, w: int = 5,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints — Schleimer, Wilkerson & Aiken,
    "Winnowing: local algorithms for document fingerprinting" (SIGMOD
    2003), the MOSS algorithm: hash every k-gram, slide a window of w
    consecutive hashes, keep each window's minimum (RIGHTMOST minimum on
    ties, the paper's robust-winnowing rule), dedupe selections. The
    guarantee: any match of length >= w + k - 1 tokens between two
    documents shares at least one selected fingerprint, with density
    ~2/(w+1) — the principled middle ground between full shingle sets
    (k-gram Jaccard) and one hash per document.

    Spark-first: the whole selection is per-document array arithmetic in
    one projection — gram hashing, window minima, distinct — ZERO
    shuffles, no UDF. Each gram packs as pos·2^48 + hash48 in ONE BIGINT
    (hash48 is the md5 fold of sketches.kmv_hash; pos < 2^15 — guard
    longer docs by chunking first): the window fold compares the low 48
    bits with <= (later equal hash wins = rightmost min) and
    array_distinct works on plain longs — struct distinct is not
    portable. Documents shorter than k tokens yield no grams and are
    absent from the output (the caller left-joins if presence matters).

    Output: (id_col, pos, fp) — 1-based gram position and fingerprint of
    each selected k-gram, one row per distinct selection.
    """
    from .util import spread_input

    df = spread_input(df, id_col)
    toks = tokens(text_col)
    n = F.size(toks)
    C = F.lit(_WINNOW_PACK).cast("long")
    # pos < 2^15 packing bound — ENFORCED (r5 ADVICE): a document with
    # more than 32767 grams would silently overflow pos·2^48 into the
    # sign bit and corrupt positions/fingerprints; raise loudly at
    # execution time instead (gapfill's max_spine pattern) so long docs
    # are chunked by the caller, never silently mis-fingerprinted.
    n_grams = n - k + 1
    n = F.when(n_grams <= _WINNOW_MAX_POS, n).otherwise(
        F.raise_error(F.concat(
            F.lit("winnow_fingerprints: "),
            n_grams.cast("string"),
            F.lit(f" grams exceeds the pos-packing bound "
                  f"{_WINNOW_MAX_POS} — chunk documents longer than "
                  f"{_WINNOW_MAX_POS} tokens first"))))
    grams = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: i.cast("long") * C
        + F.conv(F.substring(F.md5(F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)])),
            1, 12), 16, 10).cast("long"))
    ).otherwise(F.array().cast("array<bigint>"))

    # materialize the hashed gram array in its OWN projection: `picks`
    # references it once per window, and inlining would re-run the md5
    # hashing per reference — O(m·w) md5 calls per document instead of
    # O(m). Spark's CollapseProject keeps a multiply-referenced
    # non-cheap alias materialized (collapseProjectAlwaysInline=false
    # default), so this boundary is load-bearing; measured 51 s → 2 s
    # at sf0.1.
    g = df.select(F.col(id_col), grams.alias("__grams"))
    garr = F.col("__grams")
    m = F.size(garr)

    def _win_min(arr):
        return F.aggregate(
            F.slice(arr, 2, F.size(arr) - 1), F.element_at(arr, 1),
            lambda acc, gr: F.when(gr % C <= acc % C, gr).otherwise(acc))

    picks = F.when(m >= w, F.array_distinct(F.transform(
        F.sequence(F.lit(1), m - w + 1),
        lambda j: _win_min(F.slice(garr, j, w))
    ))).otherwise(F.when(m > 0, F.array(_win_min(garr)))
                  .otherwise(F.array().cast("array<bigint>")))
    return (g.select(F.col(id_col), F.explode(picks).alias("pk"))
            .select(id_col,
                    F.expr(f"pk div {_WINNOW_PACK}").alias("pos"),
                    (F.col("pk") % C).alias("fp")))


def diversity_profile(df: DataFrame, top_r: int = 100,
                      source_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Per-source corpus diversity profile — the three standard lenses a
    training-mix report runs over each corpus slice:

    * type-token ratio (TTR): distinct tokens / total tokens — lexical
      diversity (Templin 1957; the distinct-n family of Li et al.,
      NAACL 2016 measures generated-text diversity the same way);
    * distinct-3: distinct / total 3-grams — phrase-level diversity,
      the Self-BLEU complement;
    * Zipf slope: OLS slope of ln(freq) on ln(rank) over the top_r most
      frequent tokens — natural text sits near −1 (Zipf 1949; Piantadosi
      2014 review); template/boilerplate corpora flatten, spam steepens.

    Ratios are exact-integer ppm (·1e6 floor-div). The slope follows the
    repo's ln discipline (lm.py): ln of exact integer inputs, folded in
    PINNED rank order from 0.0 seeds, slope rounded to 9 — identical
    fold order on both engines. Shuffles carry (source, int64 digest,
    count) rows only; the top-r ranking windows over the per-source
    TYPE table (vocabulary-sized), never tokens.

    Output: (source, n_tokens, ttr_e6, distinct3_e6, zipf_slope).
    """
    from .util import spread_input

    df = spread_input(df, source_col)
    toks = tokens(text_col)
    src = F.col(source_col)

    tok_counts = (df.select(src.alias("source"),
                            F.explode(toks).alias("tok"))
                  .groupBy("source", F.xxhash64("tok").alias("h"))
                  .agg(F.count(F.lit(1)).alias("c")))
    per_src = (tok_counts.groupBy("source")
               .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_types")))

    n = F.size(toks)
    g3 = F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.xxhash64(F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1),
            F.element_at(toks, i + 2))))
    ).otherwise(F.array().cast("array<bigint>"))
    tri = (df.select(src.alias("source"), F.explode(g3).alias("h"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_tri"),
                F.countDistinct("h").alias("d_tri")))

    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("h"))
    top = (tok_counts.withColumn("r", F.row_number().over(w))
           .filter(F.col("r") <= top_r))
    # ordered fold of the four OLS sums in rank order (pinned), 0.0 seeds
    series = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("nr"),
        F.array_sort(F.collect_list(F.struct("r", "c"))).alias("rc"))
    lnr = lambda s: F.log(s["r"].cast("double"))       # noqa: E731
    lnc = lambda s: F.log(s["c"].cast("double"))       # noqa: E731
    folded = series.select(
        "source", "nr",
        F.aggregate(F.col("rc"), F.lit(0.0),
                    lambda a, s: a + lnr(s)).alias("sx"),
        F.aggregate(F.col("rc"), F.lit(0.0),
                    lambda a, s: a + lnc(s)).alias("sy"),
        F.aggregate(F.col("rc"), F.lit(0.0),
                    lambda a, s: a + lnr(s) * lnc(s)).alias("sxy"),
        F.aggregate(F.col("rc"), F.lit(0.0),
                    lambda a, s: a + lnr(s) * lnr(s)).alias("sxx"))
    slope = ((F.col("nr") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("nr") * F.col("sxx") - F.col("sx") * F.col("sx")))

    ppm = lambda num, den: F.expr(       # noqa: E731
        f"CAST({num} * 1000000 div {den} AS BIGINT)")
    return (per_src.join(tri, "source").join(folded, "source")
            .select("source", "n_tokens",
                    ppm("n_types", "n_tokens").alias("ttr_e6"),
                    ppm("d_tri", "n_tri").alias("distinct3_e6"),
                    F.round(slope, 9).alias("zipf_slope")))


def heaps_curve(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", n_points: int = 20) -> DataFrame:
    """Vocabulary-growth (Heaps'/Herdan's law) curve: distinct types V
    vs cumulative tokens N at ``n_points`` checkpoints along the
    corpus' doc-id order, plus the fitted exponent β of V = k·N^β
    (log-log OLS over the checkpoints) — the corpus statistic that
    tells a tokenizer/dedup pipeline whether vocabulary is still
    growing (β near 0.5 for natural text; a plateau means the crawl is
    saturating, a β near 1 means heavy unseen content).

    Returns one row per checkpoint (pt, max_doc, n_tokens, n_types)
    with beta_e6 repeated on each — counts exact; β folds over the
    SORTED bounded checkpoint list in pinned IEEE order, rounded once.

    Scale shape: one explode + two map-side-combined groupBys (word ->
    first doc, doc -> token count), then everything is checkpoint-sized
    (n_points rows): the vocab and doc tables broadcast-join the tiny
    checkpoint table; the final fit runs on ONE collected bounded row.
    No per-row state, no global sort."""
    toks = docs.select(F.col(id_col).alias("__d"),
                       F.explode(tokens(text_col)).alias("__w"))
    first = toks.groupBy("__w").agg(F.min("__d").alias("__fd"))
    per_doc = toks.groupBy("__d").agg(F.count(F.lit(1)).alias("__nt"))
    mx = docs.agg(F.max(F.col(id_col)).alias("__mx"))
    pts = (mx.select(F.explode(F.sequence(
        F.lit(1), F.lit(n_points))).alias("pt"), "__mx")
        .select("pt", F.floor(F.col("__mx") * F.col("pt") / n_points)
                .cast("bigint").alias("max_doc")))
    types_at = (first.crossJoin(F.broadcast(pts))
                .filter(F.col("__fd") <= F.col("max_doc"))
                .groupBy("pt", "max_doc")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_types")))
    toks_at = (per_doc.crossJoin(F.broadcast(pts))
               .filter(F.col("__d") <= F.col("max_doc"))
               .groupBy("pt")
               .agg(F.sum("__nt").cast("bigint").alias("n_tokens")))
    curve = types_at.join(toks_at, "pt")
    one = curve.groupBy().agg(F.sort_array(F.collect_list(
        F.struct("pt", "max_doc", "n_tokens", "n_types"))).alias("a"))
    # log-log OLS slope over the bounded checkpoint list, index order
    lx = "ln(CAST(x.n_tokens AS DOUBLE))"
    ly = "ln(CAST(x.n_types AS DOUBLE))"
    folds = one.select(
        "a",
        F.expr(f"aggregate(a, 0.0D, (p, x) -> p + {lx})").alias("__sx"),
        F.expr(f"aggregate(a, 0.0D, (p, x) -> p + {ly})").alias("__sy"),
        F.expr(f"aggregate(a, 0.0D, (p, x) -> p + {lx} * {ly})")
        .alias("__sxy"),
        F.expr(f"aggregate(a, 0.0D, (p, x) -> p + {lx} * {lx})")
        .alias("__sxx"),
        F.size("a").cast("double").alias("__n"))
    beta = ((F.col("__sxy") * F.col("__n")
             - F.col("__sx") * F.col("__sy"))
            / (F.col("__sxx") * F.col("__n")
               - F.col("__sx") * F.col("__sx")))
    ex = folds.select(
        F.round(beta * F.lit(1_000_000.0)).cast("bigint")
        .alias("beta_e6"),
        F.explode("a").alias("x"))
    return ex.select(F.col("x.pt").cast("int").alias("pt"),
                     F.col("x.max_doc").alias("max_doc"),
                     F.col("x.n_tokens").alias("n_tokens"),
                     F.col("x.n_types").alias("n_types"),
                     "beta_e6")
