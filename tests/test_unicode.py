"""Unicode robustness: the shipped fixture corpus is pure ASCII, so the
oracle gate never exercises multibyte text. These tests run the text
operators over accented/CJK/emoji documents and compare Spark vs DuckDB
with the same driver-faithful normalization — locking in that both
engines are codepoint-aware (length('a😀b') = 3 on both; split('') and
regex '.' yield whole codepoints, verified for BMP and supplementary
planes)."""

import importlib.util
import sys
from collections import Counter
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import Row

_spec = importlib.util.spec_from_file_location(
    "check_oracle", Path(__file__).resolve().parent.parent
    / "tools" / "check_oracle.py")
_co = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("check_oracle_for_tests", _co)
_spec.loader.exec_module(_co)

TEXTS = [
    "das schöne Café an der Straße",
    "日本語 の 形態素 解析 は 難しい",
    "emoji 😀 in the 😀 middle",
    "mixed ASCII und ümlauts zusammen",
    "ACCENT café vs cafe difference",
    "das schöne Café an der Straße",       # exact dup of doc 0
    "зеленый чай и черный чай",
]


@pytest.fixture(scope="module")
def uni_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("unicorpus")
    rows = [Row(doc_id=i, text=t, lang="xx", source="uni",
                n_chars=len(t)) for i, t in enumerate(TEXTS)]
    spark.createDataFrame(rows).write.mode("overwrite") \
        .parquet(str(d / "documents.parquet"))
    return str(d)


def _compare(spark, sf_dir, fn, sql):
    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY — glob it for DuckDB
    con.sql(f"CREATE VIEW documents AS SELECT *"
            f" FROM '{sf_dir}/documents.parquet/*.parquet'")
    s_cols, s_data = _co.spark_rows(fn(spark, sf_dir))
    d_cols, d_data = _co.duck_rows(con, sql)
    assert s_cols == d_cols
    assert Counter(s_data) == Counter(d_data)
    return s_data


def test_text_stats_unicode(spark, uni_dir):
    from melt_spark.plans.pipeline_suite import SQL_TEXT_STATS, q_text_stats

    rows = _compare(spark, uni_dir, q_text_stats, SQL_TEXT_STATS)
    assert len(rows) == len(TEXTS)


def test_quality_scores_unicode(spark, uni_dir):
    from melt_spark.plans.pipeline_suite import (SQL_QUALITY_SCORES,
                                                 q_quality_scores)

    _compare(spark, uni_dir, q_quality_scores, SQL_QUALITY_SCORES)


def test_exact_dedup_unicode(spark, uni_dir):
    from melt_spark.plans.pipeline_suite import SQL_DEDUP_EXACT, q_dedup_exact

    # the query unions an id-shifted copy: 6 distinct fingerprints (docs
    # 0 and 5 are planted exact dups), the planted group has 4 members
    rows = _compare(spark, uni_dir, q_dedup_exact, SQL_DEDUP_EXACT)
    assert len(rows) == 6
    assert sorted(r[2] for r in rows) == ["2", "2", "2", "2", "2", "4"]


def test_lm_perplexity_unicode(spark, uni_dir):
    from melt_spark.plans.pipeline_suite import (SQL_LM_PERPLEXITY,
                                                 q_lm_perplexity)

    _compare(spark, uni_dir, q_lm_perplexity, SQL_LM_PERPLEXITY)


def test_bpe_train_unicode(spark, uni_dir):
    """BPE char-splits words — the supplementary-plane hazard: a UTF-16
    code-unit split would break 😀 into surrogate halves Spark-side while
    DuckDB keeps whole codepoints. Verified equal."""
    from melt_spark.plans.pipeline_suite import SQL_BPE_TRAIN, q_bpe_train

    rows = _compare(spark, uni_dir, q_bpe_train, SQL_BPE_TRAIN)
    assert any("😀" in r for row in rows for r in row if r)
