"""Unit tests for the scalar function surface (SURVEY §2.8) — the
Trino→Spark dialect shims the gold models and query library build on."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagmarshal_data_lakehouse_spark import functions as fn
from tagmarshal_data_lakehouse_spark.session import table_format
from tagmarshal_data_lakehouse_spark.training import text


def test_date_diff_family(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "2024-01-01 10:02:30")], ["a", "b"]
    ).select(F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b"))
    row = df.select(
        fn.date_diff_seconds(F.col("a"), F.col("b")).alias("s"),
        fn.date_diff_minutes(F.col("a"), F.col("b")).alias("m"),
    ).first()
    assert row["s"] == 150
    assert row["m"] == 2  # Trino truncates toward zero


def test_iso_dayofweek(spark):
    # 2024-01-01 is a Monday; 2024-01-07 a Sunday
    df = spark.createDataFrame([("2024-01-01",), ("2024-01-07",)], ["d"]).select(
        F.to_date("d").alias("d")
    )
    got = [r["dow"] for r in df.select(fn.iso_dayofweek(F.col("d")).alias("dow")).collect()]
    assert got == [1, 7]


def test_median_exact_and_approx(spark):
    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4, 100)], ["x"])
    row = df.agg(
        fn.median_exact(F.col("x")).alias("m"),
        fn.median_approx(F.col("x")).alias("ma"),
    ).first()
    assert row["m"] == 3.0
    assert 1.0 <= row["ma"] <= 100.0


def test_sorted_set_join(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",)], ["s"])
    # default "+" separator is the reference's nines-played label idiom
    assert df.agg(fn.sorted_set_join(F.col("s")).alias("j")).first()["j"] == "a+b"
    assert df.agg(fn.sorted_set_join(F.col("s"), ", ").alias("j")).first()["j"] == "a, b"


def test_safe_div_and_pct(spark):
    row = (
        spark.createDataFrame([(10.0, 0.0), (10.0, 4.0)], ["num", "den"])
        .select(
            fn.safe_div(F.col("num"), F.col("den")).alias("d"),
            fn.pct(F.col("num"), F.col("den")).alias("p"),
        )
        .collect()
    )
    assert row[0]["d"] is None and row[0]["p"] is None  # div by zero -> NULL, not error
    assert row[1]["d"] == 2.5 and row[1]["p"] == 250.0


def test_count_if(spark):
    df = spark.createDataFrame([(1,), (5,), (9,)], ["x"])
    assert df.agg(fn.count_if(F.col("x") > 3).alias("n")).first()["n"] == 2


def test_point_wkt(spark):
    df = spark.createDataFrame([(30.5, -97.75), (None, -97.75)], ["lat", "lon"])
    got = [
        r["v"] for r in df.select(fn.point_wkt(F.col("lon"), F.col("lat")).alias("v")).collect()
    ]
    # reference format (etl.py:554-567): no space after POINT; NULL coord -> NULL
    assert got == ["POINT(-97.75 30.5)", None]


def test_text_ratio_helpers(spark):
    df = spark.createDataFrame([("ABc dEF",)], ["t"])
    row = df.select(
        text.upper_ratio(F.col("t")).alias("u"),
        text.punct_count(F.col("t")).alias("p"),
    ).first()
    assert abs(row["u"] - 4 / 7) < 1e-9
    assert row["p"] == 0


def test_table_format_reports_parquet_without_delta():
    # the test container ships no delta-spark, so managed writes are parquet
    assert table_format() == "parquet"


def test_token_rarity_crafted_frequencies(spark):
    """Known corpus: 'common' appears 6x, 'mid' 2x, uniques 1x each."""
    from tagmarshal_data_lakehouse_spark.training.text import token_rarity

    df = spark.createDataFrame(
        [
            (1, "common common common mid unique1"),
            (2, "common common common mid unique2"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_rarity(df).collect()}
    # doc 1 tokens: common(freq 6) x3, mid(freq 2) x1, unique1(freq 1) x1
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["mean_token_freq"] == round((3 * 6 + 1 * 2 + 1 * 1) / 5, 6)
    assert rows[1]["rare_fraction"] == round(2 / 5, 6)  # mid + unique1
    assert rows[1]["rarest_token_freq"] == 1
    # blank doc keeps its row with zeroed/NULL profile
    assert rows[3]["n_tokens"] == 0 and rows[3]["mean_token_freq"] is None


def test_source_token_diversity_crafted_concentration(spark):
    """Known corpus: source 'spam' repeats one token (high concentration),
    source 'web' is all-unique (TTR 1), source 'blank' keeps a row with
    NULL token metrics."""
    from tagmarshal_data_lakehouse_spark.training.text import source_token_diversity

    df = spark.createDataFrame(
        [
            (1, "spam", "buy buy buy buy now"),
            (2, "web", "alpha beta gamma"),
            (3, "web", "delta"),
            (4, "blank", "   "),
        ],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in source_token_diversity(df).collect()}
    # spam: tokens buy(4), now(1) -> N=5, vocab=2, top=4, sumsq=17
    assert rows["spam"]["n_docs"] == 1
    assert rows["spam"]["n_tokens"] == 5
    assert rows["spam"]["vocab_size"] == 2
    assert rows["spam"]["top_token_freq"] == 4
    assert rows["spam"]["type_token_ratio"] == round(2 / 5, 6)
    assert rows["spam"]["top_token_share"] == round(4 / 5, 6)
    assert rows["spam"]["hhi"] == round(17 / 5 / 5, 9)
    # web: 4 unique tokens across 2 docs -> TTR 1, HHI 1/N
    assert rows["web"]["n_docs"] == 2
    assert rows["web"]["n_tokens"] == 4
    assert rows["web"]["type_token_ratio"] == 1.0
    assert rows["web"]["hhi"] == round(4 / 4 / 4, 9)
    # blank-only source keeps its row, token metrics NULL
    assert rows["blank"]["n_docs"] == 1 and rows["blank"]["n_tokens"] is None


def test_hopping_window_covers_each_event_twice(spark, sf_smoke):
    """Hopping 1h/30min windows: every event lands in exactly size/hop=2
    windows, so Σ n_events over the hopping output is exactly 2x the
    tumbling (1h/1h) total; window starts align to :00/:30."""
    from pyspark.sql import functions as F

    from tagmarshal_data_lakehouse_spark.queries.events_ops import (
        q_events_hopping_window,
        q_events_tumbling_window,
    )

    hop = q_events_hopping_window.build(spark, sf_smoke)
    tumble = q_events_tumbling_window.build(spark, sf_smoke)
    n_hop = hop.agg(F.sum("n_events")).collect()[0][0]
    n_tumble = tumble.agg(F.sum("n_events")).collect()[0][0]
    assert n_hop == 2 * n_tumble
    misaligned = hop.filter(~F.minute("window_start").isin(0, 30)).count()
    assert misaligned == 0
    # the bucket type must stay NTZ (tz-independence depends on it)
    assert hop.schema["window_start"].dataType.typeName() == "timestamp_ntz"


def test_bigram_lm_scores_dyadic_exact(spark):
    """MLE (alpha=0) corpus where every conditional probability is a
    power of 1/2, so -log2 P is exact and the decimal-summed mean has a
    closed form: model c(a,a)=2, c(a,b)=1, c(a,c)=1 over context count
    c(a)=4 -> nll 1, 2, 2 bits."""
    from tagmarshal_data_lakehouse_spark.training.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c"), (3, "x"), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(df, alpha=0).collect()}
    # doc 1 bigrams (a,a)x2 @1 bit + (a,b)x1 @2 bits -> mean 4/3
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["avg_nll_bits"] == round(4 / 3, 6)
    assert rows[2]["avg_nll_bits"] == 2.0
    # <2-token docs keep their row with NULL score (no bigram evidence)
    assert rows[3]["n_bigrams"] is None and rows[4]["n_bigrams"] is None

    # partitioning-independence: the decimal-summed mean is exactly
    # equal under a different physical layout
    re_rows = {
        r["doc_id"]: r["avg_nll_bits"]
        for r in bigram_lm_scores(df.repartition(7), alpha=0).collect()
    }
    assert re_rows == {i: rows[i]["avg_nll_bits"] for i in (1, 2, 3, 4)}


def test_bigram_lm_scores_junk_scores_worse(spark):
    """With the default smoothing, a document whose bigrams are unusual
    for the corpus scores a strictly higher cross-entropy than one that
    repeats the corpus-dominant pattern."""
    from tagmarshal_data_lakehouse_spark.training.text import bigram_lm_scores

    typical = "the cat sat on the mat and the cat sat again"
    df = spark.createDataFrame(
        [(i, typical) for i in range(1, 9)]
        + [(9, "the cat sat on the mat"), (10, "zq xv qqj kpl zq wm")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["avg_nll_bits"] for r in bigram_lm_scores(df).collect()}
    assert rows[10] > rows[9]


def test_bigram_lm_scores_reference_model_mode(spark):
    """CCNet deployment shape (VERDICT r10 item 6): the LM trains on a
    CLEAN reference corpus and scores a separate crawl — planted noise
    docs must rank above (higher avg_nll_bits than) clean docs, and the
    crawl must not influence the model (a noise-heavy crawl scored
    self-trained would normalize its own noise)."""
    from tagmarshal_data_lakehouse_spark.training.text import bigram_lm_scores

    clean_text = "the cat sat on the mat and the dog sat on the rug"
    model = spark.createDataFrame(
        [(i, clean_text) for i in range(1, 7)], "doc_id long, text string"
    )
    # crawl: mostly noise — self-training would make noise the norm
    crawl = spark.createDataFrame(
        [(101, "the cat sat on the mat")]
        + [(200 + i, "zq xv qqj kpl wm oqr znb") for i in range(6)],
        "doc_id long, text string",
    )
    ref = {
        r["doc_id"]: r["avg_nll_bits"]
        for r in bigram_lm_scores(crawl, model_df=model).collect()
    }
    assert all(ref[d] > ref[101] for d in ref if d != 101), ref
    # self-trained on the same crawl, the dominant noise pattern scores
    # BETTER than the clean doc — the failure mode reference mode fixes
    self_trained = {
        r["doc_id"]: r["avg_nll_bits"] for r in bigram_lm_scores(crawl).collect()
    }
    assert self_trained[201] < self_trained[101]


def test_bigram_lm_scores_oov_backoff_exact(spark):
    """Bigrams absent from the model back off to the alpha mass: with
    alpha=1 an entirely-OOV bigram (unseen context) scores exactly
    log2(V) bits, and V counts the model's FULL unigram vocabulary —
    including tokens that appear only in single-token model docs
    (ADVICE r10: corpus vocabulary, not bigram-participating
    vocabulary)."""
    import math

    from tagmarshal_data_lakehouse_spark.training.text import bigram_lm_scores

    # model vocab: a b c d — d occurs only in a single-token doc, so it
    # participates in no bigram but still belongs in V
    model = spark.createDataFrame(
        [(1, "a b c"), (2, "d")], "doc_id long, text string"
    )
    crawl = spark.createDataFrame([(10, "zz qq")], "doc_id long, text string")
    row = bigram_lm_scores(crawl, model_df=model).collect()[0]
    # P(qq|zz) = 1 / (0 + 1*4) -> 2 bits exactly (V=4; V=3 under the
    # old bigram-participant definition would give log2(3) ~ 1.585)
    assert row["n_bigrams"] == 1
    assert abs(row["avg_nll_bits"] - math.log2(4)) < 1e-6
