"""Registry entries for the training-data operators (documents/embeddings).

Oracle-checked wherever the computation is SQL-expressible in DuckDB
(exact dedup, token stats, quality scoring, language-ID, n-gram Jaccard,
decimal-exact cosine top-k, multimodal feature extraction — the last one
notable: the oracle verifies a mapInPandas pipeline end-to-end because the
stub features are deterministic).  MinHash-LSH and SimHash use engine
hashes (xxhash64 / packed md5) with no DuckDB twin, so they are rows-only
checks by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import Query, load_views
from . import bpe, clustering, curation, dedup, multimodal, pq, sampling, similarity, text
from .simhash import simhash_near_duplicates

# DuckDB spelling of normalize_text (regexp_replace needs the 'g' flag;
# Spark replaces all matches by default).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKENS = f"regexp_split_to_array({_NORM}, '\\s+')"
_EN = "['the','a','of','and','to','in','is','it','that','for']"
_DE = "['der','die','das','und','ist','ein','nicht','mit','den','von']"
_ES = "['el','la','de','que','y','en','un','es','no','por']"
_FR = "['le','la','de','et','un','est','que','pour','dans','ne']"


def _hits(words: str) -> str:
    return f"CAST(len(list_filter({_TOKENS}, x -> list_contains({words}, x))) AS INT)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.table("documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.table("embeddings")


q_doc_dedup_exact = Query(
    name="doc_dedup_exact",
    build=lambda spark, sf_dir: dedup.exact_duplicates(_docs(spark, sf_dir)),
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, md5({_NORM}) AS content_md5 FROM documents
        )
        SELECT doc_id, content_md5,
               CAST(COUNT(*) OVER (PARTITION BY content_md5) AS BIGINT) AS cluster_size,
               ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id ASC) = 1 AS is_canonical,
               (COUNT(*) OVER (PARTITION BY content_md5) > 1)
                 AND NOT (ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id ASC) = 1)
                 AS is_duplicate
        FROM hashed
    """,
    doc="Exact dedup on normalized-content digest: cluster size + canonical "
    "member election (hash-groupBy; single uniform shuffle at scale).",
)

q_doc_token_stats = Query(
    name="doc_token_stats",
    build=lambda spark, sf_dir: _docs(spark, sf_dir).select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        text.bpe_ish_token_count(F.col("text")).alias("n_subword_units"),
        text.fingerprint(F.col("text")).alias("fingerprint16"),
    ),
    oracle=f"""
        SELECT doc_id,
               CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                         ELSE len({_TOKENS}) END AS INT)                    AS n_tokens,
               CAST(list_sum(list_transform(
                      regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'),
                      p -> CAST(ceil(length(p) / 4.0) AS INT))) AS INT)     AS n_subword_units,
               substr(md5({_NORM}), 1, 16)                                  AS fingerprint16
        FROM documents
    """,
    doc="Token counting (whitespace + BPE-ish subword estimate) and md5 "
    "document fingerprint — corpus budgeting primitives.",
)

q_doc_quality = Query(
    name="doc_quality",
    build=lambda spark, sf_dir: text.quality_features(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_bytes",
        "n_tokens",
        "mean_token_len",
        "stopword_ratio_en",
        "punct_ratio",
        "quality_score",
    ),
    oracle=f"""
        WITH feat AS (
            SELECT doc_id,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                             ELSE len({_TOKENS}) END AS INT) AS n_tokens,
                   length({_NORM}) AS n_norm_chars,
                   {_hits(_EN)} AS sw_hits,
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS INT) AS n_punct
            FROM documents
        )
        SELECT doc_id, n_bytes, n_tokens,
               ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) AS mean_token_len,
               ROUND(sw_hits / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6)      AS stopword_ratio_en,
               ROUND(n_punct / NULLIF(CAST(n_bytes AS DOUBLE), 0.0), 6)       AS punct_ratio,
               ROUND(
                 4.0e1 * CAST(n_bytes >= 100 AND n_bytes <= 100000 AS INT)
                 + 3.0e1 * CAST(ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) >= 2.0
                           AND ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) <= 12.0 AS INT)
                 + 2.0e1 * CAST(ROUND(sw_hits / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) <= 0.6 AS INT)
                 + 1.0e1 * CAST(ROUND(n_punct / NULLIF(CAST(n_bytes AS DOUBLE), 0.0), 6) <= 0.2 AS INT), 1) AS quality_score
        FROM feat
    """,
    doc="Per-document quality features + 40/30/20/10 weighted score — the "
    "reference's composite-score idiom (critical_column_gaps.sql:146-154) "
    "applied to corpus QA.",
)

q_doc_semantic_domain_profile = Query(
    name="doc_semantic_domain_profile",
    # The cross-table curation planning op: text-quality features joined
    # to the embedding table's semantic label (documents ⋈ embeddings on
    # id, equi-join — co-partitionable on the id at scale, then one
    # (label) aggregation). A curation pipeline reads this to decide
    # which semantic domains need re-filtering or up-sampling.
    build=lambda spark, sf_dir: (
        text.quality_features(_docs(spark, sf_dir))
        .join(
            _embs(spark, sf_dir).select(F.col("vec_id").alias("doc_id"), "label"),
            "doc_id",
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            # integer sums are exact in any engine/order: one division
            F.round(
                F.sum(F.col("n_tokens").cast("bigint")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("avg_tokens"),
            # quality_score has scale 1 -> DECIMAL(18,1) sums are exact
            F.round(
                F.sum(F.col("quality_score").cast("decimal(18,1)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
            F.round(
                F.sum((F.col("quality_score") >= 70).cast("int")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("share_high_quality"),
        )
    ),
    oracle=f"""
        WITH feat AS (
            SELECT doc_id, source,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                             ELSE len({_TOKENS}) END AS INT) AS n_tokens,
                   length({_NORM}) AS n_norm_chars,
                   {_hits(_EN)} AS sw_hits,
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS INT) AS n_punct
            FROM documents
        ), scored AS (
            SELECT doc_id, source, n_tokens,
                   ROUND(
                     4.0e1 * CAST(n_bytes >= 100 AND n_bytes <= 100000 AS INT)
                     + 3.0e1 * CAST(ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) >= 2.0
                               AND ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) <= 12.0 AS INT)
                     + 2.0e1 * CAST(ROUND(sw_hits / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) <= 0.6 AS INT)
                     + 1.0e1 * CAST(ROUND(n_punct / NULLIF(CAST(n_bytes AS DOUBLE), 0.0), 6) <= 0.2 AS INT), 1) AS quality_score
            FROM feat
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               ROUND(CAST(SUM(CAST(n_tokens AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
               ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(18,1))) AS DOUBLE) / COUNT(*), 6) AS avg_quality,
               ROUND(CAST(SUM(CAST(quality_score >= 70 AS INT)) AS DOUBLE) / COUNT(*), 6) AS share_high_quality
        FROM scored
        JOIN embeddings ON vec_id = doc_id
        GROUP BY label
    """,
    doc="Per-semantic-domain corpus profile: quality/token stats grouped "
    "by embedding label via a documents ⋈ embeddings id equi-join — what "
    "a curation pipeline reads to target re-filtering and mixture "
    "weights per domain.",
)

q_doc_lang_id = Query(
    name="doc_lang_id",
    build=lambda spark, sf_dir: _docs(spark, sf_dir).select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text.language_id("text").alias("predicted_lang"),
        text.stopword_hits("text", "en").alias("en_hits"),
        text.stopword_hits("text", "de").alias("de_hits"),
        text.stopword_hits("text", "es").alias("es_hits"),
        text.stopword_hits("text", "fr").alias("fr_hits"),
    ),
    oracle=f"""
        WITH hits AS (
            SELECT doc_id, lang AS labeled_lang,
                   {_hits(_EN)} AS en_hits, {_hits(_DE)} AS de_hits,
                   {_hits(_ES)} AS es_hits, {_hits(_FR)} AS fr_hits
            FROM documents
        )
        SELECT doc_id, labeled_lang,
               CASE WHEN GREATEST(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
                    WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
                    WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
                    WHEN es_hits >= fr_hits THEN 'es'
                    ELSE 'fr' END AS predicted_lang,
               en_hits, de_hits, es_hits, fr_hits
        FROM hits
    """,
    doc="Language-ID heuristic: per-language stopword hit counts with "
    "deterministic argmax (tie-break by language order).",
)

q_doc_ngram_jaccard = Query(
    name="doc_ngram_jaccard",
    build=lambda spark, sf_dir: dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.15
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), gram_lists AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tokens) - 2, 1) + 1),
                       i -> array_to_string(list_slice(tokens, i, i + 2), ' '))) AS grams
            FROM toks
        ), sizes AS (
            SELECT doc_id, len(grams) AS n_grams FROM gram_lists
        ), inv AS (
            SELECT doc_id, unnest(grams) AS gram FROM gram_lists
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), audit AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped_grams,
                   CAST(COALESCE(SUM(CAST(gram_df * (gram_df - 1) / 2 AS BIGINT)), 0)
                        AS BIGINT) AS suppressed_pairs_est
            FROM (SELECT gram, COUNT(*) AS gram_df FROM inv GROUP BY gram)
            WHERE gram_df > 100
        )
        SELECT id_a, id_b, n_common,
               ROUND(n_common / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE), 6) AS jaccard,
               n_dropped_grams, suppressed_pairs_est
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        CROSS JOIN audit
        WHERE ROUND(n_common / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE), 6) >= 0.15
    """,
    doc="Token-trigram Jaccard near-dup pairs via inverted-index join "
    "(|A∩B| by pair-count aggregation — no set products materialized).",
)

q_doc_tf_cosine_pairs = Query(
    name="doc_tf_cosine_pairs",
    # Fractional df cap (floor 100, 20% of corpus): the absolute form is
    # scale-degenerate — at sf0.1 a fixed cap of 100 already drops the
    # ENTIRE vocabulary and returns zero pairs (SCALE.md finding #1).
    build=lambda spark, sf_dir: dedup.tf_cosine_pairs(
        _docs(spark, sf_dir), threshold=0.3, max_doc_freq=100, max_doc_frac=0.2
    ),
    # Integer TF vectors end-to-end: dot and Σtf² are BIGINT sums, the
    # cosine one correctly-rounded IEEE expression over exact inputs —
    # hash-identical across engines by construction.
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
            GROUP BY doc_id, term
        ), cap AS (
            SELECT GREATEST(CAST(100 AS BIGINT),
                            CAST(FLOOR(0.2 * COUNT(*)) AS BIGINT)) AS cap
            FROM toks
        ), term_df AS (
            SELECT term, COUNT(*) AS term_df FROM tf GROUP BY term
        ), audit AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped_terms,
                   CAST(COALESCE(SUM(CAST(term_df * (term_df - 1) / 2 AS BIGINT)), 0)
                        AS BIGINT) AS suppressed_pairs_est
            FROM term_df CROSS JOIN cap WHERE term_df > cap
        ), kept AS (
            SELECT tf.* FROM tf
            WHERE term NOT IN (SELECT term FROM term_df CROSS JOIN cap WHERE term_df > cap)
        ), norms AS (
            SELECT doc_id, SUM(tf * tf) AS norm_sq FROM kept GROUP BY doc_id
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
            FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, CAST(dot AS BIGINT) AS dot,
               ROUND(CAST(dot AS DOUBLE)
                     / (SQRT(CAST(na.norm_sq AS DOUBLE)) * SQRT(CAST(nb.norm_sq AS DOUBLE))),
                     6) AS cosine,
               n_dropped_terms, suppressed_pairs_est
        FROM pairs
        JOIN norms na ON na.doc_id = id_a
        JOIN norms nb ON nb.doc_id = id_b
        CROSS JOIN audit
        WHERE ROUND(CAST(dot AS DOUBLE)
                    / (SQRT(CAST(na.norm_sq AS DOUBLE)) * SQRT(CAST(nb.norm_sq AS DOUBLE))),
                    6) >= 0.3
    """,
    doc="Sparse lexical TF-cosine near-dup pairs via a df-capped "
    "inverted-index join — the bag-of-words counterpart of the dense "
    "embedding cosine family; integer dot/norms make the score "
    "bit-reproducible.",
)

q_doc_corpus_keywords = Query(
    name="doc_corpus_keywords",
    build=lambda spark, sf_dir: text.corpus_keywords(_docs(spark, sf_dir), top_k=100),
    # Same expression SHAPE both sides: tf · (N / df) — parenthesization
    # is part of the bit-identity contract (a·(b/c) != (a·b)/c in
    # floating point).
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), postings AS (
            SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks
        ), occurrences AS (
            SELECT unnest(tokens) AS term FROM toks
        ), n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks
        ), stats AS (
            SELECT d.term, d.term_df, o.tf_total
            FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS term_df
                  FROM postings GROUP BY term) d
            JOIN (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf_total
                  FROM occurrences GROUP BY term) o USING (term)
            WHERE d.term_df >= 2
        )
        SELECT term, term_df, tf_total,
               ROUND(CAST(tf_total AS DOUBLE)
                     * (CAST(n_docs AS DOUBLE) / CAST(term_df AS DOUBLE)), 6) AS score
        FROM stats CROSS JOIN n
        ORDER BY score DESC, term
        LIMIT 100
    """,
    doc="Corpus keyword extraction: linear-idf score tf_total·(N/df) "
    "(log-free by design — log is not correctly-rounded and flips ranks "
    "between engines); one term-keyed aggregation + top-k.",
)

q_doc_minhash_near_dups = Query(
    name="doc_minhash_near_dups",
    build=lambda spark, sf_dir: dedup.minhash_near_duplicates(
        _docs(spark, sf_dir), num_perm=32, bands=4, ngram=3, threshold=0.5
    ),
    oracle=None,  # xxhash64 signatures have no DuckDB twin; LSH output is
    # verified structurally in tests (pairs ⊆ true-Jaccard pairs).
    doc="MinHash(32 perms)+LSH(4 bands of 8) near-dup pipeline: token-gram "
    "shingle -> sign -> band-bucket join -> exact-Jaccard verify. The "
    "100 TB dedup path: shuffle O(candidates), never O(n^2).",
)

q_doc_minhash_dedup_verdict = Query(
    name="doc_minhash_dedup_verdict",
    build=lambda spark, sf_dir: dedup.minhash_dedup_verdicts(
        _docs(spark, sf_dir), num_perm=16, bands=4, ngram=3, threshold=0.5
    ).orderBy("doc_id"),
    # Unlike the xxhash64 pair path (doc_minhash_near_dups, rows-only),
    # the verdict path is portable by design: md5-string minhash minima
    # and '|'-joined md5 band keys have bit-identical DuckDB twins, so
    # banding + election are oracle-checked expression for expression.
    # The verify stage is value-equivalent rather than twin-identical:
    # Spark computes the Jaccard over xxhash64(gram) arrays (r10), the
    # oracle over the gram strings — equal counts barring an in-pair
    # hash collision (~|union|²/2⁶⁴), and the end-to-end verdicts are
    # hash-compared every sweep.
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), gram_lists AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tokens) - 2, 1) + 1),
                       i -> array_to_string(list_slice(tokens, i, i + 2), ' '))) AS grams
            FROM toks
        ), inv AS (
            SELECT doc_id, unnest(grams) AS gram FROM gram_lists
        ), sigs AS (
            SELECT doc_id, p, MIN(md5(CAST(p AS VARCHAR) || ':' || gram)) AS mh
            FROM inv CROSS JOIN range(16) perms(p)
            GROUP BY doc_id, p
        ), bands AS (
            SELECT doc_id, p // 4 AS band_id,
                   md5(string_agg(mh, '|' ORDER BY p)) AS band_hash
            FROM sigs GROUP BY doc_id, p // 4
        ), cand AS (
            SELECT DISTINCT b.doc_id, m.rep_id
            FROM bands b
            JOIN (SELECT band_id, band_hash, MIN(doc_id) AS rep_id
                  FROM bands GROUP BY band_id, band_hash) m
              USING (band_id, band_hash)
            WHERE m.rep_id < b.doc_id
        ), verified AS (
            SELECT c.doc_id, MIN(c.rep_id) AS dup_of
            FROM cand c
            JOIN gram_lists ga ON ga.doc_id = c.doc_id
            JOIN gram_lists gb ON gb.doc_id = c.rep_id
            WHERE ROUND(len(list_intersect(ga.grams, gb.grams))
                        / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE),
                        6) >= 0.5
            GROUP BY c.doc_id
        )
        SELECT g.doc_id, v.dup_of, v.dup_of IS NULL AS keep
        FROM gram_lists g LEFT JOIN verified v ON g.doc_id = v.doc_id
        ORDER BY g.doc_id
    """,
    doc="Verdict-only MinHash dedup (keep / dup_of per document, "
    "verified against bucket representatives only): the 100 TB dedup "
    "default — candidate volume is O(N·bands) whatever the duplicate "
    "density, where the pair path's output grows as replica² (SCALE.md "
    "64x probe).",
)

q_doc_simhash_near_dups = Query(
    name="doc_simhash_near_dups",
    build=lambda spark, sf_dir: simhash_near_duplicates(
        _docs(spark, sf_dir), max_hamming=4, prefix_bits=8
    ),
    oracle=None,  # pandas-UDF bit packing; no SQL twin.
    doc="SimHash near-dup pairs (Arrow-vectorized pandas UDF signature + "
    "prefix blocking + built-in bit_count hamming filter).",
)

q_emb_label_stats = Query(
    name="emb_label_stats",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.table("embeddings")
        .select(F.col("label"), F.col("vec_id"), F.explode("embedding").alias("x"))
        .groupBy("label", "vec_id")
        .agg(
            F.sum((F.col("x").cast("double") * F.col("x").cast("double")).cast("decimal(28,18)")).alias(
                "norm2_dec"
            )
        )
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(
                F.sum("norm2_dec").cast("double") / F.count("*"),
                6,
            ).alias("avg_norm2"),
        ),
    )[1],
    oracle="""
        WITH elems AS (
            SELECT label, vec_id, unnest(embedding) AS x FROM embeddings
        ), norms AS (
            SELECT label, vec_id,
                   SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18))) AS norm2_dec
            FROM elems GROUP BY 1, 2
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(CAST(SUM(norm2_dec) AS DOUBLE) / COUNT(*), 6) AS avg_norm2
        FROM norms GROUP BY label
    """,
    doc="Embedding column stats per label (exact decimal norms — "
    "reproducible across engines and partitionings).",
)

q_emb_label_centroids = Query(
    name="emb_label_centroids",
    # Mean-pool per label, dimension-wise: the embedding-aggregation op
    # (class centroids / pooled chunk embeddings). Scalar (label, dim)
    # rows — never an array column, which the driver's pandas
    # canonicalizer cannot hash (the emb_quantize_int8 lesson).
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.table("embeddings")
        .select(F.col("label"), F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(
                F.sum(F.col("x").cast("double").cast("decimal(28,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("centroid"),
        ),
    )[1],
    oracle="""
        WITH elems AS (
            SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings
            CROSS JOIN unnest(range(1, len(embedding) + 1)) AS t(i)
        )
        SELECT label, CAST(dim AS INT) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(CAST(SUM(CAST(x AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*), 6)
                   AS centroid
        FROM elems
        GROUP BY label, dim
    """,
    doc="Per-label mean-pooled centroids, dimension-wise (decimal-exact "
    "sums -> one division): the embedding aggregation every "
    "clustering/classification pipeline needs; single map-side-combined "
    "(label, dim) aggregation.",
)

q_emb_cosine_topk = Query(
    name="emb_cosine_topk",
    build=lambda spark, sf_dir: similarity.cosine_topk_exact(
        _embs(spark, sf_dir), n_queries=20, k=3
    ),
    oracle="""
        WITH queries AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20
        ), pair_elems AS (
            SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                   unnest(q.embedding) AS qx, unnest(c.embedding) AS cx
            FROM queries q JOIN embeddings c ON c.vec_id <> q.vec_id
        ), dots AS (
            SELECT query_id, candidate_id,
                   SUM(CAST(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE) AS DECIMAL(28,18))) AS dot_dec
            FROM pair_elems GROUP BY 1, 2
        ), norm_elems AS (
            SELECT vec_id, unnest(embedding) AS x FROM embeddings
        ), norms AS (
            SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18))) AS norm2
            FROM norm_elems GROUP BY 1
        ), scored AS (
            SELECT query_id, candidate_id,
                   ROUND(CAST(dot_dec AS DOUBLE)
                         / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(cn.norm2 AS DOUBLE))), 6) AS cosine
            FROM dots
            JOIN norms qn ON qn.vec_id = query_id
            JOIN norms cn ON cn.vec_id = candidate_id
        ), ranked AS (
            SELECT query_id, candidate_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, candidate_id ASC) AS nn_rank
            FROM scored
        )
        SELECT query_id, candidate_id, cosine, CAST(nn_rank AS INT) AS nn_rank
        FROM ranked WHERE nn_rank <= 3
    """,
    doc="Brute-force cosine top-3 for 20 query vectors — ANN correctness "
    "baseline with decimal-exact dot products (the LSH-bucketed scale "
    "variant is cosine_topk_lsh, benched separately).",
)

q_emb_cosine_topk_gemm = Query(
    name="emb_cosine_topk_gemm",
    build=lambda spark, sf_dir: similarity.cosine_topk_gemm(
        _embs(spark, sf_dir), n_queries=20, k=3
    ),
    # Output is bit-identical to cosine_topk_exact (float64 GEMM prunes,
    # decimal-exact terms rescore) — the same oracle text applies.
    oracle=q_emb_cosine_topk.oracle,
    doc="EXACT brute-force cosine top-3 at GEMM throughput: Arrow-batched "
    "mapInPandas numpy matmul prunes each candidate batch to per-query "
    "top-(k+margin), decimal-exact rescoring of the survivors reproduces "
    "cosine_topk_exact bit-for-bit — the scan-parallel exact baseline "
    "whose candidate side never shuffles (similarity.cosine_topk_gemm).",
)

q_emb_cosine_topk_lsh = Query(
    name="emb_cosine_topk_lsh",
    build=lambda spark, sf_dir: similarity.cosine_topk_lsh(
        _embs(spark, sf_dir), n_queries=20, k=3, n_planes=4
    ),
    oracle=None,  # approximate by design (bucket recall < 1).
    doc="Hyperplane-LSH approximate cosine top-k: bucket candidates, exact "
    "re-score — the 100 TB similarity-search path (shuffle on bucket id, "
    "no cross product).",
)

q_emb_hard_negatives = Query(
    name="emb_hard_negatives",
    build=lambda spark, sf_dir: similarity.hard_negatives_exact(
        _embs(spark, sf_dir), n_queries=20, k=3
    ),
    oracle="""
        WITH queries AS (
            SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 20
        ), pair_elems AS (
            SELECT q.vec_id AS query_id, q.label AS query_label,
                   c.vec_id AS candidate_id, c.label AS candidate_label,
                   unnest(q.embedding) AS qx, unnest(c.embedding) AS cx
            FROM queries q JOIN embeddings c ON c.label <> q.label
        ), dots AS (
            SELECT query_id, query_label, candidate_id, candidate_label,
                   SUM(CAST(CAST(qx AS DOUBLE) * CAST(cx AS DOUBLE) AS DECIMAL(28,18))) AS dot_dec
            FROM pair_elems GROUP BY 1, 2, 3, 4
        ), norm_elems AS (
            SELECT vec_id, unnest(embedding) AS x FROM embeddings
        ), norms AS (
            SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18))) AS norm2
            FROM norm_elems GROUP BY 1
        ), scored AS (
            SELECT query_id, query_label, candidate_id, candidate_label,
                   ROUND(CAST(dot_dec AS DOUBLE)
                         / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(cn.norm2 AS DOUBLE))), 6) AS cosine
            FROM dots
            JOIN norms qn ON qn.vec_id = query_id
            JOIN norms cn ON cn.vec_id = candidate_id
        ), ranked AS (
            SELECT query_id, query_label, candidate_id, candidate_label, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, candidate_id ASC) AS neg_rank
            FROM scored
        )
        SELECT query_id, query_label, candidate_id, candidate_label, cosine,
               CAST(neg_rank AS INT) AS neg_rank
        FROM ranked WHERE neg_rank <= 3
    """,
    doc="Hard-negative mining (top-3 most-similar DIFFERENT-label vectors "
    "per query) — the contrastive-training data op; decimal-exact scoring "
    "baseline, LSH-bucketed scale variant is emb_hard_negatives_lsh.",
)

q_emb_hard_negatives_gemm = Query(
    name="emb_hard_negatives_gemm",
    build=lambda spark, sf_dir: similarity.hard_negatives_gemm(
        _embs(spark, sf_dir), n_queries=20, k=3
    ),
    # Bit-identical to hard_negatives_exact (GEMM prune with in-batch
    # label mask, decimal-exact rescore) — shares its oracle text.
    oracle=q_emb_hard_negatives.oracle,
    doc="Hard-negative mining at GEMM throughput: the different-label "
    "constraint masks inside the numpy batch, survivors are rescored "
    "decimal-exact — reproduces hard_negatives_exact bit-for-bit with a "
    "never-shuffling candidate scan (similarity.hard_negatives_gemm).",
)

q_emb_hard_negatives_lsh = Query(
    name="emb_hard_negatives_lsh",
    build=lambda spark, sf_dir: similarity.hard_negatives_lsh(
        _embs(spark, sf_dir), n_queries=20, k=3, n_planes=4
    ),
    oracle=None,  # approximate by design (bucket recall < 1).
    doc="Hyperplane-LSH hard-negative mining: bucket candidates row-locally, "
    "different-label filter before scoring, broadcast query side — the "
    "100 TB mining path (pytest pins results ⊆ exact different-label "
    "pairs with identical cosines).",
)

q_emb_cosine_near_dups = Query(
    name="emb_cosine_near_dups",
    build=lambda spark, sf_dir: similarity.cosine_near_duplicates(
        _embs(spark, sf_dir), threshold=0.45
    ),
    oracle="""
        WITH elems AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ), dots AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   SUM(CAST(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) AS DECIMAL(28,18))) AS dot_dec
            FROM elems a JOIN elems b ON a.pos = b.pos AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        ), norms AS (
            SELECT vec_id, SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18))) AS norm2
            FROM elems GROUP BY 1
        ), scored AS (
            SELECT id_a, id_b,
                   ROUND(CAST(dot_dec AS DOUBLE)
                         / (SQRT(CAST(na.norm2 AS DOUBLE)) * SQRT(CAST(nb.norm2 AS DOUBLE))), 6) AS cosine
            FROM dots
            JOIN norms na ON na.vec_id = id_a
            JOIN norms nb ON nb.vec_id = id_b
        )
        SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.45
    """,
    doc="Embedding-space near-duplicate PAIRS (exact all-pairs baseline, "
    "decimal dots) — the embedding-cosine member of the dedup family; "
    "the bucketed scale path is emb_cosine_near_dups_lsh.",
)

q_emb_cosine_near_dups_lsh = Query(
    name="emb_cosine_near_dups_lsh",
    build=lambda spark, sf_dir: similarity.cosine_near_duplicates_lsh(
        _embs(spark, sf_dir), threshold=0.45, n_bands=12, planes_per_band=3
    ),
    oracle=None,  # banded-sketch recall < 1 by design
    doc="Banded hyperplane-LSH near-dup pairs: bucket collisions -> exact "
    "re-score, never the n² cross product — the 100 TB embedding-dedup "
    "path (tests assert pairs ⊆ the exact baseline's).",
)

q_emb_cosine_near_dups_gemm = Query(
    name="emb_cosine_near_dups_gemm",
    build=lambda spark, sf_dir: similarity.cosine_near_duplicates_lsh_gemm(
        _embs(spark, sf_dir), threshold=0.45, n_bands=12, planes_per_band=3
    ),
    oracle=None,  # same banded-sketch recall as the lsh variant
    doc="Banded hyperplane-LSH near-dup pairs with within-bucket numpy "
    "GEMM scoring (applyInPandas): vectors ride the one bucket shuffle, "
    "each capped bucket scores as one M @ M.T, sub-threshold candidates "
    "never leave the executor — 5x the expression path at 16x "
    "amplification (SCALE.md), pair-identical output (pytest-pinned).",
)

q_emb_cosine_near_dups_auto = Query(
    name="emb_cosine_near_dups_auto",
    build=lambda spark, sf_dir: similarity.cosine_near_duplicates_lsh_auto(
        _embs(spark, sf_dir), threshold=0.45, n_bands=12, planes_per_band=3
    ),
    oracle=None,  # same banded-sketch recall as the underlying scorers
    doc="Density-adaptive near-dup scorer: an ids-only aggregate over "
    "the same deterministic banding measures candidate pairs per vector "
    "(the pair-stream mass the expression path would materialize) and "
    "picks expr below / GEMM above the measured 50-pairs/vector "
    "crossover (SCALE.md r7) — AQE-style runtime strategy choice; "
    "pair-identical to both scorers (pytest-pinned).",
)

q_emb_ivf_topk = Query(
    name="emb_ivf_topk",
    build=lambda spark, sf_dir: similarity.ivf_topk(
        _embs(spark, sf_dir), n_queries=20, k=3, n_cells=8, n_probe=3
    ),
    oracle=None,  # approximate by design (probe recall < 1)
    doc="IVF-Flat ANN: MLlib KMeans coarse quantizer, Arrow-batched cell "
    "assignment against broadcast centroids, n_probe cell fan-out, exact "
    "re-score — the inverted-file scale path beside the LSH one.",
)

q_emb_pq_topk = Query(
    name="emb_pq_topk",
    build=lambda spark, sf_dir: pq.pq_topk(_embs(spark, sf_dir), n_queries=20, k=3),
    oracle=None,  # quantized-approximate by design; semantics pytest-pinned
    doc="Product-quantization ANN (Jégou 2011): sample-trained per-"
    "subspace codebooks (one deterministic hash-ordered collect), "
    "row-local codegen'd encoding (m argmin-centroid expressions), and "
    "ADC scoring as m broadcast-table lookups per pair — candidates are "
    "scanned once as ~d/8-byte codes, never as floats. The memory-side "
    "companion to the IVF and LSH candidate-generation paths.",
)

q_emb_ivfpq_topk = Query(
    name="emb_ivfpq_topk",
    build=lambda spark, sf_dir: pq.ivfpq_topk(
        _embs(spark, sf_dir), n_queries=20, k=3, n_cells=16, n_probe=4
    ),
    oracle=None,  # quantized-approximate by design; semantics pytest-pinned
    doc="IVF-PQ composite ANN (Faiss IVFPQ shape): KMeans coarse cells "
    "cut candidate COUNT (probe n_probe of n_cells), product codes cut "
    "candidate BYTES (m lookups per pair, no float folds) — cell-equi "
    "broadcast join, never a cross product. With n_probe=n_cells the "
    "result equals pq_topk's full-scan ADC ranking (pytest-pinned), so "
    "probing is the only recall knob (pq.py:ivfpq_topk).",
)

q_emb_ann_recall = Query(
    name="emb_ann_recall",
    build=lambda spark, sf_dir: similarity.ann_recall_report(
        _embs(spark, sf_dir), n_queries=20, k=3, n_cells=8, n_probe=3
    ),
    # No oracle: four of the five measured paths are approximate by
    # design (LSH banding, IVF probing, PQ quantization). Semantics
    # pinned in pytest: the exact-GEMM row is the self-check (recall
    # 1.0), IVF at full probe recalls 1.0, IVF-PQ at full probe equals
    # the PQ row, and every recall is a valid fraction of n_exact.
    oracle=None,
    doc="ANN-parameter evaluation: recall@k of every approximate top-k "
    "path (LSH / IVF / PQ / IVF-PQ) against the exact brute-force "
    "baseline on one query set, with the exact-GEMM row as self-check "
    "— dedup_eval's role for the similarity family; qualifies index "
    "parameters on a sample before a full-corpus run "
    "(similarity.py:ann_recall_report).",
)


q_doc_dedup_eval = Query(
    name="doc_dedup_eval",
    build=lambda spark, sf_dir: dedup.dedup_eval_report(
        _docs(spark, sf_dir), n=3, threshold=0.15
    ),
    # No oracle: the LSH side uses engine xxhash64 signatures. Semantics
    # pinned in pytest: confusion counts are consistent (tp <= both
    # sides), and recall is high on planted near-duplicates.
    oracle=None,
    doc="Dedup-parameter evaluation: precision/recall/F1 of the "
    "MinHash-LSH scale path against the exact n-gram-Jaccard baseline "
    "at matched threshold — one full-outer pair join + one aggregate "
    "(dedup.py:dedup_eval_report). The measurement that qualifies LSH "
    "parameters on a sample before a full-corpus run.",
)

q_doc_dedup_verdict_eval = Query(
    name="doc_dedup_verdict_eval",
    build=lambda spark, sf_dir: dedup.dedup_verdict_eval_report(
        _docs(spark, sf_dir), n=3, threshold=0.15
    ),
    # No oracle: the exact-baseline side shares doc_dedup_eval's
    # xxhash64-free path but the report is a measurement, not a query
    # contract — semantics pinned in pytest (drop soundness, keep_recall
    # == 1, planted-dup recall at two duplication rates).
    oracle=None,
    doc="Verdict-path dedup evaluation: keep/drop precision+recall of "
    "minhash_dedup_verdicts (the 100 TB default — greedy single-round "
    "bucket-representative election) against the exact n-gram-Jaccard "
    "greedy baseline at matched threshold "
    "(dedup.py:dedup_verdict_eval_report). Quantifies what the "
    "verdict-only shape gives up vs a full pair pass before a "
    "full-corpus run.",
)


q_doc_token_rarity = Query(
    name="doc_token_rarity",
    build=lambda spark, sf_dir: text.token_rarity(_docs(spark, sf_dir)),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKENS}) AS t FROM documents
        ), toks2 AS (
            SELECT doc_id, t FROM toks WHERE length(t) > 0
        ), counts AS (
            SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks2 GROUP BY doc_id, t
        ), vocab AS (
            SELECT t, SUM(c) AS freq FROM counts GROUP BY t
        ), per_doc AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(c * freq) AS BIGINT) AS wsum,
                   CAST(SUM(CASE WHEN freq <= 2 THEN c ELSE 0 END) AS BIGINT) AS nrare,
                   CAST(MIN(freq) AS BIGINT) AS rarest_token_freq
            FROM counts JOIN vocab USING (t)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_tokens, 0) AS n_tokens,
               ROUND(CAST(p.wsum AS DOUBLE) / CAST(p.n_tokens AS DOUBLE), 6)
                   AS mean_token_freq,
               ROUND(CAST(p.nrare AS DOUBLE) / CAST(p.n_tokens AS DOUBLE), 6)
                   AS rare_fraction,
               p.rarest_token_freq
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Corpus-frequency rarity profile (mean token frequency, rare-"
    "token fraction, rarest-token frequency) — the natural-text vs junk "
    "quality signal; pure integer arithmetic end to end, so exact on "
    "every engine and partitioning (text.py:token_rarity).",
)


q_doc_source_token_diversity = Query(
    name="doc_source_token_diversity",
    build=lambda spark, sf_dir: text.source_token_diversity(_docs(spark, sf_dir)),
    oracle=f"""
        WITH toks AS (
            SELECT source, unnest({_TOKENS}) AS t FROM documents
        ), toks2 AS (
            SELECT source, t FROM toks WHERE length(t) > 0
        ), counts AS (
            SELECT source, t, CAST(COUNT(*) AS BIGINT) AS f
            FROM toks2 GROUP BY source, t
        ), per_source AS (
            SELECT source,
                   CAST(SUM(f) AS BIGINT)   AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS vocab_size,
                   CAST(MAX(f) AS BIGINT)   AS top_token_freq,
                   -- widened operand, matching the Spark side's
                   -- DECIMAL(38,0) sum: a BIGINT f*f product would
                   -- error in DuckDB past ~3e9 per-token frequency
                   -- while Spark (ANSI off) wraps silently
                   SUM(CAST(f AS HUGEINT) * f) AS sumsq
            FROM counts GROUP BY source
        ), docs_per AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        )
        SELECT d.source,
               d.n_docs,
               p.n_tokens,
               p.vocab_size,
               p.top_token_freq,
               ROUND(CAST(p.vocab_size AS DOUBLE) / CAST(p.n_tokens AS DOUBLE), 6)
                   AS type_token_ratio,
               ROUND(CAST(p.top_token_freq AS DOUBLE) / CAST(p.n_tokens AS DOUBLE), 6)
                   AS top_token_share,
               ROUND(CAST(p.sumsq AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
                     / CAST(p.n_tokens AS DOUBLE), 9) AS hhi
        FROM docs_per d LEFT JOIN per_source p USING (source)
    """,
    doc="Per-source vocabulary-concentration profile (type-token ratio, "
    "top-token share, Herfindahl index) — flags repetitive/templated "
    "sources before mixture weighting; exact integer aggregates with "
    "one final IEEE division per metric, bit-reproducible on every "
    "engine and partitioning (text.py:source_token_diversity).",
)


q_doc_bigram_lm_score = Query(
    name="doc_bigram_lm_score",
    build=lambda spark, sf_dir: text.bigram_lm_scores(_docs(spark, sf_dir)),
    # No oracle: the score is a mean of -log2 P terms and log2 is the
    # engine's libm (not guaranteed identically rounded across engines),
    # so a cross-engine value hash would be flaky by construction. The
    # semantics are pinned in pytest instead: exact closed-form equality
    # on a dyadic-probability corpus (every P a power of 1/2, so log2 is
    # exact), partitioning-independence of the decimal-summed mean, and
    # the junk-scores-worse ordering (tests/test_functions.py).
    oracle=None,
    doc="CCNet-style LM quality filter (Wenzek 2019): add-one-smoothed "
    "bigram LM trained on the corpus itself, per-doc mean -log2 P in "
    "bits (perplexity = 2^score) — high = unusual-for-the-corpus text "
    "(boilerplate/OCR noise/wrong language). In-plan bigram formation, "
    "token-grain aggregates, one model join; exact DECIMAL mean "
    "(text.py:bigram_lm_scores).",
)


def _bigram_lm_ref_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference-model deployment shape (Wenzek 2019): train the LM on a
    # CLEAN corpus, score a different one. The fixture split is
    # deterministic: sources src0-src9 are the reference corpus, the
    # rest are the scored "crawl" — so the crawl's own noise cannot
    # normalize itself into the model.
    docs = _docs(spark, sf_dir)
    ref_sources = [f"src{i}" for i in range(10)]
    model = docs.filter(F.col("source").isin(ref_sources))
    crawl = docs.filter(~F.col("source").isin(ref_sources))
    return text.bigram_lm_scores(crawl, model_df=model)


q_doc_bigram_lm_score_ref = Query(
    name="doc_bigram_lm_score_ref",
    build=_bigram_lm_ref_build,
    # No oracle, same libm-log2 rationale as doc_bigram_lm_score; the
    # reference-mode semantics are pinned in pytest instead (clean-
    # trained model ranks planted noise above clean docs; exact
    # log2(V) OOV backoff with the full-corpus vocabulary).
    oracle=None,
    doc="CCNet LM filter in its deployment shape: bigram LM trained on "
    "a clean reference corpus (sources src0-src9), scoring the "
    "remaining sources as the crawl — unseen bigrams back off to the "
    "alpha mass, entirely-OOV contexts score -log2(1/V) "
    "(text.py:bigram_lm_scores, model_df mode).",
)


q_doc_bpe_merges = Query(
    name="doc_bpe_merges",
    build=lambda spark, sf_dir: bpe.bpe_train_merges(_docs(spark, sf_dir), n_merges=12),
    # No oracle: the merge loop is an iterative argmax (each step
    # depends on the previous merge's rewrite) — not SQL-expressible.
    # Semantics pinned in pytest instead: merge list EXACTLY equals a
    # pure-Python reference BPE on the same word-frequency dict, and is
    # partitioning-independent (tests/test_training_bpe.py).
    oracle=None,
    doc="BPE merge training (Sennrich 2016): one corpus-scale word-"
    "frequency aggregate, then the merge loop over the small word table "
    "— weighted overlapping pair counts, deterministic argmax, row-local "
    "left-to-right merge folds, localCheckpoint-truncated lineage "
    "(training/bpe.py).",
)

def _build_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    merge_rows = bpe.bpe_train_merges(docs, n_merges=12).orderBy("rank").collect()
    pairs = [(r["left"], r["right"]) for r in merge_rows]
    units = bpe.apply_merges(F.col("text"), pairs)
    return docs.select(
        "doc_id",
        F.size(units).cast("bigint").alias("n_bpe_units"),
        F.size(F.filter(units, lambda u: F.length(u) > 1)).cast("bigint").alias("n_merged_units"),
        F.array_join(F.slice(units, 1, 12), " ").alias("head_units"),
    )


q_doc_bpe_encode = Query(
    name="doc_bpe_encode",
    build=_build_bpe_encode,
    # No oracle, same reason as doc_bpe_merges: the learned merge list
    # comes from an iterative argmax loop. The encoder itself is pinned
    # in pytest exactly equal to a pure-Python reference BPE encode
    # (tests/test_training_bpe.py).
    oracle=None,
    doc="BPE encoding with the learned merge table: train the 12-merge "
    "table (doc_bpe_merges), then encode every document with ONE "
    "row-local expression (per word: a fold per merge in rank order) — "
    "no UDF, no shuffle beyond training; reports unit counts and the "
    "first units so the driver row pins the whole tokenize path.",
)


q_emb_kmeans = Query(
    name="emb_kmeans",
    build=lambda spark, sf_dir: clustering.kmeans_assignments(
        _embs(spark, sf_dir), k=10, max_iter=5
    ),
    oracle=None,  # iterative algorithm (driver-looped Lloyd's), not SQL-expressible
    doc="Distributed Lloyd's k-means: codegen'd assignment against "
    "broadcast centroid literals, dimension-wise partial-sum update "
    "(map-side combine; shuffle carries k*dim partials per task, "
    "row-count independent), deterministic hash-order seeding. The "
    "corpus-clustering / coarse-quantizer iterative representative.",
)

_SAMPLE_RATES = {"de": 1.0, "en": 0.5, "es": 0.25, "fr": 0.25, "zh": 0.1}
_MIX_SHARES = {"de": 0.15, "en": 0.5, "es": 0.15, "fr": 0.1, "zh": 0.1}

q_doc_train_split = Query(
    name="doc_train_split",
    build=lambda spark, sf_dir: sampling.train_val_test_split(
        _docs(spark, sf_dir), id_col="doc_id", train_pct=80, val_pct=10
    ).select("doc_id", "lang", "source", "bucket", "split"),
    oracle=f"""
        WITH bucketed AS (
            SELECT doc_id, lang, source,
                   {sampling.oracle_bucket('doc_id', 100)} AS bucket
            FROM documents
        )
        SELECT doc_id, lang, source, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM bucketed
    """,
    doc="Deterministic 80/10/10 train/val/test assignment from an md5 id "
    "bucket — row-local projection, no shuffle, id-stable across runs and "
    "engines (sampling.py:52-69).",
)

q_doc_stratified_sample = Query(
    name="doc_stratified_sample",
    build=lambda spark, sf_dir: sampling.stratified_sample(
        _docs(spark, sf_dir), rates=_SAMPLE_RATES, strata_col="lang", id_col="doc_id"
    ).select("doc_id", "lang", "source"),
    oracle=f"""
        WITH bucketed AS (
            SELECT doc_id, lang, source,
                   {sampling.oracle_bucket('doc_id', 10000)} AS bucket
            FROM documents
        )
        SELECT doc_id, lang, source
        FROM bucketed
        WHERE bucket < CASE lang WHEN 'de' THEN 10000 WHEN 'en' THEN 5000
                                 WHEN 'es' THEN 2500 WHEN 'fr' THEN 2500
                                 WHEN 'zh' THEN 1000 ELSE 0 END
    """,
    doc="Per-language deterministic downsampling: literal CASE rate table "
    "inlined into one codegen'd filter (no join); nested samples — raising "
    "a rate strictly grows its stratum (sampling.py:72-96).",
)

q_doc_hash_sample_k = Query(
    name="doc_hash_sample_k",
    build=lambda spark, sf_dir: sampling.hash_sample_k(
        _docs(spark, sf_dir), k=100, id_col="doc_id"
    ).select("doc_id", "lang", "sort_hash"),
    oracle="""
        SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sort_hash
        FROM documents
        ORDER BY sort_hash
        LIMIT 100
    """,
    doc="Exactly-k uniform sample as k-smallest-md5 — executed as "
    "TakeOrderedAndProject (per-partition local top-k, driver merges k "
    "rows per partition, never the data) (sampling.py:99-111).",
)

def _build_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # weight by length: 1 ticket per started 100 tokens, capped at 8 —
    # long documents are favored proportionally, never unboundedly
    w = (F.lit(1) + F.least(F.floor(text.token_count(F.col("text")) / 100), F.lit(7))).cast(
        "int"
    )
    return sampling.weighted_sample_k(
        docs.withColumn("w", w), k=100, weight_col="w", id_col="doc_id"
    ).select("doc_id", "sample_weight", "sample_key")


q_doc_weighted_sample = Query(
    name="doc_weighted_sample",
    build=_build_weighted_sample,
    # Ticket-lottery weighted sampling is hash+string-min only (no
    # pow/ln, which are not correctly-rounded and could flip marginal
    # selections between engines) — md5 is md5 everywhere.
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                             ELSE len({_TOKENS}) END AS INT) AS n_tokens
            FROM documents
        ), weighted AS (
            SELECT doc_id,
                   CAST(1 + LEAST(CAST(FLOOR(n_tokens / 100) AS INT), 7) AS INT)
                       AS sample_weight
            FROM toks
        )
        SELECT doc_id, sample_weight,
               list_min(list_transform(range(1, sample_weight + 1),
                        i -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))))
                   AS sample_key
        FROM weighted
        ORDER BY sample_key, doc_id
        LIMIT 100
    """,
    doc="Exactly-k weighted sample without replacement via the integer "
    "ticket-lottery key (min of w per-row md5 tickets; "
    "P(a beats b) = w_a/(w_a+w_b)) — TakeOrderedAndProject bottom-k, "
    "bit-reproducible where A-Res u^(1/w) keys are not.",
)

_LMS_TARGET_SOURCES = "('src0', 'src1', 'src2', 'src3')"


def _build_length_matched_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    cands = docs.filter(~F.col("source").isin("src0", "src1", "src2", "src3"))
    return sampling.length_matched_sample(cands, target, total=150).select(
        "doc_id", "source", F.col("length_bucket").cast("int").alias("length_bucket"), "sort_hash"
    )


q_doc_length_matched_sample = Query(
    name="doc_length_matched_sample",
    build=_build_length_matched_sample,
    # Integer-exact per-bucket quotas ((total * n_b) DIV n_target) and
    # md5 reservoir order — every step bit-identical across engines.
    oracle=f"""
        WITH bucketed AS (
            SELECT doc_id, source,
                   LEAST(CAST((CASE WHEN length({_NORM}) = 0 THEN 0
                               ELSE len({_TOKENS}) END) // 10 AS INT), 9)
                       AS length_bucket
            FROM documents
        ), tgt AS (
            SELECT length_bucket, COUNT(*) AS n_b
            FROM bucketed WHERE source IN {_LMS_TARGET_SOURCES}
            GROUP BY 1
        ), takes AS (
            SELECT length_bucket,
                   CAST((150 * n_b) // (SELECT SUM(n_b) FROM tgt) AS INT) AS take_n
            FROM tgt
        ), cand AS (
            SELECT b.doc_id, b.source, b.length_bucket,
                   md5(CAST(b.doc_id AS VARCHAR)) AS sort_hash,
                   ROW_NUMBER() OVER (PARTITION BY b.length_bucket
                                      ORDER BY md5(CAST(b.doc_id AS VARCHAR))) AS rn
            FROM bucketed b WHERE b.source NOT IN {_LMS_TARGET_SOURCES}
        )
        SELECT c.doc_id, c.source, CAST(c.length_bucket AS INT) AS length_bucket,
               c.sort_hash
        FROM cand c JOIN takes t USING (length_bucket)
        WHERE c.rn <= t.take_n
    """,
    doc="Length-distribution-matched subsampling: candidate sources "
    "sampled so their token-length histogram matches the target "
    "sources' (per-bucket integer quotas, md5 reservoir per bucket) — "
    "the domain-matching selection for aligning a pretraining mix with "
    "a reference distribution (sampling.length_matched_sample; target "
    "side reduces to <= n_buckets broadcast rows, candidates shuffle "
    "once on the bucket key).",
)


q_doc_source_drift = Query(
    name="doc_source_drift",
    build=lambda spark, sf_dir: text.source_drift(_docs(spark, sf_dir)),
    # Integer numerator Σ|c_sb·N − c_b·N_s| (exact, order-independent),
    # ONE double division at the end.
    oracle=f"""
        WITH counts AS (
            SELECT source,
                   CAST(FLOOR(CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                                        ELSE len({_TOKENS}) END AS INT) / 10) * 10
                        AS BIGINT) AS token_bucket,
                   CAST(COUNT(*) AS BIGINT) AS c_sb
            FROM documents GROUP BY 1, 2
        ), per_source AS (
            SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_docs FROM counts GROUP BY source
        ), per_bucket AS (
            SELECT token_bucket, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM counts GROUP BY token_bucket
        ), total AS (
            SELECT CAST(SUM(c_sb) AS BIGINT) AS n_total FROM counts
        ), dev AS (
            SELECT g.source, g.n_docs, g.n_total,
                   CAST(ABS(COALESCE(c.c_sb, 0) * g.n_total - g.c_b * g.n_docs) AS BIGINT)
                       AS abs_dev
            FROM (SELECT * FROM per_source CROSS JOIN per_bucket CROSS JOIN total) g
            LEFT JOIN counts c
              ON c.source = g.source AND c.token_bucket = g.token_bucket
        )
        SELECT source, n_docs,
               ROUND(CAST(SUM(abs_dev) AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE) * CAST(n_total AS DOUBLE)), 6) AS drift_l1
        FROM dev
        GROUP BY source, n_docs, n_total
    """,
    doc="Per-source token-length-distribution drift vs the corpus (L1 "
    "distance, integer-exact numerator) — the source-health monitor of "
    "a continuous ingest; one map-side-combined fact aggregation.",
)

q_doc_pii_redact = Query(
    name="doc_pii_redact",
    build=lambda spark, sf_dir: curation.pii_redact(_docs(spark, sf_dir)),
    oracle=r"""
        WITH red AS (
            SELECT doc_id, text,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                       'https?://[^\s]+', '<URL>', 'g'),
                       '[0-9]{7,}', '<NUM>', 'g') AS text_redacted
            FROM documents
        )
        SELECT doc_id, text_redacted,
               CAST(len(regexp_extract_all(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                + len(regexp_extract_all(text, 'https?://[^\s]+'))
                + len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_redactions,
               CAST(length(text) - length(text_redacted) AS BIGINT) AS chars_removed
        FROM red
    """,
    doc="PII redaction transform (emails -> <EMAIL>, URLs -> <URL>, "
    "digit runs -> <NUM>, fixed order); counts measured on the original "
    "text so scan and redact always agree. Codegen'd projections, no "
    "shuffle (curation.py pii_scan's acting counterpart).",
)

q_doc_mixture_weights = Query(
    name="doc_mixture_weights",
    build=lambda spark, sf_dir: sampling.mixture_weights(
        _docs(spark, sf_dir), target_shares=_MIX_SHARES, strata_col="lang"
    ),
    oracle="""
        WITH counts AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_available
            FROM documents GROUP BY lang
        ), shares(lang, target_share) AS (
            VALUES ('de', CAST(0.15 AS DOUBLE)), ('en', CAST(0.5 AS DOUBLE)),
                   ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.1 AS DOUBLE)),
                   ('zh', CAST(0.1 AS DOUBLE))
        ), joined AS (
            SELECT c.lang, c.n_available, s.target_share
            FROM counts c JOIN shares s USING (lang)
        ), scaled AS (
            SELECT MIN(CAST(n_available AS DOUBLE) / target_share) AS scale FROM joined
        )
        SELECT lang, n_available, target_share,
               CAST(FLOOR(target_share * scale) AS BIGINT) AS n_take,
               ROUND(CAST(FLOOR(target_share * scale) AS DOUBLE)
                     / CAST(n_available AS DOUBLE), 6) AS sample_rate
        FROM joined CROSS JOIN scaled
    """,
    doc="Corpus mixture balancing: largest corpus honoring target shares "
    "without upsampling (scale bounded by the scarcest stratum) — two "
    "|strata|-row aggregates regardless of corpus size (sampling.py:114-150).",
)

q_doc_temperature_mixture = Query(
    name="doc_temperature_mixture",
    build=lambda spark, sf_dir: sampling.temperature_mixture(
        _docs(spark, sf_dir), budget=300, strata_col="lang", alpha=0.5
    ),
    oracle="""
        WITH counts AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_available
            FROM documents GROUP BY lang
        ), weighted AS (
            SELECT lang, n_available,
                   CAST(SQRT(CAST(n_available AS DOUBLE)) AS DECIMAL(28,12)) AS w_dec
            FROM counts
        ), total AS (
            SELECT SUM(w_dec) AS total_dec FROM weighted
        )
        SELECT lang, n_available,
               ROUND(CAST(w_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) AS temp_share,
               CAST(FLOOR(CAST(w_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) * 300) AS BIGINT) AS n_take,
               ROUND(LEAST(
                 CAST(FLOOR(CAST(w_dec AS DOUBLE) / CAST(total_dec AS DOUBLE) * 300) AS DOUBLE)
                 / CAST(n_available AS DOUBLE), 1.0e0), 6) AS sample_rate
        FROM weighted CROSS JOIN total
    """,
    doc="Temperature-scaled mixture (takes ∝ n^0.5): the multilingual "
    "reweighting standard; SQRT is correctly-rounded IEEE so the alpha=0.5 "
    "path is engine-exact (sampling.temperature_mixture).",
)

q_doc_incremental_dedup = Query(
    name="doc_incremental_dedup",
    # Batch = every 5th doc, corpus = the rest: the continuous-pipeline
    # shape (immutable yesterday-corpus, delta-only verdicts).
    build=lambda spark, sf_dir: dedup.incremental_dedup(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0),
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 != 0),
    ),
    oracle=f"""
        WITH corpus AS (
            SELECT DISTINCT md5({_NORM}) AS content_md5
            FROM documents WHERE doc_id % 5 <> 0
        ), batch0 AS (
            SELECT doc_id, md5({_NORM}) AS content_md5
            FROM documents WHERE doc_id % 5 = 0
        ), batch AS (
            SELECT doc_id, content_md5,
                   ROW_NUMBER() OVER (PARTITION BY content_md5
                                      ORDER BY doc_id) > 1 AS dup_within_batch
            FROM batch0
        )
        SELECT b.doc_id, b.content_md5,
               (c.content_md5 IS NOT NULL) AS dup_of_corpus,
               b.dup_within_batch,
               (c.content_md5 IS NULL AND NOT b.dup_within_batch) AS keep
        FROM batch b LEFT JOIN corpus c ON b.content_md5 = c.content_md5
    """,
    doc="Incremental (delta-vs-corpus) dedup: new-batch digests verdicted "
    "against the immutable existing corpus plus within-batch first-wins — "
    "the every-ingest operator of a continuous training pipeline; corpus "
    "side reduces to distinct digests, verdict join and batch window share "
    "one content_md5 partitioning (dedup.py:incremental_dedup).",
)


def _build_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semantic_dedup(
        _embs(spark, sf_dir), n_clusters=8, threshold=0.9, kmeans_iter=3
    )


q_emb_semantic_dedup = Query(
    name="emb_semantic_dedup",
    build=_build_semantic_dedup,
    oracle=None,  # k-means cluster boundaries are engine-specific (double
    # partial-sum centroids); the keep-set independence and
    # drop-justification invariants are pytest-checked
    # (test_training_similarity.py).
    doc="SemDeDup-style semantic dedup (arXiv:2303.09540): k-means "
    "partitions the space, near-identical vectors within a cluster "
    "dedup to the lowest id via a cluster-keyed semi-join — quadratic "
    "cost confined per cluster, the clustering analogue of LSH banding "
    "(similarity.py:semantic_dedup).",
)


def _build_semantic_dedup_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semantic_dedup(
        _embs(spark, sf_dir), n_clusters=8, threshold=0.9, kmeans_iter=3, n_probes=2
    )


q_emb_semantic_dedup_probe2 = Query(
    name="emb_semantic_dedup_probe2",
    build=_build_semantic_dedup_probe2,
    oracle=None,  # same engine-specific cluster boundaries as the
    # single-probe entry; the recall gain (boundary-straddling pairs),
    # primary-assignment identity, and n_probes=1 equivalence are
    # pytest-pinned (test_training_similarity.py).
    doc="Multi-probe SemDeDup (r9): each vector is scored in its 2 "
    "nearest clusters (row-local codegen'd assignment), catching "
    "near-dup pairs that straddle a Voronoi boundary — the "
    "cross-cluster recall the single-probe paper design forfeits; "
    "verdict grain unchanged, pair mass <= 4x, measured free at 256x "
    "(SCALE.md; similarity.py:semantic_dedup n_probes).",
)


def _build_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)
    return curation.decontaminate(corpus, eval_set, ngram=5)


def _build_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Edge set = the EXACT n-gram Jaccard pairs (same parameters as the
    # oracle-green doc_ngram_jaccard entry), so the whole cluster output
    # is two-engine provable.  The minhash-LSH edge generator (the 100 TB
    # path — engine xxhash64, no DuckDB twin) feeds the same
    # dedup_clusters API and is exercised rows-only via
    # doc_minhash_near_dups + pytest transitivity checks.
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.15)
    return dedup.dedup_clusters(docs, pairs)


q_doc_dedup_clusters = Query(
    name="doc_dedup_clusters",
    build=_build_dedup_clusters,
    # Connected components IS SQL-expressible on DuckDB: transitive
    # closure as a recursive CTE (UNION-dedup'd working table), then the
    # component label = min reachable vertex.  The near-dup graph is
    # unions of small dense clusters, so closure depth ~= diameter ~2-3.
    oracle=f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), gram_lists AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tokens) - 2, 1) + 1),
                       i -> array_to_string(list_slice(tokens, i, i + 2), ' '))) AS grams
            FROM toks
        ), sizes AS (
            SELECT doc_id, len(grams) AS n_grams FROM gram_lists
        ), inv AS (
            SELECT doc_id, unnest(grams) AS gram FROM gram_lists
        ), cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), jpairs AS (
            SELECT id_a, id_b
            FROM cand
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE ROUND(n_common / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE), 6)
                  >= 0.15
        ), edges AS (
            SELECT id_a AS src, id_b AS dst FROM jpairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM jpairs
        ), reach AS (
            SELECT src AS a, dst AS b FROM edges
            UNION
            SELECT r.a, e.dst AS b FROM reach r JOIN edges e ON r.b = e.src
        ), comp AS (
            SELECT a AS vid, LEAST(a, MIN(b)) AS component
            FROM reach GROUP BY a
        ), labeled AS (
            SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.vid
        )
        SELECT doc_id, cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
               doc_id = cluster_id AS is_canonical,
               doc_id = cluster_id AS keep
        FROM labeled
    """,
    doc="Dedup clusters from near-dup pairs via iterative min-label "
    "connected components (localCheckpoint-truncated lineage, rounds = "
    "graph diameter ~2-3 for near-dup graphs) + canonical keep/drop "
    "election (dedup.py:connected_components/dedup_clusters). Registry "
    "edge set is the exact n-gram Jaccard path (oracle-provable); the "
    "minhash-LSH generator is the rows-only scale path.",
)


q_doc_decontaminate = Query(
    name="doc_decontaminate",
    build=_build_decontaminate,
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), glist AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(len(tokens) - 4, 1) + 1),
                       i -> array_to_string(list_slice(tokens, i, i + 4), ' '))) AS grams
            FROM toks
        ), inv AS (
            SELECT doc_id, unnest(grams) AS gram FROM glist
        ), train AS (
            SELECT doc_id AS train_id, gram FROM inv WHERE doc_id % 37 <> 0
        ), ev AS (
            SELECT doc_id AS eval_id, gram FROM inv WHERE doc_id % 37 = 0
        )
        SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        FROM train JOIN ev USING (gram)
        GROUP BY 1, 2
    """,
    doc="Benchmark decontamination: train-vs-eval 5-gram overlap counts "
    "(GPT-3 App. C / Pile-style). Grams join as broadcast 64-bit hashes — "
    "the corpus gram stream never shuffles (curation.py:24-58).",
)

def _build_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same corpus/eval split as doc_decontaminate, so the two entries
    # document the exact-join vs bloom-prefilter relationship on
    # identical inputs (pytest pins bloom_hit ⊇ exact hits).
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    eval_set = docs.filter(F.col("doc_id") % 37 == 0)
    return curation.decontaminate_bloom(corpus, eval_set, ngram=5)


q_doc_decontaminate_bloom = Query(
    name="doc_decontaminate_bloom",
    build=_build_decontaminate_bloom,
    # No oracle: bit positions come from Spark's xxhash64 (engine
    # intrinsic; DuckDB has no compatible hash). Semantics pinned in
    # pytest instead: zero false negatives vs the exact decontaminate
    # join, and the FPR stays within the (1-e^{-kn/m})^k envelope.
    oracle=None,
    doc="Bloom-filter decontamination pre-filter: eval-set 5-grams folded "
    "into a 2^20-bit / 4-hash bitset embedded in the plan; membership is "
    "a row-local expression over the corpus scan — zero shuffles at "
    "100 TB, no false negatives (curation.py:decontaminate_bloom).",
)


q_doc_chunk_windows = Query(
    name="doc_chunk_windows",
    build=lambda spark, sf_dir: curation.chunk_windows(
        _docs(spark, sf_dir), max_tokens=64, stride=48
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens,
                   CASE WHEN len({_NORM}) = 0 THEN 0
                        ELSE len({_TOKENS}) END AS n_tokens
            FROM documents
        ), counted AS (
            SELECT doc_id, tokens,
                   CASE WHEN n_tokens = 0 THEN 0
                        ELSE 1 + CAST(ceil(greatest(n_tokens - 64, 0) / 48.0) AS INT)
                   END AS n_chunks
            FROM toks
        ), exploded AS (
            SELECT doc_id, tokens,
                   unnest(range(0, n_chunks)) AS ci
            FROM counted
        )
        SELECT doc_id,
               CAST(ci AS INT) AS chunk_index,
               CAST(ci * 48 AS BIGINT) AS chunk_start_token,
               CAST(len(list_slice(tokens, ci * 48 + 1, ci * 48 + 64))
                    AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(tokens, ci * 48 + 1, ci * 48 + 64),
                               ' ') AS chunk_text
        FROM exploded
    """,
    doc="Overlapping token-window chunking (64-token windows, stride 48) "
    "— long-document training-sample construction; row-local 1->N "
    "generator expansion inside the scan, no shuffle "
    "(curation.py:chunk_windows).",
)


q_doc_epoch_shuffle = Query(
    name="doc_epoch_shuffle",
    build=lambda spark, sf_dir: sampling.epoch_shuffle(_docs(spark, sf_dir), epoch=1),
    oracle="""
        SELECT doc_id,
               CAST(1 AS INT) AS epoch,
               md5('e1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
               CAST(ROW_NUMBER() OVER (
                        ORDER BY md5('e1:' || CAST(doc_id AS VARCHAR)), doc_id)
                    - 1 AS BIGINT) AS epoch_position
        FROM documents
    """,
    doc="Deterministic per-epoch global shuffle order: dense position in "
    "md5((epoch, id)) order, assembled from hash-prefix bucket offsets + "
    "within-bucket ranks — no single-partition window at any scale "
    "(sampling.py:epoch_shuffle). Oracle is the direct ROW_NUMBER form.",
)


q_doc_curation_pipeline = Query(
    name="doc_curation_pipeline",
    build=lambda spark, sf_dir: curation.curate_corpus(_docs(spark, sf_dir)),
    # The composed pipeline's oracle is the composition of its stages'
    # (already individually proven) oracles: quality/lang CTE stacked
    # under the dedup window, split + verdict on top.
    oracle=f"""
        WITH feat AS (
            SELECT doc_id,
                   md5({_NORM}) AS content_md5,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                             ELSE len({_TOKENS}) END AS INT) AS n_tokens,
                   length({_NORM}) AS n_norm_chars,
                   {_hits(_EN)} AS en_hits, {_hits(_DE)} AS de_hits,
                   {_hits(_ES)} AS es_hits, {_hits(_FR)} AS fr_hits,
                   CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()-]', '', 'g')) AS INT) AS n_punct
            FROM documents
        ), scored AS (
            SELECT doc_id, content_md5, n_tokens,
                   CASE WHEN GREATEST(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
                        WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
                        WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
                        WHEN es_hits >= fr_hits THEN 'es'
                        ELSE 'fr' END AS lang_detected,
                   ROUND(
                     4.0e1 * CAST(n_bytes >= 100 AND n_bytes <= 100000 AS INT)
                     + 3.0e1 * CAST(ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) >= 2.0
                               AND ROUND(n_norm_chars / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) <= 12.0 AS INT)
                     + 2.0e1 * CAST(ROUND(en_hits / NULLIF(CAST(n_tokens AS DOUBLE), 0.0), 6) <= 0.6 AS INT)
                     + 1.0e1 * CAST(ROUND(n_punct / NULLIF(CAST(n_bytes AS DOUBLE), 0.0), 6) <= 0.2 AS INT), 1) AS quality_score
            FROM feat
        ), verdict AS (
            SELECT *,
                   CAST(COUNT(*) OVER (PARTITION BY content_md5) AS BIGINT) AS cluster_size,
                   ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id) = 1 AS is_canonical,
                   {sampling.oracle_bucket('doc_id', 100)} AS bucket
            FROM scored
        ), labeled AS (
            SELECT doc_id, content_md5, cluster_size, is_canonical,
                   lang_detected, n_tokens, quality_score,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   CASE WHEN cluster_size > 1 AND NOT is_canonical THEN 'duplicate'
                        WHEN COALESCE(quality_score, -1.0e0) < 50 THEN 'low_quality'
                   END AS drop_reason
            FROM verdict
        )
        SELECT doc_id, content_md5, cluster_size, is_canonical, lang_detected,
               n_tokens, quality_score, split, drop_reason,
               drop_reason IS NULL AS kept
        FROM labeled
    """,
    doc="The composed curation pipeline (dedup -> quality gate -> "
    "language-ID -> split) as one plan: full per-document audit frame "
    "with drop_reason/kept verdicts. One content-digest exchange total — "
    "every other stage is row-local expressions on the scan "
    "(curation.py:curate_corpus).",
)


q_doc_repetition = Query(
    name="doc_repetition",
    build=lambda spark, sf_dir: curation.repetition_stats(_docs(spark, sf_dir), n=3),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS tokens FROM documents
        ), grammed AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(len(tokens) - 2, 1) + 1),
                       i -> array_to_string(list_slice(tokens, i, i + 2), ' ')) AS grams
            FROM toks
        ), sizes AS (
            SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                   CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams
            FROM grammed
        ), inv AS (
            SELECT doc_id, unnest(grams) AS gram FROM grammed
        ), top AS (
            SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_gram_count
            FROM (SELECT doc_id, gram, COUNT(*) AS c FROM inv GROUP BY 1, 2)
            GROUP BY 1
        )
        SELECT s.doc_id, s.n_grams, s.n_distinct_grams,
               ROUND(CAST(1 AS DOUBLE)
                     - CAST(s.n_distinct_grams AS DOUBLE) / CAST(s.n_grams AS DOUBLE),
                     6) AS repetition_ratio,
               t.top_gram_count
        FROM sizes s JOIN top t ON s.doc_id = t.doc_id
    """,
    doc="Within-doc repetition profile (boilerplate/template drop signal): "
    "gram vs distinct-gram counts row-local; top-gram frequency via one "
    "uniform (doc, gram) shuffle (curation.py:61-105).",
)

q_doc_pii_scan = Query(
    name="doc_pii_scan",
    build=lambda spark, sf_dir: curation.pii_scan(_docs(spark, sf_dir)),
    oracle=r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_long_digit_runs,
               (len(regexp_extract_all(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                + len(regexp_extract_all(text, 'https?://[^\s]+'))
                + len(regexp_extract_all(text, '[0-9]{7,}'))) > 0 AS has_pii
        FROM documents
    """,
    doc="PII-pattern pre-filter (emails / URLs / long digit runs) — "
    "codegen'd regexp_count projections, no shuffle (curation.py:108-131).",
)

q_doc_pack_sequences = Query(
    name="doc_pack_sequences",
    build=lambda spark, sf_dir: curation.pack_sequences(
        _docs(spark, sf_dir), max_tokens=256, n_shards=8
    ),
    # The greedy scan IS deterministic given (shard, doc order, budget),
    # so it has a SQL twin after all: a recursive CTE stepping one doc
    # per shard per iteration (all shards advance in lockstep), carrying
    # the (pack, used, pos) state and emitting the Python loop's exact
    # transition (overflow reset, then oversized-doc pack retirement).
    oracle=f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   CAST({sampling.oracle_bucket('doc_id', 8)} AS INT) AS shard,
                   CAST(CASE WHEN len({_NORM}) = 0 THEN 0
                             ELSE len({_TOKENS}) END AS BIGINT) AS n_tokens
            FROM documents
        ), ranked AS (
            SELECT doc_id, shard, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
            FROM toks
        ), scan AS (
            SELECT doc_id, shard, n_tokens, rn,
                   CAST(0 AS BIGINT) AS pack_id,
                   0 AS pos_in_pack,
                   CAST(0 AS BIGINT) AS "offset",
                   CAST(CASE WHEN n_tokens > 256 THEN 1 ELSE 0 END AS BIGINT) AS nxt_pack,
                   CAST(CASE WHEN n_tokens > 256 THEN 0 ELSE n_tokens END AS BIGINT) AS nxt_used,
                   CASE WHEN n_tokens > 256 THEN 0 ELSE 1 END AS nxt_pos
            FROM ranked WHERE rn = 1
            UNION ALL
            SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
                   s.nxt_pack + CASE WHEN s.nxt_used > 0 AND s.nxt_used + r.n_tokens > 256
                                     THEN 1 ELSE 0 END,
                   CASE WHEN s.nxt_used > 0 AND s.nxt_used + r.n_tokens > 256
                        THEN 0 ELSE s.nxt_pos END,
                   CASE WHEN s.nxt_used > 0 AND s.nxt_used + r.n_tokens > 256
                        THEN CAST(0 AS BIGINT) ELSE s.nxt_used END,
                   s.nxt_pack
                     + CASE WHEN s.nxt_used > 0 AND s.nxt_used + r.n_tokens > 256
                            THEN 1 ELSE 0 END
                     + CASE WHEN r.n_tokens > 256 THEN 1 ELSE 0 END,
                   CASE WHEN r.n_tokens > 256 THEN CAST(0 AS BIGINT)
                        WHEN s.nxt_used > 0 AND s.nxt_used + r.n_tokens > 256 THEN r.n_tokens
                        ELSE s.nxt_used + r.n_tokens END,
                   CASE WHEN r.n_tokens > 256 THEN 0
                        WHEN s.nxt_used > 0 AND s.nxt_used + r.n_tokens > 256 THEN 1
                        ELSE s.nxt_pos + 1 END
            FROM scan s JOIN ranked r ON r.shard = s.shard AND r.rn = s.rn + 1
        )
        SELECT doc_id, shard, pack_id,
               CAST(pos_in_pack AS INT) AS pos_in_pack,
               "offset", n_tokens,
               n_tokens > 256 AS truncated
        FROM scan
    """,
    doc="Greedy sequence packing into fixed-token-budget packs, "
    "shard-local via applyInPandas — the sequential scan Spark cannot "
    "window; shards pack in parallel (curation.py:134-199). Oracle "
    "replays the same scan as a DuckDB recursive CTE (one doc per shard "
    "per step).",
)


q_doc_dup_rate_by_source = Query(
    name="doc_dup_rate_by_source",
    build=lambda spark, sf_dir: (
        dedup.exact_duplicates(_docs(spark, sf_dir))
        .join(_docs(spark, sf_dir).select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("is_duplicate").cast("bigint")).cast("bigint").alias("n_duplicates"),
            F.round(
                F.sum(F.col("is_duplicate").cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_rate"),
        )
    ),
    oracle="""
        WITH hashed AS (
            SELECT doc_id, source,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_md5
            FROM documents
        ), flagged AS (
            SELECT source,
                   (COUNT(*) OVER (PARTITION BY content_md5) > 1)
                     AND NOT (ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY doc_id ASC) = 1)
                     AS is_duplicate
            FROM hashed
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN is_duplicate THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicates,
               ROUND(CAST(SUM(CASE WHEN is_duplicate THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
        FROM flagged
        GROUP BY source
    """,
    doc="Corpus-health metric: exact-duplicate rate per source — the "
    "dedup verdict joined back to provenance, the report a data-sourcing "
    "team reads before renegotiating a feed.",
)

q_doc_token_histogram = Query(
    name="doc_token_histogram",
    build=lambda spark, sf_dir: (
        _docs(spark, sf_dir)
        .select(
            (F.floor(text.token_count(F.col("text")) / 10) * 10).cast("bigint").alias("token_bucket")
        )
        .groupBy("token_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ),
    oracle=f"""
        SELECT CAST(FLOOR(CAST(CASE WHEN length({_NORM}) = 0 THEN 0
                                    ELSE len({_TOKENS}) END AS INT) / 10) * 10 AS BIGINT)
                   AS token_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY 1
    """,
    doc="Corpus token-length histogram (10-token buckets) — the length "
    "distribution every sequence-budget decision starts from; one "
    "map-side-combined aggregation.",
)

q_doc_bigram_freqs = Query(
    name="doc_bigram_freqs",
    build=lambda spark, sf_dir: (
        load_views(spark, sf_dir),
        spark.sql(
            """
            SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
              SELECT explode(
                       transform(sequence(1, size(w) - 1),
                                 i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))) AS pair
              FROM (SELECT split(text, ' ') AS w FROM documents
                    WHERE size(split(text, ' ')) > 1)
            )
            GROUP BY pair
            ORDER BY n DESC, pair
            LIMIT 100
            """
        ),
    )[1],
    oracle="""
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
          SELECT unnest(
                   list_transform(range(1, len(w)),
                                  i -> concat(w[i], ' ', w[i + 1]))) AS pair
          FROM (SELECT split(text, ' ') AS w FROM documents
                WHERE len(split(text, ' ')) > 1)
        )
        GROUP BY pair
        ORDER BY n DESC, pair
        LIMIT 100
    """,
    doc="Adjacent-pair (bigram) frequency counting — the inner loop of BPE "
    "merge training and collocation mining. Pair generation is a row-local "
    "transform-over-sequence (no self-join, no shuffle until the count "
    "aggregate, which combines map-side); top-k via TakeOrderedAndProject, "
    "ties broken lexically for determinism.",
)

q_emb_quantize_int8 = Query(
    name="emb_quantize_int8",
    # The library API (similarity.quantize_int8) returns q8 as array<int>;
    # the registry entry flattens it to a CSV string because the driver's
    # frame canonicalizer sorts with pandas, which cannot hash list cells.
    build=lambda spark, sf_dir: similarity.quantize_int8(_embs(spark, sf_dir)).select(
        "vec_id",
        "scale",
        F.array_join(F.transform("q8", lambda v: v.cast("string")), ",").alias("q8_csv"),
        "recon_err_l2",
    ),
    oracle="""
        WITH scaled AS (
            SELECT vec_id,
                   GREATEST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                            1e-12) AS max_abs
            FROM embeddings
        )
        SELECT e.vec_id,
               ROUND(CAST(s.max_abs / 127 AS DOUBLE), 9) AS scale,
               array_to_string(list_transform(e.embedding,
                   x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 127 / s.max_abs) AS INT)
                             AS VARCHAR)), ',') AS q8_csv,
               CAST(ROUND(SQRT(list_sum(list_transform(e.embedding,
                   x -> (CAST(x AS DOUBLE)
                         - ROUND(CAST(x AS DOUBLE) * 127 / s.max_abs) * (s.max_abs / 127))
                      * (CAST(x AS DOUBLE)
                         - ROUND(CAST(x AS DOUBLE) * 127 / s.max_abs) * (s.max_abs / 127))))),
                    6) AS DOUBLE) AS recon_err_l2
        FROM embeddings e JOIN scaled s ON e.vec_id = s.vec_id
    """,
    doc="Symmetric int8 scalar quantization per vector (max-abs scale, "
    "round-to-nearest) + L2 reconstruction error — 4x memory cut for the "
    "ANN candidate store; row-local, no shuffle (similarity.py:quantize_int8). "
    "Registry shape emits q8 as a CSV string (driver canonicalizer can't "
    "hash list columns); the library API keeps the array.",
)

q_doc_clean_corpus_stats = Query(
    name="doc_clean_corpus_stats",
    build=lambda spark, sf_dir: (
        dedup.exact_duplicates(_docs(spark, sf_dir))
        .filter(~F.col("is_duplicate"))
        .join(_docs(spark, sf_dir).select("doc_id", "lang", "n_chars"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    ),
    oracle="""
        WITH hashed AS (
            SELECT doc_id, lang, n_chars,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_md5
            FROM documents
        ), kept AS (
            SELECT lang, n_chars
            FROM (
                SELECT lang, n_chars,
                       (COUNT(*) OVER (PARTITION BY content_md5) > 1)
                         AND NOT (ROW_NUMBER() OVER (PARTITION BY content_md5
                                                     ORDER BY doc_id ASC) = 1) AS is_duplicate
                FROM hashed
            ) WHERE NOT is_duplicate
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM kept
        GROUP BY lang
    """,
    doc="End-to-end curation composition: dedup verdict -> keep filter -> "
    "per-language corpus stats, the post-clean size report that feeds "
    "mixture planning.",
)


q_multimodal_features = Query(
    name="multimodal_features",
    build=lambda spark, sf_dir: multimodal.extract_media_features(
        multimodal.documents_as_media(_docs(spark, sf_dir))
    ),
    oracle="""
        SELECT doc_id AS media_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(64 + strlen(text) % 512 AS INT)       AS width,
               CAST(64 + (strlen(text) * 7) % 512 AS INT) AS height,
               CAST(1 + strlen(text) % 16 AS INT)         AS n_frames
        FROM documents
    """,
    doc="Multimodal binary-column plumbing: payload+metadata schema -> "
    "mapInPandas Arrow-batched feature extraction (decode stubbed "
    "deterministically; the oracle verifies the full UDF pipeline).",
)

q_multimodal_resize = Query(
    name="multimodal_resize",
    # Registry shape omits the binary `thumb` column (Spark ships binary
    # to pandas as unhashable bytearray — same canonicalizer limit as
    # list columns); thumb_md5/thumb_n_bytes pin its content and size.
    build=lambda spark, sf_dir: multimodal.resize_media(
        multimodal.documents_as_media(_docs(spark, sf_dir)), target_w=64, target_h=64
    ).select(
        "media_id",
        "src_width",
        "src_height",
        "out_width",
        "out_height",
        "thumb_md5",
        "thumb_n_bytes",
        "is_stub",
    ),
    oracle="""
        SELECT doc_id AS media_id,
               CAST(64 + strlen(text) % 512 AS INT)       AS src_width,
               CAST(64 + (strlen(text) * 7) % 512 AS INT) AS src_height,
               CAST(64 AS INT)  AS out_width,
               CAST(64 AS INT)  AS out_height,
               md5(md5(text || ':64x64')) AS thumb_md5,
               CAST(32 AS BIGINT) AS thumb_n_bytes,
               TRUE AS is_stub
        FROM documents
    """,
    doc="Batch thumbnail/resize over binary payloads (the vision-training "
    "preprocessing step): mapInPandas, source payloads dropped before "
    "yield; real Pillow resize when installed, deterministic digest stub "
    "otherwise — the oracle verifies the stub path end-to-end "
    "(multimodal.py:resize_media).",
)

q_multimodal_frame_sample = Query(
    name="multimodal_frame_sample",
    build=lambda spark, sf_dir: multimodal.sample_frames(
        multimodal.documents_as_media(_docs(spark, sf_dir)), every_n=4
    ),
    oracle="""
        WITH m AS (
            SELECT doc_id AS media_id, text,
                   CAST(1 + strlen(text) % 16 AS INT) AS n_frames
            FROM documents
        )
        SELECT media_id,
               CAST(i AS INT) AS frame_idx,
               md5(text || ':' || CAST(i AS VARCHAR)) AS frame_md5
        FROM m, LATERAL unnest(range(0, n_frames, 4)) AS t(i)
    """,
    doc="Video-style frame sampling: 1->N expansion inside the Arrow "
    "batch iterator (payload bytes dropped before yield — task memory "
    "is one batch, not one batch x frames). Oracle verifies the full "
    "mapInPandas expansion row-for-row.",
)


q_doc_span_dedup = Query(
    name="doc_span_dedup",
    build=lambda spark, sf_dir: dedup.span_dedup_stats(_docs(spark, sf_dir)),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
        ), spans AS (
            SELECT doc_id, array_to_string(t[i * 8 + 1 : i * 8 + 8], ' ') AS span
            FROM toks, UNNEST(range(len(t) // 8)) AS u(i)
        ), counts AS (
            SELECT span, COUNT(*) AS occ FROM spans GROUP BY span
        ), per_doc AS (
            SELECT s.doc_id, COUNT(*) AS n_spans,
                   SUM(CASE WHEN c.occ > 1 THEN 1 ELSE 0 END) AS n_dup_spans
            FROM spans s JOIN counts c USING (span)
            GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               ROUND(CAST(p.n_dup_spans AS DOUBLE) / CAST(p.n_spans AS DOUBLE), 6)
                   AS dup_span_fraction
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Span-level (8-token, non-overlapping) exact-dup audit per doc — "
    "the sub-document grain C4/RefinedWeb-style cleaning uses to catch "
    "boilerplate that document-level dedup misses. Span generation is "
    "row-local (no token-grain explode); shuffles are span-keyed. "
    "Zero-span docs stay in the output with NULL fraction (no data loss).",
)

q_doc_cross_source_dups = Query(
    name="doc_cross_source_dups",
    build=lambda spark, sf_dir: dedup.cross_source_duplicates(_docs(spark, sf_dir)),
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, source, md5({_NORM}) AS h FROM documents
        )
        SELECT LEAST(a.source, b.source) AS source_a,
               GREATEST(a.source, b.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
        FROM hashed a JOIN hashed b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """,
    doc="Source-contamination matrix: exact-duplicate pairs per "
    "(source, source) with the diagonal as within-source duplication — "
    "digest-keyed pair join bounded by cluster sizes, never a cross "
    "product. Tells a pipeline which ingestion feeds re-serve each "
    "other's content.",
)


QUERIES = [
    q_doc_dedup_exact,
    q_doc_token_stats,
    q_doc_quality,
    q_doc_semantic_domain_profile,
    q_doc_lang_id,
    q_doc_ngram_jaccard,
    q_doc_tf_cosine_pairs,
    q_doc_corpus_keywords,
    q_doc_minhash_near_dups,
    q_doc_minhash_dedup_verdict,
    q_doc_simhash_near_dups,
    q_emb_label_stats,
    q_emb_label_centroids,
    q_emb_cosine_topk,
    q_emb_cosine_topk_gemm,
    q_emb_cosine_topk_lsh,
    q_emb_hard_negatives,
    q_emb_hard_negatives_gemm,
    q_emb_hard_negatives_lsh,
    q_emb_cosine_near_dups,
    q_emb_cosine_near_dups_lsh,
    q_emb_cosine_near_dups_gemm,
    q_emb_cosine_near_dups_auto,
    q_emb_ivf_topk,
    q_emb_pq_topk,
    q_emb_ivfpq_topk,
    q_emb_kmeans,
    q_doc_train_split,
    q_doc_stratified_sample,
    q_doc_hash_sample_k,
    q_doc_weighted_sample,
    q_doc_length_matched_sample,
    q_doc_mixture_weights,
    q_doc_temperature_mixture,
    q_doc_source_drift,
    q_doc_pii_redact,
    q_doc_dedup_clusters,
    q_doc_decontaminate,
    q_doc_repetition,
    q_doc_pii_scan,
    q_doc_pack_sequences,
    q_doc_dup_rate_by_source,
    q_doc_token_histogram,
    q_doc_bigram_freqs,
    q_doc_token_rarity,
    q_doc_bigram_lm_score,
    q_doc_bigram_lm_score_ref,
    q_doc_bpe_merges,
    q_doc_bpe_encode,
    q_emb_ann_recall,
    q_doc_dedup_eval,
    q_doc_dedup_verdict_eval,
    q_emb_quantize_int8,
    q_doc_clean_corpus_stats,
    q_multimodal_features,
    q_multimodal_resize,
    q_multimodal_frame_sample,
    q_doc_span_dedup,
    q_doc_cross_source_dups,
    q_doc_incremental_dedup,
    q_emb_semantic_dedup,
    q_emb_semantic_dedup_probe2,
    q_doc_decontaminate_bloom,
    q_doc_chunk_windows,
    q_doc_epoch_shuffle,
    q_doc_curation_pipeline,
]
