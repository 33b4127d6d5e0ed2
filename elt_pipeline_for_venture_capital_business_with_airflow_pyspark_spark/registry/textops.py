"""Registry family: textops (27 queries).

- text_stats
- text_winnow_fingerprints
- text_lang_id
- text_decontaminate
- text_top_terms
- text_url_canonicalize
- text_pii_scrub
- text_repetition
- text_contamination
- text_tfidf_top3
- text_chunk_windows
- text_encoding_quality
- text_rarity_score
- text_pack_chunks
- text_bm25_top5
- text_gopher_rules
- text_pmi_pairs
- text_pmi_window
- text_bpe_learn
- text_bpe_tokenize
- text_bpe_tokenize_large
- text_homoglyph_fold
- text_lm_perplexity
- text_lm_kneser_ney
- text_lm_index_build
- text_lm_index_append
- text_lm_index_score
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401


@_register(
    "text_stats",
    f"""
    WITH tok AS (
      SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '{TX.BPE_PATTERN}')) AS INT) AS n_bpe_tokens,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n]')) AS INT) AS n_punct,
             CAST(len(list_filter(toks, x -> list_contains({_SW_LIST}, x))) AS INT) AS n_stopwords,
             CAST(length(text) AS INT) AS n_chars
      FROM tok
    )
    SELECT doc_id, n_tokens, n_bpe_tokens, n_punct, n_stopwords,
           CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE) ELSE
             least(CAST(1.0 AS DOUBLE), CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
             + least(CAST(1.0 AS DOUBLE), (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * CAST(5.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
             + (CAST(1.0 AS DOUBLE) - least(CAST(1.0 AS DOUBLE), (CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) * CAST(4.0 AS DOUBLE))) * CAST(0.3 AS DOUBLE)
           END AS quality
    FROM feats
    """,
)
def _text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting, BPE-ish counting, punctuation/stopword stats,
    quality score — the text-analysis scalar suite."""
    docs = read_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
        TX.punct_count("text").alias("n_punct"),
        TX.stopword_count("text").alias("n_stopwords"),
        TX.quality_score("text").alias("quality"),
    )


@_register(
    "text_winnow_fingerprints",
    """
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
      FROM documents
    ), h AS (
      SELECT doc_id, s,
             list_transform(
               generate_series(1, greatest(length(s) - 4, 1)),
               i -> ascii(s[i]) + ascii(s[i+1]) * 31 + ascii(s[i+2]) * 961
                  + ascii(s[i+3]) * 29791 + ascii(s[i+4]) * 923521
             ) AS hs
      FROM n
    )
    SELECT doc_id,
           array_to_string(
             CASE WHEN length(s) < 5 THEN []
                  ELSE list_transform(list_sort(list_distinct(list_transform(
                         generate_series(1, greatest(len(hs) - 3, 1)),
                         i -> list_min(hs[i:i+3])))), x -> CAST(x AS VARCHAR))
             END, ',') AS fingerprints
    FROM h
    """,
)
def _text_winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (k=5 char grams, window=4)
    — polynomial hash replicated exactly in the oracle SQL. The
    fingerprint array is serialized to a comma-joined string so the
    driver's scalar-only canonicalizer can hash it."""
    docs = read_table(spark, sf, "documents")
    fps = TX.winnow_fingerprints(docs, "doc_id", "text", k=5, window=4)
    return fps.select(
        F.col("id").alias("doc_id"),
        # NULL (not ''): a null/fingerprint-less doc has no serialized
        # fingerprint, matching the SQL side's NULL propagation
        F.when(
            F.size("fingerprints") > 0,
            F.array_join(
                F.transform("fingerprints", lambda x: x.cast("string")), ","
            ),
        ).alias("fingerprints"),
    )


@_register("text_lang_id", _lang_sql())
def _text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Marker-word language ID (argmax with code-order tiebreak)."""
    docs = read_table(spark, sf, "documents")
    return docs.select("doc_id", TX.lang_id("text").alias("lang_pred"))


@_register(
    "text_decontaminate",
    """
    WITH tok AS (
      SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 1)),
               i -> array_to_string(t[i:i+2], ' '))) AS shingles
      FROM tok WHERE len(t) > 0
    ), idx AS (
      SELECT doc_id, unnest(shingles) AS g FROM grams
    ), ev AS (
      SELECT DISTINCT g FROM idx WHERE doc_id % 97 = 0
    ), tr AS (
      SELECT doc_id, g FROM idx WHERE doc_id % 97 <> 0
    )
    SELECT tr.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
    FROM tr JOIN ev USING (g)
    GROUP BY 1
    """,
)
def _text_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.contamination_hits —
    the GPT-3-lineage pre-training hygiene step): training docs
    sharing word n-grams with ANY held-out eval doc are flagged with
    their distinct-shared-gram counts; composing decontaminate() drops
    them via a left-anti join. Eval set = doc_id ≡ 0 (mod 97) — a
    benchmark-sized slice, so its distinct gram set BROADCASTS and
    the 100-TB train side pays one scan + one map-combined groupBy,
    never a shuffle join. n=3 here (the synthetic docs are ~40 tokens;
    production uses 13 per the published recipe — same plan either
    way). Same whitespace-shingle convention as the dedup family;
    sub-n docs contribute their whole text (conservative: a short
    eval doc quoted verbatim still hits). Complements the older
    text_contamination entry (4-gram, >=4-token docs only, shared
    shingle + eval-doc counts): THIS entry is the operator-API form —
    dedup.contamination_hits / decontaminate with min_hits and the
    left-anti drop, the streaming twin in
    tests/test_stream_decontaminate.py."""
    docs = read_table(spark, sf, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    hits = DD.contamination_hits(tr, ev, "doc_id", "text", n=3)
    return hits.select(F.col("id").alias("doc_id"), "n_contaminated_grams")


@_register(
    "text_top_terms",
    """
    WITH toks AS (
      SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' ')) AS term
      FROM documents
    )
    SELECT term, COUNT(*) AS n
    FROM toks
    WHERE term <> '' AND length(term) >= 3
      AND term NOT IN ('the','and','for','with','that','this','are','was','you')
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def _text_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide top-20 terms: normalize → explode tokens → filter
    stopwords/short → count → TopK (the canonical explode+groupBy
    shape; map-side partial counts make the shuffle |vocab|-sized,
    not |tokens|-sized)."""
    docs = read_table(spark, sf, "documents")
    stop = ["the", "and", "for", "with", "that", "this", "are", "was", "you"]
    toks = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " "
            )
        ).alias("term")
    )
    return (
        toks.filter(
            (F.col("term") != "") & (F.length("term") >= 3) & ~F.col("term").isin(stop)
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


@_register(
    "text_url_canonicalize",
    """
    WITH u AS (
      SELECT doc_id,
             'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/'
               || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1#sec'
                       WHEN doc_id % 3 = 1 THEN '?a=1&utm_campaign=x&ref=home'
                       ELSE '' END AS url
      FROM documents
    ), s AS (
      SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u
    ), parts AS (
      SELECT doc_id,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS auth,
             regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1) AS path0,
             regexp_extract(u, '\\?(.*)$', 1) AS qs
      FROM s
    ), hostp AS (
      SELECT doc_id, scheme,
             CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                  WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                  ELSE auth END AS host,
             CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
             list_sort(list_filter(string_split(qs, '&'),
               p -> NOT (p = '' OR starts_with(p, 'utm_')
                         OR starts_with(p, 'gclid=') OR starts_with(p, 'fbclid=')
                         OR starts_with(p, 'msclkid=') OR starts_with(p, 'ref=')))) AS kept
      FROM parts
    )
    SELECT doc_id, host,
           CASE WHEN len(kept) = 0 THEN scheme || '://' || host || path
                ELSE scheme || '://' || host || path || '?'
                     || array_to_string(kept, '&') END AS url_norm
    FROM hostp
    """,
)
def _text_url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization for web-corpus dedup
    (functions/text.url_normalize + url_host): scheme/host lowercase,
    default-port strip, fragment drop, tracking-parameter drop
    (utm_*/gclid/fbclid/msclkid/ref), surviving params sorted, empty
    path → '/'. Dirty inputs are synthesized deterministically from
    the documents table (mixed case, :443, trackers, fragments) since
    testdata carries no URL column — both engines build the identical
    dirty string, then normalize with their own expression stacks.
    Pure scalar expressions, runs inside the scan stage."""
    docs = read_table(spark, sf, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/Docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1#sec"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&utm_campaign=x&ref=home"))
        .otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        TX.url_host(url).alias("host"),
        TX.url_normalize(url).alias("url_norm"),
    )


# ---------------------------------------------------------------------------
# driver API
# ---------------------------------------------------------------------------

# --- training-data curation round 2: PII, repetition, contamination, tf-idf --

@_register(
    "text_pii_scrub",
    r"""
    WITH dirty AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN text || ' contact alice.smith+1@mail-example.com today'
               WHEN 1 THEN text || ' call 555-123-4567 or 800.555.1212 now'
               ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '[+]?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS INT) AS n_phones,
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
             '[+]?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS scrubbed
    FROM dirty
    """,
)
def _text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction — the pre-training scrub (emails, then phones)
    plus per-doc match counts, all in one projection (no shuffle; the
    scrub runs inside the scan stage at any scale). Dirty strings are
    synthesized deterministically so every pattern branch executes."""
    docs = read_table(spark, sf, "documents")
    dirty = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" contact alice.smith+1@mail-example.com today")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.col("text"), F.lit(" call 555-123-4567 or 800.555.1212 now")),
        )
        .otherwise(F.col("text"))
    )
    return docs.select(
        "doc_id",
        TX.pii_email_count(dirty).alias("n_emails"),
        TX.pii_phone_count(dirty).alias("n_phones"),
        TX.pii_scrub(dirty).alias("scrubbed"),
    )


@_register(
    "text_repetition",
    rf"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), g AS (
      SELECT doc_id, toks,
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             ) AS grams
      FROM tok
    )
    SELECT doc_id,
           CASE WHEN len(toks) < 3 THEN CAST(0.0 AS DOUBLE)
                ELSE 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE)
           END AS rep_frac_3
    FROM g
    """,
)
def _text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signal: duplicate word-3-gram fraction
    per doc (repetitive docs are low-value training data). Row-local
    expression, zero shuffle."""
    docs = read_table(spark, sf, "documents")
    return docs.select(
        "doc_id", TX.repetition_fraction("text", n=3).alias("rep_frac_3")
    )


@_register(
    "text_contamination",
    rf"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
             ))) AS shingle
      FROM tok WHERE len(toks) >= 4
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.shingle) AS n_shared_shingles,
           COUNT(DISTINCT e.doc_id) AS n_eval_docs
    FROM sh t JOIN sh e ON t.shingle = e.shingle
    WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
    GROUP BY t.doc_id
    """,
)
def _text_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination detection: training docs sharing any
    distinct word-4-gram with the (deterministic doc_id%97) eval set,
    with shared-shingle and eval-doc counts. The scale path is a
    broadcast equi-join on the shingle — the eval set is always tiny
    relative to the corpus, so no shuffle of the training side's
    shingle stream is needed beyond the explode."""
    docs = read_table(spark, sf, "documents")
    base = docs.filter(TX.token_count("text") >= 4).select(
        "doc_id", F.explode(TX.shingles_fast("text", n=4)).alias("shingle")
    )
    evals = base.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "shingle"
    )
    train = base.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(evals), on="shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )


@_register(
    "text_tfidf_top3",
    rf"""
    WITH tok AS (
      SELECT doc_id, unnest(toks) AS term
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS dfreq FROM tok GROUP BY term
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             (tf.tf * n.n_docs * 1000000) // dfq.dfreq AS score_scaled
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score_scaled, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score_scaled DESC, term) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def _text_tfidf_top3(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc top-3 terms by tf-idf. The score is integer-scaled
    (tf · N_docs · 1e6 div doc_freq) so ranking is exact and
    cross-engine — float tf-idf ties would be engine-dependent. Plan:
    explode → two partial-agg shuffles (term frequencies, doc
    frequencies) → broadcast join (the term vocabulary is always tiny
    vs the corpus) → per-doc top-k window. The N_docs scalar rides a
    one-row broadcast cross join, constant cost at any scale."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfq), on="term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.expr("tf * n_docs * 1000000L div dfreq").alias("score_scaled"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score_scaled", "rnk")
    )


@_register(
    "text_chunk_windows",
    """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks
      FROM documents WHERE doc_id % 7 = 0
    ), s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 1, 0) + 1, 10)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start // 10 AS INT) AS chunk_id,
           CAST(start AS INT) AS chunk_start,
           CAST(len(list_slice(toks, start + 1, start + 20)) AS BIGINT)
             AS n_chunk_tokens,
           CASE WHEN len(toks) = 0 THEN ''
                ELSE array_to_string(list_slice(toks, start + 1, start + 20), ' ')
           END AS chunk_text
    FROM s WHERE start = 0 OR start < len(toks)
    """,
)
def _text_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking (functions/text.chunk_windows,
    size=20 stride=10) — the RAG/pre-training chunk step as a ZERO-shuffle
    generator explode: tokenize, generate stride starts, slice, join.
    Row amplification bounded by ceil(tokens/stride); streams at scan
    speed."""
    docs = read_table(spark, sf, "documents").filter(F.col("doc_id") % 7 == 0)
    return TX.chunk_windows(docs, "doc_id", "text", size=20, stride=10)


@_register(
    "text_encoding_quality",
    """
    WITH dirty AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN chr(7) ELSE '' END ||
             CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', chr(233)) ELSE text END ||
             CASE WHEN doc_id % 5 = 0 THEN chr(65533) ELSE '' END AS d
      FROM documents
    )
    SELECT doc_id,
           CAST(length(d) AS BIGINT) AS n_cp,
           CAST(len(regexp_extract_all(d, '[^\\x00-\\x7f]')) AS BIGINT) AS n_non_ascii,
           CAST(len(regexp_extract_all(d, '[\\x00-\\x08\\x0b-\\x1f]')) AS BIGINT) AS n_ctrl,
           CAST(len(regexp_extract_all(d, chr(65533))) AS BIGINT) AS n_replacement,
           CAST(len(regexp_extract_all(d, '[\\x20-\\x7e]')) AS DOUBLE)
             / NULLIF(length(d), 0) AS printable_ratio,
           len(regexp_extract_all(d, '[\\x00-\\x08\\x0b-\\x1f]')) = 0
             AND len(regexp_extract_all(d, chr(65533))) = 0
             AND COALESCE(CAST(len(regexp_extract_all(d, '[\\x20-\\x7e]')) AS DOUBLE)
                          / NULLIF(length(d), 0) >= 0.8, FALSE)
             AS is_clean
    FROM dirty
    """,
)
def _text_encoding_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Encoding/mojibake quality gate: codepoint count, non-ASCII,
    control-char and U+FFFD-replacement counts, printable ratio, and
    the composite keep/drop flag — the filter every crawl corpus runs
    before tokenization. The testdata is pure ASCII, so the query
    first INJECTS deterministic dirt (é substitution, U+FFFD suffix,
    BEL prefix — identical expressions in both engines) and then
    proves the scoring expressions agree bit-for-bit. Pure projection:
    zero shuffles, scan speed."""
    docs = read_table(spark, sf, "documents")
    d = F.concat(
        F.when(F.col("doc_id") % 7 == 0, F.lit(chr(7))).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0, F.replace(F.col("text"), F.lit("a"), F.lit(chr(233)))
        ).otherwise(F.col("text")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(chr(65533))).otherwise(F.lit("")),
    )
    dirty = docs.select("doc_id", d.alias("d"))
    n_ctrl = F.regexp_count(F.col("d"), F.lit(r"[\x00-\x08\x0b-\x1f]"))
    n_repl = F.regexp_count(F.col("d"), F.lit(chr(65533)))
    # empty doc -> NULL ratio (try_divide), is_clean coalesced to false:
    # ANSI mode raises on /0, and the gate's keep/drop answer for a
    # zero-length doc is "drop", not an error
    printable = F.try_divide(
        F.regexp_count(F.col("d"), F.lit(r"[\x20-\x7e]")).cast("double"),
        F.length("d"),
    )
    return dirty.select(
        "doc_id",
        F.length("d").cast("long").alias("n_cp"),
        F.regexp_count(F.col("d"), F.lit(r"[^\x00-\x7f]")).cast("long").alias(
            "n_non_ascii"
        ),
        n_ctrl.cast("long").alias("n_ctrl"),
        n_repl.cast("long").alias("n_replacement"),
        printable.alias("printable_ratio"),
        (
            (n_ctrl == 0)
            & (n_repl == 0)
            & F.coalesce(printable >= 0.8, F.lit(False))
        ).alias("is_clean"),
    )


@_register(
    "text_rarity_score",
    rf"""
    WITH tok AS (
      SELECT doc_id, unnest(toks) AS term
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    ), freq AS (
      SELECT term, COUNT(*) AS tf FROM tok GROUP BY term
    ), ranked AS (
      SELECT term,
             CAST(DENSE_RANK() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rarity
      FROM freq
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST((SUM(r.rarity) * 1000000) // COUNT(*) AS BIGINT) AS mean_rarity_scaled
    FROM tok t JOIN ranked r ON t.term = r.term
    GROUP BY t.doc_id
    """,
)
def _text_rarity_score(spark: SparkSession, sf: str) -> DataFrame:
    """Token-rarity curation signal — the log-free perplexity proxy:
    rank the vocabulary by corpus frequency (densely, ties broken by
    term so the rank is total) and score each document by its mean
    token rank, integer-scaled ×1e6 under integer division so the
    value is engine-exact. Documents whose tokens are mostly
    rare-ranked are OOD/noise candidates; mostly top-ranked ones are
    boilerplate candidates — both tails are what a curation pass
    inspects. Plan: one explode feeding a term-frequency partial agg;
    the ranked vocabulary (small vs the corpus, but still Heap's-law
    data-sized — billions of terms at 100 TB) broadcasts back onto
    the token stream; one final per-doc agg. The vocab rank is the
    TWO-PHASE surrogate.bucketed_rank, not a global window: since the
    (tf, term) order is total over unique rows, DENSE_RANK == ROW_
    NUMBER, and tf DESC rewrites as -tf ASC — so no vocabulary-sized
    SinglePartition sort anywhere (the last such window, retired in
    r7; pinned by the plan-audit Window/SinglePartition sweep)."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    ranked = SK.bucketed_rank(
        freq.withColumn("__negtf", -F.col("tf")),
        ["__negtf", "term"],
        out_col="rarity",
    ).select("term", F.col("rarity").cast("long").alias("rarity"))
    return (
        tok.join(F.broadcast(ranked), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(rarity) * 1000000L div count(1)").alias(
                "mean_rarity_scaled"
            ),
        )
    )


@_register(
    "text_pack_chunks",
    """
    WITH d AS (
      SELECT doc_id, SUM(CAST(n_chars AS BIGINT)) AS len,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
      GROUP BY doc_id
    ), c AS (
      SELECT doc_id, len,
             SUM(len) OVER (ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    ), s AS (
      SELECT doc_id, len, CAST(cum - len AS BIGINT) AS strt,
             CAST((cum - len) // 2048 AS BIGINT) AS first_c,
             CAST((cum - 1) // 2048 AS BIGINT) AS last_c
      FROM c
    ), e AS (
      SELECT doc_id, len, strt,
             CAST(unnest(generate_series(first_c, last_c)) AS BIGINT) AS chunk_id
      FROM s
    )
    SELECT doc_id AS id, chunk_id,
           CAST(greatest(strt, chunk_id*2048) - strt AS BIGINT) AS doc_off,
           CAST(greatest(strt, chunk_id*2048) - chunk_id*2048 AS BIGINT)
             AS chunk_off,
           CAST(least(strt+len, (chunk_id+1)*2048)
                - greatest(strt, chunk_id*2048) AS BIGINT) AS n_toks
    FROM e
    """,
)
def _text_pack_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-then-chunk sequence packing (operators/sampling.
    pack_chunks): documents lie end-to-end in md5-order and the token
    stream cuts into 2048-length training chunks — one row per
    (document, chunk) overlap with exact BIGINT offsets, the batching
    artifact a pretraining loader consumes. The global prefix sum is
    the two-phase bucketed cumsum (features.partitioned_cumsum — no
    single-reducer sort); the chunk fan-out is a map-side explode.
    Oracle: DuckDB window cumsum + generate_series restatement.
    Inputs pre-aggregate per doc_id so duplicate-id mutations (ties
    sweep) keep the order total."""
    docs = read_table(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") > 0)
    )
    d = docs.groupBy("doc_id").agg(
        F.sum(F.col("n_chars").cast("bigint")).alias("len")
    )
    return SMP.pack_chunks(d, "doc_id", "len", 2048)


@_register(
    "text_bm25_top5",
    rf"""
    WITH tok AS (
      SELECT doc_id, unnest(toks) AS term
      FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_toks FROM dl
    ), dfq AS (
      SELECT term, COUNT(*) AS dfreq FROM tf
      WHERE term IN ('query', 'merge', 'vector') GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             (((44 * c.total_toks * tf.tf * 1000000)
               // (20 * c.total_toks * tf.tf + 6 * c.total_toks
                   + 18 * dl.dl * c.n_docs))
              * (2 * c.n_docs - 2 * dfq.dfreq + 1)) // (2 * dfq.dfreq + 1)
               AS score_scaled
      FROM tf
      JOIN dl USING (doc_id)
      JOIN dfq ON tf.term = dfq.term
      CROSS JOIN corpus c
    )
    SELECT term, doc_id, CAST(score_scaled AS BIGINT) AS score_scaled, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY term ORDER BY score_scaled DESC, doc_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def _text_bm25_top5(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 retrieval (k1=1.2, b=0.75) for a fixed 3-term query, top-5
    docs per term. The whole score is integer-exact: with k1=6/5,
    b=3/4, the saturation ratio tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl))
    multiplied through by 20·total_tokens becomes
    44·T·tf / (20·T·tf + 6·T + 18·dl·N), scaled ×1e6 under integer
    division; the idf uses the raw Robertson ratio
    (N-df+.5)/(df+.5) = (2N-2df+1)/(2df+1) — log-free (monotone, so
    identical ranking) and therefore exactly representable. Plan: the
    tf/dl partial aggs share one explode; query terms filter BEFORE
    the join (3 rows), so the per-term ranking window is tiny. At
    corpus scale the same plan streams: two partial-agg shuffles plus
    a broadcast of the 3-row df table. Production would keep doubles
    and the log; the rational form is the cross-engine harness."""
    docs = read_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl re-explodes rather than re-aggregating tf: measured 30% faster
    # at sf0.1 — the two tok branches run as parallel stages with
    # map-side partial counts, while deriving dl from tf serializes
    # behind the full (doc_id, term) exchange
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_toks")
    )
    dfq = (
        tf.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("dfreq"))
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "term",
            "doc_id",
            F.expr(
                "((44 * total_toks * tf * 1000000L)"
                " div (20 * total_toks * tf + 6 * total_toks + 18 * dl * n_docs)"
                " * (2 * n_docs - 2 * dfreq + 1)) div (2 * dfreq + 1)"
            ).alias("score_scaled"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score_scaled").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("term", "doc_id", "score_scaled", "rnk")
    )


@_register(
    "text_gopher_rules",
    rf"""
    WITH tok AS (
      SELECT doc_id, text, {_TOKENS_SQL} AS toks FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(COALESCE(list_aggregate(
                 list_transform(toks, t -> length(t)), 'sum'), 0) AS BIGINT)
               AS word_chars,
             CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
               AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks, x -> list_contains({_SW_LIST}, x)))
               AS BIGINT) AS n_sw,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n]'))
               AS BIGINT) AS n_punct
      FROM tok
    )
    SELECT doc_id, n_words,
           (n_words >= 50 AND n_words <= 100000) AS r_wordcount,
           (n_words > 0 AND 3 * n_words <= word_chars
            AND word_chars <= 10 * n_words) AS r_meanwordlen,
           (n_words > 0 AND 5 * n_alpha >= 4 * n_words) AS r_alphawords,
           (n_sw >= 2) AS r_stopwords,
           (10 * n_punct < n_words) AS r_symbolratio,
           ((n_words >= 50 AND n_words <= 100000)
            AND (n_words > 0 AND 3 * n_words <= word_chars
                 AND word_chars <= 10 * n_words)
            AND (n_words > 0 AND 5 * n_alpha >= 4 * n_words)
            AND (n_sw >= 2) AND (10 * n_punct < n_words)) AS pass_gopher
    FROM feats
    ORDER BY doc_id
    """,
)
def _text_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style quality gate with per-rule attribution — which
    heuristic rejected each document (word-count band, mean word
    length, alpha-word share, stopword floor, symbol ratio). All
    thresholds cleared to integer cross-products, so the flags are
    engine-exact. Pure map stage over the documents scan."""
    docs = read_table(spark, sf, "documents")
    g = TX.gopher_rules("text")
    return docs.select(
        "doc_id",
        g["n_words"].alias("n_words"),
        g["r_wordcount"].alias("r_wordcount"),
        g["r_meanwordlen"].alias("r_meanwordlen"),
        g["r_alphawords"].alias("r_alphawords"),
        g["r_stopwords"].alias("r_stopwords"),
        g["r_symbolratio"].alias("r_symbolratio"),
        g["pass_gopher"].alias("pass_gopher"),
    ).orderBy("doc_id")


@_register(
    "text_pmi_pairs",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' ')) AS term
      FROM documents
    ), pres AS (
      SELECT DISTINCT doc_id, term FROM toks
      WHERE term <> '' AND length(term) >= 3
    ), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    vocab AS (
      SELECT term, COUNT(*) AS df_t FROM pres GROUP BY term
      HAVING COUNT(*) >= 5
      ORDER BY df_t DESC, term LIMIT 200
    ), hits AS (
      SELECT p.doc_id, p.term, v.df_t FROM pres p JOIN vocab v USING (term)
    ), pairs AS (
      SELECT a.term AS term_a, b.term AS term_b,
             a.df_t AS n_a, b.df_t AS n_b, COUNT(*) AS n_ab
      FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= 3
    )
    SELECT term_a, term_b, n_ab, n_a, n_b,
           n_ab * n_docs AS lift_num,
           n_a * n_b AS lift_den,
           CAST(n_ab * n_docs AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS lift
    FROM pairs, nd
    """,
)
def _text_pmi_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus term co-occurrence with exact-arithmetic PMI ordering
    (functions/text.term_cooccurrence): document-presence pairs over a
    bounded top-200 vocabulary, lift = n_ab·N / (n_a·n_b) emitted as
    exact BIGINT numerator/denominator plus ONE IEEE division — so
    the collocation scores hash-check bit-for-bit (ln is left to the
    caller; it isn't correctly-rounded across libms). The pair
    explosion is vocab-bounded per document and both shuffles are
    map-combinable — 100 TB of documents scales the pair ROWS, not
    the per-doc cost."""
    docs = read_table(spark, sf, "documents")
    return TX.term_cooccurrence(
        docs, "doc_id", "text", min_df=5, max_terms=200, min_pair_docs=3
    )


@_register(
    "text_pmi_window",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ',
                                           'g'), ' '),
               t -> t <> '' AND length(t) >= 3) AS ts
      FROM documents
    ), pos AS (
      SELECT doc_id, unnest(ts) AS term,
             unnest(range(1, len(ts) + 1)) AS p
      FROM toks
    ), pc AS (
      SELECT least(a.term, b.term) AS term_a,
             greatest(a.term, b.term) AS term_b,
             COUNT(*) AS n_ab
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.p - a.p BETWEEN 1 AND 4
      WHERE a.term <> b.term
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ), uni AS (SELECT term, COUNT(*) AS n FROM pos GROUP BY 1),
    tot AS (SELECT COUNT(*) AS t FROM pos)
    SELECT term_a, term_b, n_ab, ua.n AS n_a, ub.n AS n_b,
           n_ab * tot.t AS lift_num,
           4 * ua.n * ub.n AS lift_den,
           CAST(n_ab * tot.t AS DOUBLE)
             / CAST(4 * ua.n * ub.n AS DOUBLE) AS lift
    FROM pc
    JOIN uni ua ON pc.term_a = ua.term
    JOIN uni ub ON pc.term_b = ub.term, tot
    """,
)
def _text_pmi_window(spark: SparkSession, sf: str) -> DataFrame:
    """Positional co-occurrence (functions/text.cooccurrence_window):
    the skip-gram/GloVe counting pass — unordered pairs within 4
    tokens, exact-BIGINT lift with the window-slot normalizer. Pair
    generation stays inside the token array (transform/slice/flatten,
    ≤ window×tokens rows, map-side); the oracle replays it as a
    positional self-join and hash-matches every count and lift.
    Complements document-level text_pmi_pairs: collocations vs
    topical association."""
    docs = read_table(spark, sf, "documents")
    return TX.cooccurrence_window(
        docs, "doc_id", "text", window=4, min_count=5
    )


@_register("text_bpe_learn", _bpe_learn_sql(_BPE_N_MERGES))
def _text_bpe_learn(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer TRAINING on the corpus (operators/bpe.learn_bpe,
    Sennrich et al. 2016): 8 merge rounds over the word-frequency
    vocabulary. The vocab is one groupBy (Heap's-law bounded,
    distributed, never collected); each round is one pair-count
    aggregation + a ONE-ROW TakeOrdered collect whose winner becomes
    a literal in the next round's plan — n sequential jobs, the same
    honest lifecycle shape as the HLL index. Merge application is
    pinned to non-rescanning leftmost replace (bit-identical in both
    engines); ties break (freq DESC, pair ASC). The oracle unrolls
    all 8 rounds as CTEs and must reproduce every (rank, left, right,
    freq) — training is exactly reproducible."""
    docs = read_table(spark, sf, "documents")
    return BPE.learn_bpe(spark, docs, "text", _BPE_N_MERGES)


@_register("text_bpe_tokenize", _bpe_tokenize_sql(_BPE_N_MERGES, 30))
def _text_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end tokenization with the corpus-trained BPE
    (operators/bpe.apply_bpe): train 8 merges, then tokenize every
    document with the merge list folded into ONE JVM expression chain
    (per word: char symbols + 8 literal replaces — no UDF, no
    shuffle, a pure scan-stage map that composes with
    curation_pack_sequences). Output: top-30 token frequencies
    (deterministic count/lex ordering). The oracle re-trains AND
    re-tokenizes in SQL — tokenizer and tokenization both
    hash-checked."""
    docs = read_table(spark, sf, "documents")
    merges_df = BPE.learn_bpe(spark, docs, "text", _BPE_N_MERGES)
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    toks = BPE.apply_bpe(docs, "text", merges)
    return (
        toks.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(30)
    )


@_register("text_bpe_tokenize_large", _bpe_tokenize_sql(_BPE_N_MERGES, 30))
def _text_bpe_tokenize_large(spark: SparkSession, sf: str) -> DataFrame:
    """The PRODUCTION-vocab tokenize path (operators/bpe.
    apply_bpe_large, VERDICT r7 #6): same training, but the merge list
    travels as a broadcast variable into one Arrow-batched
    mapInPandas stage instead of a literal expression chain — the
    shape that holds a 32k-merge vocab, where the fold's expression
    tree would blow the plan. SAME oracle SQL as text_bpe_tokenize:
    the two apply paths are row-identical by contract (the
    non-rescanning leftmost replace is shared by Java and Python
    ``str.replace``), so this entry hash-checks that contract against
    DuckDB end-to-end, not just against apply_bpe in a unit test."""
    docs = read_table(spark, sf, "documents")
    merges_df = BPE.learn_bpe(spark, docs, "text", _BPE_N_MERGES)
    toks = BPE.apply_bpe_large(docs, "text", merges_df)
    return (
        toks.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(30)
    )


@_register(
    "text_homoglyph_fold",
    f"""
    WITH d AS (
        SELECT doc_id,
               concat(coalesce(substr(text, 1, 40), ''),
                      CASE ((doc_id % 3) + 3) % 3
                           WHEN 0 THEN '{_sq(_HG_INJECTIONS[0])}'
                           WHEN 1 THEN '{_sq(_HG_INJECTIONS[1])}'
                           ELSE '{_sq(_HG_INJECTIONS[2])}' END) AS attacked
        FROM documents
        WHERE doc_id IS NOT NULL AND ((doc_id % 20) + 20) % 20 = 11
    )
    SELECT doc_id,
           translate(translate(attacked, '{_sq(_HG_FROM)}', '{_sq(_HG_TO)}'),
                     '{_sq(_FW_FROM)}', '{_sq(_FW_TO)}') AS folded,
           CAST(length(attacked)
                - length(translate(attacked,
                                   '{_sq(_HG_FROM + _FW_FROM)}', ''))
                AS INT) AS n_confusables
    FROM d
    """,
)
def _text_homoglyph_fold(spark: SparkSession, sf: str) -> DataFrame:
    """Homoglyph/confusable folding (round 9 continuation — the
    poisoning-defense normalizer an LLM ingest pipeline runs FIRST):
    each document gets a deterministic confusable injection (Cyrillic
    'payment', Greek-salted 'ATM', fullwidth 'FREE DOWN') appended to
    its text prefix, then the pipeline folds Cyrillic/Greek ASCII
    lookalikes (one JVM-side ``translate`` over the curated TR39
    table — no UDF, no regex) and fullwidth forms (a second
    ``translate`` over U+FF01-FF5E), and counts the confusable code
    points (the poisoning signal). The oracle restates both translate
    chains with the IDENTICAL from/to tables — a single missing or
    misordered map entry hash-mismatches. Whole-stage-codegen'd
    end-to-end; no shuffle."""
    inj = F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(_HG_INJECTIONS[0])) \
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, F.lit(_HG_INJECTIONS[1])) \
        .otherwise(F.lit(_HG_INJECTIONS[2]))
    attacked = F.concat(
        F.coalesce(F.substring(F.col("text"), 1, 40), F.lit("")), inj
    )
    strip_all = F.translate(attacked, _HG_FROM + _FW_FROM, "")
    return (
        read_table(spark, sf, "documents")
        .filter(F.col("doc_id").isNotNull() & (F.pmod(F.col("doc_id"), F.lit(20)) == 11))
        .select(
            "doc_id",
            TX.fold_fullwidth(TX.fold_homoglyphs(attacked)).alias("folded"),
            (F.length(attacked) - F.length(strip_all)).cast("int").alias("n_confusables"),
        )
    )


def _text_lm_perplexity_sql() -> str:
    ctes, per_doc = _lm_backoff_parts()
    return f"""
    WITH {ctes}
    {per_doc}
    """


@_register("text_lm_perplexity", _text_lm_perplexity_sql())
def _text_lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style LM perplexity scoring (operators/lm.py, VERDICT
    r10 #8): a trigram stupid-backoff LM is trained on the corpus
    slice (doc_id % 5 != 0) in pure aggregations (unigram/bigram/
    trigram count tables, one scan) and every held-out shard document
    (doc_id % 5 == 0, the daily cadence split the incremental-LSH
    family uses) with >= 3 tokens is scored — bits/token = log2
    perplexity, lower = more fluent. The held-out split makes
    backoff REAL: unseen trigrams fall to the bigram level, unseen
    bigrams to unigram, unseen words to the 30-bit OOV floor (a
    self-trained LM would see every scored trigram at least once).
    Every per-position score is exact BIGINT fixed-point (num/den
    rational backoff -> << 30 fixed point -> quantized 256*log2 via
    bit-length + 8-bit mantissa), so the whole scoring pipeline
    hash-checks bit-for-bit; the only IEEE arithmetic is the final
    bits/token division, single-rounded identically in both engines
    (the text_pmi_pairs discipline). Backoff level counts
    (n_tri/n_bi/n_uni/n_oov) ride along — the LM-coverage diagnostic
    a curation run monitors."""
    docs = read_table(spark, sf, "documents")
    return LM.lm_score_stupid_backoff(
        docs.filter(F.col("doc_id") % 5 == 0),
        "doc_id",
        "text",
        train_docs=docs.filter(F.col("doc_id") % 5 != 0),
    ).select(
        F.col("id").alias("doc_id"),
        "n_scored", "n_tri", "n_bi", "n_uni", "n_oov", "qsum",
        "bits_per_token",
    )


def _text_lm_kn_sql() -> str:
    """ANSI twin of interpolated Kneser-Ney (operators/lm.
    lm_score_kneser_ney): continuation/type counts from the n-gram
    type tables, D=3/4 folded by multiplying each level through by 4,
    bottom-up fixed-point interpolation, every division gated on a
    positive denominator — all BIGINT-exact."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.lm import (
        FP_BITS,
        MANT,
    )

    fp = 1 << FP_BITS
    qexpr = (
        f"(length(bin(m)) - 1) * {MANT} "
        f"+ (m * {MANT}) // (CAST(1 AS BIGINT) << (length(bin(m)) - 1)) "
        f"- {MANT}"
    )
    tok_expr = (
        "list_filter(string_split(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', ' ', 'g'), ' '), t -> t <> '')"
    )
    return f"""
    WITH kntok_train AS (
      SELECT {tok_expr} AS ts FROM documents WHERE doc_id % 5 != 0
    ), kntok_score AS (
      SELECT doc_id, {tok_expr} AS ts FROM documents WHERE doc_id % 5 = 0
    ), knbi AS (
      SELECT w1, w, COUNT(*) AS cb FROM (
        SELECT ts[i-1] AS w1, ts[i] AS w
        FROM (SELECT ts, unnest(generate_series(2, len(ts))) AS i
              FROM kntok_train)
      ) GROUP BY 1, 2
    ), kntri AS (
      SELECT w2, w1, w, COUNT(*) AS ct FROM (
        SELECT ts[i-2] AS w2, ts[i-1] AS w1, ts[i] AS w
        FROM (SELECT ts, unnest(generate_series(3, len(ts))) AS i
              FROM kntok_train)
      ) GROUP BY 1, 2, 3
    ), knn1pw AS (
      SELECT w, COUNT(*) AS n1p FROM knbi GROUP BY 1
    ), knnbb AS (SELECT COUNT(*) AS nbb FROM knbi),
    kncc AS (
      SELECT w1, w, COUNT(*) AS cc FROM kntri GROUP BY 1, 2
    ), knmid AS (
      SELECT w1, SUM(cc) AS ctxm, COUNT(*) AS m1 FROM kncc GROUP BY 1
    ), knctx3 AS (
      SELECT g.w2, g.w1, g.n1p_ctx, b.cb AS c2ctx
      FROM (SELECT w2, w1, COUNT(*) AS n1p_ctx FROM kntri GROUP BY 1, 2) g
      JOIN knbi b ON b.w1 = g.w2 AND b.w = g.w1
    ), knpos AS (
      SELECT doc_id, ts[i-2] AS w2, ts[i-1] AS w1, ts[i] AS w
      FROM (SELECT doc_id, ts,
                   unnest(generate_series(3, len(ts))) AS i FROM kntok_score)
    ), kns1 AS (
      SELECT p.doc_id, t.ct, x.c2ctx, x.n1p_ctx, c.cc, m.ctxm, m.m1,
             u.n1p, knnbb.nbb
      FROM knpos p
      LEFT JOIN kntri t ON t.w2 = p.w2 AND t.w1 = p.w1 AND t.w = p.w
      LEFT JOIN knctx3 x ON x.w2 = p.w2 AND x.w1 = p.w1
      LEFT JOIN kncc c ON c.w1 = p.w1 AND c.w = p.w
      LEFT JOIN knmid m ON m.w1 = p.w1
      LEFT JOIN knn1pw u ON u.w = p.w
      CROSS JOIN knnbb
    ), kns2 AS (
      SELECT *, CASE WHEN n1p IS NOT NULL AND nbb > 0
                     THEN greatest((n1p * {fp}) // nbb, 1) END AS m_uni
      FROM kns1
    ), kns3 AS (
      SELECT *, CASE WHEN ctxm IS NOT NULL AND ctxm > 0 THEN greatest(
                  (greatest(4 * COALESCE(cc, 0) - 3, 0) * {fp})
                    // (4 * ctxm)
                  + (3 * m1 * COALESCE(m_uni, 1)) // (4 * ctxm), 1)
                ELSE m_uni END AS m_bi
      FROM kns2
    ), knsc AS (
      SELECT doc_id,
             CASE WHEN c2ctx IS NOT NULL AND c2ctx > 0 THEN greatest(
               (greatest(4 * COALESCE(ct, 0) - 3, 0) * {fp})
                 // (4 * c2ctx)
               + (3 * n1p_ctx * COALESCE(m_bi, 1)) // (4 * c2ctx), 1)
             ELSE COALESCE(m_bi, 1) END AS m,
             CASE WHEN ct IS NOT NULL THEN 3
                  WHEN cc IS NOT NULL THEN 2
                  WHEN n1p IS NOT NULL THEN 1 ELSE 0 END AS level
      FROM kns3
    ), knq AS (
      SELECT doc_id, level, {qexpr} AS q FROM knsc
    )
    SELECT doc_id,
           COUNT(*) AS n_scored,
           CAST(SUM(CASE WHEN level = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
           CAST(SUM(CASE WHEN level = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
           CAST(SUM(CASE WHEN level = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
           CAST(SUM(CASE WHEN level = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(q) AS BIGINT) AS qsum,
           {FP_BITS}.0 - CAST(SUM(q) AS DOUBLE)
                         / ({MANT}.0 * COUNT(*)) AS bits_per_token
    FROM knq GROUP BY doc_id
    """


@_register("text_lm_kneser_ney", _text_lm_kn_sql())
def _text_lm_kneser_ney(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram perplexity (operators/lm.
    lm_score_kneser_ney — Kneser & Ney 1995, Chen & Goodman 1998),
    the smoothed sibling of text_lm_perplexity's stupid backoff on
    the same train/score split: continuation-type counts, absolute
    discount 3/4 folded into exact rationals, bottom-up fixed-point
    interpolation. Unlike backoff, an UNSEEN trigram in a SEEN
    context still earns the context's interpolation mass — the
    statistically better score — and the whole chain stays
    BIGINT-exact, so it hash-checks like every other entry. The
    level diagnostics report the deepest n-gram table that knew the
    position (3/2/1/0)."""
    docs = read_table(spark, sf, "documents")
    return LM.lm_score_kneser_ney(
        docs.filter(F.col("doc_id") % 5 == 0),
        "doc_id",
        "text",
        train_docs=docs.filter(F.col("doc_id") % 5 != 0),
    ).select(
        F.col("id").alias("doc_id"),
        "n_scored", "n_tri", "n_bi", "n_uni", "n_oov", "qsum",
        "bits_per_token",
    )


# --- persisted / incremental LM index (VERDICT r11 #4) ----------------------

_LM_TOK_SQL = (
    "list_filter(string_split(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', ' ', 'g'), ' '), t -> t <> '')"
)


def _lm_trigram_counts_sql(train_pred: str) -> str:
    """ANSI restatement of the persisted trigram count table over a
    training predicate — the oracle retrains FROM SCRATCH, so hashing
    it against the index read back from parquet pins both the build
    write path and (for the append entry) incremental == full."""
    return f"""
    SELECT w2, w1, w, COUNT(*) AS ct FROM (
      SELECT ts[i-2] AS w2, ts[i-1] AS w1, ts[i] AS w
      FROM (SELECT ts, unnest(generate_series(3, len(ts))) AS i
            FROM (SELECT {_LM_TOK_SQL} AS ts FROM documents
                  WHERE {train_pred}))
    ) GROUP BY 1, 2, 3
    """


def _lm_build_path(sf: str) -> str:
    # fingerprinted per-user cache paths (round-12): dataset regen
    # under the same sf name yields a new path — no stale index reuse
    return _dataset_cache_path("lm_index_build_v1", sf)


def _lm_inc_path(sf: str) -> str:
    return _dataset_cache_path("lm_index_inc_v1", sf)


_LM_INC_TAG = "corpus12_plus_shard34"


def _lm_inc_bootstrap(spark: SparkSession, sf: str) -> str:
    """Deterministic incremental-index state for the probe entries:
    build on the doc_id%5 ∈ {1,2} corpus half, APPEND the {3,4}
    shard — leaving counts exactly equal to training on
    doc_id%5 != 0 (counts are additive). A completion tag lands in
    meta LAST, so the score entry can trust a tagged index and a
    crash mid-bootstrap reads as "not bootstrapped" rather than as
    partial counts."""
    docs = read_table(spark, sf, "documents")
    path = _lm_inc_path(sf)
    LM.lm_index_build(
        docs.filter((F.col("doc_id") % 5).isin(1, 2)),
        path,
        mode="overwrite",
    )
    LM.lm_index_append(
        docs.filter((F.col("doc_id") % 5).isin(3, 4)), path
    )
    meta = LM.read_lm_meta(spark, path) or {}
    meta["state"] = _LM_INC_TAG
    LM._write_lm_meta(spark, path, meta)
    return path


@_register(
    "text_lm_index_build",
    _lm_trigram_counts_sql("doc_id % 5 IN (1, 2)"),
)
def _text_lm_index_build(spark: SparkSession, sf: str) -> DataFrame:
    """BUILD leg of the persisted LM lifecycle (operators/lm.
    lm_index_build, VERDICT r11 #4): the trigram/bigram/unigram count
    tables — the LM's ENTIRE trained state — are written to parquet
    once and returned READ BACK from the files; the oracle retrains
    the trigram table from scratch in ANSI SQL, so a torn write, a
    tokenizer drift, or a count error fails the hash, not just the
    row count. Mirrors the LSH/IVF/pHash index discipline (VERDICT
    r11 "missing" #3 closed): at daily cadence over 100 TB the corpus
    is never re-scanned to score a shard — counts persist, shards
    append, scoring reads three count tables."""
    docs = read_table(spark, sf, "documents")
    path = _lm_build_path(sf)
    LM.lm_index_build(
        docs.filter(
            (F.col("doc_id") % 5 == 1) | (F.col("doc_id") % 5 == 2)
        ),
        path,
        mode="overwrite",
    )
    return spark.read.parquet(f"{path}/trigrams").select(
        "w2", "w1", "w", "ct"
    )


@_register(
    "text_lm_index_append",
    _lm_trigram_counts_sql("doc_id % 5 != 0"),
)
def _text_lm_index_append(spark: SparkSession, sf: str) -> DataFrame:
    """APPEND leg (operators/lm.lm_index_append): a fresh build on
    the doc_id%5 ∈ {1,2} corpus half, then the {3,4} shard's counts
    are FOLDED IN by per-key summation (atomic table swaps; trigram →
    bigram → unigram, meta untouched) — never a corpus retrain. The
    returned frame is the merged trigram table read back from
    parquet; the oracle retrains on the UNION (doc_id%5 != 0) from
    scratch, so this entry hash-pins incremental == full for the LM
    exactly the way dedup_incremental_lsh pins it for LSH. The
    entry re-bootstraps build+append each call, so it is idempotent
    even though a bare re-append of the same shard would double
    counts (documented in lm_index_append)."""
    path = _lm_inc_bootstrap(spark, sf)
    return spark.read.parquet(f"{path}/trigrams").select(
        "w2", "w1", "w", "ct"
    )


def _lm_index_score_sql() -> str:
    ctes, per_doc = _lm_backoff_parts()
    return f"""
    WITH {ctes}
    {per_doc}
    """


@_register("text_lm_index_score", _lm_index_score_sql())
def _text_lm_index_score(spark: SparkSession, sf: str) -> DataFrame:
    """SCORE-FROM-INDEX leg (operators/lm.lm_index_score): the
    held-out doc_id%5 == 0 shard is scored against the PERSISTED
    count tables — three parquet scans + three hash joins + one
    per-doc groupBy, no training scan anywhere in the plan. The
    index state is build({1,2}) ⊕ append({3,4}) ≡ train on
    doc_id%5 != 0, so this entry shares text_lm_perplexity's EXACT
    oracle: the daily read path must reproduce the in-plan trained
    scores bit-for-bit (same _score_backoff_from_counts arithmetic,
    same quantized-log2 fixed point). A missing or untagged index
    (crash mid-bootstrap) rebuilds deterministically; a tagged one is
    probed read-only — the daily marginal cost."""
    docs = read_table(spark, sf, "documents")
    path = _lm_inc_path(sf)
    meta = LM.read_lm_meta(spark, path)
    if meta is None or meta.get("state") != _LM_INC_TAG:
        _lm_inc_bootstrap(spark, sf)
    return LM.lm_index_score(
        docs.filter(F.col("doc_id") % 5 == 0), path, "doc_id", "text"
    ).select(
        F.col("id").alias("doc_id"),
        "n_scored", "n_tri", "n_bi", "n_uni", "n_oov", "qsum",
        "bits_per_token",
    )
