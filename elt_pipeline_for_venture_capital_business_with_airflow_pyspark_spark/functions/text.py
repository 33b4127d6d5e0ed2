"""Text-analysis expression builders for the documents table.

These are the training-data-pipeline scalar ops (BASELINE.json north
star): token counting, quality scoring, language-ID heuristic,
document fingerprinting, shingling for dedup. All pure Column
expressions (JVM-side, codegen) — at 100 TB these run inside the scan
stage with zero shuffle and zero Python.

Every builder has an ANSI-SQL twin in ``__spark_entry__.oracle_sql``
so the DuckDB oracle verifies semantics bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_token_count",
    "punct_count",
    "stopword_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "shingles",
    "pii_scrub",
    "pii_email_count",
    "pii_phone_count",
    "repetition_fraction",
    "chunk_windows",
    "url_normalize",
    "url_host",
    "term_cooccurrence",
    "cooccurrence_window",
    "TRACKING_PARAM_PREFIXES",
    "STOPWORDS",
    "LANG_MARKERS",
]

# Small English stopword list — enough for ratio features; the point is
# the operator shape (multiset membership over tokens), not lexicography.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)

# Marker words per language for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible: predicted language =
# argmax of marker hits, ties broken by language code order, no hits → 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "is", "of", "to", "in", "it"),
    "es": ("el", "la", "los", "las", "es", "y", "un", "una"),
    "fr": ("le", "la", "les", "est", "et", "un", "une", "dans"),
}


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization → array<string>; empty/blank text → []."""
    c = F.trim(_col(col))
    return F.when(c == "", F.array().cast("array<string>")).otherwise(F.split(c, r"\s+"))


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol. Same regex class semantics in Java regex (Spark) and RE2
# (DuckDB) — deliberately ASCII-explicit, no \w/\p classes.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


def bpe_token_count(col: str | Column) -> Column:
    """Counts BPE-style pre-tokens (letter runs / digit runs / symbols) —
    a cheap proxy for LLM token counts that needs no vocab file."""
    return F.regexp_count(_col(col), F.lit(BPE_PATTERN))


def punct_count(col: str | Column) -> Column:
    return F.regexp_count(_col(col), F.lit("[^A-Za-z0-9 \\t\\n]"))


def stopword_count(col: str | Column) -> Column:
    """Multiset count of stopword occurrences among whitespace tokens."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def quality_score(col: str | Column) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs and
    a sane stopword share, penalizes punctuation soup.

    score = 0.4*min(1, n_tokens/100) + 0.3*min(1, 5*stopword_ratio)
          + 0.3*(1 - min(1, 4*punct_ratio)), 0 for empty docs.
    Pure double arithmetic → deterministic across engines.
    """
    c = _col(col)
    n_tok = token_count(c).cast("double")
    n_char = F.length(c).cast("double")
    sw_ratio = F.when(n_tok > 0, stopword_count(c) / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_char > 0, punct_count(c) / n_char).otherwise(F.lit(0.0))
    score = (
        F.least(F.lit(1.0), n_tok / F.lit(100.0)) * F.lit(0.4)
        + F.least(F.lit(1.0), sw_ratio * F.lit(5.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(4.0))) * F.lit(0.3)
    )
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(score)


def lang_id(col: str | Column) -> Column:
    """Marker-word language ID: argmax over LANG_MARKERS hit counts,
    ties → first language in code order, zero hits → 'und'."""
    toks = tokens(col)
    scores = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        scores.append(
            (code, F.size(F.filter(toks, lambda t: F.array_contains(markers, t))))
        )
    best = F.lit("und")
    best_score = F.lit(0)
    # forward iteration + strict > : earlier codes win ties, and a
    # zero-hit language can never displace 'und' (best_score starts 0).
    for code, score in scores:
        is_better = score > best_score
        best = F.when(is_better, F.lit(code)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best


def fingerprint(col: str | Column) -> Column:
    """Normalization-invariant document fingerprint: md5 of the text
    lowercased with all non-alphanumerics removed. md5 exists in both
    Spark and DuckDB → oracle-checkable (unlike xxhash64)."""
    normalized = F.regexp_replace(F.lower(_col(col)), "[^a-z0-9]", "")
    return F.md5(normalized)


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    polynomial rolling hash over character k-grams of the normalized
    text, then the min hash of each sliding window of ``window``
    consecutive grams — the classic plagiarism/copy-detection
    fingerprint set. Guarantees any match of length ≥ k+window-1
    shares a fingerprint.

    The hash is an explicit k-term polynomial (Σ ascii(c_j)·31^j) so
    the exact same values are computable in ANSI SQL — the oracle
    checks these bit-for-bit, unlike the seeded-xxhash dedup family.
    DataFrame-level (not a Column builder): the normalized text and
    gram-hash array materialize once per row as real columns instead
    of re-evaluating inside every lambda.

    Output: (id, fingerprints array<int>, sorted distinct);
    docs shorter than k chars → empty array.
    """
    # null text normalizes to '' -> the documented empty-fingerprint
    # case, instead of null-poisoning the gram lambdas (greatest(NULL,1)
    # silently yields a [null] gram array)
    norm = F.coalesce(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""), F.lit("")
    )
    d1 = df.select(F.col(id_col).alias("id"), norm.alias("__s"))
    L = F.length(F.col("__s"))
    n_grams = L - (k - 1)
    # per-char ascii codes materialized ONCE per row: the former
    # substr(i,1)-per-gram form rescans the string from byte 0 on every
    # call (UTF8String.substring is O(position)), making gram hashing
    # O(len^2) per doc — measured 5x slower than this O(len) array walk
    # at sf0.1. F.get (0-based) returns NULL past-the-end instead of
    # raising under ANSI, preserving the <k-char guard semantics below.
    codes = F.transform(F.split(F.col("__s"), ""), F.ascii)
    d1 = d1.select("id", "__s", codes.alias("__a"))
    a = F.col("__a")
    gram_hash = lambda i: sum(  # noqa: E731
        (F.get(a, i + j - 1) * (31 ** j) for j in range(1, k)),
        start=F.get(a, i - 1),
    )
    d2 = d1.select(
        "id",
        "__s",
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))), gram_hash
        ).alias("__h"),
    )
    n_wins = F.size(F.col("__h")) - (window - 1)
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(n_wins, F.lit(1))),
        lambda i: F.array_min(F.slice(F.col("__h"), i, window)),
    )
    return d2.select(
        "id",
        F.when(F.length("__s") < k, F.array().cast("array<int>"))
        .otherwise(F.array_sort(F.array_distinct(wins)))
        .alias("fingerprints"),
    )


def shingle_stream(df, id_col: str = "doc_id", text_col: str = "text", n: int = 3):
    """Distinct (id, shingle) rows — the high-throughput shingle path.

    Word n-grams are extracted with ONE regex pass using overlapping
    zero-width matches (``(?:^|(?<= ))(?=(\\S+( \\S+){n-1}))``) over
    whitespace-normalized text — ~7× faster than building the shingle
    array with higher-order slice/concat lambdas, and linear in text
    length. Docs with 1..n-1 tokens contribute their whole text as a
    single shingle (same semantics as :func:`shingles`). Distinctness
    via dropDuplicates (the downstream groupBy shuffles on id anyway).
    """
    from pyspark.sql import functions as F  # local alias for clarity

    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=(\S+(?: \S+){" + str(n - 1) + r"}))"
    long_sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("shingle"),
    )
    ntok = token_count(text_col)
    short_sh = df.filter((ntok >= 1) & (ntok < n)).select(
        F.col(id_col).alias("id"), norm.alias("shingle")
    )
    return long_sh.unionByName(short_sh).dropDuplicates(["id", "shingle"])


def shingles_fast(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles → array<string>, extracted with
    the one-pass overlapping regex of :func:`shingle_stream` but kept
    row-local (no explode). Same semantics as :func:`shingles`:
    short 1..n-1-token docs yield their whole text as one shingle,
    empty docs yield []."""
    c = _col(col)
    norm = F.regexp_replace(F.trim(c), r"\s+", " ")
    pat = r"(?:^|(?<= ))(?=(\S+(?: \S+){" + str(n - 1) + r"}))"
    ntok = token_count(c)
    return (
        F.when(ntok == 0, F.array().cast("array<string>"))
        .when(ntok < n, F.array(norm))
        .otherwise(F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1)))
    )


def shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles → array<string>. Docs shorter than
    n tokens yield a single shingle of the whole doc so they still
    participate in dedup. NULL text → NULL (standard SQL propagation):
    without the explicit guard, Spark's null-SKIPPING ``greatest``
    turns the NULL size into ``greatest(NULL, 1) = 1`` and the
    NULL-sliced ``concat_ws`` into ``""`` — i.e. every NULL doc grows
    a phantom empty-string shingle that cross-matches every other
    NULL doc (caught by the null-heavy sweep on text_decontaminate)."""
    toks = tokens(col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))
        .when(k == 0, F.array().cast("array<string>"))
        .otherwise(grams)
    )


def char_gram_hashes(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    carry: tuple[str, ...] = (),
):
    """(id, h) rows: polynomial hashes of the character k-grams of the
    alnum-normalized text (Σ ascii(c_j)·31^j, same convention as
    :func:`winnow_fingerprints`) — the SQL-replicable twin of the
    xxhash shingle path, so downstream MinHash stays oracle-checkable
    bit-for-bit. Docs shorter than k chars are dropped (no grams).
    ``carry`` names extra columns passed through unchanged (so callers
    that need a per-doc flag next to every gram — e.g. DSIR's
    target-membership bit — avoid a doc-keyed re-join later).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    # per-char ascii codes materialized ONCE per row (same O(len^2) →
    # O(len) fix as winnow_fingerprints: substr(i,1) rescans from byte
    # 0 per gram; the array walk is ~5x faster measured at sf0.1).
    # The length filter guarantees every F.get index is in range.
    d = df.select(
        F.col(id_col).alias("id"), *carry, norm.alias("__s")
    ).filter(F.length("__s") >= k)
    d = d.select(
        "id", *carry, F.transform(F.split(F.col("__s"), ""), F.ascii).alias("__a")
    )
    a = F.col("__a")
    gram = lambda i: sum(  # noqa: E731
        (F.get(a, i + j - 1) * (31 ** j) for j in range(1, k)),
        start=F.get(a, i - 1),
    )
    return d.select(
        "id",
        *carry,
        F.explode(
            F.transform(F.sequence(F.lit(1), F.size("__a") - (k - 1)), gram)
        ).alias("h"),
    )


# PII patterns — ASCII-explicit (no \d/\w/\p classes) so Java regex
# (Spark) and RE2 (DuckDB) agree character-for-character. Deliberately
# high-recall simple shapes: email local@domain.tld and NNN-NNN-NNNN
# phone forms; a production run would swap in a vetted pattern pack,
# the operator shape (regexp scrub + count in one projection) is the
# point here.
PII_EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE_PATTERN = "[+]?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def pii_email_count(col: str | Column) -> Column:
    return F.regexp_count(_col(col), F.lit(PII_EMAIL_PATTERN))


def pii_phone_count(col: str | Column) -> Column:
    return F.regexp_count(_col(col), F.lit(PII_PHONE_PATTERN))


def pii_scrub(
    col: str | Column,
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> Column:
    """Redact emails then phone numbers — the pre-training scrub every
    large text pipeline applies before tokenization. Pure expression:
    two regexp_replace passes inside one projection, no shuffle, scales
    with the scan."""
    c = F.regexp_replace(_col(col), PII_EMAIL_PATTERN, email_token)
    return F.regexp_replace(c, PII_PHONE_PATTERN, phone_token)


def chunk_windows(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 20,
    stride: int = 10,
):
    """Split each document into overlapping fixed-size token windows —
    the standard pre-training / RAG chunking step (context-window
    packing wants ≤N-token pieces; retrieval wants overlap so no
    boundary sentence is lost).

    Chunks start at every ``stride``-th token position below the token
    count; each takes up to ``size`` tokens, so the final chunk may be
    short. Output: ``(id, chunk_id, chunk_start, n_chunk_tokens,
    chunk_text)``, one row per chunk.

    Scale shape: tokenization + start-position generation + slicing is
    ONE generator-explode projection — zero shuffles, row amplification
    bounded by ``ceil(tokens/stride)``, and the explode streams (never
    materializes a doc's full chunk list). Runs at scan speed on 100 TB.
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        F.explode(starts).alias("chunk_start"),
    ).filter((F.col("chunk_start") == 0) | (F.col("chunk_start") < F.col("_n")))
    piece = F.slice(F.col("_toks"), F.col("chunk_start") + 1, size)
    return exploded.select(
        F.col(id_col),
        (F.col("chunk_start") / stride).cast("int").alias("chunk_id"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def repetition_fraction(col: str | Column, n: int = 3) -> Column:
    """Duplicate word-n-gram fraction, ``1 - distinct/total`` over the
    doc's overlapping n-grams — the Gopher-style repetition quality
    signal (highly repetitive docs are low-value training data). Docs
    with fewer than ``n`` tokens score 0.0. Row-local expression —
    no explode, no shuffle."""
    toks = tokens(col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    frac = F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams).cast(
        "double"
    )
    return F.when(k < n, F.lit(0.0)).otherwise(frac)


def gopher_rules(col: str | Column) -> Column:
    """Gopher-style per-rule quality gate (Rae et al. 2021 §A1.1
    heuristics, integer-exact re-statement): a STRUCT of boolean
    rule flags plus the conjunction, so a curation pipeline can both
    filter on `pass_gopher` and report WHICH rule rejected each doc
    (the composite `quality_score` can't attribute failures).

    Rules (all ratio thresholds cleared to integer cross-products —
    no float division, so any engine agrees bit-for-bit):
      r_wordcount   50 <= n_words <= 100_000
      r_meanwordlen 3 <= word_chars/n_words <= 10
                    (as 3*n_words <= word_chars <= 10*n_words)
      r_alphawords  >= 80% of words contain a letter
                    (as 5*n_alpha >= 4*n_words)
      r_stopwords   >= 2 stopword occurrences
      r_symbolratio punct chars / n_words < 0.1
                    (as 10*n_punct < n_words)
    Empty docs fail every rule. Row-local expression — no shuffle."""
    c = _col(col)
    toks = tokens(c)
    n_words = F.size(toks).cast("long")
    word_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    n_sw = stopword_count(c).cast("long")
    n_punct = punct_count(c).cast("long")
    r_wc = (n_words >= 50) & (n_words <= 100_000)
    r_mwl = (n_words > 0) & (3 * n_words <= word_chars) & (word_chars <= 10 * n_words)
    r_alpha = (n_words > 0) & (5 * n_alpha >= 4 * n_words)
    r_sw = n_sw >= 2
    r_sym = 10 * n_punct < n_words
    return F.struct(
        n_words.alias("n_words"),
        r_wc.alias("r_wordcount"),
        r_mwl.alias("r_meanwordlen"),
        r_alpha.alias("r_alphawords"),
        r_sw.alias("r_stopwords"),
        r_sym.alias("r_symbolratio"),
        (r_wc & r_mwl & r_alpha & r_sw & r_sym).alias("pass_gopher"),
    )


# Query-string parameters dropped by url_normalize: click/campaign
# trackers that vary per fetch without changing the resource — the
# reason one page crawls as millions of "distinct" URLs. Prefix match
# ('utm_' covers utm_source/medium/campaign/...; the others are
# 'key=' prefixes, i.e. exact parameter names).
TRACKING_PARAM_PREFIXES: tuple[str, ...] = (
    "utm_", "gclid=", "fbclid=", "msclkid=", "ref=",
)

_URL_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)"
_URL_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)"


def url_host(col: str | Column) -> Column:
    """Lowercased host of a URL, default port stripped (``:443`` for
    https, ``:80`` for http) — the grouping key for per-site corpus
    stats. Malformed URLs (no ``scheme://``) yield ``''``."""
    u = F.regexp_replace(_col(col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_AUTH_RE, 1))
    return (
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .otherwise(auth)
    )


def domain_suffix_chain(col: str | Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    ``www.a.example.com`` → ``[www.a.example.com, a.example.com,
    example.com, com]``. Bounded by the label count (hosts have ≤ ~10
    labels), so exploding it fans out by a small constant — the
    standard trick that turns "is this host OR ANY PARENT DOMAIN
    blocked?" into a plain equi-join. Empty host → []."""
    h = _col(col)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    chain = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    return F.when(h == "", F.array().cast("array<string>")).otherwise(chain)


def is_host_blocked(col: str | Column, blocklist: list[str]) -> Column:
    """Expression-only membership test: true when the host or any
    parent domain is in ``blocklist`` (a LITERAL list — right for
    small lists that fit a plan constant; for production 100k-entry
    blocklists use :func:`operators.sampling`-style broadcast joins
    on the exploded chain instead, see the curation_blocklist_filter
    registry entry). Runs inside the scan stage, zero shuffle."""
    lit = F.array(*[F.lit(b) for b in blocklist])
    return F.arrays_overlap(domain_suffix_chain(col), lit)


def url_normalize(col: str | Column) -> Column:
    """Canonical URL for web-corpus dedup — the standard pre-pass
    before exact/fuzzy dedup of crawled pages (one page otherwise
    appears as millions of distinct URLs differing only in tracking
    noise). Pure Column expressions, zero Python:

    - scheme and host lowercased; default port stripped;
    - fragment dropped (client-side only, never reaches the server);
    - tracking parameters dropped (:data:`TRACKING_PARAM_PREFIXES`);
    - surviving query parameters sorted (param order is
      server-insignificant in practice and crawler-dependent);
    - empty path → ``/``.

    Out of scope (documented, not silently wrong): userinfo@host,
    percent-encoding case, IDN — inputs are assumed pre-ASCII'd by
    the fetcher. The ANSI-SQL twin (``text_url_canonicalize``) mirrors
    every step with DuckDB list functions, including the empty-list
    ``array_to_string`` guard."""
    u = F.regexp_replace(_col(col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_SCHEME_RE, 1))
    host = url_host(col)
    path = F.regexp_extract(u, _URL_PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.split(F.regexp_extract(u, r"\?(.*)$", 1), "&")

    def _keep(p: Column) -> Column:
        dropped = p == ""
        for pref in TRACKING_PARAM_PREFIXES:
            dropped = dropped | p.startswith(pref)
        return ~dropped

    kept = F.sort_array(F.filter(params, _keep))
    base = F.concat(scheme, F.lit("://"), host, path)
    return F.when(F.size(kept) == 0, base).otherwise(
        F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    )


def term_cooccurrence(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_df: int = 5,
    max_terms: int = 200,
    min_pair_docs: int = 3,
):
    """Document-level term co-occurrence with an exact-arithmetic PMI
    ordering — the corpus-statistics pass behind collocation mining,
    taxonomy seeding, and embedding-evaluation word pairs ("which
    terms travel together?"), which none of the per-document text ops
    above can answer.

    Pipeline (all JVM-side):
    1. distinct (doc, term) presence from the corpus tokenizer
       (lowercase, non-alnum → space, len ≥ 3) — presence, not counts,
       so PMI is over document probabilities (the standard corpus
       formulation);
    2. vocabulary = terms in ≥ ``min_df`` docs, top ``max_terms`` by
       (doc-freq, term) — a BOUNDED vocab that is broadcast back onto
       the presence stream, capping the pair explosion at
       C(vocab∩doc, 2) per document;
    3. pairs via self-join on the doc id with ``term_a < term_b``
       (canonical orientation — each pair counted once), one
       map-combinable groupBy;
    4. lift = P(a,b) / (P(a)·P(b)) computed as the EXACT integer cross
       product ``n_ab·N / (n_a·n_b)`` — numerator and denominator are
       emitted as BIGINTs and the ratio is ONE IEEE division, so the
       DuckDB oracle hash-matches bit-for-bit; PMI = ln(lift) is left
       to the caller because ln is not correctly-rounded across libms.

    Scale: the presence `distinct` and the pair groupBy are the two
    shuffles; pair keys are near-unique (no skew). The quadratic term
    is per-document and vocab-bounded — 100 TB of documents changes
    the number of pair rows linearly, not the per-doc cost. Returns
    (term_a, term_b, n_ab, n_a, n_b, lift_num, lift_den, lift).
    """
    if min_df < 1 or max_terms < 2 or min_pair_docs < 1:
        raise ValueError("min_df/min_pair_docs >= 1 and max_terms >= 2")
    presence = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(
                F.split(
                    F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
                    " ",
                )
            ).alias("term"),
        )
        .filter((F.col("term") != "") & (F.length("term") >= 3))
        .distinct()
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    vocab = (
        presence.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .filter(F.col("df_t") >= min_df)
        .orderBy(F.col("df_t").desc(), "term")
        .limit(max_terms)
    )
    hits = presence.join(F.broadcast(vocab), "term")
    # pair generation INSIDE the per-doc array (sorted struct list →
    # i<j combinations via transform/slice/flatten) — one groupBy on
    # the doc id instead of a doc-keyed self-join, saving the join's
    # two sort-merge exchanges; the array is vocab-bounded (≤ max_terms)
    ts = F.sort_array(F.collect_list(F.struct("term", "df_t")))
    per_doc = hits.groupBy("__doc").agg(ts.alias("__ts"))
    arr = F.col("__ts")
    combos = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(
                    x["term"].alias("term_a"),
                    y["term"].alias("term_b"),
                    x["df_t"].alias("n_a"),
                    y["df_t"].alias("n_b"),
                ),
            ),
        )
    )
    pairs = (
        per_doc.select(F.explode(combos).alias("__p"))
        .select("__p.term_a", "__p.term_b", "__p.n_a", "__p.n_b")
        .groupBy("term_a", "term_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_docs)
    )
    num = F.col("n_ab") * F.col("__nd")
    den = F.col("n_a") * F.col("n_b")
    return (
        pairs.crossJoin(F.broadcast(n_docs.select(F.col("n_docs").alias("__nd"))))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "n_a",
            "n_b",
            num.alias("lift_num"),
            den.alias("lift_den"),
            (num.cast("double") / den.cast("double")).alias("lift"),
        )
    )


def cooccurrence_window(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    window: int = 4,
    min_count: int = 5,
):
    """POSITIONAL co-occurrence (the skip-gram / GloVe counting pass):
    unordered term pairs within ``window`` tokens of each other, with
    exact-ratio lift — the collocation statistic
    :func:`term_cooccurrence` (document-level presence) deliberately
    is not. "venture capital" scores here; two terms that merely share
    long documents do not.

    Pair generation never leaves the token array: for token position
    i, partners are positions i+1 … i+window via transform/slice
    inside one projection (row growth ≤ window×tokens — linear,
    map-side), canonicalized least/greatest so each unordered pair
    counts once per occurrence. Unigram totals come from one explode.
    Two map-combinable groupBys + two count-table joins; nothing
    quadratic anywhere. lift = n_ab·T / (window·n_a·n_b) with
    T = total tokens, all exact BIGINTs, one IEEE division (the
    window factor normalizes the pair-slot count so lift ≈ 1 means
    independence, same calibration as the document-level form).

    Returns (term_a, term_b, n_ab, n_a, n_b, lift_num, lift_den,
    lift) for pairs with n_ab ≥ ``min_count``."""
    if window < 1 or min_count < 1:
        raise ValueError("window and min_count must be >= 1")
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "), " "
        ),
        lambda t: (t != "") & (F.length(t) >= 3),
    )
    base = df.select(F.col(id_col).alias("__doc"), toks.alias("__ts"))
    arr = F.col("__ts")
    pairs_arr = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(
                    arr,
                    i + F.lit(2),
                    F.least(F.lit(window), F.size(arr) - i - 1),
                ),
                lambda y: F.struct(
                    F.least(x, y).alias("term_a"),
                    F.greatest(x, y).alias("term_b"),
                ),
            ),
        )
    )
    pair_counts = (
        base.select(F.explode(pairs_arr).alias("__p"))
        .select("__p.term_a", "__p.term_b")
        .filter(F.col("term_a") != F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    uni = (
        base.select(F.explode(arr).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = base.select(F.sum(F.size(arr)).alias("__t"))
    num = F.col("n_ab") * F.col("__t")
    den = F.lit(int(window)) * F.col("n_a") * F.col("n_b")
    return (
        pair_counts.join(
            uni.select(F.col("term").alias("term_a"), F.col("n").alias("n_a")),
            "term_a",
        )
        .join(
            uni.select(F.col("term").alias("term_b"), F.col("n").alias("n_b")),
            "term_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "term_a", "term_b", "n_ab", "n_a", "n_b",
            num.alias("lift_num"),
            den.alias("lift_den"),
            (num.cast("double") / den.cast("double")).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Homoglyph / confusable folding — round 9 continuation.
#
# Adversarial text in web corpora substitutes visually-identical
# non-Latin code points (Cyrillic а е о, Greek ο ν, fullwidth forms)
# for ASCII — it defeats exact/blocked dedup, keyword filters, and
# benchmark decontamination while reading identically to a human.
# Folding is one JVM-side ``translate`` (a per-codepoint map lookup
# inside whole-stage codegen — no UDF, no regex backtracking), so it
# belongs at the very front of any text pipeline at 100 TB.
#
# The map covers the high-frequency Unicode-confusables entries for
# ASCII letters/digits (Cyrillic + Greek lookalikes, fullwidth forms
# are handled by the companion fullwidth fold) — deliberately a small
# curated table, not the full Unicode confusables.txt: folding rare
# confusables costs nothing here, but over-folding (e.g. all of
# Cherokee) corrupts legitimate non-Latin text. Source: Unicode TR39
# confusables, ASCII targets only.

_HOMOGLYPH_FROM = (
    "аеорсухіј"  # а е о р с у х і ј
    "АВЕКМНОРСТХ"  # АВЕКМНОРСТХ
    "ονια"  # ο ν ι α (Greek lower; ν → 'v' per TR39, not 'n')
    "ΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"  # ΑΒΕΖΗΙΚΜΝΟΡΤΥΧ
    "ЅѕІЈ"  # Ѕ ѕ І Ј
)
_HOMOGLYPH_TO = (
    "aeopcyxij"
    "ABEKMHOPCTX"
    "ovia"
    "ABEZHIKMNOPTYX"
    "SsIJ"
)
assert len(_HOMOGLYPH_FROM) == len(_HOMOGLYPH_TO)


def fold_homoglyphs(col: str | Column) -> Column:
    """Fold common Cyrillic/Greek ASCII-lookalike code points to their
    ASCII forms — one ``translate``, whole-stage-codegen'd."""
    return F.translate(_col(col), _HOMOGLYPH_FROM, _HOMOGLYPH_TO)


def fold_fullwidth(col: str | Column) -> Column:
    """Fold fullwidth ASCII forms (U+FF01-FF5E) to ASCII (U+21-7E) —
    the other bulk confusable family (common in CJK web text). One
    ``translate`` over the 94-character range."""
    src = "".join(chr(0xFF01 + i) for i in range(94))
    dst = "".join(chr(0x21 + i) for i in range(94))
    return F.translate(_col(col), src, dst)


def homoglyph_count(col: str | Column) -> Column:
    """How many confusable code points a document carries — the
    poisoning signal itself (a legit English doc has ~0; an evasion
    attempt has many): length delta after stripping every mapped
    character."""
    c = _col(col)
    return (
        F.length(c)
        - F.length(F.translate(c, _HOMOGLYPH_FROM, "" ))
    ).cast("int")
