"""Deduplication operator family (BASELINE.json north star).

Five dedup strategies over a documents table, ordered by cost/recall
trade-off. All are pure DataFrame compositions — no Python in the hot
path — and all avoid driver-side materialization:

- exact        : fingerprint groupBy. One shuffle on a 32-char hash.
- ngram_jaccard: exact word-shingle Jaccard via shingle-inverted-index
                 self-join. Quadratic in the worst case — the *oracle*
                 baseline the approximate methods are tested against.
- minhash_lsh  : MinHash signatures + banded LSH candidate join →
                 the 100 TB path (cost ≈ linear in corpus + candidate
                 pairs). Signature hashing is seeded xxhash64, fully
                 JVM-side.
- simhash      : 64-bit SimHash fingerprints + chunk-banding for
                 hamming-distance candidates.
- embedding near-dup: cosine ≥ threshold pairs on an embedding column
                 (see ``similarity`` for the ANN machinery).

Scale notes (100 TB): the shingle inverted index must drop
ultra-frequent shingles (``max_shingle_freq``) or the hottest shingle
becomes a quadratic skew key; LSH banding keeps candidate generation
linear; everything shuffles on hash keys → uniform partitioning.
"""

from __future__ import annotations

import json as _json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.

    Returns one row per fingerprint group: canonical (min) id, group
    size, member ids sorted. ``n_dups = group_size - 1`` rows can be
    dropped by keeping ``keep_id`` only.
    """
    return (
        df.select(F.col(id_col).alias("id"), TX.fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.array_sort(F.collect_list("id")).alias("member_ids"),
        )
    )


def _shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int, max_shingle_freq: int | None
) -> DataFrame:
    """Inverted index: (shingle, id), optionally dropping shingles that
    occur in more than ``max_shingle_freq`` docs (skew/blowup guard)."""
    idx = TX.shingle_stream(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        hot = (
            idx.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_freq"))
            .filter(F.col("df_freq") > max_shingle_freq)
            .select("shingle")
        )
        idx = idx.join(F.broadcast(hot), "shingle", "left_anti")
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, sim ≥ threshold).

    Plan: shingle inverted index self-joined on shingle → count common
    shingles per pair → join per-doc shingle counts → jaccard =
    common / (|A| + |B| - common). Only docs sharing ≥1 shingle ever
    meet, so cost is driven by shingle co-occurrence, not |corpus|².
    """
    idx = _shingle_index(df, id_col, text_col, n, max_shingle_freq)
    sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = idx.alias("a")
    b = idx.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment pairs: ``n_common / min(|A|, |B|)``.

    Jaccard misses the sub-document case — a paragraph pasted into a
    10× longer page scores ``|A|/|B|`` ≈ 0.1 Jaccard but 1.0
    containment of the smaller side. Containment is the right signal
    for quote/boilerplate/aggregator dedup in crawl corpora.

    Same inverted-index plan as :func:`ngram_jaccard_pairs` (docs only
    meet through shared shingles — never all-pairs); the output adds
    ``contained_id``, the doc whose shingle set is the (more) covered
    one (ties → lower id)."""
    idx = _shingle_index(df, id_col, text_col, n, max_shingle_freq)
    sizes = idx.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = idx.alias("a")
    b = idx.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.col("n_common") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained_id",
            F.when(F.col("n_a") <= F.col("n_b"), F.col("id_a")).otherwise(
                F.col("id_b")
            ),
        )
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "containment", "contained_id")
    )


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination scan: which training documents share
    word ``n``-grams with ANY evaluation document? The standard
    pre-training hygiene step (GPT-3 Appendix C lineage: 13-gram
    overlap): a train doc containing an eval n-gram leaks the
    benchmark into the training set and inflates downstream scores.

    Returns ``(id, n_contaminated_grams)`` for train docs with at
    least ``min_hits`` DISTINCT shared n-grams (shingle sets are
    per-doc distinct, so the count never double-counts a repeated
    gram). Compose with a left-anti join (:func:`decontaminate`) to
    drop them, or keep the counts for audit/reporting.

    Scale shape: eval sets are benchmark-sized (thousands of docs,
    KBs of distinct grams) against a 100-TB train side, so the eval
    gram set BROADCASTS by default and the train side is one scan +
    one map-combined groupBy on the train id — no train-side
    shuffle-join. Pass ``broadcast_eval=False`` when decontaminating
    against another corpus-sized table (plain equi-join on the gram).
    Same shingle convention as every dedup op here
    (functions/text.shingles: whitespace tokens; sub-``n`` docs
    contribute their whole text as one gram — conservative: a short
    eval doc quoted verbatim still hits)."""
    # shingles_fast: the one-pass overlapping-regex extraction (same
    # semantics/row-local distinctness as TX.shingles, measured ~7x
    # faster than the slice/concat_ws lambda chain the plain form uses)
    t_grams = train.select(
        F.col(id_col).alias("id"),
        F.explode(TX.shingles_fast(text_col, n)).alias("g"),
    )
    e_grams = eval_df.select(
        F.explode(TX.shingles_fast(text_col, n)).alias("g")
    ).distinct()
    if broadcast_eval:
        e_grams = F.broadcast(e_grams)
    return (
        t_grams.join(e_grams, "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") >= min_hits)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop contaminated training documents (see
    :func:`contamination_hits`): the train frame minus every doc with
    ``min_hits``+ distinct eval n-grams, via a left-anti join on the
    hit set — train columns pass through untouched.

    NULL ``id_col`` handling: the anti-join is null-SAFE (``<=>``), so
    NULL-id docs that share eval grams are dropped too — the
    conservative direction for decontamination. Note the per-doc gram
    count in :func:`contamination_hits` groups all NULL-id rows as ONE
    logical doc (SQL ``GROUP BY`` null semantics on both engines), so
    with NULL ids present ``min_hits`` is effectively counted across
    their union — again err-on-dropping. Give docs real ids for exact
    per-doc thresholds."""
    hits = contamination_hits(
        train, eval_df, id_col, text_col, n, min_hits, broadcast_eval
    ).select(F.col("id").alias("__contaminated_id"))
    return train.join(
        hits, F.col(id_col).eqNullSafe(F.col("__contaminated_id")), "left_anti"
    )


def _universal_hash_params(num_hashes: int, seed: int = 1337) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family
    h_i(x) = a_i*x + b_i over Z/2^64 (long arithmetic wraps — fine for
    hashing). Generated driver-side, embedded as plan literals."""
    import random

    rng = random.Random(seed)
    # a, b < 2^31 so a*h31 + b stays well under 2^63 (Spark 4 runs in
    # ANSI mode: a wrapping long overflow would raise, not wrap)
    return [
        (rng.randrange(1, 1 << 31) | 1, rng.randrange(0, 1 << 31))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of hash_i(shingle).

    One explode + one groupBy computing all ``num_hashes`` mins in a
    single aggregation pass (map-side partial min → the shuffle ships
    only 64 ints per doc). Each shingle is hashed ONCE (xxhash64,
    folded to 31 bits); the ``num_hashes`` family members are cheap
    universal-hash derivations a_i*h+b_i — 1 string hash + k multiplies
    per shingle instead of k string hashes.

    Formulation note: a row-local variant (transform/array_min over a
    shingle array, zero shuffle) was benchmarked ~3× slower — Spark's
    higher-order lambdas are not whole-stage-codegen'd, while this
    explode + 64-way min aggregate JITs end-to-end. The shuffle ships
    partial mins only, so codegen wins.
    """
    idx = TX.shingle_stream(df, id_col, text_col, n).select(
        "id", F.pmod(F.xxhash64("shingle"), F.lit(2147483647)).alias("h")
    )
    params = _universal_hash_params(num_hashes)
    # the mod p is essential: an affine map without it is monotone in h,
    # making every family member pick the same min shingle. Each min is
    # ONE parsed expression (round-13): 64 per-node builds cost ~0.5 s
    # of py4j driver time per plan construction; parse is type- and
    # value-identical (int literals coerce exactly as F.lit ints).
    mins = [
        F.expr(f"min(pmod(`h` * {a} + {b}, 2147483647)) AS h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = idx.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    ``bands`` bands of ``num_hashes/bands`` rows; docs colliding in ≥1
    band become candidates (prob ≈ 1-(1-s^r)^b); candidates are scored
    by estimated Jaccard = fraction of matching signature positions,
    kept at ``est_jaccard ≥ threshold``. Candidate generation is a
    hash-key equi-join → linear scale-out; no |corpus|² stage anywhere.
    """
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    return banded_pairs(sig, num_hashes, bands, threshold)


def band_entries(
    sig: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """LSH band table ``(id, band, bucket)`` from a ``(id, signature)``
    frame: one row per (doc, band), bucket = hash of that band's
    signature slice. Band entries carry ONLY (id, band, bucket) — at
    100 TB the band join is the big shuffle, and shipping the 64-int
    signature through it 16× would dominate the job; signatures rejoin
    after the candidate set is deduped (a far smaller, id-keyed join).
    This is also the exact schema persisted by :func:`build_lsh_index`,
    so a shard's in-flight band entries and a persisted corpus index
    are join-compatible by construction."""
    rows_per_band = num_hashes // bands

    def bucket_sql(b: int) -> str:
        # one parsed expression per band bucket (round-13): identical
        # xxhash64(concat_ws(',', CAST(signature[i] AS STRING)...))
        # tree, none of the per-node py4j construction cost
        items = ",".join(
            f"CAST(`signature`[{b * rows_per_band + r}] AS STRING)"
            for r in range(rows_per_band)
        )
        return f"xxhash64(concat_ws(',', {items}))"

    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(bucket_sql(b)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def collapse_identical_signatures(sig: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Hot-bucket guard, phase 1 (VERDICT r9 #1): collapse
    byte-identical signatures to one canonical representative.

    Returns ``(reps, membership)`` where ``reps`` is ``(id,
    signature)`` restricted to the min-id document of each distinct
    signature and ``membership`` is ``(id, rep_id)`` for every
    non-NULL-id document. Grouping key is the FULL signature array —
    never a hash of it: a 64-bit hash collision would silently merge
    two distinct signatures and emit false est=1.0 pairs, and at
    10^10 docs the birthday bound makes that a real event. One
    shuffle on the signature key (a window min — no self-join).

    The collapsed frame is ``localCheckpoint``-ed (round-13, guide §5):
    reps/membership feed 4-6 consumers downstream (both sides of the
    band self-join, both signature-scoring joins, the membership
    expansion legs) and several of those sit under BroadcastExchange,
    which can NEVER reuse a shuffle exchange — the r12 plan dumps show
    the whole shingle→signature→window pipeline replicated five times
    per query. Cutting it here runs the corpus-scan pipeline ONCE. The
    materialized state is the distinct-signature table — the exact
    frame ``build_lsh_index`` persists to parquet anyway, strictly
    smaller than the corpus (64 ints + 2 ids per doc, spills to disk
    under memory pressure)."""
    w = Window.partitionBy("signature")
    with_rep = (
        sig.withColumn("rep_id", F.min("id").over(w))
        .localCheckpoint(eager=True)
    )
    membership = with_rep.select("id", "rep_id").filter(F.col("id").isNotNull())
    reps = with_rep.filter(F.col("id") == F.col("rep_id")).select("id", "signature")
    return reps, membership


def band_bucket_overflow(
    sig: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Overflow accounting for the per-bucket cap: ``(band, bucket,
    n_signatures)`` for every band bucket holding more than
    ``max_bucket_size`` DISTINCT signatures (identical signatures
    collapse first, so a million byte-identical boilerplate docs are
    ONE signature here, not an overflow). Run this alongside a capped
    :func:`banded_pairs` call to quantify what the cap dropped."""
    reps, _ = collapse_identical_signatures(sig)
    return (
        band_entries(reps, num_hashes, bands)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_signatures"))
        .filter(F.col("n_signatures") > max_bucket_size)
    )


def banded_pairs(
    sig: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding over a (id, signature array) frame: band-bucket
    collision candidates, deduped, then scored by estimated Jaccard
    (= fraction of matching signature positions) and thresholded.
    Shared tail of every minhash variant.

    Hot-bucket guard (VERDICT r9 #1): identical signatures collapse
    to one representative BEFORE the band self-join, then scored
    rep-level pairs expand back through the membership frame. k
    byte-identical boilerplate docs (the dominant collision mode in
    web crawls) contribute ONE node to the band join instead of k —
    candidate volume stays linear; the k(k-1)/2 intra-group pairs are
    emitted directly from membership (output-sized work, inherent to
    the pair contract). Output is IDENTICAL to the ungrouped join —
    the estimate depends only on signatures, so cross-group pairs
    exist iff their rep pair exists, with the same score — which is
    why the DuckDB oracle for ``dedup_minhash_poly`` (an ungrouped
    SQL restatement) still hash-matches.

    ``max_bucket_size`` is the second line of defense, for DISTINCT
    signatures flooding one bucket (boilerplate-with-noise whose
    sub-threshold candidates would be generated then discarded):
    buckets with more than that many distinct signatures are skipped
    in candidate generation — a documented recall trade, quantified
    by :func:`band_bucket_overflow`. Default None = exact."""
    rep_pairs, membership = _rep_level_pairs(
        sig, num_hashes, bands, threshold, max_bucket_size
    )
    return _expand_rep_pairs(rep_pairs, membership, threshold)


def _rep_level_pairs(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_bucket_size: int | None = None,
) -> "tuple[DataFrame, DataFrame]":
    """Shared guarded core: collapse identical signatures, band-join
    the representatives only, score. Returns ``(rep_pairs,
    membership)``."""
    reps, membership = collapse_identical_signatures(sig)
    bt = band_entries(reps, num_hashes, bands)
    if max_bucket_size is not None:
        ok = (
            bt.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
        # same (band, bucket) key as the self-join below — AQE keeps
        # these co-partitioned, no extra shuffle of the band table
        bt = bt.join(ok, ["band", "bucket"])
    a = bt.alias("a")
    b = bt.alias("b")
    # the pre-score dropDuplicates STAYS here (round-13 measured both
    # orders): at the minhash thresholds most candidates survive the
    # estimate filter on near-dup-heavy corpora, so postponing the
    # dedup past scoring (as hamming_near_pairs now does behind its
    # highly selective distance filter) just re-scores the ~8%
    # duplicates and re-shuffles nearly the same volume — interleaved
    # A/B read 0.68× for the postponed form here vs 1.27× for simhash.
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    rep_pairs = _score_candidates(cand, reps, reps, num_hashes, threshold)
    return rep_pairs, membership


def banded_pairs_star(
    sig: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The LINEAR-output form of :func:`banded_pairs` — what a 100 TB
    dedup job should actually emit. Instead of the full pair clique
    (k(k-1)/2 rows for k identical boilerplate docs), returns a
    star-form edge set with the SAME connected components:

    - ``kind='member'``: ``(rep_id, id, 1.0)`` for every non-rep
      member of an identical-signature group — k-1 edges, not
      k(k-1)/2; identical docs are definitionally duplicates.
    - ``kind='lsh'``: representative-level near-dup pairs from the
      guarded band join, one edge per PAIR OF GROUPS.

    Transitive closure over these edges equals transitive closure
    over the full :func:`banded_pairs` output (cross-group pairs
    exist iff their rep pair exists — the estimate depends only on
    the signatures), so connected-components / keep-first dedup
    downstream is unchanged while the edge volume drops from
    quadratic to linear in group size. Columns: ``(id_a, id_b,
    est_jaccard, kind)`` with ``id_a < id_b``."""
    rep_pairs, membership = _rep_level_pairs(
        sig, num_hashes, bands, threshold, max_bucket_size
    )
    member = (
        membership.filter(F.col("id") != F.col("rep_id"))
        .select(
            F.col("rep_id").alias("id_a"),
            F.col("id").alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
            F.lit("member").alias("kind"),
        )
        .filter(F.lit(1.0) >= F.lit(float(threshold)))
    )
    lsh = rep_pairs.withColumn("kind", F.lit("lsh"))
    return member.unionByName(lsh)


def minhash_lsh_edges_grouped_poly(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Star-form near-dup edges over the SQL-replicable polynomial
    MinHash — :func:`banded_pairs_star` on
    :func:`minhash_signatures_poly`, fully oracle-hash-checkable."""
    sig = minhash_signatures_poly(df, id_col, text_col, k, num_hashes)
    return banded_pairs_star(sig, num_hashes, bands, threshold, max_bucket_size)


def _expand_rep_pairs(
    rep_pairs: DataFrame,
    membership: DataFrame,
    threshold: float,
    score_col: str = "est_jaccard",
) -> DataFrame:
    """Expand representative-level scored pairs to document-level
    pairs: intra-group pairs (identical signatures — score exactly
    1.0, the same double the ungrouped zip_with match-fraction
    produces) plus cross-group pairs carrying their rep pair's score.
    Work here is proportional to the OUTPUT pair count, which is the
    floor any implementation of the full-pair contract pays."""
    m1 = membership.select(F.col("rep_id").alias("__g"), F.col("id").alias("id_a"))
    m2 = membership.select(F.col("rep_id").alias("__g"), F.col("id").alias("id_b"))
    intra = (
        m1.join(m2, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias(score_col))
        .filter(F.lit(1.0) >= F.lit(float(threshold)))
    )
    ma = membership.select(F.col("rep_id").alias("id_a"), F.col("id").alias("__ma"))
    mb = membership.select(F.col("rep_id").alias("id_b"), F.col("id").alias("__mb"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            score_col,
        )
    )
    return intra.unionByName(cross)


def _score_candidates(
    cand: DataFrame,
    sig_src_a: DataFrame,
    sig_src_b: DataFrame,
    num_hashes: int,
    threshold: float,
) -> DataFrame:
    """Score deduped ``(id_a, id_b)`` candidates by estimated Jaccard
    (fraction of matching signature positions), thresholded. The two
    signature sources may differ (corpus index vs new shard for the
    incremental path) — both id-keyed joins on the already-deduped
    candidate set, far smaller than the band join.

    Signatures are projected to ``array<int>`` for the scoring join:
    every minhash family here is mod-2^31 (poly and xxhash variants
    both), so the cast is lossless and the join rows carry half the
    bytes — on a boilerplate-heavy corpus the candidate set is the
    biggest intermediate of the whole pipeline (r10 octave stress:
    175M candidates at the sf10 decade), and row width is what
    decides whether it spills. Match equality and the est fraction
    are unchanged."""
    as_int = F.transform(F.col("signature"), lambda x: x.cast("int"))
    sig_a = sig_src_a.select(F.col("id").alias("id_a"), as_int.alias("sig_a"))
    sig_b = sig_src_b.select(F.col("id").alias("id_b"), as_int.alias("sig_b"))
    # guarded unrolled match count: the candidate set is the volume
    # peak of the pipeline (1.4M pairs at sf0.1; 175M at the r10
    # octave stress), and the zip_with+filter HOF pair is interpreted
    # per pair. The unrolled sum is codegen arithmetic with identical
    # semantics: a NULL position compares NULL -> counts 0 in both
    # forms; off-length rows (sweep-mutated) fall back to the HOF
    # expression. One instance per plan — cheap for the optimizer —
    # and parsed from ONE SQL string (round-13): the per-node py4j
    # build of the 64-term tree cost ~0.5 s of driver time per plan
    # construction; the parsed tree is operator-identical.
    nh = int(num_hashes)
    hof_sql = (
        "(size(filter(zip_with(`sig_a`, `sig_b`, (x, y) -> x = y), "
        f"m -> m)) / {float(nh)!r}D)"
    )
    terms = "".join(
        f" + CASE WHEN get(`sig_a`, {i}) = get(`sig_b`, {i}) "
        "THEN 1 ELSE 0 END"
        for i in range(nh)
    )
    est = F.expr(
        f"CASE WHEN (size(`sig_a`) = {nh}) AND (size(`sig_b`) = {nh}) "
        f"THEN (0{terms}) / {float(nh)!r}D ELSE {hof_sql} END"
    )
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_long(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash fingerprint per document as a single LONG.

    For each bit b: sum over tokens of ±1 (sign of token-hash bit b);
    fingerprint bit b = 1 iff the sum > 0. One explode + one groupBy
    with 64 vectorized ±1-vote sum aggregates (map-side partials, bit
    tests are literal shiftright+mask — the whole aggregate is
    whole-stage-codegen'd; a row-local higher-order-lambda variant
    benchmarked ~3× slower because HOF lambdas are interpreted), then
    the votes fold into the long row-side via an OR chain. A long
    fingerprint makes downstream hamming distance one
    ``bit_count(a ^ b)``.

    Output: ``simhash`` long (bit i votes token-hash bit i);
    empty docs → 0.
    """
    ids = df.select(F.col(id_col).alias("id"))
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(TX.tokens(text_col)).alias("tok")
    ).select("id", F.xxhash64("tok").alias("h"))
    # one parsed expression per vote / for the OR fold (round-13, see
    # minhash_signatures — same trees, none of the per-node py4j cost)
    votes = tok.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(`h`, {i}) & 1) != 0 "
                f"THEN 1 ELSE -1 END) AS v{i}"
            )
            for i in range(64)
        ]
    )

    def bit_sql(i: int) -> str:
        return (
            f"CASE WHEN `v{i}` > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
            f"ELSE CAST(0 AS BIGINT) END"
        )

    fp = F.expr(
        "(" + " | ".join(bit_sql(i) for i in range(64)) + ")"
    )
    sh = votes.select("id", fp.alias("simhash"))
    # empty docs produce no token rows — restore them with the zero hash
    return ids.join(sh, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """String-rendered SimHash: 64-char '0'/'1' string, char j = bit
    j-1 of :func:`simhash_long` (LSB first). Kept as the readable /
    cross-system-exportable form; the long form is the compute path."""
    sh = simhash_long(df, id_col, text_col)
    bits = F.reverse(F.lpad(F.bin(F.col("simhash")), 64, "0"))
    return sh.select("id", bits.alias("simhash_bits"))


def hash_chunk_entries(
    fp: DataFrame,
    id_col: str = "id",
    hash_col: str = "h",
    n_chunks: int = 4,
) -> DataFrame:
    """``(id, h, chunk, val)`` rows from a 64-bit LONG fingerprint
    frame: ``n_chunks`` contiguous chunks of ``64 // n_chunks`` bits
    each, keyed via shift+mask. The fingerprint rides along (it is one
    long — nothing to save by rejoining it later). Arithmetic
    shiftright sign-extends the top chunk; the mask AND restores the
    unsigned bit pattern. Shared by the in-flight banded hamming join
    (:func:`hamming_near_pairs`) and the persisted pHash image index
    (``multimodal.build_phash_index``) so a shard's in-flight entries
    and a persisted corpus index always agree on bucketing."""
    if not 1 <= n_chunks <= 64:
        # n_chunks > 64 would give zero-width chunks: every row keys
        # to (chunk, 0) and the candidate join degenerates to an
        # accidental cross product — exactly the failure mode the
        # plan audit exists to keep out
        raise ValueError(f"n_chunks must be in [1, 64], got {n_chunks}")
    width = 64 // n_chunks

    def chunk_val(c: int):
        shifted = F.shiftright(F.col(hash_col), c * width)
        if width == 64:
            # n_chunks=1: the chunk IS the full long. (1 << 64) - 1
            # does not fit a long literal (F.lit would throw), and the
            # AND would be an identity anyway — skip it.
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1).cast("long"))

    return fp.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        chunk_val(c).alias("val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cv"),
    ).select("id", "h", "cv.chunk", "cv.val")


def hamming_near_pairs(
    fp: DataFrame,
    id_col: str = "id",
    hash_col: str = "h",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Pairs with ``hamming(hash) ≤ max_hamming`` over a 64-bit LONG
    fingerprint column, via pigeonhole chunk banding: split the 64
    bits into ``n_chunks`` contiguous chunks of ``64 // n_chunks``
    bits; distance ≤ max_hamming < n_chunks ⇒ at least one chunk is
    bit-identical (any leftover high bits when 64 % n_chunks != 0 sit
    in NO chunk, which cannot break the pigeonhole — h differing bits
    touch at most h of the h+1 chunks either way), so candidates come
    from an EQUI-join on ``(chunk, chunk_value)`` — shuffle-
    partitioned by key, never all-pairs — then the exact
    ``bit_count(xor)`` filter. Shared by SimHash text dedup and pHash
    image dedup (round 9). Output ``(id_a, id_b, hamming)`` with
    id_a < id_b."""
    if max_hamming >= n_chunks:
        raise ValueError(
            f"pigeonhole banding needs max_hamming < n_chunks "
            f"(got {max_hamming} >= {n_chunks})"
        )
    # hot-bucket guard (VERDICT r9 #1, same as banded_pairs): collapse
    # identical fingerprints to a min-id representative before the
    # chunk self-join — k byte-identical docs (hence identical
    # SimHash/pHash longs) contribute ONE node to every chunk bucket
    # instead of k, keeping candidate volume linear on
    # boilerplate-heavy corpora. The distance depends only on the
    # fingerprint, so expanding scored rep pairs through the
    # membership frame reproduces the ungrouped output exactly
    # (intra-group pairs have hamming 0, always <= max_hamming >= 0).
    # localCheckpoint (round-13, same rationale as
    # collapse_identical_signatures): reps/membership feed six
    # consumers (chunk-join sides a/b, intra m1/m2, cross ma/mb) and
    # the fingerprint pipeline above this window would otherwise
    # re-execute per consumer — the checkpointed state is one long +
    # two ids per doc.
    w = Window.partitionBy(hash_col)
    with_rep = fp.withColumn("__rep", F.min(id_col).over(w)).localCheckpoint(
        eager=True
    )
    membership = with_rep.select(
        F.col(id_col).alias("id"), F.col("__rep").alias("rep_id")
    ).filter(F.col(id_col).isNotNull())
    reps = with_rep.filter(F.col(id_col) == F.col("__rep")).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    chunks = hash_chunk_entries(reps, "id", "h", n_chunks)

    a, b = chunks.alias("a"), chunks.alias("b")
    # multi-chunk duplicates dedup AFTER the hamming filter (round-13,
    # guide §2.3): the distance is a pure function of the two
    # fingerprints riding the rows, so duplicate candidates carry
    # identical rows and deduping the (much smaller) post-filter
    # stream yields exactly the pre-dedup result — without shuffling
    # the full candidate stream through a dropDuplicates first.
    # Duplication is bounded by n_chunks.
    cand = (
        a.join(b, on=["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    rep_pairs = (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )
    m1 = membership.select(F.col("rep_id").alias("__g"), F.col("id").alias("id_a"))
    m2 = membership.select(F.col("rep_id").alias("__g"), F.col("id").alias("id_b"))
    intra = (
        m1.join(m2, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("int").alias("hamming"))
    )
    ma = membership.select(F.col("rep_id").alias("id_a"), F.col("id").alias("__ma"))
    mb = membership.select(F.col("rep_id").alias("id_b"), F.col("id").alias("__mb"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            "hamming",
        )
    )
    return intra.unionByName(cross)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via chunk
    banding (pigeonhole: distance ≤ h ⇒ ≥1 of h+1 chunks equal), then
    exact hamming filter on candidates — the generic
    :func:`hamming_near_pairs` over SimHash fingerprints. The chunk
    count auto-sizes to ``max(4, max_hamming + 1)``; before round 9's
    refactor a max_hamming > 3 request silently kept 4 chunks, which
    could MISS pairs whose differing bits touch all four chunks."""
    sh = simhash_long(df, id_col, text_col)
    return hamming_near_pairs(
        sh,
        id_col="id",
        hash_col="simhash",
        max_hamming=max_hamming,
        n_chunks=max(4, max_hamming + 1),
    )


class ConnectedComponentsDidNotConverge(RuntimeError):
    """Raised when a connected-components loop exhausts ``max_iter``
    without reaching its fixpoint. A non-converged label frame is
    plausible-looking but WRONG (labels mid-propagation / multi-parent
    edges), and downstream survivorship would silently keep the wrong
    documents — so non-convergence is an error by default, never a
    degraded answer (round-12 advice: the 300-node diameter-stress
    test proves min-label at its default budget returns wrong labels,
    and only oracle-hashed runs would have caught it)."""


def _handle_nonconvergence(
    which: str, max_iter: int, on_max_iter: str
) -> None:
    msg = (
        f"{which} did not converge within max_iter={max_iter} rounds; "
        "labels are NOT component minima. Raise max_iter or use "
        "connected_components_star (O(log^2 n) rounds on any graph)."
    )
    if on_max_iter == "raise":
        raise ConnectedComponentsDidNotConverge(msg)
    if on_max_iter == "warn":
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=3)
    elif on_max_iter != "return":
        raise ValueError(
            f"on_max_iter must be 'raise', 'warn' or 'return', got "
            f"{on_max_iter!r}"
        )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
    on_max_iter: str = "raise",
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    cluster-resolution step that turns pairwise dedup output into
    "keep one per group" decisions.

    Iterative min-label propagation: every node starts labeled with
    its own id; each round every node takes the min label among itself
    and its neighbors; fixpoint = components (label = min node id in
    the component). Rounds needed = graph diameter — near-dup clusters
    are shallow (stars/cliques), so convergence is typically 2-3
    rounds; ``max_iter`` bounds adversarial chains.

    Scale notes, each one load-bearing at 100 TB:

    - The symmetrized EDGE frame is checkpointed ONCE before the loop.
      Its lineage is usually an expensive pair-generation join (blocked
      linkage scoring, LSH banding) — without the checkpoint every
      round's join re-evaluates that whole upstream plan (the exact
      persist-before-iterate failure mode the round-7 BPE advice
      flagged; measured 24 s → ~10 s on link_golden_records).
    - Only EDGE-INCIDENT nodes iterate. In a sparse link graph nodes
      vastly outnumber linked nodes; a node with no edges can never
      receive a message, so its label provably stays its own id —
      singletons are appended after the loop with component = id,
      never shuffled through the rounds.
    - Labels are ``localCheckpoint``-ed per round to cut the lineage
      (an unbounded iterative plan otherwise recompiles and recomputes
      from scratch every round); early-exit via an isEmpty probe on
      the changed-label set. For graphs with huge diameter use
      :func:`connected_components_star` (alternating large-star/
      small-star, O(log² n) rounds — same signature, equivalence
      pinned by tests/test_cc_star.py); for shallow dedup graphs this
      simple form is the right trade.
    - NON-CONVERGENCE IS AN ERROR: if ``max_iter`` rounds pass without
      the fixpoint, the labels are mid-propagation garbage, so the
      default raises :class:`ConnectedComponentsDidNotConverge`
      instead of returning them. ``on_max_iter``: ``"raise"``
      (default) / ``"warn"`` / ``"return"`` (diagnostics only — e.g.
      the diameter-stress test inspects the wrong labels on purpose).
      ``stats`` (if a dict is passed) records ``rounds`` and
      ``converged`` either way.
    """
    # pre-partition the iterated frames on their JOIN keys before the
    # checkpoint (round-13, guide §2.4): localCheckpoint preserves
    # physical partitioning, so every round's sym⋈labels join reuses
    # hash(b)/hash(id) instead of re-exchanging both sides — the round
    # job drops from 3 exchanges to 1 (the label re-aggregation, which
    # a union of differently-keyed inputs genuinely needs). sym is
    # additionally sorted on b so the sort-merge join's streamed side
    # needs no per-round sort.
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .repartition(F.col("b"))
        .sortWithinPartitions("b")
        .localCheckpoint(eager=True)
    )

    all_nodes = nodes.select(F.col(id_col).alias("id"))
    edge_nodes = sym.select(F.col("a").alias("id")).distinct().join(
        all_nodes, "id"
    )
    labels = edge_nodes.select("id", F.col("id").alias("comp"))
    labels = labels.repartition(F.col("id")).localCheckpoint(eager=True)

    from pyspark.sql import Observation

    # convergence probe FOLDED into the round's one materializing
    # action (round-13, guide §2.4/§1.5): the previous shape ran a
    # second job per round — new_labels ⋈ labels on id (two more
    # exchanges) probed with isEmpty(). Instead the old label rides
    # the union tagged __is_old (exactly one old row per id, so
    # min(when(__is_old, comp)) IS the previous label), and an
    # observe() metric counts changed ids DURING the eager
    # localCheckpoint job. The label frames and the convergence
    # decisions are unchanged (ids the old inner-join probe skipped —
    # edge endpoints absent from `nodes` on their first round — have
    # NULL __old, and comp != NULL is NULL, which sum() skips,
    # matching the inner join).
    def _step(lbl: DataFrame) -> "tuple[DataFrame, Observation]":
        msgs = sym.join(lbl, sym["b"] == lbl["id"]).select(
            F.col("a").alias("id"), "comp", F.lit(False).alias("__is_old")
        )
        obs = Observation()
        agg = (
            msgs.unionByName(
                lbl.select("id", "comp", F.lit(True).alias("__is_old"))
            )
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                F.min(F.when(F.col("__is_old"), F.col("comp"))).alias("__old"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("comp") != F.col("__old")).cast("int")
                ).alias("n_changed"),
            )
        )
        return agg.select("id", "comp"), obs

    # TWO propagation steps fuse into each materializing job (round-13,
    # guide §2.4 "fuse one job per round out of the iterative
    # drivers"): step 2 consumes step 1's plan directly — its
    # aggregation exchange is shared between step 2's join and union
    # via exchange reuse, and the checkpointed frames' preserved
    # hash(b)/hash(id) partitioning keeps the joins exchange-free — so
    # the serial job chain (the 8→32-core scaling ceiling) halves.
    # Labels after a fused job are IDENTICAL to two sequential rounds,
    # and propagating a fixpoint is the identity, so overshooting by
    # one step when step 1 already converged changes nothing; `rounds`
    # still counts the propagation steps the result needed, exactly as
    # the one-step loop reported them.
    converged = False
    rounds = 0
    while rounds < max_iter and not converged:
        step1, obs1 = _step(labels)
        if rounds + 1 < max_iter:
            step2, obs2 = _step(step1)
            labels = step2.localCheckpoint(eager=True)
            if int(obs1.get["n_changed"] or 0) == 0:
                rounds += 1
                converged = True
            else:
                rounds += 2
                converged = int(obs2.get["n_changed"] or 0) == 0
        else:
            labels = step1.localCheckpoint(eager=True)
            rounds += 1
            converged = int(obs1.get["n_changed"] or 0) == 0
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        _handle_nonconvergence("connected_components", max_iter, on_max_iter)
    singletons = all_nodes.join(edge_nodes, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    return labels.unionByName(singletons).select(
        "id", F.col("comp").alias("component")
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
    on_max_iter: str = "raise",
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" — public algorithm), same signature and output contract
    as :func:`connected_components`.

    This is the large-diameter escape hatch the min-label docstring
    names: min-label propagation needs O(diameter) rounds, so an
    adversarial near-dup CHAIN (serial plagiarism: A≈B≈C≈…, each
    pair near-dup but ends unrelated) of length d costs d rounds at
    100 TB. Large-star/small-star contracts path length by roughly
    half per round and provably converges in O(log² n) rounds on any
    graph, each round two groupBys over the current edge set.

    Mechanics (edges held DIRECTED child→parent with parent < child,
    so every step strictly decreases labels and termination is
    well-founded):

    - large-star(u): over the SYMMETRIZED neighborhood,
      m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u —
      strictly-larger neighbors re-point at u's minimum.
    - small-star(x): over x's current parents, m = min(parents);
      emit (p, m) for every other parent p and (x, m) — x's parent
      list collapses into a star on its minimum.

    Fixpoint = every edge is (node, component-min); detected by an
    exceptAll emptiness probe on the canonical edge frame. Per-round
    ``localCheckpoint`` cuts lineage exactly as in the min-label
    form; singletons bypass the loop. ``stats['rounds']`` /
    ``stats['converged']`` (if a dict is passed) record the round
    count and whether the fixpoint break fired — the equivalence and
    diameter-stress tests pin the O(log²) vs O(d) separation.

    Exhausting ``max_iter`` without the fixpoint raises
    :class:`ConnectedComponentsDidNotConverge` by default
    (``on_max_iter`` as in :func:`connected_components`): the
    post-loop min-aggregate over a non-converged multi-parent edge
    set is NOT the component minimum, so returning it silently would
    hand downstream survivorship plausible-looking wrong labels. At
    the default budget this cannot fire on real graphs — 50 rounds
    covers n beyond any physical corpus (O(log² n)) — so the raise
    is a guard against misconfigured small budgets, not a runtime
    hazard.
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).filter(F.col("a") != F.col("b"))

    all_nodes = nodes.select(F.col(id_col).alias("id"))
    edge_nodes = sym.select(F.col("a").alias("id")).distinct().join(
        all_nodes, "id"
    ).localCheckpoint(eager=True)

    # canonical directed form: (x child, p parent), p < x
    cur = (
        sym.select(
            F.greatest("a", "b").alias("x"), F.least("a", "b").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized current edges
        s = cur.select(F.col("x").alias("u"), F.col("p").alias("v")).unionByName(
            cur.select(F.col("p").alias("u"), F.col("x").alias("v"))
        )
        mins = s.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least("u", "mv")
        # no distinct here: duplicate (x, p) rows are harmless to the
        # min-aggregations below and the round's closing distinct
        # dedups the output — dropping it removes a shuffle per round
        large = (
            s.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), m.alias("p"))
        )
        # small-star over the directed parent lists
        pm = large.groupBy("x").agg(F.min("p").alias("mp"))
        joined = large.join(pm, "x")
        small = (
            joined.filter(F.col("p") != F.col("mp"))
            .select(F.col("p").alias("x"), F.col("mp").alias("p"))
            .unionByName(joined.select("x", F.col("mp").alias("p")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint probe, STRUCTURAL (round-12): the alternation's
        # fixpoint is exactly the canonical star forest — p < x on
        # every edge, so a component whose parents never appear as
        # children is a star rooted at its min, and replaying either
        # star step on a star forest is the identity (large-star:
        # every child's neighborhood min is the root; small-star:
        # single-parent lists collapse to themselves). Probing "no
        # parent is also a child" is one semi-join + isEmpty over the
        # just-checkpointed frame — far cheaper than the original
        # two-sided exceptAll set compare, and it fires the SAME
        # round (equivalence + property tests vs union-find pin it)
        if (
            small.select("p")
            .join(small.select(F.col("x").alias("p")), "p", "semi")
            .isEmpty()
        ):
            cur = small
            converged = True
            break
        cur = small
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        _handle_nonconvergence(
            "connected_components_star", max_iter, on_max_iter
        )

    # at fixpoint every node carries exactly one parent, so this is a
    # no-op pass over single-parent rows; under on_max_iter="return"/
    # "warn" it collapses a non-converged node's residual parent list
    # (NOT necessarily to the component minimum — which is why
    # non-convergence raises by default)
    labels = (
        edge_nodes.join(
            cur.select(F.col("x").alias("id"), F.col("p").alias("comp")),
            "id",
            "left",
        )
        .groupBy("id")
        .agg(F.min(F.coalesce("comp", "id")).alias("comp"))
    )
    singletons = all_nodes.join(edge_nodes, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    return labels.unionByName(singletons).select(
        "id", F.col("comp").alias("component")
    )


def survivors_from_edges(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Survivorship decision from a PRECOMPUTED near-dup edge set:
    connected components → keep the min id per component. This is the
    composition half of :func:`dedup` flagships, factored out so the
    expensive edge build (LSH banding, blocked linkage scoring) can be
    paid ONCE, persisted, and reused — at 100 TB the edge set is
    rebuilt daily at most, while survivorship re-runs per downstream
    consumer (VERDICT r10 #5: the composed flagship was recomputing
    edges a sibling query had already built in the same run).

    Routed through :func:`connected_components_star` (round-12
    advice): a PERSISTED edge set is exactly where an adversarial
    deep chain can show up unannounced — the caller didn't just build
    the graph, so no human is watching its shape — and the star form
    converges in O(log² n) rounds on ANY graph, where min-label's
    O(diameter) could exhaust its budget (and since round 12,
    non-convergence raises rather than returning wrong labels).

    Returns ``(doc_id, component, kept)`` where ``kept ⟺ doc_id is
    its component's min`` — identical output contract to the
    one-call composed form.
    """
    comp = connected_components_star(
        nodes.select(id_col),
        edges,
        id_col=id_col,
        src_col=src_col,
        dst_col=dst_col,
        max_iter=max_iter,
    )
    return comp.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("kept"),
    )


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list
) -> DataFrame:
    """Generic latest/first-wins dedup (S7 upsert semantics,
    reference staging load.py:111-118): row_number()=1 per key.
    ``order_by`` takes Columns (e.g. ``F.col("ts").desc()``) or names."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures_poly(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    prime: int = 2147483647,
) -> DataFrame:
    """MinHash signatures over polynomial char-k-gram hashes — the
    fully SQL-replicable variant: the gram hash (Σ ascii·31^j), the
    affine family ((a·h + b) mod p) and therefore every signature
    value are bit-identical computable in ANSI SQL, so the WHOLE LSH
    dedup pipeline is oracle-hash-checkable (the xxhash variant in
    :func:`minhash_signatures` is rows-only checkable). Same plan
    shape: explode grams → one groupBy computing all mins map-side.
    """
    # gram hash is a small int; the affine multiply needs 64-bit room
    # (a < 2^31, h < 2^17 → product < 2^48, ANSI-safe as long)
    idx = TX.char_gram_hashes(df, id_col, text_col, k).select(
        "id", F.col("h").cast("long").alias("h")
    )
    params = _universal_hash_params(num_hashes)
    # one parsed expression per min (round-13, see minhash_signatures)
    mins = [
        F.expr(f"min(pmod(`h` * {a} + {b}, {int(prime)})) AS h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = idx.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs_poly(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH near-dup pairs over the SQL-replicable polynomial
    MinHash — candidate semantics and scores identical to an ANSI-SQL
    re-implementation, end to end."""
    sig = minhash_signatures_poly(df, id_col, text_col, k, num_hashes)
    return banded_pairs(sig, num_hashes, bands, threshold)


def _sig_fn(signature: str):
    if signature == "poly":
        return minhash_signatures_poly
    if signature == "xxhash":
        return minhash_signatures
    raise ValueError(f"unknown signature family: {signature!r}")


def _index_fs(spark, path: str):
    """(jvm, Path-class, FileSystem) for an index root — the same
    hadoop-FS triple :mod:`..sources.io` uses for versioned tables."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    p = hpath(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, hpath, fs


def lsh_index_exists(spark, path: str) -> bool:
    """True iff a persisted LSH index exists at ``path`` — defined as
    the presence of its ``signatures`` table (written first by
    :func:`build_lsh_index`, so it exists for any index in any state,
    including a torn append). An explicit existence test, NOT a
    try/except around a read: a transient read failure on a real
    index must surface as an error, never masquerade as "no index
    yet" (that misread would re-bootstrap and corrupt the corpus)."""
    _, hpath, fs = _index_fs(spark, path)
    return bool(fs.exists(hpath(f"{path}/signatures")))


def _write_lsh_meta(spark, path: str, meta: dict) -> None:
    """Persist index parameters as a one-line JSON under
    ``<path>/meta`` — written via :func:`..sources.io.write_small_text`
    (direct FileSystem stream: the text SINK pays ~4.5 s of fixed job
    overhead per write in this Spark build; the stream write is ~0.02 s
    and object stores work identically). Read side unchanged
    (``spark.read.text``). NOT underscore-prefixed: Spark's file index
    treats ``_*`` paths as hidden and silently ignores them, which
    would make the metadata unreadable by the very reader that wrote
    it. The name cannot collide with data — signatures and bands are
    read via their explicit subpaths, never by sweeping the index
    root."""
    from ..sources.io import write_small_text

    write_small_text(spark, f"{path}/meta", _json.dumps(meta, sort_keys=True))


def read_lsh_meta(spark, path: str) -> dict | None:
    """Index parameters written by :func:`build_lsh_index` (k,
    num_hashes, bands, signature family), or None for a pre-metadata
    index (repair then needs explicit parameters)."""
    _, hpath, fs = _index_fs(spark, path)
    if not fs.exists(hpath(f"{path}/meta")):
        return None
    rows = spark.read.text(f"{path}/meta").collect()
    return _json.loads(rows[0]["value"]) if rows else None


def build_lsh_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    signature: str = "poly",
    mode: str = "overwrite",
    signatures: DataFrame | None = None,
) -> None:
    """Persist a corpus LSH index: ``<path>/signatures`` (id,
    signature) and ``<path>/bands`` (id, band, bucket), the state an
    *incremental* dedup pipeline carries between runs.

    A daily 100-TB pipeline does not re-shingle its whole corpus per
    run (the reference's own cadence is daily incremental slices —
    ``dags/vcapital_staging/tasks/components/extract.py:41-43``); it
    builds this index once, then each day's shard is signed, joined
    against the persisted band table, and appended (see
    :func:`incremental_lsh_pairs`). Both tables are plain parquet —
    ``bands`` is written ``partitionBy("band")`` so a band-restricted
    probe (e.g. re-checking one band after a hash-family change)
    prunes at the directory level, and within each band the bucket
    column is the join key. ``mode="append"`` adds a shard to an
    existing index (used by the incremental path); ids must be unique
    across appends — this index models immutable document ids, not
    updates.

    ``signatures`` may carry a precomputed signature frame for the
    SAME docs, letting a caller that already evaluated the
    shingle→sign pipeline (e.g. the streaming sink, which scores
    pairs before it appends) reuse it instead of re-shingling.
    CONTRACT: the frame must be lineage-free w.r.t. this index
    (``localCheckpoint()`` it if its plan reads ``<path>/signatures``)
    — in append mode the signature write below refreshes that path's
    file listing, and a live plan that anti-joins against it would
    re-evaluate to empty for the band write.

    Durability note: signatures commit before bands — a crash between
    the two writes leaves a detectable torn state (signature ids with
    no band entries). Run :func:`repair_lsh_index` on recovery; see
    :func:`verify_lsh_index`."""
    spark = docs.sparkSession
    sig = (
        signatures
        if signatures is not None
        else _sig_fn(signature)(docs, id_col, text_col, k, num_hashes)
    )
    sig.write.mode(mode).parquet(f"{path}/signatures")
    if signatures is not None:
        # caller persisted the frame: band-expand it directly
        shard_sig = signatures
    else:
        # derive band entries from the JUST-WRITTEN signatures, not the
        # live plan: the expensive shingle→sign pipeline runs once (for
        # the signature write); the band write is then a cheap projection
        # over the parquet it produced
        shard_sig = spark.read.parquet(f"{path}/signatures")
        if mode == "append":
            # the signatures dir now holds corpus + shard; band-expand
            # only the appended shard rows
            shard_sig = shard_sig.join(
                F.broadcast(docs.select(F.col(id_col).alias("id"))), "id", "semi"
            )
    band_entries(shard_sig, num_hashes, bands).write.mode(
        mode
    ).partitionBy("band").parquet(f"{path}/bands")
    meta = {
        "k": k,
        "num_hashes": num_hashes,
        "bands": bands,
        "signature": signature,
    }
    if mode != "append" or read_lsh_meta(spark, path) is None:
        _write_lsh_meta(spark, path, meta)


def read_lsh_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted LSH index → ``(signatures, bands)`` frames
    with the exact schemas :func:`band_entries` produces (band is
    partition-encoded; cast back to int for join parity). An index
    built from an EMPTY corpus has a bands dir with no partition
    directories at all (a partitioned write of zero rows emits no
    files), so schema inference has nothing to read — that ONE case
    (checked explicitly: no ``band=*`` subdirectories) falls back to
    an empty frame typed off the signatures schema. Every other
    failure — corrupt footer, permissions, transient FS error, typo'd
    path — propagates: a blanket fallback here would silently answer
    "no corpus candidates" and turn an infrastructure fault into a
    wrong dedup result."""
    _, hpath, fs = _index_fs(spark, path)
    sig = spark.read.parquet(f"{path}/signatures")
    bands_dir = hpath(f"{path}/bands")
    has_partitions = fs.exists(bands_dir) and any(
        st.isDirectory() and st.getPath().getName().startswith("band=")
        for st in fs.listStatus(bands_dir)
    )
    if has_partitions:
        bands = spark.read.parquet(f"{path}/bands").select(
            "id", F.col("band").cast("int").alias("band"), "bucket"
        )
    else:
        id_type = sig.schema["id"].dataType.simpleString()
        bands = spark.createDataFrame(
            [], f"id {id_type}, band int, bucket long"
        )
    return sig, bands


def verify_lsh_index(spark, path: str, bands: int | None = None) -> dict:
    """Consistency report for a persisted LSH index. The signatures
    table is the source of truth (:func:`build_lsh_index` commits it
    first), so the torn-append states are:

    - ``missing_band_ids`` — signature ids with NO band entries (the
      crash-between-writes state; probes silently never surface these
      docs as candidates);
    - ``incomplete_band_ids`` — ids with some but not ``bands``
      entries (not producible by the job-level commit, would indicate
      task-level tearing or external edits);
    - ``orphan_band_ids`` — band entries whose id has no signature
      (scoring would drop them; also not producible by write order).

    ``consistent`` is True iff all three are zero. Cost: one scan of
    each table — run on recovery/startup, not per batch."""
    meta = read_lsh_meta(spark, path)
    if bands is None:
        if meta is None:
            raise ValueError(
                f"LSH index at {path} has no _meta and no explicit "
                "bands= was given"
            )
        bands = int(meta["bands"])
    sig, bands_df = read_lsh_index(spark, path)
    per_id = bands_df.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    joined = sig.select("id").join(per_id, "id", "left").select("n")
    counts = joined.agg(
        F.count(F.lit(1)).alias("n_sig"),
        F.sum(F.when(F.col("n").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(
            F.when(F.col("n").isNotNull() & (F.col("n") != bands), 1).otherwise(0)
        ).alias("incomplete"),
    ).first()
    orphans = per_id.join(sig.select("id"), "id", "left_anti").count()
    missing = int(counts["missing"] or 0)
    incomplete = int(counts["incomplete"] or 0)
    return {
        "signatures": int(counts["n_sig"]),
        "missing_band_ids": missing,
        "incomplete_band_ids": incomplete,
        "orphan_band_ids": int(orphans),
        "bands_per_id": bands,
        "consistent": missing == 0 and incomplete == 0 and orphans == 0,
    }


def repair_lsh_index(spark, path: str) -> dict:
    """Repair a torn append so probe correctness is restored:
    signature ids missing their band entries are re-expanded from the
    persisted signatures (a cheap projection — no re-shingling) and
    appended; the pathological states (incomplete/orphan entries)
    rebuild the whole bands table from signatures, which is always
    sound because bands are a pure function of signatures. Idempotent,
    and preserves ``incremental == full``: the repaired index is
    content-identical to one whose appends never tore. Returns the
    post-repair :func:`verify_lsh_index` report."""
    meta = read_lsh_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"LSH index at {path} has no _meta — rebuild it with "
            "build_lsh_index(mode='overwrite')"
        )
    num_hashes, n_bands = int(meta["num_hashes"]), int(meta["bands"])
    report = verify_lsh_index(spark, path, bands=n_bands)
    if report["consistent"]:
        return report
    sig, bands_df = read_lsh_index(spark, path)
    if report["incomplete_band_ids"] or report["orphan_band_ids"]:
        from ..sources.io import replace_parquet_atomic

        replace_parquet_atomic(
            spark,
            band_entries(sig, num_hashes, n_bands),
            f"{path}/bands",
            partition_by=["band"],
        )
    else:
        missing_sig = sig.join(
            bands_df.select("id").dropDuplicates(["id"]), "id", "left_anti"
        )
        band_entries(missing_sig, num_hashes, n_bands).write.mode(
            "append"
        ).partitionBy("band").parquet(f"{path}/bands")
    return verify_lsh_index(spark, path, bands=n_bands)


def compact_lsh_index(
    spark, path: str, target_file_mb: int = 256
) -> dict:
    """Small-file compaction for a persisted LSH index. Daily
    ``mode="append"`` shards add one parquet file per band partition
    per day — a year of daily increments is ~365 files per band
    directory, and probe scan planning degrades with file count, not
    data size. Rewrites ``signatures`` (plain) and ``bands``
    (partition-preserving: still ``band=*`` directories, ~1 file per
    target size per partition) via atomic rename swaps.

    Content-identical by construction — only file layout changes — so
    ``incremental == full`` and every probe/pair result is bit-for-bit
    unchanged (pinned by tests). Run it on the same cadence as any
    warehouse compaction (weekly, or when file counts cross a
    threshold — :func:`..sources.io.table_file_stats` reports them).
    Returns before/after file counts."""
    from ..sources import io as IO

    before_sig = IO.parquet_file_count(spark, f"{path}/signatures")
    before_bands = IO.parquet_file_count(spark, f"{path}/bands")
    IO.compact_parquet(spark, f"{path}/signatures", target_file_mb)
    IO.compact_partitioned_parquet(
        spark, f"{path}/bands", ["band"], target_file_mb
    )
    return {
        "signatures_files": (
            before_sig,
            IO.parquet_file_count(spark, f"{path}/signatures"),
        ),
        "bands_files": (
            before_bands,
            IO.parquet_file_count(spark, f"{path}/bands"),
        ),
    }


def incremental_lsh_pairs(
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    signature: str = "poly",
    update_index: bool = True,
    broadcast_new: bool = True,
    signatures: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental near-dup detection: today's shard vs a persisted
    corpus LSH index, WITHOUT recomputing anything over the corpus.

    Hot-bucket posture (VERDICT r9 #1): the shard-internal leg runs
    the structural guard (``banded_pairs`` collapses identical
    signatures). The corpus-vs-shard leg CANNOT collapse without
    shuffling the persisted corpus by signature — the exact cost this
    path exists to avoid — so its defense is ``max_bucket_size``: a
    per-(band,bucket) cap on CORPUS entries joined against the shard
    (one count aggregate over the index scan, co-partitioned with the
    probe join key). Boilerplate-flooded buckets are skipped as
    candidates — a recall trade the caller opts into and can account
    for by re-running the count aggregate; unset (default) is exact.

    Returns every near-dup pair touching ≥1 new document —
    new-vs-corpus plus new-vs-new — scored and thresholded exactly
    like :func:`banded_pairs`, with ``id_a < id_b``. Equivalence
    contract (tested): given disjoint ids,
    ``full_pairs(corpus ∪ shard) == full_pairs(corpus) ∪
    incremental_lsh_pairs(shard, index(corpus))`` — signatures and
    band buckets are per-document, so restricting candidate
    generation to pairs touching the shard loses nothing.

    Scale shape: the corpus index is SCANNED once and never shuffled —
    with ``broadcast_new=True`` (default) the shard's band entries
    (|shard| × bands rows of three small columns) broadcast onto the
    band table, so the day's cost is O(|shard| + |index| scan +
    |candidates|), independent of corpus *shuffle* volume. Set
    ``broadcast_new=False`` when the shard itself is too large to
    broadcast (falls back to a hash join on (band, bucket)). Corpus
    signatures join only against the deduped candidate ids. With
    ``update_index=True`` the shard's signatures and band entries are
    appended to the index FIRST (eager; the shingle→signature pipeline
    runs exactly once, inside the signature write) and the returned
    pair plan is derived entirely from the on-disk index via
    semi/anti joins on the shard's id set — evaluating it re-reads
    parquet, never re-shingles — so index-update ∘ apply composes to
    exactly the full-recompute index.

    Recovery contract: with ``update_index=True`` the append is EAGER
    and happens before the caller consumes the pairs — a crash after
    the append but before the caller durably lands its pairs means a
    replayed run must NOT skip the shard based on "ids already
    indexed" alone (that degrades pairs to at-most-once). Batch
    callers that need exactly-once pair output should emit pairs
    first with ``update_index=False`` then append — that ordering is
    what :func:`...streaming.incremental.lsh_sink_batch` implements.
    A crash inside the append itself can tear signatures/bands; run
    :func:`repair_lsh_index` on recovery. ``signatures`` (used with
    ``update_index=False``) passes a precomputed signature frame for
    the shard so the shingle pipeline is not re-evaluated here —
    lineage-free (``localCheckpoint``) if its plan reads this index,
    see :func:`build_lsh_index`."""
    spark = new_docs.sparkSession
    new_ids = new_docs.select(F.col(id_col).alias("id"))
    if broadcast_new:
        new_ids = F.broadcast(new_ids)
    if update_index:
        # append the shard eagerly (the shingle→signature pipeline
        # runs exactly once, inside the write), then derive EVERY
        # frame below from the on-disk index — evaluating the
        # returned pairs never re-shingles anything
        build_lsh_index(
            new_docs, index_path, id_col, text_col, k, num_hashes,
            bands, signature, mode="append",
        )
        sig_all, bands_all = read_lsh_index(spark, index_path)
        new_sig = sig_all.join(new_ids, "id", "semi")
        corpus_sig = sig_all.join(new_ids, "id", "left_anti")
        new_bands = bands_all.join(new_ids, "id", "semi")
        corpus_bands = bands_all.join(new_ids, "id", "left_anti")
    else:
        if signatures is not None:
            new_sig = signatures
        else:
            # the shard signature pipeline feeds THREE consumers (the
            # broadcast band side, the cross-leg scoring join, the
            # shard-internal banded_pairs) and a broadcast exchange
            # never reuses a shuffle exchange — cut it once. Shard-
            # sized state (|shard| × 64 ints), never corpus-sized.
            new_sig = _sig_fn(signature)(
                new_docs, id_col, text_col, k, num_hashes
            ).localCheckpoint(eager=True)
        new_bands = band_entries(new_sig, num_hashes, bands)
        corpus_sig, corpus_bands = read_lsh_index(spark, index_path)
    nb = F.broadcast(new_bands) if broadcast_new else new_bands
    if max_bucket_size is not None:
        ok = (
            corpus_bands.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
        corpus_bands = corpus_bands.join(ok, ["band", "bucket"])
    # keep (corpus id, shard id) orientation through scoring so each
    # side joins its OWN signature source (no corpus∪shard union scan);
    # canonicalize to id_a < id_b only at the end — the Jaccard
    # estimate is symmetric
    old_new = (
        corpus_bands.alias("o")
        .join(nb.alias("n"), ["band", "bucket"])
        .filter(F.col("o.id") != F.col("n.id"))
        .select(F.col("o.id").alias("id_a"), F.col("n.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    old_new_scored = _score_candidates(
        old_new, corpus_sig, new_sig, num_hashes, threshold
    ).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "est_jaccard",
    )
    new_new_scored = banded_pairs(
        new_sig, num_hashes, bands, threshold, max_bucket_size
    )
    # the two pair sets are disjoint by construction (one touches the
    # corpus, the other is shard-internal) — plain union, no re-dedup
    return old_new_scored.unionByName(new_new_scored)


def simhash_poly(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bits: int = 60,
    prime: int = 2147483647,
) -> DataFrame:
    """SQL-replicable SimHash: each fingerprint bit j is the sign of
    Σ over grams of ±1, where the per-gram vote is bit-balanced by the
    affine family ((a_j·h + b_j) mod p ≥ (p+1)/2). Like
    :func:`minhash_signatures_poly`, every intermediate is exact
    integer arithmetic — the fingerprint longs hash-match an ANSI-SQL
    twin bit for bit (the xxhash :func:`simhash_long` is rows-only
    checkable). ``bits`` ≤ 62 keeps the packed long positive in both
    engines. Plan: explode grams → one groupBy with ``bits`` sums.
    """
    half = (prime + 1) // 2
    idx = TX.char_gram_hashes(df, id_col, text_col, k).select(
        "id", F.col("h").cast("long").alias("h")
    )
    params = _universal_hash_params(bits, seed=4242)
    # one parsed expression per vote / for the packed fold (round-13,
    # see minhash_signatures — same trees, none of the py4j cost)
    votes = [
        F.expr(
            f"sum(CASE WHEN pmod(`h` * {a} + {b}, {int(prime)}) >= {half} "
            f"THEN 1 ELSE -1 END) AS s{j}"
        )
        for j, (a, b) in enumerate(params)
    ]
    agg = idx.groupBy("id").agg(*votes)

    def bit_sql(j: int) -> str:
        return (
            f"CASE WHEN `s{j}` >= 0 THEN CAST(1 AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"
        )

    fp = F.expr(
        "("
        + bit_sql(0)
        + "".join(
            f" + ({bit_sql(j)} * CAST({1 << j} AS BIGINT))"
            for j in range(1, bits)
        )
        + ")"
    )
    return agg.select("id", fp.alias("fingerprint"))


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
) -> DataFrame:
    """Entity-resolution pairs at edit distance ≤ 1 via symmetric-
    delete blocking (the SymSpell construction): two strings within
    one edit ALWAYS share a member of each other's {self} ∪
    {one-char-deletions} sets, so exploding those variants and
    equi-joining on the variant finds every pair without any |corpus|²
    stage — the naive all-pairs levenshtein is quadratic and
    unshippable at scale. Candidates are deduped, then the exact
    ``levenshtein`` filter (JVM-side) removes the false positives
    (distance-2 pairs sharing a variant).

    Output: (id_a, id_b, s_a, s_b, dist) with id_a < id_b, dist ≤ 1.
    Row amplification = string length (bounded); the variant join is
    a hash equi-join on short strings.
    """
    s = F.col(s_col)
    deletes = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    v = df.select(
        F.col(id_col).alias("id"),
        s.alias("s"),
        F.explode(F.array_union(F.array(s), deletes)).alias("variant"),
    )
    a, b = v.alias("a"), v.alias("b")
    # pre-filter dedup STAYS (round-13 measured both orders, as for
    # the minhash family): near-identical strings share ~len variants,
    # and since most of them belong to pairs that PASS the distance
    # filter here, postponing the dedup re-ran levenshtein on the
    # ~20×-duplicated stream and re-shuffled almost the same rows —
    # interleaved A/B read 0.71× for the postponed form.
    cand = (
        a.join(b, "variant")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("s_a"),
            F.col("b.s").alias("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # banded levenshtein (threshold=1): O(len) per pair instead of
    # O(len²), returns -1 when the distance exceeds the bound — kept
    # rows and their dist values are identical to the unbounded form
    return cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b", 1)
    ).filter((F.col("dist") >= 0) & (F.col("dist") <= 1))


def substring_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 40,
    min_docs: int = 2,
) -> DataFrame:
    """EXACT substring deduplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    operation, re-expressed relationally): find every maximal span of
    a document covered by overlapping-or-adjacent ``k``-char windows
    that each occur in at least ``min_docs`` distinct documents — the
    boilerplate/licence-header/template regions a training pipeline
    clips out, which whole-document dedup (exact/MinHash/SimHash
    above) cannot see because the surrounding text differs.

    Span semantics, precisely: the gaps-and-islands merge starts a
    new island only when a hit position exceeds the previous
    window's END + 1, so a span guarantees every char of it lies
    inside SOME duplicated window (coverage), and duplicated windows
    up to k-1 positions apart (still overlapping/adjacent in char
    terms) merge into one span. It does NOT guarantee that every
    k-char window STARTING inside the span is itself duplicated —
    that stricter per-start property would need the island break
    ``pos > prev_pos + 1`` and clips spans at the last duplicated
    start. Coverage is the Lee et al. clipping contract (the merged
    region is exactly the text removable as duplicated bytes).

    Relational plan (no suffix array needed for fixed-k windows):
    every stride-1 window is generated JVM-side (``transform`` over a
    position ``sequence``, windows materialized inside the struct so
    exploded rows never carry the full text), duplicated windows are
    one groupBy, and maximal spans are the gaps-and-islands merge of
    each doc's hit positions. Output: one row per (doc, span) —
    ``(doc_id, span_idx, span_start, span_end, span_len,
    n_windows)``, 1-based inclusive char positions.

    Scale (100 TB): row amplification is |text| per doc but each
    exploded row is k chars + 2 ints; the window groupBy is the one
    big shuffle and keys are near-unique (no skew by construction —
    a window string is its own uniform key; at petabyte scale swap
    the string key for ``xxhash64(win)`` to shuffle 8 bytes instead
    of k — same plan shape). The islands stage shuffles only the
    duplicated hits. No Python anywhere."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    s = F.col(text_col)
    empty = F.array().cast(f"array<struct<pos:int,win:string>>")
    wins = df.select(
        F.col(id_col).alias(id_col),
        F.explode(
            F.when(
                F.length(s) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - k + 1),
                    lambda i: F.struct(
                        i.alias("pos"), s.substr(i, F.lit(k)).alias("win")
                    ),
                ),
            ).otherwise(empty)
        ).alias("w"),
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.win").alias("win"))
    dup = (
        wins.groupBy("win")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("win")
    )
    hits = wins.join(dup, "win", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_isl = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        hits.withColumn(
            "span_idx",
            F.sum(new_isl).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "span_idx")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .withColumn("span_len", F.col("span_end") - F.col("span_start") + 1)
        .select(
            id_col, "span_idx", "span_start", "span_end", "span_len",
            "n_windows",
        )
    )
