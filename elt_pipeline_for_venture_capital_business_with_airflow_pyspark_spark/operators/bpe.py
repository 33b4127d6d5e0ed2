"""Byte-pair-encoding tokenizer training and application — the
training-data pipeline's tokenizer, learned ON the corpus with Spark
doing the counting.

The reference pipeline stops at loading text; a pretraining corpus
additionally needs a tokenizer fit to it (Sennrich et al. 2016). The
expensive parts of BPE training are exactly Spark's strengths: the
word-frequency vocabulary is one groupBy over the corpus (Heap's-law
bounded but data-derived — it stays DISTRIBUTED, never collected),
and each merge round is one pair-count aggregation over that vocab.
Only the single winning pair per round comes back to the driver
(n_merges one-row collects — bounded metadata), which then becomes a
LITERAL in the next round's plan.

Merge-application contract (pinned cross-engine, byte-for-byte): a
merge replaces non-overlapping leftmost occurrences of the pair in
one scan WITHOUT re-scanning replaced text — ``replace(' a b ',
...)`` semantics, identical in Spark and DuckDB. This deviates from
rescan-greedy BPE only on runs of ≥3 repeats of one symbol inside a
single word (``'aaaa'`` merges to ``aa a a`` in the round, and the
leftover pair merges in a later round if still most frequent);
pair-count ties break by (pair_freq DESC, left ASC, right ASC), so
training is fully deterministic.

Pre-tokenization lowercases and keeps ``[a-z]+`` runs — symbols are
always ASCII, making string comparisons and merge replacement
identical across engines regardless of the corpus's unicode content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["word_vocab", "learn_bpe", "apply_bpe", "apply_bpe_large"]


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(sym, freq): space-joined character symbols per distinct word
    with corpus frequency. One explode + one groupBy; the vocabulary
    is corpus-derived but Heap's-law bounded, and it never leaves the
    executors."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
    ).filter(F.col("w") != "")
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("freq")).select(
        F.array_join(F.split(F.col("w"), ""), " ").alias("sym"),
        "freq",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.expr(
        "zip_with(slice(split(sym, ' '), 1, size(split(sym, ' ')) - 1), "
        "         slice(split(sym, ' '), 2, size(split(sym, ' ')) - 1), "
        "         (x, y) -> struct(x AS l, y AS r))"
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("f"))
    )


def learn_bpe(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus. Returns a small
    frame ``(merge_rank, merge_left, merge_right, pair_freq)`` — the
    tokenizer. Each round: one distributed pair-count aggregation +
    a one-row TakeOrdered collect; the vocab carries the applied
    merges as a lazy column chain, persisted per round so round i
    does not recount rounds 1..i-1. Stops early (fewer rows) when no
    pair remains."""
    vocab = word_vocab(df, text_col).persist()
    merges: list[tuple[int, str, str, int]] = []
    cur, parent = vocab, None
    for rank in range(1, n_merges + 1):
        # this collect aggregates over EVERY partition of cur, so it
        # fills cur's (lazy) cache as a side effect — the PARENT
        # round's cache can be dropped right after, and no separate
        # count() materialization job is needed (one job per round
        # instead of two, same O(1) corpus scans per round as the
        # former count()-then-unpersist shape).
        top = (
            _pair_counts(cur)
            .orderBy(F.col("f").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if parent is not None:
            parent.unpersist()
            parent = None
        if not top:
            break
        l, r, f = top[0]["l"], top[0]["r"], top[0]["f"]
        merges.append((rank, l, r, int(f)))
        nxt = cur.withColumn(
            "sym",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                    F.lit(f" {l} {r} "),
                    F.lit(f" {l}{r} "),
                )
            ),
        ).persist()
        parent, cur = cur, nxt
    if parent is not None:
        parent.unpersist()
    cur.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank int, merge_left string, merge_right string, pair_freq bigint"
    )


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word
    (same ``[a-z]+`` pre-tokenization as training), apply each merge
    in rank order with the training-time replacement contract, then
    flatten word tokens into one document token array. The merge list
    is a LITERAL folded into a single JVM expression chain — no UDF,
    no shuffle, a pure scan-stage map at any corpus size."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda w: w != ""
    )
    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(
                words,
                lambda w: F.split(
                    F.trim(
                        _apply_merges_str(
                            F.concat(
                                F.lit(" "),
                                F.array_join(F.split(w, ""), " "),
                                F.lit(" "),
                            ),
                            merges,
                        )
                    ),
                    " ",
                ),
            )
        ),
    )


def _apply_merges_str(expr, merges: list[tuple[str, str]]):
    for l, r in merges:
        expr = F.replace(expr, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
    return expr


def apply_bpe_large(
    df: DataFrame,
    text_col: str,
    merges,
    out_col: str = "tokens",
) -> DataFrame:
    """Production-vocab tokenization: same semantics as ``apply_bpe``
    but the merge list travels as a BROADCAST variable into an
    Arrow-batched ``mapInPandas`` stage instead of being folded into
    a literal expression chain. ``apply_bpe``'s fold is the right
    plan for oracle-sized vocabs (pure JVM, zero Python), but its
    expression tree grows linearly with the merge count — a 32k-merge
    production vocab would blow the plan (codegen size, analysis
    time). Here the plan is ONE map stage regardless of vocab size;
    the per-batch cost is a Python loop over words applying plain
    ``str.replace`` — the exact same non-rescanning leftmost
    replacement contract as the JVM fold (Java ``String.replace`` and
    Python ``str.replace`` share it), so outputs are row-identical
    (pinned by tests on the 8-merge fixture).

    ``merges`` is a list of (left, right) pairs in rank order, or a
    ``learn_bpe`` result frame (collected here — n_merges rows of two
    short strings, bounded tokenizer metadata, the artifact every
    tokenizer ships). Zero shuffles; scales to any corpus size as a
    scan-stage map."""
    if isinstance(merges, DataFrame):
        merge_list = [
            (r["merge_left"], r["merge_right"])
            for r in merges.orderBy("merge_rank").collect()
        ]
    else:
        merge_list = [(l, r) for l, r in merges]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(merge_list)

    import re

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )
    word_re = re.compile(r"[^a-z]+")

    def tokenize_batches(batches):
        pairs = [(f" {l} {r} ", f" {l}{r} ") for l, r in bc.value]
        # per-task word -> tokens memo: tokenization is a pure function
        # of the word, and corpus word occurrences repeat heavily
        # (Zipf), so the replace chain runs once per DISTINCT word per
        # task instead of once per occurrence. Bounded by vocabulary
        # size (Heap's law), like the merge list itself.
        cache: dict[str, list[str]] = {}

        def tok_word(w):
            t = cache.get(w)
            if t is None:
                s = " " + " ".join(w) + " "
                for old, new in pairs:
                    s = s.replace(old, new)
                t = s.split()
                cache[w] = t
            return t

        def tok(text):
            if text is None:
                return None  # parity with the JVM fold: NULL text → NULL
            doc: list[str] = []
            for w in word_re.split(str(text).lower()):
                if w:
                    doc.extend(tok_word(w))
            return doc

        for pdf in batches:
            col = pdf[text_col]
            pdf = pdf.copy()
            pdf[out_col] = [
                tok(v if v == v else None) if v is not None else None
                for v in col
            ]
            yield pdf

    return df.mapInPandas(tokenize_batches, out_schema)
