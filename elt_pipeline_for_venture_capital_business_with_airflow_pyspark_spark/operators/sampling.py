"""Deterministic corpus-shaping operators: per-group caps and
weighted mixture expansion.

Training-data pipelines don't sample with ``rand()`` — a rerun must
produce byte-identical splits (the reference's determinism posture is
the same: its daily slices are pure functions of ``ds``,
`dags/vcapital_staging/tasks/components/extract.py:41-43`). Both
operators here order/repeat rows by *content hashes*, so every
executor, retry, and engine agrees on the result.

- ``cap_per_group`` — domain balancing: keep at most *k* rows per
  group, chosen by md5-hash order (a deterministic uniform shuffle).
  This is the standard guard against a single crawl domain dominating
  a pretraining mix. One shuffle (the window partition); at 100 TB the
  per-group state is a single counter, and heavily-capped groups can
  be pre-thinned map-side with a cheap hash-prefix filter.
- ``weighted_mix`` — epoch weighting: replicate each row
  ``weight(group)`` times with an epoch index (the "3 epochs of
  Wikipedia, 1 of CommonCrawl" recipe). Weights ride a broadcast join;
  expansion is a zero-shuffle generator explode, so the plan stays
  map-side and streams straight into a sink or pack stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "cap_per_group",
    "weighted_mix",
    "weighted_bernoulli_sample",
    "sample_negatives",
    "quota_mix",
    "pack_chunks",
]


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    *,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Keep at most *k* rows per group in deterministic md5-hash order.

    The hash of the id column is a stable stand-in for a random draw:
    uniform, engine-independent, and reproducible. The id itself is the
    final tiebreak so equal hashes (never in practice) stay total-ordered.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def weighted_mix(
    df: DataFrame,
    spark: SparkSession,
    group_col: str,
    weights: dict[str, int],
    *,
    default_weight: int = 1,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Replicate rows per-group ``weights[group]`` times (default
    *default_weight*), tagging each copy with a 1-based epoch index.

    The weight table is a broadcast join (KB-sized dim); the
    replication is ``explode(sequence(1, w))`` — pure map-side row
    generation, no shuffle, so the expanded mix never materializes
    more than one batch at a time.
    """
    wdf = spark.createDataFrame(
        [(g, int(w)) for g, w in sorted(weights.items())],
        schema=f"{group_col} string, _mix_weight int",
    )
    joined = df.join(F.broadcast(wdf), group_col, "left")
    w = F.coalesce(F.col("_mix_weight"), F.lit(default_weight))
    return (
        joined.withColumn(epoch_col, F.explode(F.sequence(F.lit(1), w)))
        .drop("_mix_weight")
    )


def weighted_bernoulli_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    max_weight: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted (importance) sampling: each row kept
    independently with probability ``clamp(weight, 0, max_weight) /
    max_weight`` — the quality-weighted corpus thinning step of a
    pretraining pipeline ("keep high-quality documents more often"),
    with the same determinism contract as :func:`cap_per_group`.

    The coin flip is the row's 32-bit md5 prefix of ``id || salt``
    compared against the row's weight — an EXACT integer inequality
    (``hash32 * max_weight < weight * 2^32``), no floats and no
    transcendental functions anywhere, so every engine, executor and
    retry agrees on membership bit-for-bit (pow/log differ in the
    last ulp across libms — enough to flip membership near the
    threshold). Max product 2^32 · max_weight must stay in BIGINT:
    enforced for max_weight up to ~2^30.

    A pure scan-stage filter: pushes no worse than any derived
    predicate, zero shuffles, composable with any downstream op.
    Change ``salt`` to draw an independent sample (new epoch) —
    membership across salts is uncorrelated but each is reproducible.
    """
    if not 0 < max_weight <= (1 << 30):
        raise ValueError("max_weight must be in (0, 2^30]")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    w = F.least(
        F.greatest(F.col(weight_col).cast("bigint"), F.lit(0)),
        F.lit(int(max_weight)),
    )
    return df.filter(h * F.lit(int(max_weight)) < w * F.lit(4294967296))


def _h32(*parts) -> F.Column:
    """32-bit md5 prefix of the concatenated parts — the repo's
    standard exact-integer determinism primitive."""
    cols = [p if isinstance(p, F.Column) else F.lit(str(p)) for p in parts]
    return F.conv(
        F.substring(F.md5(F.concat(*cols)), 1, 8), 16, 10
    ).cast("bigint")


def sample_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    label_col: str,
    k: int,
    n_buckets: int = 64,
    attempts: int = 6,
    salt: str = "neg1",
) -> DataFrame:
    """Deterministic distributed negative sampling for contrastive
    training pairs: up to ``k`` corpus items per query with a
    DIFFERENT label, drawn pseudo-uniformly — with NO cross join.

    The corpus is hashed once into ``n_buckets`` (md5 of the id —
    stable across runs/engines); each query probes ``attempts``
    pseudo-random buckets (md5 of query id × attempt index), giving
    ``attempts · corpus/n_buckets`` candidates per query through a
    plain equi-join on the bucket id. Candidates are deduped, label-
    filtered (NULL labels count as different — a null-labeled item is
    never a known positive), ranked by a per-(query, candidate) hash
    and cut at ``k`` — every step an exact integer function of ids,
    so the sample is bit-reproducible and oracle-checkable.

    Scale sizing: pick ``n_buckets ≈ |corpus| / 32`` so each query
    sees ~``32 · attempts`` candidates regardless of corpus size —
    total cost linear in |queries|, never |queries|·|corpus|. Fewer
    than ``k`` negatives come back only when the probed buckets are
    label-starved (raise ``attempts``). Change ``salt`` for a fresh
    epoch; samples across salts are uncorrelated, each reproducible.
    """
    c = corpus.select(
        F.col(id_col).alias("__cid"),
        F.col(label_col).alias("__clabel"),
        (_h32(salt + "b", F.col(id_col).cast("string")) % n_buckets).alias(
            "__b"
        ),
    )
    q = (
        queries.select(
            F.col(id_col).alias("__qid"),
            F.col(label_col).alias("__qlabel"),
        )
        .withColumn(
            "__attempt", F.explode(F.array(*[F.lit(i) for i in range(attempts)]))
        )
        .withColumn(
            "__b",
            _h32(
                salt + "q",
                F.col("__qid").cast("string"),
                F.lit("#"),
                F.col("__attempt").cast("string"),
            )
            % n_buckets,
        )
    )
    cand = (
        q.join(c, "__b")
        .filter(
            (F.col("__qid") != F.col("__cid"))
            & ~F.col("__qlabel").eqNullSafe(F.col("__clabel"))
        )
        .select("__qid", "__cid")
        .distinct()
    )
    rk = _h32(
        salt + "r",
        F.col("__qid").cast("string"),
        F.lit("@"),
        F.col("__cid").cast("string"),
    )
    w = Window.partitionBy("__qid").orderBy(rk, F.col("__cid"))
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__cid").alias("neg_id"),
            "neg_rank",
        )
    )


def quota_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    total_n: int,
    *,
    weights_ppm: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Exact-quota dataset mixing by the largest-remainder method —
    the "compose a 1B-doc training mix as 30% web / 25% code / ..."
    step, with integer-exact apportionment instead of per-row coin
    flips (Bernoulli mixing misses small targets by O(sqrt(n)); a
    quota mix hits each source's count exactly).

    Apportionment (all BIGINT arithmetic, no floats anywhere):

    - ``weights_ppm`` given (parts-per-million, must sum to 1e6):
      ideal_i = total_n * ppm_i; base_i = ideal_i div 1e6; the
      ``total_n - sum(base)`` leftover seats go to the largest
      remainders ``ideal_i mod 1e6`` (ties -> lexicographically
      smaller source — deterministic, engine-agnostic).
    - ``weights_ppm`` omitted: proportional (stratified) to observed
      source sizes — same method with denominator N = sum(n_j).

    Row selection inside each source is md5-hash order (the repo's
    deterministic-shuffle primitive, cf. :func:`cap_per_group`):
    ``row_number() over (partition by source order by md5(id||salt),
    id) <= quota``. Change ``salt`` for an independent draw.

    A source whose quota exceeds its row count yields all its rows
    and the mix undershoots ``total_n`` — deliberate (silently
    stealing the shortfall from other sources would skew the stated
    ratios; fix the weights instead). NULL sources are never sampled.
    ``id_col`` must be non-null: a NULL id hashes to a NULL selection
    key whose sort position is engine-dependent (Spark NULLS FIRST vs
    ANSI NULLS LAST) — filter NULL ids upstream for reproducibility.

    Scale shape: the per-source count aggregate and the
    largest-remainder ranking run over the DISTINCT-source frame
    (KB-state — corpus mixes have tens of sources, never data-sized);
    quotas broadcast back onto the corpus scan, and the only
    data-sized exchange is the per-source row_number partition — one
    shuffle, same as any per-group top-k."""
    if total_n < 0:
        raise ValueError("total_n must be >= 0")
    if weights_ppm is not None:
        ssum = sum(weights_ppm.values())
        if ssum != 1_000_000:
            raise ValueError(f"weights_ppm must sum to 1_000_000, got {ssum}")
        spark = df.sparkSession
        # seat apportionment runs over the WEIGHT TABLE alone, never
        # the observed sources: a weighted source absent from the data
        # keeps its seats and simply undershoots (same no-stealing
        # policy as a too-small source) — redistributing its quota
        # would silently skew the stated ratios. Caught by the
        # null-heavy sweep in round 9 (a fully-nulled source flipped
        # the leftover count).
        seats_src = spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(weights_ppm.items())],
            schema=f"{source_col} string, _ppm bigint",
        ).select(
            source_col,
            F.lit(1_000_000).cast("bigint").alias("_denom"),
            (F.lit(int(total_n)).cast("bigint") * F.col("_ppm")).alias(
                "_ideal"
            ),
        )
    else:
        seats_src = (
            df.filter(F.col(source_col).isNotNull())
            .groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(
                source_col,
                F.sum("_n").over(Window.partitionBy()).alias("_denom"),
                (F.lit(int(total_n)).cast("bigint") * F.col("_n")).alias(
                    "_ideal"
                ),
            )
        )
    # `div` = exact BIGINT division (the `/` operator is double and
    # loses exactness past 2^53 — total_n * count overflows that fast)
    seats = seats_src.selectExpr(
        source_col,
        "_ideal div _denom AS _base",
        "_ideal % _denom AS _rem",
    ).withColumn(
        "_leftover",
        F.lit(int(total_n)) - F.sum("_base").over(Window.partitionBy()),
    )
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("_rem").desc(), F.col(source_col))
    )
    quotas = seats.select(
        source_col,
        (
            F.col("_base")
            + F.when(rank <= F.col("_leftover"), F.lit(1)).otherwise(F.lit(0))
        ).alias("_quota"),
    )
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    rn = F.row_number().over(
        Window.partitionBy(source_col).orderBy(key, F.col(id_col))
    )
    return (
        df.filter(F.col(source_col).isNotNull())
        .join(F.broadcast(quotas), source_col)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def pack_chunks(
    df: DataFrame,
    id_col: str,
    len_col: str,
    chunk_size: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Concat-then-chunk sequence packing — the pretraining batching
    step: documents are laid end-to-end in a deterministic global
    order (md5-hash shuffle, the repo's standard draw) and the
    resulting token stream is cut into fixed ``chunk_size`` pieces;
    each output row maps one (document, chunk) overlap with exact
    offsets. This is the classic GPT-lineage packing (documents split
    across chunk boundaries, no padding waste) as opposed to no-split
    bin packing, whose remainder-reset recurrence is inherently
    sequential — concat-then-chunk is what scales.

    Output: one row per (doc, chunk) overlap —
    ``(id, chunk_id, doc_off, chunk_off, n_toks)`` with
    ``doc_off``/``chunk_off`` the segment's start inside the document
    / chunk. Every value is exact BIGINT arithmetic over the global
    prefix sum. Rows with NULL or non-positive ``len_col`` are
    excluded (an empty document occupies no stream positions).

    Scale shape: the global prefix sum is
    :func:`..features.partitioned_cumsum` — two-phase bucketed cumsum,
    NO single-reducer sort — and the chunk fan-out is a map-side
    ``explode(sequence(first, last))``; per-doc fan-out is bounded by
    ``len/chunk_size + 1``. One ranking-bucket exchange end to end.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    from .features import partitioned_cumsum

    rows = df.filter(
        F.col(len_col).isNotNull() & (F.col(len_col) > 0)
    ).select(
        F.col(id_col).alias("id"),
        F.col(len_col).cast("bigint").alias("_len"),
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_h"),
    )
    cum = partitioned_cumsum(
        rows, [F.col("_h"), F.col("id")], "_len", out_col="_cum"
    )
    B = F.lit(int(chunk_size)).cast("bigint")
    start = (F.col("_cum") - F.col("_len")).alias("_start")
    spans = cum.select(
        "id",
        "_len",
        start,
        F.expr(f"(_cum - _len) div {int(chunk_size)}").alias("_first"),
        F.expr(f"(_cum - 1) div {int(chunk_size)}").alias("_last"),
    )
    seg = spans.select(
        "id",
        "_len",
        "_start",
        F.explode(F.sequence(F.col("_first"), F.col("_last"))).alias("chunk_id"),
    )
    seg_start = F.greatest(F.col("_start"), F.col("chunk_id") * B)
    seg_end = F.least(F.col("_start") + F.col("_len"), (F.col("chunk_id") + 1) * B)
    return seg.select(
        "id",
        "chunk_id",
        (seg_start - F.col("_start")).alias("doc_off"),
        (seg_start - F.col("chunk_id") * B).alias("chunk_off"),
        (seg_end - seg_start).alias("n_toks"),
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic per-epoch global shuffle + reshard — the
    dataloader step of a pretraining pipeline: every epoch the corpus
    is visited in a fresh pseudo-random order, and that order must be
    REPRODUCIBLE (across engines, executors, retries and restarts —
    rand() is none of these) so a crashed epoch resumes at an exact
    position.

    Order key = 32-bit md5 prefix of ``"{epoch}:{id}"`` (the repo's
    exact-integer determinism primitive, :func:`_h32` — restatable in
    ANSI SQL); ``shard = key mod n_shards`` balances output shards;
    ``pos`` ranks within a shard by ``(key, id)`` — a per-shard
    window, never a global sort. Different epochs give uncorrelated
    orders; the same epoch is bit-identical every run.

    Size ``n_shards`` to the consumer's parallelism (files, workers)
    — the ranking window's parallelism IS n_shards, so at 100 TB use
    thousands, not eight. Rows with NULL ids are EXCLUDED: an
    unidentifiable row has no stable position by definition.

    Output: input columns + ``(shuffle_key, shard, pos)`` with pos
    starting at 1 per shard."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = _h32(F.lit(f"{epoch}:"), F.col(id_col).cast("string"))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("shuffle_key", key)
        .withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(int(n_shards))).cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )
