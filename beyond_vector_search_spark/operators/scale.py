"""Scale utilities: skew-salted joins and bucketed index tables.

These are the knobs the engine reaches for when a 100 TB run hits the
two classic wall-clock killers: a hot key (stopword-grade terms in the
postings join; a celebrity user in sessionization) and a repeated
shuffle of a large fact table on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def global_topk_ranked(
    df: DataFrame,
    k: int,
    *order_by,
    rank_col: str = "rank",
) -> DataFrame:
    """Global top-k with a positional rank, WITHOUT a global window.

    ``orderBy().limit(k)`` plans as TakeOrderedAndProject — each task
    keeps its local top-k and only those survivors merge — so the full
    relation is never shuffled to one partition.  A global
    ``row_number() OVER (ORDER BY ...)`` window, by contrast, moves
    EVERYTHING to a single partition (WindowExec warns exactly that):
    fine at 10k rows, fatal on a billion-term vocabulary.  The <= k
    survivors are then ranked by position on one sorted partition
    (monotonically_increasing_id on partition 0 numbers rows in sort
    order).  Keep the window form in DuckDB oracle SQL only.
    """
    top = df.orderBy(*order_by).limit(k)
    return (
        top.coalesce(1)
        .sortWithinPartitions(*order_by)
        .withColumn(rank_col, (F.monotonically_increasing_id() + 1).cast("integer"))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the large side's hot keys spread over ``salt`` buckets.

    The large side's salt is drawn per ROW POSITION
    (``monotonically_increasing_id() % salt``), NOT from the row's
    content: a hot key whose rows are byte-identical (50M copies of
    the same exploded token row — the classic skew shape) would all
    hash to ONE content bucket and straggle exactly like the unsalted
    join while still paying the small side's explosion.  Any salt
    value is join-correct (the small side is replicated across all
    ``salt`` values), so re-salting differently on a task retry is
    harmless.  The small side is exploded ``salt`` times; each
    (key, salt) shard lands in its own task, so one hot key occupies
    ``salt`` tasks instead of straggling on one.

    Use when AQE's skew-join splitting isn't available (e.g. the skew
    is in an aggregation feeding the join) or the skew factor is known
    up front.  Output columns = large ∪ small minus the helper salt.

    Only ``inner`` and ``left`` (large-side-preserving) joins are
    valid: the small side is exploded ``salt`` times, so any join kind
    that preserves unmatched small-side rows ('right'/'full'/...)
    would emit each of them once per salt value.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the small side is exploded per salt, so small-side-preserving "
            "joins would duplicate unmatched small rows"
        )
    salted_large = large.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return salted_large.join(exploded_small, [key, "_salt"], how).drop("_salt")


def save_bucketed_index(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a relation bucketed (and optionally sorted) by its join
    key.  Readers joining two tables bucketed the same way skip the
    shuffle AND the sort — for the postings/doc_vec index this turns
    every scoring join into a zip of co-located buckets.

    Bucketing requires the table catalog (``saveAsTable``); plain
    ``.parquet()`` files cannot carry bucket metadata.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def deterministic_sample(
    df: DataFrame,
    *,
    key_col: str,
    fraction: float,
    seed: int | None = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows by a portable hash of ``key_col``.

    Unlike ``df.sample()`` (rand()-based: different rows per run, per
    partitioning, per engine), the kept set is a pure function of the
    key — reproducible across engines, runs, and cluster sizes, and
    stable under re-partitioning.  This is the only sampling a
    training-data pipeline should use.
    """
    from beyond_vector_search_spark.functions.hashing import hash64

    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    cut = int(fraction * 1_000_000)
    return df.where(F.pmod(hash64(F.col(key_col), seed), F.lit(1_000_000)) < cut)


def mixture_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    weights: dict[str, float],
    default: float = 0.0,
    seed: int | None = None,
) -> DataFrame:
    """Deterministic weighted domain mixture: keep each stratum at its
    own hash fraction — the data-mixing step of a pretraining pipeline
    (up-/down-weighting sources or languages to a target mixture, as in
    the published Pile/Gopher/LLaMA mixture tables).

    ``weights`` maps stratum value -> keep fraction in [0, 1]; unlisted
    strata keep ``default``.  Mixtures have a handful of domains, so
    the fractions fold in as a literal CASE chain evaluated inside
    codegen against the portable md5 hash of ``key_col`` — no join, no
    shuffle, and membership is a pure function of the key: reproducible
    across engines, runs, cluster sizes, and re-partitionings.
    """
    from beyond_vector_search_spark.functions.hashing import hash64

    for k, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {k!r} must be in [0, 1], got {w}")
    cut = F.lit(int(default * 1_000_000))
    for k, w in weights.items():
        cut = F.when(F.col(strata_col) == k, F.lit(int(w * 1_000_000))).otherwise(cut)
    return df.where(F.pmod(hash64(F.col(key_col), seed), F.lit(1_000_000)) < cut)


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    seed: int | None = None,
) -> DataFrame:
    """Deterministic fixed-N-per-stratum sample: rows rank within their
    stratum by a portable hash of the key; the first N win.

    The only sampling a training-data pipeline should use: reproducible
    across engines, runs, and cluster sizes (``rand()``-based sampling
    is none of those), and per-stratum quotas hold exactly, unlike
    ``sampleBy`` fractions.  One shuffle (the window partition); at
    scale, strata are usually low-cardinality — if one stratum is
    hot, pre-aggregate candidates per partition first (top-N per
    partition then global re-rank, same result, bounded skew).

    Adds ``sample_rank`` (1..N within stratum).
    """
    from pyspark.sql import Window

    from beyond_vector_search_spark.functions.hashing import hash64

    w = Window.partitionBy(strata_col).orderBy(
        hash64(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("integer"))
        .where(F.col("sample_rank") <= n_per_stratum)
    )


def zorder_value(*cols, bits: int = 16):
    """Column: the Z-order (Morton) index of 1+ non-negative integer
    rank columns, ``bits`` bits each, interleaved MSB-first.

    The multi-dimensional data-layout lever: sorting/range-partitioning
    files by this value clusters rows that are close in EVERY key
    dimension, so parquet row-group min/max stats become selective for
    filters on ANY of the keys — the same reason Delta/Iceberg OPTIMIZE
    ZORDER exists, expressed as plain Spark (see :func:`write_zordered`).
    Inputs must already be small non-negative ints (use ``ntile`` or a
    width_bucket-style rank to get them — interleaving raw skewed
    values wastes high bits).  Pure bit arithmetic (shiftleft / bitwise
    or), codegen-side, deterministic across engines.
    """
    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):  # MSB first
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def _zorder_frame(
    df: DataFrame,
    *cols,
    bits: int = 10,
    n_buckets: int | None = None,
    exact: bool = False,
):
    """``(df + "_z" column, bits)`` — the rank-bucket + Morton-interleave
    stage of :func:`write_zordered`, factored out so its plan can be
    pinned shuffle-free by test.

    Default (``exact=False``): each key's bucket bounds come from ONE
    ``approxQuantile`` pass (Greenwald-Khanna sketch, per-partition
    merge — no shuffle, no window), and the per-row bucket is the
    count of bounds ≤ value, a codegen-side higher-order ``filter``
    over the literal bounds array.  Same z-space as exact ranking —
    quantile buckets, so skew cannot waste interleave bits — at
    sampled-bound precision (relativeError 1/(4·nb): a row lands at
    most a fraction of a bucket away from its exact-rank bucket,
    which moves it to an ADJACENT hyper-rectangle at worst; min/max
    pruning still holds).  This is the 100 TB path: the old
    ``ntile`` form moved the whole table through ONE partition.

    ``exact=True`` keeps the exact-rank ``ntile`` window for small
    inputs where exact bucket occupancy matters (equal-sized files).
    """
    from pyspark.sql import Window

    nb = n_buckets or (1 << bits)
    if nb > (1 << bits):
        # more rank buckets than interleave bits would silently drop
        # the rank's HIGH bits (bucket 2^bits aliases bucket 0 — rows
        # from opposite ends of the key space co-locate and the
        # min/max pruning guarantee dies).  Widen bits to cover nb.
        bits = (nb - 1).bit_length()
    ranked = df
    rank_cols = []
    if exact:
        for i, c in enumerate(cols):
            rc = f"_zr{i}"
            ranked = ranked.withColumn(
                rc, (F.ntile(nb).over(Window.orderBy(F.col(c))) - 1).cast("long")
            )
            rank_cols.append(rc)
    else:
        names = [c if isinstance(c, str) else df.select(c).columns[0] for c in cols]
        probs = [i / nb for i in range(1, nb)]
        all_bounds = df.select(
            *[F.col(n).cast("double").alias(n) for n in names]
        ).approxQuantile(names, probs, 1.0 / (4 * nb))
        for i, (c, bounds) in enumerate(zip(cols, all_bounds)):
            rc = f"_zr{i}"
            # clamp to nb-1: approxQuantile dups can make every bound
            # ≤ max-value rows' count reach nb on degenerate columns
            arr = F.array(*[F.lit(float(b)) for b in bounds])
            v = (F.col(c) if isinstance(c, str) else c).cast("double")
            ranked = ranked.withColumn(
                rc,
                F.least(
                    F.size(F.filter(arr, lambda b: b <= v)).cast("long"),
                    F.lit(nb - 1).cast("long"),
                ),
            )
            rank_cols.append(rc)
    zed = ranked.withColumn("_z", zorder_value(*rank_cols, bits=bits)).drop(*rank_cols)
    return zed, bits


def write_zordered(
    df: DataFrame,
    path: str,
    *cols,
    bits: int = 10,
    n_buckets: int | None = None,
    n_files: int = 8,
    exact: bool = False,
) -> None:
    """Write ``df`` as parquet Z-ordered on ``cols`` (numeric):
    each key is rank-bucketed to ``2^bits`` quantile buckets, rows are
    range-partitioned then sorted by the interleaved Z-value, and each
    output file covers a compact hyper-rectangle of the key space.

    Effect (pinned by test): a predicate on ANY of the z-ordered
    columns prunes most row groups via parquet min/max stats — the
    reader-side win that linear sort order only gives the FIRST sort
    key.  Bucketing is approxQuantile-sampled by default (no window,
    no single-partition shuffle — see :func:`_zorder_frame`); pass
    ``exact=True`` for the exact-rank ``ntile`` form on small inputs.
    """
    zed, bits = _zorder_frame(
        df, *cols, bits=bits, n_buckets=n_buckets, exact=exact
    )
    # Partition by the z-value's TOP bits via directory partitioning —
    # EXACT quadrant boundaries, where repartitionByRange's sampled
    # cuts would straddle them and smear two hyper-rectangles into one
    # file.  Each _zprefix directory is one compact hyper-rectangle of
    # the rank space; files inside sort by the full z for row-group-
    # level locality.
    file_bits = max(1, (n_files - 1).bit_length())
    total_bits = len(cols) * bits
    zed = zed.withColumn(
        "_zprefix", F.shiftright(F.col("_z"), max(0, total_bits - file_bits))
    )
    (
        zed.repartition(n_files, "_zprefix")
        .sortWithinPartitions("_zprefix", "_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("_zprefix")
        .parquet(path)
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: int | None = 7,
    key_decimals: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis (2006) one-pass reservoir, relational form:
    each row gets key = ln(u) · (w_max / w) with u a portable-hash
    uniform in (0, 1), and the global top-``n`` keys ARE a weighted
    sample without replacement (inclusion probability proportional to
    weight, the A-ES guarantee).

    Normalizing by the max weight makes the key magnitudes
    scale-INVARIANT: x^c is monotone on (0, 1), so dividing every
    weight by a positive constant provably preserves the A-ES ranking
    (u^(c/w) = (u^(1/w))^c), and it keeps absolute weights (1e7
    quality scores, raw token counts) from crushing every key onto the
    rounding grid — without it, ln(u)/w rounds to 0 for all rows once
    w >> 10^key_decimals and the "sample" degenerates to the id
    tie-break.

    This is the quality-weighted subsampling step of a curation
    pipeline ("keep 10M documents, preferring high quality-score") —
    deterministic_sample's uniform keep-set generalized to weights,
    and like it a pure function of (id, seed) and the weight RATIOS:
    reproducible across engines, runs, repartitioning, and cluster
    sizes, so the DuckDB oracle hash-matches.

    Shape: one narrow projection (hash + ln, codegen; w_max is a
    broadcast 1-row aggregate folded in lazily) + the
    TakeOrderedAndProject global top-n (per-task local top-n, no
    global window, nothing ever shuffles to one partition).  Rows with
    NULL or non-positive weight are excluded (zero weight = zero
    inclusion probability; A-ES requires w > 0).  Keys are rounded to
    ``key_decimals`` with id tie-break — the catalog's cross-engine
    ranking rule (ln differs by ulps between libm and the JVM).
    Precision note: at extreme scale the very top keys crowd near 0
    (|ln u| ~ n/N for the winners), so with the default 9 decimals the
    weight-proportionality of the top handful blurs into the id
    tie-break once N/n exceeds ~1e9 rows per kept row — raise
    ``key_decimals`` if that regime matters.
    """
    from beyond_vector_search_spark.functions.hashing import hash64

    m = 1_000_003  # prime modulus; +1 keeps u strictly inside (0, 1)
    u = (F.pmod(hash64(F.col(id_col), seed), F.lit(m)) + 1) / F.lit(
        float(m + 1)
    )
    w = F.col(weight_col).cast("double")
    wmax = (
        df.select(w.alias("_w"))
        .where(F.col("_w").isNotNull() & (F.col("_w") > 0))
        .agg(F.max("_w").alias("wmax"))
    )
    keyed = (
        df.where(w.isNotNull() & (w > 0))
        .crossJoin(F.broadcast(wmax))
        .withColumn(
            "es_key", F.round(F.log(u) * (F.col("wmax") / w), key_decimals)
        )
        .drop("wmax")
    )
    return global_topk_ranked(
        keyed, n, F.desc("es_key"), F.asc(id_col), rank_col="rank"
    )


def fill_token_budget(
    df: DataFrame,
    *,
    budget,
    score_col: str,
    token_col: str = "n_tokens",
    domain_col: str | None = None,
    id_col: str = "doc_id",
    n_buckets: int = 1000,
    levels: int = 2,
    _probe: dict | None = None,
) -> DataFrame:
    """(doc_id, domain, n_tokens, score, kept) — fill a per-domain TOKEN
    budget with the highest-scoring documents: the final assembly step
    of a curation pipeline ("1T tokens total: the best N_d tokens from
    each domain"), where mixture_sample's fractions are replaced by
    hard token counts.

    ``budget``: an int (same budget per domain) or a {domain: tokens}
    dict; domains absent from the dict get budget 0.  ``domain_col``
    None treats the corpus as one domain.

    Scale design — RECURSIVE histogram cutoff, NOT a global sort:
    ranking every document per domain and running a corpus-length
    cumsum is the classic single-partition killer.  Each level runs
    (a) per-domain min/max of the rounded score (one aggregation),
    (b) a fixed-width histogram of TOKEN MASS per (domain, bucket) —
    at most ``n_buckets`` rows per domain, (c) a cumulative sum over
    that tiny histogram from the top to find the cutoff bucket,
    (d) buckets above the cutoff keep wholesale with no per-doc
    ordering at all — and then RECURSES into the single cutoff bucket
    with the remaining budget.  After ``levels`` rounds the per-doc
    (score DESC, id ASC) running-cumsum window sees only
    ~1/n_buckets^levels of the domain (levels=2 with 1000 buckets:
    one millionth — a 1T-doc domain leaves a ~1M-doc window input, vs
    1B docs at one level).  Every histogram window is n_buckets rows.
    The narrowing stalls only when the cutoff bucket holds a single
    distinct rounded score (lo == hi) — ties are then decided by the
    id-ordered prefix window, which no bucketing can shrink.

    Deterministic: rounded scores, id tie-breaks, exact integer token
    sums.  Overshoot is zero — the kept set is the longest
    (score DESC, id ASC)-prefix whose token total stays ≤ budget.
    Documents with NULL score or NULL/negative tokens are dropped from
    the output entirely (they cannot be budgeted).

    ``_probe``: test hook — when a dict is passed, the final
    running-cumsum window's INPUT relation is stored under
    ``_probe["window_input"]`` so the ~n/n_buckets^levels bound above
    is a checked contract (tests/test_scale_ops.py), not a comment.
    """
    from pyspark.sql import Window

    dom = (
        F.col(domain_col).cast("string")
        if domain_col is not None
        else F.lit("__all__")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        dom.alias("domain"),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.round(F.col(score_col).cast("double"), 6).alias("score"),
    ).where(
        F.col("score").isNotNull()
        & F.col("n_tokens").isNotNull()
        & (F.col("n_tokens") >= 0)
    )
    if isinstance(budget, dict):
        spark = df.sparkSession
        bdf = spark.createDataFrame(
            [(str(k), int(v)) for k, v in budget.items()],
            "domain string, budget long",
        )
        based = base.join(F.broadcast(bdf), "domain", "left").withColumn(
            "budget", F.coalesce("budget", F.lit(0).cast("long"))
        )
    else:
        based = base.withColumn("budget", F.lit(int(budget)).cast("long"))

    # Single-domain inputs carry the constant lit("__all__") domain on
    # BOTH sides of every small-relation join below; Catalyst constant-
    # folds the equi-key away and would degrade those joins to
    # CartesianProduct (left x right repartition instead of a
    # broadcast).  Drop the folded key and broadcast-cross explicitly.
    single = domain_col is None
    nb = int(n_buckets)

    def _window_fill(b: DataFrame) -> DataFrame:
        # innermost level: the per-doc (score DESC, id ASC) running
        # cumsum over whatever survived the histogram narrowing.
        # BOUNDED BY CONSTRUCTION: b is the last level's cutoff bucket,
        # ~domain/n_buckets^levels rows (each level keeps/drops whole
        # buckets and recurses into exactly ONE), so the
        # "WindowExec: No Partition Defined" warning this emits for
        # single-domain inputs is accepted-by-design — the window never
        # sees a corpus-sized input unless the cutoff bucket collapses
        # to one distinct rounded score (ties; no bucketing can shrink
        # that).  The bound is a checked contract:
        # tests/test_scale_ops.py::test_fill_token_budget_window_bound.
        if _probe is not None:
            _probe["window_input"] = b
        wc = (
            Window.partitionBy("domain")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return b.withColumn("run", F.sum("n_tokens").over(wc)).select(
            "domain",
            "doc_id",
            "n_tokens",
            "score",
            (F.col("run") <= F.col("budget")).alias("kept"),
        )

    def _histogram_level(b: DataFrame, depth: int) -> DataFrame:
        # b: (domain, doc_id, n_tokens, score, budget) with budget
        # constant within each domain.  One histogram pass keeps the
        # above-cutoff buckets wholesale and recurses into the single
        # cutoff bucket with the remaining budget.
        if depth <= 0:
            return _window_fill(b)
        rng = b.groupBy("domain").agg(
            F.min("score").alias("lo"), F.max("score").alias("hi")
        )
        bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col("score") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / nb)
                ),
                F.lit(nb - 1),
            )
        ).cast("int")
        if single:
            bb = b.crossJoin(F.broadcast(rng.select("lo", "hi")))
        else:
            bb = b.join(F.broadcast(rng), "domain")
        bb = bb.withColumn("bucket", bucket)
        hist = bb.groupBy("domain", "bucket").agg(
            F.sum("n_tokens").alias("mass"),
            # budget is constant per domain — ride it through the agg
            # so the cutoff math needs no join at all
            F.min("budget").alias("budget"),
        )
        # cumulative mass from the TOP bucket down — n_buckets rows max
        w = (
            Window.partitionBy("domain")
            .orderBy(F.desc("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cutoffs = (
            hist.withColumn("cum", F.sum("mass").over(w))
            .withColumn("cum_before", F.col("cum") - F.col("mass"))
            .withColumn("full", F.col("cum") <= F.col("budget"))
            .withColumn(
                "is_cutoff",
                (~F.col("full")) & (F.col("cum_before") < F.col("budget")),
            )
        )
        full_buckets = cutoffs.where("full").select("domain", "bucket")
        cut = cutoffs.where("is_cutoff").select(
            "domain",
            F.col("bucket").alias("cut_bucket"),
            (F.col("budget") - F.col("cum_before")).alias("remaining"),
        )
        full_keys = ["bucket"] if single else ["domain", "bucket"]
        kept_full = bb.join(
            F.broadcast(full_buckets.select(*full_keys)), full_keys, "semi"
        ).select(
            "domain", "doc_id", "n_tokens", "score", F.lit(True).alias("kept")
        )
        # the cutoff-bucket rows recurse with the remaining budget
        # (cut derives from bb's own lineage, so join on RENAMED
        # columns to keep the self-join resolution unambiguous)
        cutr = cut.select(
            F.col("domain").alias("_cut_domain"), "cut_bucket", "remaining"
        )
        cut_cond = F.col("bucket") == F.col("cut_bucket")
        if not single:
            cut_cond = cut_cond & (F.col("domain") == F.col("_cut_domain"))
        in_cut = bb.join(F.broadcast(cutr), cut_cond).select(
            "domain",
            "doc_id",
            "n_tokens",
            "score",
            F.col("remaining").alias("budget"),
        )
        # truncate lineage at the level boundary: the next level
        # references in_cut several times (range agg, histogram, both
        # kept arms) and would re-inline THIS level's whole subtree at
        # each reference — the plan grew 11 -> 47 exchanges without
        # the cut.  Lazy (no job at plan construction); materializing
        # the cutoff bucket (~1/n_buckets of the level's input) is
        # also exactly the scale-sized intermediate to pin down.
        in_cut = in_cut.localCheckpoint(eager=False)
        return kept_full.unionByName(_histogram_level(in_cut, depth - 1))

    decided = _histogram_level(based, int(levels))
    return (
        base.join(
            decided.select("doc_id", "kept"), "doc_id", "left"
        )
        .select(
            "doc_id",
            "domain",
            "n_tokens",
            "score",
            F.coalesce("kept", F.lit(False)).alias("kept"),
        )
    )


def cluster_aware_split(
    clusters: DataFrame,
    *,
    fractions: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """(doc_id, cluster_id, split) — leakage-free train/val/test
    assignment: the split is a pure function of the CLUSTER id, so
    every member of a near-duplicate cluster lands in the SAME split
    by construction.

    This is the assignment a training pipeline must use after dedup:
    splitting on doc_id leaks — a near-duplicate pair straddling
    train/test is exactly the contamination the decontamination sweeps
    hunt (lightly edited copies of eval text), self-inflicted.
    Hashing the cluster id (dedup_clusters / cluster_canonicals
    output, or any grouping key — URL host, source document of chunks)
    closes that path for every grouping the dedup pass can see.

    Determinism contract: the portable seeded md5 hash
    (functions.hashing.hash64 — reproducible across engines, runs,
    partitionings) maps each cluster to [0, 1e6); cumulative fraction
    boundaries assign splits in the ``fractions`` dict's insertion
    order.  Fractions must sum to 1 (exact boundary arithmetic on the
    integer grid: boundary_i = round(cum_i * 1e6), so both engines cut
    at identical integers).  One narrow map — no shuffle, no join; at
    100 TB the split column costs nothing.
    """
    fracs = fractions if fractions is not None else {
        "train": 0.9, "val": 0.05, "test": 0.05,
    }
    if not fracs:
        raise ValueError("fractions must be non-empty")
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    from beyond_vector_search_spark.functions.hashing import hash64

    h = F.pmod(hash64(F.col(cluster_col), seed), F.lit(1_000_000))
    cum = 0.0
    expr = None
    bounds: list[tuple[str, int]] = []
    for name, frac in fracs.items():
        cum += float(frac)
        bounds.append((name, int(round(cum * 1_000_000))))
    # last boundary is exactly 1e6 (sum checked above) — no fallthrough
    for name, bound in bounds:
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return clusters.select(
        F.col(id_col).alias("doc_id"),
        F.col(cluster_col).alias("cluster_id"),
        expr.alias("split"),
    )


def skew_profile(
    df: DataFrame,
    key: str | list[str],
    *,
    top: int = 20,
) -> DataFrame:
    """(key..., n_rows, share, avg_rows_per_key, skew_factor, rank) —
    the ``top`` hottest join/aggregation keys with the numbers that
    decide a salting/AQE strategy: each key's row count, its share of
    the relation, the mean rows-per-key, and ``skew_factor`` =
    n_rows / avg_rows_per_key (a key at factor 50 on a 32-slot cluster
    WILL straggle; factor ≈ 1 means salting buys nothing).

    This is the diagnostic in front of :func:`salted_join` and AQE's
    skew threshold: run it once over a new table's candidate keys, read
    the factor, pick ``salt`` ≈ the factor rounded to the task-slot
    granularity.  Plan shape: one partial+final count aggregation on
    the key (map-side combine does the heavy lifting — the shuffle
    carries one row per distinct key), a 1-row global aggregate
    broadcast back, and a top-k (TakeOrderedAndProject — no global
    window).  At 100 TB this is the cheapest full-fidelity skew scan
    you can run; sampled variants miss exactly the rare-but-huge keys
    the diagnostic exists to find.

    Determinism: ties in n_rows break by the key columns ascending, so
    the profile is stable across runs and engines (oracle-checked).
    """
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        (F.sum("n_rows") / F.count("*")).alias("avg_rows_per_key"),
    )
    enriched = counts.crossJoin(F.broadcast(totals)).select(
        *keys,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 9).alias("share"),
        F.round("avg_rows_per_key", 9).alias("avg_rows_per_key"),
        F.round(F.col("n_rows") / F.col("avg_rows_per_key"), 9).alias("skew_factor"),
    )
    from pyspark.sql import Window

    order = [F.desc("n_rows")] + [F.asc(k) for k in keys]
    # global top-k via orderBy+limit, which Catalyst plans as
    # TakeOrderedAndProject (per-partition heaps + driver merge) — the
    # rank column is computed AFTER the limit on the tiny survivor set,
    # so the unpartitioned window touches ``top`` rows, never the corpus
    topped = enriched.orderBy(*order).limit(top)
    return topped.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("int")
    )
