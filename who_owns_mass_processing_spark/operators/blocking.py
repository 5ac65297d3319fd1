"""LSH band blocking -> candidate pairs, with explicit skew control.

The heart of the engine.  Reference analog chain:
  * blocking by standardized name / bounded address
    (dedupe_naive R/deduplicaters.R:208-223, dedupe_cosine_bounded
    :446-539) -> here: (band_id, band_hash) bucket keys;
  * the reference kills its hottest key by NULLing blank names
    (std_replace_blank R/standardizers.R:343-379) -> here: stop-band
    dropping + salted intra-bucket pair generation, all logged to the
    metrics table (north_rule: "salted keys and AQE handling hot-band
    skew").

Physical strategy (the part that must survive 100 TB):

  * Bucket census first (groupBy count — map-side partial agg), then one
    hash join tags every band row with its bucket size.  The census
    output is tiny (one row per bucket) and eagerly checkpointed, so the
    join broadcasts under AQE.
  * Every bucket is treated as a SALTED bucket with m = ceil(n/cap)
    cells (normal buckets are the m=1 special case — one code path, not
    three).  ONE groupBy produces the cell table: (band_id, band_hash,
    salt, items sort_array(collect_list)); the band table is scanned
    exactly twice total (census + cell build) and NOTHING is persisted —
    the cell table is eagerly localCheckpoint'ed (bounded: ids +
    payloads, never raw rows) and its blocks are freed by the context
    cleaner when the DataFrame goes out of scope.  Round 1 persisted the
    tagged band table across four consumers and never unpersisted it;
    repeated calls accumulated cache and the storage-vs-execution memory
    contention was a measured drag at 32 cores.
  * Within-cell pairs via a nested SQL lambda (whole-stage-codegen'd,
    JVM-side), NOT a self-join: a cell of n rows becomes one array row
    and emits its C(n,2) pairs directly.  An optional `pair_predicate`
    runs INSIDE the lambda (e.g. popcount-Hamming <= r for pHash bands):
    failing pairs are never materialized (measured: 17.5M candidates ->
    38k emitted pairs on the 280k-image bench).
  * Cross-cell pairs of split buckets via a cell-level self-join
    (salt_l < salt_r) + a two-array lambda — no row-level join, each
    cell-pair task does <= cap^2 bounded work.
  * Buckets above `hard_cap` are stop bands: dropped and *counted*,
    mirroring the reference's blank-name NULLing.
  * Cross-band duplicate candidates collapse via groupBy(a, b) —
    map-side partial aggregation halves the shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_sizes(bands_df: DataFrame) -> DataFrame:
    return bands_df.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_n"))


def spread_small_input(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Project to `columns` and repartition up to the session's shuffle
    parallelism when the input has FEWER partitions than that (guide
    §2.5 input skew): a small single-file scan pins every downstream
    per-row UDF stage to one core, because scan split count follows file
    size, not CPU count — measured at sf0.1: the substring gram UDF and
    the simhash signature UDF each ran as ONE task for seconds while 31
    cores idled.  The projection happens BEFORE the repartition so only
    the columns the consumer needs are shuffled; at 100 TB the input has
    thousands of splits, n_in >= n_part, and this is a no-op.

    The partition probe is job-free: `inputFiles` is a metadata call for
    file scans; `.rdd.getNumPartitions` only runs for non-file sources
    (cached/checkpointed inputs already have materialized partitions).
    Same contract as the signature stage has used since round 4
    (operators/dedupe.py minhash_signatures) — now shared by every
    corpus-wide UDF consumer."""
    slim = df.select(*columns) if columns else df
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    files = slim.inputFiles()
    n_in = len(files) if files else slim.rdd.getNumPartitions()
    if n_in < n_part:
        slim = slim.repartition(n_part)
    return slim


def with_surrogate_ids(df: DataFrame, sid_col: str = "_sid") -> DataFrame:
    """Attach an 8-byte surrogate id and PIN the mapping (eager
    localCheckpoint), so every blocking/verify consumer sees the same
    id <-> surrogate bijection.

    Why: band, cell, and pair rows are the dominant shuffle bytes of
    every LSH tier, and each carried the STRING document/image id (plus
    a payload struct) through banding, the cell groupBy, the pair-dedup
    groupBy, and the verify joins.  Dictionary-encoding the id to a
    dense long before `band_explode`/`candidate_pairs` cuts those
    shuffles' id bytes ~2-4x at 100 TB (ids repeat once per band);
    original ids are restored by `decode_pair_ids` after verify.

    `monotonically_increasing_id` is unique (partition-prefixed long)
    and job-free — no global sort, no dictionary join: the input here
    is the per-doc signature table (one row per id), so the surrogate
    is minted in place and the following checkpoint (which these
    signature tables needed anyway — they feed banding AND verify)
    makes the assignment stable across consumers.  Surrogate values are
    run-dependent; outputs are not: pairs are decoded back to original
    ids, and every emitted pair is exact-verified, so the pair SET is
    invariant (pytest-pinned bit-identical in tests/test_blocking.py).
    """
    return df.withColumn(
        sid_col, F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)


def decode_pair_ids(
    pairs: DataFrame,
    id_map: DataFrame,
    id_col: str,
    sid_col: str = "_sid",
    ordered: bool = False,
) -> DataFrame:
    """Map surrogate pair ids (a, b) back to original ids, keeping every
    other column.  id_map: (sid_col, id_col), one row per id.  Unordered
    pairs are re-normalized to a < b in ORIGINAL id order (surrogate
    order is arbitrary); `ordered=True` preserves (a, b) direction
    (asymmetric metrics like containment)."""
    keep = [c for c in pairs.columns if c not in ("a", "b")]
    da = id_map.select(F.col(sid_col).alias("a"), F.col(id_col).alias("_ida"))
    db = id_map.select(F.col(sid_col).alias("b"), F.col(id_col).alias("_idb"))
    out = pairs.join(da, "a").join(db, "b")
    if ordered:
        return out.select(
            F.col("_ida").alias("a"), F.col("_idb").alias("b"), *keep
        )
    return out.select(
        F.least("_ida", "_idb").alias("a"),
        F.greatest("_ida", "_idb").alias("b"),
        *keep,
    )


def _pairs_from_items(items: Column, pair_predicate=None, pair_value=None) -> Column:
    """C(n,2) pairs of an array<struct<id, payload?>> via nested lambdas
    (codegen'd).  items MUST be sorted by id (sort_array) so a < b holds
    positionally.

    Index-based inner loop (element_at on the materialized array is O(1))
    — the previous tail-`slice` per element copied O(n^2) structs per
    cell before the predicate ran, which at ~19-row average buckets x
    1.5M buckets on the 1.4M-image bench was the dominant allocation.

    pair_value(x, y), when given, rides along as field `v` (e.g. the
    Hamming distance the fused predicate already computed) so consumers
    need no feature re-join to recover it."""
    def inner(x, i):
        js = F.sequence(i + F.lit(2), F.size(items))
        if pair_predicate is not None:
            js = F.filter(js, lambda j: pair_predicate(x, F.element_at(items, j)))

        def emit(j):
            y = F.element_at(items, j)
            fields = [x["id"].alias("a"), y["id"].alias("b")]
            if pair_value is not None:
                fields.append(pair_value(x, y).alias("v"))
            return F.struct(*fields)

        return F.transform(js, emit)

    return F.flatten(
        F.transform(
            F.filter(items, lambda x, i: i < F.size(items) - 1),
            lambda x, i: inner(x, i),
        )
    )


def _cross_pairs_from_cells(
    items_l: Column, items_r: Column, pair_predicate=None, pair_value=None
) -> Column:
    """All left x right pairs of two disjoint cell arrays, predicate fused,
    (a, b) normalized to a < b; optional symmetric pair_value as field
    `v` (callers only pass order-invariant values, e.g. Hamming)."""
    def inner(x):
        candidates = items_r
        if pair_predicate is not None:
            candidates = F.filter(candidates, lambda y: pair_predicate(x, y))

        def emit(y):
            fields = [
                F.least(x["id"], y["id"]).alias("a"),
                F.greatest(x["id"], y["id"]).alias("b"),
            ]
            if pair_value is not None:
                fields.append(pair_value(x, y).alias("v"))
            return F.struct(*fields)

        return F.transform(candidates, emit)

    return F.flatten(F.transform(items_l, inner))


def popcount64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — numpy 1.x has no
    bitwise_count; the numpy twin of Spark's bit_count."""
    x = x.astype(np.int64, copy=False).view(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


def _triu_pairs_np(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (cell, i, j) index triples with i < j for a batch of cells of
    the given sizes — fully vectorized (no per-cell loop): the pair rank
    r within a cell of size s maps back to (i, j) by inverting the
    triangular number base(i) = i*(2s-i-1)/2 with one float sqrt plus an
    integer fix-up step (float64 is exact far beyond the hard-cap cell
    sizes; the fix-up absorbs the boundary rounding)."""
    sizes = sizes.astype(np.int64, copy=False)
    P = (sizes * (sizes - 1)) // 2
    total = int(P.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    cell = np.repeat(np.arange(len(sizes), dtype=np.int64), P)
    r = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(P) - P, P)
    s = sizes[cell]
    t = (2 * s - 1).astype(np.float64)
    i = np.floor((t - np.sqrt(t * t - 8.0 * r)) / 2.0).astype(np.int64)
    base = (i * (2 * s - i - 1)) // 2
    over = base > r
    i -= over
    base = np.where(over, (i * (2 * s - i - 1)) // 2, base)
    under = (base + (s - 1 - i)) <= r
    i += under
    base = np.where(under, (i * (2 * s - i - 1)) // 2, base)
    j = r - base + i + 1
    return cell, i, j


_VEC_ID_TYPES = {"bigint", "int", "string"}


def _within_pairs_vectorized(
    cells: DataFrame, id_type: str, np_predicate, np_value=None, value_type: str = "int"
):
    """Within-cell C(n,2) pair generation as a vectorized Arrow pass —
    the numpy twin of `_pairs_from_items` (guide §4.2).  The interpreted
    transform/filter/flatten lambda walked every emitted struct through
    the expression interpreter; at bench scale that generation was the
    single largest slice of every LSH tier (measured 5.4 s of the 7.7 s
    ANN query, ~2.4 s of the MinHash tier).  Here each Arrow batch of
    cells is three numpy index operations plus one `take` per side;
    items stay zero-copy (list offsets + flat child arrays), and the
    optional predicate (e.g. popcount-Hamming) filters index arrays
    BEFORE any id is materialized.  Output pair batches are budgeted to
    ~4M rows so one batch of large cells cannot buffer unboundedly."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            la = batch.column(0)
            offs = la.offsets.to_numpy().astype(np.int64)
            vals = la.values
            ids = vals.field("id")
            sizes = np.diff(offs)
            P = sizes * (sizes - 1) // 2
            if int(P.sum()) == 0:
                continue
            pay = (
                vals.field("payload").to_numpy(zero_copy_only=False)
                if np_predicate is not None
                else None
            )
            cum = np.cumsum(P)
            start = 0
            budget = 4_000_000
            while start < len(sizes):
                base_cum = int(cum[start - 1]) if start else 0
                end = int(np.searchsorted(cum, base_cum + budget, side="left")) + 1
                end = min(max(end, start + 1), len(sizes))
                cell, i, j = _triu_pairs_np(sizes[start:end])
                if len(cell) == 0:
                    start = end
                    continue
                off = offs[start:end][cell]
                I = off + i
                J = off + j
                if np_predicate is not None:
                    mask = np_predicate(pay[I], pay[J])
                    I, J = I[mask], J[mask]
                arrays = [ids.take(pa.array(I)), ids.take(pa.array(J))]
                names = ["a", "b"]
                if np_value is not None:
                    # value computed only for SURVIVING pairs (the
                    # predicate already filtered I/J above)
                    arrays.append(pa.array(np_value(pay[I], pay[J])))
                    names.append("v")
                yield pa.RecordBatch.from_arrays(arrays, names)
                start = end

    schema = f"a {id_type}, b {id_type}"
    if np_value is not None:
        schema += f", v {value_type}"
    return cells.select("items").mapInArrow(gen, schema)


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str,
    cap: int = 500,
    hard_cap: int = 100000,
    payload_col: str | None = None,
    pair_predicate=None,
    pair_predicate_np=None,
    pair_value=None,
    pair_value_np=None,
    value_col: str | None = None,
    value_type: str = "int",
) -> tuple[DataFrame, DataFrame]:
    """(band_id, band_hash, id [, payload]) -> distinct candidate pairs
    (a < b).

    payload_col/pair_predicate: verification fused into generation —
    pair_predicate(x, y) receives the two struct elements (fields `id`
    and `payload`) and pairs failing it are never emitted.
    pair_predicate_np, when given alongside, is the numpy twin
    (payload_a, payload_b arrays -> bool mask) that lets within-cell
    generation take the vectorized Arrow path; the Column form still
    serves the cross-cell join path.

    pair_value/pair_value_np (+ value_col): an ORDER-INVARIANT,
    payload-deterministic per-pair value (e.g. the fused Hamming
    distance) emitted alongside (a, b) — consumers then need no feature
    re-join to recover what the predicate already computed.  Cross-band
    duplicates carry identical values (pure function of the two
    payloads), so the dedup aggregation takes min(value) == the value.

    Returns (pairs(a, b[, value_col]), skew_metrics) — skew_metrics has
    one row per bucket class (kept / salted / dropped_stop_band) with
    bucket/row counts (feeds the metrics table).
    """
    if value_col is not None and (pair_value is None or payload_col is None):
        raise ValueError("value_col requires pair_value and payload_col")
    cap = min(cap, hard_cap)  # stop threshold may undercut the salt cap
    payload = F.col(payload_col) if payload_col else F.lit(0)
    item = F.struct(F.col(id_col).alias("id"), payload.alias("payload"))

    # census of DUP buckets only (bucket_n >= 2): singleton buckets
    # generate no pairs, so they must never enter the tag join or the
    # cell groupBy.  For gram-style blocking (substring tier) the
    # overwhelming majority of buckets are singletons — pruning here cut
    # the 1M-doc substring bench's banding input from 206M rows to the
    # ~4M rows that actually share a gram, and keeps the checkpointed
    # census bounded by the true duplicate volume (whose join-side stats
    # are then accurate: Spark broadcasts it only when genuinely small;
    # the unpruned 206M-row census was mis-broadcast and blew
    # spark.driver.maxResultSize).  The inner join doubles as the
    # singleton filter.
    sizes = bucket_sizes(bands_df)
    census = sizes.where(F.col("bucket_n") >= 2).localCheckpoint(eager=True)
    # ONE tiny job over the CHECKPOINTED census decides the plan shape:
    # (a) when no live bucket exceeds the salt cap there are no split
    # buckets, the cross-cell join is provably empty, and the cell table
    # has exactly ONE consumer — its eager localCheckpoint (a full
    # materialization barrier per tier, ~1 s at bench scale) is skipped
    # and within-pairs stream straight out of the cell aggregation
    # (salted corpora keep the checkpointed three-consumer shape);
    # (b) the Σ C(bucket_n, 2) pre-predicate pair estimate picks the
    # within-pair generator: the vectorized Arrow path amortizes over
    # volume, but on tiny candidate sets (e.g. the 4-band simhash tier)
    # its stage spin-up costs more than the interpreted lambda it
    # replaces — measured +0.5 s on a 2 s query.
    live = F.col("bucket_n") <= hard_cap
    stats = census.agg(
        F.max(F.when(live, F.col("bucket_n"))).alias("max_live"),
        F.sum(
            F.when(live, F.col("bucket_n") * (F.col("bucket_n") - 1) / 2)
        ).alias("est_pairs"),
    ).collect()[0]
    has_salted = (stats["max_live"] or 0) > cap
    est_pairs = float(stats["est_pairs"] or 0.0)

    tagged = bands_df.join(census, ["band_id", "band_hash"]).where(
        F.col("bucket_n") <= hard_cap
    )
    m = F.ceil(F.col("bucket_n") / F.lit(cap)).cast("int")
    salted = tagged.withColumn("m", m).withColumn(
        "salt",
        F.when(F.col("m") > 1, F.pmod(F.xxhash64(F.col(id_col)), F.col("m")))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    # ONE pass builds every cell (normal buckets are m=1 cells); eager
    # checkpoint only when cross-pairs exist (then it feeds within-pairs
    # once and cross-pairs twice)
    cells = salted.groupBy("band_id", "band_hash", "m", "salt").agg(
        F.sort_array(F.collect_list(item)).alias("items")
    )
    if has_salted:
        cells = cells.localCheckpoint(eager=True)

    emit_value = value_col is not None

    def _proj(p):
        cols = [F.col("p.a").alias("a"), F.col("p.b").alias("b")]
        if emit_value:
            cols.append(F.col("p.v").alias(value_col))
        return cols

    id_type = bands_df.schema[id_col].dataType.simpleString()
    if (
        est_pairs >= 50_000
        and id_type in _VEC_ID_TYPES
        and (pair_predicate is None or pair_predicate_np is not None)
        and (not emit_value or pair_value_np is not None)
    ):
        within = _within_pairs_vectorized(
            cells, id_type, pair_predicate_np,
            np_value=pair_value_np if emit_value else None, value_type=value_type,
        )
        if emit_value:
            within = within.withColumnRenamed("v", value_col)
    else:  # tiny volume, unsupported id type, or Column-only predicate
        within = cells.select(
            F.explode(
                _pairs_from_items(
                    F.col("items"), pair_predicate,
                    pair_value if emit_value else None,
                )
            ).alias("p")
        ).select(*_proj("p"))

    multi = cells.where(F.col("m") > 1)
    cl = multi.select(
        "band_id", "band_hash", F.col("salt").alias("salt_l"), F.col("items").alias("items_l")
    )
    cr = multi.select(
        "band_id", "band_hash", F.col("salt").alias("salt_r"), F.col("items").alias("items_r")
    )
    cross = (
        cl.join(cr, ["band_id", "band_hash"])
        .where(F.col("salt_l") < F.col("salt_r"))
        .select(
            F.explode(
                _cross_pairs_from_cells(
                    F.col("items_l"), F.col("items_r"), pair_predicate,
                    pair_value if emit_value else None,
                )
            ).alias("p")
        )
        .select(*_proj("p"))
    )

    unioned = within.unionByName(cross) if has_salted else within
    if emit_value:
        # duplicates of a pair carry the identical value (pure function
        # of the two payloads): min == the value, partial-agg'd map-side
        pairs = unioned.groupBy("a", "b").agg(F.min(value_col).alias(value_col))
    else:
        pairs = unioned.groupBy("a", "b").agg(F.lit(1).alias("_one")).drop("_one")

    # metrics reuse the CHECKPOINTED dup census (no second banding
    # aggregation — round 3 recomputed the full census from bands_df
    # whenever the caller materialized the skew table, so the pipeline
    # paid banding twice per stage).  Singleton buckets (all "kept")
    # are reconstructed arithmetically: one shuffle-free count over
    # bands_df, minus the dup census's row total.
    dup_classes = (
        census.select(
            F.when(F.col("bucket_n") > hard_cap, F.lit("dropped_stop_band"))
            .when(F.col("bucket_n") > cap, F.lit("salted"))
            .otherwise(F.lit("kept"))
            .alias("bucket_class"),
            "bucket_n",
        )
        .groupBy("bucket_class")
        .agg(
            F.count("*").alias("buckets"),
            F.sum("bucket_n").alias("rows"),
            F.max("bucket_n").alias("max_bucket"),
        )
    )
    total = bands_df.select(F.count("*").alias("_total"))
    dup_total = census.select(
        F.coalesce(F.sum("bucket_n"), F.lit(0)).alias("_dup")
    )
    singletons = (
        total.crossJoin(dup_total)
        .select((F.col("_total") - F.col("_dup")).alias("_n"))
        .where(F.col("_n") > 0)
        .select(
            F.lit("kept").alias("bucket_class"),
            F.col("_n").alias("buckets"),
            F.col("_n").alias("rows"),
            F.lit(1).cast("long").alias("max_bucket"),
        )
    )
    metrics = (
        dup_classes.unionByName(singletons)
        .groupBy("bucket_class")
        .agg(
            F.sum("buckets").alias("buckets"),
            F.sum("rows").alias("rows"),
            F.max("max_bucket").alias("max_bucket"),
        )
    )
    return pairs, metrics


def hamming_pairs(
    bands_df: DataFrame,
    id_col: str,
    hash_col: str,
    radius: int,
    cap: int = 500,
    hard_cap: int = 100000,
) -> tuple[DataFrame, DataFrame]:
    """Hamming-fused blocking: candidate generation with the popcount
    check applied inside the lambda, and the distance EMITTED alongside
    each surviving pair — consumers that previously re-joined the hash
    table twice to recompute bit_count(xor) (verify_hamming) read the
    `hamming` column instead (guide §2.4: the value was already computed
    inside the fused predicate; two broadcast joins per tier dropped).
    Returns (pairs(a, b, hamming), metrics)."""
    def pred(x, y):
        return F.bit_count(x["payload"].bitwiseXOR(y["payload"])) <= F.lit(radius)

    def val(x, y):
        return F.bit_count(x["payload"].bitwiseXOR(y["payload"])).cast("int")

    def pred_np(pa_: np.ndarray, pb_: np.ndarray) -> np.ndarray:
        return popcount64_np(pa_ ^ pb_) <= radius

    def val_np(pa_: np.ndarray, pb_: np.ndarray) -> np.ndarray:
        return popcount64_np(pa_ ^ pb_).astype(np.int32)

    pairs, metrics = candidate_pairs(
        bands_df, id_col, cap=cap, hard_cap=hard_cap,
        payload_col=hash_col, pair_predicate=pred, pair_predicate_np=pred_np,
        pair_value=val, pair_value_np=val_np, value_col="hamming",
    )
    return pairs, metrics
