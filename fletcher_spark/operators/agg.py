"""Reductions (SURVEY.md §2.4) — the reference's ``_reduce`` map
(/root/reference/fletcher/base.py:470-523) re-expressed as Spark
aggregate expressions.

The reference's chunked reduction (``np_reduce_op``,
/root/reference/fletcher/_algorithms.py:142-152) is literally
partial-per-chunk + final re-reduce; Spark's HashAggregate generalizes
that across executors (partial before the exchange, final after), so
every function here is a plain expression — no custom code path.

Null semantics: SQL (skip nulls; all-null group → NULL).  The reference
additionally supports pandas' ``skipna=False`` (any null → NA), exposed
here as ``skipna=False`` → wrap in a null-poisoning guard.  NOTE the
reference's mean divides by the *total* length including nulls
(/root/reference/fletcher/base.py:504-505) — a documented bug we do NOT
reproduce; ``avg`` uses SQL semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _null_poison(c: Column, agg: Column) -> Column:
    """pandas skipna=False: result is NULL if any input value is null."""
    any_null = F.max(c.isNull().cast("int")) == 1
    return F.when(any_null, F.lit(None)).otherwise(agg)


def _wrap(c: Column | str, fn, skipna: bool = True) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    agg = fn(col)
    return agg if skipna else _null_poison(col, agg)


def sum_(c, skipna=True):       return _wrap(c, F.sum, skipna)
def min_(c, skipna=True):       return _wrap(c, F.min, skipna)
def max_(c, skipna=True):       return _wrap(c, F.max, skipna)
def prod(c, skipna=True):       return _wrap(c, F.product, skipna)
def mean(c, skipna=True):       return _wrap(c, F.avg, skipna)
def std(c, ddof: int = 1, skipna=True):
    return _wrap(c, F.stddev_samp if ddof == 1 else F.stddev_pop, skipna)
def var(c, ddof: int = 1, skipna=True):
    return _wrap(c, F.var_samp if ddof == 1 else F.var_pop, skipna)
def skew(c, skipna=True):       return _wrap(c, F.skewness, skipna)
def kurt(c, skipna=True):       return _wrap(c, F.kurtosis, skipna)
def median(c, skipna=True):     return _wrap(c, F.median, skipna)


def median_approx(c, accuracy: int = 10000) -> Column:
    """The unbounded-cardinality 100 TB path: exact median needs a full
    sort of the group; percentile_approx is a fixed-memory sketch
    (error 1/accuracy).  For columns whose DISTINCT cardinality is
    tractable (quantities, lengths, prices), :func:`exact_quantiles`
    is exact AND distributed."""
    col = F.col(c) if isinstance(c, str) else c
    return F.percentile_approx(col, 0.5, accuracy)


def exact_quantiles(df, val_col: str, probs: dict, group_cols: tuple = ()):
    """Exact interpolated quantiles (``quantile_cont`` semantics) from a
    VALUE HISTOGRAM — distributed-exact, unlike Spark's
    ``percentile()``/``median()`` whose final merge task buffers every
    value of the group.

    Plan: groupBy(group, value) count (shuffle sized by group×distinct
    cardinality, map-side combined) → per-group cumulative rank (keyed
    window — distributed across groups) → quantile p interpolates
    between the values at cumulative ranks ``floor/ceil(1 + (n−1)p)``.
    Exact for any column with tractable distinct cardinality; for
    unbounded-cardinality doubles use :func:`median_approx`.

    ``probs`` maps output column name → probability.  Returns one row
    per group: (group..., <name> double ...).
    """
    from pyspark.sql import Window

    hist = (
        df.filter(F.col(val_col).isNotNull())  # quantile_cont skips nulls
        .groupBy(*group_cols, F.col(val_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy(*(group_cols or [F.lit(1)])).orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*(group_cols or [F.lit(1)]))
    cum = hist.select(
        *group_cols,
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("nn"),
    )
    aggs, outs = [], []
    for name, p in probs.items():
        pos = 1 + (F.col("nn") - 1) * F.lit(float(p))
        aggs += [
            F.min(F.when(F.col("cum") >= F.floor(pos), F.col("v"))).alias(f"_lo_{name}"),
            F.min(F.when(F.col("cum") >= F.ceil(pos), F.col("v"))).alias(f"_hi_{name}"),
            F.min(pos - F.floor(pos)).alias(f"_fr_{name}"),
        ]
        outs.append(
            (
                F.col(f"_lo_{name}")
                + F.col(f"_fr_{name}") * (F.col(f"_hi_{name}") - F.col(f"_lo_{name}"))
            )
            .cast("double")
            .alias(name)
        )
    agg = cum.groupBy(*group_cols).agg(*aggs) if group_cols else cum.agg(*aggs)
    return agg.select(*group_cols, *outs)


def any_(c, skipna=True):
    """Boolean ANY (reference: bit-level short-circuit scan,
    /root/reference/fletcher/algorithms/bool.py:15-64).  SQL bool_or
    ignores nulls = pandas skipna=True; Kleene variant via skipna=False:
    TRUE if any true, else NULL if any null, else FALSE."""
    col = F.col(c) if isinstance(c, str) else c
    agg = F.bool_or(col)
    if skipna:
        return F.coalesce(agg, F.lit(False))
    return F.when(agg, F.lit(True)).otherwise(
        F.when(F.max(col.isNull().cast("int")) == 1, F.lit(None)).otherwise(F.lit(False))
    )


def all_(c, skipna=True):
    """Boolean ALL (/root/reference/fletcher/algorithms/bool.py:67-101).
    skipna=True follows pandas ("True unless a valid False")."""
    col = F.col(c) if isinstance(c, str) else c
    agg = F.bool_and(col)
    if skipna:
        return F.coalesce(agg, F.lit(True))
    return F.when(~agg, F.lit(False)).otherwise(
        F.when(F.max(col.isNull().cast("int")) == 1, F.lit(None)).otherwise(F.lit(True))
    )


#: name → callable, mirroring the reference's `_reduce(name)` dispatch.
REDUCTIONS = {
    "sum": sum_, "min": min_, "max": max_, "prod": prod, "mean": mean,
    "std": std, "var": var, "skew": skew, "kurt": kurt, "median": median,
    "any": any_, "all": all_,
}


def _sql_double(x) -> str:
    """A Python float as an EXACT Spark SQL double literal —
    ``float.__repr__`` round-trips doubles bit-exactly (the
    operators/kmeans.py:centroid_literal discipline); non-finite and
    NULL spelled via CAST."""
    import math

    if x is None:
        return "CAST(NULL AS DOUBLE)"
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'Infinity' if x > 0 else '-Infinity'}' AS DOUBLE)"
    return f"{x!r}D"


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


#: Histogram-row count below which the MATERIALIZED cut-point paths
#: solve locally on the driver instead of running the staged
#: three-job sequence (stats collect → bucket-total collect → cut
#: aggregate).  Same gating principle as
#: operators/graph.py:LOCAL_EDGE_LIMIT: 4M (v double, c long) rows is
#: ~64 MB through Arrow — trivial for the driver — while every extra
#: eager job costs a full scheduling round trip.  The probe is ONE
#: ``limit(L+1).toArrow()`` job (CollectLimitExec.doExecute: per-
#: partition local limit, one pass — it also materializes the
#: histogram cache for the >L fall-through and for prehist callers'
#: other branches).  The distributed staged path stays the >L
#: fallback, so scale behavior is unchanged.
LOCAL_HIST_LIMIT = 4_000_000


def _cuts_local(hist, keys: list, k: int):
    """Driver-local cut computation over a bounded histogram — the
    r13 single-job fast path for ``driver_stage=True``.  Returns a
    LocalRelation-backed DataFrame ``(keys..., cuts, n)`` or ``None``
    to fall through to the distributed staged path (histogram over
    ``LOCAL_HIST_LIMIT``, empty, or containing NULL/NaN values — the
    coarse-bucket machinery gives those a bucket-dependent global
    position this replica does not reproduce).

    Arithmetic is the EXACT rank definition the distributed path
    computes: rows sorted by value ascending, cumulative exact-long
    counts, ``cut_i`` = first value whose cumulative count ≥
    ``ceil(double(i) · n / k)`` — the threshold is evaluated in the
    same IEEE double operation order as the Column form
    (``lit(float(i)) * n / k``), so the two paths are bit-identical
    (pinned by tests/test_cuts_driver_stage.py's differentials).

    Vectorized on numpy arrays end-to-end (the
    operators/graph.py:_local_union_find discipline): a near-continuous
    double column yields a histogram nearly as long as the table
    (l_extendedprice at sf0.1 is ~450k distinct values), and a
    per-row Python loop over that costs more driver time than the jobs
    it saves — lexsort + segmented cumsum + searchsorted is ~ms."""
    import math

    import numpy as np

    tbl = hist.limit(LOCAL_HIST_LIMIT + 1).toArrow()
    nrows = tbl.num_rows
    if nrows > LOCAL_HIST_LIMIT or nrows == 0:
        return None
    vcol = tbl.column("v")
    if vcol.null_count:
        return None
    v = vcol.to_numpy(zero_copy_only=False)
    if np.isnan(v).any():
        return None
    c = tbl.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    kraw = []
    gid = np.zeros(nrows, dtype=np.int64)
    for kc in keys:
        col = tbl.column(kc)
        if col.null_count:  # the staged/lazy tiers own NULL keys
            return None
        kv = col.to_numpy(zero_copy_only=False)
        kraw.append(kv)
        _, inv = np.unique(kv, return_inverse=True)
        gid = gid * (int(inv.max()) + 1) + inv
    order = np.lexsort((v, gid))
    v, c, gid = v[order], c[order], gid[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(gid)) + 1, [nrows]))
    from pyspark.sql import types as T

    def _py(x):
        return x.item() if hasattr(x, "item") else x

    out_rows = []
    for s, e in zip(starts[:-1], starts[1:]):
        cum = np.cumsum(c[s:e])
        n = int(cum[-1])
        cuts = []
        for i in range(1, k):
            thr = math.ceil(float(i) * n / k)  # same double op order as Column form
            idx = int(np.searchsorted(cum, thr, side="left"))
            if idx >= e - s:
                # thr > cum[-1] is reachable only when the double product
                # rounds up near 2^53; the staged path yields a NULL cut
                # there, which this replica cannot represent in-place —
                # fall through to the distributed twin (ADVICE r13)
                return None
            cuts.append(float(v[s + idx]))
        src = int(order[s])  # original row index: key values for this group
        out_rows.append(tuple(_py(kv[src]) for kv in kraw) + (cuts, n))
    schema = T.StructType(
        [hist.schema[kc] for kc in keys]
        + [
            T.StructField("cuts", T.ArrayType(T.DoubleType()), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    return hist.sparkSession.createDataFrame(out_rows, schema)


def _driver_stage_ok(keys: list, stats_rows) -> bool:
    """Driver staging supports the unkeyed case and a single STRING
    key with no NULL values (map literals cannot hold NULL keys, and a
    non-string key would need type-faithful SQL rendering) — exactly
    the shapes the materialize=True consumers use.  Anything else
    falls back to the lazy join-back plan (then collected, unchanged
    semantics)."""
    if not keys:
        return True
    if len(keys) != 1:
        return False
    return all(isinstance(r[0], str) for r in stats_rows)


def _cuts_by_key(
    hist,
    key_cols: tuple,
    k: int,
    n_coarse: int,
    hint_broadcast: bool = True,
    driver_stage: bool = False,
):
    """Shared two-level prefix-sum core: a persisted ``(key..., v, c)``
    value histogram → ``(key..., cuts array<double>, n long)``.  The
    ONLY place the rank arithmetic (coarse clamp, keyed cumulative
    sums, ``ceil(i·n/k)`` thresholds) lives — exact_cut_points and
    exact_cut_points_multi are thin wrappers, so a fix applies to both
    by construction.

    ``hint_broadcast`` forces the internal stats/offsets join-backs to
    broadcast — right for the unkeyed (1-row) and dimension-keyed
    cases.  The HIGH-cardinality keyed path must pass False: stats is
    |keys| rows and offsets |keys|×n_coarse, both key-domain-sized, so
    the hint would force an unbounded broadcast at scale; unhinted,
    Catalyst broadcasts them at toy scale and shuffle-joins at real
    scale — both on the same key the histogram is already partitioned
    by.

    ``driver_stage`` (r13, guide §1.2/§7.3): for the MATERIALIZED
    paths — which end in a driver ``collect()`` of the cuts row(s)
    anyway — the stats (|keys| rows) and coarse-bucket offsets
    (|keys|×n_coarse rows) are themselves bounded model state, so they
    are collected to the driver and re-attached as parsed literal
    columns instead of join-backs.  Every downstream EXPRESSION
    (coarse clamp, in-bucket window, ``off + cum_in``, the
    ``ceil(i·n/k)`` thresholds) is the SAME Column code on both paths,
    only the source of ``vmin``/``vmax``/``n``/``off`` differs —
    counts are exact longs and the doubles round-trip via
    ``float.__repr__``, so the two modes are value-identical (pinned
    by tests/test_operators.py's driver-stage differential).  This
    replaces two broadcast-build jobs plus their AQE join stages
    (~15-19 stage-jobs measured at sf0.1) with three sequential jobs
    over the persisted histogram.  Lazy callers (materialize=False)
    never stage: their contract is a plan, not jobs."""
    from pyspark.sql import Window

    keys = list(key_cols)
    bc = F.broadcast if hint_broadcast else (lambda d: d)
    if driver_stage:
        # r13 single-job fast path: below LOCAL_HIST_LIMIT the whole
        # histogram is bounded driver state — one limit-probe job
        # replaces the staged three-job sequence; >L (or NULL/NaN
        # values) falls through to the staged path below, with the
        # probe having already materialized the histogram cache
        local = _cuts_local(hist, keys, k)
        if local is not None:
            return local
    stats = hist.groupBy(*keys).agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax"), F.sum("c").alias("n")
    )
    staged_rows = None
    if driver_stage:
        rows = stats.collect()  # job 1: |keys| rows (bounded model state)
        # empty keyed stats (zero-row histogram) falls back: a typed
        # empty-map literal is not worth the edge case — the lazy plan
        # produces the same zero rows with the right schema
        if rows and _driver_stage_ok(keys, rows):
            staged_rows = rows
    if staged_rows is not None:
        if keys:
            key = F.col(keys[0])
            vmin_m = "map(" + ",".join(
                f"{_sql_str(r[0])},{_sql_double(r['vmin'])}" for r in staged_rows
            ) + ")"
            vmax_m = "map(" + ",".join(
                f"{_sql_str(r[0])},{_sql_double(r['vmax'])}" for r in staged_rows
            ) + ")"
            n_m = "map(" + ",".join(
                f"{_sql_str(r[0])},{int(r['n'])}L" for r in staged_rows
            ) + ")"
            h = hist.withColumns(
                {
                    "vmin": F.element_at(F.expr(vmin_m), key),
                    "vmax": F.element_at(F.expr(vmax_m), key),
                    "n": F.element_at(F.expr(n_m), key),
                }
            )
        else:
            r = staged_rows[0]
            h = hist.withColumns(
                {
                    "vmin": F.expr(_sql_double(r["vmin"])),
                    "vmax": F.expr(_sql_double(r["vmax"])),
                    "n": (
                        F.lit(None) if r["n"] is None else F.lit(int(r["n"]))
                    ).cast("long"),
                }
            )
    else:
        h = hist.join(bc(stats), keys) if keys else hist.crossJoin(F.broadcast(stats))
    span = F.col("vmax") - F.col("vmin")
    coarse = (
        F.when(span <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("v") - F.col("vmin")) / span * n_coarse),
                F.lit(n_coarse - 1),
            )
        )
        .cast("int")
    )
    h = h.withColumn("cb", coarse)
    w_in = Window.partitionBy(*keys, "cb").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    h2 = h.withColumn("cum_in", F.sum("c").over(w_in))
    if staged_rows is not None:
        # job 2: per-(key, cb) bucket totals — |keys|×n_coarse rows —
        # exclusive running offsets computed in exact long arithmetic
        # on the driver (identical to the w_off window: distinct cb
        # per key, ordered, preceding-only sum)
        bt_rows = h.groupBy(*keys, "cb").agg(F.sum("c").alias("bt")).collect()
        per_key: dict = {}
        for r in bt_rows:
            per_key.setdefault(r[0] if keys else None, {})[r["cb"]] = int(r["bt"])
        def _dense_offsets(bts: dict) -> list:
            run, out = 0, []
            for cb in range(n_coarse):
                out.append(run)
                run += bts.get(cb, 0)
            return out
        if keys:
            off_sql = "map(" + ",".join(
                _sql_str(kv)
                + ",array("
                + ",".join(f"{o}L" for o in _dense_offsets(bts))
                + ")"
                for kv, bts in sorted(per_key.items())
            ) + ")"
            off_col = F.element_at(
                F.element_at(F.expr(off_sql), F.col(keys[0])), F.col("cb") + 1
            )
        else:
            offs_list = _dense_offsets(per_key.get(None, {}))
            off_sql = "array(" + ",".join(f"{o}L" for o in offs_list) + ")"
            off_col = F.element_at(F.expr(off_sql), F.col("cb") + 1)
        g = h2.withColumn("off", off_col).withColumn(
            "cum", F.col("off") + F.col("cum_in")
        )
    else:
        # offsets window input: |keys| x n_coarse rows — constant-sized
        w_off = Window.partitionBy(*keys).orderBy("cb").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = (
            h2.groupBy(*keys, "cb")
            .agg(F.sum("c").alias("bt"))
            .select(
                *keys, "cb", F.coalesce(F.sum("bt").over(w_off), F.lit(0)).alias("off")
            )
        )
        g = h2.join(bc(offs), keys + ["cb"]).withColumn(
            "cum", F.col("off") + F.col("cum_in")
        )
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(float(i)) * F.col("n") / k), F.col("v")
            )
        ).alias(f"_cut{i}")
        for i in range(1, k)
    ]
    agg = g.groupBy(*keys).agg(*aggs, F.max("n").alias("n")) if keys else g.agg(
        *aggs, F.max("n").alias("n")
    )
    return agg.select(
        *keys,
        F.array(*[F.col(f"_cut{i}") for i in range(1, k)]).alias("cuts"),
        "n",
    )


def exact_cut_points(
    df, val_col: str, k: int, n_coarse: int = 256, prehist=None, materialize: bool = True
):
    """Rank-based discrete k-quantile cut points, distributed-exact with
    NO table-sized single-partition window — the scale path behind the
    ntile-based equi-depth queries.

    Definition (deterministic cross-engine, tie-stable): with n = count
    of non-null values and ranks ``r_i = ceil(i·n/k)`` for i in 1..k−1,
    ``cut_i`` = the smallest value whose cumulative count ≥ ``r_i``.
    Bucket membership is then a pure map-side expression
    (:func:`assign_cut_buckets`); all rows with equal values share a
    bucket, so buckets can be uneven under heavy ties — the documented
    trade vs ``ntile``'s row-exact split.

    Plan — a two-level prefix sum over the VALUE HISTOGRAM:

    1. ``groupBy(value)`` count (map-side combined);
    2. a one-row (min, max, n) aggregate broadcast back to assign each
       histogram row a coarse range bucket (``n_coarse`` of them);
    3. cumulative counts WITHIN each coarse bucket (keyed window —
       distributed);
    4. coarse-bucket totals → running offsets (a window over
       ``n_coarse`` rows — constant-sized, never table-sized);
    5. global cumulative = offset + in-bucket cumulative; cuts fall out
      of one final min-when aggregate.

    Returns a ONE-ROW DataFrame ``(cuts array<double>, n long)`` meant
    to be ``crossJoin(F.broadcast(...))``-ed onto the assignment scan.
    With ``materialize=True`` (default) the row is computed EAGERLY and
    returned as a driver-pinned literal frame — the same k-row model
    state contract as the ANN codebooks (queries/similarity.py): the
    downstream plan sees a LocalTableScan, and the internal histogram
    cache is released the moment the row exists, so a long-lived
    session running many cut queries holds NO residual cache entries
    (VERDICT r5 "what's wrong" #2).  ``materialize=False`` returns the
    lazy plan instead (no persist, no eager job) — for plan inspection
    and streaming-state maintenance, where the caller owns lifetimes.

    ``prehist``: a caller-built ``(v double, c long)`` value histogram
    to reuse (pass persisted if it feeds other branches too) — lets a
    query that already pays the histogram scan (rank checks, mode,
    other quantiles) share it instead of re-scanning the source; its
    lifetime stays with the caller.

    .. versionchanged:: r6
       The default flipped to ``materialize=True`` (it was lazy),
       so calling this now runs an eager Spark job at plan-construction
       time.  Callers composing plans offline, or passing ``prehist``
       and owning lifetimes themselves, should pass
       ``materialize=False`` explicitly to keep the old lazy behavior.

    ``n_coarse`` sizing: each in-bucket window partition holds
    ~|distinct| / n_coarse histogram rows, and the offsets window holds
    n_coarse rows — balance them with ``n_coarse ≈ sqrt(|distinct|)``
    (256 covers up to ~65k distinct evenly; a billion-distinct double
    column wants ~32k, or :func:`median_approx` if the histogram itself
    is intractable).
    """
    own = prehist is None
    if own:
        v = df.filter(F.col(val_col).isNotNull()).select(
            F.col(val_col).cast("double").alias("v")
        )
        hist = v.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        if materialize:
            # persist: the histogram feeds four branches (stats,
            # in-bucket cums, offsets, the final cut aggregate) —
            # unpersisted, each branch re-scans the SOURCE table;
            # released below once the cuts row is collected
            hist = hist.persist()
    else:
        hist = prehist
    out = _cuts_by_key(hist, (), k, n_coarse, driver_stage=materialize)
    if not materialize:
        return out
    rows = out.collect()  # one row: k-row model state, driver-pinned
    if own:
        hist.unpersist()
    return hist.sparkSession.createDataFrame(rows, out.schema)


def assign_cut_buckets(val: Column | str, cuts: Column | str = "cuts") -> Column:
    """Map-side bucket id (1-based long) for a value against broadcast
    cut points: ``1 + |{cut : val > cut}|``.  Pure codegen — pair with
    :func:`exact_cut_points` via ``crossJoin(F.broadcast(cuts_row))``."""
    vc = F.col(val) if isinstance(val, str) else val
    cc = F.col(cuts) if isinstance(cuts, str) else cuts
    return (
        F.lit(1) + F.size(F.filter(cc, lambda c: vc.cast("double") > c))
    ).cast("long")


def exact_cut_points_by_key(
    df,
    key_cols: list,
    val_col: str,
    k: int,
    n_coarse: int = 256,
    materialize: bool = False,
):
    """:func:`exact_cut_points` PER KEY GROUP — the keyed face of
    ``_cuts_by_key``: one ``(key..., cuts array<double>, n long)`` row
    per distinct key combination, same rank definition
    (``cut_i`` = smallest value whose within-key cumulative count ≥
    ``ceil(i·n_key/k)``), same two-level prefix sum with every window
    partitioned by ``(key..., coarse-bucket)`` — nothing funnels.

    Default is the LAZY distributed frame (to be shuffle-joined on the
    key) — unlike the single-row variants, the keyed result is sized
    by the key domain, which the operator cannot bound, so eager
    driver collection must be an explicit opt-in.  Pass
    ``materialize=True`` only when the key domain is dimension-sized
    (sources, languages, shards…), i.e. exactly when the caller would
    ``F.broadcast`` the cuts back onto the corpus anyway: the table is
    then collected as a driver-pinned literal frame and the internal
    histogram cache is released on return.  On the lazy path the
    caller owns the histogram re-scan trade (persist the input if it
    feeds other branches)."""
    keys = list(key_cols)
    melted = df.select(
        *keys, F.col(val_col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    hist = melted.groupBy(*keys, "v").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        hist = hist.persist()
    # lazy = the high-cardinality-key contract: the internal
    # stats/offsets join-backs must not carry forced broadcast hints
    # (key-domain-sized); materialize=True asserts a dimension-sized
    # domain where the hint is right
    out = _cuts_by_key(
        hist, tuple(keys), k, n_coarse,
        hint_broadcast=materialize, driver_stage=materialize,
    )
    if not materialize:
        return out
    rows = out.collect()
    hist.unpersist()
    return hist.sparkSession.createDataFrame(rows, out.schema)


def exact_cut_points_multi(
    df, val_cols: list, k: int, n_coarse: int = 256, materialize: bool = True
):
    """:func:`exact_cut_points` for SEVERAL columns in ONE pipeline —
    the constant-job-count companion (same trade as
    operators/kmeans.py:lloyd_centroids_multi): the columns are melted
    into (metric, value) rows inside one projection, so histogram,
    stats, coarse cumulative sums, offsets and the final cut aggregate
    each run ONCE for all metrics instead of once per metric.  Windows
    partition by (metric, coarse-bucket) — still distributed — and the
    offsets window input is ``len(val_cols) × n_coarse`` rows.

    Returns a ONE-ROW DataFrame with one ``<col>_cuts array<double>``
    column per input column, for ``crossJoin(F.broadcast(...))`` onto
    the assignment scan — eagerly materialized as a driver-pinned
    literal by default, with the internal melted histogram cache
    released on return (``materialize=False`` for the lazy plan; see
    :func:`exact_cut_points`).  Identical arithmetic per metric to the
    single-column operator (equal within the rounding contract — the
    shuffle key differs, so FP-free rank arithmetic is in fact
    bit-equal here: counts and value picks only, no summation of
    floats across orders)."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("m"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in val_cols
                ]
            )
        ).alias("z")
    ).select("z.m", "z.v").filter(F.col("v").isNotNull())
    hist = melted.groupBy("m", "v").agg(F.count(F.lit(1)).alias("c"))
    if materialize:
        hist = hist.persist()
    per_m = _cuts_by_key(hist, ("m",), k, n_coarse, driver_stage=materialize)
    # coalesce to an empty array for an all-NULL metric: it has no
    # histogram row, and NULL cuts would push assign_cut_buckets
    # outside its 1..k contract — with empty cuts every row (all NULL
    # anyway) degenerates to bucket 1
    empty = F.array().cast("array<double>")
    out = per_m.agg(
        *[
            F.coalesce(
                F.any_value(F.when(F.col("m") == c, F.col("cuts")), True), empty
            ).alias(f"{c}_cuts")
            for c in val_cols
        ]
    )
    if not materialize:
        return out
    rows = out.collect()
    hist.unpersist()
    return hist.sparkSession.createDataFrame(rows, out.schema)
