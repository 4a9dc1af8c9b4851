"""Pipeline data-quality auditing — the validation pass a 100 TB ingest
runs BEFORE any training-data job trusts the tables.

The reference has no notion of input validation (its sources are a
hard-coded in-memory list, MapReduceFramework.cpp:~SampleClient, and a
directory listing, Search.cpp:88-130 — malformed input is simply
undefined behavior); these operators are mandated-extension material:
the dbt-test / Great-Expectations / Deequ shape re-expressed as plain
declarative Spark so Catalyst keeps every check inside a scan-bound
partial aggregate.

- :func:`expectations_audit` — one report row per (table, constraint):
  NOT-NULL / domain / range row checks, primary-key uniqueness, and
  referential (foreign-key orphan) checks across the warehouse tables.
  The synthetic corpus makes it non-vacuous: ``lineitem``'s composite
  key ``(l_orderkey, l_linenumber)`` really does carry duplicate groups
  (~11.8k at sf0.01), so the PK check FIRES while every other
  expectation passes — the report distinguishes clean from broken
  constraints on real counts, not on an always-zero column.
- :func:`key_skew_profile` — per join-key frequency skew: row count,
  key cardinality, the hottest key and its count, and the max/mean
  load ratio.  This is the diagnostic that decides broadcast vs
  shuffle vs salting for every join in this engine (the `salt factor
  ≥ skew_ratio` rule of thumb); at 100 TB you run it once per ingest
  and cache the answer next to the table.

Scale posture (100 TB):

- Row checks: ALL of a table's predicates evaluate in ONE scan as
  conditional ``sum(CASE ...)`` partial aggregates (`stack` unpivots the
  single aggregate row afterwards — rows-of-report, not passes-of-data).
  No shuffle beyond one combiner row per partition.
- Uniqueness: ``count(*) - count(DISTINCT key)`` — one hash-partitioned
  distinct on the key, partial-agg combining map-side; no windows (a
  ``row_number() OVER (PARTITION BY key)`` would serialize hot keys —
  the exact rows a dup check exists to find — into single tasks).
- Foreign keys: LEFT JOIN against the parent's distinct keys +
  ``sum(parent IS NULL)`` — one pass over the child; Spark broadcasts
  the parent side when small (nation/customer) and AQE picks a shuffle
  join for big-big (lineitem→orders), which is the honest cost of
  validating a 100 TB fact against a 10 TB parent.
- Skew profile: ``groupBy(key).count()`` partial-aggregates map-side
  (hot keys cost one row per input partition, NOT one task), and the
  summary is a single packed-string argmax aggregate over the combiner
  rows — the same engine-portable max(lpad(cnt)||lpad(INV-key)) trick
  as the winnowing/quality survivor selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd, rnd_sql
from ..sources import load_table

# --------------------------------------------------------------------------
# expectations_audit
# --------------------------------------------------------------------------

#: accepted domains (TPC-H spec values; the synthetic generator honours
#: them — mirrored verbatim in the oracle)
RETURNFLAG_DOMAIN = ("A", "N", "R")
ORDERSTATUS_DOMAIN = ("F", "O", "P")
LANG_DOMAIN = ("de", "en", "es", "fr", "zh")
#: shared with the streaming monitor (expectations_stream) — the batch
#: audit's events checks are the superset the live counters sample
EVENT_TYPE_DOMAIN = ("click", "error", "purchase", "signup", "view")


def _row_checks(df: DataFrame, table: str, checks: dict[str, Column]) -> DataFrame:
    """All of ``checks`` (name → violation predicate) in ONE scan:
    conditional-sum aggregate, then `stack` to one report row each."""
    aggs = [
        F.sum(pred.cast("long")).alias(f"v{i}")
        for i, (_, pred) in enumerate(checks.items())
    ] + [F.count(F.lit(1)).alias("checked")]
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{name}', v{i}" for i, name in enumerate(checks)
    )
    return one.select(
        F.lit(table).alias("table_name"),
        F.expr(
            f"stack({len(checks)}, {pairs}) AS (check_name, violations)"
        ),
        F.col("checked"),
    ).select(
        "table_name",
        "check_name",
        F.col("violations").cast("long").alias("violations"),
        F.col("checked").cast("long").alias("checked"),
    )


def _unique_check(
    df: DataFrame, table: str, check: str, *keys: str
) -> DataFrame:
    """PK uniqueness as duplicate SURPLUS (rows beyond the first of
    each group — the number of rows a dedup would delete), computed
    over the NULL-FREE subset, plus an explicit ``{check}_no_nulls``
    row counting rows with ANY NULL key column.

    NULL keys are split out deliberately (round-10 ADVICE): Spark
    ``count_distinct(a, b)`` drops any-NULL rows while DuckDB
    ``count(DISTINCT (a, b))`` counts NULL-field structs as values, so
    a single combined number is engine-ambiguous on dirty keys —
    exactly the rows a data-quality audit targets.  Restricting the
    surplus to the NULL-free subset and reporting NULL-keyed rows as
    their own violation count makes both engines (and the report's
    meaning) unambiguous."""
    all_nn = F.lit(True)
    for k in keys:
        all_nn = all_nn & F.col(k).isNotNull()
    # coalesce: sum over an EMPTY table is NULL — the report must say
    # "0 violations", not NULL (round-11 ADVICE fix; oracle twin below)
    one = df.agg(
        F.coalesce(F.sum(all_nn.cast("long")), F.lit(0)).alias("nn"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("nd"),
        F.count(F.lit(1)).alias("checked"),
    )
    return one.select(
        F.lit(table).alias("table_name"),
        F.expr(
            f"stack(2, '{check}', nn - nd,"
            f" '{check}_no_nulls', checked - nn)"
            " AS (check_name, violations)"
        ),
        F.col("checked"),
    ).select(
        "table_name",
        "check_name",
        F.col("violations").cast("long").alias("violations"),
        F.col("checked").cast("long").alias("checked"),
    )


def _fk_check(
    child: DataFrame,
    table: str,
    check: str,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Orphan count in ONE pass over the child: LEFT JOIN the parent's
    distinct keys, count rows whose parent is absent.  Catalyst
    broadcasts small parents; AQE handles the big-big case."""
    pk = parent.select(F.col(parent_key).alias(child_key)).distinct().withColumn(
        "_present", F.lit(1)
    )
    return (
        child.select(child_key)
        .join(pk, child_key, "left")
        .agg(
            F.sum(F.col("_present").isNull().cast("long"))
            .cast("long")
            .alias("violations"),
            F.count(F.lit(1)).cast("long").alias("checked"),
        )
        .select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            "violations",
            "checked",
        )
    )


def expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-validation report over the warehouse: one row per
    (table, check) with the violation and checked counts.  See module
    docstring for the check families and their single-pass shapes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    def not_in(col: str, domain: tuple[str, ...]) -> Column:
        return ~F.col(col).isin(*domain) | F.col(col).isNull()

    parts = [
        _row_checks(
            li,
            "lineitem",
            {
                "discount_range": ~F.col("l_discount").between(0.0, 0.1)
                | F.col("l_discount").isNull(),
                "quantity_range": ~F.col("l_quantity").between(1.0, 50.0)
                | F.col("l_quantity").isNull(),
                "returnflag_domain": not_in("l_returnflag", RETURNFLAG_DOMAIN),
                "shipdate_not_null": F.col("l_shipdate").isNull(),
            },
        ),
        _unique_check(
            li, "lineitem", "pk_unique", "l_orderkey", "l_linenumber"
        ),
        _fk_check(
            li, "lineitem", "fk_orderkey", "l_orderkey", orders, "o_orderkey"
        ),
        _row_checks(
            orders,
            "orders",
            {
                "custkey_not_null": F.col("o_custkey").isNull(),
                "status_domain": not_in("o_orderstatus", ORDERSTATUS_DOMAIN),
                "totalprice_positive": (F.col("o_totalprice") <= 0.0)
                | F.col("o_totalprice").isNull(),
            },
        ),
        _unique_check(orders, "orders", "pk_unique", "o_orderkey"),
        _fk_check(
            orders, "orders", "fk_custkey", "o_custkey", customer, "c_custkey"
        ),
        _row_checks(
            customer,
            "customer",
            {"acctbal_not_null": F.col("c_acctbal").isNull()},
        ),
        _unique_check(customer, "customer", "pk_unique", "c_custkey"),
        _fk_check(
            customer,
            "customer",
            "fk_nationkey",
            "c_nationkey",
            nation,
            "n_nationkey",
        ),
        _row_checks(
            docs,
            "documents",
            {
                "lang_domain": not_in("lang", LANG_DOMAIN),
                "nchars_consistent": (
                    F.col("n_chars") != F.length(F.col("text"))
                )
                | F.col("text").isNull(),
                "text_nonempty": F.col("text").isNull()
                | (F.length(F.col("text")) == 0),
            },
        ),
        _unique_check(docs, "documents", "pk_unique", "doc_id"),
        _row_checks(
            events,
            "events",
            {
                "ts_not_null": F.col("ts").isNull(),
                "type_domain": not_in("event_type", EVENT_TYPE_DOMAIN),
                "user_not_null": F.col("user_id").isNull(),
                "value_positive": (F.col("value") <= 0.0)
                | F.col("value").isNull(),
            },
        ),
        _unique_check(events, "events", "pk_unique", "event_id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "check_name")


# --------------------------------------------------------------------------
# key_skew_profile
# --------------------------------------------------------------------------

#: join keys profiled — the keys this engine's own TPC-H / events joins
#: shuffle on
SKEW_KEYS = (
    ("events", "user_id"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"),
)

#: packed-argmax pad widths: counts < 10^12 rows per key, keys in
#: [0, 10^13) (TPC-H bigint keys stay far below this through sf100k).
#: The low-key tie-break packs the INVERTED key as ``10^13 - 1 - k`` so
#: the result is always in [0, 10^13 - 1] — exactly 13 digits after
#: lpad.  (Round-10 fix: the earlier ``10^13 - k`` form made key 0 pack
#: to the 14-digit 10^13, which lpad TRUNCATES identically in both
#: engines — a silent wrong hot_key the oracle could never catch; the
#: hand-built key-0 pytest now pins this.)  A count overflow would
#: widen the string past the fixed layout and be caught by the oracle
#: hash mismatch.
_CNT_PAD = 12
_KEY_INV = 10**13 - 1


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: for each profiled key, total rows,
    distinct keys, the hottest key (count argmax; LOWEST key id breaks
    ties deterministically) and ``skew_ratio`` = hottest count / mean
    count — the number a salting factor or AQE skew threshold is sized
    from.  One ``groupBy(key).count()`` partial agg per key plus a
    single packed-string argmax over the combiner rows; nothing
    corpus-scale crosses the wire un-combined."""
    outs = []
    for table, key in SKEW_KEYS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(key).cast("long").alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        packed = F.concat(
            F.lpad(F.col("cnt").cast("string"), _CNT_PAD, "0"),
            F.lpad((F.lit(_KEY_INV) - F.col("k")).cast("string"), 13, "0"),
        )
        agg = counts.agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max(packed).alias("m"),
        )
        outs.append(
            agg.select(
                F.lit(table).alias("table_name"),
                F.lit(key).alias("key_column"),
                "n_rows",
                "n_keys",
                F.substring("m", 1, _CNT_PAD).cast("long").alias("max_cnt"),
                (
                    F.lit(_KEY_INV)
                    - F.substring("m", _CNT_PAD + 1, 13).cast("long")
                ).alias("hot_key"),
                rnd(
                    F.substring("m", 1, _CNT_PAD).cast("long")
                    * F.col("n_keys").cast("double")
                    / F.col("n_rows"),
                    4,
                ).alias("skew_ratio"),
            )
        )
    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "key_column")


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------


def _row_checks_sql(table: str, checks: dict[str, str]) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT '{table}' AS table_name, '{name}' AS check_name,"
        f" CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS violations, count(*) AS checked FROM {table}"
        for name, pred in checks.items()
    )
    return rows


def _sql_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def _unique_check_sql(table: str, check: str, *keys: str) -> str:
    """Oracle twin of :func:`_unique_check`: surplus over the NULL-free
    subset (the CASE wrapper nulls out any-NULL key tuples so DuckDB's
    count(DISTINCT) drops them exactly like Spark's count_distinct)
    plus the explicit ``{check}_no_nulls`` row."""
    nn = " AND ".join(f"{k} IS NOT NULL" for k in keys)
    tup = keys[0] if len(keys) == 1 else "(" + ", ".join(keys) + ")"
    return (
        f"SELECT '{table}', '{check}',"
        f" CAST(COALESCE(sum(CASE WHEN {nn} THEN 1 ELSE 0 END), 0)"
        f" - count(DISTINCT CASE WHEN {nn} THEN {tup} END) AS BIGINT),"
        f" count(*) FROM {table}"
        f"\nUNION ALL\n"
        f"SELECT '{table}', '{check}_no_nulls',"
        f" CAST(count(*) - COALESCE(sum(CASE WHEN {nn} THEN 1 ELSE 0 END), 0)"
        f" AS BIGINT),"
        f" count(*) FROM {table}"
    )


ORACLES = {
    "expectations_audit": f"""
        {_row_checks_sql("lineitem", {
            "discount_range": "l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1",
            "quantity_range": "l_quantity IS NULL OR l_quantity < 1.0 OR l_quantity > 50.0",
            "returnflag_domain": f"l_returnflag IS NULL OR l_returnflag NOT IN ({_sql_list(RETURNFLAG_DOMAIN)})",
            "shipdate_not_null": "l_shipdate IS NULL",
        })}
        UNION ALL
        {_unique_check_sql("lineitem", "pk_unique", "l_orderkey", "l_linenumber")}
        UNION ALL
        SELECT 'lineitem', 'fk_orderkey',
               CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT), count(*)
        FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
        UNION ALL
        {_row_checks_sql("orders", {
            "custkey_not_null": "o_custkey IS NULL",
            "status_domain": f"o_orderstatus IS NULL OR o_orderstatus NOT IN ({_sql_list(ORDERSTATUS_DOMAIN)})",
            "totalprice_positive": "o_totalprice IS NULL OR o_totalprice <= 0.0",
        })}
        UNION ALL
        {_unique_check_sql("orders", "pk_unique", "o_orderkey")}
        UNION ALL
        SELECT 'orders', 'fk_custkey',
               CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT), count(*)
        FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey
        UNION ALL
        {_row_checks_sql("customer", {
            "acctbal_not_null": "c_acctbal IS NULL",
        })}
        UNION ALL
        {_unique_check_sql("customer", "pk_unique", "c_custkey")}
        UNION ALL
        SELECT 'customer', 'fk_nationkey',
               CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT), count(*)
        FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
             ON c.c_nationkey = n.n_nationkey
        UNION ALL
        {_row_checks_sql("documents", {
            "lang_domain": f"lang IS NULL OR lang NOT IN ({_sql_list(LANG_DOMAIN)})",
            "nchars_consistent": "text IS NULL OR n_chars <> length(text)",
            "text_nonempty": "text IS NULL OR length(text) = 0",
        })}
        UNION ALL
        {_unique_check_sql("documents", "pk_unique", "doc_id")}
        UNION ALL
        {_row_checks_sql("events", {
            "ts_not_null": "ts IS NULL",
            "type_domain": f"event_type IS NULL OR event_type NOT IN ({_sql_list(EVENT_TYPE_DOMAIN)})",
            "user_not_null": "user_id IS NULL",
            "value_positive": "value IS NULL OR value <= 0.0",
        })}
        UNION ALL
        {_unique_check_sql("events", "pk_unique", "event_id")}
        ORDER BY table_name, check_name
    """,
    "key_skew_profile": "\nUNION ALL\n".join(
        f"""
        (WITH counts AS (
            SELECT CAST({key} AS BIGINT) AS k, count(*) AS cnt
            FROM {table} GROUP BY 1),
        agg AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   count(*) AS n_keys,
                   max(lpad(CAST(cnt AS VARCHAR), {_CNT_PAD}, '0')
                       || lpad(CAST({_KEY_INV} - k AS VARCHAR), 13, '0'))
                       AS m
            FROM counts)
        SELECT '{table}' AS table_name, '{key}' AS key_column,
               n_rows, n_keys,
               CAST(substr(m, 1, {_CNT_PAD}) AS BIGINT) AS max_cnt,
               {_KEY_INV} - CAST(substr(m, {_CNT_PAD} + 1, 13) AS BIGINT)
                   AS hot_key,
               {rnd_sql(
                   f"CAST(substr(m, 1, {_CNT_PAD}) AS BIGINT)"
                   " * CAST(n_keys AS DOUBLE) / n_rows", 4)} AS skew_ratio
        FROM agg)
        """
        for table, key in SKEW_KEYS
    )
    + "\nORDER BY table_name, key_column",
}

QUERIES = {
    "expectations_audit": expectations_audit,
    "key_skew_profile": key_skew_profile,
}


# --------------------------------------------------------------------------
# distribution_drift — batch-vs-baseline histogram drift
# --------------------------------------------------------------------------

#: drift histogram: event values bucket at 25-currency-unit (2500-cent)
#: width, clamped to DRIFT_BUCKETS cells — fixed VALUE-domain edges
#: (portable integer arithmetic), not quantile edges (which would need
#: a global sort and differ per run).
DRIFT_BUCKET_CENTS = 2500
DRIFT_BUCKETS = 20

#: deterministic batch membership: ~1/8 of events by md5-derived hash —
#: the same derived-batch idiom as the incremental-dedup family's
#: ``doc_id``-hash batches, so both engines pick identical members.
DRIFT_BATCH_MOD = 8


def drift_bucket_counts(events: DataFrame) -> DataFrame:
    """Per-bucket (n_base, n_batch) conditional sums — the part of
    :func:`distribution_drift` that works identically on a batch or
    STREAMING events DataFrame (streaming/drift_stream.py is the live
    twin: these counters run in complete mode, state = DRIFT_BUCKETS
    rows)."""
    from .dedup import hash60

    cents = F.round(F.col("value") * 100).cast("long")
    bucket = F.least(
        F.floor(cents / DRIFT_BUCKET_CENTS).cast("int"),
        F.lit(DRIFT_BUCKETS - 1),
    )
    is_batch = (
        hash60(F.concat(F.lit("ebatch:"), F.col("event_id").cast("string")))
        % DRIFT_BATCH_MOD
        == 0
    )
    return (
        events.select(bucket.alias("bucket"), is_batch.alias("b"))
        .groupBy("bucket")
        .agg(
            F.sum((~F.col("b")).cast("long")).alias("n_base"),
            F.sum(F.col("b").cast("long")).alias("n_batch"),
        )
    )


def drift_from_counts(counts: DataFrame) -> DataFrame:
    """Shares → divergence contributions over a bucket-count table."""
    totals = counts.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_batch").alias("t_batch")
    )
    p = F.col("n_base") / F.col("t_base").cast("double")
    q = F.col("n_batch") / F.col("t_batch").cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_base",
            "n_batch",
            rnd(p, 6).alias("p_base"),
            rnd(q, 6).alias("q_batch"),
            rnd(F.abs(p - q) / 2.0, 6).alias("tvd_contrib"),
            rnd(
                F.when(F.col("n_base") > 0, (q - p) * (q - p) / p).otherwise(
                    0.0
                ),
                6,
            ).alias("chi2_contrib"),
        )
        .orderBy("bucket")
    )


def distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-drift monitor: does the NEWEST batch's value distribution
    match the corpus baseline?  The check every continuously-fed
    training pipeline runs before accepting a crawl/ingest increment —
    a shifted distribution upstream (a broken scraper, a new source
    mix) shows up here before it poisons downstream statistics.

    One scan: bucket every event by fixed value-domain edges,
    conditional-sum batch vs baseline counts per bucket, convert to
    shares, and emit each bucket's drift contribution under two
    standard divergences computed with PURE ARITHMETIC (engine-exact,
    deliberately avoiding ln-based PSI/KL whose libm last-ulp can
    differ between JVM and C):

    - total-variation contribution ``|p − q| / 2``
    - chi-square contribution ``(q − p)² / p`` (0 where the baseline
      bucket is empty)

    Scale: groupBy(bucket) partial agg (DRIFT_BUCKETS combiner rows per
    partition), one broadcast of the 1-row totals — nothing
    corpus-scale shuffles; the batch predicate is a row-local hash.
    """
    return drift_from_counts(
        drift_bucket_counts(load_table(spark, sf_dir, "events"))
    )


from .dedup import _hash60_sql  # noqa: E402

_DRIFT_BATCH_SQL = (
    _hash60_sql("concat('ebatch:', CAST(event_id AS VARCHAR))")
    + f" % {DRIFT_BATCH_MOD} = 0"
)

ORACLES["distribution_drift"] = f"""
    WITH c AS (
        SELECT least(CAST(floor(CAST(round(value * 100) AS BIGINT)
                                / {DRIFT_BUCKET_CENTS}) AS INT),
                     {DRIFT_BUCKETS - 1}) AS bucket,
               ({_DRIFT_BATCH_SQL}) AS b
        FROM events),
    counts AS (
        SELECT bucket,
               CAST(sum(CASE WHEN b THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
               CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_batch
        FROM c GROUP BY bucket),
    t AS (SELECT sum(n_base) AS t_base, sum(n_batch) AS t_batch FROM counts),
    s AS (
        SELECT bucket, n_base, n_batch,
               n_base / CAST(t_base AS DOUBLE) AS p,
               n_batch / CAST(t_batch AS DOUBLE) AS q
        FROM counts, t)
    SELECT bucket, n_base, n_batch,
           {rnd_sql("p", 6)} AS p_base,
           {rnd_sql("q", 6)} AS q_batch,
           {rnd_sql("abs(p - q) / 2.0", 6)} AS tvd_contrib,
           {rnd_sql(
               "CASE WHEN n_base > 0 THEN (q - p) * (q - p) / p"
               " ELSE 0.0 END", 6)} AS chi2_contrib
    FROM s ORDER BY bucket
"""

QUERIES["distribution_drift"] = distribution_drift
