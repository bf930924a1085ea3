"""Deterministic cross-engine SQL fragments (the oracle-verifiable tier).

Distributed floating-point aggregation is order-dependent: a SUM of
doubles on 32 partitions differs from a single-threaded oracle by ulps,
which breaks value-hash verification. This module builds statistics
queries from a restricted SQL dialect that BOTH Spark SQL and a
single-node ANSI engine (DuckDB) evaluate bit-identically:

- every cross-row reduction is a **fixed-point sum**:
  ``SUM(CAST(ROUND(expr * s, 0) AS BIGINT)) / s`` — integer addition is
  associative, so partitioning order cannot change the result;
- all scalar arithmetic is plain IEEE double ops with identical
  expression trees on both sides;
- only common-dialect constructs (CTEs, window RANK/COUNT, CASE,
  LEAST/FLOOR/SQRT/ABS) are used.

The price is a quantization of inputs at 1/s — pick ``s`` so that
|expr|·s·rows stays under 2^63 (documented per call site). The engine's
fast tier (stats.py: F.corr, stddev_samp, …) remains the default for
interactive use; these fragments are for verification and any workload
that needs reproducible-to-the-bit results.

Each builder returns ONE sql string; the Spark side runs it with
``spark.sql`` over temp views, the oracle runs the same text.
"""

from __future__ import annotations


def lit(x: float) -> str:
    """Double literal for the shared dialect. Spark parses ``1000000.0`` as
    DECIMAL(8,1) while DuckDB parses it as DOUBLE — an explicit CAST keeps
    both engines in IEEE double arithmetic."""
    return f"CAST({float(x)!r} AS DOUBLE)"


def fs(expr: str, scale: float) -> str:
    """Fixed-point (order-independent) sum of ``expr`` quantized at 1/scale.

    The quantization is written on the EXACT fractional part rather than
    as ``ROUND(t, 0)``: both engines implement ROUND on doubles via
    decimal expansion (Spark allocates a BigDecimal per row — it dominated
    the det-tier CPU profile, r13 opt), while this form stays in plain
    IEEE primitives. With ``u = ABS(t)``: ``FLOOR(u)`` is exact, the
    subtraction ``u - FLOOR(u)`` is exact (Sterbenz for u >= 1; FLOOR = 0
    below 1), so ``(FLOOR(u) + (frac >= 0.5)) * SIGN(t)`` reproduces
    ROUND half-away-from-zero bit-identically for ALL |t| < 2^52 — with
    no edge set, unlike the ``FLOOR(t + 0.5)`` trick whose ADDITION can
    round across the boundary (t = 0.49999999999999994 + 0.5 rounds to
    exactly 1.0). Identical expression tree on both engines, so the
    shared-dialect guarantee is preserved; the product is an
    exactly-integral double, so the BIGINT cast is unambiguous on both
    engines (Spark truncates, DuckDB rounds — no fraction either way).
    Covered by test_half_up_long_matches_round."""
    s = lit(scale)
    t = f"(({expr}) * {s})"
    u = f"ABS({t})"
    return (f"SUM(CAST((FLOOR({u}) + (CASE WHEN {u} - FLOOR({u}) >= "
            f"{lit(0.5)} THEN 1 ELSE 0 END)) * SIGN({t}) AS BIGINT))"
            f" / {s}")


def pearson_corr_sql(table: str, pairs: list[dict]) -> str:
    """Single-row query with one ``corr_<x>_<y>`` column per pair.
    r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²)).

    Each pair dict: {x, y, sx, sy, sxx, syy, sxy} — per-term fixed-point
    scales. Pick each so the quantization step (1/s) is ≪ the term's
    magnitude AND |term|·s·rows < 2^63: a 0.05-valued discount column needs
    s≈1e8 where a 1e5-valued price column needs s≈1e4."""
    cols = []
    for p in pairs:
        x, y = p["x"], p["y"]
        n = f"COUNT(CASE WHEN {x} IS NOT NULL AND {y} IS NOT NULL THEN 1 END)"
        sx = fs(f"CASE WHEN {y} IS NOT NULL THEN {x} END", p["sx"])
        sy = fs(f"CASE WHEN {x} IS NOT NULL THEN {y} END", p["sy"])
        sxx = fs(f"CASE WHEN {y} IS NOT NULL THEN {x} * {x} END", p["sxx"])
        syy = fs(f"CASE WHEN {x} IS NOT NULL THEN {y} * {y} END", p["syy"])
        sxy = fs(f"{x} * {y}", p["sxy"])
        cols.append(
            f"(({n}) * ({sxy}) - ({sx}) * ({sy})) / "
            f"(SQRT(({n}) * ({sxx}) - ({sx}) * ({sx})) * "
            f"SQRT(({n}) * ({syy}) - ({sy}) * ({sy}))) AS corr_{x}_{y}")
    return f"SELECT {', '.join(cols)} FROM {table}"


def spearman_corr_sql(table: str, x: str, y: str) -> str:
    """Spearman rho = Pearson on average ranks. Ranks are half-integers, so
    scale 2/4 makes the fixed-point sums EXACT (no quantization at all).
    Rank windows sort globally — this is the verification tier; the fast
    tier uses the same formula over distributed rank approximations."""
    return f"""
WITH p AS (
  SELECT {x} AS x, {y} AS y FROM {table}
  WHERE {x} IS NOT NULL AND {y} IS NOT NULL
),
r AS (
  SELECT
    RANK() OVER (ORDER BY x) + (COUNT(*) OVER (PARTITION BY x) - 1) / CAST(2.0 AS DOUBLE) AS rx,
    RANK() OVER (ORDER BY y) + (COUNT(*) OVER (PARTITION BY y) - 1) / CAST(2.0 AS DOUBLE) AS ry
  FROM p
)
SELECT
  ((COUNT(*)) * ({fs('rx * ry', 4)}) - ({fs('rx', 2)}) * ({fs('ry', 2)})) /
  (SQRT((COUNT(*)) * ({fs('rx * rx', 4)}) - ({fs('rx', 2)}) * ({fs('rx', 2)})) *
   SQRT((COUNT(*)) * ({fs('ry * ry', 4)}) - ({fs('ry', 2)}) * ({fs('ry', 2)}))) AS spearman_rho
FROM r
"""


def ols_regression_sql(table: str, x: str, y: str,
                       scale_x: float = 1e6, scale_y: float = 1e4,
                       scale_xx: float = 1e4, scale_yy: float = 1.0,
                       scale_xy: float = 1e2) -> str:
    """Single-row OLS: slope, intercept, r, r_squared, n (reference T1
    computes these with scipy.linregress; identical closed form)."""
    n = f"COUNT(CASE WHEN {x} IS NOT NULL AND {y} IS NOT NULL THEN 1 END)"
    sx = fs(f"CASE WHEN {y} IS NOT NULL THEN {x} END", scale_x)
    sy = fs(f"CASE WHEN {x} IS NOT NULL THEN {y} END", scale_y)
    sxx = fs(f"CASE WHEN {y} IS NOT NULL THEN {x} * {x} END", scale_xx)
    syy = fs(f"CASE WHEN {x} IS NOT NULL THEN {y} * {y} END", scale_yy)
    sxy = fs(f"{x} * {y}", scale_xy)
    return f"""
WITH s AS (
  SELECT CAST({n} AS DOUBLE) AS n, {sx} AS sx, {sy} AS sy,
         {sxx} AS sxx, {syy} AS syy, {sxy} AS sxy
  FROM {table}
)
SELECT
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
  (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS r,
  ((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))) *
  ((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))) AS r_squared,
  CAST(n AS BIGINT) AS n
FROM s
"""


def anova_sql(table: str, group_col: str, value_col: str,
              scale_v: float = 1e6, scale_vv: float = 1e2,
              scale_term: float = 1e2) -> str:
    """One-way ANOVA table: F, dfs, SS decomposition, eta². Per-group and
    grand sums are fixed-point; the cross-group reduction of
    n·(mean−grand)² is fixed-point again so group iteration order cannot
    matter."""
    v, g = value_col, group_col
    return f"""
WITH grand AS (
  SELECT CAST(COUNT({v}) AS DOUBLE) AS n,
         ({fs(v, scale_v)}) / COUNT({v}) AS mean,
         {fs(f'{v} * {v}', scale_vv)} AS s2
  FROM {table} WHERE {v} IS NOT NULL AND {g} IS NOT NULL
),
grp AS (
  SELECT {g} AS grp, CAST(COUNT({v}) AS DOUBLE) AS n,
         ({fs(v, scale_v)}) / COUNT({v}) AS mean
  FROM {table} WHERE {v} IS NOT NULL AND {g} IS NOT NULL
  GROUP BY {g}
),
parts AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
         {fs('grp.n * (grp.mean - grand.mean) * (grp.mean - grand.mean)', scale_term)} AS ss_between
  FROM grp CROSS JOIN grand
),
sums AS (
  SELECT parts.k AS k, grand.n AS n, parts.ss_between AS ss_between,
         grand.s2 - grand.n * grand.mean * grand.mean AS ss_total
  FROM parts CROSS JOIN grand
)
SELECT
  (ss_between / (k - 1)) / ((ss_total - ss_between) / (n - k)) AS f_statistic,
  CAST(k - 1 AS BIGINT) AS df_between,
  CAST(n - k AS BIGINT) AS df_within,
  ss_between AS ss_between,
  ss_total - ss_between AS ss_within,
  ss_total AS ss_total,
  ss_between / ss_total AS eta_squared
FROM sums
"""


def histogram_sql(table: str, column: str, bins: int = 10) -> str:
    """Fixed-width histogram with data-derived [lo, hi] and a closed last
    bin — mirrors stats.histogram's arithmetic exactly."""
    c = column
    return f"""
WITH b AS (
  SELECT MIN(CAST({c} AS DOUBLE)) AS lo, MAX(CAST({c} AS DOUBLE)) AS hi
  FROM {table} WHERE {c} IS NOT NULL
),
binned AS (
  SELECT LEAST(CAST(FLOOR((CAST({c} AS DOUBLE) - b.lo) / ((b.hi - b.lo) / {bins})) AS INT),
               {bins - 1}) AS bin,
         b.lo AS lo, (b.hi - b.lo) / {bins} AS width
  FROM {table} CROSS JOIN b
  WHERE {c} IS NOT NULL
)
SELECT bin,
       MIN(lo) + bin * MIN(width) AS bin_start,
       MIN(lo) + (bin + 1) * MIN(width) AS bin_end,
       COUNT(*) AS n
FROM binned GROUP BY bin
"""


def quality_audit_sql(table: str, key: str, columns: list[str]) -> str:
    """Single-row audit: row count, missing per column, duplicate keys,
    fully-duplicate rows (all integer aggregates → trivially exact)."""
    miss = ", ".join(
        f"COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_missing_{c}" for c in columns)
    col_list = ", ".join(columns)
    return f"""
SELECT COUNT(*) AS n_rows,
       {miss},
       COUNT(*) - COUNT(DISTINCT {key}) AS n_duplicate_keys,
       COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT {col_list} FROM {table}) AS d)
         AS n_duplicate_rows
FROM {table}
"""


def pricing_summary_sql(table: str = "lineitem",
                        cutoff: str = "1998-09-02") -> str:
    """TPC-H Q1-shaped pricing summary with order-independent sums.
    Exercises the grouped multi-aggregate path end-to-end: pushed date
    filter → partial (map-side) aggregation → one shuffle on the 2-column
    group key. Scales chosen so every quantized term is EXACT for 2-dp
    inputs (disc_price has 4 dp, charge 6 dp) and |v|·s·rows < 2^63 at
    sf ≤ 1."""
    qty = fs("l_quantity", 1e6)
    price = fs("l_extendedprice", 1e4)
    disc_price = fs("l_extendedprice * (1 - l_discount)", 1e4)
    charge = fs("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1e6)
    disc = fs("l_discount", 1e8)
    return f"""
SELECT l_returnflag, l_linestatus,
       {qty} AS sum_qty,
       {price} AS sum_base_price,
       {disc_price} AS sum_disc_price,
       {charge} AS sum_charge,
       ({qty}) / COUNT(*) AS avg_qty,
       ({price}) / COUNT(*) AS avg_price,
       ({disc}) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM {table}
WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def iqr_outliers_sql(table: str, column: str, percentile_fn: str) -> str:
    """A6's IQR outlier audit (reference: analysis/statistics.py:160-171):
    1.5×IQR fences from exact quartiles (rounded to 4 to kill
    interpolation ulps), count outside. ``percentile_fn``:
    'percentile' (Spark) vs 'quantile_cont' (DuckDB)."""
    c = column
    return f"""
WITH q AS (
  SELECT ROUND({percentile_fn}({c}, 0.25), 4) AS q25,
         ROUND({percentile_fn}({c}, 0.75), 4) AS q75
  FROM {table} WHERE {c} IS NOT NULL
),
f AS (
  SELECT q25, q75,
         q25 - {lit(1.5)} * (q75 - q25) AS lo,
         q75 + {lit(1.5)} * (q75 - q25) AS hi
  FROM q
)
SELECT f.q25, f.q75, f.lo AS lower_fence, f.hi AS upper_fence,
       COUNT(CASE WHEN {c} < f.lo OR {c} > f.hi THEN 1 END) AS n_outliers,
       COUNT({c}) AS n
FROM {table} CROSS JOIN f
WHERE {c} IS NOT NULL
GROUP BY f.q25, f.q75, f.lo, f.hi
"""


def density_2d_sql(table: str, col_x: str, col_y: str,
                   bins_x: int = 10, bins_y: int = 10) -> str:
    """T9 2D density heatmap: fixed-width bins on both axes with
    data-derived ranges and closed last bins — the plotly
    ``px.density_heatmap`` grid (reference: pages/plotting.py:934-949)."""
    x, y = col_x, col_y
    return f"""
WITH b AS (
  SELECT MIN(CAST({x} AS DOUBLE)) AS xlo, MAX(CAST({x} AS DOUBLE)) AS xhi,
         MIN(CAST({y} AS DOUBLE)) AS ylo, MAX(CAST({y} AS DOUBLE)) AS yhi
  FROM {table} WHERE {x} IS NOT NULL AND {y} IS NOT NULL
),
binned AS (
  SELECT LEAST(CAST(FLOOR((CAST({x} AS DOUBLE) - b.xlo) / ((b.xhi - b.xlo) / {bins_x})) AS INT),
               {bins_x - 1}) AS bin_x,
         LEAST(CAST(FLOOR((CAST({y} AS DOUBLE) - b.ylo) / ((b.yhi - b.ylo) / {bins_y})) AS INT),
               {bins_y - 1}) AS bin_y
  FROM {table} CROSS JOIN b
  WHERE {x} IS NOT NULL AND {y} IS NOT NULL
)
SELECT bin_x, bin_y, COUNT(*) AS n
FROM binned GROUP BY bin_x, bin_y
"""


def dist_stats_sql(table: str, column: str, percentile_fn: str,
                   scale_v: float = 1e6, scale_vv: float = 1e2) -> str:
    """Distribution stats (T2): n, mean, sample std/var, min/max/range,
    quartiles, IQR. ``percentile_fn`` is the only engine-specific part:
    'percentile' (Spark) vs 'quantile_cont' (DuckDB); both are exact
    linear-interpolation quantiles, rounded to 4 to kill interpolation
    ulp differences."""
    c = column
    mean = f"(({fs(c, scale_v)}) / COUNT({c}))"
    s2 = fs(f"{c} * {c}", scale_vv)
    var = f"(({s2}) - COUNT({c}) * {mean} * {mean}) / (COUNT({c}) - 1)"
    return f"""
SELECT CAST(COUNT({c}) AS BIGINT) AS n,
       {mean} AS mean,
       {var} AS variance,
       SQRT({var}) AS std,
       MIN({c}) AS min, MAX({c}) AS max,
       MAX({c}) - MIN({c}) AS range,
       ROUND({percentile_fn}({c}, 0.25), 4) AS q25,
       ROUND({percentile_fn}({c}, 0.5), 4) AS median,
       ROUND({percentile_fn}({c}, 0.75), 4) AS q75,
       ROUND({percentile_fn}({c}, 0.75), 4) - ROUND({percentile_fn}({c}, 0.25), 4) AS iqr
FROM {table} WHERE {c} IS NOT NULL
"""


def shipping_priority_sql(segment: str = "BUILDING",
                          cutoff: str = "1998-01-01", k: int = 10) -> str:
    """TPC-H Q3-shaped shipping priority: customer ⋈ orders ⋈ lineitem
    (3-way equi-join), per-order fixed-point revenue, deterministic top-k.

    Scale reasoning: revenue term |l_extendedprice·(1−l_discount)| ≤ ~1.1e5
    with exactly 4 decimal places (2-dp price × 2-dp discount), so s=1e4
    quantizes EXACTLY and |v|·s·rows ≈ 1e5·1e4·6e5 ≪ 2^63 at sf ≤ 1.
    Top-k is well-defined under ties via the (revenue DESC, o_orderkey ASC)
    ROW_NUMBER — LIMIT alone would be nondeterministic across engines.

    Plan shape at scale: both filters push to their scans; customer(segment)
    broadcasts; the orders⋈lineitem join shuffles on orderkey once and the
    GROUP BY reuses that partitioning (same key → no second exchange)."""
    rev = fs("l_extendedprice * (1 - l_discount)", 1e4)
    return f"""
WITH g AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority, {rev} AS revenue
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = '{segment}'
    AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
    AND l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
  GROUP BY o_orderkey, o_orderdate, o_orderpriority
),
r AS (
  SELECT g.*, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS rk
  FROM g
)
SELECT o_orderkey, o_orderdate, o_orderpriority, revenue, CAST(rk AS INT) AS rank
FROM r WHERE rk <= {k}
"""


def regional_volume_sql(region: str = "ASIA", date_lo: str = "1996-01-01",
                        date_hi: str = "1999-01-01") -> str:
    """TPC-H Q5-shaped local-supplier volume: a 6-way snowflake join
    (region → nation → supplier ⋈ lineitem ⋈ orders ⋈ customer) with the
    "local" constraint c_nationkey = s_nationkey, fixed-point revenue per
    nation. Exercises Catalyst join reordering end-to-end: region/nation/
    supplier/customer are all broadcast-side, so the only shuffle left is
    orders ⋈ lineitem on orderkey followed by the tiny n_name aggregate.
    Same s=1e4 exact-quantization argument as shipping_priority_sql."""
    rev = fs("l_extendedprice * (1 - l_discount)", 1e4)
    return f"""
SELECT n_name, {rev} AS revenue, COUNT(*) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{date_hi} 00:00:00'
GROUP BY n_name
"""


def mad_outliers_sql(table: str, group_col: str, column: str,
                     percentile_fn: str) -> str:
    """Per-group robust dispersion: exact median, MAD (median absolute
    deviation) and the count of rows beyond the 3×MAD fence — the
    outlier audit A10 runs with IQR fences, re-based on the robust
    estimator that tolerates up to 50% contamination. ``percentile_fn``
    is the only engine-specific token ('percentile' Spark /
    'quantile_cont' DuckDB). Median and MAD are rounded to 4 decimals
    BEFORE the fence comparison so the engines' differing interpolation
    expression trees cannot flip a boundary row.

    Plan shape (Spark): two grouped exact-percentile passes (each one
    shuffle on the group key) + a final grouped count; the |groups|-row
    med/mad relations broadcast back. Exact medians sort per group — at
    the 100 TB tier substitute approx_percentile via stats.approx_quantiles
    and keep this form for verification runs.
    """
    g, c, fn = group_col, column, percentile_fn
    three = lit(3.0)
    return f"""
WITH med AS (
  SELECT {g} AS grp, ROUND({fn}({c}, 0.5), 4) AS med
  FROM {table} WHERE {c} IS NOT NULL GROUP BY {g}
),
mad AS (
  SELECT t.{g} AS grp, ROUND({fn}(ABS(t.{c} - m.med), 0.5), 4) AS mad
  FROM {table} t JOIN med m ON t.{g} = m.grp
  WHERE t.{c} IS NOT NULL GROUP BY t.{g}
)
SELECT t.{g}, MIN(m.med) AS median, MIN(d.mad) AS mad,
       COUNT(CASE WHEN ABS(t.{c} - m.med) > {three} * d.mad THEN 1 END) AS n_outliers,
       COUNT(*) AS n
FROM {table} t
JOIN med m ON t.{g} = m.grp
JOIN mad d ON t.{g} = d.grp
WHERE t.{c} IS NOT NULL
GROUP BY t.{g}
"""


def grouped_k2_sql(table: str, group_col: str, value_col: str,
                   scale_mu: float = 1e2, scale_d2: float = 1e2,
                   scale_d3: float = 1e-2, scale_d4: float = 1e-5) -> str:
    """Deterministic D'Agostino-Pearson K² per group — the exact
    ``stats.dagostino_k2`` formulas as shared-dialect SQL (T3's
    oracle-checkable tier; the applyInPandas tier carries the scipy
    extras). Two passes: per-group fixed-point mean, then fixed-point
    CENTRAL moments against that mean — identical BIGINT moment sums on
    any engine/partitioning, so the scalar z-transform chain starts from
    bit-identical doubles. K² and p round to 1e-6/1e-9 to absorb libm
    ln/exp last-ulp differences (the only non-exact step).

    Moment scales assume |value| ≲ 1e4 and groups ≲ 1e6 rows (see
    ``fs`` overflow envelope); pass smaller scales for wider data."""
    v, g = value_col, group_col
    d = f"({v} - m.mu)"
    return f"""
WITH allg AS (
  SELECT {g} AS grp, CAST(COUNT({v}) AS DOUBLE) AS n,
         ({fs(v, scale_mu)}) / COUNT({v}) AS mu
  FROM {table} WHERE {v} IS NOT NULL AND {g} IS NOT NULL
  GROUP BY {g}
),
m AS (
  -- K² is undefined below n=8 (kurtosis z-transform): only n>=8 groups
  -- enter the z-formula chain so ANSI SQL mode (divide-by-zero = error,
  -- not NULL) never sees degenerate n; the small groups re-enter the
  -- OUTPUT with NULL k2 via the final UNION — same every-group contract
  -- as the grouped_normality applyInPandas tier
  SELECT * FROM allg WHERE n >= 8
),
mom AS (
  SELECT m.grp, m.n, m.mu,
         ({fs(f'{d} * {d}', scale_d2)}) / m.n AS m2,
         ({fs(f'{d} * {d} * {d}', scale_d3)}) / m.n AS m3,
         ({fs(f'({d} * {d}) * ({d} * {d})', scale_d4)}) / m.n AS m4
  FROM {table} t JOIN m ON t.{g} = m.grp
  WHERE t.{v} IS NOT NULL
  GROUP BY m.grp, m.n, m.mu
),
zs_in AS (
  SELECT grp, n, mu, m2, m4,
         (m3 / (m2 * SQRT(m2))) * SQRT((n + 1) * (n + 3) / (6.0 * (n - 2))) AS y,
         3.0 * (n * n + 27.0 * n - 70.0) * (n + 1) * (n + 3)
           / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9)) AS beta2
  FROM mom
),
zs AS (
  SELECT grp, n, mu, m2, m4,
         (1.0 / SQRT(0.5 * LN(SQRT(2.0 * (beta2 - 1.0)) - 1.0)))
         * LN(
             (CASE WHEN y = 0 THEN 1.0 ELSE y END)
               / SQRT(2.0 / (SQRT(2.0 * (beta2 - 1.0)) - 1.0 - 1.0))
             + SQRT(
                 ((CASE WHEN y = 0 THEN 1.0 ELSE y END)
                    / SQRT(2.0 / (SQRT(2.0 * (beta2 - 1.0)) - 1.0 - 1.0)))
                 * ((CASE WHEN y = 0 THEN 1.0 ELSE y END)
                    / SQRT(2.0 / (SQRT(2.0 * (beta2 - 1.0)) - 1.0 - 1.0)))
                 + 1.0)) AS z_skew
  FROM zs_in
),
zk_in AS (
  SELECT grp, n, mu, z_skew,
         ((m4 / (m2 * m2)) - 3.0 * (n - 1) / (n + 1))
           / SQRT(24.0 * n * (n - 2) * (n - 3)
                  / ((n + 1) * (n + 1) * (n + 3) * (n + 5))) AS xx,
         6.0 + 8.0 / (6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7) * (n + 9))
                      * SQRT(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
             * (2.0 / (6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7) * (n + 9))
                       * SQRT(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
                + SQRT(1.0 + 4.0 / ((6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7) * (n + 9))
                       * SQRT(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
                      * (6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7) * (n + 9))
                       * SQRT(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))))) AS a
  FROM zs
),
zk AS (
  SELECT grp, n, mu, z_skew,
         ((1.0 - 2.0 / (9.0 * a))
          - SIGN(1.0 + xx * SQRT(2.0 / (a - 4.0)))
            * POWER((1.0 - 2.0 / a) / ABS(1.0 + xx * SQRT(2.0 / (a - 4.0))),
                    {lit(1.0)} / {lit(3.0)}))
         / SQRT(2.0 / (9.0 * a)) AS z_kurt
  FROM zk_in
)
SELECT grp AS {g}, CAST(n AS BIGINT) AS n, mu AS mean,
       ROUND(z_skew * z_skew + z_kurt * z_kurt, 6) AS k2,
       ROUND(EXP(-(z_skew * z_skew + z_kurt * z_kurt) / 2.0), 9) AS p_k2
FROM zk
UNION ALL
SELECT grp AS {g}, CAST(n AS BIGINT) AS n, mu AS mean,
       CAST(NULL AS DOUBLE) AS k2, CAST(NULL AS DOUBLE) AS p_k2
FROM allg WHERE n < 8
"""
