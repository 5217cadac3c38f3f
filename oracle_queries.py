"""DuckDB oracle SQL for every entry in ``__spark_entry__.queries()``.

Each statement mirrors its Spark query exactly: same derived columns (CTEs
``t``/``tp``/``tm`` reproduce the injected-NaN helper columns), same aliases,
same rounding.  Tables region nation customer supplier part orders lineitem
events documents embeddings are pre-registered views.
"""

# unique element-order index: portable 60-bit hash of the full
# distinguishing tuple — the synthetic lineitem duplicates
# (l_orderkey, l_linenumber) pairs, so the natural orderkey*8+linenumber
# index ties with DIFFERENT values and first/last/arg* become ambiguous.
# Must match __spark_entry__._li exactly (floats enter as ×100 integers).
_LI_IDX = """CAST('0x'||substr(md5(concat_ws(':',
             l_orderkey::VARCHAR, l_linenumber::VARCHAR,
             l_partkey::VARCHAR, l_suppkey::VARCHAR,
             CAST(round(l_quantity*100) AS BIGINT)::VARCHAR,
             CAST(round(l_extendedprice*100) AS BIGINT)::VARCHAR)),1,15) AS BIGINT)"""

_LI = f"""
WITH t AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, l_orderkey, l_tax,
         {_LI_IDX} AS idx,
         CASE WHEN l_returnflag='A' AND l_quantity<5
              THEN 'NaN'::DOUBLE ELSE l_quantity END AS v
  FROM lineitem
)
"""

_LIP = f"""
WITH tp AS (
  SELECT l_returnflag, l_linestatus,
         {_LI_IDX} AS idx,
         CASE WHEN l_returnflag='A' AND l_quantity<5
              THEN 'NaN'::DOUBLE ELSE l_extendedprice END AS pv
  FROM lineitem
)
"""

_PROD = """
WITH tp AS (
  SELECT l_orderkey,
         CASE WHEN l_tax < 0.005 THEN 'NaN'::DOUBLE ELSE 1.0 + l_tax END AS pv
  FROM lineitem
)
"""

_EV = """
WITH t AS (
  SELECT event_id, event_type, user_id, ts, value,
         CASE WHEN value<5 THEN 'NaN'::DOUBLE ELSE value END AS vnan,
         CASE WHEN value<50 THEN NULL ELSE value END AS vnull
  FROM events
)
"""

_K = "l_returnflag, l_linestatus"
_NANC = "sum(CASE WHEN isnan(v) THEN 1 ELSE 0 END)"
_CLEANV = "CASE WHEN NOT isnan(v) THEN v END"

# documents tokenization (k used per query)
_TOKS = """
WITH toks AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tk
  FROM documents
)
"""


def _bare(agg_expr: str, name: str, nd: int | None) -> str:
    clean = f"round({agg_expr}, {nd})" if nd is not None else agg_expr
    return f"""{_LI}
SELECT {_K},
       {_NANC} > 0 AS {name}_isnan,
       CASE WHEN {_NANC} > 0 THEN NULL ELSE {clean} END AS "{name}"
FROM t GROUP BY {_K}"""


def _skip(agg_expr: str, name: str, nd: int | None) -> str:
    e = f"round({agg_expr}, {nd})" if nd is not None else agg_expr
    return f'{_LI}\nSELECT {_K}, {e} AS "{name}" FROM t GROUP BY {_K}'


_MINHASH_P = 2147483647  # 2^31 − 1, must match operators/dedup.py


def _minhash_params(i: int) -> tuple[int, int]:
    a = ((40503 * i + 11939) * 2 + 1) % _MINHASH_P
    b = (94261 * i + 12289) % _MINHASH_P
    return a, b


def _minhash_cte(num_hashes: int = 4, k: int = 3) -> str:
    mins = ",\n         ".join(
        "min(({a} * h + {b}) % {p}) AS mh_{i}".format(
            a=_minhash_params(i)[0], b=_minhash_params(i)[1], p=_MINHASH_P, i=i
        )
        for i in range(num_hashes)
    )
    return f"""{_TOKS},
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk)-{k - 1}, 0)+1),
                               i -> array_to_string(tk[i:i+{k - 1}], ' '))) AS sh
  FROM toks
),
hashed AS (
  SELECT doc_id,
         CAST('0x'||substr(md5(':'||sh),1,15) AS BIGINT) % {_MINHASH_P} AS h
  FROM sh
),
sig AS (
  SELECT doc_id AS id,
         {mins}
  FROM hashed GROUP BY doc_id
)"""

def _bands_cte(bands: int = 4, alias: str = "bands") -> str:
    """LSH band-hash CTE over the `sig` table of :func:`_minhash_cte` —
    one generated definition for the five formerly hand-copied UNION
    blocks (r9 entry-layer review: a missed copy on a seed/band change
    would silently alter one oracle's pair set)."""
    parts = []
    for b in range(bands):
        sel = "SELECT id, {b}{alias}, CAST('0x'||substr(md5('band:'||CAST(mh_{b} AS VARCHAR)),1,15) AS BIGINT){bh} FROM sig".format(
            b=b,
            alias=" AS band" if b == 0 else "",
            bh=" AS bh" if b == 0 else "",
        )
        parts.append(sel)
    return (
        ",\n" + alias + " AS (\n  "
        + "\n  UNION ALL\n  ".join(parts)
        + "\n)"
    )



_SIMHASH_BITS = 16
_simhash_votes = ",\n       ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
    for i in range(_SIMHASH_BITS)
)
_simhash_sig = " + ".join(
    f"CASE WHEN v_{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(_SIMHASH_BITS)
)

_LANGS = {
    "de": ("der", "die", "das", "und", "zu"),
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "un"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _score(code):
    ws = ", ".join(f"'{w}'" for w in _LANGS[code])
    return f"len(list_filter(tk, x -> x IN ({ws})))"


_langid_pred = (
    "CASE WHEN m = 0 THEN 'und' "
    + " ".join(f"WHEN s_{c} = m THEN '{c}'" for c in sorted(_LANGS))
    + " END"
)


def _lsh_bucket_sql(vec: str, dim: int = 64, n_planes: int = 6, seed: str = "lshplane") -> str:
    """Random-hyperplane LSH bucket, generated from the SAME deterministic
    md5-derived ±1 planes as the Spark side (operators/similarity.py
    ``_hyperplane``), as an explicit left-to-right sum so the float addition
    order matches Spark's ``aggregate`` fold bit-for-bit."""
    from dask_groupby_spark.operators.similarity import _hyperplane

    cases = []
    for i in range(n_planes):
        p = _hyperplane(dim, i, seed)
        terms = " + ".join(
            f"{vec}[{d + 1}]::DOUBLE * {p[d]:.1f}" for d in range(dim)
        )
        cases.append(f"CASE WHEN (0.0 + {terms}) > 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(cases) + ")"


_COS_SQL = """list_dot_product(qv::DOUBLE[], cv::DOUBLE[]) /
         (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) *
          sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[])))"""


ORACLE_SQL: dict[str, str] = {
    # ---- reductions ----
    "count": f'{_LI}\nSELECT {_K}, count({_CLEANV})::BIGINT AS "count" FROM t GROUP BY {_K}',
    "sum": _bare(f"sum({_CLEANV})", "sum", 4),
    "nansum": _skip(f"coalesce(sum({_CLEANV}), 0)", "nansum", 4),
    "prod": f"""{_PROD}
SELECT l_orderkey,
       sum(CASE WHEN isnan(pv) THEN 1 ELSE 0 END) > 0 AS prod_isnan,
       CASE WHEN sum(CASE WHEN isnan(pv) THEN 1 ELSE 0 END) > 0 THEN NULL
            ELSE round(product(pv), 6) END AS prod
FROM tp GROUP BY l_orderkey""",
    "nanprod": f"""{_PROD}
SELECT l_orderkey,
       round(coalesce(product(CASE WHEN NOT isnan(pv) THEN pv END), 1), 6) AS nanprod
FROM tp GROUP BY l_orderkey""",
    "mean": _bare(f"avg({_CLEANV})", "mean", 6),
    "nanmean": _skip(f"avg({_CLEANV})", "nanmean", 6),
    "var": _bare(f"var_pop({_CLEANV})", "var", 6),
    "nanvar": _skip(f"var_samp({_CLEANV})", "nanvar", 6),
    "std": _bare(f"stddev_samp({_CLEANV})", "std", 6),
    "nanstd": _skip(f"stddev_pop({_CLEANV})", "nanstd", 6),
    "min": _bare(f"min({_CLEANV})", "min", None),
    "max": _bare(f"max({_CLEANV})", "max", None),
    "nanmin": _skip(f"min({_CLEANV})", "nanmin", None),
    "nanmax": _skip(f"max({_CLEANV})", "nanmax", None),
    "argmax": f"""{_LIP},
best AS (
  SELECT l_returnflag, l_linestatus, idx,
         row_number() OVER (PARTITION BY {_K} ORDER BY pv DESC, idx ASC) AS rn
  FROM tp WHERE NOT isnan(pv)
),
stats AS (
  SELECT {_K},
         sum(CASE WHEN isnan(pv) THEN 1 ELSE 0 END) AS nanc,
         min(CASE WHEN isnan(pv) THEN idx END) AS nanidx
  FROM tp GROUP BY {_K}
)
SELECT s.l_returnflag, s.l_linestatus,
       CASE WHEN s.nanc > 0 THEN s.nanidx ELSE b.idx END AS argmax
FROM stats s JOIN (SELECT * FROM best WHERE rn = 1) b USING (l_returnflag, l_linestatus)""",
    "argmin": f"""{_LIP},
best AS (
  SELECT l_returnflag, l_linestatus, idx,
         row_number() OVER (PARTITION BY {_K} ORDER BY pv ASC, idx ASC) AS rn
  FROM tp WHERE NOT isnan(pv)
),
stats AS (
  SELECT {_K},
         sum(CASE WHEN isnan(pv) THEN 1 ELSE 0 END) AS nanc,
         min(CASE WHEN isnan(pv) THEN idx END) AS nanidx
  FROM tp GROUP BY {_K}
)
SELECT s.l_returnflag, s.l_linestatus,
       CASE WHEN s.nanc > 0 THEN s.nanidx ELSE b.idx END AS argmin
FROM stats s JOIN (SELECT * FROM best WHERE rn = 1) b USING (l_returnflag, l_linestatus)""",
    "nanargmax": f"""{_LIP}
SELECT l_returnflag, l_linestatus, idx AS nanargmax FROM (
  SELECT l_returnflag, l_linestatus, idx,
         row_number() OVER (PARTITION BY {_K} ORDER BY pv DESC, idx ASC) AS rn
  FROM tp WHERE NOT isnan(pv)
) WHERE rn = 1""",
    "nanargmin": f"""{_LIP}
SELECT l_returnflag, l_linestatus, idx AS nanargmin FROM (
  SELECT l_returnflag, l_linestatus, idx,
         row_number() OVER (PARTITION BY {_K} ORDER BY pv ASC, idx ASC) AS rn
  FROM tp WHERE NOT isnan(pv)
) WHERE rn = 1""",
    "first": f"""{_LI}
SELECT {_K}, isnan(v) AS first_isnan,
       CASE WHEN isnan(v) THEN NULL ELSE v END AS "first"
FROM (SELECT *, row_number() OVER (PARTITION BY {_K} ORDER BY idx ASC) AS rn FROM t)
WHERE rn = 1""",
    "last": f"""{_LI}
SELECT {_K}, isnan(v) AS last_isnan,
       CASE WHEN isnan(v) THEN NULL ELSE v END AS "last"
FROM (SELECT *, row_number() OVER (PARTITION BY {_K} ORDER BY idx DESC) AS rn FROM t)
WHERE rn = 1""",
    "nanfirst": f"""{_LI}
SELECT {_K}, v AS nanfirst
FROM (SELECT *, row_number() OVER (PARTITION BY {_K} ORDER BY idx ASC) AS rn
      FROM t WHERE NOT isnan(v))
WHERE rn = 1""",
    "nanlast": f"""{_LI}
SELECT {_K}, v AS nanlast
FROM (SELECT *, row_number() OVER (PARTITION BY {_K} ORDER BY idx DESC) AS rn
      FROM t WHERE NOT isnan(v))
WHERE rn = 1""",
    "any": 'SELECT l_orderkey, bool_or(l_quantity > 40) AS "any" FROM lineitem GROUP BY l_orderkey',
    "all": 'SELECT l_orderkey, bool_and(l_quantity > 10) AS "all" FROM lineitem GROUP BY l_orderkey',
    "median": _bare(f"quantile_cont({_CLEANV}, 0.5)", "median", 6),
    "nanmedian": _skip(f"quantile_cont({_CLEANV}, 0.5)", "nanmedian", 6),
    "quantile": _bare(f"quantile_cont({_CLEANV}, 0.9)", "quantile", 6),
    "nunique": _skip(f"count(DISTINCT {_CLEANV})", "nunique", None),
    # approx_quantile: the entry query pins accuracy=1e6 ≥ any sf0.1 group
    # size, where Greenwald-Khanna is exact and equals quantile_disc (both
    # return the actual element at rank ceil(q·n)); NaN values are skipped
    # by percentile_approx, hence the clean-v input.
    "approx_quantile": _skip(f"quantile_disc({_CLEANV}, 0.9)", "approx_quantile", None),
    "complex_nanmean": f"""{_LI}
SELECT {_K},
       round(avg({_CLEANV}), 6) AS re,
       round(avg(CASE WHEN NOT isnan(v) THEN l_extendedprice END), 6) AS im
FROM t GROUP BY {_K}""",
    # complex var is REAL-valued: E|z|^2 - |E z|^2 with ddof in the
    # denominator; z = (v, l_tax), elements missing when re is NaN
    "complex_nanvar": f"""{_LI}
SELECT {_K},
       round((sum(re*re + im*im) - (sum(re)*sum(re) + sum(im)*sum(im))/count(*))
             / (count(*) - 1), 4) AS cvar
FROM (SELECT {_K}, v AS re, l_tax AS im FROM t WHERE NOT isnan(v))
GROUP BY {_K}""",
    # index of the lexicographic max (numpy complex ordering: re, then im),
    # first occurrence on ties, missing elements skipped
    "complex_argmax": f"""{_LI}
SELECT {_K}, idx AS amax_idx FROM (
  SELECT {_K}, idx,
         row_number() OVER (PARTITION BY {_K}
                            ORDER BY v DESC, l_extendedprice DESC, idx ASC) AS rn
  FROM t WHERE NOT isnan(v))
WHERE rn = 1""",
    # lexicographic median: sort valid elements by (re, im), average the two
    # middles on even counts (numpy complex median)
    "complex_nanmedian": f"""{_LI},
s AS (
  SELECT {_K}, v AS re, l_extendedprice AS im,
         row_number() OVER (PARTITION BY {_K} ORDER BY v, l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY {_K}) AS n
  FROM t WHERE NOT isnan(v))
SELECT {_K}, round(avg(re), 6) AS re, round(avg(im), 6) AS im
FROM s WHERE rn IN ((n + 1) // 2, n // 2 + 1)
GROUP BY {_K}""",
    "nanquantile_vec": f"""{_LI}
SELECT {_K}, 0::BIGINT AS qi,
       round(quantile_cont({_CLEANV}, 0.45), 6) AS nanquantile
FROM t GROUP BY {_K}
UNION ALL
SELECT {_K}, 1::BIGINT AS qi,
       round(quantile_cont({_CLEANV}, 0.9), 6) AS nanquantile
FROM t GROUP BY {_K}""",
    "mode": f"""{_LI},
counts AS (
  SELECT {_K}, v, count(*) AS c FROM t WHERE NOT isnan(v) GROUP BY {_K}, v
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY {_K} ORDER BY c DESC, v ASC) AS rn FROM counts
),
flags AS (SELECT {_K}, bool_or(isnan(v)) AS f FROM t GROUP BY {_K})
SELECT p.l_returnflag, p.l_linestatus, f.f AS mode_isnan,
       CASE WHEN f.f THEN NULL ELSE p.v END AS mode
FROM pick p JOIN flags f USING (l_returnflag, l_linestatus) WHERE rn = 1""",
    "nanmode": f"""{_LI},
counts AS (
  SELECT {_K}, v, count(*) AS c FROM t WHERE NOT isnan(v) GROUP BY {_K}, v
)
SELECT l_returnflag, l_linestatus, v AS nanmode FROM (
  SELECT *, row_number() OVER (PARTITION BY {_K} ORDER BY c DESC, v ASC) AS rn FROM counts
) WHERE rn = 1""",
    # ---- grouping features ----
    "bins_right": """
SELECT CAST(b AS BIGINT) AS l_quantity_bin, count(l_extendedprice)::BIGINT AS "count"
FROM (
  SELECT CASE WHEN l_quantity >  0 AND l_quantity <= 10 THEN 0
              WHEN l_quantity > 10 AND l_quantity <= 20 THEN 1
              WHEN l_quantity > 20 AND l_quantity <= 30 THEN 2
              WHEN l_quantity > 30 AND l_quantity <= 40 THEN 3
              WHEN l_quantity > 40 AND l_quantity <= 50 THEN 4 END AS b,
         l_extendedprice
  FROM lineitem
) WHERE b IS NOT NULL GROUP BY 1""",
    "bins_left": """
SELECT CAST(b AS BIGINT) AS l_quantity_bin, round(sum(l_extendedprice), 1) AS nansum
FROM (
  SELECT CASE WHEN l_quantity >=  1 AND l_quantity < 10 THEN 0
              WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1
              WHEN l_quantity >= 20 AND l_quantity < 30 THEN 2
              WHEN l_quantity >= 30 AND l_quantity < 40 THEN 3
              WHEN l_quantity >= 40 AND l_quantity < 51 THEN 4 END AS b,
         l_extendedprice
  FROM lineitem
) WHERE b IS NOT NULL GROUP BY 1""",
    "reindex_fill": """
SELECT n.n_nationkey AS c_nationkey, coalesce(c.cnt, 0)::BIGINT AS "count"
FROM nation n LEFT JOIN (
  SELECT c_nationkey, count(c_acctbal) AS cnt FROM customer GROUP BY 1
) c ON n.n_nationkey = c.c_nationkey""",
    "grid_fill": """
WITH g AS (SELECT DISTINCT o_orderstatus FROM orders),
     p AS (SELECT DISTINCT o_orderpriority FROM orders),
     c AS (SELECT o_orderstatus, o_orderpriority, count(o_totalprice) AS cnt
           FROM orders GROUP BY 1, 2)
SELECT g.o_orderstatus, p.o_orderpriority, coalesce(c.cnt, 0)::BIGINT AS "count"
FROM g CROSS JOIN p
LEFT JOIN c ON c.o_orderstatus = g.o_orderstatus AND c.o_orderpriority = p.o_orderpriority""",
    "min_count": """
WITH tm AS (
  SELECT l_returnflag, l_linestatus,
         CASE WHEN l_quantity < 48 THEN 'NaN'::DOUBLE ELSE l_quantity END AS mv
  FROM lineitem
)
SELECT l_returnflag, l_linestatus,
       CASE WHEN count(CASE WHEN NOT isnan(mv) THEN 1 END) < 600 THEN -1.0
            ELSE round(sum(CASE WHEN NOT isnan(mv) THEN mv END), 4) END AS nansum
FROM tm GROUP BY l_returnflag, l_linestatus""",
    "dayofyear": f"""{_EV}
SELECT dayofyear(ts)::BIGINT AS doy,
       round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS nanmean
FROM t GROUP BY 1""",
    "month_hour": f"""{_EV}
SELECT month(ts)::BIGINT AS m, hour(ts)::BIGINT AS h,
       round(coalesce(sum(CASE WHEN NOT isnan(vnan) THEN vnan END), 0), 4) AS nansum
FROM t GROUP BY 1, 2""",
    "resample_5d": """
SELECT CAST(floor(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) / 5) AS BIGINT) AS bucket,
       round(sum(o_totalprice), 2) AS nansum
FROM orders GROUP BY 1""",
    "resample_time": f"""{_EV}
SELECT time_bucket(INTERVAL 1 DAY, ts) AS bucket,
       round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS nanmean
FROM t GROUP BY 1""",
    # finite-input streaming == batch: tumbling 1-day window sum per
    # event_type (window start boundaries are epoch-aligned in UTC on both
    # engines; NULL-ts rows excluded — unassignable to an event-time window)
    "stream_window": f"""{_EV}
SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start, event_type,
       round(sum(value), 4) AS nansum
FROM t WHERE ts IS NOT NULL GROUP BY 1, 2""",
    # late-data contract: the stream replays batches (Jan 1-10, Jan 21-25,
    # Jan 26-30, then Jan 11-20 stragglers); watermark = max(on-time ts) -
    # 3 days, so every straggler's day-window is long past both the late-
    # event and eviction watermarks (dropped) and append mode emits exactly
    # the windows ending <= the final watermark over the on-time batches
    "stream_late": """
WITH wm AS (
  SELECT max(ts) - INTERVAL 3 DAY AS w FROM events
  WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
)
SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start, event_type,
       round(sum(value), 4) AS nansum
FROM events
WHERE ts IS NOT NULL
  AND (ts < TIMESTAMP '2024-01-11 00:00:00'
       OR ts >= TIMESTAMP '2024-01-21 00:00:00')
  AND time_bucket(INTERVAL 1 DAY, ts) + INTERVAL 1 DAY <= (SELECT w FROM wm)
GROUP BY 1, 2""",
    "stream_agg": f"""{_EV}
SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start, event_type,
       count(value)::BIGINT AS n,
       round(sum(value), 4) AS total,
       round(avg(value), 6) AS avg_v
FROM t WHERE ts IS NOT NULL GROUP BY 1, 2""",
    "stream_enrich": f"""{_EV}
SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
       coalesce(c_mktsegment, 'UNKNOWN') AS seg,
       count(value)::BIGINT AS n
FROM t LEFT JOIN customer ON t.user_id = customer.c_custkey
WHERE ts IS NOT NULL GROUP BY 1, 2""",
    "stream_join": """
SELECT l.user_id, l.event_id AS click_id, r.event_id AS view_id
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'view'
 AND r.ts >= l.ts - INTERVAL 2 HOUR AND r.ts <= l.ts""",
    # virtual datetime accessors resolve to the same month/hour derivation
    "accessor_climatology": f"""{_EV}
SELECT month(ts)::INT AS month, hour(ts)::INT AS hour,
       round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS nanmean
FROM t WHERE ts IS NOT NULL GROUP BY 1, 2""",
    "stream_dedup": """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1""",
    "stream_cumsum": """
SELECT user_id,
       count(value) FILTER (WHERE NOT isnan(value)) AS n_seen,
       round(sum(value) FILTER (WHERE NOT isnan(value)), 4) AS running_sum
FROM events GROUP BY 1""",
    "xdim_bins": """
SELECT CASE b WHEN 0 THEN '(0.0, 10.0]' WHEN 1 THEN '(10.0, 20.0]'
              WHEN 2 THEN '(20.0, 30.0]' WHEN 3 THEN '(30.0, 40.0]'
              WHEN 4 THEN '(40.0, 50.0]' END AS quantity_interval,
       round(sum(l_extendedprice), 1) AS nansum
FROM (
  SELECT CASE WHEN l_quantity >  0 AND l_quantity <= 10 THEN 0
              WHEN l_quantity > 10 AND l_quantity <= 20 THEN 1
              WHEN l_quantity > 20 AND l_quantity <= 30 THEN 2
              WHEN l_quantity > 30 AND l_quantity <= 40 THEN 3
              WHEN l_quantity > 40 AND l_quantity <= 50 THEN 4 END AS b,
         l_extendedprice
  FROM lineitem
) WHERE b IS NOT NULL GROUP BY 1""",
    # floor(mean) via exact integer sum + floor division (// on HUGEINT) —
    # a double avg() here can flip floor() vs Spark on summation order
    "calendar_mean": """
WITH e AS (
  SELECT event_type,
         CAST((year(ts) - 1) * 365
          + CASE month(ts) WHEN 1 THEN 0 WHEN 2 THEN 31 WHEN 3 THEN 59
                WHEN 4 THEN 90 WHEN 5 THEN 120 WHEN 6 THEN 151 WHEN 7 THEN 181
                WHEN 8 THEN 212 WHEN 9 THEN 243 WHEN 10 THEN 273
                WHEN 11 THEN 304 ELSE 334 END
          + day(ts) - 1 AS HUGEINT) * 86400
         + hour(ts) * 3600 + minute(ts) * 60 + CAST(floor(second(ts)) AS BIGINT)
         AS noleap_off
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       CAST(sum(noleap_off) // count(*) AS BIGINT) AS mean_noleap_sec
FROM e GROUP BY 1 ORDER BY 1""",
    "xdim_dataset": f"""{_EV}
SELECT event_type, month(ts)::INT AS month,
       round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS vnan,
       round(avg(value), 6) AS value
FROM t WHERE ts IS NOT NULL GROUP BY 1, 2""",
    "xdim_reduce": f"""{_EV}
SELECT event_type, month(ts)::INT AS month,
       round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS nanmean
FROM t WHERE ts IS NOT NULL GROUP BY 1, 2""",
    # session windows as gaps-and-islands: break at silence >= 30 min
    # (Spark session_window: event at exactly prev_ts + gap opens a NEW
    # session); session_end = last event + gap
    "stream_session": f"""{_EV},
s AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM t WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       round(sum(value), 4) AS nansum
FROM g GROUP BY user_id, sid""",
    # dense cross grid: every (day bucket between observed min/max) ×
    # (observed event_type), empty cells filled with 0
    "resample_dense_keys": f"""{_EV},
agg AS (
  SELECT time_bucket(INTERVAL 1 DAY, ts) AS bucket, event_type,
         coalesce(sum(CASE WHEN NOT isnan(vnan) THEN vnan END), 0) AS s
  FROM t WHERE event_type IS NOT NULL GROUP BY 1, 2),
bounds AS (
  SELECT min(time_bucket(INTERVAL 1 DAY, ts)) AS lo,
         max(time_bucket(INTERVAL 1 DAY, ts)) AS hi FROM t),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds),
                                (SELECT hi FROM bounds),
                                INTERVAL 1 DAY)) AS bucket),
keys AS (SELECT DISTINCT event_type FROM t WHERE event_type IS NOT NULL)
SELECT g.bucket, k.event_type, round(coalesce(a.s, 0), 4) AS nansum
FROM grid g CROSS JOIN keys k
LEFT JOIN agg a ON a.bucket = g.bucket AND a.event_type = k.event_type""",
    "first_ts": """
SELECT event_type, ts::TIMESTAMP AS nanfirst
FROM (SELECT event_type, ts,
             row_number() OVER (PARTITION BY event_type ORDER BY event_id ASC) AS rn
      FROM events WHERE ts IS NOT NULL)
WHERE rn = 1""",
    "mean_ts": """
SELECT event_type,
       make_timestamp(CAST(sum(epoch_us(ts::TIMESTAMP))::HUGEINT // count(ts) AS BIGINT)) AS nanmean
FROM events GROUP BY 1""",
    # ---- scans ----
    "scan_nancumsum": f"""{_EV}
SELECT event_id, event_type,
       round(coalesce(sum(CASE WHEN NOT isnan(vnan) THEN vnan END)
         OVER (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) AS nancumsum
FROM t""",
    "scan_cumsum": f"""{_EV}
SELECT event_id, event_type,
       max(isnan(vnan)::INT) OVER w = 1 AS cumsum_isnan,
       CASE WHEN max(isnan(vnan)::INT) OVER w = 1 THEN NULL
            ELSE round(coalesce(sum(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w, 0), 6)
       END AS cumsum
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "scan_cummax": f"""{_EV}
SELECT event_id, event_type,
       max(isnan(vnan)::INT) OVER w = 1 AS cummax_isnan,
       CASE WHEN max(isnan(vnan)::INT) OVER w = 1 THEN NULL
            ELSE max(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w
       END AS cummax
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "scan_nancummin": f"""{_EV}
SELECT event_id, event_type,
       min(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w IS NULL AS nancummin_isnan,
       min(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w AS nancummin
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "scan_cummin": f"""{_EV}
SELECT event_id, event_type,
       max(isnan(vnan)::INT) OVER w = 1 AS cummin_isnan,
       CASE WHEN max(isnan(vnan)::INT) OVER w = 1 THEN NULL
            ELSE min(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w
       END AS cummin
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "scan_nancummax": f"""{_EV}
SELECT event_id, event_type,
       max(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w IS NULL AS nancummax_isnan,
       max(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w AS nancummax
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "scan_cumcount": f"""{_EV}
SELECT event_id, event_type,
       count(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w AS cumcount
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "scan_shift": f"""{_EV}
SELECT event_id, event_type,
       lag(value, 2) OVER (PARTITION BY event_type ORDER BY event_id) AS shift
FROM t""",
    "pivot": f"""{_EV}
SELECT event_type,
       round(coalesce(sum(CASE WHEN hour(ts) = 0 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_0,
       round(coalesce(sum(CASE WHEN hour(ts) = 1 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_1,
       round(coalesce(sum(CASE WHEN hour(ts) = 2 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_2,
       round(coalesce(sum(CASE WHEN hour(ts) = 3 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_3,
       round(coalesce(sum(CASE WHEN hour(ts) = 4 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_4,
       round(coalesce(sum(CASE WHEN hour(ts) = 5 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_5,
       round(coalesce(sum(CASE WHEN hour(ts) = 6 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_6,
       round(coalesce(sum(CASE WHEN hour(ts) = 7 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_7,
       round(coalesce(sum(CASE WHEN hour(ts) = 8 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_8,
       round(coalesce(sum(CASE WHEN hour(ts) = 9 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_9,
       round(coalesce(sum(CASE WHEN hour(ts) = 10 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_10,
       round(coalesce(sum(CASE WHEN hour(ts) = 11 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_11,
       round(coalesce(sum(CASE WHEN hour(ts) = 12 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_12,
       round(coalesce(sum(CASE WHEN hour(ts) = 13 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_13,
       round(coalesce(sum(CASE WHEN hour(ts) = 14 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_14,
       round(coalesce(sum(CASE WHEN hour(ts) = 15 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_15,
       round(coalesce(sum(CASE WHEN hour(ts) = 16 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_16,
       round(coalesce(sum(CASE WHEN hour(ts) = 17 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_17,
       round(coalesce(sum(CASE WHEN hour(ts) = 18 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_18,
       round(coalesce(sum(CASE WHEN hour(ts) = 19 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_19,
       round(coalesce(sum(CASE WHEN hour(ts) = 20 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_20,
       round(coalesce(sum(CASE WHEN hour(ts) = 21 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_21,
       round(coalesce(sum(CASE WHEN hour(ts) = 22 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_22,
       round(coalesce(sum(CASE WHEN hour(ts) = 23 AND NOT isnan(vnan) THEN vnan END), 0), 4) AS hour_23
FROM t GROUP BY 1 ORDER BY 1""",
    "wsample": """
WITH keyed AS (
  SELECT lang, doc_id,
         -ln(((CAST('0x'||substr(md5('wsamp:'||doc_id::VARCHAR),1,15) AS BIGINT)
               % 9007199254740992) + 1.0) / 9007199254740993.0)
         / n_chars::DOUBLE AS key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC) AS rn
  FROM keyed
)
SELECT lang, doc_id FROM ranked WHERE rn <= 20 ORDER BY lang, doc_id""",
    "stream_sliding": f"""{_EV},
x AS (SELECT unnest([0, 1]) AS k, event_type, ts, value FROM t WHERE ts IS NOT NULL)
SELECT date_trunc('day', ts) - INTERVAL (k) DAY AS window_start,
       date_trunc('day', ts) - INTERVAL (k) DAY + INTERVAL 2 DAY AS window_end,
       event_type,
       round(coalesce(sum(CASE WHEN NOT isnan(value) THEN value END), 0), 4) AS nansum
FROM x GROUP BY 1, 2, 3""",
    "semdedup": f"""
WITH b AS (SELECT vec_id AS id, embedding AS v,
                  {_lsh_bucket_sql('embedding', n_planes=4)} AS bucket
           FROM embeddings),
pairs AS (
  SELECT a.id AS id_a, b2.id AS id_b
  FROM b a JOIN b b2 USING (bucket)
  WHERE a.id < b2.id
    AND list_dot_product(a.v::DOUBLE[], b2.v::DOUBLE[]) /
        (sqrt(list_dot_product(a.v::DOUBLE[], a.v::DOUBLE[])) *
         sqrt(list_dot_product(b2.v::DOUBLE[], b2.v::DOUBLE[]))) >= 0.25
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, r.l FROM edges e JOIN r ON e.d = r.v
  ) SELECT v, l FROM r
),
losers AS (
  SELECT v AS id FROM reach GROUP BY v HAVING v != min(l)
)
SELECT e.vec_id, e.label FROM embeddings e
WHERE e.vec_id NOT IN (SELECT id FROM losers)
ORDER BY e.vec_id""",
    "ewma_scan": f"""{_EV},
w AS (SELECT event_type, event_id,
        list(value) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vs
      FROM t)
SELECT event_id, event_type,
       round(list_sum(list_transform(range(0, len(vs)),
                                     k -> vs[k+1] * pow(0.7, len(vs)-1-k)))
             / list_sum(list_transform(range(0, len(vs)),
                                       k -> pow(0.7, len(vs)-1-k))), 6) AS ewma
FROM w""",
    "rollup": f"""{_EV},
s AS (SELECT event_type, hour(ts)::INT AS hour, vnan FROM t)
SELECT event_type, hour, GROUPING(event_type, hour)::BIGINT AS __grouping_id,
       round(coalesce(sum(CASE WHEN NOT isnan(vnan) THEN vnan END), 0), 4) AS nansum
FROM s GROUP BY ROLLUP (event_type, hour)
ORDER BY 3, 1, 2""",
    "twa": f"""{_EV},
s AS (SELECT event_type, epoch(ts)::DOUBLE AS tt, value FROM t
      WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)),
d AS (SELECT event_type, value,
             coalesce(lead(tt) OVER (PARTITION BY event_type ORDER BY tt ASC), tt) - tt AS dur
      FROM s)
SELECT event_type,
       round(CASE WHEN sum(dur) > 0 THEN sum(value * dur) / sum(dur)
                  ELSE avg(value) END, 6) AS twa
FROM d GROUP BY 1 ORDER BY 1""",
    "describe": f"""{_EV}
SELECT event_type,
       count(CASE WHEN NOT isnan(vnan) THEN vnan END)::BIGINT AS "count",
       round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS mean,
       round(stddev_samp(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS std,
       round(min(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS "min",
       round(quantile_cont(CASE WHEN NOT isnan(vnan) THEN vnan END, 0.25), 6) AS p25,
       round(quantile_cont(CASE WHEN NOT isnan(vnan) THEN vnan END, 0.5), 6) AS p50,
       round(quantile_cont(CASE WHEN NOT isnan(vnan) THEN vnan END, 0.75), 6) AS p75,
       round(max(CASE WHEN NOT isnan(vnan) THEN vnan END), 6) AS "max"
FROM t GROUP BY 1 ORDER BY 1""",
    "corr": """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY 1 ORDER BY 1""",
    "wquantile": f"""{_EV},
s AS (SELECT event_type, value::DOUBLE AS x, 1.0 + (user_id % 5) AS w FROM t),
c AS (SELECT event_type, x,
        sum(w) OVER (PARTITION BY event_type ORDER BY x ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        sum(w) OVER (PARTITION BY event_type) AS tw
      FROM s)
SELECT event_type,
       round(min(CASE WHEN cw >= 0.25*tw THEN x END), 6) AS wq_0_25,
       round(min(CASE WHEN cw >= 0.5*tw THEN x END), 6) AS wq_0_5,
       round(min(CASE WHEN cw >= 0.9*tw THEN x END), 6) AS wq_0_9
FROM c GROUP BY 1 ORDER BY 1""",
    "wquantile_sketch": f"""{_EV},
s AS (SELECT event_type, value::DOUBLE AS x, 1.0 + (user_id % 5) AS w FROM t),
mm AS (SELECT event_type, min(x) AS mn, max(x) AS mx FROM s GROUP BY 1),
h AS (SELECT s.event_type, mn, mx,
        CASE WHEN mx > mn
             THEN LEAST(floor((x - mn) / ((mx - mn) / 1024.0)), 1023)
             ELSE 0 END AS b,
        sum(w) AS sw
      FROM s JOIN mm USING (event_type) GROUP BY 1, 2, 3, 4),
c AS (SELECT event_type, mn, mx, b,
        sum(sw) OVER (PARTITION BY event_type ORDER BY b ASC) AS cw,
        sum(sw) OVER (PARTITION BY event_type) AS tw
      FROM h),
r AS (SELECT event_type, cw, tw,
        CASE WHEN mx > mn THEN mn + (b + 0.5) * ((mx - mn) / 1024.0)
             ELSE mn END AS rep
      FROM c)
SELECT event_type,
       round(min(CASE WHEN cw >= 0.25*tw THEN rep END), 6) AS wq_0_25,
       round(min(CASE WHEN cw >= 0.5*tw THEN rep END), 6) AS wq_0_5,
       round(min(CASE WHEN cw >= 0.9*tw THEN rep END), 6) AS wq_0_9
FROM r GROUP BY 1 ORDER BY 1""",
    "fill_stat": f"""{_EV}
SELECT event_id, event_type,
       round(coalesce(vnull, avg(vnull) OVER (PARTITION BY event_type)), 6) AS filled
FROM t""",
    "winsorize": f"""{_EV},
q AS (SELECT event_type,
             quantile_cont(vnull, 0.05) AS lo,
             quantile_cont(vnull, 0.95) AS hi
      FROM t GROUP BY 1)
SELECT event_id, t.event_type,
       round(CASE WHEN vnull IS NULL THEN NULL
                  ELSE least(greatest(vnull, lo), hi) END, 6) AS wz
FROM t JOIN q USING (event_type)""",
    "rank": f"""{_EV}
SELECT event_id, event_type,
       round((rank() OVER w
              + rank() OVER w + count(*) OVER peers - 1) / 2.0
             / count(value) OVER (PARTITION BY event_type), 6) AS rank
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC),
       peers AS (PARTITION BY event_type, value)""",
    # rank_two_pass (r8): the chunked rank tier must equal the plain
    # windowed rank — the oracle IS the window SQL.
    "rank_two_pass": f"""{_EV}
SELECT event_id, event_type,
       round((rank() OVER w
              + rank() OVER w + count(*) OVER peers - 1) / 2.0
             / count(value) OVER (PARTITION BY event_type), 6) AS rank
FROM t
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC),
       peers AS (PARTITION BY event_type, value)""",
    "scan_diff": f"""{_EV}
SELECT event_id, event_type,
       value - lag(value, 1) OVER (PARTITION BY event_type ORDER BY event_id) AS diff
FROM t""",
    "scan_ffill": f"""{_EV}
SELECT event_id, event_type,
       last_value(vnull IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
FROM t""",
    # scan_two_pass / scan_two_pass_ffill (r8): the chunked Blelloch path
    # must equal the plain windowed scan — the oracle IS the window SQL.
    # r12: integer-quantized input (round(vnan*100), cents) — every
    # prefix sum is an integer-valued double, exact under ANY
    # association below 2^53, so the chunked tier matches this
    # sequential window BIT-FOR-BIT at any scale (the raw-float form
    # was off the round-6 grid at sf10 — see the reassociation audit,
    # FIXTURES.md).
    "scan_two_pass": f"""{_EV}
SELECT event_id, event_type,
       coalesce(sum(CASE WHEN NOT isnan(vnan) THEN round(vnan * 100) END)
         OVER (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) / 100.0
           AS nancumsum
FROM t""",
    "scan_two_pass_ffill": f"""{_EV}
SELECT event_id, event_type,
       last_value(vnull IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill
FROM t""",
    "scan_bfill": f"""{_EV}
SELECT event_id, event_type,
       first_value(vnull IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
FROM t""",
    "rolling": f"""{_EV}
SELECT event_id, event_type,
       CASE WHEN count(CASE WHEN NOT isnan(vnan) THEN vnan END)
                 OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 2
            THEN round(avg(CASE WHEN NOT isnan(vnan) THEN vnan END)
                 OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
       END AS rolling_mean
FROM t""",
    "rolling_frac": f"""{_EV}
SELECT event_id, user_id,
       CASE WHEN count(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w >= 1
            THEN round(sum(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w, 6)
       END AS roll_sum,
       count(CASE WHEN NOT isnan(vnan) THEN vnan END) OVER w AS roll_n
FROM (SELECT *, epoch_us(ts) / 1e6 AS sec FROM t)
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 2.5 PRECEDING AND CURRENT ROW)""",
    "scan_cumprod": """
SELECT event_id, user_id,
       round(product(1.0 + value / 10000.0)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cumprod
FROM events""",
    "scan_nancumprod": """
WITH t AS (
  SELECT event_id, user_id,
         CASE WHEN value < 5 THEN 'NaN'::DOUBLE ELSE 1.0 + value / 10000.0 END AS x
  FROM events
)
SELECT event_id, user_id,
       round(coalesce(product(CASE WHEN NOT isnan(x) THEN x END)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1), 6) AS nancumprod
FROM t""",
    # ---- LLM pipeline ----
    "dedup_exact": """
SELECT source, count(*)::BIGINT AS n_docs, count(DISTINCT md5(text))::BIGINT AS n_unique
FROM documents GROUP BY source""",
    "minhash": _minhash_cte(4, 3) + "\nSELECT id, mh_0, mh_1, mh_2, mh_3 FROM sig",
    "gopher": """
WITH g AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tk
  FROM documents
),
m AS (
  SELECT doc_id,
         len(tk)::BIGINT AS g_n_words,
         CASE WHEN len(tk) > 0 THEN
           list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk) END
           AS g_mean_word_len,
         (len(list_filter(tk, x -> x = 'the')) + len(list_filter(tk, x -> x = 'a'))
          + len(list_filter(tk, x -> x = 'of')) + len(list_filter(tk, x -> x = 'and'))
          + len(list_filter(tk, x -> x = 'to')))::BIGINT AS g_stop_hits,
         CASE WHEN len(tk) > 0 THEN
           len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(tk) END
           AS g_alpha_ratio,
         CASE WHEN len(tk) > 0 THEN
           greatest(length(text) - length(replace(text, '#', '')),
                    (length(text) - length(replace(text, '...', ''))) / 3.0)::DOUBLE
             / len(tk) END AS g_symbol_ratio
  FROM g
)
SELECT doc_id, g_n_words, round(g_mean_word_len, 6) AS g_mean_word_len,
       g_stop_hits, round(g_alpha_ratio, 6) AS g_alpha_ratio,
       round(g_symbol_ratio, 6) AS g_symbol_ratio,
       coalesce(g_n_words BETWEEN 50 AND 100000
                AND g_mean_word_len BETWEEN 3.0 AND 10.0
                AND g_stop_hits >= 2
                AND g_alpha_ratio >= 0.8
                AND g_symbol_ratio <= 0.1, FALSE) AS gopher_pass
FROM m ORDER BY doc_id""",
    "mh_index_probe": _minhash_cte(4, 3)
    + _bands_cte()
    + """
SELECT b.id AS new_id, a.id AS index_id, count(*)::BIGINT AS n_shared_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
WHERE a.id < 250 AND b.id >= 250
GROUP BY 1, 2
ORDER BY 1, 2""",
    "lsh_pairs": _minhash_cte(4, 3)
    + _bands_cte()
    + """
SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_shared_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
GROUP BY 1, 2""",
    # keep_by_dedup (r8, VERDICT r7 #7): the one-call near-dedup with the
    # QUALITY keeper — the full portable-MinHash → band → pair →
    # recursive-closure chain (identical to dup_clusters), then each
    # cluster keeps its highest-quality member (quality = text length,
    # ties → smallest id); survivors = everything minus the rank>1 rows.
    "keep_by_dedup": _minhash_cte(4, 3)
    + _bands_cte(alias="kbands")
    + """,
kpairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM kbands a JOIN kbands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
kedges AS (
  SELECT id_a AS s, id_b AS d FROM kpairs
  UNION SELECT id_b, id_a FROM kpairs
),
kreach AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT s, s FROM kedges
    UNION
    SELECT e.s, r.l FROM kedges e JOIN r ON e.d = r.v
  ) SELECT v, l FROM r
),
kclusters AS (SELECT v AS id, min(l)::BIGINT AS cluster_id FROM kreach GROUP BY v),
kranked AS (
  SELECT c.id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY length(d.text) DESC NULLS LAST, c.id ASC) AS rn
  FROM kclusters c JOIN documents d ON d.doc_id = c.id
)
SELECT d.doc_id::BIGINT AS doc_id, length(d.text)::BIGINT AS quality
FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM kranked WHERE rn > 1)
ORDER BY doc_id""",
    "dup_clusters": _minhash_cte(4, 3)
    + _bands_cte()
    + """,
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  -- transitive closure by recursion: every label reachable from each vertex
  WITH RECURSIVE r(v, l) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, r.l FROM edges e JOIN r ON e.d = r.v
  ) SELECT v, l FROM r
)
SELECT v AS id, min(l)::BIGINT AS cluster_id FROM reach GROUP BY v""",
    # leak_split: the dup_clusters closure + the split oracle's md5
    # threshold, keyed on coalesce(cluster_id, doc_id) — near-dup
    # clusters are atomic across the split (curate.py leakage_safe_split)
    "leak_split": _minhash_cte(4, 3)
    + _bands_cte()
    + """,
lpairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
ledges AS (
  SELECT id_a AS s, id_b AS d FROM lpairs
  UNION SELECT id_b, id_a FROM lpairs
),
lreach AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT s, s FROM ledges
    UNION
    SELECT e.s, r.l FROM ledges e JOIN r ON e.d = r.v
  ) SELECT v, l FROM r
),
lclusters AS (SELECT v AS id, min(l)::BIGINT AS cluster_id FROM lreach GROUP BY v)
SELECT d.doc_id, c.cluster_id,
       CASE WHEN CAST('0x' || substr(md5('s1:' ||
                 CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 15)
                 AS BIGINT) < 288230376151711744
            THEN 'test' ELSE 'train' END AS split
FROM documents d LEFT JOIN lclusters c ON d.doc_id = c.id
ORDER BY d.doc_id""",
    "entropy": f"""{_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS s FROM cnt GROUP BY 1)
SELECT d.doc_id, round(coalesce(ln(a.n) - a.s / a.n, 0.0), 6) AS entropy
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""",
    "dup_spans": f"""{_TOKS},
spans AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk)-8+2, 1)),
                               i -> array_to_string(tk[i:i+7], ' '))) AS span
  FROM toks
)
SELECT span, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM spans GROUP BY span HAVING count(*) >= 2 ORDER BY span""",
    "span_dedup": f"""{_TOKS},
sp AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(tk)-8+1, 0))) AS pos,
         unnest(list_transform(range(1, greatest(len(tk)-8+2, 1)),
                               i -> array_to_string(tk[i:i+7], ' '))) AS span
  FROM toks
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY span) AS cnt
  FROM sp
),
cov AS (
  SELECT DISTINCT doc_id, tokidx FROM (
    SELECT doc_id, unnest(range(pos, pos+8)) AS tokidx
    FROM occ WHERE cnt >= 2 AND rn >= 2
  )
),
trow AS (
  SELECT doc_id, unnest(range(0, len(tk))) AS tokidx, unnest(tk) AS tok
  FROM toks
),
kept AS (
  SELECT t.doc_id, t.tokidx, t.tok FROM trow t
  ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.tokidx = c.tokidx
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tokidx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(reb.text_clean, '') AS text_clean
FROM documents d LEFT JOIN reb ON d.doc_id = reb.doc_id
ORDER BY d.doc_id""",
    # r8: mirrors the query's max_shingle_df=256 boilerplate cap — shingles
    # with document frequency > 256 are dropped BEFORE pairing, and the
    # per-doc sizes count the SURVIVING shingle space (exact Jaccard over
    # the stop-shingle-filtered sets, identical on both engines at any SF).
    "ngram_jaccard": f"""{_TOKS},
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
                               i -> array_to_string(tk[i:i+1], ' '))) AS sh
  FROM toks
),
shdf AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 256),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN shdf USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       round(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.35""",
    "simhash": f"""{_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
h AS (SELECT doc_id, CAST('0x'||substr(md5(':'||tok),1,15) AS BIGINT) AS h FROM tok),
agg AS (
  SELECT doc_id,
       {_simhash_votes}
  FROM h GROUP BY doc_id
)
SELECT doc_id AS id, ({_simhash_sig})::BIGINT AS simhash FROM agg""",
    "text_stats": f"""{_TOKS},
feat AS (
  SELECT lang,
         len(tk) AS n_tokens,
         CASE WHEN len(tk) > 0
              THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
              ELSE 0.0 END AS mean_token_len,
         CASE WHEN len(tk) > 0
              THEN ({_score("en")})::DOUBLE / len(tk)
              ELSE 0.0 END AS stopword_ratio
  FROM toks
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(avg(n_tokens), 6) AS avg_tokens,
       round(avg(mean_token_len), 6) AS avg_token_len,
       round(avg(stopword_ratio), 6) AS avg_stopword_ratio
FROM feat GROUP BY lang""",
    "langid": f"""{_TOKS},
scored AS (
  SELECT lang,
         {_score("de")} AS s_de,
         {_score("en")} AS s_en,
         {_score("es")} AS s_es,
         {_score("fr")} AS s_fr,
         {_score("zh")} AS s_zh
  FROM toks
),
pred AS (
  SELECT lang, greatest(s_de, s_en, s_es, s_fr, s_zh) AS m, *
  FROM scored
)
SELECT lang, {_langid_pred} AS lang_pred, count(*)::BIGINT AS n
FROM pred GROUP BY 1, 2""",
    "repetition": f"""{_TOKS},
big AS (
  SELECT doc_id, lang,
         CASE WHEN len(tk) > 0
              THEN 1.0 - len(list_distinct(tk))::DOUBLE / len(tk)
              ELSE 0.0 END AS dupf,
         CASE WHEN len(tk) >= 2
              THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
              ELSE [] END AS bg
  FROM toks
),
e AS (SELECT doc_id, unnest(bg) AS b FROM big),
cnt AS (SELECT doc_id, b, count(*) AS c FROM e GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS mx, sum(c) AS nb FROM cnt GROUP BY 1),
perdoc AS (
  SELECT big.doc_id, big.lang, big.dupf,
         coalesce(mx::DOUBLE / nb, 0.0) AS topf
  FROM big LEFT JOIN top ON big.doc_id = top.doc_id
)
SELECT lang, round(avg(dupf), 6) AS avg_dup,
       round(avg(topf), 6) AS avg_topbigram
FROM perdoc GROUP BY lang""",
    "bpe_tokens": """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> ''))::BIGINT
         AS ws_tokens,
       coalesce(list_sum(list_transform(
         regexp_extract_all(text,
           $$'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\sA-Za-z0-9]+$$),
         p -> greatest(1, CAST(ceil(length(trim(p)) / 4.0) AS BIGINT)))), 0)::BIGINT
         AS bpe_tokens
FROM documents
ORDER BY doc_id""",
    "lm_score": f"""{_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
vocab AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS T FROM vocab)
SELECT doc_id,
       sum(tf)::BIGINT AS n_tokens,
       round(sum(tf * ln(cnt::DOUBLE / T)) / sum(tf), 6) AS lm_logprob
FROM tf JOIN vocab USING (term) CROSS JOIN tot
GROUP BY 1
ORDER BY 1""",
    "tfidf": f"""{_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS N FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * (ln((N + 1)::DOUBLE / (df + 1)) + 1) AS tfidf
  FROM tf JOIN dfq USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM s
)
SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf, rank
FROM r WHERE rank <= 3""",
    "fingerprint": f"""{_TOKS},
fp AS (
  SELECT lang,
         md5(array_to_string(tk[1:8], ' ') || '#' ||
             CAST(CAST(floor(len(tk) / 16) AS INT) AS VARCHAR)) AS fingerprint
  FROM toks
)
SELECT lang, count(*)::BIGINT AS n_docs,
       count(DISTINCT fingerprint)::BIGINT AS n_fingerprints
FROM fp GROUP BY lang""",
    "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv::DOUBLE[], cv::DOUBLE[]) /
         (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) *
          sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[]))) AS cosine
  FROM c, q WHERE query_id <> neighbor_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cosine, 4) AS cosine
FROM r WHERE rank <= 3""",
    "ann_lsh": f"""
WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                  {_lsh_bucket_sql('embedding', n_planes=6)} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv,
             {_lsh_bucket_sql('embedding', n_planes=6)} AS bucket
      FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT query_id, neighbor_id, {_COS_SQL} AS cosine
  FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cosine, 4) AS cosine
FROM r WHERE rank <= 3""",
    "ann_ivf": f"""
WITH cents AS (SELECT vec_id AS cell, embedding AS cv
               FROM embeddings ORDER BY vec_id LIMIT 8),
ca AS (SELECT vec_id, cell,
              list_dot_product(embedding::DOUBLE[], cv::DOUBLE[]) /
              (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
               sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[]))) AS cos
       FROM embeddings, cents),
corp AS (SELECT vec_id AS neighbor_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
  FROM ca) WHERE rn = 1),
qa AS (SELECT vec_id AS query_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
  FROM ca WHERE vec_id < 10) WHERE rn <= 2),
s AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(qe.embedding::DOUBLE[], qe.embedding::DOUBLE[])) *
          sqrt(list_dot_product(ne.embedding::DOUBLE[], ne.embedding::DOUBLE[]))) AS cosine
  FROM qa JOIN corp USING (cell)
  JOIN embeddings qe ON qe.vec_id = query_id
  JOIN embeddings ne ON ne.vec_id = neighbor_id
  WHERE query_id <> neighbor_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cosine, 4) AS cosine
FROM r WHERE rank <= 3""",
    "centroids": """
SELECT vec_id % 8 AS g, t.d - 1 AS d,
       round(avg(embedding[t.d]::DOUBLE), 6) AS comp
FROM embeddings, generate_series(1, 64) AS t(d)
GROUP BY 1, 2""",
    "emb_neardup": f"""
WITH b AS (SELECT vec_id AS id, embedding AS v,
                  {_lsh_bucket_sql('embedding', n_planes=4)} AS bucket
           FROM embeddings),
pairs AS (
  SELECT a.id AS id_a, b2.id AS id_b,
         list_dot_product(a.v::DOUBLE[], b2.v::DOUBLE[]) /
         (sqrt(list_dot_product(a.v::DOUBLE[], a.v::DOUBLE[])) *
          sqrt(list_dot_product(b2.v::DOUBLE[], b2.v::DOUBLE[]))) AS cosine
  FROM b a JOIN b b2 USING (bucket) WHERE a.id < b2.id
)
SELECT id_a, id_b, round(cosine, 4) AS cosine
FROM pairs WHERE cosine >= 0.25""",
    "asof_join": """
SELECT l.event_id, l.user_id, r.value AS value_right, r.ts AS ts_right
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "curate": """
WITH feats AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '')) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
                   / length(text)
              ELSE 0.0 END AS punct_ratio
  FROM documents
), gated AS (
  SELECT * FROM feats WHERE n_tokens >= 5 AND punct_ratio <= 0.2
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
    FROM gated) WHERE rn = 1
), sampled AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lang
      ORDER BY CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC,
               doc_id ASC) AS srn
    FROM deduped) WHERE srn <= 10
)
SELECT lang, doc_id, n_tokens::BIGINT AS n_tokens FROM sampled""",
    "wmean": f"""{_LI}
SELECT {_K},
       round(sum(CASE WHEN NOT isnan(v) THEN v * l_extendedprice END)
             / sum(CASE WHEN NOT isnan(v) THEN v END), 6) AS wmean
FROM t GROUP BY {_K}""",
    "top_terms": f"""{_TOKS},
tf AS (
  SELECT lang, term, count(*)::BIGINT AS n
  FROM (SELECT lang, unnest(tk) AS term FROM toks)
  WHERE length(term) >= 1
  GROUP BY lang, term
), r AS (
  SELECT lang, term, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, term ASC) AS rank
  FROM tf
)
SELECT lang, term, n, rank::BIGINT AS rank FROM r WHERE rank <= 3""",
    "range_join": """
WITH r AS (
  SELECT event_type, ts - INTERVAL 1 HOUR AS s, ts + INTERVAL 1 HOUR AS e,
         event_id AS win_id
  FROM events WHERE value > 99
), l AS (
  SELECT event_type, event_id, ts FROM events WHERE value < 2
)
SELECT l.event_type, l.event_id, r.win_id
FROM l JOIN r USING (event_type)
WHERE l.ts BETWEEN r.s AND r.e""",
    "group_topk": """
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events
)
SELECT event_type, event_id, rank::BIGINT AS rank, round(value, 6) AS value
FROM r WHERE rank <= 3""",
    "sessionize": """
WITH s AS (
  SELECT user_id, ts, epoch(ts) AS tse,
         lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC) AS prev
  FROM events
), b AS (
  SELECT user_id, ts,
         CASE WHEN prev IS NULL OR tse - prev > 21600.0 THEN 1 ELSE 0 END AS nb
  FROM s
), sess AS (
  SELECT user_id,
         sum(nb) OVER (PARTITION BY user_id ORDER BY ts ASC
                       ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM b
)
SELECT user_id, (max(session_id) + 1)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id""",
    "split": """
SELECT doc_id,
       CASE WHEN CAST('0x' || substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 15)
                       AS BIGINT) < 288230376151711744
            THEN 'test' ELSE 'train' END AS split
FROM documents""",
    "chunk_docs": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tk
  FROM documents
),
c AS (
  -- last chunk index = max(0, ceil((n - max_tokens)/stride)): the first
  -- window reaching the end is the last emitted (no trailing-subset chunks)
  SELECT doc_id, tk, len(tk) AS n,
         unnest(generate_series(
           0,
           greatest(0, CAST(ceil((len(tk) - 32) / 16.0) AS BIGINT))
         )) AS chunk_id
  FROM toks WHERE len(tk) > 0
)
SELECT doc_id, chunk_id,
       array_to_string(tk[chunk_id*16+1 : chunk_id*16+32], ' ') AS chunk_text,
       len(tk[chunk_id*16+1 : chunk_id*16+32])::INT AS n_tokens
FROM c""",
    "mixture": """
WITH r AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
              WHEN 'src2' THEN 0.0 ELSE 1.0 END AS rate,
         CAST('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h
  FROM documents
),
n AS (SELECT doc_id, source,
             CAST(floor(rate) AS BIGINT)
             + CASE WHEN h < (rate - floor(rate)) * 1152921504606846976.0
                    THEN 1 ELSE 0 END AS n_copies
      FROM r)
SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy_id
FROM n WHERE n_copies >= 1""",
    "pack": """
WITH RECURSIVE base AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
walk AS (
  SELECT source, doc_id, rn, n_chars, 0::BIGINT AS bin_id, n_chars AS acc
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.source, b.doc_id, b.rn, b.n_chars,
         CASE WHEN w.acc > 0 AND w.acc + b.n_chars > 2000
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.acc > 0 AND w.acc + b.n_chars > 2000
              THEN b.n_chars ELSE w.acc + b.n_chars END
  FROM walk w JOIN base b ON b.source = w.source AND b.rn = w.rn + 1
)
SELECT doc_id, source, bin_id FROM walk""",
    "bloom_decontam": f"""{_TOKS},
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk)-7, 0)+1),
                               i -> array_to_string(tk[i:i+7], ' '))) AS sh
  FROM toks
),
bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
hits AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bsh USING (sh) WHERE s.doc_id >= 20)
SELECT d.lang, count(*)::BIGINT AS n_kept
FROM documents d
WHERE d.doc_id >= 20 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
GROUP BY 1""",
    "decontaminate": f"""{_TOKS},
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk)-7, 0)+1),
                               i -> array_to_string(tk[i:i+7], ' '))) AS sh
  FROM toks
),
bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
hits AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bsh USING (sh) WHERE s.doc_id >= 20)
SELECT d.lang, count(*)::BIGINT AS n_kept
FROM documents d
WHERE d.doc_id >= 20 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
GROUP BY 1""",
    "sample_per_group": """
WITH h AS (
  SELECT lang, doc_id,
         CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hv
  FROM documents
), r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS rn
  FROM h
)
SELECT lang, doc_id FROM r WHERE rn <= 5""",
    # multimodal_meta (round 2: upgraded from rows-only): the Spark side
    # carries payload byte length + declared metadata through an Arrow
    # mapInPandas batch; every aggregated input is a deterministic function
    # of documents.text, so DuckDB recomputes it exactly.  meta_width/height
    # use CHARACTER length (Spark F.length), n_bytes uses the utf-8 BYTE
    # length of the payload.
    "multimodal_meta": """
SELECT 'fake' AS meta_format,
       count(*)::BIGINT AS n,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       round(avg(length(text) % 1024 + 1), 6) AS avg_w,
       (max(length(text) % 768 + 1))::INT AS max_h
FROM documents""",
}


# ---------------------------------------------------------------------------
# late-r5 keys: built programmatically (hash arithmetic repeats per depth /
# per pattern), appended to ORACLE_SQL after the literal dict.


def _ph60(expr: str, seed: str) -> str:
    """portable 60-bit hash — must match operators/dedup.py portable_hash."""
    return f"CAST('0x'||substr(md5('{seed}:'||{expr}),1,15) AS BIGINT)"


ORACLE_SQL["salted_join"] = """
SELECT o_orderpriority,
       count(*)::BIGINT AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority"""

# must match __spark_entry__._CMS_TERMS and the q_cms_heavy width/depth
_CMS_TERMS = ["hash", "spark", "table", "the", "value", "window", "zzzmissing"]
_CMS_W, _CMS_D = 256, 4

_CMS_BUCKETS = "\nUNION ALL\n".join(
    f"SELECT {d} AS d, {_ph60('term', f'cms{d}')} % {_CMS_W} AS bucket, "
    "count(*)::BIGINT AS cnt FROM tk2 GROUP BY 2"
    for d in range(_CMS_D)
)
_CMS_QB = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS term, {d} AS d, "
    f"{_ph60(repr(t), f'cms{d}')} % {_CMS_W} AS bucket"
    for t in _CMS_TERMS
    for d in range(_CMS_D)
)

ORACLE_SQL["cms_heavy"] = f"""{_TOKS},
tk2 AS (SELECT unnest(tk) AS term FROM toks),
buckets AS (
{_CMS_BUCKETS}
),
qb AS (
{_CMS_QB}
),
per_depth AS (
  SELECT q.term, q.d, coalesce(sum(b.cnt), 0)::BIGINT AS c
  FROM qb q LEFT JOIN buckets b ON q.d = b.d AND q.bucket = b.bucket
  GROUP BY q.term, q.d
)
SELECT term, min(c)::BIGINT AS est_count
FROM per_depth GROUP BY term ORDER BY term"""

_VOCAB_CTE = """
tk2 AS (SELECT unnest(tk) AS term FROM toks),
c AS (SELECT term, count(*)::BIGINT AS cnt FROM tk2 GROUP BY term),
vocab AS (
  SELECT term, cnt,
         (row_number() OVER (ORDER BY cnt DESC, term ASC) - 1)::BIGINT AS term_id
  FROM c
)"""

ORACLE_SQL["vocab"] = f"""{_TOKS},{_VOCAB_CTE}
SELECT term, cnt, term_id FROM vocab WHERE term_id < 25 ORDER BY term_id"""

ORACLE_SQL["encode_ids"] = f"""{_TOKS},{_VOCAB_CTE},
flat AS (
  SELECT doc_id,
         unnest(range(0, len(tk))) AS pos,
         unnest(tk) AS term
  FROM toks
)
SELECT f.doc_id, f.pos::BIGINT AS pos,
       coalesce(CASE WHEN v.term_id < 16 THEN v.term_id END, -1)::BIGINT
         AS token_id
FROM flat f LEFT JOIN vocab v USING (term)
ORDER BY doc_id, pos"""

# hash-classifier pseudo-weight: w(t) = ((H('cw:'||(H('cb:'||t) % 64)) % 2001)
# - 1000)/1000 — must match text.hash_classifier_score(dim=64, weights=None)
_CLF_W = (
    f"(({_ph60('(' + _ph60('t', 'cb') + ' % 64)', 'cw')} % 2001) - 1000) / 1000.0"
)

ORACLE_SQL["clf_score"] = f"""{_TOKS}
SELECT doc_id, len(tk)::INT AS n_tokens,
       round(1.0 / (1.0 + exp(-(list_sum(list_transform(tk, t -> {_CLF_W}))
                                / len(tk)))), 6) AS clf_score
FROM toks WHERE len(tk) > 0 ORDER BY doc_id"""

# regexes must match operators/curate.py PII_PATTERNS (RE2 ∩ Java subset);
# replacement chain order = dict order (email, ipv4, phone)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_PHONE = r"\+?\d[\d\- ]{7,}\d"

ORACLE_SQL["pii_redact"] = f"""
WITH s AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
              || '.com from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
           AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))::INT AS email_n,
       len(regexp_extract_all(text, '{_PII_IPV4}'))::INT AS ipv4_n,
       len(regexp_extract_all(text, '{_PII_PHONE}'))::INT AS phone_n,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{_PII_EMAIL}', '<EMAIL>', 'g'),
         '{_PII_IPV4}', '<IPV4>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g') AS text
FROM s ORDER BY doc_id"""

# stream_cms: the merged streaming sketch equals the one-shot batch sketch
# (counters are linear), so the oracle is the identical CM arithmetic
ORACLE_SQL["stream_cms"] = ORACLE_SQL["cms_heavy"]

# hist_quantile: declared-domain [0,500) x 100 bins over events.value,
# cumulative-histogram inverted CDF, bin-midpoint estimate — must match
# sketches.hist_sketch_table / hist_quantile arithmetic exactly
_HIST_MID = "(0.0 + (bin + 0.5) * 5.0)"
ORACLE_SQL["hist_quantile"] = f"""
WITH h AS (
  SELECT event_type,
         greatest(0, least(99, CAST(floor(value / 5.0) AS INT)))::INT AS bin,
         count(*)::BIGINT AS cnt
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS tot
  FROM h
)
SELECT event_type,
       round(min(CASE WHEN cum >= 0.5  * tot THEN {_HIST_MID} END), 6) AS p0_5,
       round(min(CASE WHEN cum >= 0.9  * tot THEN {_HIST_MID} END), 6) AS p0_9,
       round(min(CASE WHEN cum >= 0.99 * tot THEN {_HIST_MID} END), 6) AS p0_99
FROM c GROUP BY event_type ORDER BY event_type"""

# seg_dedup: split on newline, keep each segment's FIRST occurrence
# (DuckDB list lambdas index 1-based; Spark's filter() indexes 0-based,
# hence `= i` here vs `== i + 1` in operators/text.py)
ORACLE_SQL["seg_dedup"] = """
WITH s AS (
  SELECT doc_id,
         text || chr(10) || substr(text, 1, 40)
              || chr(10) || substr(text, 1, 40) AS text
  FROM documents
),
seg AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM s),
k AS (
  SELECT doc_id, l,
         list_filter(l, (x, i) -> len(x) < 1 OR list_position(l, x) = i) AS kept
  FROM seg
)
SELECT doc_id, len(l)::INT AS seg_n_before, len(kept)::INT AS seg_n_after,
       array_to_string(kept, chr(10)) AS text
FROM k ORDER BY doc_id"""

# quantize: per-vector symmetric int8 codes, explicit floor(+0.5) rounding
# — must match similarity.quantize_embeddings arithmetic exactly
ORACLE_SQL["quantize"] = """
WITH s AS (
  SELECT vec_id, embedding,
         CASE WHEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) > 0
              THEN list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
              ELSE 1.0 END AS scale
  FROM embeddings
)
SELECT vec_id,
       unnest(range(0, len(embedding)))::BIGINT AS i,
       unnest(list_transform(embedding, x ->
         greatest(-127, least(127, floor(x::DOUBLE / scale + 0.5)))))::INT AS qv,
       round(scale, 6) AS q_scale
FROM s ORDER BY vec_id, i"""

# skew_stats: top-10 keys by count with total/cumulative fractions —
# must match selection.key_skew_stats ordering (count DESC, key ASC)
ORACLE_SQL["skew_stats"] = """
WITH c AS (
  SELECT l_suppkey, count(*)::BIGINT AS n FROM lineitem GROUP BY 1
),
t AS (SELECT sum(n) AS tot FROM c),
r AS (
  SELECT l_suppkey, n,
         row_number() OVER (ORDER BY n DESC, l_suppkey ASC) AS rn,
         sum(n) OVER (ORDER BY n DESC, l_suppkey ASC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
)
SELECT l_suppkey, n,
       round((n / tot)::DOUBLE, 9) AS frac,
       round((cum / tot)::DOUBLE, 9) AS cum_frac
FROM r, t WHERE rn <= 10 ORDER BY l_suppkey"""

# ngram_counts: corpus bigram counts, min_count=2 cutoff — mirrors
# text.ngram_counts (map-side slice windows) via the shingle convention
ORACLE_SQL["ngram_counts"] = f"""{_TOKS},
sh AS (
  SELECT unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
                               i -> array_to_string(tk[i:i+1], ' '))) AS ngram
  FROM toks
)
SELECT ngram, count(*)::BIGINT AS cnt
FROM sh GROUP BY ngram HAVING count(*) >= 2 ORDER BY ngram"""

# profile: per-column nonnull/distinct/min/max in long form — must match
# operators/profile.py table_profile (exact distincts, string-cast min/max)
_PROFILE_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_returnflag", "l_linestatus",
]
ORACLE_SQL["profile"] = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS \"column\", count({c})::BIGINT AS n_nonnull, "
    f"count(DISTINCT {c})::BIGINT AS n_distinct, "
    f"min({c})::VARCHAR AS min, max({c})::VARCHAR AS max FROM lineitem"
    for c in _PROFILE_COLS
) + "\nORDER BY \"column\""

# bivar / spearman: pairwise-complete (x=NaN-contaminated quantity via _LI's
# t.v nulled, y=extendedprice) — must match operators/stats.py semantics:
# NaN => NULL, pairwise deletion, NULL for degenerate groups.
_BIVAR_PAIRS = f"""{_LI}
, bp AS (
  SELECT l_returnflag,
         CASE WHEN isnan(v) THEN NULL ELSE v END AS x,
         l_extendedprice AS y
  FROM t
)"""

ORACLE_SQL["bivar"] = f"""{_BIVAR_PAIRS}
SELECT l_returnflag,
       count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)::BIGINT AS n,
       round(corr(x, y), 6)                 AS corr,
       round(covar_samp(x, y), 2)           AS covar_samp,
       round(covar_pop(x, y), 2)            AS covar_pop,
       round(regr_slope(y, x), 4)           AS slope,
       round(regr_intercept(y, x), 2)       AS intercept,
       round(regr_r2(y, x), 8)              AS r2
FROM bp GROUP BY l_returnflag"""

# average (fractional) ranks: rank() gives the min rank of a tie run;
# avg = min + (|ties|-1)/2 — identical to stats.py grouped_spearman.
ORACLE_SQL["spearman"] = f"""{_BIVAR_PAIRS}
, cp AS (SELECT l_returnflag, x, y FROM bp
         WHERE x IS NOT NULL AND y IS NOT NULL),
rk AS (
  SELECT l_returnflag,
         rank() OVER (PARTITION BY l_returnflag ORDER BY x)
           + (count(*) OVER (PARTITION BY l_returnflag, x) - 1) / 2.0 AS xr,
         rank() OVER (PARTITION BY l_returnflag ORDER BY y)
           + (count(*) OVER (PARTITION BY l_returnflag, y) - 1) / 2.0 AS yr
  FROM cp
)
SELECT l_returnflag, count(*)::BIGINT AS n,
       round(corr(xr, yr), 6) AS spearman
FROM rk GROUP BY l_returnflag"""

# psi: first vs second half of the events month, fixed interior breaks
# [10,20,35,60,100]; bin = sum of (x >= break) indicators, eps=1e-6
# smoothing — mirrors operators/stats.py population_stability.
_PSI_BIN = ("CAST((x >= 10.0)::INT + (x >= 20.0)::INT + (x >= 35.0)::INT"
            " + (x >= 60.0)::INT + (x >= 100.0)::INT AS INTEGER)")
ORACLE_SQL["psi"] = f"""
WITH e AS (
  SELECT date_part('day', ts) AS d, value AS x FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
rb AS (SELECT {_PSI_BIN} AS bin, count(*) AS cnt FROM e WHERE d <= 15 GROUP BY 1),
cb AS (SELECT {_PSI_BIN} AS bin, count(*) AS cnt FROM e WHERE d > 15 GROUP BY 1),
rf AS (SELECT bin, cnt / (SELECT sum(cnt) FROM rb) AS ref_frac FROM rb),
cf AS (SELECT bin, cnt / (SELECT sum(cnt) FROM cb) AS cur_frac FROM cb),
j AS (
  SELECT COALESCE(rf.bin, cf.bin) AS bin,
         COALESCE(ref_frac, 0.0) AS ref_frac,
         COALESCE(cur_frac, 0.0) AS cur_frac
  FROM rf FULL JOIN cf ON rf.bin = cf.bin
)
SELECT bin,
       round(ref_frac, 6) AS ref_frac,
       round(cur_frac, 6) AS cur_frac,
       round((greatest(ref_frac, 1e-6) - greatest(cur_frac, 1e-6))
             * ln(greatest(ref_frac, 1e-6) / greatest(cur_frac, 1e-6)), 6) AS psi_term
FROM j"""

# para_dedup: cross-document paragraph dedup + reconstruction — must match
# operators/dedup.py dedup_paragraphs: keep iff the segment is empty
# (length < max(min_len,1) with the default min_len=0 — consecutive
# separators / blank-line structure are NEVER deduped) OR it is the
# globally first occurrence under (doc_id, pos); survivors rejoin in
# original order.  The keep rule mirrors dedup.py:917-924 exactly:
# short-ness is a property of the segment VALUE, so numbering short rows
# inside the window (as the engine does) cannot change which non-short
# row ranks first.
ORACLE_SQL["para_dedup"] = """
WITH d2 AS (
  SELECT doc_id,
         'NAVBAR HOME ABOUT CONTACT' || chr(10) || text || chr(10)
           || substr(text, 1, 40) AS text
  FROM documents
),
sp AS (
  -- coalesce mirrors dedup_paragraphs: a NULL text is the empty document
  -- (one empty segment), not a vanished row
  SELECT doc_id, i AS pos, l[i] AS seg
  FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS l FROM d2),
       unnest(range(1, len(l)+1)) AS t(i)
),
fl AS (
  SELECT doc_id, pos, seg,
         (length(seg) < 1) OR
         (row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1)
           AS keep
  FROM sp
)
SELECT doc_id, count(*)::BIGINT AS seg_n_before,
       count(CASE WHEN keep THEN 1 END)::BIGINT AS seg_n_after,
       md5(coalesce(string_agg(CASE WHEN keep THEN seg END,
                               chr(10) ORDER BY pos), '')) AS text_md5
FROM fl GROUP BY doc_id"""

# bloom_join: Bloom prefilter + exact semi join == plain semi join; sums in
# exact integer cents so both engines agree bit-for-bit.
ORACLE_SQL["bloom_join"] = """
SELECT l_returnflag, count(*)::BIGINT AS n_rows,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
GROUP BY l_returnflag"""

# zorder: mirror plans.py zorder_key bit-for-bit — same scaling constants
# (min/max are exact, no summation), same IEEE op order, same interleave.
def _zorder_sql(cols, bits):
    n = len(cols)
    m = float((1 << bits) - 1)
    scaled = [
        f"CAST(coalesce(floor(({c}::DOUBLE - mn{i}) / nullif(mx{i} - mn{i}, 0.0)"
        f" * {m}), 0) AS BIGINT)"
        for i, c in enumerate(cols)
    ]
    terms = []
    for j in range(bits):
        for i in range(n):
            terms.append(f"((({scaled[i]} >> {j}) & 1) << {j * n + i})")
    stats = ", ".join(
        f"min({c}::DOUBLE) AS mn{i}, max({c}::DOUBLE) AS mx{i}"
        for i, c in enumerate(cols)
    )
    return f"""
WITH s AS (SELECT {stats} FROM lineitem),
z AS (SELECT ({' | '.join(terms)}) AS zkey FROM lineitem, s)
SELECT zkey >> 8 AS cell, count(*)::BIGINT AS n, sum(zkey)::BIGINT AS zsum
FROM z GROUP BY 1"""


ORACLE_SQL["zorder"] = _zorder_sql(["l_quantity", "l_tax"], 8)

# ttest: Welch two-sample t per event_type between the two month halves —
# mirrors operators/stats.py grouped_ttest (var_samp sufficient stats;
# NULL/NaN excluded; try_divide semantics via nullif).
ORACLE_SQL["ttest"] = """
WITH e AS (
  SELECT event_type, date_part('day', ts) AS d, value AS x FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
a AS (SELECT event_type, count(x)::BIGINT AS n_ref, avg(x) AS mean_ref,
             var_samp(x) AS var_ref FROM e WHERE d <= 15 GROUP BY 1),
b AS (SELECT event_type, count(x)::BIGINT AS n_cur, avg(x) AS mean_cur,
             var_samp(x) AS var_cur FROM e WHERE d > 15 GROUP BY 1),
j AS (
  SELECT a.event_type, n_ref, n_cur, mean_ref, mean_cur,
         var_ref / n_ref AS s1, var_cur / n_cur AS s2
  FROM a JOIN b ON a.event_type = b.event_type
)
SELECT event_type, n_ref, n_cur,
       round(mean_ref, 6) AS mean_ref,
       round(mean_cur, 6) AS mean_cur,
       round((mean_ref - mean_cur) / nullif(sqrt(s1 + s2), 0.0), 6) AS t_stat,
       round((s1 + s2) * (s1 + s2)
             / nullif(s1 * s1 / (n_ref - 1) + s2 * s2 / (n_cur - 1), 0.0), 4) AS df
FROM j"""

# validate: row-level rule violations — NULL predicate counts as a
# violation, mirroring operators/validate.py check_rules.
_VRULES = {
    "qty_positive": "l_quantity > 0",
    "price_nonneg": "l_extendedprice >= 0",
    "flag_enum": "l_returnflag IN ('A','N','R')",
    "discount_range": "l_discount >= 0 AND l_discount <= 0.1",
}
ORACLE_SQL["validate"] = "\nUNION ALL\n".join(
    f"SELECT '{n}' AS rule, count(*)::BIGINT AS n_rows, "
    f"(count(*) - sum(CASE WHEN coalesce({p}, FALSE) THEN 1 ELSE 0 END))::BIGINT"
    f" AS n_violations, "
    f"round((count(*) - sum(CASE WHEN coalesce({p}, FALSE) THEN 1 ELSE 0 END))"
    f" / count(*), 6) AS violation_frac FROM lineitem"
    for n, p in _VRULES.items()
)

# chisq: 2xC homogeneity per cohort — mirrors operators/stats.py
# grouped_chisq (expected = n_side * tot_cat / N; one-sided groups NULL).
ORACLE_SQL["chisq"] = """
WITH e AS (
  SELECT CAST(user_id % 5 AS BIGINT) AS cohort, event_type AS c,
         CASE WHEN date_part('day', ts) <= 15 THEN 0 ELSE 1 END AS s
  FROM events WHERE event_type IS NOT NULL
),
cell AS (
  SELECT cohort, c,
         sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::BIGINT AS o_ref,
         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS o_cur
  FROM e GROUP BY cohort, c
),
tot AS (
  SELECT *, sum(o_ref) OVER (PARTITION BY cohort) AS n_ref,
            sum(o_cur) OVER (PARTITION BY cohort) AS n_cur
  FROM cell
),
term AS (
  SELECT cohort, n_ref, n_cur,
         (o_ref - n_ref::DOUBLE * (o_ref + o_cur) / (n_ref + n_cur))
           * (o_ref - n_ref::DOUBLE * (o_ref + o_cur) / (n_ref + n_cur))
           / nullif(n_ref::DOUBLE * (o_ref + o_cur) / (n_ref + n_cur), 0.0)
         + (o_cur - n_cur::DOUBLE * (o_ref + o_cur) / (n_ref + n_cur))
           * (o_cur - n_cur::DOUBLE * (o_ref + o_cur) / (n_ref + n_cur))
           / nullif(n_cur::DOUBLE * (o_ref + o_cur) / (n_ref + n_cur), 0.0) AS t
  FROM tot
)
SELECT cohort, first(n_ref)::BIGINT AS n_ref, first(n_cur)::BIGINT AS n_cur,
       count(*)::BIGINT AS n_cats, round(sum(t), 6) AS chisq,
       (count(*) - 1)::BIGINT AS dof
FROM term GROUP BY cohort"""

# ks: two-sample KS per event_type — RANGE-frame cumulative counts make the
# CDF step land after each tie run, mirroring operators/stats.py grouped_ks.
ORACLE_SQL["ks"] = """
WITH u AS (
  SELECT event_type, value AS v,
         CASE WHEN date_part('day', ts) <= 15 THEN 0 ELSE 1 END AS s
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
st AS (
  SELECT event_type,
         sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2,
         sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type) AS n1,
         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type) AS n2
  FROM u
)
SELECT event_type, first(n1)::BIGINT AS n_ref, first(n2)::BIGINT AS n_cur,
       round(max(abs(c1 / nullif(n1, 0) - c2 / nullif(n2, 0))), 6) AS ks_stat
FROM st GROUP BY event_type"""

# mad: DuckDB's built-in mad() == median(|x - median|), matching
# operators/stats.py grouped_mad's two exact-percentile passes.
ORACLE_SQL["mad"] = """
SELECT l_returnflag, count(l_extendedprice)::BIGINT AS n,
       round(median(l_extendedprice), 6) AS median,
       round(mad(l_extendedprice), 6) AS mad
FROM lineitem GROUP BY l_returnflag"""

# overlap_join: interval-overlap pairs per user — DuckDB evaluates the plain
# overlap predicate; the Spark side's grid decomposition must produce the
# identical pair set exactly once each.
ORACLE_SQL["overlap_join"] = """
WITH c AS (
  SELECT user_id, event_id AS lid, ts AS s, ts + INTERVAL 30 MINUTE AS e
  FROM events WHERE event_type = 'click'
),
v AS (
  SELECT user_id, event_id AS rid, ts AS s, ts + INTERVAL 45 MINUTE AS e
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT c.user_id, lid, rid
  FROM c JOIN v ON c.user_id = v.user_id AND c.s <= v.e AND v.s <= c.e
)
SELECT user_id, count(*)::BIGINT AS n_pairs,
       sum(lid + rid)::BIGINT AS pair_sum
FROM p GROUP BY user_id"""

# psi_hist: PSI via fixed-domain histogram counters (domain [0,200), 8 bins,
# clamp into edge bins) — mirrors hist_sketch_table + psi_from_histograms.
ORACLE_SQL["psi_hist"] = """
WITH e AS (
  SELECT date_part('day', ts) AS d,
         CAST(greatest(0, least(7, floor((value - 0.0) / 25.0))) AS INTEGER) AS bin
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
rb AS (SELECT bin, count(*) AS cnt FROM e WHERE d <= 15 GROUP BY 1),
cb AS (SELECT bin, count(*) AS cnt FROM e WHERE d > 15 GROUP BY 1),
rf AS (SELECT bin, cnt / (SELECT sum(cnt) FROM rb) AS ref_frac FROM rb),
cf AS (SELECT bin, cnt / (SELECT sum(cnt) FROM cb) AS cur_frac FROM cb),
j AS (
  SELECT COALESCE(rf.bin, cf.bin) AS bin,
         COALESCE(ref_frac, 0.0) AS ref_frac,
         COALESCE(cur_frac, 0.0) AS cur_frac
  FROM rf FULL JOIN cf ON rf.bin = cf.bin
)
SELECT bin,
       round(ref_frac, 6) AS ref_frac,
       round(cur_frac, 6) AS cur_frac,
       round((greatest(ref_frac, 1e-6) - greatest(cur_frac, 1e-6))
             * ln(greatest(ref_frac, 1e-6) / greatest(cur_frac, 1e-6)), 6) AS psi_term
FROM j"""

# auc: Mann-Whitney rank-sum AUC per linestatus — average-tie ranks,
# mirroring operators/stats.py grouped_auc.
ORACLE_SQL["auc"] = """
WITH p AS (
  SELECT l_linestatus,
         CASE WHEN l_returnflag = 'A' THEN TRUE ELSE FALSE END AS y,
         l_extendedprice AS s
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
),
rk AS (
  SELECT l_linestatus, y,
         rank() OVER (PARTITION BY l_linestatus ORDER BY s)
           + (count(*) OVER (PARTITION BY l_linestatus, s) - 1) / 2.0 AS r
  FROM p
),
a AS (
  SELECT l_linestatus,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n_neg,
         sum(CASE WHEN y THEN r END) AS rpos
  FROM rk GROUP BY l_linestatus
)
SELECT l_linestatus, n_pos, n_neg,
       round((rpos - n_pos::DOUBLE * (n_pos + 1) / 2.0)
             / nullif(n_pos::DOUBLE * n_neg, 0.0), 6) AS auc
FROM a"""

# calibration: uniform declared-domain score bins with edge clamping —
# mirrors operators/stats.py calibration_bins (avg of ordered doubles
# rounded 6; mean_score noise ~1e-14 against the 1e-6 grid).
ORACLE_SQL["calibration"] = """
WITH p AS (
  SELECT event_type,
         value / 200.0 AS score,
         CASE WHEN value > 40 THEN 1.0 ELSE 0.0 END AS y
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
b AS (
  SELECT event_type, y, score,
         CAST(greatest(0, least(7, floor((score - 0.0) / 0.125))) AS INTEGER) AS bin
  FROM p
)
SELECT event_type, bin, count(*)::BIGINT AS n,
       round(avg(score), 6) AS mean_score,
       round(avg(y), 6) AS pos_rate
FROM b GROUP BY event_type, bin"""

# table_diff: snapshot diff summary — same synthetic edits in SQL, null-safe
# comparison via IS NOT DISTINCT FROM, mirrors operators/validate.py.
ORACLE_SQL["table_diff"] = """
WITH o AS (SELECT event_id AS k, event_type, value FROM events),
n AS (
  SELECT event_id AS k, event_type,
         CASE WHEN event_id % 7 = 0 THEN value + 1 ELSE value END AS value
  FROM events WHERE event_id % 10 <> 0
  UNION ALL
  SELECT event_id + 10000000 AS k, event_type, value
  FROM events WHERE date_part('day', ts) <= 2
),
st AS (
  SELECT CASE WHEN o.k IS NULL THEN 'added'
              WHEN n.k IS NULL THEN 'removed'
              WHEN o.event_type IS NOT DISTINCT FROM n.event_type
                   AND o.value IS NOT DISTINCT FROM n.value THEN 'unchanged'
              ELSE 'changed' END AS s
  FROM o FULL JOIN n ON o.k = n.k
)
SELECT sum(CASE WHEN s = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
       sum(CASE WHEN s = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       sum(CASE WHEN s = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       sum(CASE WHEN s = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
FROM st"""

# qnorm: pooled-quantile normalization — grid = quantile_cont over the whole
# table (== Spark's exact percentile, linear interpolation), percent_rank per
# group, identical interpolation arithmetic, explicit floor(+0.5) cents.
ORACLE_SQL["qnorm"] = """
WITH g AS (
  SELECT quantile_cont(l_extendedprice,
                       list_transform(range(0, 1001), i -> i / 1000.0)) AS grid
  FROM lineitem
),
r AS (
  SELECT l_returnflag,
         percent_rank() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) * 1000 AS pos
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
v AS (
  SELECT l_returnflag,
         grid[least(CAST(floor(pos) AS INTEGER), 999) + 1]
           * (1 - (pos - least(CAST(floor(pos) AS INTEGER), 999)))
         + grid[least(CAST(floor(pos) AS INTEGER), 999) + 2]
           * (pos - least(CAST(floor(pos) AS INTEGER), 999)) AS q
  FROM r, g
)
SELECT l_returnflag, count(*)::BIGINT AS n,
       sum(CAST(floor(q * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents
FROM v GROUP BY l_returnflag"""

# outliers: modified z-score robust flags per event_type — DuckDB's
# median/mad mirror operators/stats.py flag_outliers (k=2).
# NaN values become NULL (Spark's flag is NULL there, excluded from the
# sum), the join back is null-safe and LEFT (NULL-keyed or all-missing
# groups keep their n_rows row), mirroring flag_outliers exactly.
ORACLE_SQL["outliers"] = """
WITH e2 AS (
  SELECT event_type,
         CASE WHEN value IS NULL OR isnan(value) THEN NULL ELSE value END AS v
  FROM events
),
s AS (
  SELECT event_type, median(v) AS med, mad(v) AS m
  FROM e2 WHERE v IS NOT NULL GROUP BY event_type
)
SELECT e2.event_type, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN v IS NULL THEN NULL
                WHEN m = 0 THEN (v <> med)::INT
                ELSE (abs(0.6745 * (v - med) / m) > 2.0)::INT
           END)::BIGINT AS n_flagged
FROM e2 LEFT JOIN s ON e2.event_type IS NOT DISTINCT FROM s.event_type
GROUP BY e2.event_type"""

# pagerank (r6: upgraded from rows-only to value-checked — VERDICT r5
# item #4): the 5-iteration damped power iteration of
# operators/graph.py pagerank, unrolled as 5 chained CTEs.  Mirrors the
# engine exactly: NULL endpoints dropped, duplicate edges weight the
# transition, out-degree 0 = dangling (its mass redistributes uniformly
# each step, scalar subquery per iteration), rank update
# (1-d)*t + d*(in + dangling*t) with t = 1/n and d = 0.85.  The final
# ordering/limit use the ROUNDED rank then id — same total order as the
# Spark side, so the top-100 cut is ulp-stable.
def _pagerank_sql(iters: int = 5, d: float = 0.85) -> str:
    head = """
WITH e AS (
  SELECT user_id AS src, event_id % 997 AS dst
  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL
),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e
  )
),
deg AS (SELECT src AS id, count(*)::DOUBLE AS deg FROM e GROUP BY src),
base AS (
  SELECT n.id, COALESCE(d.deg, 0.0) AS deg
  FROM nodes n LEFT JOIN deg d USING (id)
),
p AS (SELECT 1.0 / count(*) AS t FROM base),
r0 AS (SELECT id, deg, (SELECT t FROM p) AS rank FROM base)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
c{k} AS (
  SELECT e.dst AS id, sum(r.rank / r.deg) AS im
  FROM e JOIN r{k-1} r ON e.src = r.id
  WHERE r.deg > 0 GROUP BY e.dst
),
r{k} AS (
  SELECT b.id, b.deg,
         (1.0 - {d}) * (SELECT t FROM p)
         + {d} * (COALESCE(c.im, 0.0)
                  + COALESCE((SELECT sum(rank) FROM r{k-1} WHERE deg = 0), 0.0)
                    * (SELECT t FROM p)) AS rank
  FROM base b LEFT JOIN c{k} c USING (id)
)""")
    # round-5 compare (r8, VERDICT r7 item #5): at round-6 a true rank
    # sitting within ~1 ulp of a 0.5e-6 grid point could round apart
    # between engines; one fewer digit keeps the compare far coarser than
    # the engines' sum-order jitter while id still breaks the extra ties
    # deterministically on both sides.
    tail = f"""
SELECT id::BIGINT AS id, round(rank, 5) AS rank
FROM r{iters}
ORDER BY round(rank, 5) DESC, id
LIMIT 100"""
    return head + "".join(steps) + tail


ORACLE_SQL["pagerank"] = _pagerank_sql()

# sql_entry: the SAME SQL text runs on both engines (Spark via
# register_views + spark.sql, DuckDB over the pre-registered views) —
# the pure-SQL front door demonstrated end-to-end.
from __spark_entry__ import _SQL_ENTRY as _SQL_ENTRY_TEXT  # noqa: E402

ORACLE_SQL["sql_entry"] = _SQL_ENTRY_TEXT

# media_phash / media_video: the multimodal pixel/FFT and video-keyframe
# contract keys — the Spark side REALLY decodes the committed fixtures
# (tests/fixtures/media*.parquet, stdlib-built by scripts/make_media_fixture.py
# / make_video_fixture.py) through the Arrow mapInPandas tier; the oracles
# inline the pinned expected rows from the fixtures' *_expected.py modules as
# SQL VALUES, loaded here from that one source of truth so an oracle can
# never drift from its fixture.  Any behavior change in the decode/DCT/FFT
# path, the frame fan-out, or the Arrow plumbing breaks the exact-value
# compare.
def _pinned_values_sql(module_file: str, cols: list, casts: list) -> str:
    import importlib.util as _ilu
    import os as _os

    _p = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                       "tests", "fixtures", module_file)
    _spec = _ilu.spec_from_file_location(module_file[:-3], _p)
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    rows = ",\n  ".join(
        "(" + ", ".join(
            f"'{v}'" if isinstance(v, str) else f"CAST({v} AS BIGINT)"
            if c == "phash" else str(v)
            for v, c in zip(row, cols)
        ) + ")"
        for row in _mod.EXPECTED
    )
    sel = ", ".join(f"{c}{cast}" for c, cast in zip(cols, casts))
    order = cols[0] if len(cols) < 3 or cols[1] == "kind" else f"{cols[0]}, {cols[1]}"
    return f"""
SELECT {sel}
FROM (VALUES
  {rows}
) AS t({', '.join(cols)})
ORDER BY {order}"""


ORACLE_SQL["media_phash"] = _pinned_values_sql(
    "media_expected.py",
    ["media_id", "kind", "phash"],
    ["::BIGINT AS media_id", "", ""],
)
# pca_embed (r8, VERDICT r7 item #4: promoted from rows-only to
# value-checked): pinned integer micro-unit projections from the pure
# numpy differential in scripts/make_pca_fixture.py over the committed
# fixture — eigendecomposition itself is not SQL-expressible, so DuckDB
# serves the independently-computed literals.
def _pca_values_sql() -> str:
    import importlib.util as _ilu
    import os as _os

    _p = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                       "tests", "fixtures", "pca_expected.py")
    _spec = _ilu.spec_from_file_location("pca_expected", _p)
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    rows = ",\n  ".join(f"({i}, {d}, {u})" for i, d, u in _mod.EXPECTED)
    return f"""
SELECT vec_id::BIGINT AS vec_id, dim::INTEGER AS dim, val_u::BIGINT AS val_u
FROM (VALUES
  {rows}
) AS t(vec_id, dim, val_u)
ORDER BY vec_id, dim"""


ORACLE_SQL["pca_embed"] = _pca_values_sql()

# audio_neardup (r8, VERDICT r7 #7): expected near-dup pairs computed from
# the PINNED media_expected.py audio fingerprints (clip 13 = clip 11
# gain-scaled → hamming 2; clip 14 = clip 11 + tail → hamming 2; 13↔14
# → hamming 4; every other pair ≥ 14 apart and band-disjoint).  The
# media_phash key already guards the fingerprints themselves, so these
# literals can only drift if the banding/pair tier drifts.
ORACLE_SQL["audio_neardup"] = """
SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, hamming::INTEGER AS hamming
FROM (VALUES (11, 13, 2), (11, 14, 2), (13, 14, 4)) AS t(id_a, id_b, hamming)
ORDER BY id_a, id_b"""

ORACLE_SQL["media_video"] = _pinned_values_sql(
    "media_video_expected.py",
    ["media_id", "frame_idx", "phash"],
    ["::BIGINT AS media_id", "::INTEGER AS frame_idx", ""],
)

# bm25: Okapi BM25 with the Lucene-smoothed IDF, k1=1.2 b=0.75, fixed
# query-term list (mirrors __spark_entry__._BM25_TERMS).  Expression
# nesting mirrors text.py bm25_scores term-for-term so every
# intermediate double is identical; only the final per-doc term sum can
# differ in order -> both sides round to 6dp.
ORACLE_SQL["bm25"] = """
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS tk
  FROM documents
),
dl AS (SELECT doc_id, len(tk)::INTEGER AS dl FROM tk),
st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, t AS term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
  WHERE t IN ('hash', 'spark', 'the', 'window', 'zzzmissing')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         sum( ln((st.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) ) AS s
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN st
  GROUP BY 1
)
SELECT dl.doc_id, dl.dl, round(coalesce(sc.s, 0.0), 6) AS bm25
FROM dl LEFT JOIN sc USING (doc_id)"""

# interp_time: per-group linear time interpolation — mirrors
# core.py groupby_interpolate term-for-term: backward/forward IGNORE
# NULLS carries of (x, v) over (event_type / ts, event_id) order,
# x = epoch micros / 1e6 (identical to Spark's unix_micros/1e6), lerp
# vp + (vn-vp) * ((x-xp)/(xn-xp)), equal-x ties -> vp, one-sided gaps
# NULL, NaN counts as missing.
ORACLE_SQL["interp_time"] = _EV + """
, s AS (
  SELECT event_id, event_type,
         epoch_us(ts)::DOUBLE / 1000000.0 AS x,
         CASE WHEN vnull IS NOT NULL AND NOT isnan(vnull)
              THEN vnull END AS v
  FROM t
),
c AS (
  SELECT event_id, event_type, x, v,
         last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
           OVER wb AS xp,
         last_value(v IGNORE NULLS) OVER wb AS vp,
         first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
           OVER wf AS xn,
         first_value(v IGNORE NULLS) OVER wf AS vn
  FROM s
  WINDOW
    wb AS (PARTITION BY event_type ORDER BY x, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY x, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, event_type,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN xn = xp THEN vp
                  ELSE vp + (vn - vp) * ((x - xp) / (xn - xp)) END,
             6) AS interp
FROM c ORDER BY event_id"""

# funnel (r8 first registration): strict-order view->click->purchase
# conversion funnel over events — mirrors operators/funnel.py
# funnel_conversion: step k's time is the EARLIEST step-k event STRICTLY
# after the entity's step-(k-1) time; conversion = n_k / n_1 (bigint/bigint
# double division, bitwise identical across engines — no rounding).
ORACLE_SQL["funnel"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
),
n AS (
  SELECT (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
)
SELECT step_idx, step, n_entities,
       CASE WHEN n1 > 0 THEN CAST(n_entities AS DOUBLE) / n1 END AS conversion
FROM n, (
  SELECT CAST(1 AS INTEGER) AS step_idx, 'view' AS step, n1 AS n_entities FROM n
  UNION ALL
  SELECT CAST(2 AS INTEGER), 'click', n2 FROM n
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'purchase', n3 FROM n
) steps
ORDER BY step_idx"""

# kmv_distinct (r8): at k=65536 the KMV sketch retains every distinct user
# hash at the contract SFs, so the estimator returns the exact distinct
# count as a double — mirror with COUNT(DISTINCT) cast to DOUBLE.
ORACLE_SQL["kmv_distinct"] = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS DOUBLE) AS distinct_users
FROM events WHERE user_id IS NOT NULL
GROUP BY event_type ORDER BY event_type"""

# kmv_overlap (r8): exact-regime KMV set algebra — union via
# inclusion-exclusion, jaccard = intersection/union (int/int double
# division, bitwise identical to Spark's).
ORACLE_SQL["kmv_overlap"] = """
WITH p AS (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
sizes AS (
  SELECT event_type, count(*) AS n FROM p GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS ni
  FROM p a JOIN p b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
pairs AS (
  SELECT sa.event_type AS type_a, sb.event_type AS type_b,
         sa.n AS na, sb.n AS nb, coalesce(i.ni, 0) AS ni
  FROM sizes sa
  JOIN sizes sb ON sa.event_type < sb.event_type
  LEFT JOIN inter i
    ON i.type_a = sa.event_type AND i.type_b = sb.event_type
)
SELECT type_a, type_b,
       CAST(na + nb - ni AS DOUBLE) AS union_est,
       CAST(ni AS DOUBLE) AS inter_est,
       CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) AS jaccard
FROM pairs ORDER BY type_a, type_b"""

# linreg (r8): the exact 3-unknown normal-equation system of
# operators/linear.py linreg_fit (l_extendedprice ~ l_quantity +
# l_discount + bias), solved in closed form via Cramer's rule.
# round-3 on both sides: weights are O(1e3), cross-engine sum-order and
# solve-path drift ~1e-7.
ORACLE_SQL["linreg"] = """
WITH s AS (
  SELECT sum(l_quantity*l_quantity) AS sqq,
         sum(l_quantity*l_discount) AS sqd,
         sum(l_quantity)            AS sq,
         sum(l_discount*l_discount) AS sdd,
         sum(l_discount)            AS sd,
         CAST(count(*) AS DOUBLE)   AS n,
         sum(l_quantity*l_extendedprice) AS sqy,
         sum(l_discount*l_extendedprice) AS sdy,
         sum(l_extendedprice)           AS sy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
),
det AS (
  SELECT
    sqq*(sdd*n - sd*sd) - sqd*(sqd*n - sd*sq) + sq*(sqd*sd - sdd*sq) AS d0,
    sqy*(sdd*n - sd*sd) - sqd*(sdy*n - sd*sy) + sq*(sdy*sd - sdd*sy) AS d1,
    sqq*(sdy*n - sd*sy) - sqy*(sqd*n - sd*sq) + sq*(sqd*sy - sdy*sq) AS d2,
    sqq*(sdd*sy - sdy*sd) - sqd*(sqd*sy - sdy*sq) + sqy*(sqd*sd - sdd*sq) AS d3
  FROM s
)
SELECT feature, weight FROM (
  SELECT 'l_quantity' AS feature, round(d1/d0, 3) AS weight FROM det
  UNION ALL
  SELECT 'l_discount', round(d2/d0, 3) FROM det
  UNION ALL
  SELECT 'bias', round(d3/d0, 3) FROM det
) w ORDER BY feature"""


# logreg_quality (r8): operators/linear.py logreg_train unrolled — the
# same 5 full-batch GD steps at lr=0.5 as chained one-row CTEs, identical
# feature arithmetic (scaled n_chars, scaled arithmetic token count,
# is-English label).  The pagerank unrolled-iteration oracle pattern.
def _logreg_sql(iters: int = 5, lr: float = 0.5) -> str:
    z = "(w1*f1 + w2*f2 + wb)"
    p = f"(1.0/(1.0 + exp(-{z})))"
    sql = """
WITH d AS (
  SELECT CAST(n_chars AS DOUBLE)/100.0 - 3.0 AS f1,
         (length(text) - length(replace(text, ' ', '')) + 1.0)/50.0 - 1.0 AS f2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
  WHERE text IS NOT NULL AND n_chars IS NOT NULL AND lang IS NOT NULL
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS wb)"""
    for k in range(1, iters + 1):
        sql += f""",
g{k} AS (
  SELECT sum(({p} - y)*f1) AS g1,
         sum(({p} - y)*f2) AS g2,
         sum( {p} - y    ) AS gb
  FROM d, w{k - 1}
),
w{k} AS (
  SELECT w1 - {lr}*g1/n AS w1,
         w2 - {lr}*g2/n AS w2,
         wb - {lr}*gb/n AS wb
  FROM g{k}, w{k - 1}, nn
)"""
    sql += f"""
SELECT feature, weight FROM (
  SELECT 'f1' AS feature, round(w1, 6) AS weight FROM w{iters}
  UNION ALL
  SELECT 'f2', round(w2, 6) FROM w{iters}
  UNION ALL
  SELECT 'bias', round(wb, 6) FROM w{iters}
) w ORDER BY feature"""
    return sql


ORACLE_SQL["logreg_quality"] = _logreg_sql()

# grouped_linreg (r8): the linreg Cramer oracle under GROUP BY — one
# 3-unknown normal-equation solve per l_returnflag.  round-3, the linreg
# precedent.  Sizable groups only in this data, so no NULL-weight branch
# is needed (the operator's singular-group NULLs are covered in tests).
ORACLE_SQL["grouped_linreg"] = """
WITH s AS (
  SELECT l_returnflag,
         sum(l_quantity*l_quantity) AS sqq,
         sum(l_quantity*l_discount) AS sqd,
         sum(l_quantity)            AS sq,
         sum(l_discount*l_discount) AS sdd,
         sum(l_discount)            AS sd,
         CAST(count(*) AS DOUBLE)   AS n,
         sum(l_quantity*l_extendedprice) AS sqy,
         sum(l_discount*l_extendedprice) AS sdy,
         sum(l_extendedprice)           AS sy,
         count(*)                       AS n_rows
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
  GROUP BY l_returnflag
),
det AS (
  SELECT l_returnflag, n_rows,
    sqq*(sdd*n - sd*sd) - sqd*(sqd*n - sd*sq) + sq*(sqd*sd - sdd*sq) AS d0,
    sqy*(sdd*n - sd*sd) - sqd*(sdy*n - sd*sy) + sq*(sdy*sd - sdd*sy) AS d1,
    sqq*(sdy*n - sd*sy) - sqy*(sqd*n - sd*sq) + sq*(sqd*sy - sdy*sq) AS d2,
    sqq*(sdd*sy - sdy*sd) - sqd*(sqd*sy - sdy*sq) + sqy*(sqd*sd - sdd*sq) AS d3
  FROM s
)
SELECT l_returnflag, feature, weight, n FROM (
  SELECT l_returnflag, 'l_quantity' AS feature,
         round(d1/d0, 3) AS weight, n_rows AS n FROM det
  UNION ALL
  SELECT l_returnflag, 'l_discount', round(d2/d0, 3), n_rows FROM det
  UNION ALL
  SELECT l_returnflag, 'bias', round(d3/d0, 3), n_rows FROM det
) w ORDER BY l_returnflag, feature"""

# retention (r8): weekly cohort retention — epoch-aligned integer week
# buckets via the IDENTICAL double arithmetic as Spark's
# time_to_seconds/floor ((micros/1e6)/604800), distinct activity ->
# min-period cohort -> offset counts; retention = n_active / cohort size
# (bigint/bigint double division).
ORACLE_SQL["retention"] = """
WITH a AS (
  SELECT DISTINCT user_id AS e,
         CAST(floor((epoch_us(ts)::DOUBLE / 1000000.0) / 604800.0) AS BIGINT) AS p
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
c AS (SELECT e, min(p) AS coh FROM a GROUP BY e),
o AS (
  SELECT c.coh AS cohort, CAST(a.p - c.coh AS INTEGER) AS off,
         count(*) AS n_active
  FROM a JOIN c USING (e) WHERE a.p - c.coh <= 12 GROUP BY 1, 2
),
s AS (SELECT cohort, n_active AS sz FROM o WHERE off = 0)
SELECT o.cohort, o.off AS "offset", o.n_active,
       CAST(o.n_active AS DOUBLE) / s.sz AS retention
FROM o JOIN s USING (cohort) ORDER BY cohort, off"""

# grouped_logreg (r8): the logreg_quality unrolled-GD oracle under
# GROUP BY — per-source weight rows join back on the group key each
# step, so one CTE chain trains every group simultaneously (mirrors the
# operator's broadcast-weights design).
def _grouped_logreg_sql(iters: int = 5, lr: float = 0.5) -> str:
    z = "(w.w1*d.f1 + w.w2*d.f2 + w.wb)"
    p = f"(1.0/(1.0 + exp(-{z})))"
    sql = """
WITH d AS (
  SELECT source AS g,
         CAST(n_chars AS DOUBLE)/100.0 - 3.0 AS f1,
         (length(text) - length(replace(text, ' ', '')) + 1.0)/50.0 - 1.0 AS f2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
  WHERE text IS NOT NULL AND n_chars IS NOT NULL AND lang IS NOT NULL
    AND source IS NOT NULL
),
nn AS (SELECT g, CAST(count(*) AS DOUBLE) AS n,
              count(*) AS n_rows FROM d GROUP BY g),
w0 AS (SELECT g, 0.0 AS w1, 0.0 AS w2, 0.0 AS wb FROM nn)"""
    for k in range(1, iters + 1):
        prev = f"w{k - 1}"
        sql += f""",
g{k} AS (
  SELECT d.g,
         sum(({p} - d.y)*d.f1) AS g1,
         sum(({p} - d.y)*d.f2) AS g2,
         sum( {p} - d.y      ) AS gb
  FROM d JOIN {prev} w ON d.g = w.g
  GROUP BY d.g
),
w{k} AS (
  SELECT w.g,
         w.w1 - {lr}*g.g1/nn.n AS w1,
         w.w2 - {lr}*g.g2/nn.n AS w2,
         w.wb - {lr}*g.gb/nn.n AS wb
  FROM {prev} w JOIN g{k} g ON w.g = g.g JOIN nn ON w.g = nn.g
)"""
    sql += f"""
SELECT source, feature, weight, n FROM (
  SELECT w.g AS source, 'f1' AS feature, round(w.w1, 6) AS weight,
         nn.n_rows AS n FROM w{iters} w JOIN nn ON w.g = nn.g
  UNION ALL
  SELECT w.g, 'f2', round(w.w2, 6), nn.n_rows
  FROM w{iters} w JOIN nn ON w.g = nn.g
  UNION ALL
  SELECT w.g, 'bias', round(w.wb, 6), nn.n_rows
  FROM w{iters} w JOIN nn ON w.g = nn.g
) t ORDER BY source, feature"""
    return sql


ORACLE_SQL["grouped_logreg"] = _grouped_logreg_sql()

# target_encode (r8): leave-one-out smoothed target encoding of
# l_partkey against integer-valued l_quantity — every sum and division
# is exact/bit-identical, association order mirrored term-for-term:
# ((s - y) + m*prior) / ((n - 1) + m).
ORACLE_SQL["target_encode"] = f"""
WITH li AS (
  SELECT {_LI_IDX} AS idx, l_partkey, l_quantity FROM lineitem
),
p AS (SELECT avg(l_quantity) AS prior FROM li),
s AS (
  SELECT l_partkey, count(l_quantity) AS n, sum(l_quantity) AS s
  FROM li GROUP BY l_partkey
)
SELECT li.idx, li.l_partkey,
       (s.s - li.l_quantity + 20.0*p.prior) / (s.n - 1 + 20.0) AS te
FROM li JOIN s USING (l_partkey), p
ORDER BY li.idx"""

# funnel_window (r8): the funnel oracle with the boundary-inclusive
# one-day conversion window from funnel entry — the ts comparisons use
# the IDENTICAL epoch_us/1e6 double arithmetic as Spark's
# time_to_seconds, so the <= boundary cannot diverge.
ORACLE_SQL["funnel_window"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND (epoch_us(e.ts)::DOUBLE/1000000.0)
        <= (epoch_us(s1.t1)::DOUBLE/1000000.0) + 86400.0
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND (epoch_us(e.ts)::DOUBLE/1000000.0)
        <= (epoch_us(s1.t1)::DOUBLE/1000000.0) + 86400.0
  GROUP BY e.user_id
),
n AS (
  SELECT (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
)
SELECT step_idx, step, n_entities,
       CASE WHEN n1 > 0 THEN CAST(n_entities AS DOUBLE) / n1 END AS conversion
FROM n, (
  SELECT CAST(1 AS INTEGER) AS step_idx, 'view' AS step, n1 AS n_entities FROM n
  UNION ALL
  SELECT CAST(2 AS INTEGER), 'click', n2 FROM n
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'purchase', n3 FROM n
) steps
ORDER BY step_idx"""

# funnel_timing (r8): per-transition gap statistics over the unwindowed
# funnel CTEs — gaps in exact epoch_us/1e6 double seconds, mean round-6
# (float-sum order), median interpolates two exact doubles identically.
ORACLE_SQL["funnel_timing"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' AND ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
),
g2 AS (
  SELECT (epoch_us(s2.t2)::DOUBLE/1000000.0)
       - (epoch_us(s1.t1)::DOUBLE/1000000.0) AS g
  FROM s2 JOIN s1 USING (user_id)
),
g3 AS (
  SELECT (epoch_us(s3.t3)::DOUBLE/1000000.0)
       - (epoch_us(s2.t2)::DOUBLE/1000000.0) AS g
  FROM s3 JOIN s2 USING (user_id)
)
SELECT step_idx, step, n, mean_gap_s, median_gap_s FROM (
  SELECT CAST(2 AS INTEGER) AS step_idx, 'click' AS step,
         count(*) AS n, round(avg(g), 6) AS mean_gap_s,
         round(median(g), 6) AS median_gap_s FROM g2
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'purchase', count(*), round(avg(g), 6),
         round(median(g), 6) FROM g3
) t ORDER BY step_idx"""

# ann_recall (r8): the ann_topk (exact) and ann_ivf (approx) oracle CTE
# bodies composed into one statement, then the recall algebra — per
# query recall@3 (= hits/3) and the reciprocal rank of the exact-rank-1
# neighbor in the approximate list (0.0 when missed); exact rationals.
ORACLE_SQL["ann_recall"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
es AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv::DOUBLE[], cv::DOUBLE[]) /
         (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) *
          sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[]))) AS cosine
  FROM c, q WHERE query_id <> neighbor_id
),
exact AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM es) WHERE rank <= 3
),
cents AS (SELECT vec_id AS cell, embedding AS cv
          FROM embeddings ORDER BY vec_id LIMIT 8),
ca AS (SELECT vec_id, cell,
              list_dot_product(embedding::DOUBLE[], cv::DOUBLE[]) /
              (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
               sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[]))) AS cos
       FROM embeddings, cents),
corp AS (SELECT vec_id AS neighbor_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
  FROM ca) WHERE rn = 1),
qa AS (SELECT vec_id AS query_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
  FROM ca WHERE vec_id < 10) WHERE rn <= 2),
aps AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(qe.embedding::DOUBLE[], qe.embedding::DOUBLE[])) *
          sqrt(list_dot_product(ne.embedding::DOUBLE[], ne.embedding::DOUBLE[]))) AS cosine
  FROM qa JOIN corp USING (cell)
  JOIN embeddings qe ON qe.vec_id = query_id
  JOIN embeddings ne ON ne.vec_id = neighbor_id
  WHERE query_id <> neighbor_id
),
approx AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM aps) WHERE rank <= 3
),
j AS (
  SELECT e.query_id, e.neighbor_id, e.rank AS er, a.rank AS ar
  FROM exact e LEFT JOIN approx a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
)
SELECT query_id,
       count(*) AS n_exact,
       count(ar) AS n_hit,
       CAST(count(ar) AS DOUBLE) / count(*) AS recall,
       coalesce(max(CASE WHEN er = 1 THEN coalesce(1.0/ar, 0.0) END), 0.0) AS rr
FROM j GROUP BY query_id ORDER BY query_id"""

# qcut (r8): global decile bins — edges via quantile_cont (bitwise-equal
# to the engine's _pooled_exact_grid, proven by the qnorm key), bin =
# number of interior edges strictly below the value.
ORACLE_SQL["qcut"] = f"""
WITH li AS (SELECT {_LI_IDX} AS idx, l_extendedprice AS x FROM lineitem),
e AS (
  SELECT quantile_cont(x, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS es
  FROM li WHERE x IS NOT NULL
)
SELECT idx,
       CAST(len(list_filter(e.es, t -> li.x > t)) AS INTEGER) AS qbin
FROM li, e ORDER BY idx"""

# qcut_grouped (r8): per-l_returnflag deciles — every arithmetic step of
# binning.quantile_bins' grouped path mirrored exactly (row_number ranks,
# k = floor((i/10)*(n-1)), d = pk - k, lerp lo*(1-d)+hi*d, right-closed
# assignment).  No rounding anywhere: the expressions are bit-shared.
ORACLE_SQL["qcut_grouped"] = f"""
WITH li AS (SELECT {_LI_IDX} AS idx, l_returnflag AS g, l_extendedprice AS x
            FROM lineitem),
v AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS r
      FROM li WHERE x IS NOT NULL),
n AS (SELECT g, max(r) AS n FROM v GROUP BY g),
spec AS (
  -- integer-first position arithmetic, mirroring binning.quantile_bins:
  -- pos = CAST(i*(n-1) AS DOUBLE)/10.0 (exact anchors stay exact)
  SELECT g, i,
         CAST(floor(CAST(i*(n-1) AS DOUBLE)/10.0) AS BIGINT) AS k,
         CAST(i*(n-1) AS DOUBLE)/10.0 AS pk,
         n
  FROM n, generate_series(1, 9) AS t(i)
),
spec2 AS (
  SELECT g, i, k+1 AS rlo, least(k+2, n) AS rhi,
         pk - CAST(k AS DOUBLE) AS d
  FROM spec
),
edges AS (
  SELECT s.g, s.i, lo.x*(1.0 - s.d) + hi.x*s.d AS e
  FROM spec2 s
  JOIN v lo ON lo.g = s.g AND lo.r = s.rlo
  JOIN v hi ON hi.g = s.g AND hi.r = s.rhi
)
SELECT li.idx, li.g AS l_returnflag,
       CAST(sum(CASE WHEN li.x > e.e THEN 1 ELSE 0 END) AS INTEGER) AS qbin
FROM li JOIN edges e ON li.g = e.g
GROUP BY li.idx, li.g
ORDER BY li.idx"""

# dsir (r8): DSIR importance weights — hashed-bigram add-1-smoothed
# log-likelihood ratio, target = the English documents.  Portable md5
# bucket hash mirrored; per-doc score re-summed over a join (order
# differs from Spark's array fold) and log is libm → round-6 both sides.
ORACLE_SQL["dsir"] = """
WITH tk AS (
  SELECT doc_id, lang, text,
         list_filter(string_split_regex(text, '[ \t\n\r\f]+'), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)),
                                  i -> t[i] || ' ' || t[i + 1])
              ELSE [] END AS grams
  FROM tk WHERE text IS NOT NULL
),
b AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('dsir:' || gr), 1, 15) AS BIGINT) % 1024 AS bk
  FROM (SELECT doc_id, lang, unnest(grams) AS gr FROM g)
),
tprof AS (SELECT bk, count(*) AS c FROM b WHERE lang = 'en' GROUP BY bk),
rprof AS (SELECT bk, count(*) AS c FROM b GROUP BY bk),
tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM tprof) + 1.0*1024 AS t_tot,
         (SELECT coalesce(sum(c), 0) FROM rprof) + 1.0*1024 AS r_tot
),
ratio AS (
  SELECT s.bk,
         ln((coalesce(t.c, 0) + 1.0) / tot.t_tot)
       - ln((coalesce(r.c, 0) + 1.0) / tot.r_tot) AS lr
  FROM (SELECT unnest(range(0, 1024)) AS bk) s
  LEFT JOIN tprof t USING (bk) LEFT JOIN rprof r USING (bk), tot
),
scores AS (
  SELECT b.doc_id, sum(ratio.lr) AS s
  FROM b JOIN ratio USING (bk) GROUP BY b.doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NULL THEN NULL
            ELSE round(coalesce(sc.s, 0.0), 6) END AS dsir_logw
FROM documents d LEFT JOIN scores sc USING (doc_id)
ORDER BY d.doc_id"""

# k_anonymity (r8): quasi-identifier group-size rollup — min size,
# violating groups/rows at k=25, boolean verdict.
ORACLE_SQL["k_anonymity"] = """
WITH s AS (
  SELECT c_mktsegment, c_nationkey, count(*) AS group_size
  FROM customer GROUP BY 1, 2
)
SELECT CAST(sum(group_size) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(group_size) AS BIGINT) AS min_group_size,
       CAST(sum(CASE WHEN group_size < 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN group_size < 25 THEN group_size ELSE 0 END) AS BIGINT)
         AS n_violating_rows,
       min(group_size) >= 25 AS k_anon
FROM s"""

# ngram_containment (r8): the ngram_jaccard oracle with Broder's
# containment denominator |A∩B| / min(|A|, |B|) — same capped shingle
# space (max_shingle_df=256), threshold 0.5.
ORACLE_SQL["ngram_containment"] = f"""{_TOKS},
sh0 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk)-1, 0)+1),
                               i -> array_to_string(tk[i:i+1], ' '))) AS sh
  FROM toks
),
shdf AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 256),
sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN shdf USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       round(c::DOUBLE / least(sa.n, sb.n), 6) AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE c::DOUBLE / least(sa.n, sb.n) >= 0.5
ORDER BY id_a, id_b"""

# qcut_two_pass (r8): the two-pass grouped tier must equal the window
# tier bit-for-bit — same oracle text as qcut_grouped.
ORACLE_SQL["qcut_two_pass"] = ORACLE_SQL["qcut_grouped"]

# fuzzy_match (r8; config migrated r11 to the density-robust DEFAULT
# cap): edit-distance record linkage over customer names — identical
# char-3-gram blocking (distinct grams, stop-gram cap
# max(256, ceil(0.05*n)) — the library default: absolute floor for
# small corpora, density-relative growth at scale), pairs share >= 1
# surviving gram, levenshtein <= 2 verify.
ORACLE_SQL["fuzzy_match"] = """
WITH b AS (SELECT c_custkey AS id, c_name AS txt FROM customer WHERE c_name IS NOT NULL),
nrec AS (SELECT count(*) AS n FROM b),
g0 AS (
  SELECT DISTINCT id, txt,
         unnest(list_transform(range(1, greatest(length(txt) - 2, 0) + 1),
                               i -> substr(txt, i, 3))) AS g
  FROM b
),
keep AS (SELECT g FROM g0 GROUP BY g
         HAVING count(*) <= greatest(256, CAST(ceil(0.05 * (SELECT n FROM nrec)) AS BIGINT))),
gb AS (SELECT g0.id, g0.txt, g0.g FROM g0 JOIN keep USING (g)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.txt AS t_a, b.txt AS t_b
  FROM gb a JOIN gb b ON a.g = b.g AND a.id < b.id
)
SELECT id_a, id_b, CAST(levenshtein(t_a, t_b) AS INTEGER) AS dist
FROM cand WHERE levenshtein(t_a, t_b) <= 2
ORDER BY id_a, id_b"""

# fuzzy_coverage (r10): blocking-coverage audit for the fuzzy_match
# config — identical distinct-gram construction and df<=256 cap; a
# record is "blocked" iff it has >= 1 surviving gram.
# fuzzy_scaled (r10): the density-relative stop-gram cap — ceil(0.05·n)
# instead of an absolute 256, so blocking survives any corpus density.
# The engine runs the PPJoin prefix tier; the oracle is the plain
# full-blocking form, identical output by the prefix-filter theorem
# (a qualifying pair's rarest-gram prefixes must intersect), so this
# row also end-to-end-verifies the prefix filter.
ORACLE_SQL["fuzzy_scaled"] = """
WITH b AS (SELECT c_custkey AS id, c_name AS txt FROM customer WHERE c_name IS NOT NULL),
nrec AS (SELECT count(*) AS n FROM b),
g0 AS (
  SELECT DISTINCT id, txt,
         unnest(list_transform(range(1, greatest(length(txt) - 2, 0) + 1),
                               i -> substr(txt, i, 3))) AS g
  FROM b
),
keep AS (SELECT g FROM g0 GROUP BY g
         HAVING count(*) <= greatest(1, CAST(ceil(0.05 * (SELECT n FROM nrec)) AS BIGINT))),
gb AS (SELECT g0.id, g0.txt, g0.g FROM g0 JOIN keep USING (g)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.txt AS t_a, b.txt AS t_b
  FROM gb a JOIN gb b ON a.g = b.g AND a.id < b.id
)
SELECT id_a, id_b, CAST(levenshtein(t_a, t_b) AS INTEGER) AS dist
FROM cand WHERE levenshtein(t_a, t_b) <= 1
ORDER BY id_a, id_b"""

ORACLE_SQL["fuzzy_coverage"] = """
WITH b AS (
  SELECT c_custkey AS id, c_name AS txt FROM customer WHERE c_name IS NOT NULL
),
g0 AS (
  SELECT DISTINCT id,
         unnest(list_transform(range(1, greatest(length(txt) - 2, 0) + 1),
                               i -> substr(txt, i, 3))) AS g
  FROM b
),
dft AS (SELECT g, count(*) AS d FROM g0 GROUP BY g),
blocked AS (
  SELECT DISTINCT g0.id FROM g0 JOIN dft USING (g) WHERE dft.d <= 256
)
SELECT (SELECT count(*) FROM b) AS records,
       (SELECT count(*) FROM b) - (SELECT count(DISTINCT id) FROM g0)
           AS short_records,
       (SELECT count(*) FROM blocked) AS blocked_records,
       (SELECT count(DISTINCT id) FROM g0) - (SELECT count(*) FROM blocked)
           AS unblocked_records,
       (SELECT count(*) FROM dft) AS distinct_grams,
       (SELECT count(*) FROM dft WHERE d > 256) AS dropped_grams,
       CASE WHEN (SELECT count(*) FROM dft) = 0 THEN 0.0
            ELSE (SELECT count(*) FROM dft WHERE d > 256)::DOUBLE
                 / (SELECT count(*) FROM dft)::DOUBLE END
           AS dropped_gram_frac"""

# lsh_coverage (r12): bucket-occupancy audit for the embedding-LSH
# family — identical md5-plane bucket assignment (shared _lsh_bucket_sql,
# left-to-right sign fold) and identical anchor-star cap arithmetic
# (capped_bucket_pairs: n<=c -> C(n,2) pairs, else c*n - c*(c+1)/2;
# n - c members truncated to anchors-only scoring).  recommended_n_planes
# is integer-exact on both sides: smallest p with 2^p * target >= records
# via bit length (bin()), never float log2.  Config pinned: n_planes=4,
# cap = target = 16 (16*17/2 = 136).
ORACLE_SQL["lsh_coverage"] = f"""
WITH b AS (
  SELECT {_lsh_bucket_sql('embedding', n_planes=4)} AS bucket
  FROM embeddings WHERE embedding IS NOT NULL
),
c AS (SELECT bucket, count(*)::BIGINT AS n FROM b GROUP BY bucket),
s AS (
  SELECT coalesce(sum(n), 0)::BIGINT AS records,
         count(*)::BIGINT AS buckets,
         coalesce(max(n), 0)::BIGINT AS max_bucket,
         coalesce(sum(CASE WHEN n > 16 THEN 1 ELSE 0 END), 0)::BIGINT
             AS over_cap_buckets,
         coalesce(sum(CASE WHEN n > 16 THEN n - 16 ELSE 0 END), 0)::BIGINT
             AS truncated_members,
         coalesce(sum(CASE WHEN n <= 16 THEN (n * (n - 1)) // 2
                           ELSE 16 * n - 136 END), 0)::BIGINT AS scored_pairs,
         coalesce(sum((n * (n - 1)) // 2), 0)::BIGINT AS total_pairs
  FROM c
)
SELECT records, buckets, max_bucket,
       CASE WHEN buckets = 0 THEN 0.0
            ELSE records::DOUBLE / buckets::DOUBLE END AS avg_bucket,
       4::INTEGER AS n_planes,
       over_cap_buckets, truncated_members,
       CASE WHEN records = 0 THEN 0.0
            ELSE truncated_members::DOUBLE / records::DOUBLE END
           AS truncated_member_frac,
       scored_pairs, total_pairs,
       CASE WHEN total_pairs = 0 THEN 1.0
            ELSE scored_pairs::DOUBLE / total_pairs::DOUBLE END
           AS scored_pair_frac,
       (CASE WHEN (records + 15) // 16 <= 1 THEN 0
             ELSE length(bin((records + 15) // 16 - 1)) END)::INTEGER
           AS recommended_n_planes
FROM s"""

# json_extract (r8): typed schema-on-read over events.props — the same
# $.k path + bigint cast; integer count/sum/min/max are exact.
ORACLE_SQL["json_extract"] = """
SELECT event_type,
       count(pk) AS n,
       sum(pk)::BIGINT AS sum_k,
       min(pk)::BIGINT AS min_k,
       max(pk)::BIGINT AS max_k
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS pk
  FROM events
) t
GROUP BY event_type ORDER BY event_type"""
