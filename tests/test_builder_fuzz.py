"""Property-based differential test: random Flux pipelines through the
QueryBuilder vs an independently-generated DuckDB oracle.

Each example draws a pipeline — range bounds, up to two filter
predicates (string equality / numeric comparisons, AND/OR joiners, band
splits), an optional windowed aggregate — runs it both ways on the
sf0.001 events table, and compares full row sets. This fuzzes exactly
the semantics the golden oracle queries pin at fixed points: range
inclusivity ([start, stop)), predicate composition, window bucket
alignment and stop-labeling.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

EVENTS = "/root/testdata/sf0.001/events.parquet"
AGG_SQL = {"mean": "avg", "min": "min", "max": "max", "sum": "sum",
           "count": "count"}
EVERY_SECONDS = {"1h": 3600, "6h": 21600, "1d": 86400}
EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{EVENTS}'")
    return con


str_filter = st.tuples(
    st.just("event_type"),
    st.sampled_from(["==", "!="]),
    st.sampled_from(EVENT_TYPES),
)
num_filter = st.tuples(
    st.just("value"),
    st.sampled_from(["<", "<=", ">", ">="]),
    st.integers(-20, 120).map(float),
)
predicate = st.one_of(str_filter, num_filter)

pipelines = st.fixed_dictionaries(
    {
        "t0_day": st.integers(1, 25),
        "span_days": st.integers(1, 8),
        "filters": st.lists(
            st.tuples(predicate, st.sampled_from(["and", "or"]),
                      st.booleans()),
            max_size=2,
        ),
        "agg": st.one_of(
            st.none(),
            st.tuples(st.sampled_from(sorted(AGG_SQL)),
                      st.sampled_from(sorted(EVERY_SECONDS))),
        ),
    }
)


def _sql_pred(field: str, op: str, value) -> str:
    sql_op = {"==": "=", "!=": "<>"}.get(op, op)
    lit = f"'{value}'" if isinstance(value, str) else repr(value)
    return f"{field} {sql_op} {lit}"


def _oracle_sql(t0: datetime, t1: datetime, bands: list[list], agg) -> str:
    where = [f"ts >= TIMESTAMP '{t0}' AND ts < TIMESTAMP '{t1}'"]
    for band in bands:
        terms = []
        for i, (field, op, value, joiner) in enumerate(band):
            prefix = f" {joiner.upper()} " if i else ""
            terms.append(prefix + _sql_pred(field, op, value))
        where.append("(" + "".join(terms) + ")")
    cond = " AND ".join(where)
    if agg is None:
        return (
            "SELECT event_id, ts, event_type, value FROM events "
            f"WHERE {cond}"
        )
    fn, every = agg
    sec = EVERY_SECONDS[every]
    return f"""
        SELECT time_bucket(INTERVAL '{sec} seconds', ts)
               + INTERVAL '{sec} seconds' AS ts,
               event_type, {AGG_SQL[fn]}(value) AS value
        FROM events WHERE {cond} GROUP BY 1, 2
    """


def _norm(rows, agg) -> list[tuple]:
    out = []
    for r in rows:
        vals = [
            v.replace(tzinfo=None) if isinstance(v, datetime) else v
            for v in r
        ]
        out.append(tuple(vals))
    # sort on the non-float columns only — they form a unique key in
    # every generated shape (event_id, or (window, event_type)), so the
    # ordering never depends on float representation differences
    return sorted(
        out,
        key=lambda t: tuple(str(v) for v in t if not isinstance(v, float)),
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(p=pipelines)
def test_builder_matches_duckdb(spark, duck, p):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    t0 = datetime(2024, 1, p["t0_day"])
    t1 = t0 + timedelta(days=p["span_days"])

    qb = QueryBuilder(
        load_table(spark, "/root/testdata/sf0.001", "events"),
        ts_col="ts",
        value_col="value",
        series_cols=("event_type",),
    ).range(t0, t1)

    # replay the drawn predicates through the builder, tracking the band
    # structure so the oracle WHERE clause matches semantically
    bands: list[list] = []
    for (field, op, value), joiner, new_band in p["filters"]:
        qb = qb.filter(field, value, op=op, joiner=joiner, new_band=new_band)
        if new_band or not bands:
            bands.append([(field, op, value, "and")])
        else:
            bands[-1].append((field, op, value, joiner))

    if p["agg"] is None:
        qb = qb.select("event_id", "ts", "event_type", "value")
    else:
        fn, every = p["agg"]
        qb = qb.aggregate_window(every, fn)

    got = _norm([tuple(r) for r in qb.to_df().collect()], p["agg"])
    want = _norm(
        duck.execute(_oracle_sql(t0, t1, bands, p["agg"])).fetchall(),
        p["agg"],
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert gv == wv


# ---------------------------------------------------------------------------
# createEmpty differential: aggregate pipelines that must also emit the
# empty windows on the range-pinned spine (keys × window grid)
# ---------------------------------------------------------------------------

empty_pipelines = st.fixed_dictionaries(
    {
        "t0_day": st.integers(1, 25),
        "span_days": st.integers(1, 6),
        "filters": st.lists(
            st.tuples(predicate, st.sampled_from(["and", "or"]),
                      st.booleans()),
            max_size=2,
        ),
        "fn": st.sampled_from(sorted(AGG_SQL)),
        "every": st.sampled_from(sorted(EVERY_SECONDS)),
    }
)


def _oracle_sql_create_empty(
    t0: datetime, t1: datetime, bands: list[list], fn: str, every: str
) -> str:
    sec = EVERY_SECONDS[every]
    where = [f"ts >= TIMESTAMP '{t0}' AND ts < TIMESTAMP '{t1}'"]
    for band in bands:
        terms = []
        for i, (field, op, value, joiner) in enumerate(band):
            prefix = f" {joiner.upper()} " if i else ""
            terms.append(prefix + _sql_pred(field, op, value))
        where.append("(" + "".join(terms) + ")")
    cond = " AND ".join(where)
    agg = f"{AGG_SQL[fn]}(value)"
    fill = "coalesce(a.value, 0)" if fn == "count" else "a.value"
    # the fuzz draws midnight-aligned bounds, so the first window start
    # is t0 itself and the last is t1 - every (same floor the engine
    # takes on arbitrary bounds)
    return f"""
        WITH base AS (SELECT * FROM events WHERE {cond}),
        keys AS (SELECT DISTINCT event_type FROM base),
        spine AS (
            SELECT unnest(generate_series(
                TIMESTAMP '{t0}',
                TIMESTAMP '{t1}' - INTERVAL '{sec} seconds',
                INTERVAL '{sec} seconds')) AS wstart
        ),
        agg AS (
            SELECT time_bucket(INTERVAL '{sec} seconds', ts) AS wstart,
                   event_type, {agg} AS value
            FROM base GROUP BY 1, 2
        )
        SELECT s.wstart + INTERVAL '{sec} seconds' AS ts, k.event_type,
               {fill} AS value
        FROM spine s CROSS JOIN keys k
        LEFT JOIN agg a
          ON a.wstart = s.wstart AND a.event_type = k.event_type
    """


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(p=empty_pipelines)
def test_create_empty_matches_duckdb(spark, duck, p):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    t0 = datetime(2024, 1, p["t0_day"])
    t1 = t0 + timedelta(days=p["span_days"])
    qb = QueryBuilder(
        load_table(spark, "/root/testdata/sf0.001", "events"),
        ts_col="ts",
        value_col="value",
        series_cols=("event_type",),
    ).range(t0, t1)
    bands: list[list] = []
    for (field, op, value), joiner, new_band in p["filters"]:
        qb = qb.filter(field, value, op=op, joiner=joiner, new_band=new_band)
        if new_band or not bands:
            bands.append([(field, op, value, "and")])
        else:
            bands[-1].append((field, op, value, joiner))
    qb = qb.aggregate_window(p["every"], p["fn"], create_empty=True)

    got = _norm([tuple(r) for r in qb.to_df().collect()], ("x",))
    want = _norm(
        duck.execute(
            _oracle_sql_create_empty(t0, t1, bands, p["fn"], p["every"])
        ).fetchall(),
        ("x",),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert gv == wv


# ---------------------------------------------------------------------------
# sort + limit differential: the top-k tail of the pipeline (TakeOrdered)
# ---------------------------------------------------------------------------

limit_pipelines = st.fixed_dictionaries(
    {
        "t0_day": st.integers(1, 25),
        "span_days": st.integers(1, 8),
        "filters": st.lists(
            st.tuples(predicate, st.sampled_from(["and", "or"]),
                      st.booleans()),
            max_size=1,
        ),
        "desc": st.booleans(),
        "n": st.integers(1, 40),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(p=limit_pipelines)
def test_sort_limit_matches_duckdb(spark, duck, p):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    t0 = datetime(2024, 1, p["t0_day"])
    t1 = t0 + timedelta(days=p["span_days"])
    qb = QueryBuilder(
        load_table(spark, "/root/testdata/sf0.001", "events"),
        ts_col="ts",
        value_col="value",
        series_cols=("event_type",),
    ).range(t0, t1)
    bands: list[list] = []
    for (field, op, value), joiner, new_band in p["filters"]:
        qb = qb.filter(field, value, op=op, joiner=joiner, new_band=new_band)
        if new_band or not bands:
            bands.append([(field, op, value, "and")])
        else:
            bands[-1].append((field, op, value, joiner))
    qb = (
        qb.select("event_id", "ts", "event_type", "value")
        .sort("event_id", desc=p["desc"])
        .limit(p["n"])
    )
    # event_id is unique, so the ordered prefix is fully deterministic
    got = [tuple(r) for r in qb.to_df().collect()]
    where = [f"ts >= TIMESTAMP '{t0}' AND ts < TIMESTAMP '{t1}'"]
    for band in bands:
        terms = []
        for i, (field, op, value, joiner) in enumerate(band):
            prefix = f" {joiner.upper()} " if i else ""
            terms.append(prefix + _sql_pred(field, op, value))
        where.append("(" + "".join(terms) + ")")
    order = "DESC" if p["desc"] else "ASC"
    want = duck.execute(
        f"SELECT event_id, ts, event_type, value FROM events "
        f"WHERE {' AND '.join(where)} ORDER BY event_id {order} "
        f"LIMIT {p['n']}"
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            gv = gv.replace(tzinfo=None) if isinstance(gv, datetime) else gv
            wv = wv.replace(tzinfo=None) if isinstance(wv, datetime) else wv
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert gv == wv


# ---------------------------------------------------------------------------
# transform-stage differential: aggregateWindow + one stdlib transform
# (difference / cumulativeSum / movingAverage / top) vs a window-SQL oracle
# ---------------------------------------------------------------------------

transform_pipelines = st.fixed_dictionaries(
    {
        "t0_day": st.integers(1, 22),
        "span_days": st.integers(2, 8),
        "every": st.sampled_from(sorted(EVERY_SECONDS)),
        "stage": st.one_of(
            st.just(("difference", None)),
            st.just(("cumulativeSum", None)),
            st.tuples(st.just("movingAverage"), st.integers(2, 5)),
            # top uses fn=count so values are exact ints — ranking ties
            # resolve identically on both engines (broken by ts)
            st.tuples(st.just("top"), st.integers(1, 5)),
        ),
    }
)


def _transform_oracle_sql(t0, t1, every: str, stage: tuple) -> str:
    sec = EVERY_SECONDS[every]
    name, n = stage
    fn = "count" if name == "top" else "avg"
    cast = "CAST(count(value) AS BIGINT)" if name == "top" else "avg(value)"
    agg = f"""
        SELECT time_bucket(INTERVAL '{sec} seconds', ts)
               + INTERVAL '{sec} seconds' AS ts,
               event_type, {cast} AS value
        FROM events
        WHERE ts >= TIMESTAMP '{t0}' AND ts < TIMESTAMP '{t1}'
        GROUP BY 1, 2
    """
    if name == "difference":
        return f"""
            WITH agg AS ({agg}), d AS (
                SELECT ts, event_type,
                       value - lag(value) OVER (PARTITION BY event_type
                                                ORDER BY ts) AS value
                FROM agg
            ) SELECT * FROM d WHERE value IS NOT NULL
        """
    if name == "cumulativeSum":
        return f"""
            WITH agg AS ({agg})
            SELECT ts, event_type,
                   sum(value) OVER (PARTITION BY event_type ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS value
            FROM agg
        """
    if name == "movingAverage":
        return f"""
            WITH agg AS ({agg})
            SELECT ts, event_type,
                   avg(value) OVER (PARTITION BY event_type ORDER BY ts
                                    ROWS BETWEEN {n - 1} PRECEDING
                                    AND CURRENT ROW) AS value
            FROM agg
        """
    return f"""
        WITH agg AS ({agg}), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY value DESC, ts ASC) AS rk
            FROM agg
        ) SELECT ts, event_type, value FROM ranked WHERE rk <= {n}
    """


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(p=transform_pipelines)
def test_transform_stage_matches_duckdb(spark, duck, p):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    t0 = datetime(2024, 1, p["t0_day"])
    t1 = t0 + timedelta(days=p["span_days"])
    name, n = p["stage"]
    fn = "count" if name == "top" else "mean"
    qb = (
        QueryBuilder(
            load_table(spark, "/root/testdata/sf0.001", "events"),
            ts_col="ts",
            value_col="value",
            series_cols=("event_type",),
        )
        .range(t0, t1)
        .aggregate_window(p["every"], fn)
        .transform(name, **({"n": n} if n is not None else {}))
    )
    got = _norm([tuple(r) for r in qb.to_df().collect()], ("x",))
    want = _norm(
        duck.execute(
            _transform_oracle_sql(t0, t1, p["every"], p["stage"])
        ).fetchall(),
        ("x",),
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert gv == wv


# ---------------------------------------------------------------------------
# r11 stage differential: hourSelection (incl. midnight wrap) + an
# optional highest*/lowest* selector over count-valued aggregates
# (exact ints, so ranking ties resolve identically on both engines)
# ---------------------------------------------------------------------------

_SELECTOR_NAMES = [
    "highestMax", "lowestMin", "highestCurrent", "lowestCurrent",
    "highestAverage", "lowestAverage",
]

r11_pipelines = st.fixed_dictionaries(
    {
        "t0_day": st.integers(1, 22),
        "span_days": st.integers(2, 8),
        "every": st.sampled_from(sorted(EVERY_SECONDS)),
        "hours": st.tuples(st.integers(0, 23), st.integers(0, 23)),
        "stage": st.one_of(
            st.none(),
            st.tuples(st.sampled_from(_SELECTOR_NAMES), st.integers(1, 4)),
        ),
    }
)


def _r11_oracle_sql(t0, t1, every: str, hours: tuple, stage) -> str:
    sec = EVERY_SECONDS[every]
    h0, h1 = hours
    hour_pred = (
        f"hour(ts) BETWEEN {h0} AND {h1}"
        if h0 <= h1
        else f"(hour(ts) >= {h0} OR hour(ts) <= {h1})"
    )
    agg = f"""
        SELECT time_bucket(INTERVAL '{sec} seconds', ts)
               + INTERVAL '{sec} seconds' AS ts,
               event_type, CAST(count(value) AS BIGINT) AS value
        FROM events
        WHERE ts >= TIMESTAMP '{t0}' AND ts < TIMESTAMP '{t1}'
              AND {hour_pred}
        GROUP BY 1, 2
    """
    if stage is None:
        return agg
    name, n = stage
    direction = "ASC" if name.startswith("lowest") else "DESC"
    if name in ("highestAverage", "lowestAverage"):
        return f"""
            WITH agg AS ({agg})
            SELECT event_type,
                   CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                   / count(value) AS value
            FROM agg GROUP BY event_type
            ORDER BY value {direction}, event_type LIMIT {n}
        """
    reduce_order = (
        "ts DESC"
        if name in ("highestCurrent", "lowestCurrent")
        else f"value {direction}, ts"
    )
    return f"""
        WITH agg AS ({agg}), m AS (
            SELECT ts, event_type, value FROM agg
            QUALIFY row_number() OVER (
                PARTITION BY event_type ORDER BY {reduce_order}) = 1
        )
        SELECT ts, event_type, value FROM m
        ORDER BY value {direction}, event_type LIMIT {n}
    """


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(p=r11_pipelines)
def test_hour_selection_and_selectors_match_duckdb(spark, duck, p):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.query.builder import QueryBuilder

    t0 = datetime(2024, 1, p["t0_day"])
    t1 = t0 + timedelta(days=p["span_days"])
    qb = (
        QueryBuilder(
            load_table(spark, "/root/testdata/sf0.001", "events"),
            ts_col="ts",
            value_col="value",
            series_cols=("event_type",),
        )
        .range(t0, t1)
        .hour_selection(*p["hours"])
        .aggregate_window(p["every"], "count")
    )
    if p["stage"] is not None:
        name, n = p["stage"]
        qb = qb.transform(name, n=n)
    got = _norm([tuple(r) for r in qb.to_df().collect()], None)
    want = _norm(
        duck.execute(
            _r11_oracle_sql(t0, t1, p["every"], p["hours"], p["stage"])
        ).fetchall(),
        None,
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            gv = gv.replace(tzinfo=None) if isinstance(gv, datetime) else gv
            wv = wv.replace(tzinfo=None) if isinstance(wv, datetime) else wv
            if isinstance(gv, float) and isinstance(wv, float):
                assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert gv == wv
