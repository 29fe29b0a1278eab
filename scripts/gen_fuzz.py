#!/usr/bin/env python3
"""Randomized differential-test generator: emits N seeded, PORTABLE ANSI
SQL queries over the TPC-H-ish tables that both this engine (spark.sql)
and DuckDB must answer identically. A correctness layer BEYOND the
curated oracle suite: the curated queries pin the operators we designed
for; the fuzz corpus walks the combinatorial space of predicates,
aggregates, group-bys and joins where untested interactions hide.

Portability rules (the repo's oracle-parity discipline, mechanized):
- integer-only arithmetic on outputs: doubles enter only via
  CAST(ROUND(x * 100) AS BIGINT) cents; no division at all
- aggregates: COUNT(*) / COUNT(col) / COUNT(DISTINCT col) / SUM / MIN /
  MAX over BIGINTs (CAST everywhere — Spark sums ints to BIGINT, DuckDB
  to HUGEINT; the explicit CAST pins both)
- no ORDER BY / LIMIT: the comparator sorts rows itself, and default
  NULL-ordering differs between engines
- string ops: ||, UPPER, SUBSTR(s, i, n), LENGTH — identical semantics
- date ops: comparisons against DATE literals + EXTRACT(YEAR/MONTH) as
  BIGINT outputs — never raw dates in the result
- every non-aggregate output column appears in GROUP BY

Usage: gen_fuzz.py <n> <seed> > queries.sql   (one query per line)
"""
import random
import sys

TABLES = {
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "cents": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "strs": ["l_returnflag", "l_linestatus"],
        "dates": ["l_shipdate"],
    },
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "cents": ["o_totalprice"],
        "strs": ["o_orderstatus", "o_orderpriority"],
        "dates": ["o_orderdate"],
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "cents": ["c_acctbal"],
        "strs": ["c_name", "c_mktsegment"],
        "dates": [],
    },
    # the LLM-pipeline tables: long text + ns-timestamps (FuzzRun loads
    # events through graft.Tables.load's ns→µs conversion; the DuckDB
    # side reads TIMESTAMP_NS natively — identical at EXTRACT/date-cmp
    # granularity)
    "documents": {
        "ints": ["doc_id", "n_chars"],
        "cents": [],
        "strs": ["lang", "source", "text"],
        "dates": [],
    },
    "events": {
        "ints": ["event_id", "user_id"],
        "cents": ["value"],
        "strs": ["event_type", "props"],
        "dates": ["ts"],
    },
}
JOINS = [("lineitem", "orders", "l_orderkey", "o_orderkey"),
         ("orders", "customer", "o_custkey", "c_custkey")]
STR_VALUES = {
    "l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
    "c_name": [], "l_shipmode": [],
    "event_type": ["click", "signup", "error", "view", "purchase"],
    "lang": ["en", "de", "zh", "fr", "es"],
    "source": [f"src{i}" for i in range(20)],
    "text": [], "props": [],
}


def cents(c):
    return f"CAST(ROUND({c} * 100) AS BIGINT)"


def int_expr(rnd, t):
    kind = rnd.choice(["col", "col", "cents", "arith", "case", "strlen", "year",
                       "mod", "abs", "least"])
    if kind == "col":
        return f"CAST({rnd.choice(t['ints'])} AS BIGINT)"
    if kind == "cents" and t["cents"]:
        return cents(rnd.choice(t["cents"]))
    if kind == "arith":
        a, b = rnd.choice(t["ints"]), rnd.choice(t["ints"])
        op = rnd.choice(["+", "-", "*"])
        return f"(CAST({a} AS BIGINT) {op} CAST({b} AS BIGINT))"
    if kind == "mod":
        # both engines use C semantics (sign of the dividend) for %
        return f"(CAST({rnd.choice(t['ints'])} AS BIGINT) % {rnd.randint(2, 97)})"
    if kind == "abs":
        a, b = rnd.choice(t["ints"]), rnd.choice(t["ints"])
        return f"ABS(CAST({a} AS BIGINT) - CAST({b} AS BIGINT))"
    if kind == "least":
        fn = rnd.choice(["LEAST", "GREATEST"])
        a, b = rnd.choice(t["ints"]), rnd.choice(t["ints"])
        return f"{fn}(CAST({a} AS BIGINT), CAST({b} AS BIGINT), {rnd.randint(0, 500)})"
    if kind == "case":
        c = rnd.choice(t["ints"])
        n = rnd.randint(1, 50)
        return f"(CASE WHEN {c} > {n} THEN CAST({c} AS BIGINT) ELSE CAST({n} AS BIGINT) END)"
    if kind == "strlen":
        return f"CAST(LENGTH({rnd.choice(t['strs'])}) AS BIGINT)"
    if kind == "year" and t["dates"]:
        return f"CAST(EXTRACT(YEAR FROM {rnd.choice(t['dates'])}) AS BIGINT)"
    return f"CAST({rnd.choice(t['ints'])} AS BIGINT)"


def pred(rnd, t):
    kind = rnd.choice(["numcmp", "strcmp", "in", "between", "like", "date", "null", "and", "or", "not"])
    if kind == "numcmp":
        op = rnd.choice(["<", "<=", ">", ">=", "=", "<>"])
        if rnd.random() < 0.5 or not t["cents"]:
            return f"{rnd.choice(t['ints'])} {op} {rnd.randint(0, 2000)}"
        return f"{cents(rnd.choice(t['cents']))} {op} {rnd.randint(0, 500000)}"
    if kind == "strcmp":
        c = rnd.choice(t["strs"])
        vals = STR_VALUES.get(c) or None
        v = rnd.choice(vals) if vals else "x"
        return f"{c} {rnd.choice(['=', '<>', '<', '>'])} '{v}'"
    if kind == "in":
        c = rnd.choice(t["ints"])
        vals = ", ".join(str(rnd.randint(0, 500)) for _ in range(rnd.randint(2, 5)))
        return f"{c} IN ({vals})"
    if kind == "between":
        c = rnd.choice(t["ints"])
        lo = rnd.randint(0, 400)
        return f"{c} BETWEEN {lo} AND {lo + rnd.randint(0, 300)}"
    if kind == "like":
        c = rnd.choice(t["strs"])
        return f"{c} LIKE '{rnd.choice('ABCMNOFR')}%'"
    if kind == "date" and t["dates"]:
        c = rnd.choice(t["dates"])
        d = f"199{rnd.randint(2, 8)}-{rnd.randint(1, 12):02d}-{rnd.randint(1, 28):02d}"
        return f"{c} {rnd.choice(['<', '>=', '<='])} DATE '{d}'"
    if kind == "null":
        c = rnd.choice(t["ints"] + t["strs"])
        return f"{c} IS {'NOT ' if rnd.random() < 0.5 else ''}NULL"
    if kind == "and":
        return f"({pred(rnd, t)} AND {pred(rnd, t)})"
    if kind == "or":
        return f"({pred(rnd, t)} OR {pred(rnd, t)})"
    if kind == "not":
        return f"(NOT {pred(rnd, t)})"
    return "1 = 1"


def agg(rnd, t):
    kind = rnd.choice(["count", "countc", "countd", "sum", "min", "max", "sumcase"])
    if kind == "count":
        return "CAST(COUNT(*) AS BIGINT)"
    if kind == "countc":
        return f"CAST(COUNT({rnd.choice(t['ints'] + t['strs'])}) AS BIGINT)"
    if kind == "countd":
        return f"CAST(COUNT(DISTINCT {rnd.choice(t['ints'] + t['strs'])}) AS BIGINT)"
    if kind == "sum":
        return f"CAST(SUM({int_expr(rnd, t)}) AS BIGINT)"
    if kind == "min":
        return f"CAST(MIN({int_expr(rnd, t)}) AS BIGINT)"
    if kind == "max":
        return f"CAST(MAX({int_expr(rnd, t)}) AS BIGINT)"
    return f"CAST(SUM(CASE WHEN {pred(rnd, t)} THEN 1 ELSE 0 END) AS BIGINT)"


def group_expr(rnd, t):
    kind = rnd.choice(["str", "str", "int", "substr", "year", "case"])
    if kind == "str":
        return rnd.choice(t["strs"])
    if kind == "int":
        return f"CAST({rnd.choice(t['ints'])} AS BIGINT)"
    if kind == "substr":
        return f"SUBSTR({rnd.choice(t['strs'])}, 1, {rnd.randint(1, 3)})"
    if kind == "year" and t["dates"]:
        return f"CAST(EXTRACT(YEAR FROM {rnd.choice(t['dates'])}) AS BIGINT)"
    if kind == "case":
        c = rnd.choice(t["ints"])
        return f"(CASE WHEN {c} > {rnd.randint(1, 100)} THEN 'hi' ELSE 'lo' END)"
    return rnd.choice(t["strs"])


def merged(ta, tb):
    return {k: TABLES[ta][k] + TABLES[tb][k] for k in ("ints", "cents", "strs", "dates")}


# STRICT total order per table (verified against the data: o_orderkey /
# c_custkey are unique; lineitem has no full-row duplicates, and
# (orderkey, linenumber) pairs DO repeat — an earlier key formula tied
# there and produced a legitimate cross-engine LAG divergence)
TOTAL_ORDER = {
    "lineitem": ("l_orderkey, l_linenumber, l_partkey, l_suppkey, "
                 "CAST(ROUND(l_extendedprice * 100) AS BIGINT), "
                 "CAST(ROUND(l_quantity * 100) AS BIGINT), "
                 "CAST(ROUND(l_discount * 100) AS BIGINT), "
                 "CAST(ROUND(l_tax * 100) AS BIGINT), "
                 "l_returnflag, l_linestatus, l_shipdate"),
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "documents": "doc_id",
    "events": "event_id",
}
OUT_KEY = {"lineitem": "l_orderkey", "orders": "o_orderkey", "customer": "c_custkey",
           "documents": "doc_id", "events": "event_id"}


def scalar_str(rnd, t):
    c = rnd.choice(t["strs"])
    kind = rnd.choice(["upper", "lower", "concat", "replace", "substr", "trim",
                       "coalesce", "lpad", "reverse", "position"])
    if kind == "upper":
        return f"UPPER({c})"
    if kind == "lower":
        return f"LOWER({c})"
    if kind == "concat":
        return f"({c} || '_' || {rnd.choice(t['strs'])})"
    if kind == "replace":
        return f"REPLACE({c}, '{rnd.choice('AEO')}', '{rnd.choice('xyz')}')"
    if kind == "substr":
        return f"SUBSTR({c}, {rnd.randint(1, 2)}, {rnd.randint(1, 4)})"
    if kind == "trim":
        return f"TRIM({c})"
    if kind == "lpad":
        fn = rnd.choice(["LPAD", "RPAD"])
        return f"{fn}(SUBSTR({c}, 1, 4), {rnd.randint(2, 6)}, '{rnd.choice('._*')}')"
    if kind == "reverse":
        return f"REVERSE(SUBSTR({c}, 1, {rnd.randint(2, 5)}))"
    if kind == "position":
        # POSITION returns an integer — stringify so group keys stay text
        return f"CAST(POSITION('{rnd.choice('AEONR')}' IN {c}) AS VARCHAR(8))"
    return f"COALESCE(NULLIF({c}, '{rnd.choice('ANR')}'), 'd')"


def gen_query(rnd):
    shape = rnd.choice(["agg", "agg", "agg", "joinagg", "grand", "setop", "insub",
                        "distinct", "window", "scalar", "outerjoin",
                        "groupingsets", "exists", "casagg",
                        "scalarsub", "cte", "topk",
                        "aggjoin", "selfjoin", "nullkeys", "filteragg",
                        "windowframe"])
    if shape == "windowframe":
        # explicit ROWS frames (n PRECEDING .. m FOLLOWING) + LEAD and
        # FIRST/LAST_VALUE over a strict total order — frame-boundary
        # semantics the UNBOUNDED-PRECEDING window family never touches
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        key = TOTAL_ORDER[name]
        out = OUT_KEY[name]
        part = rnd.choice(t["strs"])
        val = f"CAST({rnd.choice(t['ints'])} AS BIGINT)"
        lo = rnd.randint(0, 5)
        hi = rnd.randint(0, 5)
        frame = rnd.choice([
            f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
            f"ROWS BETWEEN CURRENT ROW AND {hi} FOLLOWING",
        ])
        over = f"(PARTITION BY {part} ORDER BY {key} {frame})"
        fn = rnd.choice([
            f"CAST(SUM({val}) OVER {over} AS BIGINT)",
            f"CAST(COUNT(*) OVER {over} AS BIGINT)",
            f"CAST(MIN({val}) OVER {over} AS BIGINT)",
            f"CAST(FIRST_VALUE({val}) OVER {over} AS BIGINT)",
            f"CAST(LAST_VALUE({val}) OVER {over} AS BIGINT)",
            f"CAST(LEAD({val}, {rnd.randint(1, 3)}, -7) OVER "
            f"(PARTITION BY {part} ORDER BY {key}) AS BIGINT)",
        ])
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.7 else ""
        # reduce the window column to per-key aggregates so output stays
        # small and deterministic regardless of row count
        return (f"SELECT CAST(SUM(a0) AS BIGINT) AS s, CAST(MIN(a0) AS BIGINT) AS mn, "
                f"CAST(MAX(a0) AS BIGINT) AS mx, CAST(COUNT(*) AS BIGINT) AS n FROM "
                f"(SELECT CAST({out} AS BIGINT) AS g0, {fn} AS a0 FROM {name}{w}) x")
    if shape == "aggjoin":
        # JOIN of two independently-grouped subqueries on the group key —
        # partial aggregation under a join, join reordering over derived
        # tables, and outer-extended aggregate rows
        ta, tb, ka, kb = rnd.choice(JOINS)
        t, ts = TABLES[ta], TABLES[tb]
        jt = rnd.choice(["JOIN", "JOIN", "LEFT JOIN"])
        wa = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.6 else ""
        wb = f" WHERE {pred(rnd, ts)}" if rnd.random() < 0.6 else ""
        return (f"SELECT CAST(x.k AS BIGINT) AS g0, x.n AS a0, "
                f"CAST(COALESCE(y.m, -1) AS BIGINT) AS a1 FROM "
                f"(SELECT {ka} AS k, {agg(rnd, t)} AS n FROM {ta}{wa} GROUP BY 1) x "
                f"{jt} "
                f"(SELECT {kb} AS k, {agg(rnd, ts)} AS m FROM {tb}{wb} GROUP BY 1) y "
                f"ON x.k = y.k")
    if shape == "selfjoin":
        # bounded non-equi self-join: equality on the key bounds the blow-up,
        # the strict inequality exercises the non-equi join condition path
        t = TABLES["lineitem"]
        # qualify the side predicate's columns (both sides carry every name)
        qt = {k: [f"a.{c}" for c in v] for k, v in t.items()}
        w = f" AND {pred(rnd, qt)}" if rnd.random() < 0.6 else ""
        op = rnd.choice(["<", "<=", "<>"])
        m = rnd.choice(["a.l_partkey", "b.l_suppkey",
                        "(CAST(a.l_linenumber AS BIGINT) * CAST(b.l_linenumber AS BIGINT))"])
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS a0, "
                f"CAST(SUM(CAST({m} AS BIGINT)) AS BIGINT) AS a1 "
                f"FROM lineitem a JOIN lineitem b "
                f"ON a.l_orderkey = b.l_orderkey AND a.l_linenumber {op} b.l_linenumber{w}")
    if shape == "nullkeys":
        # NULLIF-manufactured NULL group keys: both engines must put the
        # null group in ONE bucket, and null-sensitive aggregates must
        # agree on it (COUNT(col) skips nulls, SUM of all-null is NULL)
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        sc = rnd.choice(t["strs"])
        vals = STR_VALUES.get(sc) or ["x"]
        v = rnd.choice(vals) if vals else "x"
        ic = rnd.choice(t["ints"])
        g = f"NULLIF({sc}, '{v}')"
        nullable_int = f"(CASE WHEN {pred(rnd, t)} THEN CAST({ic} AS BIGINT) END)"
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.5 else ""
        return (f"SELECT g0, CAST(COUNT(*) AS BIGINT) AS a0, "
                f"CAST(COUNT(v) AS BIGINT) AS a1, "
                f"CAST(SUM(v) AS BIGINT) AS a2, "
                f"CAST(COUNT(DISTINCT v) AS BIGINT) AS a3 FROM "
                f"(SELECT {g} AS g0, {nullable_int} AS v FROM {name}{w}) x GROUP BY 1")
    if shape == "filteragg":
        # ANSI FILTER clause on aggregates (both engines support it):
        # per-aggregate predicates independent of WHERE/GROUP BY
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        p1, p2 = pred(rnd, t), pred(rnd, t)
        aggs = [
            f"CAST(COUNT(*) FILTER (WHERE {p1}) AS BIGINT) AS a0",
            f"CAST(SUM({int_expr(rnd, t)}) FILTER (WHERE {p2}) AS BIGINT) AS a1",
            f"CAST(MIN({int_expr(rnd, t)}) FILTER (WHERE {p1}) AS BIGINT) AS a2",
            f"CAST(COUNT(DISTINCT {rnd.choice(t['ints'] + t['strs'])}) "
            f"FILTER (WHERE {p2}) AS BIGINT) AS a3",
        ]
        g = group_expr(rnd, t)
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.5 else ""
        return f"SELECT {g} AS g0, {', '.join(aggs)} FROM {name}{w} GROUP BY 1"
    if shape == "scalarsub":
        # correlated scalar subquery in the SELECT list — the
        # decorrelate-to-left-outer-join rewrite, including the classic
        # COUNT-on-empty-group case (must be 0, not NULL) and the
        # SUM-on-empty case (must be NULL, pinned via COALESCE)
        ta, tb, ka, kb = rnd.choice(JOINS)
        t, ts = TABLES[ta], TABLES[tb]
        inner_pred = f" AND {pred(rnd, ts)}" if rnd.random() < 0.7 else ""
        kind = rnd.choice(["count", "sum", "min"])
        if kind == "count":
            sub = (f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {tb} "
                   f"WHERE {tb}.{kb} = {ta}.{ka}{inner_pred})")
        elif kind == "sum":
            sub = (f"COALESCE((SELECT CAST(SUM(CAST({rnd.choice(ts['ints'])} AS BIGINT)) "
                   f"AS BIGINT) FROM {tb} "
                   f"WHERE {tb}.{kb} = {ta}.{ka}{inner_pred}), -1)")
        else:
            sub = (f"COALESCE((SELECT CAST(MIN(CAST({rnd.choice(ts['ints'])} AS BIGINT)) "
                   f"AS BIGINT) FROM {tb} "
                   f"WHERE {tb}.{kb} = {ta}.{ka}{inner_pred}), -1)")
        g = group_expr(rnd, t)
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.6 else ""
        return (f"SELECT g0, CAST(SUM(sub) AS BIGINT) AS a0, "
                f"CAST(COUNT(*) AS BIGINT) AS a1, "
                f"CAST(MAX(sub) AS BIGINT) AS a2 FROM "
                f"(SELECT {g} AS g0, {sub} AS sub FROM {ta}{w}) x GROUP BY 1")
    if shape == "cte":
        # one CTE referenced TWICE — pins CTE dedup/materialization
        # (Spark inlines, DuckDB may materialize; results must agree)
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        g = group_expr(rnd, t)
        a = agg(rnd, t)
        cte = (f"WITH c AS (SELECT {g} AS g0, {a} AS n, "
               f"CAST(COUNT(*) AS BIGINT) AS cnt FROM {name}"
               f"{' WHERE ' + pred(rnd, t) if rnd.random() < 0.7 else ''} GROUP BY 1)")
        if rnd.random() < 0.5:
            # self-join on the group key (NULL keys drop on both engines)
            return (f"{cte} SELECT a.g0 AS g0, a.n AS a0, b.cnt AS a1 "
                    f"FROM c a JOIN c b ON a.g0 = b.g0")
        # second reference as a grand-total cross join
        return (f"{cte} SELECT c.g0 AS g0, c.n AS a0, tot.s AS a1 FROM c "
                f"CROSS JOIN (SELECT CAST(SUM(cnt) AS BIGINT) AS s FROM c) tot")
    if shape == "topk":
        # ORDER BY <strict total order> LIMIT/OFFSET in a subquery, then
        # aggregate — pins TakeOrdered/limit pushdown determinism
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        key = TOTAL_ORDER[name]
        out = OUT_KEY[name]
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.7 else ""
        lim = rnd.randint(1, 200)
        off = f" OFFSET {rnd.randint(1, 50)}" if rnd.random() < 0.4 else ""
        return (f"SELECT CAST(SUM(k) AS BIGINT) AS a0, "
                f"CAST(COUNT(*) AS BIGINT) AS a1, CAST(MAX(k) AS BIGINT) AS a2 FROM "
                f"(SELECT CAST({out} AS BIGINT) AS k FROM {name}{w} "
                f"ORDER BY {key} LIMIT {lim}{off}) x")
    if shape == "groupingsets":
        # ROLLUP / CUBE / GROUPING SETS: the Expand path, with per-column
        # GROUPING() flags disambiguating rollup-nulls from data-nulls.
        # FOUND DIVERGENCE (pinned by the mandatory HAVING): on an EMPTY
        # input the standard (and DuckDB) still emit the grand-total row
        # for the () grouping set, while Spark's Expand-based aggregate
        # emits nothing; HAVING COUNT(*) > 0 drops that row on both
        # engines without touching any non-empty group (every real group
        # has >= 1 row by construction)
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        gs, seen = [], set()
        for _ in range(rnd.randint(2, 3)):
            e = group_expr(rnd, t)
            if e not in seen:
                seen.add(e)
                gs.append(e)
        if len(gs) < 2:
            gs.append(f"CAST({rnd.choice(t['ints'])} AS BIGINT)")
        sel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(gs))
        gids = ", ".join(f"CAST(GROUPING({g}) AS BIGINT) AS gid{i}"
                         for i, g in enumerate(gs))
        kind = rnd.choice(["ROLLUP", "CUBE", "SETS"])
        if kind == "SETS":
            sets = f"GROUPING SETS (({', '.join(gs)}), ({gs[0]}), ())"
        else:
            sets = f"{kind}({', '.join(gs)})"
        aggs = ", ".join(f"{agg(rnd, t)} AS a{i}" for i in range(rnd.randint(1, 2)))
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.7 else ""
        having = f" HAVING COUNT(*) > {rnd.randint(0, 3)}"
        return f"SELECT {sel}, {gids}, {aggs} FROM {name}{w} GROUP BY {sets}{having}"
    if shape == "exists":
        # correlated [NOT] EXISTS — the decorrelation path IN (subquery)
        # doesn't reach (no equi-rewrite of the correlated predicate)
        ta, tb, ka, kb = rnd.choice(JOINS)
        t, ts = TABLES[ta], TABLES[tb]
        neg = "NOT " if rnd.random() < 0.5 else ""
        g = group_expr(rnd, t)
        w = f" AND {pred(rnd, t)}" if rnd.random() < 0.6 else ""
        extra = f" AND {pred(rnd, ts)}" if rnd.random() < 0.8 else ""
        return (f"SELECT {g} AS g0, CAST(COUNT(*) AS BIGINT) AS a0 FROM {ta} "
                f"WHERE {neg}EXISTS (SELECT 1 FROM {tb} "
                f"WHERE {tb}.{kb} = {ta}.{ka}{extra}){w} GROUP BY 1")
    if shape == "casagg":
        # CASE inside aggregates: NULL-else SUM (all-miss groups sum to
        # NULL), COUNT(CASE) counting only matches, COUNT(DISTINCT CASE),
        # MIN/MAX over CASE, and a conditional-SUM HAVING
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        p1, p2 = pred(rnd, t), pred(rnd, t)
        x, y = int_expr(rnd, t), int_expr(rnd, t)
        c = rnd.choice(t["ints"] + t["strs"])
        aggs = [
            f"CAST(SUM(CASE WHEN {p1} THEN {x} WHEN {p2} THEN {y} END) AS BIGINT) AS a0",
            f"CAST(COUNT(CASE WHEN {p2} THEN {c} END) AS BIGINT) AS a1",
            f"CAST(COUNT(DISTINCT CASE WHEN {p1} THEN {c} END) AS BIGINT) AS a2",
            f"CAST({rnd.choice(['MIN', 'MAX'])}(CASE WHEN {p1} THEN {x} END) AS BIGINT) AS a3",
        ]
        g = group_expr(rnd, t)
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.5 else ""
        having = (f" HAVING CAST(SUM(CASE WHEN {p2} THEN 1 ELSE 0 END) AS BIGINT)"
                  f" >= {rnd.randint(0, 3)}" if rnd.random() < 0.4 else "")
        return f"SELECT {g} AS g0, {', '.join(aggs)} FROM {name}{w} GROUP BY 1{having}"
    if shape == "outerjoin":
        # LEFT / FULL joins: null-extended rows are where COUNT(col) vs
        # COUNT(*) and COALESCE semantics classically diverge
        ta, tb, ka, kb = rnd.choice(JOINS)
        t, ts = TABLES[ta], TABLES[tb]
        jt = rnd.choice(["LEFT", "LEFT", "FULL"])
        g = group_expr(rnd, t)
        bcol = rnd.choice(ts["ints"])
        w = f" WHERE {pred(rnd, t)}" if jt == "LEFT" and rnd.random() < 0.5 else ""
        sub = f"(SELECT * FROM {tb} WHERE {pred(rnd, ts)}) s"
        return (f"SELECT {g} AS g0, CAST(COUNT(*) AS BIGINT) AS a0, "
                f"CAST(COUNT(s.{bcol}) AS BIGINT) AS a1, "
                f"CAST(SUM(COALESCE(CAST(s.{bcol} AS BIGINT), -1)) AS BIGINT) AS a2 "
                f"FROM {ta} {jt} JOIN {sub} ON {ka} = s.{kb}{w} GROUP BY 1")
    if shape == "window":
        # ranking / running totals over a STRICT total order —
        # cross-engine frames, ties, and partition semantics
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        key = TOTAL_ORDER[name]
        out = OUT_KEY[name]
        part = rnd.choice(t["strs"])
        fn = rnd.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()",
                         f"CAST(SUM(CAST({rnd.choice(t['ints'])} AS BIGINT)) OVER "
                         f"(PARTITION BY {part} ORDER BY {key} "
                         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
                         f"CAST(LAG(CAST({rnd.choice(t['ints'])} AS BIGINT), 1, -1) OVER "
                         f"(PARTITION BY {part} ORDER BY {key}) AS BIGINT)"])
        if fn in ("ROW_NUMBER()", "RANK()", "DENSE_RANK()"):
            ordcol = rnd.choice(t["ints"])
            fn = f"CAST({fn[:-2]}() OVER (PARTITION BY {part} ORDER BY {ordcol}, {key}) AS BIGINT)"
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.7 else ""
        return (f"SELECT * FROM (SELECT CAST({out} AS BIGINT) AS g0, {fn} AS a0 "
                f"FROM {name}{w}) x WHERE a0 <= {rnd.randint(2, 40)}")
    if shape == "scalar":
        # scalar string pipeline, grouped — portability of the function
        # library itself (UPPER/REPLACE/SUBSTR/TRIM/COALESCE/NULLIF/||)
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        gs = [scalar_str(rnd, t) for _ in range(rnd.randint(1, 2))]
        sel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(gs))
        w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.7 else ""
        return (f"SELECT {sel}, CAST(COUNT(*) AS BIGINT) AS a0 FROM {name}{w} "
                f"GROUP BY {', '.join(str(i + 1) for i in range(len(gs)))}")
    if shape == "setop":
        # UNION / UNION ALL / INTERSECT / EXCEPT of two compatible branches
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        g = group_expr(rnd, t)
        op = rnd.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        return (f"SELECT * FROM (SELECT {g} AS g0 FROM {name} WHERE {pred(rnd, t)} "
                f"{op} SELECT {g} AS g0 FROM {name} WHERE {pred(rnd, t)}) u")
    if shape == "insub":
        # semi/anti join via [NOT] IN (subquery) — the decorrelation path
        ta, tb, ka, kb = rnd.choice(JOINS)
        t, ts = TABLES[ta], TABLES[tb]
        neg = "NOT " if rnd.random() < 0.5 else ""
        w = f" AND {pred(rnd, t)}" if rnd.random() < 0.6 else ""
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS a0, "
                f"CAST(COUNT(DISTINCT {rnd.choice(t['ints'])}) AS BIGINT) AS a1 "
                f"FROM {ta} WHERE {ka} {neg}IN "
                f"(SELECT {kb} FROM {tb} WHERE {pred(rnd, ts)}){w}")
    if shape == "distinct":
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        gs = [group_expr(rnd, t) for _ in range(rnd.randint(1, 3))]
        sel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(gs))
        return f"SELECT DISTINCT {sel} FROM {name} WHERE {pred(rnd, t)}"
    if shape == "joinagg":
        ta, tb, ka, kb = rnd.choice(JOINS)
        t = merged(ta, tb)
        frm = f"{ta} JOIN {tb} ON {ka} = {kb}"
    else:
        name = rnd.choice(list(TABLES))
        t = TABLES[name]
        frm = name
    w = f" WHERE {pred(rnd, t)}" if rnd.random() < 0.8 else ""
    if shape == "grand":
        aggs = ", ".join(f"{agg(rnd, t)} AS a{i}" for i in range(rnd.randint(1, 4)))
        return f"SELECT {aggs} FROM {frm}{w}"
    ngroups = rnd.randint(1, 2)
    groups = [group_expr(rnd, t) for _ in range(ngroups)]
    gsel = ", ".join(f"{g} AS g{i}" for i, g in enumerate(groups))
    aggs = ", ".join(f"{agg(rnd, t)} AS a{i}" for i in range(rnd.randint(1, 3)))
    having = f" HAVING COUNT(*) > {rnd.randint(0, 5)}" if rnd.random() < 0.3 else ""
    return (f"SELECT {gsel}, {aggs} FROM {frm}{w} "
            f"GROUP BY {', '.join(str(i + 1) for i in range(ngroups))}{having}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    rnd = random.Random(seed)
    for _ in range(n):
        print(gen_query(rnd))


if __name__ == "__main__":
    main()
