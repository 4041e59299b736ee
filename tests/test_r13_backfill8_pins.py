"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 8: the remaining TPC-H shapes (q3 top-k revenue, q5 local-supplier
star, q7 bidirectional nation pairs, q9 profit proxy, q10 returned items,
q11 global-threshold HAVING, q13 zero-order distribution, q20 agg-over-agg
dominance), the NOT-EXISTS merge anti-join, the ordered catalog scan, and
the two trivially-oracled streaming shapes. Plants: a supplier at 13.3%
of a part (under q20's 15% fence) while the same supplier dominates
another part, a customer whose only order is '5-LOW' (q13 ON-filter ->
count 0, distinct from the no-orders customer), cross-nation lines q5's
local-supplier equi-condition must drop, and a returned line shipped
in 1998 that q3 keeps but q10's 1996 order window also claims."""

import math
from datetime import date
from fractions import Fraction as Fr

import duckdb

REGION = [(0, "AMERICA"), (1, "EUROPE"), (2, "ASIA")]
NATION = [(0, "NATION_0", 0), (1, "NATION_1", 2), (2, "NATION_2", 2),
          (3, "NATION_3", 1)]
SUPPLIER = [(1, "Supp1", 1), (2, "Supp2", 2), (3, "Supp3", 0)]
CUSTOMER = [  # (ckey, name, mktsegment, acctbal, nationkey)
    (1, "Cust1", "BUILDING", "500.25", 1),
    (2, "Cust2", "AUTO", "100.50", 2),
    (3, "Cust3", "BUILDING", "800.75", 2),
    (4, "Cust4", "MACHINE", "-50.00", 0),
]
PART = [  # (pkey, name, brand, type, size, retailprice)
    (1, "dark red widget", "Brand#11", "PROMO", 5, "10.00"),
    (2, "blue gadget", "Brand#22", "ECONOMY", 20, "5.25"),
    (3, "red shiny gear", "Brand#15", "STANDARD", 30, "2.50"),
]
ORDERS = [  # (okey, ckey, odate, priority, status)
    (1, 1, date(1996, 3, 1), "1-URGENT", "F"),
    (2, 2, date(1997, 5, 1), "3-MEDIUM", "O"),
    (3, 3, date(1996, 7, 1), "5-LOW", "F"),
    (4, 1, date(1997, 8, 1), "2-HIGH", "F"),
]
LINEITEM = [  # (okey, pkey, skey, qty, price, disc, returnflag, shipdate)
    (1, 1, 2, 10, "100.25", "0.05", "R", date(1998, 2, 1)),
    (2, 2, 1, 30, "500.50", "0.10", "N", date(1997, 6, 1)),
    (3, 3, 2, 5, "200.75", "0.06", "A", date(1996, 8, 1)),
    (4, 1, 1, 200, "999.00", "0.00", "N", date(1997, 9, 1)),
    (2, 3, 2, 60, "300.25", "0.07", "R", date(1997, 7, 1)),
    (1, 2, 2, 20, "120.00", "0.03", "R", date(1997, 12, 1)),
    (3, 2, 3, 100, "50.00", "0.02", "N", date(1996, 9, 1)),
]

NAT_NAME = {k: n for k, n, _ in NATION}
NAT_REGION = {k: r for k, _, r in NATION}
REGION_NAME = dict(REGION)
SUPP_NAT = {k: nk for k, _, nk in SUPPLIER}
SUPP_NAME = {k: n for k, n, _ in SUPPLIER}
CUST = {c[0]: c for c in CUSTOMER}
OMAP = {o[0]: o for o in ORDERS}
PMAP = {p[0]: p for p in PART}


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _rev(price: str, disc: str) -> Fr:
    return Fr(price) * (1 - Fr(disc))


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE region AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{n}')" for k, n in REGION)
                + ") AS v(r_regionkey, r_name)")
    con.execute("CREATE TABLE nation AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{n}', {r})" for k, n, r in NATION)
                + ") AS v(n_nationkey, n_name, n_regionkey)")
    con.execute("CREATE TABLE supplier AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{n}', {nk})" for k, n, nk in SUPPLIER)
                + ") AS v(s_suppkey, s_name, s_nationkey)")
    con.execute("CREATE TABLE customer AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{n}', '{m}', {b}::DECIMAL(15,2), {nk})"
                            for k, n, m, b, nk in CUSTOMER)
                + ") AS v(c_custkey, c_name, c_mktsegment, c_acctbal,"
                  " c_nationkey)")
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"({k}, '{n}', '{b}', '{t}', {s}, {rp}::DECIMAL(15,2))"
                    for k, n, b, t, s, rp in PART)
                + ") AS v(p_partkey, p_name, p_brand, p_type, p_size,"
                  " p_retailprice)")
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"({ok}, {ck}, TIMESTAMP '{od} 00:00:00', '{pr}', '{st}')"
                    for ok, ck, od, pr, st in ORDERS)
                + ") AS v(o_orderkey, o_custkey, o_orderdate,"
                  " o_orderpriority, o_orderstatus)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"({ok}, {pk}, {sk}, {q}, {p}::DECIMAL(15,2), "
                    f"{dc}::DECIMAL(5,2), '{rf}', TIMESTAMP '{sd} 00:00:00')"
                    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM)
                + ") AS v(l_orderkey, l_partkey, l_suppkey, l_quantity,"
                  " l_extendedprice, l_discount, l_returnflag, l_shipdate)")
    return con


def test_q3_shipping_priority():
    from oaim_sandbox_spark.queries_relational import q3_shipping_priority

    got = _con().execute(q3_shipping_priority("duck")).fetchall()
    rev = {}
    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM:
        _, ck, od, _, _ = OMAP[ok]
        if (CUST[ck][2] == "BUILDING" and od < date(1998, 1, 1)
                and sd > date(1998, 1, 1)):
            rev[ok] = rev.get(ok, Fr(0)) + _rev(p, dc)
    exp = sorted(((ok, float(v)) for ok, v in rev.items()),
                 key=lambda r: (-r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:10]
    assert [r[0] for r in got] == [1]       # only the 1998-shipped line


def test_q5_local_supplier():
    from oaim_sandbox_spark.queries_relational import q5_local_supplier

    got = _con().execute(q5_local_supplier("duck")).fetchall()
    rev = {}
    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM:
        _, ck, od, _, _ = OMAP[ok]
        cn = CUST[ck][4]
        if (SUPP_NAT[sk] == cn
                and REGION_NAME[NAT_REGION[cn]] == "ASIA"
                and date(1996, 1, 1) <= od < date(1998, 1, 1)):
            rev[NAT_NAME[cn]] = rev.get(NAT_NAME[cn], Fr(0)) + _rev(p, dc)
    exp = {(n, float(v)) for n, v in rev.items()}
    assert {tuple(r) for r in got} == exp
    # cross-nation ASIA lines (supp nation != cust nation) are dropped:
    assert ("NATION_1", float(_rev("999.00", "0.00"))) in exp


def test_q7_nation_volume():
    from oaim_sandbox_spark.queries_training import q7_nation_volume

    got = _con().execute(q7_nation_volume("duck")).fetchall()
    agg = {}
    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM:
        _, ck, _, _, _ = OMAP[ok]
        sn, cn = NAT_NAME[SUPP_NAT[sk]], NAT_NAME[CUST[ck][4]]
        if {sn, cn} == {"NATION_1", "NATION_2"}:
            key = (sn, cn, sd.year)
            agg[key] = agg.get(key, Fr(0)) + _rev(p, dc)
    exp = sorted((sn, cn, y, float(v)) for (sn, cn, y), v in agg.items())
    assert [tuple(r) for r in got] == exp
    assert {(r[0], r[1]) for r in got} == {("NATION_1", "NATION_2"),
                                           ("NATION_2", "NATION_1")}


def test_q9_product_profit():
    from oaim_sandbox_spark.queries_relational import q9_product_profit

    got = _con().execute(q9_product_profit("duck")).fetchall()
    agg = {}
    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM:
        if "red" not in PMAP[pk][1]:
            continue
        od = OMAP[ok][2]
        amount = _rev(p, dc) - Fr(PMAP[pk][5]) * q
        key = (NAT_NAME[SUPP_NAT[sk]], od.year)
        agg[key] = agg.get(key, Fr(0)) + amount
    exp = sorted(((n, y, float(v)) for (n, y), v in agg.items()),
                 key=lambda r: (r[0], -r[1]))
    assert [tuple(r) for r in got] == exp
    assert {r[0] for r in got} <= {"NATION_1", "NATION_2"}  # %red% parts only


def test_q10_returned_items():
    from oaim_sandbox_spark.queries_training import q10_returned_items

    got = _con().execute(q10_returned_items("duck")).fetchall()
    agg = {}
    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM:
        _, ck, od, _, _ = OMAP[ok]
        if rf == "R" and date(1996, 1, 1) <= od < date(1997, 1, 1):
            key = (ck, CUST[ck][1], NAT_NAME[CUST[ck][4]])
            agg[key] = agg.get(key, Fr(0)) + _rev(p, dc)
    exp = sorted(((ck, nm, nn, float(v)) for (ck, nm, nn), v in agg.items()),
                 key=lambda r: (-r[3], r[0]))
    assert [tuple(r) for r in got] == exp[:20]
    assert [r[0] for r in got] == [1]       # 1997-order returns don't count


def test_q11_important_parts():
    from oaim_sandbox_spark.queries_relational import q11_important_parts

    got = _con().execute(q11_important_parts("duck")).fetchall()
    val = {}
    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM:
        val[pk] = val.get(pk, Fr(0)) + Fr(p) * q
    total = sum(val.values())
    exp = sorted(((pk, float(v)) for pk, v in val.items()
                  if float(v) > 0.0008 * float(total)),
                 key=lambda r: (-r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:100]


def test_q13_customer_distribution():
    from oaim_sandbox_spark.queries_relational import q13_customer_distribution

    got = _con().execute(q13_customer_distribution("duck")).fetchall()
    per_cust = {ck: 0 for ck, *_ in CUSTOMER}
    for ok, ck, od, pr, st in ORDERS:
        if pr != "5-LOW":
            per_cust[ck] += 1
    dist = {}
    for n in per_cust.values():
        dist[n] = dist.get(n, 0) + 1
    exp = sorted(((c, n) for c, n in dist.items()),
                 key=lambda r: (-r[1], -r[0]))
    assert [tuple(r) for r in got] == exp
    assert dict(map(tuple, got))[0] == 2    # no-orders cust4 AND 5-LOW-only cust3


def test_q20_dominant_suppliers():
    from oaim_sandbox_spark.queries_training import q20_dominant_suppliers

    got = _con().execute(q20_dominant_suppliers("duck")).fetchall()
    qty = {}
    for ok, pk, sk, q, *_ in LINEITEM:
        qty[(sk, pk)] = qty.get((sk, pk), Fr(0)) + q
    part_tot = {}
    for (sk, pk), v in qty.items():
        part_tot[pk] = part_tot.get(pk, Fr(0)) + v
    cnt = {}
    for (sk, pk), v in qty.items():
        if float(v) > 0.15 * float(part_tot[pk]):
            cnt[sk] = cnt.get(sk, 0) + 1
    exp = sorted(((sk, SUPP_NAME[sk], n) for sk, n in cnt.items()),
                 key=lambda r: (-r[2], r[0]))
    assert [tuple(r) for r in got] == exp
    by_supp = {r[0]: r[2] for r in got}
    assert by_supp[1] == 2                  # 20% of part 2 clears the fence
    assert by_supp.get(2, 0) == 1           # 13.3% of part 2 does NOT


def test_anti_join_merge():
    from oaim_sandbox_spark.queries_relational import anti_join_merge

    got = _con().execute(anti_join_merge("duck")).fetchall()
    open_cust = {ck for ok, ck, od, pr, st in ORDERS if st == "O"}
    exp = [(ck, nm, _r6(float(Fr(b)))) for ck, nm, _, b, _ in CUSTOMER
           if ck not in open_cust]
    assert [tuple(r) for r in got] == exp
    assert all(r[0] != 2 for r in got)      # the open-order customer drops
    assert any(r[0] == 4 for r in got)      # the orderless customer stays


def test_catalog_scan_events():
    from oaim_sandbox_spark.queries_relational import catalog_scan_events

    con = duckdb.connect()
    rows = [(1, 1, "error", 5_000_000, 1.5), (2, 2, "error", 5_000_000, 2.5),
            (3, 1, "click", 9_000_000, 0.5), (4, 3, "error", 1_000_000, 4.0)]
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
            f"CAST({val} AS DOUBLE), '{{}}')"
            for eid, uid, et, ts, val in rows)
        + ") AS v(event_id, ts, user_id, event_type, value, props)")
    got = con.execute(catalog_scan_events("duck")).fetchall()

    exp = sorted(((eid, ts, uid, _r6(val)) for eid, uid, et, ts, val in rows
                  if et == "error"), key=lambda r: (-r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:100]
    assert [r[0] for r in got][:2] == [1, 2]   # same-ts tie -> event_id ASC


def test_streaming_dedup_pairs_oracle():
    from oaim_sandbox_spark.queries_training import streaming_dedup_pairs

    con = duckdb.connect()
    rows = [(1, 1, "click", 1_000_000, 0.0), (2, 1, "click", 2_000_000, 0.0),
            (3, 1, "view", 3_000_000, 0.0), (4, 2, "click", 4_000_000, 0.0)]
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
            f"CAST({val} AS DOUBLE), '{{}}')"
            for eid, uid, et, ts, val in rows)
        + ") AS v(event_id, ts, user_id, event_type, value, props)")
    got = con.execute(streaming_dedup_pairs("duck")).fetchall()
    exp = sorted({(uid, et) for _, uid, et, _, _ in rows})
    assert [tuple(r) for r in got] == exp
    assert len(got) == 3                     # duplicate (1, click) collapsed


def test_streaming_user_stats_oracle():
    from oaim_sandbox_spark.queries_training import streaming_user_stats

    con = duckdb.connect()
    rows = [(1, 1, "click", 1_000_000, 1.5), (2, 1, "view", 2_000_000, 2.25),
            (3, 2, "click", 3_000_000, 4.0)]
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({eid}, make_timestamp({ts}), {uid}, '{et}', "
            f"CAST({val} AS DOUBLE), '{{}}')"
            for eid, uid, et, ts, val in rows)
        + ") AS v(event_id, ts, user_id, event_type, value, props)")
    got = con.execute(streaming_user_stats("duck")).fetchall()
    exp = []
    for uid in (1, 2):
        vals = [v for _, u, _, _, v in rows if u == uid]
        exp.append((uid, len(vals), _r6(sum(vals)), _r6(max(vals))))
    assert [tuple(r) for r in got] == exp
