"""Independent naive-Python pins BACK-FILLED for certified entries, round 13
wave 7: the TPC-H shape family (q2 argmin subquery, q4 EXISTS, q6 scan
agg, q8 market share, q12 CASE agg, q14 promo %, q15 view + MAX, q16
distinct agg, q17 correlated avg, q18 HAVING, q19 disjunctive join, q21
EXISTS+NOT-EXISTS, q22 anti-join) over ONE hand-planted micro-warehouse.
Every expected value is recomputed generically in Python with exact
Fraction decimal arithmetic (mirroring the DECIMAL sums) — no hand-typed
constants. Plants: an order straddling the q4 60-day late fence, a
single-supplier order q21 must NOT count, an order totalling exactly 260
(> 250 HAVING), a part whose every line fails q17's half-average cut,
and a negative-balance customer q22's positive-average must exclude."""

import math
from datetime import date, timedelta
from fractions import Fraction as Fr

import duckdb

REGION = [(0, "AMERICA"), (1, "EUROPE")]
NATION = [(0, "NATION_0", 0), (1, "NATION_1", 0), (3, "NATION_3", 1)]
SUPPLIER = [(1, "Supp1", 3), (2, "Supp2", 0), (3, "Supp3", 1)]
CUSTOMER = [(1, "Cust1", "500.25", 0), (2, "Cust2", "100.50", 1),
            (3, "Cust3", "800.75", 0), (4, "Cust4", "-50.00", 3),
            (5, "Cust5", "900.00", 1)]
PART = [(1, "Brand#11", "PROMO", 5), (2, "Brand#22", "ECONOMY", 20),
        (3, "Brand#15", "STANDARD", 30), (4, "Brand#11", "ECONOMY", 10)]
ORDERS = [  # (okey, ckey, odate, priority, status, total)
    (1, 1, date(1997, 2, 1), "1-URGENT", "F", "1000.00"),
    (2, 2, date(1996, 8, 15), "3-MEDIUM", "F", "2000.00"),
    (3, 3, date(1997, 6, 10), "2-HIGH", "O", "1500.00"),
    (4, 1, date(1997, 9, 5), "5-LOW", "F", "800.00"),
    (5, 5, date(1997, 1, 15), "2-HIGH", "F", "900.00"),
]
LINEITEM = [  # (okey, pkey, skey, qty, extprice, disc, returnflag, shipdate)
    (1, 1, 1, 10, "100.25", "0.05", "N", date(1997, 2, 10)),
    (1, 2, 2, 30, "500.50", "0.10", "R", date(1997, 3, 1)),
    (2, 3, 3, 5, "200.75", "0.06", "N", date(1996, 11, 1)),   # q4: LATE
    (3, 1, 1, 200, "999.00", "0.00", "N", date(1997, 7, 1)),
    (3, 2, 2, 60, "300.25", "0.07", "A", date(1997, 7, 2)),
    (4, 4, 1, 15, "400.00", "0.06", "N", date(1997, 9, 15)),
    (4, 1, 3, 20, "150.50", "0.05", "R", date(1997, 9, 20)),
    (5, 3, 2, 35, "250.00", "0.02", "R", date(1997, 2, 1)),
    (2, 2, 3, 12, "100.00", "0.05", "N", date(1996, 9, 1)),
    (1, 2, 1, 20, "120.00", "0.03", "N", date(1997, 4, 1)),
]


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _fr(s: str) -> Fr:
    return Fr(s)


def _rev(price: str, disc: str) -> Fr:
    return _fr(price) * (1 - _fr(disc))


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
                + ", ".join(f"({k}, '{n}', {b}::DECIMAL(15,2), {nk})"
                            for k, n, b, nk in CUSTOMER)
                + ") AS v(c_custkey, c_name, c_acctbal, c_nationkey)")
    con.execute("CREATE TABLE part AS SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{b}', '{t}', {s})" for k, b, t, s in PART)
                + ") AS v(p_partkey, p_brand, p_type, p_size)")
    con.execute("CREATE TABLE orders AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"({ok}, {ck}, TIMESTAMP '{od} 00:00:00', '{pr}', '{st}', "
                    f"{tp}::DECIMAL(15,2))"
                    for ok, ck, od, pr, st, tp in ORDERS)
                + ") AS v(o_orderkey, o_custkey, o_orderdate, o_orderpriority,"
                  " o_orderstatus, o_totalprice)")
    con.execute("CREATE TABLE lineitem AS SELECT * FROM (VALUES "
                + ", ".join(
                    f"({ok}, {pk}, {sk}, {q}, {p}::DECIMAL(15,2), "
                    f"{dc}::DECIMAL(5,2), '{rf}', TIMESTAMP '{sd} 00:00:00')"
                    for ok, pk, sk, q, p, dc, rf, sd in LINEITEM)
                + ") AS v(l_orderkey, l_partkey, l_suppkey, l_quantity,"
                  " l_extendedprice, l_discount, l_returnflag, l_shipdate)")
    return con


def test_q2_min_cost_supplier():
    from oaim_sandbox_spark.queries_training import q2_min_cost_supplier

    got = _con().execute(q2_min_cost_supplier("duck")).fetchall()
    exp = set()
    for pk, _, _, size in PART:
        if size > 5:
            continue
        units = [(float(_fr(p)) / q, sk) for ok, lpk, sk, q, p, *_ in LINEITEM
                 if lpk == pk]
        if not units:
            continue
        mn = min(u for u, _ in units)
        for u, sk in units:
            if u == mn:
                exp.add((pk, sk, _r6(u)))
    assert sorted(map(tuple, got)) == sorted(exp)
    assert {r[0] for r in got} == {1}            # only the size<=5 part


def test_q4_exists_late_lines():
    from oaim_sandbox_spark.queries_relational import q4_exists_late_lines

    got = _con().execute(q4_exists_late_lines("duck")).fetchall()
    cnt = {}
    for ok, _, od, pr, _, _ in ORDERS:
        if not (date(1996, 7, 1) <= od < date(1996, 10, 1)):
            continue
        if any(sd > od + timedelta(days=60) for lok, *_, sd in LINEITEM
               if lok == ok):
            cnt[pr] = cnt.get(pr, 0) + 1
    assert [tuple(r) for r in got] == sorted(cnt.items())
    assert cnt == {"3-MEDIUM": 1}                # the planted late order


def test_q6_forecast_revenue():
    from oaim_sandbox_spark.queries_relational import q6_forecast_revenue

    got = _con().execute(q6_forecast_revenue("duck")).fetchall()
    rev, n = Fr(0), 0
    for _, _, _, q, p, dc, _, sd in LINEITEM:
        if (date(1997, 1, 1) <= sd < date(1998, 1, 1)
                and _fr("0.05") <= _fr(dc) <= _fr("0.07") and q < 24):
            rev += _fr(p) * _fr(dc)
            n += 1
    assert [tuple(r) for r in got] == [(float(rev), n)]
    assert n == 3                               # the .10/.03/.02/.00/.07+qty60
    # discounts and the 1996 line are all excluded


def test_q8_market_share():
    from oaim_sandbox_spark.queries_relational import q8_market_share

    got = _con().execute(q8_market_share("duck")).fetchall()
    nat_region = {k: r for k, _, r in NATION}
    nat_name = {k: n for k, n, _ in NATION}
    cust_nat = {k: nk for k, _, _, nk in CUSTOMER}
    supp_nat = {k: nk for k, _, nk in SUPPLIER}
    ptype = {k: t for k, _, t, _ in PART}
    region_name = dict(REGION)
    omap = {ok: (ck, od) for ok, ck, od, *_ in ORDERS}
    num, den = {}, {}
    for ok, pk, sk, q, p, dc, _, _ in LINEITEM:
        ck, od = omap[ok]
        if region_name[nat_region[cust_nat[ck]]] != "AMERICA":
            continue
        if ptype[pk] != "ECONOMY":
            continue
        v = _rev(p, dc)
        y = od.year
        den[y] = den.get(y, Fr(0)) + v
        if nat_name[supp_nat[sk]] == "NATION_3":
            num[y] = num.get(y, Fr(0)) + v
    exp = [(y, _r6(float(num.get(y, Fr(0))) / float(den[y])))
           for y in sorted(den)]
    assert [tuple(r) for r in got] == exp
    shares = dict(exp)
    assert shares[1996] == 0.0 and shares[1997] > 0.0


def test_q12_priority_case_agg():
    from oaim_sandbox_spark.queries_relational import q12_priority_case_agg

    got = _con().execute(q12_priority_case_agg("duck")).fetchall()
    prio = {ok: pr for ok, _, _, pr, _, _ in ORDERS}
    agg = {}
    for ok, _, _, _, _, _, rf, sd in LINEITEM:
        if not (date(1997, 1, 1) <= sd < date(1998, 1, 1)):
            continue
        hi = prio[ok] in ("1-URGENT", "2-HIGH")
        a = agg.setdefault(rf, [0, 0])
        a[0 if hi else 1] += 1
    exp = sorted((rf, h, l) for rf, (h, l) in agg.items())
    assert [tuple(r) for r in got] == exp


def test_q14_promo_revenue():
    from oaim_sandbox_spark.queries_relational import q14_promo_revenue

    got = _con().execute(q14_promo_revenue("duck")).fetchall()
    ptype = {k: t for k, _, t, _ in PART}
    promo, total, n = Fr(0), Fr(0), 0
    for _, pk, _, _, p, dc, _, sd in LINEITEM:
        if not (date(1997, 9, 1) <= sd < date(1997, 10, 1)):
            continue
        v = _rev(p, dc)
        total += v
        n += 1
        if ptype[pk] == "PROMO":
            promo += v
    exp = [(_r6(100.0 * float(promo) / float(total)), n)]
    assert [tuple(r) for r in got] == exp
    assert n == 2 and 0 < got[0][0] < 100


def test_q15_top_supplier():
    from oaim_sandbox_spark.queries_training import q15_top_supplier

    got = _con().execute(q15_top_supplier("duck")).fetchall()
    rev = {}
    for _, _, sk, _, p, dc, _, sd in [
            (ok, pk, sk, q, p, dc, rf, sd)
            for ok, pk, sk, q, p, dc, rf, sd in LINEITEM
            if date(1997, 1, 1) <= sd < date(1997, 4, 1)]:
        rev[sk] = rev.get(sk, Fr(0)) + _rev(p, dc)
    mx = max(rev.values())
    sname = {k: n for k, n, _ in SUPPLIER}
    exp = sorted((sk, sname[sk], float(v)) for sk, v in rev.items() if v == mx)
    assert [tuple(r) for r in got] == exp
    assert [r[0] for r in got] == [2]           # Supp2's Feb+Mar revenue wins


def test_q16_distinct_suppliers():
    from oaim_sandbox_spark.queries_relational import q16_distinct_suppliers

    got = _con().execute(q16_distinct_suppliers("duck")).fetchall()
    pinfo = {k: (b, t, s) for k, b, t, s in PART}
    cells = {}
    for _, pk, sk, *_ in LINEITEM:
        b, t, s = pinfo[pk]
        if 1 <= s <= 15:
            cells.setdefault((b, t), set()).add(sk)
    exp = sorted(((b, t, len(sks)) for (b, t), sks in cells.items()),
                 key=lambda r: (-r[2], r[0], r[1]))
    assert [tuple(r) for r in got] == exp[:20]
    assert ("Brand#11", "PROMO", 2) in set(map(tuple, got))


def test_q17_below_avg_quantity():
    from oaim_sandbox_spark.queries_relational import q17_below_avg_quantity

    got = _con().execute(q17_below_avg_quantity("duck")).fetchall()
    per_part = {}
    for _, pk, _, q, *_ in LINEITEM:
        per_part.setdefault(pk, []).append(q)
    n_small, sum_price = 0, Fr(0)
    small_parts = set()
    for _, pk, _, q, p, *_ in LINEITEM:
        qs = per_part[pk]
        thr = 0.5 * float(Fr(sum(qs))) / len(qs)
        if q < thr:
            n_small += 1
            sum_price += _fr(p)
            small_parts.add(pk)
    assert [tuple(r) for r in got] == [(n_small, float(sum_price))]
    assert small_parts == {1, 2, 3}   # part 4's single line can never pass
    # (a lone line sits AT the average, never under half of it)


def test_q18_large_orders():
    from oaim_sandbox_spark.queries_relational import q18_large_orders

    got = _con().execute(q18_large_orders("duck")).fetchall()
    cname = {k: n for k, n, _, _ in CUSTOMER}
    okey_c = {ok: ck for ok, ck, *_ in ORDERS}
    qty = {}
    for ok, _, _, q, *_ in LINEITEM:
        qty[ok] = qty.get(ok, Fr(0)) + q
    exp = sorted(((cname[okey_c[ok]], ok, float(v))
                  for ok, v in qty.items() if v > 250),
                 key=lambda r: (-r[2], r[1]))
    assert [tuple(r) for r in got] == exp[:100]
    assert [r[1] for r in got] == [3]           # exactly the planted 260 order


def test_q19_disjunctive_pred_join():
    from oaim_sandbox_spark.queries_relational import q19_disjunctive_pred_join

    got = _con().execute(q19_disjunctive_pred_join("duck")).fetchall()
    pinfo = {k: (b, s) for k, b, _, s in PART}
    rev, n = Fr(0), 0
    for _, pk, _, q, p, dc, _, _ in LINEITEM:
        b, s = pinfo[pk]
        ok = ((b == "Brand#11" and 1 <= s <= 15 and 1 <= q <= 20)
              or (b == "Brand#22" and 10 <= s <= 30 and 10 <= q <= 30)
              or (b == "Brand#15" and 20 <= s <= 50 and 20 <= q <= 40))
        if ok:
            rev += _rev(p, dc)
            n += 1
    assert [tuple(r) for r in got] == [(float(rev), n)]
    assert n == 7


def test_q21_waiting_suppliers():
    from oaim_sandbox_spark.queries_training import q21_waiting_suppliers

    got = _con().execute(q21_waiting_suppliers("duck")).fetchall()
    status = {ok: st for ok, _, _, _, st, _ in ORDERS}
    sname = {k: n for k, n, _ in SUPPLIER}
    by_order = {}
    for ok, _, sk, _, _, _, rf, _ in LINEITEM:
        by_order.setdefault(ok, []).append((sk, rf))
    cnt = {}
    for ok, _, sk, _, _, _, rf, _ in LINEITEM:
        if status[ok] != "F" or rf != "R":
            continue
        others = [x for x in by_order[ok] if x[0] != sk]
        if others and not any(x[1] == "R" for x in others):
            cnt[sname[sk]] = cnt.get(sname[sk], 0) + 1
    exp = sorted(cnt.items(), key=lambda r: (-r[1], r[0]))
    assert [tuple(r) for r in got] == exp[:20]
    assert "Supp2" in cnt and len(cnt) == 2
    # order 5 (single-supplier, returned) counts NOBODY: its 'R' line has
    # no co-supplier, so the EXISTS arm fails — but Supp2 still earns its
    # count from order 1.


def test_q22_idle_rich_customers():
    from oaim_sandbox_spark.queries_training import q22_idle_rich_customers

    got = _con().execute(q22_idle_rich_customers("duck")).fetchall()
    pos = [_fr(b) for _, _, b, _ in CUSTOMER if _fr(b) > 0]
    thr = float(Fr(sum(pos))) / len(pos)
    has_recent = {ck for _, ck, od, *_ in ORDERS if od >= date(2000, 1, 1)}
    nat_name = {k: n for k, n, _ in NATION}
    agg = {}
    for ck, _, b, nk in CUSTOMER:
        if float(_fr(b)) > thr and ck not in has_recent:
            a = agg.setdefault(nat_name[nk], [0, Fr(0)])
            a[0] += 1
            a[1] += _fr(b)
    exp = sorted((n, c, float(s)) for n, (c, s) in agg.items())
    assert [tuple(r) for r in got] == exp
    assert all(b != "Cust4" for b, *_ in got)   # negative balance excluded
