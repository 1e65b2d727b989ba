"""Round-5 TPC-H widening (Q6/Q14/Q17/Q4/Q10/Q15/Q19 shapes + HHI):
independent pandas references at sf0.001, plus must-bite guards so a
predicate that silently stops matching fails the suite."""
import numpy as np
import pandas as pd
import pytest  # noqa: F401

SF = "/root/testdata/sf0.001"


def _li():
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _cents(s):
    return np.floor(s.to_numpy() * 100 + 0.5).astype(np.int64)


def _qty(s):
    return np.floor(s.to_numpy() + 0.5).astype(np.int64)


def test_forecast_revenue_reference(ray_session):
    from soupflow.queries import q_forecast_revenue
    out = q_forecast_revenue(SF).to_pylist()[0]
    li = _li()
    day = li.l_shipdate.to_numpy().astype("datetime64[D]")
    dp = _cents(li.l_discount) // 1  # already pct via *100
    dp = np.floor(li.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    q = _qty(li.l_quantity)
    m = ((day >= np.datetime64("1996-01-01"))
         & (day < np.datetime64("1997-01-01"))
         & (dp >= 3) & (dp <= 6) & (q < 24))
    want = int((_cents(li.l_extendedprice)[m] * dp[m]).sum())
    assert out == {"revenue_units": want, "n_rows": int(m.sum())}
    assert 0 < m.sum() < len(li)  # predicate bites


def test_promo_revenue_reference(ray_session):
    from soupflow.queries import q_promo_revenue
    out = q_promo_revenue(SF).to_pylist()[0]
    li = _li()
    part = pd.read_parquet(f"{SF}/part.parquet")
    day = li.l_shipdate.to_numpy().astype("datetime64[D]")
    m = ((day >= np.datetime64("1996-03-01"))
         & (day < np.datetime64("1996-04-01")))
    sel = li[m]
    dp = np.floor(sel.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    rev = _cents(sel.l_extendedprice) * (100 - dp)
    promo = set(part[part.p_type == "PROMO"].p_partkey)
    pm = sel.l_partkey.isin(promo).to_numpy()
    assert out == {"promo_units": int(rev[pm].sum()),
                   "total_units": int(rev.sum())}
    assert 0 < pm.sum() < len(sel)


def test_market_share_reference(ray_session):
    from soupflow.queries import q_market_share
    out = {r["yr"]: (r["num_cents"], r["den_cents"])
           for r in q_market_share(SF).to_pylist()}
    li = _li()
    part = pd.read_parquet(f"{SF}/part.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    dp = np.floor(li.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    li = li.assign(rev=_cents(li.l_extendedprice) * (100 - dp))
    li = li[li.l_partkey.isin(
        set(part[part.p_type == "ECONOMY"].p_partkey))]
    reg_nat = set(na[na.n_regionkey == 1].n_nationkey)
    od = od[(od.o_orderdate >= "1996-01-01")
            & (od.o_orderdate < "1998-01-01")
            & od.o_custkey.isin(
                set(cu[cu.c_nationkey.isin(reg_nat)].c_custkey))]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["yr"] = j.o_orderdate.dt.year
    sn = su.set_index("s_suppkey").s_nationkey
    j["tgt"] = sn.reindex(j.l_suppkey).to_numpy() == 3
    g = j.groupby("yr")
    want = {int(y): (int(sub.rev[sub.tgt].sum()), int(sub.rev.sum()))
            for y, sub in g}
    assert out == want
    assert len(out) == 2                       # both window years
    for num, den in out.values():              # share strictly inside
        assert 0 < num < den                   # (0, 1) — all legs bite


def test_small_qty_revenue_reference(ray_session):
    from soupflow.queries import q_small_qty_revenue
    out = q_small_qty_revenue(SF).to_pylist()[0]
    li = _li()
    q = _qty(li.l_quantity)
    g = pd.DataFrame({"pk": li.l_partkey, "q": q}) \
        .groupby("pk")["q"].agg(["sum", "count"])
    sq = g["sum"].reindex(li.l_partkey).to_numpy()
    n = g["count"].reindex(li.l_partkey).to_numpy()
    m = 5 * n * q < sq
    assert out == {"rev_cents": int(_cents(li.l_extendedprice)[m].sum()),
                   "n_rows": int(m.sum())}
    assert 0 < m.sum() < len(li)


def test_priority_check_reference(ray_session):
    from soupflow.queries import q_priority_check
    got = {r["o_orderpriority"]: r["order_count"]
           for r in q_priority_check(SF).to_pylist()}
    od = pd.read_parquet(f"{SF}/orders.parquet")
    li = _li()
    mx = li.groupby("l_orderkey")["l_shipdate"].max()
    od = od[(od.o_orderdate >= "1996-01-01")
            & (od.o_orderdate < "1997-01-01")].copy()
    od["mx"] = mx.reindex(od.o_orderkey).to_numpy()
    late = od[od.mx > od.o_orderdate + pd.Timedelta(days=30)]
    want = late.groupby("o_orderpriority").size().to_dict()
    assert got == want
    assert 0 < len(late) < len(od)  # EXISTS leg bites both ways


def test_returned_revenue_reference(ray_session):
    from soupflow.queries import q_returned_revenue
    out = q_returned_revenue(SF).to_pandas()
    li = _li()
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    dp = np.floor(li.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    li = li.assign(rev=_cents(li.l_extendedprice) * (100 - dp))
    li = li[li.l_returnflag == "R"]
    od = od[(od.o_orderdate >= "1996-01-01")
            & (od.o_orderdate < "1996-07-01")]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    per = j.groupby("o_custkey")["rev"].sum().reset_index() \
        .sort_values(["rev", "o_custkey"],
                     ascending=[False, True]).head(20)
    per = per.merge(cu, left_on="o_custkey", right_on="c_custkey") \
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
    want = per[["c_custkey", "c_name", "n_name", "rev"]] \
        .rename(columns={"rev": "rev_units"})
    assert out.to_dict("records") == want.to_dict("records")
    assert len(out) == 20


def test_top_supplier_reference(ray_session):
    from soupflow.queries import q_top_supplier
    out = q_top_supplier(SF).to_pandas()
    li = _li()
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    day = li.l_shipdate.to_numpy().astype("datetime64[D]")
    m = ((day >= np.datetime64("1996-01-01"))
         & (day < np.datetime64("1996-04-01")))
    sel = li[m]
    dp = np.floor(sel.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    per = pd.DataFrame({
        "sk": sel.l_suppkey,
        "rev": _cents(sel.l_extendedprice) * (100 - dp)}) \
        .groupby("sk")["rev"].sum()
    best = per.max()
    win = sorted(per[per == best].index)
    assert list(out.s_suppkey) == win
    assert set(out.total_units) == {best}
    names = su.set_index("s_suppkey").s_name
    assert list(out.s_name) == [names[k] for k in win]


def test_brand_band_revenue_reference(ray_session):
    from soupflow.queries import q_brand_band_revenue
    out = q_brand_band_revenue(SF).to_pylist()[0]
    li = _li()
    part = pd.read_parquet(f"{SF}/part.parquet").set_index("p_partkey")
    brand = part.p_brand.reindex(li.l_partkey).to_numpy()
    size = part.p_size.reindex(li.l_partkey).to_numpy()
    q = _qty(li.l_quantity)
    m = np.zeros(len(li), bool)
    legs_hit = []
    for b, slo, shi, qlo, qhi in ((13, 1, 15, 1, 11),
                                  (22, 1, 20, 10, 20),
                                  (25, 1, 25, 20, 30)):
        leg = ((brand == f"Brand#{b}") & (size >= slo) & (size <= shi)
               & (q >= qlo) & (q <= qhi))
        legs_hit.append(int(leg.sum()))
        m |= leg
    dp = np.floor(li.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    rev = _cents(li.l_extendedprice) * (100 - dp)
    assert out == {"revenue_units": int(rev[m].sum()),
                   "n_rows": int(m.sum())}
    assert all(h > 0 for h in legs_hit)  # every OR leg bites


def test_spend_hhi_reference(ray_session):
    from soupflow.queries import q_spend_hhi
    out = q_spend_hhi(SF).to_pylist()[0]
    od = pd.read_parquet(f"{SF}/orders.parquet")
    x = pd.DataFrame({"k": od.o_custkey,
                      "x": _cents(od.o_totalprice)}) \
        .groupby("k")["x"].sum()
    sx = int(x.sum())
    sx2 = sum(int(v) * int(v) for v in x)
    assert out == {"hhi_ppm": (1_000_000 * sx2) // (sx * sx),
                   "n_customers": len(x)}
    # sanity: HHI of n near-equal shares ~ 1e6/n
    assert out["hhi_ppm"] >= 1_000_000 // len(x)


def test_late_suppliers_randomized_differential(ray_session,
                                                tmp_path):
    """Randomized multi-block differential for the one-pass Q21
    kernel: random (order, supplier, shipdate) corpora written as
    MULTI-FILE parquet directories (so the sorted stream spans many
    blocks and the edge-run fixup genuinely fires) vs a scalar pandas
    reference, across seeds."""
    import os

    from soupflow.queries import q_late_suppliers

    for seed in range(3):
        rng = np.random.default_rng(seed)
        n_orders, n_supp = 40, 6
        d0 = pd.Timestamp("1995-01-01")
        od = pd.DataFrame({
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_orderdate": [d0 + pd.Timedelta(days=int(x))
                            for x in rng.integers(0, 60, n_orders)]})
        m = 250
        li = pd.DataFrame({
            "l_orderkey": rng.integers(0, n_orders, m)
            .astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, m).astype(np.int64),
        })
        li["l_shipdate"] = [
            od.o_orderdate[k] + pd.Timedelta(days=int(x))
            for k, x in zip(li.l_orderkey,
                            rng.integers(0, 120, m))]
        sup = pd.DataFrame({
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"S#{i}" for i in range(n_supp)]})

        d = tmp_path / f"sf_rand{seed}"
        d.mkdir()
        (d / "lineitem.parquet").mkdir()
        (d / "orders.parquet").mkdir()
        for i in range(5):   # multi-file → multi-block sort input
            li.iloc[i::5].to_parquet(
                d / "lineitem.parquet" / f"p{i}.parquet")
        for i in range(2):
            od.iloc[i::2].to_parquet(
                d / "orders.parquet" / f"p{i}.parquet")
        sup.to_parquet(d / "supplier.parquet")

        # scalar reference
        per = li.groupby(["l_orderkey", "l_suppkey"])["l_shipdate"] \
            .max().reset_index()
        per = per.merge(od, left_on="l_orderkey",
                        right_on="o_orderkey")
        per["late"] = (per.l_shipdate - per.o_orderdate
                       > pd.Timedelta(days=60))
        g = per.groupby("l_orderkey").agg(
            ns=("l_suppkey", "size"), nl=("late", "sum"))
        winners = per[per.late].set_index("l_orderkey").l_suppkey
        ok = g[(g.ns >= 2) & (g.nl == 1)].index
        want = winners.loc[winners.index.isin(ok)] \
            .value_counts().to_dict()
        want = sorted(((f"S#{k}", int(v)) for k, v in want.items()),
                      key=lambda t: (-t[1], t[0]))

        out = [(r["s_name"], r["numwait"])
               for r in q_late_suppliers(str(d)).to_pylist()]
        assert out == want, (seed, out, want)
        assert len(out) > 0  # corpus produces winners


def test_bfs_reach_reference(ray_session):
    """Scalar BFS reference over the supplier–part bipartite graph:
    min-depth per node from the min supplier, capped at 4 hops; the
    depth distribution must be non-trivial (≥3 distinct depths) so
    the iterative frontier genuinely expands more than once."""
    from collections import deque

    from soupflow.queries import q_bfs_reach
    out = {r["node"]: r["depth"]
           for r in q_bfs_reach(SF).to_pylist()}
    li = _li()
    adj = {}
    for s, p in set(zip(li.l_suppkey, li.l_partkey)):
        a, b = int(s), int(p) + 1_000_000
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = int(li.l_suppkey.min())
    want = {seed: 0}
    q = deque([(seed, 0)])
    while q:
        v, d = q.popleft()
        if d >= 4:
            continue
        for w in adj.get(v, ()):
            if w not in want:
                want[w] = d + 1
                q.append((w, d + 1))
    assert out == want
    assert len(set(out.values())) >= 3


def test_ipc_roundtrip_reference(ray_session):
    """Arrow IPC sink+source: the round-tripped aggregate equals the
    direct parquet aggregate, and the distributed write left real
    multi-file IPC on disk (per-block files, not one giant file)."""
    import glob

    from soupflow.queries import q_ipc_roundtrip
    out = {r["event_type"]: (r["sum_cents"], r["n"])
           for r in q_ipc_roundtrip(SF).take_all()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.floor(ev.value.to_numpy() * 100 + 0.5).astype(np.int64)
    g = pd.DataFrame({"t": ev.event_type, "c": cents}).groupby("t")["c"]
    want = {t: (int(s), int(n))
            for t, s, n in zip(g.sum().index, g.sum(), g.count())}
    assert out == want
    files = glob.glob("/tmp/soupflow_ipc/sf0.001/*.arrow")
    assert len(files) >= 1
    import pyarrow as pa_
    t = pa_.ipc.open_file(files[0]).read_all()
    assert t.schema.names == ["event_type", "value_cents"]


def test_orders_with_returns_randomized_differential(ray_session,
                                                     tmp_path):
    """Randomized multi-block differential for the one-pass
    orders_with_returns kernel: random (order, returnflag) corpora
    written as MULTI-FILE parquet directories so the sorted sentinel
    stream spans many blocks and the edge-run fixup genuinely fires;
    engine counts must equal a scalar pandas EXISTS reference across
    seeds, and at least one run must straddle a block boundary's
    worth of rows (orders with many lineitems)."""
    from soupflow.queries import q_orders_with_returns

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        n_orders, m = 50, 400
        od = pd.DataFrame({
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_orderpriority": rng.choice(prios, n_orders)})
        li = pd.DataFrame({
            "l_orderkey": rng.integers(0, n_orders, m)
            .astype(np.int64),
            "l_returnflag": rng.choice(["R", "N", "A"], m,
                                       p=[0.25, 0.5, 0.25])})

        d = tmp_path / f"sf_owr{seed}"
        d.mkdir()
        (d / "lineitem.parquet").mkdir()
        (d / "orders.parquet").mkdir()
        for i in range(6):    # multi-file → multi-block sort input
            li.iloc[i::6].to_parquet(
                d / "lineitem.parquet" / f"p{i}.parquet")
        for i in range(3):
            od.iloc[i::3].to_parquet(
                d / "orders.parquet" / f"p{i}.parquet")

        rkeys = set(li[li.l_returnflag == "R"].l_orderkey)
        ref = od[od.o_orderkey.isin(rkeys)] \
            .groupby("o_orderpriority").size().to_dict()
        assert ref and len(ref) >= 3          # differential bites

        out = q_orders_with_returns(str(d))
        got = dict(zip(out.column("o_orderpriority").to_pylist(),
                       out.column("n_orders").to_pylist()))
        assert got == ref, (seed, got, ref)


def test_orders_with_returns_fk_violation_raises(ray_session,
                                                 tmp_path):
    """A returned lineitem whose orderkey is missing from orders is
    an FK violation the one-pass kernel must raise on (its run has no
    sentinel), not silently drop."""
    import pytest

    from soupflow.queries import q_orders_with_returns

    d = tmp_path / "sf_fk"
    d.mkdir()
    pd.DataFrame({"o_orderkey": np.array([1], np.int64),
                  "o_orderpriority": ["1-URGENT"]}) \
        .to_parquet(d / "orders.parquet")
    pd.DataFrame({"l_orderkey": np.array([1, 99], np.int64),
                  "l_returnflag": ["R", "R"]}) \
        .to_parquet(d / "lineitem.parquet")
    with pytest.raises(Exception, match="FK violation"):
        q_orders_with_returns(str(d))


def test_shipping_priority_randomized_differential(ray_session,
                                                   tmp_path):
    """Randomized multi-block differential for the one-pass Q3
    kernel: random (customer, order, lineitem) corpora as MULTI-FILE
    parquet dirs (boundary-spanning runs force the edge fixup) vs a
    scalar pandas reference — covering sentinel-only runs (orders
    with no unshipped lineitems), sentinel-less runs (orders outside
    segment/window), and revenue ties."""
    from soupflow.queries import q_shipping_priority

    cutoff = pd.Timestamp("1998-06-01")
    for seed in range(3):
        rng = np.random.default_rng(200 + seed)
        n_cust, n_orders, m = 12, 60, 120
        cu = pd.DataFrame({
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_mktsegment": rng.choice(
                ["BUILDING", "MACHINERY"], n_cust)})
        od = pd.DataFrame({
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_orders)
            .astype(np.int64),
            "o_orderdate": [
                cutoff + pd.Timedelta(days=int(x))
                for x in rng.integers(-40, 40, n_orders)]})
        li = pd.DataFrame({
            "l_orderkey": rng.integers(0, n_orders, m)
            .astype(np.int64),
            "l_extendedprice": np.round(
                rng.uniform(1, 500, m), 2),
            "l_discount": np.round(
                rng.choice([0.0, 0.05, 0.1], m), 2),
            "l_shipdate": [
                cutoff + pd.Timedelta(days=int(x))
                for x in rng.integers(-40, 40, m)]})

        d = tmp_path / f"sf_q3_{seed}"
        d.mkdir()
        (d / "lineitem.parquet").mkdir()
        (d / "orders.parquet").mkdir()
        for i in range(6):
            li.iloc[i::6].to_parquet(
                d / "lineitem.parquet" / f"p{i}.parquet")
        for i in range(3):
            od.iloc[i::3].to_parquet(
                d / "orders.parquet" / f"p{i}.parquet")
        cu.to_parquet(d / "customer.parquet")

        seg = set(cu[cu.c_mktsegment == "BUILDING"].c_custkey)
        ow = od[(od.o_orderdate < cutoff)
                & od.o_custkey.isin(seg)]
        lw = li[li.l_shipdate > cutoff].copy()
        lw["rev_i"] = (np.floor(lw.l_extendedprice * 100 + 0.5)
                       .astype(np.int64)
                       * (100 - np.floor(lw.l_discount * 100 + 0.5)
                          .astype(np.int64)))
        j = lw.merge(ow, left_on="l_orderkey",
                     right_on="o_orderkey")
        agg = j.groupby("l_orderkey").agg(
            rev_i=("rev_i", "sum"),
            o_day=("o_orderdate", "first")).reset_index()
        agg["o_day"] = agg.o_day.dt.strftime("%Y-%m-%d")
        ref = agg.sort_values(
            ["rev_i", "l_orderkey"],
            ascending=[False, True]).head(10)
        assert len(ref) >= 5          # differential bites
        # sentinel-only + sentinel-less regimes genuinely occur
        assert len(ow) > len(agg)
        assert len(od) > len(ow)

        out = q_shipping_priority(str(d)).to_pandas()
        assert list(out.l_orderkey) == list(ref.l_orderkey)
        assert list(out.rev_i) == list(ref.rev_i)
        assert list(out.o_day) == list(ref.o_day)


def test_big_orders_fk_violation_raises(ray_session, tmp_path):
    """A lineitem orderkey missing from orders must raise in the
    one-pass Q18 kernel (its run has no sentinel), not silently drop
    the phantom order's quantity."""
    import pytest

    from soupflow.queries import q_big_orders

    d = tmp_path / "sf_q18fk"
    d.mkdir()
    pd.DataFrame({"o_orderkey": np.array([1], np.int64),
                  "o_custkey": np.array([7], np.int64),
                  "o_totalprice": [10.0]}) \
        .to_parquet(d / "orders.parquet")
    pd.DataFrame({"l_orderkey": np.array([1, 99], np.int64),
                  "l_quantity": [500.0, 500.0]}) \
        .to_parquet(d / "lineitem.parquet")
    pd.DataFrame({"c_custkey": np.array([7], np.int64),
                  "c_name": ["C#7"]}) \
        .to_parquet(d / "customer.parquet")
    with pytest.raises(Exception, match="FK violation"):
        q_big_orders(str(d))


def test_revenue_by_nation_fk_violation_raises(ray_session, tmp_path):
    """A lineitem orderkey missing from orders must raise in the
    one-pass Q5 kernel (its run has no sentinel), not silently drop
    the phantom order's revenue; a custkey missing from customer
    DROPS its run (inner-join semantics) instead."""
    import pytest

    from soupflow.queries import q_revenue_by_nation

    d = tmp_path / "sf_q5fk"
    d.mkdir()
    pd.DataFrame({"o_orderkey": np.array([1, 2], np.int64),
                  "o_custkey": np.array([7, 999], np.int64)}) \
        .to_parquet(d / "orders.parquet")
    pd.DataFrame({"l_orderkey": np.array([1, 2], np.int64),
                  "l_extendedprice": [10.0, 20.0],
                  "l_discount": [0.0, 0.0]}) \
        .to_parquet(d / "lineitem.parquet")
    pd.DataFrame({"c_custkey": np.array([7], np.int64),
                  "c_nationkey": np.array([3], np.int64)}) \
        .to_parquet(d / "customer.parquet")
    pd.DataFrame({"n_nationkey": np.array([3], np.int64),
                  "n_name": ["GERMANY"]}) \
        .to_parquet(d / "nation.parquet")

    # custkey 999 missing from customer: its order's revenue drops
    out = q_revenue_by_nation(str(d)).to_pylist()
    assert out == [{"n_name": "GERMANY", "revenue_i": 100000}]

    # now a lineitem pointing at a nonexistent order: FK raise
    pd.DataFrame({"l_orderkey": np.array([1, 2, 99], np.int64),
                  "l_extendedprice": [10.0, 20.0, 5.0],
                  "l_discount": [0.0, 0.0, 0.0]}) \
        .to_parquet(d / "lineitem.parquet")
    with pytest.raises(Exception, match="FK violation"):
        q_revenue_by_nation(str(d))


def test_priority_by_status_fk_violation_raises(ray_session,
                                                tmp_path):
    """A lineitem orderkey missing from orders must raise in the
    one-pass Q12 kernel (its run has no sentinel; there is no order
    filter, so every order emits one) — the old hash join dropped
    such phantom lineitems silently."""
    import pytest

    from soupflow.queries import q_priority_by_status

    d = tmp_path / "sf_q12fk"
    d.mkdir()
    pd.DataFrame({"o_orderkey": np.array([1], np.int64),
                  "o_orderpriority": ["1-URGENT"]}) \
        .to_parquet(d / "orders.parquet")
    pd.DataFrame({"l_orderkey": np.array([1, 99], np.int64),
                  "l_linestatus": ["O", "F"]}) \
        .to_parquet(d / "lineitem.parquet")
    with pytest.raises(Exception, match="FK violation"):
        q_priority_by_status(str(d))

    # clean FK: one high order, two statuses
    pd.DataFrame({"l_orderkey": np.array([1, 1, 1], np.int64),
                  "l_linestatus": ["O", "F", "O"]}) \
        .to_parquet(d / "lineitem.parquet")
    out = {r["l_linestatus"]: (r["high_lines"], r["low_lines"])
           for r in q_priority_by_status(str(d)).to_pylist()}
    assert out == {"O": (2, 0), "F": (1, 0)}
