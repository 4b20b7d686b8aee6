"""fk_audit: planted orphans and NULL fks produce exact counts."""


def test_fk_audit_planted_orphans(spark):
    from llogtail_spark.operators.governance import fk_audit

    orders = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],   # 99 orphan, one NULL
        "o_orderkey long, o_custkey long")
    customer = spark.createDataFrame([(10,), (20,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 7), (2, 200, 8), (5, 100, 9)],
        "l_orderkey long, l_partkey long, l_suppkey long")  # order 5 orphan
    part = spark.createDataFrame([(100,), (200,)], "p_partkey long")
    supplier = spark.createDataFrame([(7,), (8,)], "s_suppkey long")
    out = {r["relation"]: r for r in fk_audit(spark, {
        "orders": orders, "customer": customer, "lineitem": lineitem,
        "part": part, "supplier": supplier}).collect()}
    oc = out["orders.custkey->customer"]
    assert (oc["n_child"], oc["n_null_fk"], oc["n_orphan"]) == (4, 1, 1)
    assert oc["orphan_bp"] == 2500
    lo = out["lineitem.orderkey->orders"]
    assert (lo["n_child"], lo["n_orphan"]) == (4, 1)
    ls = out["lineitem.suppkey->supplier"]
    assert ls["n_orphan"] == 1               # suppkey 9
    lp = out["lineitem.partkey->part"]
    assert lp["n_orphan"] == 0


def test_table_profile_exact_counts(spark):
    from llogtail_spark.operators.governance import table_profile

    rows = [(1, None, 10, "a", 1.5, None),
            (2, None, 10, "a", 1.5, "x"),
            (None, None, None, "b", None, "x"),
            (4, None, 20, None, 2.5, None)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {r["column"]: r for r in table_profile(df).collect()}
    assert all(r["n"] == 4 for r in out.values())
    assert out["event_id"]["n_null"] == 1
    assert out["event_id"]["n_distinct"] == 3
    assert out["user_id"]["n_distinct"] == 2
    assert out["event_type"]["n_null"] == 1
    assert out["event_type"]["n_distinct"] == 2
    assert out["ts"]["n_null"] == 4 and out["ts"]["n_distinct"] == 0
    assert out["value"]["n_distinct"] == 2
    assert out["props"]["n_distinct"] == 1
