

def test_hw_split_fold_identity_every_point():
    """The Holt-Winters split fold equals the one-shot fold at EVERY
    split point, including mid < 7 bridges where generation 1 carries
    raw counts (the corpus midpoint never lands there, so the gate
    alone cannot witness those branches)."""
    from shippai_knowledge_etl_spark.queries.windows import (
        _hw_resume,
        _hw_state_after,
    )

    c = [((i * 37 + 11) % 23) + (7 if i % 7 == 3 else 0) for i in range(30)]
    want = _hw_state_after(c)
    for mid in range(0, len(c) + 1):
        n1, lvl, b, s = _hw_state_after(c[:mid])
        if n1 < 7:
            got = _hw_state_after(c[:mid] + c[mid:])
        else:
            got = _hw_resume(n1, lvl, b, s, c[mid:])
        assert got == want, f"split at {mid} diverges"


def test_fdr_bh_step_up_rejects_planted_effect(spark):
    """BH's defining behavior on a planted battery: a strong effect in
    one metric drags every higher-ranked... no — every rank ≤ k* into
    the rejection set, including metrics whose own stat sits between
    T_k* and their per-rank threshold (the step-up property a naive
    per-metric comparison misses). Planted: 'alpha' events convert
    hugely more for odd users; 'beta' moderately; the rest are null."""
    import datetime
    import tempfile

    from shippai_knowledge_etl_spark.queries.windows import behavior_fdr_bh

    rows = []
    eid = 0
    t0 = datetime.datetime(2026, 1, 1)

    def add(user, etype, conv_next):
        nonlocal eid
        rows.append((user, etype, t0 + datetime.timedelta(seconds=eid), eid))
        eid += 1
        rows.append(
            (
                user,
                "purchase" if conv_next else "view",
                t0 + datetime.timedelta(seconds=eid),
                eid,
            )
        )
        eid += 1

    for u in range(200):
        treat = u % 2 == 1
        # alpha: 80% vs 10% conversion — a huge effect
        add(u, "alpha", conv_next=(u % 10 < (8 if treat else 1)))
        # beta: 45% vs 25% — moderate
        add(u, "beta", conv_next=(u % 20 < (9 if treat else 5)))
        # gamma: identical arms — null
        add(u, "gamma", conv_next=(u % 5 == 0))

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, event_id long"
        ).write.parquet(f"{td}/events.parquet")
        out = {r["event_type"]: r for r in behavior_fdr_bh(spark, td).collect()}
    assert out["alpha"]["rejected"] and out["alpha"]["rnk"] == 1
    assert out["alpha"]["k_star"] >= 1
    # the null metric must never be rejected below the frontier
    if not out["gamma"]["rejected"]:
        assert out["gamma"]["rnk"] > out["gamma"]["k_star"]
    # step-up consistency: rejected == (rnk <= k_star) for every row
    for r in out.values():
        assert r["rejected"] == (r["rnk"] <= r["k_star"])
