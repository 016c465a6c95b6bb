

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
