"""Structural invariants for the skyline operator: the frontier is a
monotone chain and no returned row is dominated by any base row."""

from __future__ import annotations

from wsu_cpts_415_spark.queries.skyline import skyline_price_size

SF = "/root/testdata/sf0.001"


def test_skyline_is_undominated_monotone_chain(spark):
    sky = skyline_price_size(spark, SF).collect()
    assert len(sky) > 0
    base = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_retailprice", "p_size"
    ).collect()
    for r in sky:
        assert not any(
            b["p_retailprice"] <= r["p_retailprice"]
            and b["p_size"] >= r["p_size"]
            and (
                b["p_retailprice"] < r["p_retailprice"]
                or b["p_size"] > r["p_size"]
            )
            for b in base
        )
    # distinct prices on the frontier form a strictly increasing chain in
    # both axes once sorted by price
    chain = sorted({(r["p_retailprice"], r["p_size"]) for r in sky})
    for (p1, s1), (p2, s2) in zip(chain, chain[1:]):
        assert p1 < p2 and s1 < s2
