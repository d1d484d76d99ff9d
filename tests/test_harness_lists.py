"""Harness-contract guards: every name the bench, probe, and fixed
cross-round subset reference must exist in the registry -- a renamed
query must fail HERE, not silently vanish from the driver's BENCH."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_headline_names_are_registered():
    import bench
    from wsu_cpts_415_spark.registry import REGISTRY
    import wsu_cpts_415_spark.queries  # noqa: F401 populate

    missing = [n for n in bench.R4_HEADLINE if n not in REGISTRY]
    assert not missing, f"bench.R4_HEADLINE references unknown queries: {missing}"
    assert len(set(bench.R4_HEADLINE)) == len(bench.R4_HEADLINE), "duplicate names"


def test_probe_names_are_registered():
    import scale_probe
    from wsu_cpts_415_spark.registry import REGISTRY
    import wsu_cpts_415_spark.queries  # noqa: F401

    missing = [n for n in scale_probe.PROBE if n not in REGISTRY]
    assert not missing, f"scale_probe.PROBE references unknown queries: {missing}"
    assert len(set(scale_probe.PROBE)) == len(scale_probe.PROBE), (
        "duplicate names in PROBE (each runs twice per probe)"
    )


def test_r3_fixed_subset_still_registered():
    """The cross-round comparison subset must stay runnable forever."""
    import inspect

    import bench
    from wsu_cpts_415_spark.registry import REGISTRY
    import wsu_cpts_415_spark.queries  # noqa: F401

    src = inspect.getsource(bench.main)
    # r3_set is defined inside main(); reconstruct it by executing the
    # assignment block is brittle -- instead assert every headline name
    # in the emitted subtotal set resolves (the set is a subset of
    # HEADLINE by construction, which the first test already covers).
    assert "r3_set" in src
    assert all(n in REGISTRY for n in bench.R4_HEADLINE)
