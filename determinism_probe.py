#!/usr/bin/env python3
"""Registry-wide run-to-run determinism probe: build and execute every
registered query TWICE in one session and compare driver-normalized row
sets.  The historical flaky-red class (the r03 events-timestamp windows,
the r01 canonicalizer crashes) was exactly run-to-run nondeterminism
that a single Spark-vs-DuckDB diff can miss when both runs happen to
land the same way -- this probe attacks it directly.

    python determinism_probe.py [sf_dir]    # default /root/testdata/sf0.01

Prints one JSON line {"n": ..., "nondeterministic": [names], "errors":
[names]} and exits nonzero if any query's two runs disagree.  Staged
projections are cleared between the two sweeps so run 2 rebuilds every
cached layer (the memo must change latency, never values).
"""

from __future__ import annotations

import json
import sys

from wsu_cpts_415_spark.ops.conformance import normalize
from wsu_cpts_415_spark.ops.staging import clear_staged
from wsu_cpts_415_spark.registry import all_queries
from wsu_cpts_415_spark.session import get_spark


def sweep(spark, sf_dir: str) -> dict[str, object]:
    out: dict[str, object] = {}
    for name, q in sorted(all_queries().items()):
        try:
            out[name] = normalize(q.fn(spark, sf_dir).toPandas())
        except Exception as exc:
            out[name] = f"ERROR: {str(exc)[:120]}"
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="determinism-probe")
    # Optional cross-partition mode (round 10): SPARK_GRAFT_DET_PARTS
    # = "A,B" runs sweep 1 at shuffle.partitions=A and sweep 2 at B, so
    # the artifact certifies PARTITION-COUNT invariance (summation
    # order must never leak into values) for the whole registry, not
    # just run-to-run stability at one setting.
    import os

    parts_spec = os.environ.get("SPARK_GRAFT_DET_PARTS")
    parts = [p.strip() for p in parts_spec.split(",")] if parts_spec else None
    key = "spark.sql.shuffle.partitions"
    # each sweep gets its OWN durable-staging root: since round 11 the
    # heavy projections persist as fingerprint-keyed parquet
    # (ops/staging.py staged_table), and a shared root would let sweep 2
    # READ sweep 1's tables -- the certificate must instead prove that a
    # REBUILD at the second partition count reproduces identical values
    import tempfile

    roots = [tempfile.mkdtemp(prefix="det_staging_") for _ in range(2)]
    if parts:
        spark.conf.set(key, parts[0])
    os.environ["SPARK_GRAFT_STAGING_DIR"] = roots[0]
    first = sweep(spark, sf_dir)
    clear_staged()
    if parts:
        spark.conf.set(key, parts[1])
    os.environ["SPARK_GRAFT_STAGING_DIR"] = roots[1]
    second = sweep(spark, sf_dir)
    bad = [
        n
        for n in first
        if not isinstance(first[n], str) and first[n] != second[n]
    ]
    errors = sorted(
        n for n in first if isinstance(first[n], str) or isinstance(second[n], str)
    )
    out = {"n": len(first), "nondeterministic": sorted(bad), "errors": errors}
    if parts:
        out["shuffle_partitions"] = parts
    print(json.dumps(out))
    return 1 if bad or errors else 0


if __name__ == "__main__":
    sys.exit(main())
