"""Local mirror of the driver's oracle-differential check.

The implementation lives in the engine itself
(wsu_cpts_415_spark/ops/conformance.py) so users get the same checker
via `python -m wsu_cpts_415_spark conformance`; this module re-exports
it for the test suite's historical import path.
"""

from __future__ import annotations

from wsu_cpts_415_spark.ops.conformance import (  # noqa: F401
    FLOAT_DECIMALS,
    _norm_cell,
    compare,
    driver_canonicalize,
    duck_connect,
    normalize,
)
