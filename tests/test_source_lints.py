"""Source-level scale lints: rules SCALE.md states that no plan gate
can see, enforced as greps over the package source.

Lint #1 encodes lesson #9 (round 8): a higher-order-function expression
materializes its ENTIRE result array per row, so
``flatten(transform(<collection>, ...))`` feeding a generator allocates
the whole product in one task -- ``exact_jaccard_pairs`` built each
shingle's df^2 pair list that way and a df=50k shingle OOM'd the JVM
at the x10 probe scale.  Super-linear generators must be CHAINS of
explodes (streamed), never a flatten(transform(...)) (allocated).  A
``flatten(transform(sequence(<literal>, <literal>), ...))`` is exempt:
its size is a compile-time constant (geo's 3x3 neighbor cells)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "wsu_cpts_415_spark"

# literal-bounded outer collection: sequence(<int>, <int>) with constant
# endpoints -- the array's size is known at authoring time
_LITERAL_SEQ = re.compile(r"flatten\(transform\(sequence\(-?\d+,\s*-?\d+\)")
_PATTERN = re.compile(r"flatten\(transform\(")


def test_no_data_dependent_flatten_transform():
    offenders: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]  # lint code, not commentary
            for m in _PATTERN.finditer(code):
                if not _LITERAL_SEQ.match(code, m.start()):
                    offenders.append(
                        f"{path.relative_to(PKG.parent)}:{lineno}: {line.strip()}"
                    )
    assert not offenders, (
        "data-dependent flatten(transform(...)) allocates the whole "
        "product array in one row (SCALE.md lesson #9) -- rewrite as a "
        "chain of explodes, or bound the outer collection with a "
        "literal sequence():\n" + "\n".join(offenders)
    )
