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


# ---------------------------------------------------------------------------
# Lint #2 (round 11): every raw ``F.broadcast(`` hint must be PROVABLY
# bounded.  An explicit hint bypasses ``spark.sql.autoBroadcastJoinThreshold``,
# so an unbounded side OOMs executors at 100 TB instead of degrading --
# exactly the round-10 `unigram_logprob_score` vocabulary finding.  Unbounded
# sides go through ``ops.staging.maybe_broadcast`` (row+byte gated with a
# shuffle-join fallback); everything that stays a raw hint is adjudicated
# here, keyed by (file, leading identifier of the argument) with the expected
# SITE COUNT pinned -- adding a new site that reuses an allowlisted name
# fails the lint and forces re-adjudication.
#
# Category key used in the justifications:
#   scalar       -- global aggregate, O(1) rows
#   enum         -- grouped by a bounded-cardinality key (event_type, lang,
#                   source, dow, dim index, decile, literal bucket)
#   calendar     -- day/month grain, bounded by elapsed time not data volume
#   pid          -- per-shuffle-partition row (bounded by partition count)
#   fixed-dim    -- TPC-H region/nation: constant rows by spec (5 / 25)
#   scaling-dim  -- TPC-H customer/part/supplier: grows with SF but stays
#                   2-3 orders below the fact side; at true 100 TB these
#                   joins bucket-co-locate instead (documented adjudication)
#   query        -- bounded by the query itself (fixed probe vectors,
#                   literal query terms, literal id filters)
#   sliver       -- bounded by an external batch/request, not the corpus
#                   (micro-batch rows, eval-set shingles, deletion requests)
#   gated        -- raw hint already behind an explicit row-count guard
BROADCAST_ALLOWLIST: dict[str, dict[str, tuple[int, str]]] = {
    "ops/scalable_rank.py": {
        "offsets": (2, "pid: one prefix-offset row per shuffle partition"),
    },
    "pipelines/trending.py": {
        "offsets": (1, "pid: one prefix-offset row per shuffle partition"),
    },
    "pipelines/videos.py": {
        "n": (1, "scalar: global doc count"),
    },
    "streaming/jobs.py": {
        "expected": (1, "enum: per-day-of-week mean (7 rows)"),
        "spread": (1, "scalar: global stddev"),
    },
    "streaming/ingest_dedup.py": {
        "b_bands": (1, "sliver: current micro-batch's LSH band rows"),
        "b_sh": (1, "sliver: current micro-batch's shingle sets"),
        "sa": (1, "sliver: shingle sets of batch-internal candidate docs"),
        "sb": (1, "sliver: shingle sets of batch-internal candidate docs"),
    },
    "queries/aggregates.py": {
        "region": (1, "fixed-dim: region is 5 rows by TPC-H spec"),
    },
    "queries/cohorts.py": {
        "anchor": (1, "scalar: global max purchase ts"),
        "tot": (2, "scalar: global sum / global user count"),
        "totals": (1, "scalar: global count + sum"),
    },
    "queries/corpus_audit.py": {
        "corpus_n": (1, "scalar: global token count"),
        "lang_share": (1, "enum: per-lang token share"),
        "pairs": (1, "enum: distinct event-type pairs (|types|^2)"),
        "src_tot": (1, "enum: per-source token total"),
        "tot": (3, "scalar: global sums (user/weight/vocab totals)"),
    },
    "queries/corpus_ops.py": {
        "del_users": (2, "sliver: GDPR deletion-request batch ids"),
        "q": (1, "enum: per-event-type clip percentiles"),
        "srcdim": (1, "enum: one row per source"),
        "tot": (1, "scalar: global token count"),
    },
    "queries/dedup_policy.py": {
        "new_sh": (1, "sliver: incremental NEW-batch shingle sets"),
        "newb": (1, "sliver: incremental NEW-batch band rows"),
    },
    "queries/events.py": {
        "bounds": (1, "scalar: global min/max day"),
        "contrib": (1, "calendar: one row per day"),
        "earlier": (1, "calendar: one row per day"),
        "offsets": (1, "calendar: one row per day"),
        "pred": (1, "enum: argmax next-type per prev type"),
        "stats": (1, "enum: per-event-type mean/stddev"),
    },
    "queries/experiment_stats.py": {
        "bounds": (1, "scalar: global max observation date"),
        "later": (1, "enum: one BH row per event type"),
        "m": (1, "scalar: number of hypothesis tests"),
        "n_total": (1, "scalar: global subject count"),
        "other": (1, "enum: one p-value row per event type"),
        "overall": (1, "scalar: global mean"),
        "start": (1, "scalar: global min date"),
        "theta": (1, "scalar: CUPED theta + mean"),
        "tot": (2, "scalar: global count aggregates"),
    },
    "queries/joins.py": {
        "customer": (1, "scaling-dim: TPC-H customer"),
        "dim": (1, "query: 4-row literal lookup table"),
        "nation": (1, "fixed-dim: nation is 25 rows by TPC-H spec"),
        "region": (1, "fixed-dim: region is 5 rows by TPC-H spec"),
    },
    "queries/llm_filters.py": {
        "bench": (1, "sliver: eval-set shingles (documented design)"),
        "bench_sizes": (1, "sliver: one row per eval doc"),
    },
    "queries/mixing.py": {
        "tot": (1, "scalar: global doc count + weight sum"),
    },
    "queries/process_mining.py": {
        "n_users": (2, "scalar: global distinct-user count"),
        "pa": (1, "enum: per-event-type support"),
        "pb": (1, "enum: per-event-type support"),
        "peak": (1, "scalar: global max |CUSUM|"),
        "stats": (1, "scalar: global daily mean/stddev"),
    },
    "queries/quantize.py": {
        "qd": (1, "query: the single probe vector, one row per dim"),
        "qv": (1, "query: the single probe vector"),
        "stats": (1, "enum: per-dimension min/max (embedding dims)"),
    },
    "queries/ranking.py": {
        "dfc": (1, "query: df of the literal BM25 query terms"),
        "n": (1, "scalar: global doc count"),
        "stats": (1, "scalar: avgdl + doc count"),
    },
    "queries/relational.py": {
        "customer": (2, "scaling-dim: TPC-H customer"),
        "fa": (1, "scaling-dim: per-partkey order frequency"),
        "fb": (1, "scaling-dim: per-partkey order frequency"),
        "n_orders": (1, "scalar: global distinct order count"),
        "nation": (2, "fixed-dim: nation is 25 rows by TPC-H spec"),
        "p": (1, "scaling-dim: parent pk side of the FK audit"),
        "part": (2, "scaling-dim: TPC-H part"),
        "supplier": (1, "scaling-dim: TPC-H supplier"),
        "tot": (1, "enum: revenue per part type"),
    },
    "queries/similarity.py": {
        "q": (2, "query: the single probe vector"),
    },
    "queries/similarity2.py": {
        "probe": (1, "query: N_PROBE nearest centroid labels"),
        "q": (2, "query: the single probe vector"),
        "queries": (2, "query: literal-bounded probe set (vec_id % k, < cap)"),
    },
    "queries/skyline.py": {
        "frontier": (1, "query: skyline frontier prices (result-sized)"),
        "offs": (1, "pid: one prefix row per shuffle partition"),
    },
    "queries/ssjoin.py": {
        "dfreq": (1, "gated: raw hint behind dfreq.count() <= VOCAB_BCAST_ROWS"
                     " (fixed-width rows, so the row gate is a byte gate)"),
    },
    "queries/stats_audits.py": {
        "boundary": (1, "scalar: decision-boundary row"),
        "bounds": (2, "scalar: global min/max"),
        "expected": (1, "enum: per-day-of-week mean (7 rows)"),
        "full_mean": (1, "scalar: global mean"),
        "mad": (2, "enum/scalar: per-lang MAD + global MAD"),
        "med": (3, "enum/scalar: per-lang medians + global median"),
        "offsets": (2, "pid: one prefix row per shuffle partition"),
        "prior": (1, "scalar: pooled dup-rate prior"),
        "spread": (1, "scalar: global residual stddev"),
        "tot": (5, "scalar/enum: global or per-source totals"),
        "totals": (2, "scalar: global sums"),
    },
    "queries/stats_ops.py": {
        "ml": (1, "enum: per-lang marginal"),
        "ms": (1, "enum: per-source marginal"),
        "tot": (1, "scalar: grand total"),
    },
    "queries/streaming_q.py": {
        "cust": (1, "scaling-dim: TPC-H customer"),
    },
    "queries/text.py": {
        "grand": (1, "scalar: grand token total"),
        "lang_tot": (1, "enum: per-lang token total"),
        "n_b": (1, "scalar: global bigram total"),
        "n_u": (1, "scalar: global unigram total"),
        "sa": (1, "enum: per-source vocab size"),
        "sb": (1, "enum: per-source vocab size"),
    },
    "queries/tpch.py": {
        "customer": (4, "scaling-dim: TPC-H customer"),
        "nation": (2, "fixed-dim: nation is 25 rows by TPC-H spec"),
        "part": (2, "scaling-dim: TPC-H part"),
        "region": (1, "fixed-dim: region is 5 rows by TPC-H spec"),
        "supplier": (1, "scaling-dim: TPC-H supplier"),
    },
    "queries/tpch2.py": {
        "avg_bal": (1, "scalar: global average balance"),
        "customer": (2, "scaling-dim: TPC-H customer"),
        "excluded": (1, "scaling-dim: supplier subset"),
        "max_rev": (1, "scalar: global max revenue"),
        "n1": (2, "fixed-dim: nation alias (25 rows)"),
        "n2": (2, "fixed-dim: nation alias (25 rows)"),
        "nation": (3, "fixed-dim: nation is 25 rows by TPC-H spec"),
        "part": (5, "scaling-dim: TPC-H part (filtered slivers)"),
        "part_avg": (1, "scaling-dim: per-partkey threshold"),
        "part_f": (2, "scaling-dim: part size-filter sliver (q2)"),
        "qualifying": (1, "scaling-dim: supplier subset over promo qty"),
        "region": (2, "fixed-dim: region is 5 rows by TPC-H spec"),
        "sup_nat": (2, "scaling-dim: EUROPE supplier sliver (q2)"),
        "supplier": (6, "scaling-dim: TPC-H supplier"),
        "total": (1, "scalar: 0.5% value threshold"),
    },
    "queries/training_prep.py": {
        "base": (1, "enum: per-lang base rate"),
        "ratio": (1, "enum: N_BUCKETS literal hash buckets"),
        "ref": (1, "enum: per-decile reference mean (10 rows)"),
        "totals": (1, "scalar: global target/raw totals"),
    },
    "queries/windows.py": {
        "nat": (1, "fixed-dim: nation is 25 rows by TPC-H spec"),
    },
}

_BCAST = re.compile(r"F\.broadcast\(")
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _broadcast_sites() -> dict[str, dict[str, int]]:
    """(relative file -> leading identifier -> site count) for every raw
    ``F.broadcast(`` in the package, excluding ops/staging.py (the gate
    itself) and test files."""
    sites: dict[str, dict[str, int]] = {}
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        if rel == "ops/staging.py":
            continue
        src = path.read_text()
        for m in _BCAST.finditer(src):
            i, depth, arg = m.end(), 1, []
            while depth and i < len(src):
                ch = src[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if depth:
                    arg.append(ch)
                i += 1
            a = "".join(arg).strip()
            ident = _IDENT.match(a)
            key = ident.group(0) if ident else a[:30]
            per = sites.setdefault(rel, {})
            per[key] = per.get(key, 0) + 1
    return sites


def test_every_raw_broadcast_hint_is_adjudicated_bounded():
    sites = _broadcast_sites()
    problems: list[str] = []
    for rel, idents in sites.items():
        allowed = BROADCAST_ALLOWLIST.get(rel, {})
        for ident, n in idents.items():
            if ident not in allowed:
                problems.append(
                    f"{rel}: F.broadcast({ident}...) is not adjudicated -- "
                    "route it through ops.staging.maybe_broadcast or add a "
                    "boundedness justification to BROADCAST_ALLOWLIST"
                )
            elif allowed[ident][0] != n:
                problems.append(
                    f"{rel}: F.broadcast({ident}...) has {n} sites, "
                    f"allowlist pins {allowed[ident][0]} -- re-adjudicate"
                )
    # stale entries rot the adjudication: drop them when the site goes away
    for rel, allowed in BROADCAST_ALLOWLIST.items():
        live = sites.get(rel, {})
        for ident in allowed:
            if ident not in live:
                problems.append(
                    f"BROADCAST_ALLOWLIST[{rel!r}][{ident!r}] is stale -- "
                    "the site no longer exists"
                )
    assert not problems, (
        "raw F.broadcast hints bypass autoBroadcastJoinThreshold; every "
        "site must be bounded by construction or gated "
        "(round-10 verdict, unigram_logprob_score class):\n"
        + "\n".join(problems)
    )
