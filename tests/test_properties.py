"""Property-based tests (hypothesis): the ingest codec round-trips
arbitrary well-formed rows, rejects arbitrary malformed ones, and the HLL
approximate distinct count stays within its error bound."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from wsu_cpts_415_spark.io.ingest import decode_crawl
from wsu_cpts_415_spark.io.tables import load_table

# printable, no tabs/newlines (field separators), non-empty
_FIELD = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\t\n\r", categories=("L", "N", "P", "S")
    ),
    min_size=1,
    max_size=12,
)

_ROW = st.fixed_dictionaries(
    {
        "id": _FIELD,
        "uploader": _FIELD,
        "age_days": st.integers(min_value=0, max_value=10_000),
        "category": _FIELD,
        "length_s": st.integers(min_value=0, max_value=100_000),
        "views": st.integers(min_value=0, max_value=10**12),
        "rate": st.floats(
            min_value=0, max_value=5, allow_nan=False, allow_infinity=False
        ),
        "num_ratings": st.integers(min_value=0, max_value=10**9),
        "num_comments": st.integers(min_value=0, max_value=10**9),
        "related": st.lists(_FIELD, min_size=0, max_size=5),
    }
)


def _to_line(r: dict) -> str:
    head = [
        r["id"], r["uploader"], str(r["age_days"]), r["category"],
        str(r["length_s"]), str(r["views"]), repr(r["rate"]),
        str(r["num_ratings"]), str(r["num_comments"]),
    ]
    return "\t".join(head + r["related"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_ROW, min_size=1, max_size=8))
def test_codec_roundtrips_wellformed_rows(spark, rows):
    lines = [(_to_line(r), "f.txt", "0301") for r in rows]
    raw = spark.createDataFrame(lines, ["line", "src_file", "dir_name"])
    typed, rejects = decode_crawl(raw)
    assert rejects.count() == 0
    got = typed.collect()
    assert len(got) == len(rows)
    for g in got:
        # find a source row matching every decoded field
        matches = [
            r for r in rows
            if r["id"] == g["id"]
            and r["age_days"] == g["age_days"]
            and r["views"] == g["views"]
            and abs(r["rate"] - g["video_rate"]) < 1e-9
            and r["related"] == list(g["related_ids"])
        ]
        assert matches, f"decoded row has no source: {g}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    arity=st.integers(min_value=1, max_value=8),
    bad_field=st.sampled_from([2, 4, 5, 6, 7, 8]),
)
def test_codec_rejects_malformed_rows(spark, arity, bad_field):
    # short row (arity < 9) and full-arity row with a non-numeric field
    short = "\t".join(["x"] * arity)
    full = ["id", "up", "1", "cat", "2", "3", "4.0", "5", "6"]
    full[bad_field] = "not-a-number"
    raw = spark.createDataFrame(
        [(short, "f.txt", "0301"), ("\t".join(full), "f.txt", "0301")],
        ["line", "src_file", "dir_name"],
    )
    typed, rejects = decode_crawl(raw)
    assert typed.count() == 0
    assert rejects.count() == 2


def test_approx_distinct_error_bound(spark):
    """HLL++ at default rsd (5%): the approximation must land within 3x
    the advertised relative error of the exact count on real fixture
    keys."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.15


# ---------------------------------------------------------------------------
# Corpus-op invariants (pure-Python mirrors of the registered queries'
# expression logic, checked against the Spark results at sf0.01)
# ---------------------------------------------------------------------------


def test_chunking_reconstructs_documents(spark):
    """Every document's token stream must be exactly recoverable from its
    chunks: chunk 0 plus the post-overlap tail (tokens after position
    CHUNK-STRIDE) of each subsequent chunk, in chunk order."""
    from wsu_cpts_415_spark.queries.corpus_ops import CHUNK, STRIDE, doc_chunk_windows

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    chunks: dict[int, list[tuple[int, list[str]]]] = {}
    for r in doc_chunk_windows(spark, SF_ORACLE).collect():
        chunks.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"].split(" "))
        )
    assert set(chunks) == set(docs)
    overlap = CHUNK - STRIDE
    for doc_id, parts in chunks.items():
        parts.sort()
        rebuilt = list(parts[0][1])
        for idx, toks in parts[1:]:
            # consecutive chunks overlap by CHUNK-STRIDE tokens (except a
            # final short chunk, which may carry fewer than overlap tokens)
            assert toks[:overlap] == rebuilt[idx * STRIDE : idx * STRIDE + overlap]
            rebuilt.extend(toks[overlap:])
        assert rebuilt == docs[doc_id], f"doc {doc_id} not reconstructible"


@given(
    x=st.integers(min_value=0, max_value=255),
    y=st.integers(min_value=0, max_value=255),
)
@settings(deadline=None, max_examples=200)
def test_morton_interleave_is_invertible(x, y):
    """The z-value must encode (x, y) losslessly: deinterleaving the
    Python-evaluated expression recovers both coordinates, and the
    z-order curve preserves the prefix property (equal high bits =>
    nearby cells)."""
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (rx, ry) == (x, y)


def test_split_partitions_the_corpus(spark):
    """train/val/test must be a partition: every document in exactly one
    split, and the split totals must sum to the corpus size."""
    from wsu_cpts_415_spark.queries.corpus_ops import train_val_test_split

    rows = train_val_test_split(spark, SF_ORACLE).collect()
    n_total = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    assert {r["split"] for r in rows} == {"train", "val", "test"}


def test_interleave_positions_are_a_bijection(spark):
    """Interleaved positions must be exactly 1..N with no gaps or dupes,
    and within one source the round numbers must increase with position
    (no source ever goes backwards)."""
    from wsu_cpts_415_spark.queries.corpus_ops import interleave_sources

    rows = interleave_sources(spark, SF_ORACLE).collect()
    positions = [r["pos"] for r in rows]
    assert sorted(positions) == list(range(1, len(rows) + 1))
    by_source: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: r["pos"]):
        by_source.setdefault(r["source"], []).append(r["round"])
    for src, rounds in by_source.items():
        assert rounds == sorted(rounds), f"{src} interleaves out of order"


def test_label_propagation_is_partitioning_invariant(spark):
    """LPA labels are a pure function of the graph: rerunning under a
    different shuffle-partition setting yields the identical labeling
    (the determinism randomSplit-style operators cannot give)."""
    from wsu_cpts_415_spark.queries.graph_ops import label_propagation

    base = {
        (r["node"], r["community"])
        for r in label_propagation(spark, SF_ORACLE).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {
            (r["node"], r["community"])
            for r in label_propagation(spark, SF_ORACLE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_label_propagation_respects_graph_blocks(spark):
    """The fixture graph is built as ring-connected blocks of 50 vertices
    (pipelines/videos.py): propagated labels must never cross a block
    boundary, and isolated vertices must keep their own id."""
    from wsu_cpts_415_spark.pipelines.videos import BLOCK
    from wsu_cpts_415_spark.queries.graph_ops import label_propagation

    for r in label_propagation(spark, SF_ORACLE).collect():
        node_n = int(r["node"][1:])
        comm_n = int(r["community"][1:])
        assert node_n // BLOCK == comm_n // BLOCK or node_n == comm_n


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@settings(
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kcore_peel_matches_python_fixpoint(spark, edges, k):
    """The distributed bounded-round peel (with early exit) lands on the
    true k-core fixpoint of arbitrary small graphs."""
    from wsu_cpts_415_spark.queries.graph_ops2 import kcore_peel

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    # pure-python fixpoint peel
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    live = set(adj)
    while True:
        drop = {v for v in live if len(adj[v] & live) < k}
        if not drop:
            break
        live -= drop
    want = sorted((v, len(adj[v] & live)) for v in live)

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = sorted(
        (r["id"], r["d"]) for r in kcore_peel(df, k, rounds=20).collect()
    )
    assert got == want


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key
                st.integers(min_value=0, max_value=3),   # tracked value
            ),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(
    deadline=None,
    max_examples=6,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_reference_model(spark, tmp_path_factory, batches):
    """merge_scd2 against a dict-based SCD-2 simulation over arbitrary
    batch sequences: same current rows, same closed history."""
    from wsu_cpts_415_spark.io.maintenance import merge_scd2, scd2_init

    store = str(tmp_path_factory.mktemp("scd2prop") / "store")
    init = [(k, k * 10) for k in range(3)]  # keys 0-2 live at v1
    spark.createDataFrame(init, "k long, v long").createOrReplaceTempView("_i")
    scd2_init(
        spark, store, spark.createDataFrame(init, "k long, v long"), version=1
    )

    # python model: key -> list of [v, valid_from, valid_to]
    model = {k: [[v, 1, None]] for k, v in init}
    version = 1
    for batch in batches:
        version += 1
        dedup = {}
        for k, v in batch:  # last write in a batch wins, like the frame
            dedup[k] = v
        bdf = spark.createDataFrame(
            [(k, v) for k, v in sorted(dedup.items())] or [],
            "k long, v long",
        )
        merge_scd2(
            spark, store, bdf, keys=["k"], tracked=["v"], version=version
        )
        for k, v in dedup.items():
            if k in model:
                cur = model[k][-1]
                if cur[0] != v:
                    cur[2] = version
                    model[k].append([v, version, None])
            else:
                model[k] = [[v, version, None]]

    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in __import__("pyspark").sql.SparkSession.getActiveSession()
        .read.parquet(store)
        .collect()
    )
    want = sorted(
        (k, v, vf, vt, vt is None)
        for k, rows in model.items()
        for v, vf, vt in rows
    )
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=14,
    ),
    max_hops=st.integers(min_value=1, max_value=4),
)
@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bfs_matches_python_bfs(spark, edges, max_hops):
    """The frontier BFS kernel equals a queue BFS on arbitrary digraphs,
    any root, any hop bound."""
    import collections

    from wsu_cpts_415_spark.queries.graph_ops import bfs_hops

    root = min(a for a, _ in edges)
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    want = {root: 0}
    q = collections.deque([root])
    while q:
        v = q.popleft()
        if want[v] >= max_hops:
            continue
        for w in adj[v]:
            if w not in want:
                want[w] = want[v] + 1
                q.append(w)
    edf = spark.createDataFrame(edges, "src long, dst long")
    rdf = spark.createDataFrame([(root,)], "id long")
    got = {r["id"]: r["hops"] for r in bfs_hops(edf, rdf, max_hops).collect()}
    assert got == want


def _write_events(tmpdir, rows):
    """rows: (event_id, user_id, ts_offset_sec, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_704_067_200_000_000  # 2024-01-01 in us
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + r[2] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return str(tmpdir)


_EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),  # event_id (deduped below)
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=3600),  # ts offset sec
        st.sampled_from(["click", "purchase"]),
        st.integers(min_value=0, max_value=60),  # integer value (exact sums)
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)


@given(rows=_EVENT_ROWS)
@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pit_join_matches_python_asof(spark, tmp_path_factory, rows):
    """The union-merge PIT join equals the brute-force per-purchase
    cumulative-tier model on arbitrary event streams."""
    from wsu_cpts_415_spark.queries.temporal import (
        TIER_CAP,
        TIER_UNIT,
        pit_join_user_tier,
    )

    d = _write_events(tmp_path_factory.mktemp("pit"), rows)
    want = {}
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        cum = by_user.get(r[1], 0) + r[4]
        by_user[r[1]] = cum
        if r[3] == "purchase":
            want[r[0]] = min(TIER_CAP, int(cum // TIER_UNIT))
    got = {
        r["event_id"]: r["tier"]
        for r in pit_join_user_tier(spark, d).collect()
    }
    assert got == want


@given(rows=_EVENT_ROWS)
@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_coverage_matches_python_merge(spark, tmp_path_factory, rows):
    """Interval-union coverage equals the brute-force sweep merge."""
    from wsu_cpts_415_spark.queries.temporal import (
        COVER_SEC,
        interval_coverage_per_user,
    )

    d = _write_events(tmp_path_factory.mktemp("cov"), rows)
    want = {}
    users = sorted({r[1] for r in rows})
    for u in users:
        ivs = sorted(
            (r[2], r[2] + COVER_SEC) for r in rows if r[1] == u
        )
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[u] = (len(islands), sum(e - s for s, e in islands))
    got = {
        r["user_id"]: (r["n_islands"], r["covered_sec"])
        for r in interval_coverage_per_user(spark, d).collect()
    }
    assert got == want


def test_boilerplate_strip_reconstruction_identity(spark, monkeypatch):
    """The line segmentation + rebuild must be a lossless round-trip:
    with the document-frequency threshold out of reach nothing is
    flagged, so clean_text must equal the original text for EVERY doc
    (catches off-by-one slice bounds, trailing-partial-line handling,
    and join separators)."""
    import wsu_cpts_415_spark.queries.llm_filters as lf

    monkeypatch.setattr(lf, "BOILERPLATE_DF", 10**9)
    out = lf.boilerplate_strip(spark, SF_ORACLE)
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    diff = (
        out.join(docs, "doc_id")
        .filter(
            (F.col("clean_text") != F.col("text")) | (F.col("n_removed") != 0)
        )
        .count()
    )
    assert diff == 0


def test_peak_concurrency_matches_bruteforce(spark, tmp_path):
    """peak_concurrent_sessions' bucket-prefix sweep against a plain
    Python sweep on randomized event sets: sessionization (60-min gap),
    ends-before-starts tie rule, peak value AND first-peak timestamp
    must all agree -- the randomized complement to the fixture-bound
    DuckDB oracle."""
    import datetime as dt
    import random

    from wsu_cpts_415_spark.queries.events import SESSION_GAP_MIN
    from wsu_cpts_415_spark.registry import all_queries

    q = all_queries()["peak_concurrent_sessions"].fn
    base = dt.datetime(2024, 3, 1)
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for user in range(12):
            t = base + dt.timedelta(minutes=rng.randint(0, 600))
            for _ in range(rng.randint(1, 15)):
                rows.append((eid, t, user, "click", 1.0, None))
                eid += 1
                # mix of intra-session steps and session-breaking gaps
                t += dt.timedelta(
                    minutes=rng.choice([1, 5, 20, 59, 61, 200, 1500])
                )
        sf_dir = str(tmp_path / f"pc_{seed}")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(f"{sf_dir}/events.parquet")

        got = q(spark, sf_dir).collect()[0]

        # python oracle: sessionize per user, sweep with ends-first ties
        per_user = {}
        for _eid, ts, user, *_ in rows:
            per_user.setdefault(user, []).append(ts)
        sessions = []
        for user, tss in per_user.items():
            tss.sort()
            start = prev = tss[0]
            for ts in tss[1:]:
                if (ts - prev).total_seconds() > SESSION_GAP_MIN * 60:
                    sessions.append((start, prev))
                    start = ts
                prev = ts
            sessions.append((start, prev))
        points = [(s, 1) for s, _ in sessions] + [(e, -1) for _, e in sessions]
        points.sort(key=lambda p: (p[0], p[1]))
        conc = peak = 0
        first_peak = None
        for ts, d in points:
            conc += d
            if conc > peak:
                peak, first_peak = conc, ts
        assert got["peak_concurrency"] == peak, f"seed {seed}"
        assert got["first_peak_ts"] == first_peak, f"seed {seed}"
        assert got["n_sessions"] == len(sessions), f"seed {seed}"


def test_wasserstein_drift_matches_bruteforce(spark, tmp_path):
    """wasserstein_value_drift's prefix-window integral against a plain
    Python ECDF integration on randomized value sets."""
    import datetime as dt
    import random

    from wsu_cpts_415_spark.registry import all_queries

    q = all_queries()["wasserstein_value_drift"].fn
    base = dt.datetime(2024, 3, 1)
    rng = random.Random(41)
    rows = []
    for eid in range(400):
        # drift by construction: later half shifted upward
        late = eid >= 200
        v = round(rng.uniform(0, 100) + (25 if late else 0), 2)
        rows.append(
            (
                eid,
                base + dt.timedelta(minutes=eid * 10),
                eid % 7,
                "click" if eid % 2 else "view",
                v,
                None,
            )
        )
    sf_dir = str(tmp_path / "wd")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {r["event_type"]: r["w1_distance"] for r in q(spark, sf_dir).collect()}

    ts_all = [r[1] for r in rows]
    lo, hi = min(ts_all), max(ts_all)
    mid = lo + (hi - lo) / 2
    for etype in ("click", "view"):
        a = sorted(r[4] for r in rows if r[3] == etype and r[1] < mid)
        b = sorted(r[4] for r in rows if r[3] == etype and r[1] >= mid)
        support = sorted(set(a) | set(b))
        w1 = 0.0
        for v, nv in zip(support, support[1:]):
            fa = sum(1 for x in a if x <= v) / len(a)
            fb = sum(1 for x in b if x <= v) / len(b)
            w1 += abs(fa - fb) * (nv - v)
        assert abs(got[etype] - round(w1, 6)) < 1e-4, etype
        assert got[etype] > 5  # the planted +25 shift must register
