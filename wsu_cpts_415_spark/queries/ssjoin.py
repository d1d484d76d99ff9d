"""Exact set-similarity join via prefix filtering (PPJoin-style).

The third exact-Jaccard kernel in the engine, complementing the
posting-list join (``text.ngram_jaccard_pairs``) and the block-matmul
(``text.ngram_jaccard_matmul``): order every document's shingles by a
single GLOBAL total order (ascending document frequency, then hash),
keep only the ``n - ceil(tau*n) + 1`` rarest shingles as the document's
*prefix*, and generate candidate pairs only from shared prefix shingles.
The prefix-filter lemma guarantees exact recall: any pair with
``J(A,B) >= tau`` must share at least one prefix token, because
``J >= tau`` forces ``|A ∩ B| >= ceil(tau * max(|A|,|B|))`` (given the
size filter ``tau*|A| <= |B| <= |A|/tau``), and two sets whose
intersection is that large cannot avoid each other's
rarest-``(n - ceil(tau*n) + 1)`` prefixes under a common total order
(Chaudhuri et al., SSJoin; Xiao et al., PPJoin).

Scale posture (100 TB): candidate generation cost is
``sum over prefix shingles of df_prefix(s)^2`` -- prefixes concentrate
on the RAREST shingles, so on a Zipfian corpus the blowup sits orders
of magnitude below the full posting-list join.  Plan shape:

  * tokens are 64-bit hashes from the first projection on -- strings
    never shuffle;
  * the document-frequency table is vocabulary-sized; it is broadcast
    into the tagging join under an explicit row bound
    (``VOCAB_BCAST_ROWS``) and falls back to a shuffle join above it;
  * size filter pushed into the self-join in exact integer form
    (``5*nb >= 4*na`` for tau=4/5 -- no float boundary risk), with
    ASYMMETRIC prefixes (PPJoin's probing-prefix refinement): the
    larger side keeps the full ``n - ceil(tau*n) + 1`` prefix, the
    smaller side only its ``n - ceil(2*tau/(1+tau)*n) + 1`` probing
    prefix (proof in ``_ssjoin_frames``);
  * the size filter is ALSO a join-key component: docs carry an
    integer-exact geometric length bucket (``_len_bucket_bounds``) and
    the hash join matches on (token, bucket) with the probe side
    exploded to its own and the next bucket -- postings of
    size-incompatible docs never even meet in the hash table;
  * generation-time sketch (round 9): each prefix row carries
    ``SKETCH_BUCKETS`` byte counters packed into 2 longs; the
    sum-of-bucket-minima upper bound on the intersection evaluates
    branch-free INSIDE the join condition, so a coincidental
    rare-token pair dies before the positional aggregate's shuffle
    ever materializes it (x100: 144.6M join rows -> 284,686);
  * positional filter with ACCUMULATED overlap (the actual PPJoin
    filter): one hash aggregate per (doc_a, doc_b) pair counts the
    shared prefix tokens ``c`` and the LAST shared ranks
    ``(imax, jmax)``; pairs with
    ``c + min(na - imax, nb - jmax) < ceil(tau/(1+tau)*(na+nb))`` die
    before any doc-grain table is joined;
  * histogram suffix filter (PPJoin+'s suffix filter, flattened to
    vectorized expressions): per doc a ``HIST_BUCKETS``-int histogram
    of ``pmod(xxhash64(shingle), B)``; ``sum_k min(ha[k], hb[k])`` is
    an exact upper bound on the intersection, so pairs whose bound
    misses the required overlap die before the wide compact arrays are
    attached -- this is the stage that kills coincidental
    rare-prefix-collision pairs the positional bound structurally
    cannot (an early shared rare token leaves min(na-i, nb-j) ~ n);
  * verification joins only suffix survivors back to the compact
    per-doc hash arrays and intersects two ~|doc| integer arrays per
    pair; the doc-grain histogram/compact sides broadcast under
    ``DOC_SIDE_BCAST_ROWS`` (above it: shuffle join locally, bucketed
    co-location at 100 TB).

The prefix table is session-staged (ops/staging.py) so the self-join
reads one persisted table from both sides instead of re-aggregating
the corpus per alias -- the local analogue of writing the prefix index
as a staged layer, which is exactly how a 100 TB SSJoin deploys.

Honest fixture note: this synthetic corpus has a deliberately narrow
vocabulary (931 distinct shingles at sf0.1), so prefix df's stay large
and token order alone prunes weakly -- which is exactly why round 9
moved two more bounds INTO pair generation.  Measured funnel
(scale_probe_er_x100_r9.json) at x100: 284,686 prefix-join rows ->
116,014 distinct candidate pairs -> 90,396 after the accumulated
positional bound -> 25,743 after the histogram suffix filter = exactly
the 25,743 verified pairs.  Round 8's generation (token-hash key only,
no generation-time sketch) enumerated 144.6M join rows at the same
scale for the same verified output -- a 508x cut from (a) the length
bucket keeping size-incompatible postings out of the hash match and
(b) the packed sketch killing coincidental-rare-token pairs inside the
join condition, before the positional aggregate's shuffle ever sees
them.  x100 wall fell 104 s -> 19.1 s warm / 52.4 s cold incl.
staging.  Every funnel stage grows linearly in corpus size across
x10/x100 (x10: 28,728 -> 11,721 -> 9,104 -> 2,569 = 2,569).

Reference scope: the reference engine's duplicate detection is exact
key equality (big_data/scripts/duplicate_checker.py:24-61); threshold
similarity joins belong to this repo's mandated LLM-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.registry import register

# tau = 4/5 exactly; every derived bound below is computed in integer
# arithmetic so Spark and the oracle cannot disagree at boundaries.
TAU_NUM, TAU_DEN = 4, 5

# Broadcast the (token, df) table only below this row count; above it
# the tagging join falls back to a shuffle join on the token hash.
VOCAB_BCAST_ROWS = 2_000_000

# Broadcast the doc-grain histogram/compact-array side tables only below
# this row count (they carry ~0.3-0.5 KB per doc); above it the filter
# and verify joins fall back to shuffle joins -- at true 100 TB scale
# the bucketed layout co-locates them instead.
DOC_SIDE_BCAST_ROWS = 1_000_000

# suffix-filter histogram width: shingle hashes bucketed by
# pmod(xxhash64, HIST_BUCKETS); sum-of-per-bucket-minima is an EXACT
# upper bound on |A intersect B| (the intersection partitions across
# buckets), tight enough at 64 buckets to separate near-dups from
# coincidental prefix collisions (measured: see module docstring)
HIST_BUCKETS = 64

# generation-time sketch: the same bucket-minima bound, shrunk to
# SKETCH_BUCKETS byte counters packed into SKETCH_BUCKETS/8 longs and
# carried ON each prefix row, so the bound evaluates INSIDE the join
# condition (pure shifts/ands/leasts, whole-stage codegen) and a false
# pair dies before it is ever emitted into the positional aggregate's
# shuffle.  Counters saturate at 255 (saturated-vs-saturated minima are
# treated as unbounded, so the bound stays a true UPPER bound); a
# different hash seed than the 64-bucket histogram keeps the two
# filters' misses independent.
SKETCH_BUCKETS = 16
_SKETCH_LONGS = SKETCH_BUCKETS // 8

_DUCK_EXACT_ABOVE = """
    WITH shingles AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1]
               ))) AS shingle
        FROM documents
    ),
    sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
        FROM shingles GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM shingles a
        JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    -- exact rational threshold J >= num/den, integer arithmetic on
    -- BOTH engines: n_common/(na+nb-n_common) >= num/den iff
    -- (num+den)*n_common >= num*(na+nb).  Thresholding the ROUNDED
    -- double instead would admit pairs whose true Jaccard sits within
    -- 5e-7 below tau -- pairs the prefix-filter lemma never promises
    -- to enumerate, i.e. a theoretical engine/oracle edge.
    WHERE {tn_plus_td} * n_common >= {tn} * (sa.n_sh + sb.n_sh)
    ORDER BY doc_a, doc_b
""".format(tn=TAU_NUM, tn_plus_td=TAU_NUM + TAU_DEN)


def _ceil_frac(expr, num: int, den: int):
    """ceil(num*expr/den) for a non-negative integer column, exactly."""
    return F.floor((num * expr + den - 1) / den)


def _len_bucket_bounds(
    tau_num: int, tau_den: int, max_n: int = 1 << 40
) -> list[int]:
    """Geometric length-bucket lower bounds, integer-exact: t[0] = 1,
    t[k+1] = floor(t[k]*den/num) + 1 (the smallest integer strictly
    above t[k]*den/num).  bucket(n) = #bounds <= n, minus 1.  For any
    valid pair (na >= nb, tau_den*nb >= tau_num*na):
    bucket(na) - bucket(nb) in {{0, 1}} -- let k = bucket(nb), so
    nb <= t[k+1] - 1; then na <= nb*den/num <= (t[k+1]-1)*den/num
    < t[k+2], hence bucket(na) <= k+1.  Integer recurrence, so no
    float-boundary doc can ever be mis-bucketed (a log-based bucket
    would risk exactly that at boundary sizes).

    tau = 1 degenerates: the recurrence's geometric factor is 1, the
    list would enumerate every integer up to max_n (an effective hang
    -- caught by tests/test_ssjoin_bounds.py's property sweep over
    tau fractions), and valid pairs have na == nb anyway, so ONE
    bucket is exact.

    The list cap is small (512) because every bound is INLINED as an
    array literal into one Catalyst expression (``_prefix_staged``'s
    bucket lookup) -- a tau within 1/512 of 1 would otherwise inline
    tens of thousands of literals into the plan.  Tail-merge is SAFE,
    not just bounded: docs beyond the last bound all land in the top
    bucket, which can only SHRINK the bucket gap of a valid pair
    (bucket indices are clamped, never raised), so the probe side's
    {{bkt, bkt+1}} emission still covers every pair the unmerged
    bucketing would.  At 512 geometric bounds the merged tail starts
    above (den/num)^511 -- unreachable for any practical tau/corpus;
    only near-1 taus ever merge, and they merge correctly."""
    if tau_num >= tau_den:
        return [1]
    bounds = [1]
    max_len = 512
    while bounds[-1] <= max_n and len(bounds) < max_len:
        bounds.append(bounds[-1] * tau_den // tau_num + 1)
    return bounds


def _sketch_of(ex: DataFrame) -> DataFrame:
    """(doc_id, sk0..): per-doc generation-time sketch from the exploded
    (doc_id, sh) token table -- SKETCH_BUCKETS byte counters of
    ``pmod(xxhash64(sh, 1), SKETCH_BUCKETS)`` occupancy, packed 8 to a
    long (disjoint byte lanes, so lane-wise addition never carries).
    Extraction uses unsigned shifts because the top lane's bit pattern
    may set the sign bit.  A doc with ANY bucket count above 255 (a
    byte lane cannot hold it) gets NULL sketch longs -- the sentinel
    the bound coalesces to "unbounded", keeping the filter a true
    upper bound without any per-byte branch at probe time.  Built as
    two grouped aggregates over the ALREADY-exploded rows (a per-token
    partial-aggregating shuffle at staging time) -- the first cut
    evaluated 16 ``filter(shingles, ...)`` array scans per doc instead
    and doubled the staging build's wall at x10."""
    bucketed = ex.groupBy(
        "doc_id",
        F.pmod(F.xxhash64("sh", F.lit(1)), F.lit(SKETCH_BUCKETS)).alias(
            "b16"
        ),
    ).agg(F.count("*").alias("cnt"))
    sk_exprs = [
        F.expr(
            f"sum(CASE WHEN b16 >= {8 * li} AND b16 < {8 * li + 8} THEN"
            f" shiftleft(least(cnt, 255L), CAST((b16 - {8 * li}) * 8 AS INT))"
            " ELSE 0L END)"
        )
        .cast("long")
        .alias(f"_rawsk{li}")
        for li in range(_SKETCH_LONGS)
    ]
    packed = bucketed.groupBy("doc_id").agg(
        F.max("cnt").alias("_mx"), *sk_exprs
    )
    overflow = F.col("_mx") > 255
    return packed.select(
        "doc_id",
        *[
            F.when(overflow, F.lit(None).cast("long"))
            .otherwise(F.col(f"_rawsk{li}"))
            .alias(f"sk{li}")
            for li in range(_SKETCH_LONGS)
        ],
    )


def _sketch_bound(prefix_a: str, prefix_b: str):
    """Upper bound on |A intersect B| from the packed sketches of two
    join aliases: sum over buckets of min(byte_a, byte_b).  Validity:
    any doc whose true bucket count would not fit a byte carries NULL
    sketch longs (see ``_sketch_of``), the NULL propagates through the
    shift/add chain, and the final coalesce turns it into "unbounded"
    -- so every stored byte is EXACT and per-bucket min is a true
    bound, with zero per-byte branches.  Branch-freedom is
    load-bearing: a CASE WHEN per byte made the generated join-
    condition code fall off the fast path and cost ~30 s where this
    form costs ~2 s on the same 14.5M evaluated pairs (x10 probe)."""
    total = F.lit(0).cast("long")
    for li in range(_SKETCH_LONGS):
        xa = F.col(f"{prefix_a}.sk{li}")
        xb = F.col(f"{prefix_b}.sk{li}")
        for j in range(8):
            a_k = F.shiftrightunsigned(xa, 8 * j).bitwiseAND(F.lit(255))
            b_k = F.shiftrightunsigned(xb, 8 * j).bitwiseAND(F.lit(255))
            total = total + F.least(a_k, b_k)
    # NULL (either side unbounded) -> pass unconditionally
    return F.coalesce(total, F.lit(1 << 62))


def _prefix_staged(
    spark: SparkSession,
    sf_dir: str,
    tau_num: int = TAU_NUM,
    tau_den: int = TAU_DEN,
) -> DataFrame:
    """(sh, doc_id, rk, n, bkt, sk0..): one row per PREFIX shingle-hash
    of each document -- its ``n - ceil(tau*n) + 1`` globally-rarest
    shingles, ranked by the (df asc, hash asc) total order -- carrying
    the doc's integer length bucket (join key component; see
    ``_len_bucket_bounds``) and its packed generation-time sketch (join
    condition component; see ``_sketch_cols``).  Session-staged PER TAU
    so the self-join consumes one persisted table from both aliases."""
    from wsu_cpts_415_spark.ops.staging import staged
    from wsu_cpts_415_spark.queries.similarity import _h64_staged

    def build() -> DataFrame:
        # r12: derive from the staged narrow (doc_id, h64) layer --
        # size/explode of h64 equal size/explode of the rehashed
        # string shingles element-for-element, without re-running the
        # interpreted transform+xxhash over every shingle per build
        hashed = _h64_staged(spark, sf_dir)
        ex = hashed.select(
            "doc_id",
            F.size("h64").alias("n"),
            F.explode("h64").alias("sh"),
        )
        dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
        if dfreq.count() <= VOCAB_BCAST_ROWS:
            dfreq = F.broadcast(dfreq)
        p = (F.col("n") - _ceil_frac(F.col("n"), tau_num, tau_den) + 1).cast(
            "int"
        )
        bounds = _len_bucket_bounds(tau_num, tau_den)
        bkt = F.expr(
            "size(filter(array({}), t -> t <= n)) - 1".format(
                ", ".join(f"{b}L" for b in bounds)
            )
        ).cast("int")
        docmeta = _sketch_of(ex)
        return (
            ex.join(dfreq, "sh")
            .groupBy("doc_id", "n")
            .agg(
                F.sort_array(F.collect_list(F.struct("df", "sh"))).alias(
                    "arr"
                )
            )
            .join(docmeta, "doc_id")
            .select(
                "doc_id",
                "n",
                bkt.alias("bkt"),
                *[f"sk{i}" for i in range(_SKETCH_LONGS)],
                F.posexplode(F.slice("arr", 1, p)),
            )
            .select(
                F.col("col.sh").alias("sh"),
                "doc_id",
                (F.col("pos") + 1).alias("rk"),
                "n",
                "bkt",
                *[f"sk{i}" for i in range(_SKETCH_LONGS)],
            )
        )

    return staged(spark, f"ssjoin_prefix_tau{tau_num}_{tau_den}", sf_dir, build)


def _hist_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hist): per document, the {HIST_BUCKETS}-bucket histogram
    of its shingle hashes (``pmod(xxhash64(s), B)``) as an exact
    ``array<int>``.  For any two docs, ``sum_k min(hist_a[k],
    hist_b[k]) >= |A intersect B|`` (the intersection partitions across
    buckets and each bucket's share is at most the smaller occupancy) --
    the PPJoin+ suffix filter's divide-and-conquer bound, flattened to
    one fixed partition of the token space so it evaluates as pure
    vectorized expressions per candidate instead of per-pair binary
    searches.  Session-staged: doc-count rows x ~0.3 KB."""
    from wsu_cpts_415_spark.ops.staging import staged
    from wsu_cpts_415_spark.queries.similarity import _h64_staged

    def build() -> DataFrame:
        # r12: bucket the staged 64-bit hashes directly -- the old form
        # re-ran xxhash64 over every shingle ONCE PER BUCKET inside the
        # filter lambda (HIST_BUCKETS x |shingles| interpreted hash
        # calls per doc); pmod over the staged h64 array is the same
        # partition of the token space by construction
        return _h64_staged(spark, sf_dir).select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {HIST_BUCKETS - 1}), k ->"
                f" size(filter(h64, h ->"
                f" pmod(h, {HIST_BUCKETS}) = k)))"
            ).alias("hist"),
        )

    return staged(spark, f"ssjoin_hist{HIST_BUCKETS}", sf_dir, build)


def _ssjoin_frames(
    spark: SparkSession,
    sf_dir: str,
    tau_num: int = TAU_NUM,
    tau_den: int = TAU_DEN,
    probe_pred=None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The kernel's four stages as frames -- (prefix-join rows,
    candidates surviving the positional bound, candidates surviving the
    histogram suffix filter, verified pairs) -- so the registered query
    and the scale probe's candidate-funnel counter consume the same plan
    instead of two hand-kept copies.

    Pair generation is ASYMMETRIC (PPJoin's probing-prefix refinement,
    Xiao et al. §3.2): the pair's larger document keeps the standard
    prefix ``na - ceil(tau*na) + 1`` while the smaller side only needs
    its SHORT prefix ``nb - ceil(2*tau/(1+tau)*nb) + 1`` (8/9 at
    tau=4/5).  Exactness: J >= tau forces overlap
    t = ceil(tau/(1+tau)*(na+nb)); with nb <= na that gives
    t >= ceil(2*tau/(1+tau)*nb) and (with the size filter nb >= tau*na)
    t >= ceil(tau*na), so both used prefixes have length >= n - t + 1,
    and two sets with overlap >= t whose first (n - t + 1) tokens under
    one global total order are disjoint cannot exist (the earlier
    boundary token w would leave all >= t common tokens above w on one
    side, but only n - prefix_len < t tokens sit above w there).

    Positional filter with ACCUMULATED overlap (the actual PPJoin
    filter; the previous revision used only the earliest shared token):
    let c = number of shared (full-prefix x short-prefix) tokens and
    (imax, jmax) the ranks of the LAST shared token w.  Every common
    token ordered before w lies below rank imax in a and jmax in b,
    hence inside both used prefixes, hence is one of the c join rows --
    so common tokens <= w number exactly c, common tokens > w number at
    most min(na - imax, nb - jmax), and
    overlap <= c + min(na - imax, nb - jmax).
    """
    from wsu_cpts_415_spark.queries.similarity import _hashed_staged

    prefix = _prefix_staged(spark, sf_dir, tau_num, tau_den)
    # probe_pred restricts the PROBING (smaller-doc) side BEFORE the
    # self-join -- the sampled-calibration hook: a deterministic doc
    # sample on the probe side shrinks one join input by the sample
    # rate, which an OR-filter after the join could never do.  Every
    # pair has exactly one probe endpoint under the canonical role
    # assignment below, so a uniform probe sample is a uniform pair
    # sample (unbiased recall/precision estimates).
    probe = prefix if probe_pred is None else prefix.filter(probe_pred)
    # length bucket pushed INTO the equi-join key: a valid pair's larger
    # doc sits in the probe doc's bucket or the one above
    # (_len_bucket_bounds proof), so the probe side emits BOTH and the
    # join hashes on (sh, bkt) -- pairs violating tau*|a| <= |b| by more
    # than one bucket never even reach the non-equi predicates, instead
    # of being enumerated by the token hash and filtered after.
    probe = probe.withColumn(
        "jbkt", F.explode(F.array(F.col("bkt"), F.col("bkt") + 1))
    )
    a, b = prefix.alias("a"), probe.alias("b")
    # short (probing) prefix bound for the smaller side, integer-exact:
    # rk <= n - ceil(2*tau/(1+tau) * n) + 1
    b_short = F.col("b.rk") <= F.col("b.n") - _ceil_frac(
        F.col("b.n"), 2 * tau_num, tau_num + tau_den
    ) + 1
    # generation-time sketch bound (pair-level predicate: every row of a
    # surviving pair passes, so the positional aggregate's c/imax/jmax
    # are unchanged for survivors; a pair it kills provably has
    # overlap < t and would die in verification anyway)
    t_req_ab = _ceil_frac(
        F.col("a.n") + F.col("b.n"), tau_num, tau_num + tau_den
    )
    joined = a.join(
        b,
        (F.col("a.sh") == F.col("b.sh"))
        & (F.col("a.bkt") == F.col("b.jbkt"))
        # canonical roles: a = larger doc (full prefix), b = smaller doc
        # (short prefix); doc_id breaks size ties, so each unordered
        # pair is generated under exactly one role assignment
        & (
            (F.col("a.n") > F.col("b.n"))
            | ((F.col("a.n") == F.col("b.n")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        )
        # size filter tau*na <= nb, integer-exact (nb <= na by the role)
        & (tau_den * F.col("b.n") >= tau_num * F.col("a.n"))
        & b_short
        & (_sketch_bound("a", "b") >= t_req_ab),
    ).select(
        # two-column pair key: unlike text.exact_jaccard_pairs' packed
        # long (ids < 2^32 by that table's contract), SSJoin must accept
        # 64-bit doc ids -- the x10 scale probe's key-shifted replicas
        # overflow a packed key, and production doc ids are often hashes
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.rk").alias("rka"),
        F.col("b.rk").alias("rkb"),
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
    )
    # required overlap t = ceil(tau/(1+tau)*(na+nb)), shared by every
    # downstream filter
    t_req = _ceil_frac(F.col("na") + F.col("nb"), tau_num, tau_num + tau_den)
    cand = (
        joined.groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("c"),
            F.max("rka").alias("imax"),
            F.max("rkb").alias("jmax"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .filter(
            F.col("c")
            + F.least(
                F.col("na") - F.col("imax"), F.col("nb") - F.col("jmax")
            )
            >= t_req
        )
        .select("doc_a", "doc_b", "na", "nb")
    )
    # Suffix filter: attach the two {HIST_BUCKETS}-int histograms and
    # keep only pairs whose bucket-minima sum reaches t -- kills the
    # coincidental-prefix-collision pairs the positional bound cannot
    # (an early shared rare token makes min(na-i, nb-j) ~ min(na, nb)),
    # BEFORE the wider compact hash arrays are ever joined.
    from wsu_cpts_415_spark.ops.staging import maybe_broadcast

    hist = maybe_broadcast(
        _hist_staged(spark, sf_dir),
        DOC_SIDE_BCAST_ROWS,
        stats_key=("ssjoin_hist", sf_dir),
    )
    hist_bound = F.aggregate(
        F.zip_with("ha", "hb", lambda x, y: F.least(x, y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    suffix_surv = (
        cand.join(
            hist.select(F.col("doc_id").alias("doc_a"), F.col("hist").alias("ha")),
            "doc_a",
        )
        .join(
            hist.select(F.col("doc_id").alias("doc_b"), F.col("hist").alias("hb")),
            "doc_b",
        )
        .filter(hist_bound >= t_req)
        .select("doc_a", "doc_b", "na", "nb")
    )
    # Verify: intersect two compact 64-bit hash arrays per surviving
    # pair (the same compact form text.exact_pairs_above intersects;
    # document text never moves).  r12: read the staged narrow
    # (doc_id, h64) layer instead of re-hashing the wide string table
    # per call -- identical projection, and the sampled-calibration
    # variants rebuild this verify stage per invocation.
    from wsu_cpts_415_spark.queries.similarity import _h64_staged

    compact = maybe_broadcast(
        _h64_staged(spark, sf_dir),
        DOC_SIDE_BCAST_ROWS,
        stats_key=("h64_staged", sf_dir),
    )
    verified = (
        suffix_surv.join(
            compact.select(
                F.col("doc_id").alias("doc_a"), F.col("h64").alias("hs_a")
            ),
            "doc_a",
        )
        .join(
            compact.select(
                F.col("doc_id").alias("doc_b"), F.col("h64").alias("hs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("ncomm"),
            "na",
            "nb",
        )
        # exact rational threshold, BEFORE any rounding: J >= num/den
        # iff (num+den)*ncomm >= num*(na+nb) -- integer arithmetic on
        # both engines, so no pair whose true Jaccard sits within 5e-7
        # of tau can straddle the cut via round-to-6 (the prefix-filter
        # lemma only guarantees enumeration of TRUE J >= tau pairs, so
        # a rounded threshold was a theoretical engine/oracle edge)
        .filter(
            (tau_num + tau_den) * F.col("ncomm")
            >= tau_num * (F.col("na") + F.col("nb"))
        )
        .select(
            # output canonicalization: generation ordered by SIZE (a =
            # larger); the contract (and oracle) order by doc id
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            F.round(
                F.col("ncomm").cast("double")
                / (F.col("na") + F.col("nb") - F.col("ncomm")),
                6,
            ).alias("jaccard"),
        )
    )
    return joined, cand, suffix_surv, verified


def ssjoin_pairs_above(
    spark: SparkSession, sf_dir: str, tau_num: int, tau_den: int
) -> DataFrame:
    """Exact (doc_a, doc_b, jaccard) for every pair with shingle-Jaccard
    >= tau_num/tau_den, via the parameterized PPJoin+ kernel -- the
    LINEAR exact ground-truth generator (every bound above is derived
    from the tau fraction in integer arithmetic, so any rational tau in
    (0, 1] is exact).  This is what a 100 TB calibration run uses where
    the block-matmul baseline (``text.exact_pairs_above``) would do
    all-pairs work: the LSH recall audit re-grounded on it measured
    117 s -> linear at the x10 probe scale.

    Session-staged PER TAU (r12): the verified pair table at tau=4/5
    is read by prefix_filter_jaccard_join AND both ER recall audits
    (as exact ground truth), and the tau=1/2 table by the LSH recall
    audit -- each previously re-ran the full funnel (prefix self-join
    + positional aggregate + verification) per consumer per execution.
    Like ``lsh_verified_pairs`` one module over, the deterministic
    pair sliver is now built once per (corpus, tau) and read by every
    consumer -- the staged ground-truth layer a 100 TB calibration
    run writes once."""
    from wsu_cpts_415_spark.ops.staging import staged

    def build() -> DataFrame:
        _j, _c, _s, verified = _ssjoin_frames(
            spark, sf_dir, tau_num, tau_den
        )
        return verified

    return staged(
        spark, f"ssjoin_verified_tau{tau_num}_{tau_den}", sf_dir, build
    )


@register("prefix_filter_jaccard_join", oracle=_DUCK_EXACT_ABOVE)
def prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with shingle-Jaccard >= 0.8, found by an exact
    prefix-filtered set-similarity join (module docstring has the
    guarantee and the measured candidate funnel)."""
    verified = ssjoin_pairs_above(spark, sf_dir, TAU_NUM, TAU_DEN)
    return verified.orderBy("doc_a", "doc_b")


def ssjoin_candidate_funnel(spark: SparkSession, sf_dir: str) -> dict:
    """Measured candidate funnel for the probe (SCALE.md): prefix-join
    rows -> distinct pairs sharing a prefix token (post size filter) ->
    pairs surviving the positional bound -> pairs surviving the
    histogram suffix filter -> verified results.  Counting the funnel is
    how sub-quadratic growth is PROVEN rather than argued from the plan
    shape."""
    joined, cand, suffix_surv, verified = _ssjoin_frames(spark, sf_dir)
    return {
        "prefix_join_rows": joined.count(),
        "distinct_candidate_pairs": (
            joined.select("doc_a", "doc_b").distinct().count()
        ),
        "after_positional_bound": cand.count(),
        "after_suffix_filter": suffix_surv.count(),
        "verified_pairs": verified.count(),
    }
