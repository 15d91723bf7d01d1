"""Deduplication operators for training-data pipelines.

Five dedup families over ``documents`` / ``embeddings``:

* exact (hash-groupBy)
* exact n-gram Jaccard (inverted-index shingle self-join — the oracle
  ground truth for the approximate variants)
* MinHash + LSH banding (signature → band-bucket join → exact verify)
* SimHash (portable md5-nibble bit votes → banded hamming join)
* embedding-cosine near-dup (blocked pair generation)

Scale posture (100 TB): no driver materialization anywhere. The exact
n-gram path is an inverted-index join — cost is Σ per-shingle doc-count²,
which stays tractable because natural-language shingles are selective
(fixture sf0.1: 27k distinct shingles, ≤25 docs each). The MinHash path is
the scale answer when it isn't: signatures are a fixed 16 numbers per doc
regardless of document length, candidates come from equality joins on
(band, value) — shuffle keys are small and uniform — and only candidates
are verified. All expressions are JVM-side built-ins; no Python UDFs.

Determinism: Jaccard/hamming are exact-integer computations; MinHash
permutation constants are fixed at module import (seeded PRNG); SimHash
bits derive from md5 nibbles, which are bit-identical across engines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympia_spark.operators.registry import query
from olympia_spark.tables import load

# --- shared shingling (3-word shingles, distinct per doc) -------------------

# Spark arrays are 0-based, DuckDB lists 1-based; each side uses its native
# indexing to build identical shingle strings (Spark side: _shingles_df).
_SHINGLES_DUCK = """
list_distinct(list_transform(
    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         || ' ' || string_split(text, ' ')[i+2]))
"""

# DuckDB CTE computing the exact all-pairs shingle-Jaccard ≥ :threshold —
# the ground truth that both the exact operator and the MinHash operator
# are checked against.
def _jaccard_oracle(threshold: float) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, ROUND(i * 1.0 / (c1.n + c2.n - i), 4) AS jaccard
FROM inter
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE i * 1.0 / (c1.n + c2.n - i) >= {threshold}
ORDER BY d1, d2
"""


def _shingles_df(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, s) — exploded distinct 3-gram shingles. The scan reads only
    (doc_id, text); explode is a narrow op, no shuffle.

    The words array is materialized in its own projection first: inside a
    ``transform`` lambda, ``split(text)[i]`` would re-split the text per
    element (O(words²) per doc — measured 3-4× slower at sf0.1).

    The scan is repartitioned before the explode: the fixture is one
    parquet file → one input split, which would serialize the explode and
    the shuffle-map side of every downstream join onto a single core. On
    a real deployment the table has thousands of splits and this is a
    no-op cost; locally it is the difference between 1 and 32 cores."""
    return _shingles_of(load(spark, sf, "documents"))


def _shingles_of(d: DataFrame) -> DataFrame:
    """Shingle an arbitrary (doc_id, text, …) relation — see _shingles_df
    for why the words array gets its own projection and why we repartition
    before the explode.

    The repartition is KEYED ONLY — no explicit partition count. A fixed
    count is an sf0.1 up-partitioning trick that becomes a hard task
    ceiling on the tokenize/explode stage at corpus scale; keyed-only
    lets spark.sql.shuffle.partitions + AQE size it for the cluster."""
    words = d.repartition("doc_id") \
             .select("doc_id", F.split("text", " ").alias("w"))
    # explode(expr) in ONE projection: naming the array in an intermediate
    # select makes Catalyst collapse the array expression into the Generate
    # and re-evaluate it per OUTPUT row — measured 25× slower at sf0.1.
    return words.select("doc_id", F.explode(F.expr("""
        CASE WHEN size(w) >= 3 THEN
          array_distinct(transform(sequence(0, size(w) - 3),
            i -> concat_ws(' ', w[i], w[i+1], w[i+2])))
        ELSE array() END""")).alias("s"))


def _jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact shingle-Jaccard for ALL co-occurring pairs via inverted-index
    self-join. Returns (d1, d2, i, n1, n2).

    The join key is xxhash64(shingle), not the shingle string: the two
    inverted-index shuffles move 8-byte longs instead of ~20-byte strings
    (the dominant shuffle of the operator at any scale). Per-doc shingles
    are already distinct, so a hash collision would need two distinct
    shingles colliding in 64 bits within one corpus — P ≈ |shingles|²/2⁶⁵,
    vanishing at any realistic shingle count."""
    sh = _shingles_df(spark, sf).select(
        "doc_id", F.xxhash64("s").alias("s"))
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "s")
    b = sh.select(F.col("doc_id").alias("d2"), "s")
    inter = (a.join(b, ["s"])
             .filter(F.col("d1") < F.col("d2"))
             .groupBy("d1", "d2").agg(F.count("*").alias("i")))
    return (inter
            .join(cnt.select(F.col("doc_id").alias("d1"),
                             F.col("n").alias("n1")), "d1")
            .join(cnt.select(F.col("doc_id").alias("d2"),
                             F.col("n").alias("n2")), "d2"))


def _verify_candidates(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact-Jaccard verification restricted to candidate pairs: join the
    pairs against per-doc shingle SETS and intersect pair-locally
    (array_intersect). Cost is O(candidates × shingles-per-doc) — unlike
    re-running the inverted-index join, which would be all-pairs work and
    defeat the LSH. Returns (d1, d2, i, n1, n2).

    ``sh`` must already be restricted to candidate-pair docs (callers use
    _cand_doc_shingles — building sets for the whole corpus would shuffle
    every shingle to verify a handful of pairs); set elements are
    xxhash64 longs, not shingle strings (|i|, |n1|, |n2| are
    collision-free in practice at 64 bits; see _jaccard_pairs)."""
    sets = F.broadcast(
        sh.groupBy("doc_id")
        .agg(F.collect_set(F.xxhash64("s")).alias("ss")))
    return (cand
            .join(sets.select(F.col("doc_id").alias("d1"),
                              F.col("ss").alias("s1")), "d1")
            .join(sets.select(F.col("doc_id").alias("d2"),
                              F.col("ss").alias("s2")), "d2")
            .select("d1", "d2",
                    F.size(F.array_intersect("s1", "s2")).alias("i"),
                    F.size("s1").alias("n1"), F.size("s2").alias("n2")))


def _cand_doc_shingles(spark: SparkSession, sf: str,
                       cand: DataFrame) -> DataFrame:
    """Re-shingle ONLY the docs appearing in a (materialized, tiny)
    candidate pair set — a broadcast semi-join pushes the doc_id filter
    into the documents scan, so verification cost is O(candidate docs)
    regardless of corpus size."""
    docs = (cand.select(F.col("d1").alias("doc_id"))
            .union(cand.select(F.col("d2").alias("doc_id"))).distinct())
    d = load(spark, sf, "documents").join(F.broadcast(docs), "doc_id")
    return _shingles_of(d)


def _with_jaccard(pairs: DataFrame, threshold: float) -> DataFrame:
    j = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (pairs.filter(j >= threshold)
            .select("d1", "d2", F.round(j, 4).alias("jaccard"))
            .orderBy("d1", "d2"))


# --- exact dedup ------------------------------------------------------------

@query("dedup_exact", oracle="""
SELECT COUNT(*) AS n_kept,
       CAST(SUM(keep_id) AS BIGINT) AS kept_id_sum,
       CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_removed
FROM (SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text))
""")
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep the lowest doc_id
    per group. One shuffle on the digest (uniform 128-bit keys — no skew);
    at 100 TB group on md5(text) rather than raw text so shuffle rows carry
    16 bytes, not documents."""
    d = load(spark, sf, "documents")
    kept = (d.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_copies")))
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("keep_id").alias("kept_id_sum"),
        (F.sum("n_copies") - F.count("*")).alias("n_removed"))


# --- exact n-gram Jaccard near-dup ------------------------------------------

# posting-list bound for C2's CANDIDATE stage (r10 VERDICT #6): a
# shingle shared by more than this many docs is excluded from candidate
# generation (scores stay EXACT — see dedup_ngram_jaccard). Distinct
# from C59's _HOT_SHINGLE_CAP, which also removes the shingle from the
# SCORE (lower-bound semantics).
_C2_DF_CAP = 16


@query("dedup_ngram_jaccard", oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), hot AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {_C2_DF_CAP}
), kept AS (
  SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
), cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, ROUND(i * 1.0 / (c1.n + c2.n - i), 4) AS jaccard
FROM inter
JOIN cand USING (d1, d2)
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE i * 1.0 / (c1.n + c2.n - i) >= 0.6
ORDER BY d1, d2
""")
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """3-gram-shingle Jaccard near-dup pairs (threshold 0.6) with EXACT
    scores over df-CAPPED candidate generation — the default lane's
    100 TB hardening (r10 VERDICT #6: the uncapped inverted index is
    Σ df² by construction, the one operator whose cost was quadratic
    in a data property; bench measured 5.2× on 10× data).

    Candidates come from the inverted-index self-join with shingles of
    document frequency > {_C2_DF_CAP} excluded — per-key fan-out is
    provably ≤ cap², total candidate work ≤ cap · |shingles| (LINEAR
    in the corpus). Scores are then EXACT: candidate docs are
    re-shingled (broadcast semi-join — O(candidate docs), corpus-size
    independent) and each pair intersected over its FULL shingle sets,
    hot shingles included — unlike C59's dedup_hot_shingle_cap, whose
    score itself drops hot shingles (certified lower bound). The only
    recall loss: a pair whose ENTIRE overlap is >-cap boilerplate
    shingles — at threshold 0.6 that means docs near-identical in
    boilerplate only, exactly what the cap exists to not pay k² for.
    The oracle applies the same candidate rule, so the gate checks the
    cap semantics, not just the happy path. The uncapped exact lane
    remains available as dedup_ngram_jaccard_exact."""
    sh = _shingles_df(spark, sf).select(
        "doc_id", F.xxhash64("s").alias("s"))
    # the hot set is the only corpus-wide shingle aggregate and is
    # consumed by TWO broadcasts (the stats flag join and the anti-join
    # below) — pin its tiny output (boilerplate shingles only, ≤
    # |shingles|/cap rows) so the corpus pass runs once, not per
    # consumer (guide §2.4/§5: cache only reused, expensive, small)
    hot = (sh.groupBy("s").agg(F.count("*").alias("df"))
           .filter(F.col("df") > _C2_DF_CAP).select("s")
           .localCheckpoint())
    # per-doc total n AND hot count h in ONE aggregation pass: the
    # broadcast left join flags hot postings (hot has unique s, so no
    # fan-out) and count(flag) skips the NULLs of non-hot rows —
    # previously two corpus aggregations (cnt, hcnt) plus an outer
    # join to recombine them (guide §1.2: fewer passes first).
    # h is the exact slack a pair can recover from excluded postings:
    # i_true ≤ i_capped + min(h1, h2)
    stats = (sh.join(F.broadcast(hot.withColumn("__hot", F.lit(1))),
                     "s", "left")
             .groupBy("doc_id").agg(
                 F.count("*").alias("n"),
                 F.count("__hot").alias("h")))
    kept = sh.join(F.broadcast(hot), "s", "left_anti")
    a = kept.select(F.col("doc_id").alias("d1"), "s")
    b = kept.select(F.col("doc_id").alias("d2"), "s")
    # capped inverted-index count — the SAME shuffle shape as the
    # uncapped lane minus the hot keys, so per-key fan-out ≤ cap²
    inter = (a.join(b, ["s"])
             .filter(F.col("d1") < F.col("d2"))
             .groupBy("d1", "d2").agg(F.count("*").alias("i")))
    iub = F.col("i") + F.least(F.col("h1"), F.col("h2"))
    jub = iub / (F.col("n1") + F.col("n2") - iub)
    # UPPER-bound pre-filter (lossless: jub ≥ true j for every pair
    # reachable through a non-hot shingle — x/(C-x) is increasing, and
    # i + min(h1,h2) ≥ i_true) prunes the million-candidate tail down
    # to near-final size BEFORE any exact verification; pinned because
    # the verify stage consumes it three times
    cand = (inter
            .join(stats.select(F.col("doc_id").alias("d1"),
                               F.col("n").alias("n1"),
                               F.col("h").alias("h1")), "d1")
            .join(stats.select(F.col("doc_id").alias("d2"),
                               F.col("n").alias("n2"),
                               F.col("h").alias("h2")), "d2")
            .filter(jub >= 0.6)
            .select("d1", "d2")
            .localCheckpoint())
    pairs = _verify_candidates(
        _cand_doc_shingles(spark, sf, cand), cand)
    return _with_jaccard(pairs, 0.6)


@query("dedup_ngram_jaccard_exact", oracle=_jaccard_oracle(0.6))
def dedup_ngram_jaccard_exact(spark: SparkSession, sf: str) -> DataFrame:
    """The UNCAPPED exact inverted-index lane (the pre-r11 default,
    kept under an explicit name): all co-occurring pairs scored via
    self-join — Σ df² work by construction, correct but quadratic in
    per-shingle document frequency. Use only when the corpus is known
    boilerplate-free (or pre-filtered by C59/C76); the default
    dedup_ngram_jaccard caps candidate generation and rescores
    exactly."""
    return _with_jaccard(_jaccard_pairs(spark, sf), 0.6)


# --- MinHash + LSH ----------------------------------------------------------

# 16 fixed universal-hash permutations over 32-bit shingle hashes.
# perm_i(h) = (a_i * h32 + b_i) mod P  with a_i < 2^30 so the product stays
# inside int64. Single-row bands (16 bands × 1 row): for a true pair with
# Jaccard j the miss probability is (1-j)^16 — at the 0.8 verify threshold
# that is ≤ 2^-37, so the LSH output equals the exact oracle in practice.
_MINHASH_P = 4294967311  # smallest prime > 2^32
_rng = random.Random(42)
_PERMS = [(_rng.randrange(1, 1 << 30), _rng.randrange(0, 1 << 30))
          for _ in range(16)]


def _with_h32(sh: DataFrame) -> DataFrame:
    return sh.withColumn(
        "h32", F.xxhash64("s").bitwiseAND(F.lit(0xFFFFFFFF)))


def _minhash_sigs(sh: DataFrame) -> DataFrame:
    """(doc_id, pid, mh) signature relation from a shingle relation with
    h32. All 16 signature values as min-aggregates in ONE groupBy(doc_id)
    pass: the shuffle moves |shingles| rows exactly once (a
    crossJoin-with-permutations formulation amplifies shuffle volume by
    the signature width — 16× — for the same result). The per-permutation
    rows are exploded AFTER aggregation, on the constant-size table."""
    sig_wide = sh.groupBy("doc_id").agg(*[
        F.min((F.lit(a) * F.col("h32") + F.lit(b)) % F.lit(_MINHASH_P))
         .alias(f"mh{i}")
        for i, (a, b) in enumerate(_PERMS)])
    return (sig_wide.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("pid"), F.col(f"mh{i}").alias("mh"))
            for i in range(len(_PERMS))])).alias("b"))
        .select("doc_id", F.col("b.pid").alias("pid"),
                F.col("b.mh").alias("mh")))


@query("dedup_minhash_lsh", oracle=_jaccard_oracle(0.8))
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → 16 minhash signature values →
    band-bucket equality join → candidate pairs → exact-Jaccard verify
    (≥ 0.8). The scale path: signature size is constant per doc, candidate
    generation is an equi-join on (band, value), and exact verification
    touches only candidates.

    The full shingle relation is never materialized: it streams through
    ONE shuffle into the constant-size signature relation, and exact
    verification re-shingles only the docs that appear in a candidate
    pair (broadcast semi-join on the documents scan). The only pinned
    intermediates are the signature table (|docs|×16 rows) and the
    candidate pairs (O(true near-dups)) — nothing proportional to corpus
    shingle volume ever occupies executor storage."""
    # localCheckpoint (eager) rather than cache+count: one materialization
    # job, and both sides of the self-join read the pinned partitions.
    sigs = _minhash_sigs(_with_h32(_shingles_df(spark, sf))) \
        .localCheckpoint()
    # Candidate = pair sharing ≥2 of the 16 signature positions. One
    # matching position admits birthday-collision noise (measured: 157k
    # false candidates vs 256 true pairs at sf0.1 — verification cost is
    # then all noise); requiring two keeps the verify set within ~2× the
    # true pairs. Miss probability for a true pair at the 0.8 verify
    # threshold: P(<2 of 16 positions match | j≥0.8)
    # = (1-j)^16 + 16·j·(1-j)^15 ≤ 4.2e-10 — the LSH output still equals
    # the exact oracle in practice.
    cand = (sigs.alias("x")
            .join(sigs.alias("y"), ["pid", "mh"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .groupBy(F.col("x.doc_id").alias("d1"),
                     F.col("y.doc_id").alias("d2"))
            .agg(F.count("*").alias("n_band_matches"))
            .filter("n_band_matches >= 2")
            .select("d1", "d2")
            # tiny; pinned because verification consumes it twice
            # (candidate-doc projection + the pair join)
            .localCheckpoint())
    sh_cand = _cand_doc_shingles(spark, sf, cand)
    return _with_jaccard(_verify_candidates(sh_cand, cand), 0.8) \
        .localCheckpoint()


# --- SimHash ----------------------------------------------------------------

# 32-bit SimHash with engine-portable bit votes: bit j of a shingle's hash
# is the high bit of nibble j of md5(shingle) (md5 is bit-identical across
# Spark and DuckDB). simhash bit j is set iff the sum of ±1 votes over the
# doc's shingles is positive. Banding: 4 bands × 8 bits — by pigeonhole any
# pair at hamming distance ≤ 3 shares at least one exact band, so the
# banded join is EXACT for the ≤3 threshold, not approximate.
_SIMHASH_BITS = 32
_HI_NIBBLES = ("8", "9", "a", "b", "c", "d", "e", "f")


def _simhash_sql_duck() -> str:
    """DuckDB: SELECT doc_id, <simhash> AS sh (brute-force oracle form)."""
    bits = []
    for j in range(_SIMHASH_BITS):
        in_list = ", ".join(f"'{c}'" for c in _HI_NIBBLES)
        ones = (f"len(list_filter(sh_list, "
                f"s -> substr(md5(s), {j + 1}, 1) IN ({in_list})))")
        # vote_j > 0  ⇔  count of 1-votes > n_shingles / 2
        bits.append(f"(CASE WHEN 2 * {ones} > n_sh THEN CAST({2**j} AS BIGINT) "
                    f"ELSE 0 END)")
    return (f"SELECT doc_id, ({' + '.join(bits)}) AS sh "
            f"FROM (SELECT doc_id, {_SHINGLES_DUCK} AS sh_list, "
            f"len({_SHINGLES_DUCK}) AS n_sh FROM documents) WHERE n_sh > 0")


@query("dedup_simhash", oracle=f"""
WITH sig AS ({_simhash_sql_duck()})
SELECT a.doc_id AS d1, b.doc_id AS d2,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
ORDER BY d1, d2
""")
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup: 32-bit signatures, banded join (4×8 bits), pairs at
    hamming ≤ 3. The banding makes the quadratic hamming search an equality
    join — exact for the threshold by pigeonhole. Oracle runs the brute-force
    cross join; results must match exactly."""
    # Spark side computes the same signature from exploded shingles with
    # md5 evaluated ONCE per (doc, shingle) — the naive per-bit filter()
    # form re-hashes every shingle 32 times (measured 42s → ~2s at sf0.1).
    # The 32 nibble votes come from 4 hex→long chunk conversions + bit
    # tests instead of 32 substring comparisons; nibble j's high bit is
    # bit 4*(7 - j%8) + 3 of chunk j//8.
    sh = _shingles_df(spark, sf).withColumn("h", F.md5("s"))
    for c in range(4):
        sh = sh.withColumn(
            f"c{c}",
            F.conv(F.substring("h", 1 + 8 * c, 8), 16, 10).cast("long"))
    votes = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_sh"),
        *[F.sum(F.shiftright(F.col(f"c{j // 8}"), 4 * (7 - j % 8) + 3)
                .bitwiseAND(F.lit(1))).alias(f"o{j}")
          for j in range(_SIMHASH_BITS)])
    simhash = None
    for j in range(_SIMHASH_BITS):
        bit = F.when(2 * F.col(f"o{j}") > F.col("n_sh"),
                     F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        simhash = bit if simhash is None else simhash + bit
    # eagerly pinned (localCheckpoint): the banding self-join consumes sig
    # twice, and a lazy relation would compute both sides within the one
    # job (measured 7s → 2s at sf0.1). The signature relation is
    # constant-size per doc — the only intermediate proportional to the
    # corpus (the exploded shingles) streams through the one groupBy
    # shuffle and is never stored.
    sig = votes.select("doc_id", simhash.alias("sh")).localCheckpoint()
    bands = sig.select(
        "doc_id", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("band"),
                     F.shiftright("sh", 8 * k).bitwiseAND(F.lit(255))
                      .alias("v"))
            for k in range(4)])).alias("bv"))
    bands = bands.select("doc_id", "sh", "bv.band", "bv.v")
    cand = (bands.alias("x").join(bands.alias("y"), ["band", "v"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("d1"),
                    F.col("y.doc_id").alias("d2"),
                    F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh")))
                     .alias("hamming"))
            .distinct())
    return (cand.filter(F.col("hamming") <= 3).orderBy("d1", "d2")
            .localCheckpoint())


# --- near-dup clustering (connected components) -----------------------------

_CLUSTER_MAX_ITERS = 20

@query("dedup_cluster", oracle=f"""
WITH RECURSIVE pairs AS ({_jaccard_oracle(0.6).replace('ORDER BY d1, d2', '')}),
nodes AS (SELECT DISTINCT d FROM
          (SELECT d1 AS d FROM pairs UNION SELECT d2 FROM pairs)),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach AS (
  SELECT d AS node, d AS lbl FROM nodes
  UNION
  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON r.node = e.a
)
SELECT rep, COUNT(*) AS n_members
FROM (SELECT node, MIN(lbl) AS rep FROM reach GROUP BY node)
GROUP BY rep
ORDER BY rep
""")
def dedup_cluster(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clustering: connected components over the Jaccard≥0.6 pair
    graph via iterative min-label propagation — each doc converges to its
    component's smallest doc_id (the canonical representative a dedup
    pipeline keeps). This is the standard distributed
    connected-components shape: per iteration one join + one aggregation,
    labels checkpointed to truncate lineage; iterations = graph diameter
    (near-dup clusters are tiny, so a handful). The oracle computes the
    same fixed point with a recursive CTE."""
    pairs = _with_jaccard(_jaccard_pairs(spark, sf), 0.6)
    # cached because every iteration joins against the edge set; released
    # in finally (the returned frame descends only from the checkpointed
    # labels, so it survives the unpersist)
    edges = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
             .union(pairs.select(F.col("d2").alias("a"),
                                 F.col("d1").alias("b")))
             .distinct().cache())
    try:
        labels = (edges.select(F.col("a").alias("node")).distinct()
                  .select("node", F.col("node").alias("lbl"))
                  .localCheckpoint())
        converged = False
        for _ in range(_CLUSTER_MAX_ITERS):  # diameter bound; tiny in practice
            neighbor_min = (edges.join(labels, edges.a == labels.node)
                            .groupBy(F.col("b").alias("node2"))
                            .agg(F.min("lbl").alias("nl")))
            # carry the changed flag through the checkpoint so convergence is
            # a cheap filter-count over materialized rows, not an extra join
            new_labels = (labels.join(neighbor_min,
                                      labels.node == neighbor_min.node2,
                                      "left")
                          .select("node",
                                  F.least("lbl", F.coalesce("nl", "lbl"))
                                   .alias("lbl"),
                                  (F.coalesce("nl", F.col("lbl"))
                                   < F.col("lbl")).alias("chg"))
                          .localCheckpoint())
            changed = new_labels.filter("chg").count()
            labels = new_labels.drop("chg")
            if changed == 0:
                converged = True
                break
        if not converged:
            # a silent cap would return wrong clusters for any component whose
            # diameter exceeds the bound — fail loudly instead
            raise RuntimeError(
                f"dedup_cluster: label propagation did not converge within "
                f"{_CLUSTER_MAX_ITERS} iterations (component diameter too "
                f"large); raise _CLUSTER_MAX_ITERS")
        return (labels.groupBy(F.col("lbl").alias("rep"))
                .agg(F.count("*").alias("n_members"))
                .orderBy("rep"))
    finally:
        edges.unpersist()


# --- embedding-cosine near-dup ----------------------------------------------

_DOT_SPARK = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), "
              "0D, (acc, v) -> acc + v)")


@query("dedup_embedding_cosine", oracle="""
SELECT a.vec_id AS v1, b.vec_id AS v2,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 4) >= 0.4
ORDER BY v1, v2
""")
def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup: label-blocked pair generation + cosine ≥ 0.4.
    Blocking turns the all-pairs O(n²) into Σ per-block², the standard
    entity-resolution shape; at 100 TB the block key is an LSH bucket —
    dedup_embedding_lsh below IS that variant. The threshold applies to
    the ROUNDED cosine in both engines so a boundary pair cannot flip on
    FP summation order. Dot products are JVM higher-order functions
    (zip_with/aggregate) — no Python."""
    e = load(spark, sf, "embeddings")
    norms = e.select(
        "vec_id", "label", "embedding",
        F.sqrt(F.expr(_DOT_SPARK.format(a="embedding", b="embedding")))
         .alias("nrm"))
    a = norms.alias("a")
    b = norms.alias("b")
    dot = F.expr(_DOT_SPARK.format(a="a.embedding", b="b.embedding"))
    sim = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4)
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("v1"),
                    F.col("b.vec_id").alias("v2"),
                    sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= 0.4)
            .orderBy("v1", "v2"))


def _emb_lsh_oracle() -> str:
    from olympia_spark.operators.similarity import _lsh_bucket_expr
    bucket = _lsh_bucket_expr("embedding", "duck")
    return f"""
WITH sig AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS cos_sim
FROM sig a JOIN sig b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 4) >= 0.4
ORDER BY v1, v2
"""


@query("dedup_embedding_lsh", oracle=_emb_lsh_oracle())
def dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup with the block key = LSH bucket — the 100 TB
    production variant of dedup_embedding_cosine: candidate pairs come
    from an equi-self-join of the bucket-PARTITIONED ``ann.emb_lsh``
    catalog table on its partition key (uniform 4-bit signature shuffle
    keys, pair space Σ per-bucket², never all-pairs). Like any LSH
    blocking this trades recall for scale — cross-bucket near-dups are
    missed by design, a rate the sim_recall_audit pattern measures.
    Threshold on the ROUNDED cosine in both engines."""
    from olympia_spark.operators.similarity import _ann_engine
    e = _ann_engine(spark, sf).read_table("ann.emb_lsh")
    norms = e.select(
        "vec_id", "bucket", "embedding",
        F.sqrt(F.expr(_DOT_SPARK.format(a="embedding", b="embedding")))
         .alias("nrm"))
    a = norms.alias("a")
    b = norms.alias("b")
    dot = F.expr(_DOT_SPARK.format(a="a.embedding", b="b.embedding"))
    sim = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4)
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("v1"),
                    F.col("b.vec_id").alias("v2"),
                    sim.alias("cos_sim"))
            .filter(F.col("cos_sim") >= 0.4)
            .orderBy("v1", "v2"))


# --- incremental (batch-vs-corpus) near-dup ---------------------------------

_INCR_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), cut AS (SELECT (MAX(doc_id) * 4) // 5 AS c FROM documents),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s, cut
  WHERE a.doc_id < cut.c AND b.doc_id >= cut.c
  GROUP BY 1, 2
)
SELECT d1, d2, ROUND(i * 1.0 / (c1.n + c2.n - i), 4) AS jaccard
FROM inter
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE i * 1.0 / (c1.n + c2.n - i) >= 0.8
ORDER BY d1, d2
"""


@query("dedup_incremental", oracle=_INCR_ORACLE)
def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental MinHash dedup: match an INCOMING BATCH (newest 20% of
    doc ids) against the EXISTING CORPUS (oldest 80%) — the production
    pipeline shape, where each ingest batch is deduped against the
    accumulated corpus rather than all-pairs re-run. Candidates are
    corpus×batch only (batch-internal pairs wait for the batch's own
    pass); at 100 TB the corpus signature relation is a precomputed
    catalog table keyed by (pid, mh) that each batch probes — here both
    sides derive from one signature pass and split by the id cut, which
    keeps the candidate join identical while staying self-contained.
    Same ≥2-band-match filter and exact-Jaccard verify as
    dedup_minhash_lsh (miss probability ≤ 4.2e-10 at the 0.8
    threshold)."""
    d = load(spark, sf, "documents")
    cut = int(d.agg(F.max("doc_id")).first()[0]) * 4 // 5
    sigs = _minhash_sigs(_with_h32(_shingles_df(spark, sf))) \
        .localCheckpoint()
    corpus = sigs.filter(F.col("doc_id") < cut)
    batch = sigs.filter(F.col("doc_id") >= cut)
    cand = (corpus.alias("x").join(batch.alias("y"), ["pid", "mh"])
            .groupBy(F.col("x.doc_id").alias("d1"),
                     F.col("y.doc_id").alias("d2"))
            .agg(F.count("*").alias("n_band_matches"))
            .filter("n_band_matches >= 2")
            .select("d1", "d2")
            .localCheckpoint())
    sh_cand = _cand_doc_shingles(spark, sf, cand)
    return _with_jaccard(_verify_candidates(sh_cand, cand), 0.8) \
        .localCheckpoint()


# --- incremental dedup against a PERSISTED signature catalog table ----------

_INCR_ENGINES: dict[tuple[str, str], object] = {}


def _corpus_sig_index(spark: SparkSession, sf: str):
    """(engine, cut): catalog table ``dedup.corpus_sigs`` holding the
    corpus (oldest 80% of doc ids) MinHash signature relation
    (doc_id, pid, mh) — built ONCE per (session, sf) and probed by every
    batch. This is the production ingest shape: the signature index
    accumulates in the catalog; a batch never recomputes corpus
    signatures, and corpus *text* is re-read only for the few candidate
    docs that reach exact verification."""
    from olympia_spark.engine import Engine
    from olympia_spark.operators._scratch import get_or_create, scratch_dir

    def build():
        d = load(spark, sf, "documents")
        cut = int(d.agg(F.max("doc_id")).first()[0]) * 4 // 5
        eng = Engine(spark, scratch_dir("olympia_dedupidx_"))
        eng.sql("CREATE NAMESPACE dedup")
        corpus_sh = _with_h32(
            _shingles_df(spark, sf).filter(F.col("doc_id") < cut))
        eng.write_table(_minhash_sigs(corpus_sh), "dedup.corpus_sigs")
        return (eng, cut)

    return get_or_create(_INCR_ENGINES, spark, sf, build)


@query("dedup_incremental_catalog", oracle=_INCR_ORACLE)
def dedup_incremental_catalog(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental MinHash dedup probing a PERSISTED signature index:
    the corpus signature relation is a catalog table written once
    (``_corpus_sig_index``); the incoming batch (newest 20% of doc ids)
    computes only its OWN signatures and equi-joins the stored relation
    on (pid, mh). Exact-Jaccard verification re-reads corpus text only
    for candidate docs (broadcast semi-join on the tiny candidate set).
    Candidate semantics (≥2 matching positions) and threshold are
    identical to dedup_incremental, so the same oracle applies — what
    changes is WHERE the corpus signatures come from: parquet scan of
    the index table, zero corpus recompute per batch."""
    eng, cut = _corpus_sig_index(spark, sf)
    corpus_sigs = eng.read_table("dedup.corpus_sigs")
    batch_sigs = _minhash_sigs(_with_h32(
        _shingles_df(spark, sf).filter(F.col("doc_id") >= cut)))
    # localCheckpoint: the candidate set is tiny and feeds two consumers
    # (the candidate-doc re-read and the verify join) — pin it so the
    # probe join never re-executes
    cand = (corpus_sigs.alias("x")
            .join(batch_sigs.alias("y"), ["pid", "mh"])
            .groupBy(F.col("x.doc_id").alias("d1"),
                     F.col("y.doc_id").alias("d2"))
            .agg(F.count("*").alias("n_band_matches"))
            .filter("n_band_matches >= 2")
            .select("d1", "d2")
            .localCheckpoint())
    sh_verify = _cand_doc_shingles(spark, sf, cand)
    return _with_jaccard(_verify_candidates(sh_verify, cand), 0.8) \
        .localCheckpoint()


# --- edit-distance near-dup (short-text / title dedup) ----------------------

@query("dedup_edit_distance", oracle="""
WITH t AS (
  SELECT doc_id, left(lower(text), 30) AS pfx,
         string_split(text, ' ')[1] AS blk
  FROM documents
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 5
ORDER BY d1, d2
""")
def dedup_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance near-dup for short text (title/prefix dedup):
    blocked self-join on the first token, Levenshtein over the 30-char
    case-folded prefix, threshold 5. Blocking bounds the quadratic term
    to within-block pairs (the first-token block here; a real pipeline
    blocks on any cheap key — sorted-token prefix, phonetic code, length
    bucket) and Levenshtein runs JVM-side on constant-length strings —
    exact integer output, hash-identical across engines."""
    d = load(spark, sf, "documents")
    # lower BEFORE truncating, matching the oracle's left(lower(text), 30)
    # — case folds that change string length (İ→i̇, ẞ→ß) would otherwise
    # produce different prefixes on the two sides
    t = d.repartition("doc_id").select(
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, 30).alias("pfx"),
        F.split("text", " ").getItem(0).alias("blk"))
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.pfx"), F.col("b.pfx"))
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"),
                    dist.cast("long").alias("dist"))
            .filter("dist <= 5")
            .orderBy("d1", "d2"))


# --- containment near-dup (quote-inclusion) ----------------------------------

@query("dedup_containment", oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, ROUND(i * 1.0 / LEAST(c1.n, c2.n), 4) AS containment
FROM inter
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE LEAST(c1.n, c2.n) >= 5
  AND i * 1.0 / LEAST(c1.n, c2.n) >= 0.9
ORDER BY d1, d2
""")
def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment near-dup (Jaccard CONTAINMENT, i/min(|A|,|B|)): catches
    the asymmetric duplicates symmetric Jaccard misses — a short document
    wholly quoted inside a long one scores i/min = 1.0 but Jaccard
    i/(a+b-i) ≈ short/long. Same inverted-index machinery as the exact
    Jaccard operator (shuffle on shingle, then pair), different ratio;
    the ≥5-shingle floor keeps trivial snippets from matching
    everything."""
    pairs = _jaccard_pairs(spark, sf)
    mn = F.least("n1", "n2")
    c = F.col("i") / mn
    return (pairs.filter((mn >= 5) & (c >= 0.9))
            .select("d1", "d2", F.round(c, 4).alias("containment"))
            .orderBy("d1", "d2"))


# --- iterative graph ranking over the near-dup graph -------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    pairs = _jaccard_oracle(0.6).replace("ORDER BY d1, d2", "")
    it = """
, pr{k} AS (
  SELECT d.node,
         {base} + 85 * (
           SELECT SUM(p.pr // dd.deg)
           FROM edges e JOIN pr{prev} p ON e.a = p.node
           JOIN deg dd ON e.a = dd.node
           WHERE e.b = d.node) // 100 AS pr
  FROM deg d)
"""
    base = f"({_PR_SCALE} * 15 // 100) // (SELECT COUNT(*) FROM deg)"
    iters = "".join(it.format(k=k, prev=k - 1, base=base)
                    for k in range(1, _PR_ITERS + 1))
    return f"""
WITH pairs AS ({pairs}),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
deg AS (SELECT a AS node, COUNT(*) AS deg FROM edges GROUP BY a),
pr0 AS (SELECT node, {_PR_SCALE} // (SELECT COUNT(*) FROM deg) AS pr
        FROM deg){iters}
SELECT node, CAST(pr AS BIGINT) AS pr_fp
FROM pr{_PR_ITERS}
ORDER BY pr_fp DESC, node
"""


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Iterative graph ranking (PageRank, damping 0.85, 3 synchronous
    iterations) over the Jaccard≥0.6 near-dup graph — the
    importance-scoring companion to dedup_cluster's connected components
    (rank near-dup hubs to pick audit targets). Per iteration: one join
    edges⋈ranks + one aggregation — the standard distributed PR shape
    whose cost is O(edges) per round at any scale, with the rank relation
    checkpointed to truncate lineage.

    Arithmetic is FIXED-POINT integer (scale 10¹²) with floor division
    at every step, so the trajectory is bit-identical across engines —
    float PR would diverge past the hash tolerance through accumulation
    order alone. The oracle unrolls the same three iterations in SQL."""
    pairs = _with_jaccard(_jaccard_pairs(spark, sf), 0.6)
    edges = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
             .union(pairs.select(F.col("d2").alias("a"),
                                 F.col("d1").alias("b")))
             .distinct()
             .localCheckpoint())
    deg = edges.groupBy(F.col("a").alias("node")) \
               .agg(F.count("*").alias("deg"))
    n_nodes = deg.count()
    if n_nodes == 0:
        # empty near-dup graph (no pairs over threshold): the oracle
        # returns zero rows; dividing by the node count would crash
        return spark.createDataFrame([], "node bigint, pr_fp bigint")
    base = (_PR_SCALE * 15 // 100) // n_nodes
    ranks = deg.select("node", F.lit(_PR_SCALE // n_nodes).alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (edges
                   .join(ranks, edges.a == ranks.node)
                   .join(deg.withColumnRenamed("node", "dn"),
                         F.col("a") == F.col("dn"))
                   .select(F.col("b").alias("node"),
                           F.expr("pr div deg").alias("c")))
        ranks = (contrib.groupBy("node")
                 .agg((F.lit(base)
                       + F.expr("85 * sum(c) div 100")).alias("pr"))
                 .localCheckpoint())
    return (ranks.select("node", F.col("pr").cast("bigint").alias("pr_fp"))
            .orderBy(F.col("pr_fp").desc(), "node"))


# --- threshold calibration sweep ---------------------------------------------

@query("dedup_threshold_sweep", oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), j AS (
  SELECT i * 1.0 / (c1.n + c2.n - i) AS jac
  FROM inter JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
)
SELECT CAST(SUM(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS ge_50,
       CAST(SUM(CASE WHEN jac >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS ge_60,
       CAST(SUM(CASE WHEN jac >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS ge_70,
       CAST(SUM(CASE WHEN jac >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS ge_80,
       CAST(SUM(CASE WHEN jac >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS ge_90
FROM j
""")
def dedup_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Threshold calibration sweep: near-dup pair counts at five Jaccard
    thresholds from ONE inverted-index pass (conditional aggregation over
    the pair relation — five thresholds cost the same as one). The audit
    a pipeline runs before choosing its dedup threshold: the knee of this
    curve is the operating point. Same shuffles as the uncapped
    dedup_ngram_jaccard_exact lane."""
    pairs = _jaccard_pairs(spark, sf)
    jac = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return pairs.agg(*[
        F.sum(F.when(jac >= t, 1).otherwise(0)).cast("bigint")
         .alias(f"ge_{int(t * 100)}")
        for t in (0.5, 0.6, 0.7, 0.8, 0.9)])


def _canon_url(raw: str, engine: str) -> str:
    """Shared canonicalization pipeline, one dialect string per engine:
    lowercase scheme+host ((?i) — crawls deliver any case), drop the
    #fragment, drop utm_* tracking params (keeping the separator the NEXT
    param needs: 'utm_x=1&' drops with its own trailing '&', a LAST utm
    param drops with its leading separator), drop a then-dangling '?',
    drop one trailing slash off a non-root path. Replacement group refs
    are dialect-split: Spark (Java) wants '$1', DuckDB (RE2) '\\\\1'."""
    ref = "$1" if engine == "spark" else "\\1"
    g = "" if engine == "spark" else ", 'g'"   # Spark replaces ALL matches;
                                               # DuckDB needs the 'g' flag

    def rr(s: str, pat: str, repl: str) -> str:
        return f"regexp_replace({s}, '{pat}', '{repl}'{g})"

    lower_host = (f"concat(lower(regexp_extract({raw}, "
                  f"'(?i)^(https?://[^/?#]*)', 1)), "
                  f"regexp_extract({raw}, '(?i)^https?://[^/?#]*(.*)$', 1))")
    no_frag = rr(lower_host, "#.*$", "")
    no_utm_mid = rr(no_frag, "utm_[^&#]*&", "")
    no_utm_last = rr(no_utm_mid, "[?&]utm_[^&#]*$", "")
    no_dangle = rr(no_utm_last, "[?&]+$", "")
    return rr(no_dangle, "(.)/$", ref)


def _url_canon_sql(engine: str) -> str:
    canon = _canon_url("url", engine)
    return f"""
WITH urls AS (
  SELECT doc_id,
         'HTTPS://' || (CASE WHEN doc_id % 3 = 0 THEN 'Example.COM'
                             WHEN doc_id % 3 = 1 THEN 'example.com'
                             ELSE 'EXAMPLE.com' END)
         || '/docs/' || CAST(doc_id % 20 AS {'VARCHAR' if engine == 'duck'
                                              else 'STRING'})
         || (CASE WHEN doc_id % 4 = 0 THEN ''
                  WHEN doc_id % 4 = 1 THEN '/'
                  WHEN doc_id % 4 = 2 THEN '?utm_source=feed&utm_id=7'
                  ELSE '#section-2' END) AS url
  FROM documents
)
SELECT {canon} AS canonical_url,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT url) AS n_raw_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM urls
GROUP BY canonical_url
HAVING COUNT(DISTINCT url) > 1
ORDER BY n_docs DESC, canonical_url
LIMIT 25
"""


@query("dedup_url_canonical", oracle=_url_canon_sql("duck"))
def dedup_url_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """URL-canonicalization dedup — the crawl-corpus staple: the same
    page arrives as Example.COM vs example.com, with/without trailing
    slash, #fragments, and utm_* tracking params, and must collapse to
    ONE canonical key before fetch/store. Raw variants are synthesized
    deterministically from doc_id (both engines build the identical
    corpus), canonicalized by a shared regex pipeline, and grouped on
    the canonical form — map-only rewriting plus one groupBy on
    uniformly-hashed string keys, the same shape as dedup_exact, so the
    100 TB cost is one shuffle of (url → count) pairs. keep_doc_id is
    the deterministic survivor (MIN) a dedup pass would retain."""
    load(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(_url_canon_sql("spark"))


def _span_windows_sql(engine: str) -> str:
    """64-char windows at stride 32 per document, keyed by md5; docs
    sharing ≥2 window digests are long-span (copy-paste) duplicates."""
    if engine == "duck":
        win = ("SELECT doc_id, md5(substr(text, i * 32 + 1, 64)) AS wh "
               "FROM (SELECT doc_id, text, "
               "unnest(generate_series(0, "
               "CAST(floor((length(text) - 64) / 32) AS BIGINT))) AS i "
               "FROM documents WHERE length(text) >= 64)")
    else:
        win = ("SELECT doc_id, md5(substr(text, i * 32 + 1, 64)) AS wh "
               "FROM (SELECT doc_id, text, "
               "explode(sequence(0, "
               "CAST(floor((length(text) - 64) / 32) AS BIGINT))) AS i "
               "FROM documents WHERE length(text) >= 64)")
    return f"""
WITH windows AS ({win}),
hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM (SELECT DISTINCT doc_id, wh FROM windows) a
  JOIN (SELECT DISTINCT doc_id, wh FROM windows) b
    ON a.wh = b.wh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared_windows
FROM hits
WHERE n_shared >= 2
ORDER BY n_shared_windows DESC, doc_a, doc_b
LIMIT 50
"""


@query("dedup_span_windows", oracle=_span_windows_sql("duck"))
def dedup_span_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Long shared-span detection — the scalable stand-in for
    suffix-array exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): 64-char windows at
    stride 32 hash to digests, and two documents sharing ≥2 window
    digests contain a long verbatim copy-paste span (any shared span
    ≥ 96+32·(k-1) chars is guaranteed to produce ≥k aligned-window
    collisions at some offset... stride-aligned windows catch spans that
    start on stride boundaries; the threshold trades recall for the
    inverted-index join cost, same contract family as C2/C31). Shape:
    one explode into constant windows-per-doc, DISTINCT digest inverted
    index, per-digest self-join — O(Σ per-digest docs²) like every
    inverted-index dedup, never all-pairs."""
    load(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(_span_windows_sql("spark"))


def _recall_audit_oracle() -> str:
    """DuckDB replication of the ENTIRE portable-minhash audit pipeline —
    same shingles, same md5-derived 32-bit hash, same 16 permutation
    constants, same ≥2-position candidate rule — so the recall number is
    exactly reproducible, not merely spot-checked."""
    mins = ", ".join(
        f"MIN(({a} * h32 + {b}) % {_MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_PERMS))
    cols = ", ".join(f"mh{i}" for i in range(len(_PERMS)))
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT d1, d2 FROM inter
  JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id
  WHERE i * 1.0 / (c1.n + c2.n - i) >= 0.8
), h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS h32
  FROM sh
), sig AS (
  SELECT doc_id, {mins} FROM h GROUP BY doc_id
), pos AS (
  SELECT doc_id, pid, mh FROM sig UNPIVOT (mh FOR pid IN ({cols}))
), cand AS (
  SELECT x.doc_id AS d1, y.doc_id AS d2
  FROM pos x JOIN pos y ON x.pid = y.pid AND x.mh = y.mh
                        AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT CAST(nt AS BIGINT) AS n_true, CAST(nc AS BIGINT) AS n_candidates,
       CAST(nh AS BIGINT) AS n_hit,
       CAST(CASE WHEN nt = 0 THEN 1.0
                 ELSE ROUND(nh * 1.0 / nt, 4) END AS DOUBLE) AS recall_band
FROM (SELECT (SELECT COUNT(*) FROM truth) AS nt,
             (SELECT COUNT(*) FROM cand) AS nc,
             (SELECT COUNT(*) FROM truth t JOIN cand c
              ON t.d1 = c.d1 AND t.d2 = c.d2) AS nh)
"""


@query("dedup_recall_audit", oracle=_recall_audit_oracle())
def dedup_recall_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate-recall audit for the MinHash-LSH dedup family — the
    dedup twin of C47's ANN recall audit: what fraction of TRUE near-dup
    pairs (exact shingle-Jaccard ≥ 0.8, the inverted-index ground truth)
    survives the ≥2-of-16 band-match candidate filter? Production
    signatures hash with xxhash64 (engine-private); the audit pipeline
    swaps in an md5-derived 32-bit hash so the ENTIRE pipeline — same
    permutation constants, same candidate rule — replicates in the
    oracle and the recall number is exact, not sampled. One row:
    (n_true, n_candidates, n_hit, recall_band). The theoretical miss
    bound at j≥0.8 is ≤4.2e-10, so recall_band = 1.0 unless the
    signature math regresses — this query is the tripwire."""
    sh = _shingles_df(spark, sf)
    truth = _with_jaccard(_jaccard_pairs(spark, sf), 0.8) \
        .select("d1", "d2").localCheckpoint()
    h = sh.select("doc_id", F.conv(F.substring(F.md5("s"), 1, 8), 16, 10)
                  .cast("long").alias("h32"))
    sig_wide = h.groupBy("doc_id").agg(*[
        F.min((F.lit(a) * F.col("h32") + F.lit(b)) % F.lit(_MINHASH_P))
         .alias(f"mh{i}")
        for i, (a, b) in enumerate(_PERMS)])
    pos = sig_wide.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(f"mh{i}").alias("pid"), F.col(f"mh{i}").alias("mh"))
        for i in range(len(_PERMS))])).alias("b")) \
        .select("doc_id", "b.pid", "b.mh")
    cand = (pos.alias("x").join(pos.alias("y"), ["pid", "mh"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .groupBy(F.col("x.doc_id").alias("d1"),
                     F.col("y.doc_id").alias("d2"))
            .agg(F.count("*").alias("nb")).filter("nb >= 2")
            .select("d1", "d2").localCheckpoint())
    nt = truth.agg(F.count("*").alias("nt"))
    nc = cand.agg(F.count("*").alias("nc"))
    nh = truth.join(cand, ["d1", "d2"]).agg(F.count("*").alias("nh"))
    return nt.crossJoin(nc).crossJoin(nh).selectExpr(
        "CAST(nt AS BIGINT) AS n_true",
        "CAST(nc AS BIGINT) AS n_candidates",
        "CAST(nh AS BIGINT) AS n_hit",
        "CAST(CASE WHEN nt = 0 THEN 1.0 "
        "ELSE ROUND(nh * 1.0 / nt, 4) END AS DOUBLE) AS recall_band")


# --- hot-shingle-capped near-dup (posting-list bound) -----------------------

_HOT_SHINGLE_CAP = 5


@query("dedup_hot_shingle_cap", oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM documents
), cnt AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), hot AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) > {_HOT_SHINGLE_CAP}
), kept AS (
  SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, ROUND(i * 1.0 / (c1.n + c2.n - i), 4) AS jaccard_lb
FROM inter
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE i * 1.0 / (c1.n + c2.n - i) >= 0.5
ORDER BY d1, d2
""")
def dedup_hot_shingle_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup with a posting-list bound (the CCNet/Gopher production
    hardening of inverted-index dedup): shingles whose document frequency
    exceeds the cap become STOP-shingles and are excluded from candidate
    generation — without the cap, one boilerplate shingle shared by k
    docs contributes k² join rows, the quadratic hot-key that kills an
    exact-Jaccard job at corpus scale. The resulting score is a certified
    LOWER bound on true Jaccard (hot shingles only ever remove evidence;
    denominators stay full), so every emitted pair is a true ≥-bound
    match. Plan: the stop list is tiny by construction (df > cap) and
    broadcasts into a LEFT ANTI join against the shingle stream — the
    inverted-index self-join then runs with per-key fan-out provably
    ≤ cap², and everything shuffles as 8-byte xxhash64 longs."""
    sh = _shingles_df(spark, sf).select(
        "doc_id", F.xxhash64("s").alias("s"))
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    hot = (sh.groupBy("s").agg(F.count("*").alias("df"))
           .filter(F.col("df") > _HOT_SHINGLE_CAP).select("s"))
    kept = sh.join(F.broadcast(hot), "s", "left_anti")
    a = kept.select(F.col("doc_id").alias("d1"), "s")
    b = kept.select(F.col("doc_id").alias("d2"), "s")
    inter = (a.join(b, ["s"])
             .filter(F.col("d1") < F.col("d2"))
             .groupBy("d1", "d2").agg(F.count("*").alias("i")))
    pairs = (inter
             .join(cnt.select(F.col("doc_id").alias("d1"),
                              F.col("n").alias("n1")), "d1")
             .join(cnt.select(F.col("doc_id").alias("d2"),
                              F.col("n").alias("n2")), "d2"))
    j = F.col("i") / (F.col("n1") + F.col("n2") - F.col("i"))
    return (pairs.filter(j >= 0.5)
            .select("d1", "d2", F.round(j, 4).alias("jaccard_lb"))
            .orderBy("d1", "d2"))


# --- C69 prefix-hash dedup --------------------------------------------------

@query("dedup_prefix_hash", oracle="""
WITH pref AS (
  SELECT doc_id, source,
         md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS p
  FROM documents
), grp AS (
  SELECT p, MIN(doc_id) AS keeper, COUNT(*) AS n FROM pref GROUP BY p
)
SELECT pref.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pref.doc_id = g.keeper THEN 1 ELSE 0 END)
            AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN pref.doc_id <> g.keeper THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped
FROM pref JOIN grp g ON pref.p = g.p
GROUP BY pref.source
ORDER BY pref.source
""")
def dedup_prefix_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-hash dedup — the crawl-mirror fast path: near-duplicate
    crawls (mirrors, tracking-param variants, soft-404 templates) share
    their opening words even when tails diverge, so hashing the first 16
    words catches them at exact-dedup cost — one md5 per doc, one
    groupBy of 16-byte digests — where shingle Jaccard would pay an
    inverted-index join. Keeper = min(doc_id) (first crawl wins,
    deterministic); per-source kept/dropped tallies. The exchange
    carries only (digest, doc_id, source) — never text — and the digest
    keyspace shards uniformly at any scale. In the funnel this runs
    BEFORE MinHash (C3): it removes the cheap mass so the expensive
    lane sees only prefix-distinct survivors."""
    d = load(spark, sf, "documents")
    pref = d.select(
        "doc_id", "source",
        F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 16)))
        .alias("p"))
    grp = pref.groupBy("p").agg(F.min("doc_id").alias("keeper"))
    return (pref.join(grp, "p")
            .groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum(F.when(F.col("doc_id") == F.col("keeper"), 1)
                       .otherwise(0)).cast("bigint").alias("kept"),
                 F.sum(F.when(F.col("doc_id") != F.col("keeper"), 1)
                       .otherwise(0)).cast("bigint").alias("dropped"))
            .orderBy("source"))


# --- C70 cross-source leakage matrix ----------------------------------------

@query("dedup_cross_source", oracle=f"""
WITH pairs AS (
  SELECT d1, d2 FROM ({_jaccard_oracle(0.6)})
)
SELECT least(a.source, b.source) AS src_a,
       greatest(a.source, b.source) AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
JOIN documents a ON d1 = a.doc_id
JOIN documents b ON d2 = b.doc_id
WHERE a.source <> b.source
GROUP BY 1, 2
ORDER BY 1, 2
""")
def dedup_cross_source(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source leakage matrix — the mixture-design question near-dup
    PAIRS alone don't answer: which pairs of ingest sources share
    near-duplicate content (mirrors syndicating each other, a benchmark
    leaking into a crawl, two dumps of one site)? Exact 0.6-Jaccard
    pairs from the inverted-index lane (xxhash64 longs on the shuffle,
    zero LSH miss risk), then each side labels with its source and the
    unordered source pair tallies. The pair set is O(true near-dups) —
    TINY relative to the corpus — so it broadcasts to meet the documents
    scan; output is at most n_sources² rows. Feeds mixture reweighting
    (C39) and dedup scope decisions: a hot cell says those two sources
    should be deduplicated as ONE pool."""
    d = load(spark, sf, "documents").select("doc_id", "source")
    pairs = _with_jaccard(_jaccard_pairs(spark, sf), 0.6) \
        .select("d1", "d2").localCheckpoint()
    a = d.select(F.col("doc_id").alias("d1"), F.col("source").alias("sa"))
    b = d.select(F.col("doc_id").alias("d2"), F.col("source").alias("sb"))
    return (a.join(F.broadcast(pairs), "d1")
            .join(b, "d2")
            .filter("sa <> sb")
            .select(F.least("sa", "sb").alias("src_a"),
                    F.greatest("sa", "sb").alias("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("bigint").alias("n_pairs"))
            .orderBy("src_a", "src_b"))


# --- C76 winnowing fingerprints (MOSS) --------------------------------------

@query("dedup_winnowing", oracle="""
WITH eligible AS (
  SELECT doc_id, text, len(text) AS L FROM documents
  WHERE len(text) >= 11
), pos AS (
  SELECT doc_id, text, L,
         unnest(generate_series(1, L - 7)) AS p
  FROM eligible
), h AS (
  SELECT doc_id, p, L, md5(substr(text, p, 8)) AS gh FROM pos
), wmin AS (
  SELECT doc_id, p, L,
         MIN(gh) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM h
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wmin WHERE p <= L - 10
), pruned AS (
  SELECT doc_id, fp FROM fps
  WHERE fp NOT IN (SELECT fp FROM fps GROUP BY fp
                   HAVING COUNT(*) > 50)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM pruned a JOIN pruned b
  ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
ORDER BY shared DESC, doc_a, doc_b
LIMIT 20
""")
def dedup_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """C76 — winnowing document fingerprints (the MOSS algorithm;
    Schleimer/Wilkerson/Aiken SIGMOD'03): hash every 8-char gram, keep
    the MINIMUM hash of each 4-gram window — guaranteeing any shared
    substring of ≥ 11 chars yields a shared fingerprint — then pair
    documents sharing ≥ 3 distinct fingerprints. md5 is the portable
    gram hash (bit-identical across engines). Scale posture: the
    per-position work is a map + one per-doc window (partitioned by
    doc, never global); the candidate join is an equi-join on the
    fingerprint with hot fingerprints (>50 docs — boilerplate) pruned
    first, the same posting-list cap bounding dedup_hot_shingle_cap —
    fan-out is ≤ cap² per fingerprint, never all-pairs."""
    from pyspark.sql import Window as W
    d = (load(spark, sf, "documents")
         .filter(F.length("text") >= 11)
         .select("doc_id", "text", F.length("text").alias("L")))
    pos = d.select(
        "doc_id", "text", "L",
        F.explode(F.sequence(F.lit(1), F.col("L") - 7)).alias("p"))
    h = pos.select(
        "doc_id", "p", "L",
        F.md5(F.expr("substring(text, p, 8)")).alias("gh"))
    wspec = (W.partitionBy("doc_id").orderBy("p").rowsBetween(0, 3))
    fps = (h.select("doc_id", "p", "L",
                    F.min("gh").over(wspec).alias("fp"))
           .filter(F.col("p") <= F.col("L") - 10)
           .select("doc_id", "fp").distinct())
    hot = (fps.groupBy("fp").agg(F.count("*").alias("nd"))
           .filter("nd > 50").select("fp"))
    pruned = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = pruned.alias("a")
    b = pruned.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").cast("bigint").alias("shared"))
            .filter("shared >= 3")
            .orderBy(F.desc("shared"), "doc_a", "doc_b")
            .limit(20))


# --- C83 SemDeDup: cluster-scoped semantic dedup with keep policy ------------

@query("dedup_semantic_cluster", oracle="""
WITH pairs AS (
  SELECT b.vec_id AS v2
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]), 4) >= 0.4
), dropped AS (
  SELECT DISTINCT v2 FROM pairs
)
SELECT CAST(e.label AS INT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN d.v2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(CASE WHEN d.v2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN d.v2 IS NULL THEN e.vec_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.v2
GROUP BY e.label ORDER BY label
""")
def dedup_semantic_cluster(spark: SparkSession, sf: str) -> DataFrame:
    """C83 — SemDeDup (Abbas et al. 2023): semantic deduplication
    scoped to embedding CLUSTERS — within each cluster, a vector is
    dropped when an earlier (lower-id) cluster-mate sits within cosine
    ≥ 0.4; survivors are the kept set. Differs from
    dedup_embedding_cosine (which only LISTS near-dup pairs) by
    materializing the greedy keep/drop DECISION and the per-cluster
    retention summary — the thing a curation pipeline actually applies.
    The fixture's ``label`` column stands in for the k-means/IVF
    cluster id the C8 lane would assign at scale.

    Scale: the pair space is Σ per-cluster² (SemDeDup's design premise:
    clusters are small by construction), an equi-join on the cluster
    key — never corpus all-pairs; the drop set is near-dup-sized and
    broadcast back for the per-cluster rollup. Cosine applies to the
    ROUNDED value in both engines so boundary pairs cannot flip on FP
    order."""
    e = load(spark, sf, "embeddings")
    norms = e.select(
        "vec_id", "label", "embedding",
        F.sqrt(F.expr(_DOT_SPARK.format(a="embedding", b="embedding")))
         .alias("nrm"))
    a, b = norms.alias("a"), norms.alias("b")
    dot = F.expr(_DOT_SPARK.format(a="a.embedding", b="b.embedding"))
    sim = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4)
    dropped = (a.join(b, (F.col("a.label") == F.col("b.label"))
                      & (F.col("a.vec_id") < F.col("b.vec_id")))
               .filter(sim >= 0.4)
               .select(F.col("b.vec_id").alias("v2"))
               .distinct())
    is_drop = F.col("v2").isNotNull()
    return (e.join(F.broadcast(dropped),
                   e.vec_id == F.col("v2"), "left")
            .groupBy(F.col("label").cast("int").alias("label"))
            .agg(F.count("*").cast("bigint").alias("n_vecs"),
                 F.sum(F.when(is_drop, 1).otherwise(0))
                 .cast("bigint").alias("n_dropped"),
                 F.sum(F.when(is_drop, 0).otherwise(1))
                 .cast("bigint").alias("n_kept"),
                 F.sum(F.when(is_drop, 0).otherwise(F.col("vec_id")))
                 .cast("bigint").alias("kept_id_sum"))
            .orderBy("label"))
