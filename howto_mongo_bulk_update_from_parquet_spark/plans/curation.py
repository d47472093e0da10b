"""Corpus-curation battery: the remaining large-scale training-data
operations — dataset mixture sampling, deterministic shard assignment
(global shuffle), benchmark decontamination, and SemDeDup-style
embedding-cluster near-dedup.

Scale notes (100 TB):
- Mixture sampling and shard assignment are pure per-row hash
  projections + one keyed aggregation/window — no join, no driver
  state, reproducible across engines and re-partitioning (the same
  portable md5-prefix hash the dedup family uses).
- Decontamination joins the training corpus against the eval set on a
  16-byte shingle HASH, never shingle text, and the eval side (a
  benchmark suite: thousands of docs, not billions) is the small side
  of the join — AQE broadcasts it, so the corpus never shuffles.
- SemDeDup bounds the near-dup search to within-cluster pairs: an
  O(N·K) shuffle-free Arrow assignment pass (centroids ride the task
  closure) then one dense gram matmul per cluster block, instead of
  the O(N²) all-pairs scan — see operators/vector_kernels.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import portable_hash64, shingles
from ..sources.parquet import load_table
from .catalog import register
from .kmeans import K


# ---------------------------------------------------------------------------
# Dataset mixture sampling: per-source keep rates (the "3 epochs of
# Wikipedia, 0.1 epoch of CommonCrawl" mixture step, here downsampling
# only). Rates keyed on the source id so the oracle can recompute them;
# membership is a deterministic id-hash draw, NOT rand() — re-runs,
# retries, and both engines agree row-for-row.
# ---------------------------------------------------------------------------

MIXTURE_ORACLE = """
WITH rated AS (
  SELECT source, doc_id,
         CASE CAST(substr(source, 4) AS INTEGER) % 4
           WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250 ELSE 100
         END AS rate_permille
  FROM documents
)
SELECT source,
       CAST(MIN(rate_permille) AS BIGINT) AS rate_permille,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (
         WHERE CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000 < rate_permille) AS n_kept
FROM rated
GROUP BY source
"""


@register("q_mixture_sample", MIXTURE_ORACLE,
          "dataset mixture sampling: per-source keep rates applied via "
          "deterministic id-hash draw (reproducible, engine-independent)")
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_replace("source", "^src", "").cast("int")
    rate = (F.when(src_num % 4 == 0, 1000).when(src_num % 4 == 1, 500)
             .when(src_num % 4 == 2, 250).otherwise(100))
    draw = portable_hash64(F.col("doc_id").cast("string"), F.lit("mix")) % 1000
    return (d.select("source", rate.alias("rate_permille"),
                     (draw < rate).cast("long").alias("kept"))
             .groupBy("source")
             .agg(F.min("rate_permille").cast("long").alias("rate_permille"),
                  F.count(F.lit(1)).alias("n_total"),
                  F.sum("kept").alias("n_kept")))


# ---------------------------------------------------------------------------
# Deterministic global shuffle + shard assignment: the training-order
# step. A global ORDER BY hash would funnel the corpus through one
# sort; instead shard membership is a hash partition (parallel,
# shuffle-free beyond the one exchange) and the shuffled order is a
# per-shard window over a second independent hash — exactly how a
# 100 TB corpus is laid out into training files.
# ---------------------------------------------------------------------------

N_SHARDS = 16

SHARD_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {N_SHARDS} AS shard,
         CAST(('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS oh
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY oh, doc_id) - 1 AS BIGINT) AS pos
FROM hashed
"""


@register("q_shard_assign", SHARD_ORACLE,
          "deterministic global shuffle: id-hash shard assignment + "
          "independent-hash within-shard order (training file layout)")
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    id_str = F.col("doc_id").cast("string")
    shard = portable_hash64(id_str, F.lit("shard")) % N_SHARDS
    oh = portable_hash64(id_str, F.lit("order"))
    w = Window.partitionBy("shard").orderBy("oh", "doc_id")
    return (d.select("doc_id", shard.alias("shard"), oh.alias("oh"))
             .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
             .select("doc_id", "shard", "pos"))


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training documents sharing any
# 3-gram shingle with the held-out eval set (doc_id % 10 == 0 stands
# in for the benchmark suite). The join key is the 60-bit shingle
# hash — 8 bytes crosses the shuffle, never shingle text — and both
# engines hash identically, so hash-collision merges (if any) agree.
# ---------------------------------------------------------------------------

DECONTAMINATE_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(unnest(list_distinct(list_transform(
                range(1, len(tk) - 1),
                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))), 1, 15)) AS BIGINT) AS h
  FROM toks
), ev AS (
  SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0
), tr AS (
  SELECT doc_id, h FROM sh WHERE doc_id % 10 <> 0
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id
), hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shared
  FROM tr t JOIN ev ON t.h = ev.h
  GROUP BY t.doc_id
)
SELECT h.doc_id, h.n_shared, s.n_shingles,
       ROUND(CAST(h.n_shared AS DOUBLE) / s.n_shingles, 6) AS overlap
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""


@register("q_decontaminate", DECONTAMINATE_ORACLE,
          "benchmark decontamination: training docs sharing 3-gram "
          "shingles with the eval set, joined on shingle hash")
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = (shingles(d, "doc_id", "text")
          .select("doc_id", portable_hash64(F.col("shingle")).alias("h"))
          .distinct())
    ev = (sh.filter(F.col("doc_id") % 10 == 0).select("h").distinct())
    tr = sh.filter(F.col("doc_id") % 10 != 0)
    sizes = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    # eval side is the benchmark suite — small; AQE broadcasts it so
    # the training corpus side never shuffles for the semi-match.
    hits = (tr.join(ev, "h")
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shared")))
    return (hits.join(sizes, "doc_id")
                .select("doc_id", "n_shared", "n_shingles",
                        F.round(F.col("n_shared").cast("double")
                                / F.col("n_shingles"), 6).alias("overlap")))


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup: cluster the embedding space, then
# drop any vector whose cluster contains a LOWER-id vector within
# cosine >= threshold. Clustering reuses the k-means seed assignment
# (in production: the trained centroids from q_kmeans_iter); the
# near-dup scan is confined to within-cluster pairs.
# ---------------------------------------------------------------------------

SEMDEDUP_ORACLE = f"""
WITH vals AS (
  SELECT vec_id, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
         CAST(embedding[unnest(range(1, len(embedding) + 1))] AS DOUBLE) AS vd
  FROM embeddings
),
cents0 AS (
  SELECT vec_id AS cid, unnest(range(1, len(embedding) + 1)) - 1 AS pos,
         CAST(embedding[unnest(range(1, len(embedding) + 1))] AS DOUBLE) AS cd
  FROM embeddings WHERE vec_id < {K}
),
dist0 AS (
  SELECT v.vec_id, c.cid,
         SUM(CAST(ROUND((v.vd - c.cd) * (v.vd - c.cd), 12) AS DECIMAL(30,12))) AS d2
  FROM vals v JOIN cents0 c ON v.pos = c.pos
  GROUP BY v.vec_id, c.cid
),
assign0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dist0
  ) WHERE rn = 1
),
m AS (
  SELECT a.vec_id, a.cid, e.embedding::DOUBLE[] AS ev
  FROM assign0 a JOIN embeddings e ON a.vec_id = e.vec_id
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.ev, b.ev), 5) >= 0.45
)
SELECT a.vec_id, a.cid AS cluster,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM assign0 a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


@register("q_semdedup", SEMDEDUP_ORACLE,
          "SemDeDup-style semantic dedup: embedding-cluster assignment, "
          "then drop vectors within cosine 0.45 of a lower-id cluster-mate")
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-kernel SemDeDup: one shuffle-free assignment pass
    (mapInPandas, exact-decimal distance contract) carrying the
    vectors, then ONE gram matmul per cluster via applyInPandas —
    replacing the candidate-pair self-join whose per-pair cosine was
    an interpreted `aggregate` fold. Total movement: the embeddings
    cross exactly one exchange (the groupBy cid), and cluster blocks
    are bounded by construction (SemDeDup picks K ∝ N so E[|cell|]
    is a constant), so each block's |cell|² gram matrix is a small
    dense matmul."""
    from ..operators.vector_kernels import assign_exact, cluster_neardup_flags
    e = load_table(spark, sf_dir, "embeddings")
    from .kmeans import seed_centroids
    members = assign_exact(e, seed_centroids(e), carry_vec=True)
    return cluster_neardup_flags(members, threshold=0.45)


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis–Spirakis): each doc draws a
# deterministic uniform u from its id-hash and scores k = u^(1/w);
# the global top-n by k IS a weighted sample without replacement —
# inclusion probability proportional to weight (here n_chars, a
# quality/length proxy), reproducible across engines and runs. The
# score is one pow per row (order-free IEEE, round-9 absorbs libm
# ulps); selection is a plain top-n — at 100 TB, a per-partition
# top-n then a driver-side merge, never a global sort.
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_ORACLE = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         (CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % 1000000 + 0.5) / 1000000.0 AS u
  FROM documents WHERE n_chars > 0
), scored AS (
  SELECT doc_id, source, n_chars, ROUND(POW(u, 1.0 / n_chars), 9) AS k
  FROM keyed
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, k, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rnk FROM scored)
WHERE rnk <= 100
"""


@register("q_weighted_sample", WEIGHTED_SAMPLE_ORACLE,
          "Efraimidis-Spirakis weighted sample: deterministic id-hash "
          "uniform, k = u^(1/weight), top-100 by k via per-partition "
          "top-k merge (TakeOrderedAndProject, no global sort)")
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection is `orderBy(...).limit(100)`, which Spark compiles to
    TakeOrderedAndProject — each partition keeps a 100-row heap and
    the driver merges heaps; the corpus never funnels through one
    sort partition (the r5 form was a global row_number window, the
    exact anti-pattern the docstring above warns about). Ranking the
    ≤100 survivors uses NO window either: they pack into one sorted
    struct array (two-stage collect_list agg, bounded by the limit)
    and posexplode's position is the rank — the plan contains zero
    WindowExec nodes (pinned in tests/test_plans.py). The struct
    sorts by (-k, doc_id): double negation is a sign-bit flip, so
    `-(-k) == k` bit-for-bit and ascending struct order IS
    (k DESC, doc_id ASC)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = ((portable_hash64(F.col("doc_id").cast("string"), F.lit("wsample"))
          % 1_000_000 + F.lit(0.5)) / 1_000_000.0)
    k = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 9)
    top = (d.select("doc_id", "source",
                    F.col("n_chars").cast("long").alias("n_chars"),
                    k.alias("k"))
            .orderBy(F.col("k").desc(), "doc_id")
            .limit(100))
    packed = F.struct((-F.col("k")).alias("nk"),
                      F.col("doc_id").alias("doc_id"),
                      F.col("source").alias("source"),
                      F.col("n_chars").alias("n_chars"))
    return (top.agg(F.sort_array(F.collect_list(packed)).alias("arr"))
            .select(F.posexplode("arr").alias("pos", "r"))
            .select(F.col("r.doc_id").alias("doc_id"),
                    F.col("r.source").alias("source"),
                    F.col("r.n_chars").alias("n_chars"),
                    (-F.col("r.nk")).alias("k"),
                    (F.col("pos") + 1).cast("long").alias("rnk")))


# ---------------------------------------------------------------------------
# Largest-remainder quota apportionment: split a fixed sampling
# budget (1000 slots) across (source, lang) strata proportionally to
# their document counts, with EXACT integer allocation — floors
# first, then the leftover slots go to the largest fractional
# remainders (ties by stratum key). The arithmetic is integer
# multiply/divide (budget·count ÷ total, remainder = product mod
# total) — no floats anywhere, so both engines agree trivially and
# the allocations always sum to exactly the budget. The ranking
# window orders the ~|strata| remainder rows, not data.
# ---------------------------------------------------------------------------

QUOTA_BUDGET = 1000

QUOTA_ORACLE = f"""
WITH strata AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM strata),
base AS (
  SELECT source, lang, n,
         ({QUOTA_BUDGET} * n) // tot.total AS floor_q,
         ({QUOTA_BUDGET} * n) % tot.total AS rem
  FROM strata CROSS JOIN tot
),
leftover AS (
  SELECT {QUOTA_BUDGET} - SUM(floor_q) AS k FROM base
),
ranked AS (
  SELECT source, lang, n, floor_q,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source, lang) AS r
  FROM base
)
SELECT source, lang, n,
       floor_q + CASE WHEN r <= (SELECT k FROM leftover)
                      THEN 1 ELSE 0 END AS quota
FROM ranked
"""


@register("q_quota_allocation", QUOTA_ORACLE,
          "largest-remainder apportionment of a 1000-slot sampling "
          "budget across (source, lang) strata: pure integer "
          "arithmetic, remainder-ranked leftovers, sums exactly to "
          "the budget")
def q_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    strata = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = strata.agg(F.sum("n").alias("total"))
    base = (strata.crossJoin(F.broadcast(tot))
            .select("source", "lang", "n",
                    F.floor(QUOTA_BUDGET * F.col("n") / F.col("total"))
                     .cast("long").alias("floor_q"),
                    ((QUOTA_BUDGET * F.col("n")) % F.col("total"))
                    .alias("rem"))
            .localCheckpoint(eager=False))  # feeds leftover + ranking
    k = QUOTA_BUDGET - base.agg(F.sum("floor_q")).collect()[0][0]
    # rank WITHOUT a global window (the repo bans unpartitioned
    # windows even on small inputs): r = 1 + count of strata whose
    # (rem desc, source, lang) tuple sorts earlier — an O(s²) join on
    # the |strata| remainder rows (tens), never on data
    key = F.struct((-F.col("rem")).alias("nr"), F.col("source"),
                   F.col("lang"))
    other = base.select(key.alias("k2"))
    ranked = (base.withColumn("k1", key)
              .join(F.broadcast(other), F.col("k2") < F.col("k1"), "left")
              .groupBy("source", "lang", "n", "floor_q")
              .agg((F.count("k2") + 1).alias("r")))
    return ranked.select(
        "source", "lang", "n",
        (F.col("floor_q") + F.when(F.col("r") <= k, 1).otherwise(0))
        .alias("quota"))


# ---------------------------------------------------------------------------
# Contrastive negative mining: for every verified near-dup pair (the
# positives a contrastive embedding run trains on), attach 3
# DETERMINISTIC negatives — candidate ids computed arithmetically
# from the pair (never a random sample, so the dataset is
# reproducible bit-for-bit), verified to exist, and anti-joined
# against the duplicate-pair set so a true duplicate can't leak in as
# a negative. No candidate explosion: 3 arithmetic probes per
# positive, each an equi-join, not a cross join against the corpus.
# ---------------------------------------------------------------------------

NEGATIVES_PER_POS = 3

CONTRASTIVE_ORACLE = """
WITH pairs AS ({lsh_pairs}),
probes AS (
  SELECT p.id_a, p.id_b, j,
         (p.id_a * 31 + p.id_b * 17 + j * 7919)
           % (SELECT MAX(doc_id) + 1 FROM documents) AS neg_id
  FROM pairs p CROSS JOIN (SELECT unnest(range(0, 3)) AS j)
),
valid AS (
  SELECT pr.id_a, pr.id_b, pr.j, pr.neg_id
  FROM probes pr
  JOIN documents d ON d.doc_id = pr.neg_id
  WHERE pr.neg_id <> pr.id_a AND pr.neg_id <> pr.id_b
    AND NOT EXISTS (
      SELECT 1 FROM pairs q
      WHERE (q.id_a = LEAST(pr.id_a, pr.neg_id)
             AND q.id_b = GREATEST(pr.id_a, pr.neg_id))
         OR (q.id_a = LEAST(pr.id_b, pr.neg_id)
             AND q.id_b = GREATEST(pr.id_b, pr.neg_id))
    )
)
SELECT id_a, id_b, CAST(j AS BIGINT) AS j, neg_id FROM valid
"""


def _contrastive_oracle() -> str:
    from .lsh import LSH_PAIRS_ORACLE
    return CONTRASTIVE_ORACLE.format(lsh_pairs=LSH_PAIRS_ORACLE)


@register("q_contrastive_negatives", None,  # oracle installed below
          "deterministic contrastive negatives for LSH positive "
          "pairs: arithmetic probe ids (reproducible, no RNG), "
          "existence join, anti-join against the dup set")
def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (lsh_bands, lsh_candidate_pairs,
                                   minhash_signatures, shingles)
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(shingles(d, "doc_id", "text", 3), "doc_id", 16)
    pairs = (lsh_candidate_pairs(lsh_bands(sig, "doc_id", 4), "doc_id")
             .localCheckpoint(eager=False))  # positives + 2 anti-joins
    max_id = d.agg(F.max("doc_id")).collect()[0][0] + 1
    probes = (pairs.select(
        "id_a", "id_b",
        F.explode(F.array(*[F.lit(j) for j in range(NEGATIVES_PER_POS)]))
         .alias("j"))
        .withColumn("neg_id",
                    (F.col("id_a") * 31 + F.col("id_b") * 17
                     + F.col("j") * 7919) % max_id)
        .filter((F.col("neg_id") != F.col("id_a"))
                & (F.col("neg_id") != F.col("id_b"))))
    exists = probes.join(d.select(F.col("doc_id").alias("neg_id")),
                         "neg_id")
    # a candidate negative that is actually a near-dup of EITHER side
    # of the positive pair is excluded
    dup_a = pairs.select(
        F.least("id_a", "id_b").alias("x"),
        F.greatest("id_a", "id_b").alias("y"))
    no_dup_a = exists.join(
        dup_a,
        (F.least(exists.id_a, exists.neg_id) == dup_a.x)
        & (F.greatest(exists.id_a, exists.neg_id) == dup_a.y),
        "left_anti")
    clean = no_dup_a.join(
        dup_a,
        (F.least(no_dup_a.id_b, no_dup_a.neg_id) == dup_a.x)
        & (F.greatest(no_dup_a.id_b, no_dup_a.neg_id) == dup_a.y),
        "left_anti")
    return clean.select("id_a", "id_b", F.col("j").cast("long").alias("j"),
                        "neg_id")


def _install_contrastive_oracle() -> None:
    from .catalog import CATALOG, Query
    q = CATALOG["q_contrastive_negatives"]
    CATALOG["q_contrastive_negatives"] = Query(
        name=q.name, fn=q.fn, oracle=_contrastive_oracle(), doc=q.doc)


_install_contrastive_oracle()


# ---------------------------------------------------------------------------
# Corpus card: the one-row dataset manifest a release ships with —
# scale counts, language mix, length quantiles, exact-duplicate rate.
# One pass over documents (every stat is an aggregate over the same
# scan; the dup rate reuses the md5 exact-dup key), so the card costs
# a single job however wide it grows. Exactness: counts are integers,
# quantiles are the exact interpolating percentile, the top-language
# share is an integer ratio through one IEEE divide.
# ---------------------------------------------------------------------------

CORPUS_CARD_ORACLE = """
WITH base AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         md5(text) AS h
  FROM documents
),
langs AS (
  SELECT lang, COUNT(*) AS c FROM base GROUP BY lang
),
top_lang AS (
  SELECT lang, c FROM langs ORDER BY c DESC, lang LIMIT 1
)
SELECT (SELECT COUNT(*) FROM base) AS n_docs,
       (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM base) AS n_tokens,
       (SELECT COUNT(*) FROM langs) AS n_langs,
       (SELECT lang FROM top_lang) AS top_lang,
       ROUND((SELECT CAST(c AS DOUBLE) FROM top_lang)
             / (SELECT COUNT(*) FROM base), 6) AS top_lang_share,
       (SELECT quantile_cont(n_tokens, 0.5) FROM base) AS median_tokens,
       (SELECT quantile_cont(n_chars, 0.9) FROM base) AS p90_chars,
       (SELECT COUNT(*) - COUNT(DISTINCT h) FROM base) AS n_exact_dups
"""


@register("q_corpus_card", CORPUS_CARD_ORACLE,
          "one-row dataset card: counts, language mix, exact length "
          "quantiles, exact-dup rate — one aggregation pass over one "
          "scan")
def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "lang", "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("h")).localCheckpoint(eager=False)
    langs = base.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    top = (langs.orderBy(F.col("c").desc(), "lang").limit(1)
           .collect()[0])  # 1 row — the TakeOrderedAndProject scalar
    card = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.expr("percentile(n_tokens, 0.5)").alias("median_tokens"),
        F.expr("percentile(n_chars, 0.9)").alias("p90_chars"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"))
    n_langs = langs.count()
    return card.select(
        "n_docs", "n_tokens",
        F.lit(n_langs).cast("long").alias("n_langs"),
        F.lit(top.lang).alias("top_lang"),
        F.round(F.lit(float(top.c)) / F.col("n_docs"), 6)
         .alias("top_lang_share"),
        "median_tokens", "p90_chars", "n_exact_dups")


# ---------------------------------------------------------------------------
# Literal-phrase decontamination scan — the complement of the shingle-
# overlap decontaminator: eval-set PHRASES (exact substrings, e.g.
# benchmark questions) swept across every document in one scan.
# Membership is `locate`/`position` (no regex engine in the loop, no
# cross-engine regex semantics risk); each phrase is one codegen
# predicate on the same scan, so k phrases cost k comparisons per
# row, not k passes. At real eval-set sizes the phrase list becomes a
# broadcast join against an Aho-Corasick mapInPandas kernel — this is
# the small-k exact form and the oracle for that path.
# ---------------------------------------------------------------------------

EVAL_PHRASES = (
    "slow fast table value",
    "window table table key",
    "batch window spark order",
)


def _phrase_oracle() -> str:
    cols = []
    for i, ph in enumerate(EVAL_PHRASES):
        cols.append(
            f"COUNT(CASE WHEN position('{ph}' IN text) > 0 THEN 1 END)"
            f" AS hits_{i}")
    return ("SELECT COUNT(*) AS n_docs, " + ", ".join(cols)
            + ", COUNT(CASE WHEN "
            + " OR ".join(f"position('{p}' IN text) > 0"
                          for p in EVAL_PHRASES)
            + " THEN 1 END) AS contaminated FROM documents")


@register("q_phrase_decontaminate", _phrase_oracle(),
          "literal eval-phrase sweep: per-phrase and any-phrase "
          "contaminated-doc counts via substring position tests on "
          "ONE scan — no regex, no second pass")
def q_phrase_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hit = [F.locate(ph, F.col("text")) > 0 for ph in EVAL_PHRASES]
    any_hit = hit[0]
    for h in hit[1:]:
        any_hit = any_hit | h
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs += [F.count(F.when(h, 1)).alias(f"hits_{i}")
             for i, h in enumerate(hit)]
    aggs.append(F.count(F.when(any_hit, 1)).alias("contaminated"))
    return d.agg(*aggs)
