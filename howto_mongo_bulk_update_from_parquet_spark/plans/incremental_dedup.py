"""Incremental (cross-batch) near-duplicate detection.

At 100 TB you never re-shingle the corpus when a new batch arrives:
the historical corpus is represented by its persisted band-signature
index — (band, band_sig) rows, a few dozen bytes per document, stored
bucketed by the probe key. Each arriving batch is shingled and signed
ONCE, probed against the index with a bucket-local join (only the
batch side shuffles when the index is bucket-stored), and
deduplicated within itself by bucket-min. History is never re-hashed
and nothing is all-pairs.

The catalog query models the two corpus states inside one table so
the DuckDB oracle can replay it exactly: documents with
``doc_id % 3 <> 0`` are the already-indexed history, the rest are the
new batch. Verdict per new document:

- ``dup_vs_index``  — ≥1 of its band buckets collides with history
  (``hits_index`` counts the colliding bands, 0–4);
- ``dup_in_batch``  — no index hit, but a smaller-id batch document
  shares a bucket (bucket-min survivor rule, same as
  q_dedup_keep_one's keep-smallest convention);
- ``unique``        — neither.

Reference parity note: the reference pipeline
(`/root/reference/src/func/mongo.py`) is itself incremental — each
run upserts one parquet batch into the accumulated store; this query
is the dedup analog of that arrival-at-a-time posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_bands, minhash_signatures, shingles
from ..sources.parquet import load_table
from .catalog import register
from .lsh import _SHINGLES_SQL

INCREMENTAL_ORACLE = f"""
WITH shingles AS ({_SHINGLES_SQL}),
seeds AS (SELECT unnest(range(0, 16)) AS seed),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
  FROM shingles
),
sig AS (
  SELECT doc_id, CAST(seed AS INT) AS seed,
         MIN(((2 * seed + 1) * h + seed * seed + 7) % 2147483647) AS minhash
  FROM hashed CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
         string_agg(CAST(minhash AS VARCHAR), '-' ORDER BY seed) AS band_sig
  FROM sig GROUP BY doc_id, CAST(seed // 4 AS INT)
),
newb AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
idx  AS (SELECT DISTINCT band, band_sig FROM bands WHERE doc_id % 3 <> 0),
hits AS (
  SELECT n.doc_id, CAST(COUNT(DISTINCT n.band) AS BIGINT) AS hits_index
  FROM newb n JOIN idx i ON n.band = i.band AND n.band_sig = i.band_sig
  GROUP BY n.doc_id
),
bmin AS (
  SELECT band, band_sig, MIN(doc_id) AS min_id FROM newb GROUP BY band, band_sig
),
bdup AS (
  SELECT DISTINCT n.doc_id FROM newb n
  JOIN bmin m ON n.band = m.band AND n.band_sig = m.band_sig
  WHERE n.doc_id > m.min_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.hits_index, 0) AS BIGINT) AS hits_index,
       CASE WHEN COALESCE(h.hits_index, 0) > 0 THEN 'dup_vs_index'
            WHEN b.doc_id IS NOT NULL THEN 'dup_in_batch'
            ELSE 'unique' END AS verdict
FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
LEFT JOIN hits h ON d.doc_id = h.doc_id
LEFT JOIN bdup b ON d.doc_id = b.doc_id
"""


def batch_bands(docs: DataFrame, id_col: str) -> DataFrame:
    """The ONE signing pipeline every consumer shares — 3-token
    shingles, 16 minhashes, 4 rows per band. Index seeding, arrival
    probes, and the CLI all derive bands HERE so their parameters can
    never silently diverge (a probe signed with different constants
    would miss every history dup without an error)."""
    return lsh_bands(
        minhash_signatures(shingles(docs, id_col, "text", 3), id_col, 16),
        id_col, 4)


def signature_index_rows(docs: DataFrame, id_col: str) -> DataFrame:
    """Band-signature index rows for a document batch:
    (bucket_key, band, band_sig, rep_id) with one row per distinct
    bucket and the smallest member id as its representative.

    `bucket_key` is the single merge key a keyed store needs (the
    engine's versioned keyed-table sink, or any upsert target), so an
    arrival loop maintains the index incrementally: probe the batch,
    keep the survivors, upsert THEIR rows — history is never
    re-signed. Intentionally sink-agnostic: no storage import here, so
    the catalog query's attestation closure stays purely relational.
    """
    return signature_index_rows_from_bands(batch_bands(docs, id_col),
                                           id_col)


def signature_index_rows_from_bands(bands: DataFrame,
                                    id_col: str) -> DataFrame:
    """`signature_index_rows` over an ALREADY-COMPUTED (id, band,
    band_sig) frame — so an arrival loop that just probed the batch
    can fold the survivors in without re-shingling/re-signing them
    (filter the probe's band frame to the survivor ids and pass it
    here; the batch is signed ONCE, as the module contract says)."""
    return (bands.groupBy("band", "band_sig")
            .agg(F.min(id_col).alias("rep_id"))
            .select(F.concat_ws("|", F.col("band").cast("string"),
                                F.col("band_sig")).alias("bucket_key"),
                    "band", "band_sig", "rep_id"))


def _index_hits(probe: DataFrame, new_bands: DataFrame,
                index_bands: DataFrame, id_col: str) -> DataFrame:
    """(id, band) rows of the batch that collide with ONE index frame
    — bucket_key join when the frame carries the store's merge key
    (bucketed store side stays exchange-free), (band, band_sig)
    otherwise; self-hits excluded when rep_id rides along."""
    if "bucket_key" in index_bands.columns:
        if "rep_id" in index_bands.columns:
            return (probe.join(
                index_bands.select("bucket_key",
                                   F.col("rep_id").alias("__rep")),
                "bucket_key")
                .filter(F.col("__rep") != F.col(id_col))
                .select(id_col, "band"))
        return (probe.join(index_bands.select("bucket_key"),
                           "bucket_key").select(id_col, "band"))
    return (new_bands.join(
        index_bands.select("band", "band_sig"), ["band", "band_sig"])
        .select(id_col, "band"))


def incremental_near_dup_flags(new_docs: DataFrame, index_bands: DataFrame,
                               id_col: str,
                               new_bands: DataFrame | None = None,
                               pending_index_bands: DataFrame | None = None
                               ) -> DataFrame:
    """Classify each new-batch document against a band-signature index.

    ``index_bands`` needs only (band, band_sig) — exactly what a
    persisted signature store holds. When it ALSO carries the store's
    single merge key ``bucket_key`` (the `signature_index_rows`
    column, a bijection of (band, band_sig)), the probe joins on that
    one key instead — so an index table bucket-stored on bucket_key
    feeds the join exchange-free and only the batch side shuffles,
    the posture that matters when the index is the 100 TB side.

    When the index additionally carries ``rep_id`` (the bucket's
    representative document), a collision whose representative IS the
    probing document is ignored: a batch replayed after its survivors
    were already folded in (the streaming foreachBatch retry case)
    then classifies exactly as the first run — without this, every
    replayed unique document would match its own signatures and flip
    to dup_vs_index. Returns (id, hits_index, verdict).

    ``pending_index_bands`` is the LSM tail: when the index store is
    maintained by O(batch) delta appends between folds, the committed
    base probes exchange-free (bucketed scan) and the small pending
    tail probes as a SEPARATE join (AQE broadcasts it) — a plain
    union of the two frames would instead re-shuffle the whole base
    per arrival, the exact cost the bucketed store exists to avoid.
    """
    if new_bands is None:
        new_bands = batch_bands(new_docs, id_col)
    probe = new_bands.withColumn(
        "bucket_key", F.concat_ws("|", F.col("band").cast("string"),
                                  F.col("band_sig")))
    hits_src = _index_hits(probe, new_bands, index_bands, id_col)
    if pending_index_bands is not None:
        hits_src = hits_src.unionByName(
            _index_hits(probe, new_bands, pending_index_bands, id_col))
    hits = (hits_src
            .groupBy(id_col)
            .agg(F.countDistinct("band").cast("long").alias("hits_index")))
    bucket_min = (new_bands.groupBy("band", "band_sig")
                  .agg(F.min(id_col).alias("__min_id")))
    batch_dup = (new_bands.join(bucket_min, ["band", "band_sig"])
                 .filter(F.col(id_col) > F.col("__min_id"))
                 .select(F.col(id_col), F.lit(1).alias("__in_batch"))
                 .distinct())
    # short documents (< 3 tokens) produce no shingles and therefore
    # no bands — the left joins classify them 'unique', matching the
    # oracle's base-from-documents frame
    return (new_docs.select(id_col)
            .join(hits, id_col, "left")
            .join(batch_dup, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("hits_index"), F.lit(0).cast("long"))
                 .alias("hits_index"),
                F.when(F.coalesce(F.col("hits_index"), F.lit(0)) > 0,
                       F.lit("dup_vs_index"))
                 .when(F.col("__in_batch").isNotNull(), F.lit("dup_in_batch"))
                 .otherwise(F.lit("unique")).alias("verdict")))


@register("q_incremental_dedup", INCREMENTAL_ORACLE,
          "cross-batch near-dup: new batch probed against the history's "
          "band-signature index + bucket-min within-batch dedup")
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    new_docs = d.filter(F.col("doc_id") % 3 == 0)
    history = d.filter(F.col("doc_id") % 3 != 0)
    index = (lsh_bands(
        minhash_signatures(shingles(history, "doc_id", "text", 3),
                           "doc_id", 16), "doc_id", 4)
        .select("band", "band_sig").distinct())
    return incremental_near_dup_flags(new_docs, index, "doc_id")
