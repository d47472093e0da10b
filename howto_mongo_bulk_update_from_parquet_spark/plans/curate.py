"""User-facing corpus-curation pipeline: the composed form of the
catalog's curation stages, wired for the `cli.py curate` verb
(r10 verdict #3).

`q_training_pipeline` proves the stages compose into one lazy DAG;
this module is the production wiring of that DAG — exact dedup →
substring-level trim (Lee et al. 2022, `trim_dup_spans`) → quality
gate → deterministic split → sequence packing — over ANY parquet of
documents, returning the intermediate frames so the caller can
account for every dropped row and emit the corpus card as the run
manifest.

Scale posture, stage by stage:
- exact dedup: one hash-partitioned window over md5(text) (same
  shape as q_training_pipeline — narrow state, no all-pairs);
- substring trim: the q_dedup_trim plan (16-byte k-gram shuffle
  keys, map-combinable global count, one anti equi-join — x100
  scale slope 0.68, sub-linear, SCALE_RESULTS.json);
- quality/split: scan-local expressions, zero shuffle;
- packing: one running-sum window per (split, lang) partition —
  the q_doc_packing shape; token offsets never cross partitions, so
  no global sort and no single-reducer concentration.

Reference parity note: the reference repo's pipeline
(`/root/reference/src/func/job.py:20-94`) is a one-stage
read→transform→sink chain; this module is the mandated LLM-pipeline
extension of that chain — same lazy single-DAG discipline, five
curation stages instead of one upsert stage.

Each stage is already oracle-attested under its own catalog entry
(q_dedup_keep_one, q_dedup_trim, q_training_pipeline, q_doc_packing,
q_corpus_card); `q_curate_pipeline` additionally puts the COMPOSED
DAG — the exact frame the CLI ships — under the driver's oracle, so
a regression in how the stages hand off (the trim feeding the
quality gate, the gate feeding the packer) cannot hide behind four
individually-green stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import portable_hash64
from ..sources.parquet import load_table
from .catalog import register
from .dup_spans import _SPANS_SQL, K, trim_dup_spans


def curate_stages(docs: DataFrame, *, min_tokens: int = 20, k: int = K,
                  weights: tuple[int, int, int] = (80, 10, 10),
                  pack_budget: int = 512,
                  near_dup: bool = False) -> dict[str, DataFrame]:
    """The curation DAG over a (doc_id, text[, lang]) frame.

    Returns the named intermediate frames — all lazy, sharing one
    scan lineage — so the caller can count each stage's survivors:

    - ``deduped``: exact-duplicate texts collapsed to the smallest
      doc_id (md5 window, keep-smallest convention); with
      ``near_dup=True`` a MinHash-LSH keep-one pass follows — any
      document sharing a band bucket with a smaller-id survivor is
      dropped (the q_dedup_keep_one / dup_in_batch bucket-min rule,
      O(collisions) via banding, never all-pairs);
    - ``trimmed``: corpus-duplicated k-token spans cut out and the
      document rebuilt (docs trimmed to nothing drop here);
    - ``curated``: the quality-gated survivors with ``split`` (a
      deterministic md5 split by `weights`), ``seq_id`` (greedy
      sequential packing into `pack_budget`-token sequences per
      (split, lang)), ``n_tok`` and the trimmed ``text``.
    """
    # NULL langs coalesce to 'unknown' at the door: a NULL would both
    # silently vanish from multi-arg countDistinct (n_sequences
    # undercount) and diverge from DuckDB's struct-distinct semantics
    # (code-review r11)
    lang = (F.coalesce(F.col("lang"), F.lit("unknown"))
            if "lang" in docs.columns else F.lit("unknown"))
    base = docs.select("doc_id", "text", lang.alias("lang"))

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (base.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1).drop("rn"))

    if near_dup:
        from ..operators.dedup import (lsh_bands, minhash_signatures,
                                       shingles)
        bands = lsh_bands(
            minhash_signatures(shingles(deduped, "doc_id", "text", 3),
                               "doc_id", 16), "doc_id", 4)
        bucket_min = (bands.groupBy("band", "band_sig")
                      .agg(F.min("doc_id").alias("__min_id")))
        losers = (bands.join(bucket_min, ["band", "band_sig"])
                  .filter(F.col("doc_id") > F.col("__min_id"))
                  .select("doc_id").distinct())
        deduped = deduped.join(losers, "doc_id", "left_anti")

    trimmed = (trim_dup_spans(deduped.select("doc_id", "text"), k=k)
               .join(deduped.select("doc_id", "lang"), "doc_id")
               .select("doc_id", "lang",
                       F.col("kept_tokens").alias("n_tok"),
                       F.col("trimmed_text").alias("text")))

    quality = trimmed.filter(F.col("n_tok") >= min_tokens)

    w_train, w_val, _ = weights
    bucket = portable_hash64(F.col("doc_id").cast("string")) % 100
    split = (F.when(bucket < w_train, "train")
             .when(bucket < w_train + w_val, "val")
             .otherwise("test"))
    assigned = quality.withColumn("split", split)

    pack_w = (Window.partitionBy("split", "lang").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    curated = (assigned
               .withColumn("__off",
                           F.sum("n_tok").over(pack_w) - F.col("n_tok"))
               .withColumn("seq_id",
                           (F.col("__off") / F.lit(pack_budget))
                           .cast("long"))
               .select("doc_id", "lang", "split", "seq_id", "n_tok", "text"))
    return {"deduped": deduped, "trimmed": trimmed, "curated": curated}


def corpus_card_frame(curated: DataFrame) -> DataFrame:
    """One-row dataset card over a curated corpus — the q_corpus_card
    aggregation applied to an arbitrary (doc_id, lang, text) frame
    instead of the fixture table: counts, language mix, exact length
    quantiles, residual exact-dup rate. One aggregation pass over one
    scan; the top-language pick is a 1-row TakeOrderedAndProject."""
    base = curated.select(
        "doc_id", "lang",
        F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("h")).localCheckpoint(eager=False)
    langs = base.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    top = langs.orderBy(F.col("c").desc(), "lang").limit(1).collect()
    if not top:
        return curated.sparkSession.createDataFrame(
            [(0, 0, 0, None, None, None, None, 0)],
            "n_docs long, n_tokens long, n_langs long, top_lang string, "
            "top_lang_share double, median_tokens double, p90_chars double, "
            "n_exact_dups long")
    n_langs = langs.count()
    card = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.expr("percentile(n_tokens, 0.5)").alias("median_tokens"),
        F.expr("percentile(n_chars, 0.9)").alias("p90_chars"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"))
    return card.select(
        "n_docs", "n_tokens",
        F.lit(n_langs).cast("long").alias("n_langs"),
        F.lit(top[0].lang).alias("top_lang"),
        F.round(F.lit(float(top[0].c)) / F.col("n_docs"), 6)
         .alias("top_lang_share"),
        "median_tokens", "p90_chars", "n_exact_dups")


# The composed pipeline's oracle: dedup -> substring trim (the
# q_dedup_trim machinery applied to the DEDUPED corpus) -> quality
# gate on KEPT tokens -> md5 split -> greedy per-(split,lang) packing.
CURATE_PIPELINE_ORACLE = f"""
WITH dd AS (
  SELECT doc_id, COALESCE(lang, 'unknown') AS lang, text FROM (
    SELECT doc_id, lang, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
),
{_SPANS_SQL.replace("FROM documents", "FROM dd")},
cov AS (
  SELECT doc_id, UNNEST(range(span_start, span_end + 1)) AS pos
  FROM spans
),
tokpos AS (
  SELECT doc_id, u.pos AS pos
  FROM toks, UNNEST(list_transform(range(1, len(tk) + 1),
       i -> struct_pack(pos := i - 1))) AS t(u)
),
trimmed AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tokpos t
  WHERE NOT EXISTS (SELECT 1 FROM cov c
                    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
  GROUP BY t.doc_id
),
quality AS (
  SELECT t.doc_id, d.lang, t.n_tok
  FROM trimmed t JOIN dd d USING (doc_id)
  WHERE t.n_tok >= 20
),
assigned AS (
  SELECT doc_id, lang, n_tok,
         CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     AS BIGINT) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split
  FROM quality
),
packed AS (
  SELECT split, lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY split, lang ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS tok_off
  FROM assigned
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT (lang, CAST(tok_off // 512 AS BIGINT)))
            AS BIGINT) AS n_sequences
FROM packed GROUP BY split
"""


@register("q_curate_pipeline", CURATE_PIPELINE_ORACLE,
          "the composed curation DAG the `curate` CLI ships: exact "
          "dedup -> substring trim -> quality gate on kept tokens -> "
          "md5 split -> greedy per-(split,lang) packing, reduced to "
          "per-split accounting")
def q_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang")
    curated = curate_stages(docs)["curated"]
    return (curated.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("total_tokens"),
                 F.countDistinct("lang", "seq_id").cast("long")
                  .alias("n_sequences")))
