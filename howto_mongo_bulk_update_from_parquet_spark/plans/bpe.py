"""Distributed BPE tokenizer training (two merge rounds) — the
vocabulary-learning step of an LLM data pipeline, expressed as the
classic count→argmax→merge→recount loop with a full cross-engine
oracle (the DuckDB side unrolls both rounds as chained CTEs).

Shape per round: one map-side-combinable pair-count aggregation over
the WORD-FREQUENCY table (pair statistics are weighted by word
frequency, so the corpus is touched once up front and each round
aggregates only |vocab| rows — the standard fast-BPE factoring), a
1-row argmax collected to the driver (KB-scale driver state, the
k-means-centroid precedent), and a pure string `replace` applied to
every vocab entry. Symbols live as space-joined strings; merges
rewrite ' a b ' → ' ab ' on the space-padded form, which is the
sequential left-to-right merge both engines implement identically
(consecutive overlapping occurrences merge pairwise-left — the
standard greedy behavior).

Tie-break: highest count, then lexicographically smallest pair — both
sides pin it, so the chosen merge is deterministic.

The fixture vocabulary is small (the synthetic corpus reuses ~31
words), which keeps the oracle cheap; the plan is the one that runs
at real vocabulary scale — nothing driver-side ever holds more than
the current best pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .catalog import register

N_FINAL_PAIRS = 5

BPE_ORACLE = r"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), wf AS (
  SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w
), s0 AS (
  SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS sym, freq FROM wf
), pc0 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(string_split(sym, ' '))),
                 i -> string_split(sym, ' ')[i] || ' ' ||
                      string_split(sym, ' ')[i+1])) AS pair
    FROM s0) GROUP BY pair
), b0 AS (
  SELECT pair, cnt FROM pc0 ORDER BY cnt DESC, pair LIMIT 1
), s1 AS (
  SELECT trim(replace(' ' || sym || ' ',
                      ' ' || (SELECT pair FROM b0) || ' ',
                      ' ' || replace((SELECT pair FROM b0), ' ', '') || ' '))
           AS sym, freq
  FROM s0
), pc1 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(string_split(sym, ' '))),
                 i -> string_split(sym, ' ')[i] || ' ' ||
                      string_split(sym, ' ')[i+1])) AS pair
    FROM s1) GROUP BY pair
), b1 AS (
  SELECT pair, cnt FROM pc1 ORDER BY cnt DESC, pair LIMIT 1
), s2 AS (
  SELECT trim(replace(' ' || sym || ' ',
                      ' ' || (SELECT pair FROM b1) || ' ',
                      ' ' || replace((SELECT pair FROM b1), ' ', '') || ' '))
           AS sym, freq
  FROM s1
), pc2 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(string_split(sym, ' '))),
                 i -> string_split(sym, ' ')[i] || ' ' ||
                      string_split(sym, ' ')[i+1])) AS pair
    FROM s2) GROUP BY pair
)
SELECT 1 AS rnd, pair, replace(pair, ' ', '') AS merged, cnt FROM b0
UNION ALL
SELECT 2, pair, replace(pair, ' ', ''), cnt FROM b1
UNION ALL
SELECT 3, pair, NULL, cnt
FROM (SELECT pair, cnt FROM pc2 ORDER BY cnt DESC, pair LIMIT 5)
"""


def _pair_counts(sym_df: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol-pair counts."""
    pairs = F.expr(
        "CASE WHEN size(__tk) >= 2 THEN "
        "transform(sequence(0, size(__tk) - 2), "
        "i -> concat_ws(' ', __tk[i], __tk[i+1])) ELSE array() END")
    return (sym_df.select("freq", F.split("sym", " ").alias("__tk"))
            .select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.sum("freq").cast("long").alias("cnt")))


def _apply_merge(sym_df: DataFrame, pair: str) -> DataFrame:
    merged = pair.replace(" ", "")
    new_sym = F.trim(F.replace(
        F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
        F.lit(f" {pair} "), F.lit(f" {merged} ")))
    return sym_df.select(new_sym.alias("sym"), "freq")


@register("q_bpe_merges", BPE_ORACLE,
          "distributed BPE tokenizer training: two frequency-weighted "
          "pair-merge rounds over the word-frequency table, plus the "
          "post-merge top pairs — unrolled-CTE oracle")
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wf = (d.select(F.explode(F.split("text", " ")).alias("w"))
          .filter(F.col("w") != "")
          .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    sym = wf.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"), "freq")

    rows = []
    for rnd in (1, 2):
        best = (_pair_counts(sym).orderBy(F.desc("cnt"), "pair")
                .limit(1).collect()[0])  # 1-row driver state per round
        rows.append((rnd, best.pair, best.pair.replace(" ", ""),
                     best.cnt))
        sym = _apply_merge(sym, best.pair)

    chosen = spark.createDataFrame(
        rows, "rnd int, pair string, merged string, cnt long")
    final = (_pair_counts(sym).orderBy(F.desc("cnt"), "pair")
             .limit(N_FINAL_PAIRS)
             .select(F.lit(3).alias("rnd"), "pair",
                     F.lit(None).cast("string").alias("merged"), "cnt"))
    return chosen.unionByName(final)


# ---------------------------------------------------------------------------
# BPE ENCODE — the other half of the tokenizer surface: apply the
# trained merge list to the corpus and measure the per-language token
# economy. Encoding happens at VOCABULARY level (|V| rows get the
# merge chain; the corpus joins on the word), the same fast-BPE
# factoring as training — the corpus is never string-rewritten. The
# merge list is re-derived exactly as q_bpe_merges derives it (two
# 1-row driver argmaxes), so the query is self-contained and the
# oracle unrolls the identical chain.
# ---------------------------------------------------------------------------

BPE_ENCODE_ORACLE = r"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
), wf AS (
  SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w
), s0 AS (
  SELECT w, trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS sym, freq FROM wf
), pc0 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(string_split(sym, ' '))),
                 i -> string_split(sym, ' ')[i] || ' ' ||
                      string_split(sym, ' ')[i+1])) AS pair
    FROM s0) GROUP BY pair
), b0 AS (
  SELECT pair FROM pc0 ORDER BY cnt DESC, pair LIMIT 1
), s1 AS (
  SELECT w, trim(replace(' ' || sym || ' ',
                      ' ' || (SELECT pair FROM b0) || ' ',
                      ' ' || replace((SELECT pair FROM b0), ' ', '') || ' '))
           AS sym, freq
  FROM s0
), pc1 AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(range(1, len(string_split(sym, ' '))),
                 i -> string_split(sym, ' ')[i] || ' ' ||
                      string_split(sym, ' ')[i+1])) AS pair
    FROM s1) GROUP BY pair
), b1 AS (
  SELECT pair FROM pc1 ORDER BY cnt DESC, pair LIMIT 1
), enc AS (
  SELECT w, len(string_split(trim(replace(' ' || sym || ' ',
                      ' ' || (SELECT pair FROM b1) || ' ',
                      ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ')),
                ' ')) AS n_tok
  FROM s1
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(e.n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(len(words.w)) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(e.n_tok) AS DOUBLE) / COUNT(*), 6)
         AS tokens_per_word
FROM words JOIN enc e USING (w)
WHERE words.w <> ''
GROUP BY lang
"""


@register("q_bpe_encode", BPE_ENCODE_ORACLE,
          "BPE encoding pass: apply the trained merge chain at "
          "vocabulary level, join the corpus on the word, report "
          "per-language token economy (tokens/words/chars)")
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the tokenizer surface (training = q_bpe_merges,
    reference tokenization parity = SURVEY §2 text ops): the corpus
    is touched twice (word extraction, final join) and both merge
    applications run over |V| vocabulary rows — at 100 TB the encode
    cost is the broadcast-joinable vocabulary table, never a
    per-document Python loop."""
    d = load_table(spark, sf_dir, "documents")
    words = (d.select("doc_id", "lang",
                      F.explode(F.split("text", " ")).alias("w"))
             .filter(F.col("w") != ""))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    sym = wf.select(
        "w", F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
        "freq")

    for _rnd in (1, 2):
        best = (_pair_counts(sym.select("sym", "freq"))
                .orderBy(F.desc("cnt"), "pair")
                .limit(1).collect()[0])  # 1-row driver state per round
        merged = best.pair.replace(" ", "")
        new_sym = F.trim(F.replace(
            F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
            F.lit(f" {best.pair} "), F.lit(f" {merged} ")))
        sym = sym.select("w", new_sym.alias("sym"), "freq")

    enc = sym.select("w", F.size(F.split("sym", " ")).alias("n_tok"))
    return (words.join(enc, "w")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("n_tok").cast("long").alias("n_tokens"),
                 F.sum(F.length("w")).cast("long").alias("n_chars"),
                 F.round(F.sum("n_tok").cast("double")
                         / F.count(F.lit(1)), 6).alias("tokens_per_word")))
