"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

The real decode libraries (PIL/librosa/av) are not in this
environment, so the decode step is STUBBED: `decode_asset` raises
NotImplementedError unless `fake=True`, in which case it derives
deterministic pseudo-metadata from the payload bytes. Everything
around the stub — the binary column, schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.

Scale notes (100 TB of media): binary payloads ride in parquet as
BYTE_ARRAY; `spark.sql.files.maxPartitionBytes` bounds scan-task
memory; `mapInPandas` streams Arrow batches so one task never holds a
partition of blobs in memory at once; metadata-only queries prune the
blob column entirely (columnar format ⇒ free).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_META_SCHEMA = ("asset_id long, kind string, n_bytes long, "
                     "width long, height long, n_frames long")

KINDS = ["image", "audio", "video"]


def attach_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive an asset table with an opaque binary payload column.
    (In production the blob arrives from the source; here we materialize
    one deterministically so the binary path is exercised end-to-end.)"""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"))


def decode_asset(blob: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one media payload → metadata. STUB: the real
    image/audio/video decoders are unavailable in this environment."""
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/librosa/av — not present; "
            "run with fake=True for deterministic pseudo-metadata")
    n = len(blob)
    return {"n_bytes": n,
            "width": 16 + n % 1024,
            "height": 16 + (n * 7) % 1024,
            "n_frames": 1 + n % 24 if kind == "video" else 1}


def extract_media_meta(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""
    import pandas as pd

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            metas = [decode_asset(b, k, fake=fake)
                     for b, k in zip(pdf["blob"], pdf["kind"])]
            out = pd.DataFrame(metas)
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            out.insert(1, "kind", pdf["kind"].to_numpy())
            yield out

    return assets.mapInPandas(meta, schema=ASSET_META_SCHEMA)


def resize_plan(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize geometry for image/video assets: scale the long side down
    to `max_side` (never upscale), preserving aspect ratio. Vectorized
    numpy over Arrow batches — the real pixel resample would run in
    this same mapInPandas stage with the same batch shape; the
    geometry arithmetic here is the deterministic, oracle-checkable
    part."""
    import numpy as np
    import pandas as pd

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            w = pdf["width"].to_numpy(dtype=np.float64)
            h = pdf["height"].to_numpy(dtype=np.float64)
            long_side = np.maximum(w, h)
            scale = np.where(long_side > max_side, max_side / long_side, 1.0)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "width": pdf["width"].to_numpy(),
                "height": pdf["height"].to_numpy(),
                "new_width": np.floor(w * scale).astype(np.int64),
                "new_height": np.floor(h * scale).astype(np.int64)})

    return (meta.filter(F.col("kind").isin("image", "video"))
            .mapInPandas(resize, schema="asset_id long, kind string, "
                                        "width long, height long, "
                                        "new_width long, new_height long"))


def sample_frames(meta: DataFrame, every_nth: int = 6) -> DataFrame:
    """Frame-sampling plan for video assets: one row per kept frame.
    Pure relational (sequence + explode) — the per-frame decode would
    plug into another mapInPandas stage."""
    return (meta.filter(F.col("kind") == "video")
            .select("asset_id",
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_frames") - 1,
                        F.lit(every_nth))).alias("frame_idx")))


FEATURE_SCHEMA = ("asset_id long, n_bytes long, n_distinct_bytes long, "
                  "sum_bytes long, min_byte long, max_byte long")


def extract_byte_features(assets: DataFrame) -> DataFrame:
    """REAL (non-stub) feature extraction over the binary column:
    byte-level content statistics per asset via numpy over Arrow
    batches. This is the embedding-extraction pipeline shape — blob →
    Arrow batch → vectorized model → fixed-width feature row — with
    byte statistics standing in for the model, so the whole path is
    executable and oracle-checkable in this environment (a real
    encoder drops into this exact mapInPandas stage). All-integer
    outputs: no float fold ambiguity between engines."""
    import numpy as np
    import pandas as pd

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                rows.append((int(aid), int(arr.size),
                             int(np.unique(arr).size),
                             int(arr.sum(dtype=np.int64)),
                             int(arr.min()), int(arr.max())))
            yield pd.DataFrame(rows, columns=["asset_id", "n_bytes",
                                              "n_distinct_bytes", "sum_bytes",
                                              "min_byte", "max_byte"])

    return assets.mapInPandas(features, schema=FEATURE_SCHEMA)
