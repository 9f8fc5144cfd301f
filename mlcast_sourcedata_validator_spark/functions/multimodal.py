"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Spark ``BinaryType`` columns with
a typed metadata struct alongside — the table stays columnar, Parquet
stores the bytes page-compressed, and partition pruning / predicate
pushdown keep working on the metadata columns.

Decode / feature-extraction runs as Arrow-batched pandas UDFs over
``mapInPandas``: the Spark-side plumbing (schema, batch iteration,
partition sizing) is real and tested; the actual codec step is STUBBED —
this container has no image/audio libraries — behind ``decode_image``,
which raises ``NotImplementedError`` unless a known decoder (PIL) is
importable. ``extract_media_meta`` uses a deterministic fake "decode"
(byte-length arithmetic) so the pipeline shape is verifiable end-to-end
and oracle-checkable in SQL.

Scale notes: mapInPandas streams Arrow batches (no per-row Python); binary
columns make row groups large, so pair this with
``spark.sql.files.maxPartitionBytes`` sized such that one task's batches
fit executor memory (e.g. 128 MB row groups -> default 128 MB partitions).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "byte_len int, width int, height int, format string"
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media bytes: the utf-8 encoding of the text
    column as an opaque binary payload (stand-in for image bytes)."""
    return df.withColumn("media", F.encode(F.col(text_col), "utf-8"))


def decode_image(data: bytes):
    """Real decode step — stubbed: no imaging library in this container.

    Gated behind an import-try so environments with PIL get a real decode;
    everything else raises, exactly like the reference degrades when GDAL
    is absent (reference: checks/tool_compatibility/gdal.py:21-36).
    """
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as exc:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL); not available"
        ) from exc


def extract_media_meta(df: DataFrame, id_col: str, media_col: str = "media") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The fake decode derives (width, height) deterministically from the
    byte length — replacing it with a real codec only changes the inner
    function, not the Spark plumbing. Output: (id, byte_len, width,
    height, format).
    """
    out_schema = f"{id_col} long, byte_len int, width int, height int, format string"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf[media_col].map(lambda b: 0 if b is None else len(b)).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": lens.astype("int32"),
                    "width": (lens % 1024).astype("int32"),
                    "height": ((lens // 1024) % 1024).astype("int32"),
                    "format": ["fake/v1"] * len(pdf),
                }
            )

    from .dedup import _ensure_parallelism

    # a compacted single-file input would otherwise run the whole Arrow
    # pipeline on one task; but repartitioning BINARY payloads round-trips
    # every media byte through the exchange, so only do it past the size
    # floor where per-byte decode work dominates (measured 3.6x slower
    # WITH the repartition at sf0.1's 350 KB corpus)
    from .dedup import CHEAP_PATH_MIN_BYTES
    return _ensure_parallelism(df.select(id_col, media_col),
                               min_bytes=CHEAP_PATH_MIN_BYTES).mapInPandas(
        _extract, schema=out_schema
    )


def frame_sample(df: DataFrame, id_col: str, media_col: str = "media",
                 every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the fake payload: one row per sampled offset
    (video-frame-extraction plumbing: explode an index range, slice bytes).
    Pure Column expressions — the slicing pattern scales because offsets
    are computed JVM-side and bytes stay columnar."""
    from .dedup import _ensure_parallelism

    from .dedup import CHEAP_PATH_MIN_BYTES
    n = F.length(F.col(media_col))
    offsets = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    return (
        _ensure_parallelism(df, min_bytes=CHEAP_PATH_MIN_BYTES)
        .select(F.col(id_col), F.col(media_col), F.explode(offsets).alias("frame_no"))
        .select(
            id_col,
            "frame_no",
            F.substring(
                F.col(media_col).cast("string"),
                (F.col("frame_no") * every_n_bytes + 1).cast("int"),
                F.lit(every_n_bytes),
            ).alias("frame_bytes"),
        )
    )
