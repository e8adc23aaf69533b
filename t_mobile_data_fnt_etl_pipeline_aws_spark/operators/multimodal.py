"""Multimodal-column operators (SURVEY.md §2.11).

The engine's multimodal model: media payloads are opaque BINARY columns
with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched Pandas functions over mapInPandas. The image/audio codec
libraries are not in this container, so the decode kernel is a clearly
marked STUB (deterministic byte-level features standing in for pixel
features) — the Spark-side plumbing (schema, batching, partition flow)
is real and oracle-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load


@query(
    "q_multimodal_enrich",
    oracle=f"""
    SELECT d.lang, e.label,
           count(*) AS n_docs,
           cast(sum(d.n_chars) as double) / count(*) AS avg_chars,
           min(d.doc_id) AS min_doc_id
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE e.label < 5
    GROUP BY d.lang, e.label
    """,
)
def q_multimodal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join text and vector modalities into one table, aggregate per label.

    documents ⋈ embeddings on doc_id = vec_id (inner — at sf0.1 the
    tables are deliberately unaligned, FIXTURES.md), filter by label,
    text stats per (lang, label). n_chars sums are exact BIGINT.
    """
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings").filter(F.col("label") < 5)
    return (
        d.join(e, d.doc_id == e.vec_id, "inner")
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


#: media-decode stub contract: real decoders (PIL/ffmpeg/soundfile) are not
#: available in this environment — decode_media() raises, and the feature
#: extractor below uses deterministic byte-level stand-ins instead.
def decode_media(payload: bytes, media_type: str):
    """Decode an image/audio/video payload to a numpy tensor. STUB."""
    raise NotImplementedError(
        "media codecs unavailable in this container; use the byte-level "
        "stub features in q_multimodal_decode_stub (same Spark plumbing)"
    )


@query(
    "q_multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           cast(octet_length(encode(text)) as bigint) AS n_bytes,
           cast(ascii(text) as int) AS first_cp,
           cast(octet_length(encode(text)) % 256 as int) AS fake_width,
           cast(octet_length(encode(text)) // 256 as int) AS fake_height
    FROM documents
    """,
)
def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode/feature-extract plumbing over mapInPandas.

    The 'payload' is the utf-8 encoding of text (fixtures ship no real
    media); the extractor computes deterministic byte-level features where
    a real pipeline would call decode_media() and emit pixel/spectrogram
    features. Arrow batch shape, output schema, and partition flow are
    exactly what a production media pipeline uses.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    # STUB: real decode -> decode_media(payload, "image");
                    # stand-in features below are deterministic byte math.
                    # first code point (not first byte): DuckDB's ascii()
                    # returns the Unicode code point, and b[0] would both
                    # diverge on non-ASCII leads and raise on empty text.
                    "first_cp": payload.map(
                        lambda b: ord(b.decode("utf-8")[0]) if b else 0
                    ).astype("int32"),
                    "fake_width": (n_bytes % 256).astype("int32"),
                    "fake_height": (n_bytes // 256).astype("int32"),
                }
            )

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        extract,
        schema="doc_id bigint, n_bytes bigint, first_cp int, "
        "fake_width int, fake_height int",
    )
