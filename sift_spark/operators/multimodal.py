"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED behind
`decode_available()` because no image/audio libraries exist in this
container -- `deterministic_fake=True` substitutes a seeded, content-hash
derived feature vector so downstream operators (dedup, ANN) are testable
end-to-end.

At scale: media rows are fat like html rows, so the same fat-row salting
(plans/partitioning.py) applies; mapInPandas streams Arrow batches so one
task never materializes more than `maxRecordsPerBatch` blobs.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha1", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("error", T.StringType()),
    ]
)


def decode_available():
    """True when a real decoder stack (PIL / libav) is importable."""
    try:  # pragma: no cover - not available in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_features(payload):
    """Deterministic stand-in feature vector: FEATURE_DIM floats derived
    from the SHA1 of the payload (pure function of content)."""
    digest = hashlib.sha1(payload).digest()
    doubled = (digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4]
    ints = struct.unpack(f">{FEATURE_DIM}I", doubled)
    return [float(v % 1000) / 1000.0 for v in ints]


def resolve_decoder(spec):
    """'module.path:function' -> the callable (payload_bytes ->
    list[float]). This is what makes a real decoder a CONFIG change:
    `--decoder my_decoders:clip_embed` on the job CLI, no engine edit."""
    import importlib

    if callable(spec):
        return spec
    if not spec or ":" not in spec:
        raise ValueError(
            f"decoder spec must be 'module.path:function', got {spec!r}"
        )
    module_name, func_name = spec.split(":", 1)
    module = importlib.import_module(module_name)
    fn = getattr(module, func_name, None)
    if not callable(fn):
        raise ValueError(f"{spec!r} does not name a callable")
    return fn


def extract_media_features(media_df, deterministic_fake=True,
                           batch_feature_fn=None):
    """media table -> feature table via mapInPandas (Arrow-streamed).

    batch_feature_fn: a callable (payload_bytes -> list[float]) or a
    'module:function' spec string (resolve_decoder) plugging a real
    decoder; without one and with deterministic_fake=False this raises
    NotImplementedError (clearly-marked stub)."""
    if batch_feature_fn is None:
        if decode_available():  # pragma: no cover
            raise NotImplementedError(
                "real decoder integration not wired in this container"
            )
        if not deterministic_fake:
            raise NotImplementedError(
                "media decoding requires image/audio libraries not present "
                "in this container; pass batch_feature_fn or use "
                "deterministic_fake=True"
            )
        batch_feature_fn = _fake_features
    elif isinstance(batch_feature_fn, str):
        batch_feature_fn = resolve_decoder(batch_feature_fn)

    def process(iterator):
        import pandas as pd

        for pdf in iterator:
            rows = {
                "media_id": [], "kind": [], "n_bytes": [],
                "content_sha1": [], "features": [], "error": [],
            }
            # column-array iteration (no pandas Series boxing per row);
            # per-blob work is inherently sequential inside the batch
            for media_id, kind, payload in zip(
                pdf["media_id"].to_numpy(),
                pdf["kind"].to_numpy(),
                pdf["payload"].tolist(),
            ):
                rows["media_id"].append(media_id)
                rows["kind"].append(kind)
                if payload is None:
                    rows["n_bytes"].append(0)
                    rows["content_sha1"].append(None)
                    rows["features"].append(None)
                    rows["error"].append("empty payload")
                    continue
                payload = bytes(payload)
                rows["n_bytes"].append(len(payload))
                rows["content_sha1"].append(hashlib.sha1(payload).hexdigest())
                try:
                    rows["features"].append(batch_feature_fn(payload))
                    rows["error"].append(None)
                except NotImplementedError as exc:
                    rows["features"].append(None)
                    rows["error"].append(str(exc))
            yield pd.DataFrame(rows)

    return media_df.select(
        "media_id", "kind", "payload"
    ).mapInPandas(process, FEATURES_SCHEMA)


def frame_sample_plan(media_df, every_ms=1000):
    """Video frame-sampling PLAN: one output row per planned frame
    (native sequence explode over duration); the decode itself is the
    stubbed step above. Demonstrates explode-shape correctness for the
    scale tier."""
    return media_df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def build_fake_media_df(spark, n_rows=32, seed=42):
    """Deterministic synthetic media table for tests/bench."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(64 + (i % 5) * 32))
        rows.append(
            (i, kind, payload, f"{kind}/fake",
             640 if kind == "image" else None,
             480 if kind == "image" else None,
             5000 if kind == "video" else (3000 if kind == "audio" else None))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
