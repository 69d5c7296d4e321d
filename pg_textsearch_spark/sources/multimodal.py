"""Multimodal columns: image/audio/video as opaque binary + metadata.

Not in the reference (text-only engine); part of the training-data
pipeline surface this engine serves at 100 TB. Media travel as
``binary`` payloads with a typed metadata struct; decode / feature
extraction / resize / frame sampling are Arrow-batched ``mapInPandas``
kernels. The decode step is CAPABILITY-PROBED per worker process
(``decode_capabilities``, the Iceberg-store pattern): with
PIL/soundfile/pyav installed the payloads are actually decoded (and
bad bytes raise the codec's own error); in this container, which
ships no codecs, a clearly-marked deterministic fake derives features
from payload bytes so the Spark-side plumbing — schema, partitioning,
UDF signatures, batch shapes — still runs for real and is tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_textsearch_spark.sources.pages import _splitmix64, _u01

MEDIA_SCHEMA = (
    "media_id bigint, url string, kind string, payload binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:int>"
)

FEATURE_DIM = 32

_KINDS = ["image", "image", "image", "audio", "video"]


def generate_media(
    spark: SparkSession, n_rows: int, seed: int = 11, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic media table (payload = opaque bytes)."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(it):
        np.seterr(over="ignore")  # uint64 counter arithmetic wraps by design
        for pdf in it:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            base = np.uint64(seed * 0x9E3779B1)
            u = _u01(base ^ ids)
            kinds = [_KINDS[int(i) % len(_KINDS)] for i in ids]
            sizes = (64 + (u * 448).astype(np.int64)).tolist()
            payloads = [
                _splitmix64(
                    np.uint64(i) * np.uint64(2654435761)
                    + np.arange(sz, dtype=np.uint64)
                ).astype(np.uint64).view(np.uint8).tobytes()[:sz]
                for i, sz in zip(ids.tolist(), sizes)
            ]
            w = (16 + (_u01(base ^ (ids * np.uint64(3))) * 2032)).astype(np.int64)
            h = (16 + (_u01(base ^ (ids * np.uint64(5))) * 2032)).astype(np.int64)
            dur = (_u01(base ^ (ids * np.uint64(7))) * 600000).astype(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids.astype(np.int64),
                    "url": [f"s3://corpus/media/{i}" for i in ids.tolist()],
                    "kind": kinds,
                    "payload": payloads,
                    "meta": [
                        {
                            "mime": f"{k}/bin",
                            "width": int(wi) if k == "image" else 0,
                            "height": int(hi) if k == "image" else 0,
                            "duration_ms": int(d) if k != "image" else 0,
                        }
                        for k, wi, hi, d in zip(kinds, w, h, dur)
                    ],
                }
            )

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(
        gen, MEDIA_SCHEMA
    )


_CAPS_CACHE: dict[str, bool] | None = None


def decode_capabilities(refresh: bool = False) -> dict[str, bool]:
    """Probe which REAL media decoders this environment has — the
    Iceberg-store pattern (index/storage.py): capability decided by an
    import probe, real implementation taken when present, the
    documented fallback otherwise. Evaluated inside the Python WORKER
    (each executor probes its own environment); cached per process."""
    global _CAPS_CACHE
    if _CAPS_CACHE is not None and not refresh:
        return _CAPS_CACHE
    caps = {}
    try:
        from PIL import Image  # noqa: F401

        caps["image"] = True
    except ImportError:
        caps["image"] = False
    try:
        import soundfile  # noqa: F401

        caps["audio"] = True
    except ImportError:
        caps["audio"] = False
    try:
        # pyav raises OSError (missing/mismatched libav .so), not just
        # ImportError — any import failure means "capability absent"
        import av  # noqa: F401

        caps["video"] = True
    except Exception:
        caps["video"] = False
    _CAPS_CACHE = caps
    return caps


def _decode_image_real(payload: bytes) -> np.ndarray:
    """PIL path: grayscale, resize to an 8x4 grid = FEATURE_DIM pixel
    intensities in [0,1]. Raises (PIL.UnidentifiedImageError) on bytes
    that are not a real image — loud, never a silent fake."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((8, 4))
    return np.asarray(img, dtype=np.float64).reshape(-1) / 255.0


def _decode_audio_real(payload: bytes) -> np.ndarray:
    """soundfile path: mean |amplitude| over FEATURE_DIM equal time
    bins of the first channel."""
    import io

    import soundfile as sf

    data, _rate = sf.read(io.BytesIO(payload), always_2d=True)
    mono = np.abs(data[:, 0].astype(np.float64))
    if len(mono) == 0:
        return np.zeros(FEATURE_DIM)
    bins = np.array_split(mono, FEATURE_DIM)
    return np.array([b.mean() if len(b) else 0.0 for b in bins])


def _decode_video_real(payload: bytes) -> np.ndarray:
    """pyav path: first frame, grayscale, 8x4 grid (same contract as
    the image path)."""
    import io

    import av

    with av.open(io.BytesIO(payload)) as container:
        for frame in container.decode(video=0):
            arr = frame.to_ndarray(format="gray")
            h, w = arr.shape
            ys = (np.arange(4) * h // 4).clip(0, h - 1)
            xs = (np.arange(8) * w // 8).clip(0, w - 1)
            return arr[np.ix_(ys, xs)].astype(np.float64).reshape(-1) / 255.0
    raise ValueError("video payload decoded zero frames")


_REAL_DECODERS = {
    "image": _decode_image_real,
    "audio": _decode_audio_real,
    "video": _decode_video_real,
}


def _decode_payload(
    payload: bytes, kind: str, mime: str | None = None
) -> np.ndarray:
    """Decode one media payload to a FEATURE_DIM float array.

    Dispatch is mime-aware: the synthetic ``<kind>/bin`` payloads
    (``generate_media``'s declared format — splitmix64 bytes) ALWAYS
    take the deterministic decoder below, even where real codecs are
    installed — they are not images/audio and feeding them to PIL
    would (rightly) raise. For real mimes, when the decoder for
    ``kind`` is installed (PIL / soundfile / pyav — see
    ``decode_capabilities``) the payload is ACTUALLY decoded, and
    undecodable bytes raise the codec's own error rather than falling
    back; when the codec is absent (this container ships none) the
    documented deterministic fake runs so every downstream stage
    (batching, normalization, feature schema) still executes for real
    and reproducibly.
    """
    synthetic = mime is not None and mime.endswith("/bin")
    if not synthetic and decode_capabilities().get(kind):
        return _REAL_DECODERS[kind](payload)
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.uint64)
    n = max(len(raw), 1)
    idx = np.arange(FEATURE_DIM, dtype=np.uint64)
    acc = _splitmix64(idx * np.uint64(1099511627776 + n))
    for off in range(0, len(raw), FEATURE_DIM):
        chunk = raw[off : off + FEATURE_DIM]
        acc[: len(chunk)] = _splitmix64(acc[: len(chunk)] ^ chunk)
    return (acc >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, kind, features array<float>) via mapInPandas.

    Batch shape contract: one Arrow batch in, one pandas frame out,
    features L2-normalized float32 — the exact plumbing a real
    embedding model (ONNX/torch) would use.
    """

    def run(it):
        for pdf in it:
            feats = []
            mimes = (
                [m.get("mime") if isinstance(m, dict) else m["mime"]
                 for m in pdf["meta"]]
                if "meta" in pdf.columns
                else [None] * len(pdf)
            )
            for payload, kind, mime in zip(
                pdf["payload"], pdf["kind"], mimes
            ):
                v = _decode_payload(bytes(payload), kind, mime)
                nrm = np.linalg.norm(v)
                feats.append((v / nrm if nrm > 0 else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    # ship ONLY the columns the kernel reads across the Arrow boundary
    # (guide §4.2: Spark cannot see inside the function and would
    # otherwise read+transfer url and any caller-added columns too)
    cols = [c for c in ("media_id", "kind", "payload", "meta")
            if c in media.columns]
    return media.select(*cols).mapInPandas(
        run, "media_id bigint, kind string, features array<float>"
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-JVM resize planning over image metadata: target dims with
    aspect preserved. (The pixel work is the stubbed decode step; the
    planning column logic is the real pipeline shape.)"""
    w = F.col("meta.width")
    h = F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_w"),
        F.round(h * scale).cast("int").alias("target_h"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video -> (media_id, frame_ts_ms) rows, one per sampled frame —
    JVM sequence/explode; the decode of each frame is the stub above."""
    dur = F.col("meta.duration_ms")
    ts = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(ts).alias("frame_ts_ms"))
    )
