"""Multimodal columns (BASELINE.json north star): image/audio/video as
opaque binary + typed metadata, with decode/feature/resize/frame-sample
stages as Arrow-batched Pandas functions over mapInPandas.

The image/audio codecs are NOT in this container (no PIL/ffmpeg), so
the decode kernels run a DETERMINISTIC SYNTHETIC CODEC with a fully
specified, cross-engine-verifiable contract (sha256-derived dimensions
and features — see `synthetic_decode`; the registry oracles it exactly
in DuckDB SQL). Everything Spark-side is production-shaped: schema
(schemas.MEDIA), partitioning, the mapInPandas batch shape (pandas
DataFrame per Arrow batch), payload pruning, and error-as-data
semantics. A real deployment replaces `synthetic_decode` with
PIL/torchvision inside the same iterator; nothing else changes.

Scale notes:
- Binary payloads ride the columnar format; select/filter on metadata
  columns never touches payload bytes (parquet column pruning).
- mapInPandas streams Arrow batches — bounded memory per task even with
  multi-MB payloads; tune spark.sql.execution.arrow.maxRecordsPerBatch
  down for large media.
- Feature extraction is embarrassingly parallel; repartition by
  media_id for even batches when file sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pandas imported lazily in workers
    import pandas as pd

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "media_id long, modality string, width int, height int, "
    "n_bytes long, sha256 string, ok boolean, error string"
)

# doubles (not float32) so feature values survive the Arrow round-trip
# bit-exactly and can be compared against a SQL oracle after 6dp rounding
FEATURES_SCHEMA = "media_id long, features array<double>, feature_dim int"

FRAMES_SCHEMA = "media_id long, frame_index int, frame_ms long, frame_sha256 string"

RESIZED_SCHEMA = (
    "media_id long, out_width int, out_height int, resized_sha256 string"
)


def synthetic_decode(payload: bytes | None) -> tuple[int, int]:
    """Deterministic synthetic codec with an exact output contract:
        digest = sha256(payload)
        width  = 64 + digest[0] % 512
        height = 64 + digest[1] % 512
    Both engines can compute this (DuckDB: sha256() + hex-byte
    extraction), so the decode stage has a FULL value oracle — see
    registry_ml.multimodal_decode_features. An empty/NULL payload is
    undecodable data (ValueError → caught as an ok=false row).

    A real deployment does:
        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height
    inside the same iterator (PIL is absent from this container).
    """
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 512, 64 + h[1] % 512


def pil_decode(payload: bytes | None) -> tuple[int, int]:
    """Real-image codec: Pillow inside the worker iterator — the swap
    the module docstring promises, now an importable code path instead
    of a comment. Optional-import: raises ImportError where Pillow is
    absent (this container), which the skip-gated test reports as the
    reason; on a real deployment every decode_media call site just
    passes codec=pil_decode. Corrupt/undecodable bytes raise inside
    PIL and flow through the same error-as-data ok=false path as the
    synthetic codec's empty-payload ValueError."""
    import io

    from PIL import Image  # optional dependency, absent in this container

    if not payload:
        raise ValueError("empty payload")
    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def decode_media(media: DataFrame, codec=synthetic_decode) -> DataFrame:
    """Decode stage: payload → dimensions + integrity hash, streamed via
    mapInPandas (Arrow batches; payloads never collect to the driver).

    `codec` is the injectable decode kernel — (payload bytes) ->
    (width, height), raising on undecodable input. The default is the
    deterministic synthetic codec (full SQL oracle); `pil_decode` is
    the real-image swap. Injection changes NOTHING Spark-side: same
    output schema, same single MapInPandas over the same pruned
    (media_id, modality, payload) projection — pinned by
    tests/test_multimodal.py::test_codec_swap_preserves_plan_and_schema."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload
                try:
                    w, h = codec(payload)
                    out.append(
                        (row.media_id, row.modality, w, h, len(payload),
                         hashlib.sha256(payload).hexdigest(), True, None)
                    )
                except Exception as e:  # corrupt/undecodable media is data, not a crash
                    out.append(
                        (row.media_id, row.modality, None, None,
                         len(payload) if payload else 0, None, False, str(e))
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "modality", "width", "height",
                         "n_bytes", "sha256", "ok", "error"],
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature stage: payload → fixed-dim vector with the exact
    contract features[i] = sha256(payload)[i] / 255.0 (empty payload →
    sha256 of b''), oracle-checkable per component; a real deployment
    runs the vision/audio encoder here, batched over the same
    iterator."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                digest = hashlib.sha256(row.payload or b"").digest()
                vec = [digest[i] / 255.0 for i in range(dim)]
                rows.append((row.media_id, vec, dim))
            yield pd.DataFrame(rows, columns=["media_id", "features", "feature_dim"])

    return media.select("media_id", "payload").mapInPandas(batches, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    timestamp (STUB frame id: sha256(payload + b":frame:" + ascii(ms)) —
    an ASCII suffix so a SQL engine can recompute the exact digest over
    the same byte sequence; a real deployment seeks the container with
    pyav/ffmpeg and hashes the decoded frame)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                duration = int(row.duration_ms or 0)
                for i, ms in enumerate(range(0, duration, every_ms)):
                    fid = hashlib.sha256(
                        (row.payload or b"") + f":frame:{ms}".encode()
                    ).hexdigest()
                    rows.append((row.media_id, i, ms, fid))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_ms", "frame_sha256"]
            )

    video = media.filter(F.col("modality") == "video")
    return video.select("media_id", "payload", "duration_ms").mapInPandas(
        batches, schema=FRAMES_SCHEMA
    )


def resize_media(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    codec=synthetic_decode,
) -> DataFrame:
    """Resize stage: aspect-preserving fit of the synthetic-decoded
    (width, height) into (target_w, target_h), ALL-INTEGER math so both
    engines agree bit-for-bit:

        width-limited  (w*th >= h*tw): out = (tw, max(1, h*tw // w))
        height-limited (otherwise)   : out = (max(1, w*th // h), th)

    The resized payload is STUBBED as its integrity hash —
    sha256(payload + b":resize:{tw}x{th}" in ASCII, so a SQL engine can
    recompute the exact digest) — a real deployment runs
    PIL.Image.resize inside the same iterator and hashes the real
    output. Undecodable (empty) payloads pass through as ok=false-style
    NULL dims with a NULL hash."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                payload = row.payload or b""
                if len(payload) == 0:
                    rows.append((row.media_id, None, None, None))
                    continue
                w, h = codec(payload)
                if w * target_h >= h * target_w:
                    ow, oh = target_w, max(1, h * target_w // w)
                else:
                    ow, oh = max(1, w * target_h // h), target_h
                digest = hashlib.sha256(
                    payload + f":resize:{target_w}x{target_h}".encode()
                ).hexdigest()
                rows.append((row.media_id, ow, oh, digest))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "out_width", "out_height", "resized_sha256"],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )
