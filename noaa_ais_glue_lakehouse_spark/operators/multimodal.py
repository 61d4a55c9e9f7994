"""Multimodal column operators: opaque binary payloads + typed metadata.

Conventions (the brief's training-data-pipeline surface):

- a multimodal asset is a row with an opaque ``binary`` column plus
  typed metadata columns the pipeline derives (byte size, fingerprint,
  sniffed format);
- decode / feature-extract steps run as Arrow-batched ``mapInPandas``
  over the binary column — the Spark-side plumbing (schema, batch
  iteration, partition preservation) is real; the pixel/sample decode
  itself needs an image/audio library that is NOT in this environment,
  so ``decode_images`` uses the real decoder only when available and
  otherwise a clearly-marked deterministic stub with the same schema.

Scale notes: binary payloads ride in the row — never ``collect()`` them;
metadata extraction is a narrow map (no shuffle); fingerprint dedup
reuses the exact-dedup shuffle shape (hash groupBy on the digest).
``mapInPandas`` transfers batches via Arrow, so the per-row Python cost
is amortized across ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes → format tag (public file signatures)
_MAGIC = [
    ("ffd8ff", "jpeg"),
    ("89504e47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("664c6143", "flac"),
    ("000000", "mp4_maybe"),  # ftyp boxes start with a 00-size prefix
]


def binary_metadata(
    df: DataFrame, binary_col: str, out_prefix: str = "asset_"
) -> DataFrame:
    """Attach byte size, md5 fingerprint, and sniffed format columns.

    Pure column expressions (``length``/``md5``/``hex`` are JVM-side on
    binary), so metadata extraction never leaves codegen.
    """
    b = F.col(binary_col)
    prefix_hex = F.lower(F.hex(F.substring(b, 1, 4)))
    fmt = F.lit("unknown")
    for magic, tag in reversed(_MAGIC):
        fmt = F.when(prefix_hex.startswith(magic), F.lit(tag)).otherwise(fmt)
    return (
        df.withColumn(f"{out_prefix}bytes", F.length(b).cast("long"))
        .withColumn(f"{out_prefix}fingerprint", F.md5(b))
        .withColumn(f"{out_prefix}format", fmt)
    )


def dedup_binary_exact(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Exact binary dedup keeping the min-id row per digest — single
    min_by shuffle (payload rows are the heaviest in the system; the
    groupBy + join-back form would shuffle them twice)."""
    keyed = df.withColumn("_fp", F.md5(F.col(binary_col)))
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        keyed.groupBy("_fp")
        .agg(F.min_by(row, F.col(id_col)).alias("_row"))
        .select("_row.*")
    )


IMAGE_META_SCHEMA = (
    "id long, width int, height int, channels int, decode_ok boolean"
)


def decode_images(
    df: DataFrame, id_col: str, binary_col: str, use_stub: bool | None = None
) -> DataFrame:
    """Decode image dimensions via Arrow-batched ``mapInPandas``.

    With a real imaging library present (PIL), decodes actual headers.
    In this environment PIL is absent, so the deterministic STUB derives
    pseudo-dimensions from the payload length:

        width  = 1 + (byte_len * 7) % 640
        height = 1 + (byte_len * 13) % 480
        channels = 1 + (byte_len * 31) % 4

    (length-only on purpose: a first-byte rule would make the SQL oracle
    depend on codepoint-vs-UTF-8-byte encoding details). The stub is pure
    and engine-portable, so the mapInPandas plumbing — schema contract,
    batch shape, null payloads — is fully exercised even without the
    library.
    """
    if use_stub is None:
        try:
            import PIL.Image  # noqa: F401

            use_stub = False
        except ImportError:
            use_stub = True

    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("_b"))

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, ws, hs, cs, ok = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["_b"]):
                ids.append(i)
                if payload is None or len(payload) == 0:
                    ws.append(None); hs.append(None); cs.append(None); ok.append(False)
                elif use_stub:
                    n = len(payload)
                    ws.append(1 + (n * 7) % 640)
                    hs.append(1 + (n * 13) % 480)
                    cs.append(1 + (n * 31) % 4)
                    ok.append(True)
                else:
                    import io

                    import PIL.Image

                    try:
                        img = PIL.Image.open(io.BytesIO(payload))
                        ws.append(img.width); hs.append(img.height)
                        cs.append(len(img.getbands())); ok.append(True)
                    except Exception:
                        ws.append(None); hs.append(None); cs.append(None); ok.append(False)
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "channels": cs, "decode_ok": ok}
            )

    return src.mapInPandas(_decode, schema=IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    n_frames_col: str,
    every_n: int,
    frame_col: str = "frame_idx",
) -> DataFrame:
    """Frame-sampling plan for video-like assets: one output row per kept
    frame index (0, every_n, 2*every_n, … < n_frames).

    The *selection* is pure Spark (``sequence`` + ``explode`` — no
    Python); actual frame extraction would chain a ``mapInPandas`` decode
    like :func:`decode_images`. This mirrors trajectory thinning (T6):
    quantized keep-rules first, expensive per-item work after.
    """
    n = F.col(n_frames_col).cast("long")
    idx = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(n - 1, F.lit(0).cast("long")),
        F.lit(every_n).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.explode(F.when(n > 0, idx).otherwise(F.array().cast("array<long>"))).alias(
            frame_col
        ),
    )


def decode_images_arrow(
    df: DataFrame, id_col: str, binary_col: str
) -> DataFrame:
    """The :func:`decode_images` stub path as ``mapInArrow`` — Arrow
    RecordBatches in, Arrow RecordBatches out, no pandas materialization
    on either side. For binary-heavy columns this skips the
    Arrow→pandas→Arrow copy that mapInPandas pays per batch (pandas
    boxes each payload as a Python bytes object; here the metadata
    derives from the Arrow buffer offsets alone, so the payload bytes
    are never touched, let alone copied). Output is bit-identical to
    ``decode_images(use_stub=True)`` (pinned by test + shared oracle).
    """
    import pyarrow as pa

    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("_b"))

    def _decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            # byte length straight from the Arrow value buffer — NULL
            # propagates, payload bytes never copied into Python
            n = pc.binary_length(payloads).cast(pa.int64())
            # and_kleene: false & null = false (plain and_ would propagate
            # the null from greater(NULL, 0) into decode_ok)
            nonempty = pc.and_kleene(pc.is_valid(payloads), pc.greater(n, 0))
            # stub dimensions (same arithmetic as decode_images' stub).
            # pyarrow.compute has no mod kernel: x % d = x - (x // d) * d
            # (integer divide on int64 truncates; all operands non-negative)
            def _dim(mult: int, mod: int, bits=pa.int32()):
                x = pc.multiply(n, mult)
                m = pc.subtract(x, pc.multiply(pc.divide(x, mod), mod))
                v = pc.add(m, 1).cast(bits)
                return pc.if_else(nonempty, v, pa.scalar(None, bits))

            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    _dim(7, 640),
                    _dim(13, 480),
                    _dim(31, 4),
                    nonempty,
                ],
                names=["id", "width", "height", "channels", "decode_ok"],
            )

    return src.mapInArrow(_decode, schema=IMAGE_META_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "id long, frame_idx int, n_samples int, rms double, zcr double"
)


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    frame_samples: int = 256,
) -> DataFrame:
    """Per-frame audio features from raw PCM16 payloads via Arrow-batched
    ``mapInPandas`` — NOT a stub: 16-bit little-endian PCM needs no codec,
    so the numpy math here is the real feature extractor (the same
    function handles a decoded-by-upstream waveform column at scale).

    Per non-overlapping frame of ``frame_samples`` samples (the trailing
    partial frame is kept with its own n_samples):

      rms = sqrt(mean((x/32768)^2))       — loudness / silence detection
      zcr = sign changes / (n_samples-1)  — crude voiced/unvoiced signal

    Payloads of odd byte length are truncated to the last whole sample;
    empty/NULL payloads emit zero rows (no fabricated silence). One
    output row per frame: explode happens inside the Arrow batch, never
    on the driver, and payload bytes never leave the executors.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("_b"))

    def _features(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, fidx, ns, rms, zcr = [], [], [], [], []
            for i, payload in zip(pdf["id"], pdf["_b"]):
                if payload is None or len(payload) < 2:
                    continue
                x = (
                    np.frombuffer(
                        payload[: len(payload) - (len(payload) % 2)],
                        dtype="<i2",
                    ).astype(np.float64)
                    / 32768.0
                )
                for f in range(0, len(x), frame_samples):
                    fr = x[f : f + frame_samples]
                    ids.append(i)
                    fidx.append(f // frame_samples)
                    ns.append(len(fr))
                    rms.append(float(np.sqrt(np.mean(fr * fr))))
                    if len(fr) > 1:
                        s = np.sign(fr)
                        s[s == 0] = 1.0
                        zcr.append(
                            float(np.count_nonzero(np.diff(s)) / (len(fr) - 1))
                        )
                    else:
                        zcr.append(0.0)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": fidx,
                    "n_samples": ns,
                    "rms": rms,
                    "zcr": zcr,
                }
            )

    return src.mapInPandas(_features, schema=AUDIO_FEATURE_SCHEMA)


SPECTRAL_FEATURE_SCHEMA = (
    "id long, frame_idx int, n_samples int, centroid double, "
    "band_0 double, band_1 double, band_2 double, band_3 double"
)


def extract_spectral_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    frame_samples: int = 256,
) -> DataFrame:
    """Per-frame FREQUENCY-domain features from raw PCM16 payloads —
    real ``numpy.fft`` math inside Arrow-batched ``mapInPandas`` (like
    ``extract_audio_features``, PCM needs no codec so nothing here is a
    stub). Per non-overlapping frame:

      centroid  — spectral centroid in normalized frequency [0, 0.5]
                  (magnitude-weighted mean rfft bin / frame length)
      band_0..3 — fraction of spectral ENERGY (|X|^2) in 4 octave-split
                  half-open bins: [1, N/16), [N/16, N/8), [N/8, N/4),
                  [N/4, N/2] of the rfft bins (DC excluded; a pure tone
                  puts ~all energy in the band covering its frequency)

    Silent frames (all-zero) report centroid 0 and zero bands rather
    than NaN. The trailing partial frame is dropped (spectral features
    of a truncated window are not comparable across rows). Payload
    bytes never leave the executors; one output row per frame.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(binary_col).alias("_b"))

    def _features(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        edges = [
            1,
            max(2, frame_samples // 16),
            max(3, frame_samples // 8),
            max(4, frame_samples // 4),
            frame_samples // 2 + 1,
        ]
        for pdf in batches:
            ids, fidx, ns = [], [], []
            cent = []
            bands: list[list[float]] = [[], [], [], []]
            for i, payload in zip(pdf["id"], pdf["_b"]):
                if payload is None or len(payload) < 2 * frame_samples:
                    continue
                x = (
                    np.frombuffer(
                        payload[: len(payload) - (len(payload) % 2)],
                        dtype="<i2",
                    ).astype(np.float64)
                    / 32768.0
                )
                n_frames = len(x) // frame_samples
                for f in range(n_frames):
                    fr = x[f * frame_samples : (f + 1) * frame_samples]
                    mag = np.abs(np.fft.rfft(fr))
                    mag[0] = 0.0  # exclude DC from centroid and bands
                    power = mag * mag
                    tot_m, tot_p = float(mag.sum()), float(power.sum())
                    ids.append(i)
                    fidx.append(f)
                    ns.append(frame_samples)
                    if tot_m > 0:
                        freqs = np.arange(len(mag)) / frame_samples
                        cent.append(float((mag * freqs).sum() / tot_m))
                    else:
                        cent.append(0.0)
                    for b in range(4):
                        lo, hi = edges[b], edges[b + 1]
                        bands[b].append(
                            float(power[lo:hi].sum() / tot_p)
                            if tot_p > 0
                            else 0.0
                        )
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": fidx,
                    "n_samples": ns,
                    "centroid": cent,
                    "band_0": bands[0],
                    "band_1": bands[1],
                    "band_2": bands[2],
                    "band_3": bands[3],
                }
            )

    return src.mapInPandas(_features, schema=SPECTRAL_FEATURE_SCHEMA)
