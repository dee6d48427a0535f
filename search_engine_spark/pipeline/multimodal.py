"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; decode/feature-extraction runs in Arrow-batched
``mapInPandas`` kernels.

Decoding is REAL for every format the Python stdlib + numpy can express:

* images — netpbm P2/P3 (ASCII) and P5/P6 (binary) PGM/PPM, and
  uncompressed BMP (BITMAPINFOHEADER, 24-bit BGR and 8-bit palette),
  all parsed with pure numpy (:func:`decode_image`);
* audio — PCM WAV via the stdlib ``wave`` module (:func:`decode_audio`).

Formats that require an external codec library (JPEG, PNG, MP3, …)
raise ``NotImplementedError`` from the same entry points — the container
ships no imaging libs, and that boundary is documented and tested.
:func:`extract_media_features` sniffs each payload: decodable media get
real decoded-pixel/sample statistics; opaque bytes fall back to the
deterministic sha256 stub (:func:`_fake_features`), which remains the
oracle-checkable path used by the contract entries.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id long, n_bytes int, header string, features array<double>"
)


def to_blob_table(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct(mime, n_bytes)).

    Stand-in payloads (utf-8 bytes of text) with the exact schema a real
    image/audio table would use.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


# ------------------------------------------------------------------ codecs


def _netpbm_tokens(buf: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII ints, honoring ``#`` comments.

    Returns (values, index one past the last consumed byte)."""
    vals: list[int] = []
    i = start
    cur = -1
    while i < len(buf) and len(vals) < n:
        c = buf[i]
        if c == 0x23:  # '#' comment runs to end of line
            if cur >= 0:
                vals.append(cur)
                cur = -1
            while i < len(buf) and buf[i] not in (0x0A, 0x0D):
                i += 1
        elif 0x30 <= c <= 0x39:
            cur = (cur if cur > 0 else 0) * 10 + (c - 0x30)
        elif c in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
            if cur >= 0:
                vals.append(cur)
                cur = -1
        else:
            raise ValueError(f"netpbm: unexpected byte {c:#x} in header")
        i += 1
    if cur >= 0 and len(vals) < n:
        vals.append(cur)
    if len(vals) < n:
        raise ValueError("netpbm: truncated header")
    return vals, i


def _decode_netpbm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    channels = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), i = _netpbm_tokens(payload, 3, 2)
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"netpbm: bad maxval {maxval}")
    n = w * h * channels
    if magic in (b"P5", b"P6"):
        # binary: exactly ONE whitespace byte after maxval, then samples
        if maxval < 256:
            data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
        else:
            data = np.frombuffer(payload, dtype=">u2", count=n, offset=i).astype(
                np.uint16
            )
    else:
        vals, _ = _netpbm_tokens(payload, n, i)
        data = np.asarray(vals, dtype=np.uint16 if maxval >= 256 else np.uint8)
    img = data.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def _decode_bmp(payload: bytes) -> np.ndarray:
    if len(payload) < 54:
        raise ValueError("bmp: truncated file header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("bmp: only BITMAPINFOHEADER (>=40) supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"bmp: compression {compression} unsupported")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4-byte multiples
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    elif bpp == 8:
        ncolors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=ncolors * 4, offset=14 + hdr_size
        ).reshape(ncolors, 4)[:, [2, 1, 0]]  # BGRX entries → RGB
        idx = rows[:, :w]
        if idx.size and int(idx.max()) >= ncolors:
            raise ValueError(
                f"bmp: pixel index {int(idx.max())} >= palette size {ncolors}"
            )
        px = pal[idx]
    else:
        raise NotImplementedError(f"bmp: {bpp}-bit pixels unsupported")
    return np.ascontiguousarray(px if top_down else px[::-1])


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to a numpy array — pure stdlib + numpy.

    Supported (no external codec needed): netpbm P2/P3/P5/P6
    (grayscale → ``(h, w)``, color → ``(h, w, 3)``; 16-bit maxval →
    uint16 big-endian samples) and uncompressed BMP (24-bit BGR,
    8-bit palette → ``(h, w, 3)`` RGB, bottom-up or top-down).

    JPEG / PNG / GIF / WebP need an external library this container
    does not ship — those raise ``NotImplementedError``, and callers
    (``extract_media_features``) fall back to the opaque-bytes path.
    """
    head = bytes(payload[:2])
    if head in (b"P2", b"P3", b"P5", b"P6"):
        return _decode_netpbm(bytes(payload))
    if head == b"BM":
        return _decode_bmp(bytes(payload))
    raise NotImplementedError(
        "image format not decodable with stdlib+numpy (JPEG/PNG/GIF need an "
        "imaging library absent from this environment); supported: netpbm "
        "P2/P3/P5/P6, uncompressed BMP"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload → (samples ``(n, channels)`` int, rate).

    Stdlib ``wave`` handles the RIFF framing; 8-bit (unsigned),
    16-bit and 32-bit little-endian PCM are mapped to numpy dtypes.
    Compressed codecs raise ``NotImplementedError``."""
    try:
        with wave.open(io.BytesIO(bytes(payload))) as wf:
            width = wf.getsampwidth()
            nch = wf.getnchannels()
            rate = wf.getframerate()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        # the stdlib chunk parser raises bare EOFError on payloads shorter
        # than a RIFF header — same "not a WAV" meaning as wave.Error
        raise NotImplementedError(f"audio: not a PCM WAV stream ({exc})") from exc
    dtype = {1: np.uint8, 2: "<i2", 4: "<i4"}.get(width)
    if dtype is None:
        raise NotImplementedError(f"audio: {width * 8}-bit samples unsupported")
    if nch <= 0 or len(frames) % (width * nch):
        raise NotImplementedError("audio: truncated PCM data")
    samples = np.frombuffer(frames, dtype=dtype)
    return samples.reshape(-1, nch), rate


def encode_netpbm(img: np.ndarray) -> bytes:
    """Encode ``(h, w)`` or ``(h, w, 3)`` uint8/uint16 → binary P5/P6.

    The synthesis half of the round-trip tests and the deterministic
    media-corpus generator — no imaging library involved."""
    arr = np.asarray(img)
    color = arr.ndim == 3
    maxval = 65535 if arr.dtype == np.uint16 else 255
    header = f"{'P6' if color else 'P5'}\n{arr.shape[1]} {arr.shape[0]}\n{maxval}\n"
    body = arr.astype(">u2" if maxval == 65535 else np.uint8).tobytes()
    return header.encode("ascii") + body


def encode_bmp24(img: np.ndarray) -> bytes:
    """Encode ``(h, w, 3)`` uint8 RGB → uncompressed 24-bit BMP."""
    arr = np.asarray(img, dtype=np.uint8)
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode ``(n,)`` or ``(n, channels)`` int16 → PCM WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    nch = 1 if arr.ndim == 1 else arr.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(arr.tobytes())
    return buf.getvalue()


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector.

    8 little-endian uint32 words of sha256(payload) scaled to [0, 1) —
    exactly reproducible in SQL from the hex digest, so the whole kernel
    is oracle-checkable (uint32 / 2^32 is exact in float64).
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    return raw / np.float64(2**32)


def _extract_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array([len(p) for p in payloads], dtype="int32"),
                "header": [bytes(p[:4]).hex() for p in payloads],
                "features": [_fake_features(bytes(p)) for p in payloads],
            }
        )


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    (doc_id, n_bytes, header hex, features array<float>[8]).  The kernel
    shape (mapInPandas over payload batches) is exactly what a real
    decode/resize/embed stage uses; only ``_fake_features`` changes.
    """
    return blobs.select("doc_id", "payload").mapInPandas(
        _extract_kernel, schema=FEATURES_SCHEMA
    )


MEDIA_SCHEMA = "doc_id long, kind string, n_bytes int, features array<double>"


_DECODE_ERRORS = (
    NotImplementedError,  # format needs a library this container lacks
    ValueError,           # corrupt header / truncated body / bad palette
    EOFError,             # stdlib chunk parser on sub-header payloads
    IndexError,           # malformed offsets
    struct.error,         # short fixed-width header reads
)


def media_features(payload: bytes) -> tuple[str, np.ndarray]:
    """(kind, 8-dim feature vector) for one payload — REAL decode first.

    * decodable image → ("image", [h, w, channels, mean, std, min, max,
      capacity]) over the decoded pixel array (capacity = the decoded
      dtype's sample ceiling, 255 or 65535 — netpbm's declared maxval is
      normalized away by the decoder);
    * PCM WAV → ("audio", [frames, channels, rate, mean, std, min, max,
      seconds]) over the decoded samples;
    * anything else — unknown format OR a corrupt/truncated payload in a
      known format — → ("opaque", sha256 stub features), so one bad blob
      can never fail a whole Spark task (pinned by malformed-payload
      tests).
    """
    try:
        img = decode_image(payload)
        px = img.astype(np.float64)
        capacity = 65535.0 if img.dtype == np.uint16 else 255.0
        ch = 1 if img.ndim == 2 else img.shape[2]
        return "image", np.array(
            [img.shape[0], img.shape[1], ch,
             px.mean(), px.std(), px.min(), px.max(), capacity]
        )
    except _DECODE_ERRORS:
        pass
    try:
        samples, rate = decode_audio(payload)
        s = samples.astype(np.float64)
        return "audio", np.array(
            [samples.shape[0], samples.shape[1], rate,
             s.mean(), s.std(), s.min(), s.max(), samples.shape[0] / rate]
        )
    except _DECODE_ERRORS:
        pass
    return "opaque", _fake_features(bytes(payload))


def _media_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        kinds, feats = [], []
        for p in pdf["payload"]:
            kind, vec = media_features(bytes(p))
            kinds.append(kind)
            feats.append(vec)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": kinds,
                "n_bytes": pd.array([len(p) for p in pdf["payload"]], dtype="int32"),
                "features": feats,
            }
        )


def extract_media_features(blobs: DataFrame) -> DataFrame:
    """Sniff-and-decode feature extraction over mixed binary payloads.

    Same Arrow-batched ``mapInPandas`` shape as :func:`extract_features`,
    but the decode step is real for netpbm/BMP images and WAV audio
    (see :func:`decode_image` / :func:`decode_audio`); payloads in
    library-requiring formats (JPEG/PNG/…) flow through the opaque
    sha256 path instead of failing the batch."""
    return blobs.select("doc_id", "payload").mapInPandas(
        _media_kernel, schema=MEDIA_SCHEMA
    )


def synthetic_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic mixed-media corpus keyed on ``doc_id`` — REAL bytes.

    ``doc_id % 3`` picks the modality; every parameter is an analytic
    function of ``doc_id`` so decoded statistics are exactly computable
    in SQL (the `media_decode_stats` oracle):

    * 0 → binary PGM of shape ``(2 + (doc_id // 3) % 3, 4)`` (heights 2,
      3 and 4 all occur — image docs have ``doc_id % 3 == 0``, so the
      height term must not reuse ``doc_id % 3``) whose flat pixel ``i``
      is ``(doc_id + i) % 256`` — a GRADIENT, so the oracle match
      certifies per-pixel decode, sample order, and dimensions;
    * 1 → mono 16-bit PCM WAV @8 kHz, ``8 + doc_id % 5`` samples all
      equal to ``doc_id % 100 - 50``;
    * 2 → opaque utf-8 text bytes (sha256-stub feature path).
    """

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                m = int(doc_id) % 3
                if m == 0:
                    h = 2 + (int(doc_id) // 3) % 3
                    flat = (int(doc_id) + np.arange(h * 4)) % 256
                    payloads.append(
                        encode_netpbm(flat.astype(np.uint8).reshape(h, 4))
                    )
                elif m == 1:
                    n = 8 + int(doc_id) % 5
                    c = int(doc_id) % 100 - 50
                    payloads.append(
                        encode_wav(np.full(n, c, dtype=np.int16), rate=8000)
                    )
                else:
                    payloads.append(str(text).encode("utf-8"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        kern, schema="doc_id long, payload binary"
    )


def feature_rows(blobs: DataFrame, ndigits: int = 6) -> DataFrame:
    """Exploded, hashable projection of :func:`extract_features`.

    (doc_id, n_bytes, header, dim, value) — one row per feature
    dimension, value rounded; sortable/hashable for exact comparison
    against the SQL twin (the array form is unhashable downstream).
    """
    from ..functions import rnd

    feats = extract_features(blobs)
    return feats.select(
        "doc_id",
        "n_bytes",
        "header",
        F.posexplode("features").alias("dim", "value"),
    ).select(
        "doc_id", "n_bytes", "header", F.col("dim").cast("int").alias("dim"),
        rnd(F.col("value"), ndigits).alias("value"),
    )


def frame_sample_plan(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode per-payload frame indices.

    Frame count is faked as n_bytes // 64 (a real decoder reports it);
    the explode/partitioning shape is the real thing.
    """
    n_frames = F.floor(F.octet_length("payload") / F.lit(64)).cast("int")
    return (
        blobs.select("doc_id", n_frames.alias("n_frames"))
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )
