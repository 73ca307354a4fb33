"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed through Arrow-batched mapInPandas.

Decode is REAL for lib-free formats — binary PPM/PGM and PNG images
and PCM WAV audio parse with pure Python/numpy (``fake=False``; PNG
is DEFLATE + per-scanline filters, both fully covered by stdlib
``zlib`` + numpy — no native codec involved); formats that genuinely
need native codecs (JPEG, MP3, MP4) raise ``DecodeUnavailable``
(libraries absent in this container), with a deterministic fake
available for end-to-end pipeline tests.
Everything Spark-side is real and tested either way: schemas, batch
shapes, UDF signatures, partitioning.

Schema convention:
    media: (media_id string, kind string in {image,audio,video},
            payload binary, meta map<string,string>)

Operators:
* decode_features  — payload → fixed-width float feature vector
* resize_stub      — image payload → resized payload (+ updated meta)
* frame_sample     — video payload → one row per sampled frame

Swap ``_decode_real`` with a PIL/ffmpeg implementation to go live; the
deterministic fake derives features from md5(payload) so tests are
reproducible and the full pipeline (including downstream ANN over the
feature vectors) runs end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 16


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decode hook for formats that genuinely need
    native libraries (JPEG, MP3, MP4, ...) — absent here.  Lib-free
    formats (binary PPM/PGM and PNG images, PCM WAV audio) decode for
    REAL via the pure-Python parsers below."""


def _parse_pnm(payload: bytes) -> tuple[np.ndarray, int]:
    """Binary PPM (P6) / PGM (P5) → (float64 array (h, w, channels),
    maxval).  Pure Python/numpy: magic + whitespace-and-#-comment
    header tokens (width, height, maxval), then the raster — u8 for
    maxval < 256, big-endian u16 above (the Netpbm spec)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise DecodeUnavailable(
            f"image magic {magic!r} needs a native decoder "
            "(only binary PPM/PGM and PNG decode lib-free); use fake=True"
        )
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise DecodeUnavailable("truncated PNM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    pos += 1  # exactly one whitespace byte separates header and raster
    w, h, maxval = tokens
    channels = 3 if magic == b"P6" else 1
    n = w * h * channels
    if maxval < 256:
        raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    else:
        raster = np.frombuffer(payload, dtype=">u2", count=n, offset=pos)
    return raster.reshape(h, w, channels).astype(np.float64), maxval


def _emit_pnm(arr: np.ndarray, maxval: int) -> bytes:
    h, w, channels = arr.shape
    magic = b"P6" if channels == 3 else b"P5"
    header = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    return header + arr.astype(dtype).tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def _png_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Yield (type, data) for each chunk, verifying length and CRC32
    (PNG §5.3: CRC covers type + data)."""
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(payload):
            raise DecodeUnavailable("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(ctype + data):
            raise DecodeUnavailable(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise DecodeUnavailable("PNG stream ended before IEND")


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Inverse the PNG §9 per-scanline filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) → (h, stride) uint8.  None/Sub/Up vectorize
    (Sub is a per-byte-lane cumulative sum — uint8 wraparound IS the
    mod-256 the spec wants); Average and Paeth depend on the previous
    pixel AND previous row, so they run as a per-scanline byte loop —
    correctness-first, and each payload decodes inside an Arrow batch
    worker so the loop never touches the driver."""
    if len(raw) != h * (stride + 1):
        raise DecodeUnavailable("PNG inflated size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, offset=base + 1)
        if ft == 0:
            recon = line.copy()
        elif ft == 1:
            lanes = line.reshape(-1, bpp).astype(np.int64)
            recon = (
                np.cumsum(lanes, axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:
            recon = line + prior  # uint8 add wraps mod 256
        elif ft in (3, 4):
            rec = bytearray(stride)
            pri = prior.tolist()
            lin = line.tolist()
            if ft == 3:
                for x in range(stride):
                    a = rec[x - bpp] if x >= bpp else 0
                    rec[x] = (lin[x] + ((a + pri[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = rec[x - bpp] if x >= bpp else 0
                    c = pri[x - bpp] if x >= bpp else 0
                    b = pri[x]
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    rec[x] = (lin[x] + pred) & 0xFF
            recon = np.frombuffer(bytes(rec), dtype=np.uint8)
        else:
            raise DecodeUnavailable(f"PNG filter type {ft} is invalid")
        out[y] = recon
        prior = out[y]
    return out


def _parse_png(payload: bytes) -> tuple[np.ndarray, int]:
    """PNG → (float64 array (h, w, channels), maxval), pure stdlib
    zlib + numpy.  Bit depth 8/16; color types 0 gray, 2 RGB,
    3 palette (depth 8), 4 gray+alpha, 6 RGBA; non-interlaced.
    Adam7 interlace and sub-byte depths raise DecodeUnavailable —
    stated limits, not silent corruption.  Chunk CRCs are verified."""
    if payload[:8] != _PNG_MAGIC:
        raise DecodeUnavailable("not a PNG signature")
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise DecodeUnavailable("PNG missing IHDR or IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise DecodeUnavailable("unknown PNG compression/filter method")
    if interlace != 0:
        raise DecodeUnavailable("Adam7-interlaced PNG not supported")
    if ctype_n not in _PNG_CHANNELS:
        raise DecodeUnavailable(f"PNG color type {ctype_n} is invalid")
    if depth not in (8, 16) or (ctype_n == 3 and depth != 8):
        raise DecodeUnavailable(f"PNG bit depth {depth} not supported")
    channels = _PNG_CHANNELS[ctype_n]
    bpp = channels * depth // 8
    stride = w * bpp
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise DecodeUnavailable(f"PNG IDAT inflate failed: {e}") from e
    flat = _png_unfilter(raw, h, stride, bpp)
    if ctype_n == 3:
        if plte is None:
            raise DecodeUnavailable("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        arr = pal[flat.reshape(h, w)].astype(np.float64)
        return arr, 255
    if depth == 8:
        arr = flat.reshape(h, w, channels).astype(np.float64)
        return arr, 255
    arr16 = np.frombuffer(flat.tobytes(), dtype=">u2").reshape(h, w, channels)
    return arr16.astype(np.float64), 65535


def _emit_png(arr: np.ndarray, maxval: int) -> bytes:
    """(h, w, channels) + maxval → PNG bytes (filter 0 scanlines, one
    IDAT).  channels 1/2/3/4 → color types 0/4/2/6; maxval picks
    depth 8 vs 16.  Round-trips through _parse_png exactly."""
    h, w, channels = arr.shape
    ctype_n = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    depth = 8 if maxval < 256 else 16
    dtype = np.uint8 if depth == 8 else np.dtype(">u2")
    rows = arr.astype(dtype).reshape(h, -1)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_n, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _parse_image(payload: bytes) -> tuple[np.ndarray, int]:
    """Dispatch PNM vs PNG by signature → (array (h, w, channels),
    maxval).  Alpha channels (PNG color types 4/6) are dropped —
    alpha is coverage, not intensity, so it must not feed the
    grayscale feature histogram."""
    if payload[:8] == _PNG_MAGIC:
        arr, maxval = _parse_png(payload)
        if arr.shape[2] in (2, 4):
            arr = arr[:, :, :-1]
        return arr, maxval
    return _parse_pnm(payload)


def _parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float64 mono samples in [-1, 1], sample_rate) via the
    stdlib ``wave`` reader (8-bit unsigned / 16-bit / 32-bit signed)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            width = wf.getsampwidth()
            n_ch = wf.getnchannels()
            rate = wf.getframerate()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise DecodeUnavailable(f"not a PCM WAV: {e}") from e
    if width == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise DecodeUnavailable(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real feature extraction for lib-free formats.

    image (PPM/PGM/PNG): FEATURE_DIM-bin normalized grayscale-intensity
    histogram (density over [0, 1]); audio (PCM WAV): per-window RMS
    over FEATURE_DIM equal windows.  Anything else (JPEG, MP3, video
    containers) raises DecodeUnavailable — those need native codecs."""
    if kind == "image":
        arr, maxval = _parse_image(payload)
        gray = arr.mean(axis=2).ravel() / maxval
        hist, _ = np.histogram(gray, bins=FEATURE_DIM, range=(0.0, 1.0))
        return hist.astype(np.float64) / max(gray.size, 1)
    if kind == "audio":
        x, _rate = _parse_wav(payload)
        if len(x) == 0:
            return np.zeros(FEATURE_DIM)
        windows = np.array_split(x, FEATURE_DIM)
        return np.array(
            [np.sqrt((w * w).mean()) if len(w) else 0.0 for w in windows]
        )
    raise DecodeUnavailable(
        f"real decode for kind={kind!r} requires native codecs "
        "(ffmpeg) — not available in this environment; use fake=True"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake feature extractor: md5(payload) expanded to
    FEATURE_DIM floats in [-1, 1)."""
    h = hashlib.md5(payload).digest()
    seeds = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    reps = int(np.ceil(FEATURE_DIM / len(seeds)))
    return (np.tile(seeds, reps)[:FEATURE_DIM] / 128.0) - 1.0


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, kind, features array<double>) via mapInPandas —
    payload bytes never round-trip through Python rows; Arrow batches
    carry them and the loop is per-batch numpy."""
    decode = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                decode(b"" if p is None else bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id string, kind string, features array<double>"
    )


def resize_stub(
    media: DataFrame, width: int = 32, height: int = 24, fake: bool = True
) -> DataFrame:
    """Image payload → resized payload with updated meta — the 1→1
    payload-transform shape (batch in, same-length batch out, bytes
    stay in Arrow).

    ``fake=False`` is a REAL nearest-neighbor resize for binary
    PPM/PGM and PNG payloads (pure numpy index-map over the parsed
    raster, re-emitted in the same container format — PNG keeps its
    alpha channel); other images raise DecodeUnavailable (JPEG et
    al. need native codecs).  The fake
    path deterministically downsamples the raw byte stream to
    width*height bytes (repeating if short).  Non-image rows pass
    through untouched."""

    target = width * height

    def _fake_resize(payload: bytes) -> bytes:
        if not payload:
            return bytes(target)
        arr = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(target) * len(arr)) // target
        return bytes(arr[idx % len(arr)].tobytes())

    def _real_resize(payload: bytes) -> bytes:
        is_png = payload[:8] == _PNG_MAGIC
        arr, maxval = _parse_png(payload) if is_png else _parse_pnm(payload)
        h0, w0, _ = arr.shape
        ri = (np.arange(height) * h0) // height
        ci = (np.arange(width) * w0) // width
        emit = _emit_png if is_png else _emit_pnm
        return emit(arr[ri][:, ci], maxval)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads, metas = [], []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                resize = _fake_resize if fake else _real_resize
                payloads.append(
                    resize(b"" if payload is None else bytes(payload))
                )
                m = dict(meta) if meta is not None else {}
                m["w"], m["h"] = str(width), str(height)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(
        run,
        schema=(
            "media_id string, kind string, payload binary, "
            "meta map<string,string>"
        ),
    )


def frame_sample(media: DataFrame, every_n: int = 2, fake: bool = True
                 ) -> DataFrame:
    """Video → one row per sampled frame (frame payloads faked as
    sliced bytes).  Demonstrates the 1→N mapInPandas expansion shape
    (batch in, longer batch out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, frames = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                payload = bytes(payload)
                n_frames = max(len(payload) // 8, 1)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    fnos.append(fno)
                    frames.append(payload[fno * 8 : (fno + 1) * 8])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": fnos, "frame_payload": frames}
            )

    return media.mapInPandas(
        run,
        schema="media_id string, frame_no int, frame_payload binary",
    )


def synthetic_decodable_media(spark, n: int = 30, seed: int = 42
                              ) -> DataFrame:
    """Deterministic media table whose payloads are REAL lib-free
    formats — binary PPM/PGM and PNG images and PCM-16 WAV audio — so
    the ``fake=False`` decode/resize paths run end-to-end in-sandbox."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 4 == 0:  # color PPM
            w, h = 8 + i % 5, 6 + i % 4
            raster = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = _emit_pnm(raster.astype(np.float64), 255)
            rows.append((f"d{i:05d}", "image", payload,
                         {"w": str(w), "h": str(h), "fmt": "ppm"}))
        elif i % 4 == 1:  # grayscale PGM
            w, h = 10 + i % 7, 5 + i % 3
            raster = rng.randint(0, 256, size=(h, w, 1), dtype=np.uint8)
            payload = _emit_pnm(raster.astype(np.float64), 255)
            rows.append((f"d{i:05d}", "image", payload,
                         {"w": str(w), "h": str(h), "fmt": "pgm"}))
        elif i % 4 == 2:  # RGBA PNG (alpha exercises the drop rule)
            w, h = 7 + i % 6, 5 + i % 4
            raster = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)
            payload = _emit_png(raster.astype(np.float64), 255)
            rows.append((f"d{i:05d}", "image", payload,
                         {"w": str(w), "h": str(h), "fmt": "png"}))
        else:  # PCM-16 mono WAV
            samples = (
                rng.randint(-20000, 20000, size=160 + 16 * (i % 5))
            ).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(8000)
                wf.writeframes(samples.tobytes())
            rows.append((f"d{i:05d}", "audio", buf.getvalue(),
                         {"rate": "8000", "fmt": "wav"}))
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, meta map<string,string>"
    )


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demo."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=64 + (i % 5) * 16, dtype=np.uint8))
        rows.append((f"m{i:05d}", kind, payload, {"w": str(64 + i), "h": "48"}))
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, meta map<string,string>"
    )
