"""Multimodal column processing: image/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

Decode is PLUGGABLE (``register_image_decoder``): kernels sniff the
payload's magic bytes and dispatch to a registered decoder. Decoders
that need no external library are REAL here — PPM (P6) / PGM (P5)
decode + nearest-neighbor resize + re-encode run on numpy alone, and
the synthetic video container (concatenated PPM frames) gets real
frame extraction. Formats whose codecs are absent from this container
(JPEG/PNG via PIL, H.264 via pyav) auto-register when their libraries
import; otherwise an unsupported payload either raises
(``strict=True``) or falls back to a deterministic fake derived from
the payload hash (``strict=False``, clearly labeled — keeps plumbing
testable without the codec).

Audio is NOT handled here — real PCM codecs live in ``functions.audio``.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_FEATURE_SCHEMA = "width int, height int, channels int, mean_intensity double, decoded boolean"
FRAME_SAMPLE_SCHEMA = "frame_idx int, frame_bytes binary"


# ---------------------------------------------------------------------------
# real netpbm codecs (numpy-only)
# ---------------------------------------------------------------------------

def _parse_pnm_header(raw: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for P5/P6."""
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":  # comment to EOL
            while i < len(raw) and raw[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j : j + 1].isspace():
            j += 1
        fields.append(int(raw[i:j]))
        i = j
    return raw[:2], fields[0], fields[1], fields[2], i + 1


def decode_ppm(raw: bytes) -> np.ndarray:
    """P6 (binary RGB) → HxWx3 uint8."""
    magic, w, h, maxval, off = _parse_pnm_header(raw)
    assert magic == b"P6" and maxval == 255
    return np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)


def decode_pgm(raw: bytes) -> np.ndarray:
    """P5 (binary grayscale) → HxWx1 uint8."""
    magic, w, h, maxval, off = _parse_pnm_header(raw)
    assert magic == b"P5" and maxval == 255
    return np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=off).reshape(h, w, 1)


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 (or HxWx1 → P5) uint8 → netpbm bytes."""
    h, w, c = arr.shape
    if c == 1:
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def nn_resize(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize (numpy indexing; no external deps)."""
    tw, th = size
    h, w, _c = img.shape
    yi = (np.arange(th) * (h / th)).astype(np.int64).clip(0, h - 1)
    xi = (np.arange(tw) * (w / tw)).astype(np.int64).clip(0, w - 1)
    return img[yi][:, xi]


# ---------------------------------------------------------------------------
# pluggable decoder registry (magic-byte sniffing)
# ---------------------------------------------------------------------------

_IMAGE_DECODERS: list[tuple[bytes, Callable[[bytes], np.ndarray]]] = [
    (b"P6", decode_ppm),
    (b"P5", decode_pgm),
]


def register_image_decoder(magic: bytes, fn: Callable[[bytes], np.ndarray]) -> None:
    """Plug in a decoder for payloads starting with ``magic`` →
    HxWxC uint8 array. This is the extension contract real deployments
    use for JPEG/PNG (PIL) — tested by injecting a custom codec."""
    _IMAGE_DECODERS.insert(0, (magic, fn))


def _try_register_pil() -> None:  # pragma: no cover - PIL absent in container
    try:
        import io

        from PIL import Image

        def pil_decode(raw: bytes) -> np.ndarray:
            arr = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
            return arr.reshape(arr.shape[0], arr.shape[1], -1)

        for magic in (b"\xff\xd8", b"\x89PNG"):
            register_image_decoder(magic, pil_decode)
    except ImportError:
        pass


_try_register_pil()


def decode_image(raw: bytes, decoders: list | None = None) -> np.ndarray | None:
    """Dispatch on magic bytes; None when no decoder claims the payload.
    Operators SNAPSHOT the registry into their kernel closures at build
    time (``decoders=``) — executors re-import this module fresh, so a
    driver-side ``register_image_decoder`` must travel by value with the
    pickled kernel, not by module global."""
    for magic, fn in decoders if decoders is not None else _IMAGE_DECODERS:
        if raw[: len(magic)] == magic:
            return fn(raw)
    return None


def _fake_image_meta(raw: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE for undecodable payloads (codec not in
    container): dimensions/intensity derived from the payload hash."""
    h = hashlib.sha256(raw).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 if h[2] % 4 == 0 else 3, h[3] / 255.0


# ---------------------------------------------------------------------------
# Arrow-batched operators
# ---------------------------------------------------------------------------

def image_features(df: DataFrame, bytes_col: str = "bytes", strict: bool = False) -> DataFrame:
    """Decode + feature-extract an image binary column. REAL decode for
    registered formats (netpbm built-in; PIL formats when available);
    ``decoded`` marks whether the real path ran. Unregistered payloads:
    raise when ``strict`` else deterministic fake metadata."""
    out_schema = f"{df.schema.simpleString()[7:-1]}, {IMAGE_FEATURE_SCHEMA}"
    decoders = list(_IMAGE_DECODERS)  # snapshot: ships with the closure

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                if b is None:
                    feats.append((None, None, None, None, None))
                    continue
                img = decode_image(bytes(b), decoders)
                if img is not None:
                    h, w, c = img.shape
                    feats.append((w, h, c, float(img.mean() / 255.0), True))
                elif strict:
                    raise NotImplementedError(f"no image decoder for magic {bytes(b)[:4]!r}")
                else:
                    feats.append((*_fake_image_meta(bytes(b)), False))
            fdf = pd.DataFrame(
                feats, columns=["width", "height", "channels", "mean_intensity", "decoded"], index=pdf.index
            )
            yield pd.concat([pdf, fdf], axis=1)

    return df.mapInPandas(kernel, schema=out_schema)


def resize_images(
    df: DataFrame, bytes_col: str = "bytes", size: tuple[int, int] = (224, 224), strict: bool = False
) -> DataFrame:
    """Resize an image binary column in place. REAL nearest-neighbor
    resize + re-encode for registered formats; unregistered payloads
    raise when ``strict`` else pass through a size-tagged digest (FAKE,
    keeps batch shape exercised)."""
    schema = df.schema.simpleString()[7:-1]
    w, h = size
    decoders = list(_IMAGE_DECODERS)  # snapshot: ships with the closure

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[bytes_col]:
                if b is None:
                    out.append(None)
                    continue
                img = decode_image(bytes(b), decoders)
                if img is not None:
                    out.append(encode_ppm(np.ascontiguousarray(nn_resize(img, (w, h)))))
                elif strict:
                    raise NotImplementedError(f"no image decoder for magic {bytes(b)[:4]!r}")
                else:
                    out.append(hashlib.sha256(bytes(b) + f"{w}x{h}".encode()).digest())
            pdf = pdf.copy()
            pdf[bytes_col] = out
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def iter_ppm_frames(raw: bytes):
    """REAL frame iteration over the concatenated-PPM video container
    (each frame a complete P6 image back-to-back)."""
    off = 0
    while off < len(raw) and raw[off : off + 2] == b"P6":
        _m, w, h, _mx, doff = _parse_pnm_header(raw[off:])
        end = off + doff + w * h * 3
        yield raw[off:end]
        off = end


def sample_video_frames(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "clip_id", every_n: int = 10, strict: bool = False
) -> DataFrame:
    """Explode a video binary column into sampled frames (1:N rows,
    the row-exploding mapInPandas shape). REAL extraction for the
    concatenated-PPM container; other containers (mp4 via pyav) raise
    when ``strict`` else fall back to fixed-width payload slices (FAKE)."""
    out_schema = f"{id_col} string, {FRAME_SAMPLE_SCHEMA}"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, raw in zip(pdf[id_col], pdf[bytes_col]):
                if raw is None:
                    continue
                raw = bytes(raw)
                if raw[:2] == b"P6":
                    for fi, frame in enumerate(iter_ppm_frames(raw)):
                        if fi % every_n == 0:
                            rows.append({id_col: cid, "frame_idx": fi, "frame_bytes": frame})
                elif strict:
                    raise NotImplementedError(f"no video demuxer for magic {raw[:4]!r}")
                else:
                    n_frames = max(1, len(raw) // 1024)
                    for fi in range(0, n_frames, every_n):
                        rows.append({id_col: cid, "frame_idx": fi, "frame_bytes": raw[fi * 1024 : (fi + 1) * 1024]})
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_bytes"])

    return df.mapInPandas(kernel, schema=out_schema)
