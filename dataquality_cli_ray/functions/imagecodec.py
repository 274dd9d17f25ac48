"""Codec dispatch: fake FIMG codec always; a REAL image library (Pillow)
when importable — import-gated exactly like the Lance reader
(``sources/readers.py`` ``read_table``).

The sandbox ships no image library, so every FIMG path stays
bit-deterministic and golden-pinned; in an environment WITH Pillow the
same stages decode real JPEG/PNG payloads through ``decode_rgb`` /
``encode_rgb`` with no code change. Reference analogue: the reference
only names image formats in its file-type gate (``cmd/describe.go``);
actual decode is an extension here.
"""

from __future__ import annotations

import io

import numpy as np

from . import imagefake as IF

try:  # pragma: no cover - sandbox has no Pillow; exercised when present
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def decode_rgb(data: bytes) -> tuple[np.ndarray, str]:
    """((h, w, 3) uint8, fmt) from a FIMG blob, else — when Pillow is
    available — from a real encoded image. Raises
    ``imagefake.CorruptImageError`` on undecodable bytes."""
    if data is not None and len(data) >= 4 and data[:4] == IF.MAGIC:
        return IF.decode_image(data)
    if HAVE_PIL and data:
        try:
            with _PILImage.open(io.BytesIO(data)) as im:
                fmt = (im.format or "unknown").lower()
                arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
            return arr, fmt
        except Exception as e:  # undecodable by the real lib too
            raise IF.CorruptImageError(str(e)) from e
    # no real codec available: fall through to the fake codec's error
    return IF.decode_image(data)


def encode_rgb(arr: np.ndarray, fmt: str) -> bytes:
    """Encode (h, w, 3) uint8. FIMG formats go through the fake codec
    (deterministic); other formats require Pillow."""
    if fmt in IF.FMT_CODES:
        return IF.encode_image(arr, fmt)
    if HAVE_PIL:
        buf = io.BytesIO()
        _PILImage.fromarray(arr).save(buf, format=fmt.upper())
        return buf.getvalue()
    raise ValueError(f"format {fmt!r} needs a real image library")
