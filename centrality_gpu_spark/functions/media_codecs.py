"""Pure numpy/stdlib codecs for uncompressed public media formats.

No Spark imports — these run inside Arrow-batched ``mapInPandas`` UDFs
(operators/multimodal.py) and in driver-side tests. Coverage is the set
of formats decodable WITHOUT external media libraries:

- images: BMP (24-bit uncompressed, the BITMAPINFOHEADER layout) and
  binary PPM (``P6``) — both fully specified public formats;
- audio: WAV PCM (8/16-bit) via the stdlib ``wave`` module;
- video: YUV4MPEG2 (``.y4m``) with C420/C444 chroma — a plain-text
  header plus raw frame planes, designed for tool interchange.

Compressed formats (PNG/JPEG/MP4/FLAC...) are sniffed and rejected with
a clear NotImplementedError naming the library that would decode them —
that remains the honest boundary in this container.

Encoders for the same formats exist so synthetic test/bench data can be
generated deterministically and every decoder is round-trip tested.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# optional third-party decoders ---------------------------------------------
#
# Pillow (PNG/JPEG/GIF) and PyAV (MP4/Matroska) are NOT required: when
# importable they extend sniff/decode to the compressed formats; when
# absent those payloads keep raising the explicit NotImplementedError.
# Import probes are functions (not module-level flags) so tests can
# monkeypatch them to exercise both paths regardless of the container.


def _optional_pillow():
    """PIL.Image if Pillow is importable, else None."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        return None


def _optional_av():
    """The av module if PyAV is importable, else None."""
    try:
        import av  # type: ignore[import-not-found]

        return av
    except ImportError:
        return None


# magic-byte sniffing ------------------------------------------------------

# compressed-image formats Pillow can decode when present
_PILLOW_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
}
_PILLOW_NAMES = {"png": "PNG", "jpeg": "JPEG", "gif": "GIF"}
_COMPRESSED_MAGIC = {
    b"fLaC": "FLAC (needs soundfile)",
    b"OggS": "Ogg (needs soundfile)",
}


def sniff_kind(payload: bytes) -> str:
    """One of 'bmp', 'ppm', 'wav', 'y4m' — plus 'png'/'jpeg'/'gif' when
    Pillow is importable and 'mp4'/'mkv' when PyAV is — or raises for
    anything else (NotImplementedError names the missing library)."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    for magic, kind in _PILLOW_MAGIC.items():
        if payload[: len(magic)] == magic:
            if _optional_pillow() is not None:
                return kind
            raise NotImplementedError(
                f"compressed format {_PILLOW_NAMES[kind]} (needs Pillow) "
                "is not decodable in this container; supported here: "
                "BMP, PPM, WAV-PCM, Y4M"
            )
    is_mp4 = len(payload) > 4 and payload[4:8] == b"ftyp"
    is_mkv = payload[:4] == b"\x1a\x45\xdf\xa3"
    if is_mp4 or is_mkv:
        if _optional_av() is not None:
            return "mp4" if is_mp4 else "mkv"
        raise NotImplementedError(
            ("MP4/MOV" if is_mp4 else "Matroska/WebM")
            + " (needs PyAV) is not decodable in this container; "
            "supported here: BMP, PPM, WAV-PCM, Y4M"
        )
    for magic, what in _COMPRESSED_MAGIC.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"compressed format {what} is not decodable in this "
                "container; supported here: BMP, PPM, WAV-PCM, Y4M"
            )
    raise ValueError(
        "unrecognized media payload (no known magic bytes); supported "
        "formats: BMP, PPM (P6), WAV-PCM, YUV4MPEG2"
    )


# images -------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB from a BMP or binary-PPM payload — plus
    PNG/JPEG/GIF when Pillow is importable (optional dependency)."""
    kind = sniff_kind(payload)
    if kind == "bmp":
        return _decode_bmp(payload)
    if kind == "ppm":
        return _decode_ppm(payload)
    if kind in _PILLOW_NAMES:
        return _decode_pillow(payload)
    raise ValueError(f"payload is {kind}, not an image")


def _decode_pillow(payload: bytes) -> np.ndarray:
    """Compressed-image decode via the optional Pillow dependency.
    Only reachable when sniff_kind returned a Pillow kind, i.e. the
    import probe already succeeded."""
    image_mod = _optional_pillow()
    with image_mod.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _decode_bmp(payload: bytes) -> np.ndarray:
    # BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes)
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", payload, 14)[:3]
    h_raw = struct.unpack_from("<i", payload, 22)[0]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed bottom-up BMP from (H, W, 3) uint8 RGB."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    data = body.tobytes()
    file_size = 54 + len(data)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", file_size, 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


def _decode_ppm(payload: bytes) -> np.ndarray:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
    # (comment lines starting with '#' allowed between tokens)
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index gather (pure numpy)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[ys][:, xs]


# audio --------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """((n_samples, n_channels) int16, sample_rate) from PCM WAV."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise NotImplementedError(f"{width * 8}-bit PCM not supported")
    return arr.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 WAV from (n_samples,) or (n_samples, n_channels) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# video (YUV4MPEG2) --------------------------------------------------------


def decode_y4m(payload: bytes, frame_indices=None):
    """Yield (frame_idx, (H, W) uint8 luma) from a .y4m payload.

    ``frame_indices``: optional sorted iterable restricting which frames
    are decoded — later frames are skipped by offset arithmetic, not
    decoded (the frame-sampling fast path).
    """
    nl = payload.index(b"\x0a")
    header = payload[:nl].decode("ascii").split(" ")
    w = h = None
    chroma = "420"
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            chroma = tok[1:]
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if chroma.startswith("420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif chroma == "444":
        frame_bytes = 3 * w * h
    else:
        raise NotImplementedError(f"y4m chroma C{chroma} not supported")
    wanted = None if frame_indices is None else set(int(i) for i in frame_indices)
    pos = nl + 1
    idx = 0
    while pos < len(payload):
        fnl = payload.index(b"\x0a", pos)  # "FRAME..." line
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed y4m frame marker")
        data_start = fnl + 1
        if wanted is None or idx in wanted:
            luma = np.frombuffer(
                payload, dtype=np.uint8, count=w * h, offset=data_start
            ).reshape(h, w)
            yield idx, luma.copy()
        pos = data_start + frame_bytes
        idx += 1


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """C420 .y4m from (n_frames, H, W) uint8 luma (chroma = flat 128)."""
    n, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420jpeg\x0a" % (w, h, fps)]
    chroma = np.full((h // 2) * (w // 2) * 2, 128, dtype=np.uint8).tobytes()
    for i in range(n):
        out.append(b"FRAME\x0a")
        out.append(frames[i].tobytes())
        out.append(chroma)
    return b"".join(out)


def decode_video_frame(payload: bytes, position: float = 0.5) -> np.ndarray:
    """(H, W, 3) uint8 RGB frame at relative ``position`` from an
    MP4/Matroska payload via the optional PyAV dependency — the decode
    path ``sniff_kind``'s 'mp4'/'mkv' answers promise. Only reachable
    when the PyAV probe succeeds (sniff raises NotImplementedError
    otherwise), but re-checks so direct callers get the same contract.

    Frame targeting uses the stream's frame-count metadata when the
    container carries it and falls back to the first frame otherwise
    (sequential decode, no seek — payloads here are single cells of a
    media column, not hour-long files)."""
    av_mod = _optional_av()
    if av_mod is None:
        raise NotImplementedError(
            "MP4/Matroska decode needs PyAV, which is not importable "
            "in this container"
        )
    import io

    with av_mod.open(io.BytesIO(payload)) as container:
        if not len(container.streams.video):
            # e.g. audio-only m4a: the 'ftyp' magic sniffs as mp4 but
            # carries no video — keep the module's error taxonomy
            # (ValueError for undecodable-as-requested payloads)
            raise ValueError(
                "MP4/Matroska payload contains no video stream"
            )
        stream = container.streams.video[0]
        n = int(getattr(stream, "frames", 0) or 0)
        target = min(int(n * position), n - 1) if n else 0
        last = None
        for idx, frame in enumerate(container.decode(stream)):
            last = frame
            if idx >= target:
                break
        if last is None:
            raise ValueError("video payload contains no decodable frames")
        return last.to_ndarray(format="rgb24")


def count_y4m_frames(payload: bytes) -> int:
    """Frame count by offset arithmetic (no plane decode)."""
    nl = payload.index(b"\x0a")
    header = payload[:nl].decode("ascii").split(" ")
    w = h = None
    chroma = "420"
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            chroma = tok[1:]
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2)) if chroma.startswith("420") else 3 * w * h
    pos, count = nl + 1, 0
    while pos < len(payload):
        pos = payload.index(b"\x0a", pos) + 1 + frame_bytes
        count += 1
    return count


# feature extraction -------------------------------------------------------


def image_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """float32[dim]: luma mean-pooled onto a fixed grid, scaled to [0,1].

    A deterministic, library-free stand-in for a CNN embedding with the
    same contract (fixed width, cosine-comparable) — plugs straight into
    the ANN/near-dup operators.
    """
    luma = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], dtype=np.float32) \
        if img.ndim == 3 else img.astype(np.float32)
    gh, gw = 4, dim // 4
    cells = resize_nearest(luma, gw * 8, gh * 8).reshape(gh, 8, gw, 8)
    return (cells.mean(axis=(1, 3)) / 255.0).astype(np.float32).ravel()


def audio_features(samples: np.ndarray, dim: int = 32) -> np.ndarray:
    """float32[dim]: mean |amplitude| over ``dim`` equal time bins."""
    mono = samples.astype(np.float32).mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, n, dim + 1).astype(np.int64)
    out = np.zeros(dim, dtype=np.float32)
    absx = np.abs(mono) / 32768.0
    for i in range(dim):
        if edges[i + 1] > edges[i]:
            out[i] = absx[edges[i] : edges[i + 1]].mean()
    return out
