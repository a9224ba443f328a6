"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched stages.

This is the training-data-pipeline surface the reference doesn't have but a
100 TB corpus needs. Design rules:

* Media bytes ride in a ``content BINARY`` column; structure lives in a
  typed ``media_meta`` struct (kind/width/height/sample_rate/n_frames/
  format) so planning never inspects bytes.
* Every transform is ``mapInPandas`` over batches — one Arrow hop, no
  per-row Python, safe at TB scale; row-multiplying ops (frame sampling)
  yield multiple output rows per input inside the same batch.
* **Codecs**: two REAL, stdlib-only parsers ship in-repo — 24-bit BMP
  (struct) and RIFF/WAVE PCM-16 (the wave module) — selected by content
  magic, so resize/feature stages run on genuine pixel/sample data
  (driver-oracle-checked via the formula corpora below). Other formats:
  ``decode_image``/``decode_audio`` try PIL/ffmpeg-style libs (not in
  this container) and otherwise fall back to a DETERMINISTIC FAKE decode
  that interprets the raw bytes against the declared metadata. All
  Spark-side plumbing — schemas, batch shapes, explodes, partitioning —
  is real and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, content binary, "
    "media_meta struct<width:int, height:int, sample_rate:int, "
    "n_frames:int, format:string>"
)


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus for tests: images are
    width×height raw bytes derived from md5 streams; audio is int16 PCM;
    video is n_frames concatenated images."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        seed = hashlib.md5(f"media{i}".encode()).digest()
        blob = (seed * 64)
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 16
            content = (blob * ((w * h) // len(blob) + 1))[: w * h]
            meta = (w, h, None, None, "raw8")
        elif kind == "audio":
            sr = 8000
            content = (blob * 8)[: 2 * 2048]  # 2048 int16 samples
            meta = (None, None, sr, None, "pcm16")
        else:
            w, h, nf = 8, 8, 4 + (i % 3)
            content = (blob * ((w * h * nf) // len(blob) + 1))[: w * h * nf]
            meta = (w, h, None, nf, "rawvid8")
        rows.append((i, kind, bytearray(content), meta))
    # Few, well-filled partitions: createDataFrame defaults to
    # defaultParallelism (32 here) slices, and a 60-row corpus sliced 32
    # ways makes every downstream mapInPandas stage fork 32 Python workers
    # for ~2 rows each — pure fan-out overhead that occasionally stalls
    # multi-seconds under memory pressure. Real media tables come from
    # parquet with size-based partitioning; mirror that shape.
    slices = max(2, min(4, n // 16 or 1))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), MEDIA_SCHEMA_DDL
    )


# -- codecs -----------------------------------------------------------------
# One REAL, dependency-free codec per modality (r8): 24-bit uncompressed
# BMP for images and RIFF/WAVE PCM-16 for audio, both parsed with stdlib
# only (struct / the wave module). Content sniffing picks the path per
# row — 'BM' / 'RIFF....WAVE' magic runs the real parser on genuine
# pixel/sample data; anything else keeps the deterministic raw stub so
# the established hex-arithmetic oracles stay valid. PIL/ffmpeg formats
# beyond these remain out of scope for this container (import-gated).


def encode_bmp(img: np.ndarray) -> bytes:
    """Serialize a grayscale uint8 array as a 24-bit BI_RGB BMP
    (r = g = b = pixel): 54-byte header, bottom-up rows, each row padded
    to a 4-byte boundary — the padding is what makes BMP a real parsing
    exercise rather than a reshape."""
    import struct

    h, w = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = int(img[y, x])
            row += bytes((v, v, v))  # BGR
        row += b"\x00" * (row_bytes - len(row))
        data += row
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(data)


def decode_bmp(content: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP to grayscale uint8 (integer mean of
    BGR — exact for the r=g=b images ``encode_bmp`` writes). Handles
    bottom-up AND top-down (negative height) row order and per-row
    padding. Raises on compressed or non-24-bit files."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack_from("<I", content, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", content, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return (bgr.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """Serialize a grayscale uint8 array as an 8-bit grayscale PNG
    (stdlib zlib/struct only): IHDR + one zlib IDAT of filter-0 rows +
    IEND, each chunk CRC32-tagged."""
    import struct
    import zlib

    h, w = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    """Parse an 8-bit non-interlaced grayscale (color type 0) or
    truecolor (type 2) PNG to grayscale uint8: chunk walk, zlib inflate
    of the concatenated IDATs, then per-row UNFILTERING — None/Sub/Up/
    Average/Paeth (the part that makes PNG a real codec, not a reshape);
    RGB collapses by integer mean. Raises on other depths/types or
    interlace."""
    import struct
    import zlib

    if content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(content):
        (ln,) = struct.unpack_from(">I", content, pos)
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = meta
    if depth != 8 or ctype not in (0, 2) or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, type={ctype}, "
            f"interlace={interlace})"
        )
    bpp = 1 if ctype == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(idat)
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).astype(np.int32)
        cur = np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-scan
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = int(prev[x])  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    if ctype == 2:
        return (
            out.reshape(h, w, 3).astype(np.uint16).sum(axis=2) // 3
        ).astype(np.uint8)
    return out


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize mono int16 samples as a RIFF/WAVE PCM-16 stream via the
    stdlib ``wave`` module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


GIF_MAGIC = b"GIF89a"


def encode_gif(img: np.ndarray) -> bytes:
    """Serialize a grayscale uint8 array as a real GIF89a (stdlib only):
    logical screen descriptor, a 256-entry grayscale global color table
    (palette[v] = (v, v, v), so pixel index == gray value), one image
    descriptor, and GENUINE LZW-compressed pixel data — variable-width
    codes starting at 9 bits, LSB-first bit packing, dictionary growth
    to 12 bits with a CLEAR emitted on overflow, trailing EOI, data cut
    into <=255-byte sub-blocks. This is the whole-format exercise: the
    decoder below cannot cheat its way past the bit unpacking."""
    import struct

    h, w = img.shape
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT present, 256 entries
    palette = bytes(v for i in range(256) for v in (i, i, i))
    imgd = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    mcs = 8  # min code size for 8-bit pixels
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    # --- LZW compress + pack in one pass (GIF variant: variable-width
    # LSB-first codes; the encoder widens at next_code == 2^width + 1,
    # which pairs exactly with the decoder's next_code == 2^width rule
    # because the decoder's table lags the encoder's by one entry) ---
    out = bytearray()
    acc = nbits = 0
    width = mcs + 1

    def emit(c: int):
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for px in img.astype(np.uint8).tobytes():
        trial = buf + bytes([px])
        if trial in table:
            buf = trial
            continue
        emit(table[buf])
        if next_code < 4096:
            table[trial] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset (the decoder mirrors on the clear)
            emit(clear)
            width = mcs + 1
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = eoi + 1
        buf = bytes([px])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    blocks = b"".join(
        bytes([min(255, len(out) - i)]) + bytes(out[i: i + 255])
        for i in range(0, len(out), 255)
    )
    return (
        GIF_MAGIC + lsd + palette + imgd + bytes([mcs]) + blocks
        + b"\x00" + b"\x3b"
    )


def decode_gif(content: bytes) -> np.ndarray:
    """Parse a GIF89a/87a to grayscale uint8: walk the logical screen
    descriptor + global color table, skip extension blocks, reassemble
    the image sub-blocks, LZW-decode (variable-width LSB-first codes,
    clear/EOI, the deferred +1 growth rule, the KwKwK case), and map
    palette entries to gray via the integer mean. Interlaced or
    local-color-table images are rejected loudly (real decoders handle
    them; this one says so instead of decoding garbage)."""
    import struct

    if content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    W, H, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        pal = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        palette = (pal.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
        pos += n * 3
    while True:
        b0 = content[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
        elif b0 == 0x2C:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", content, pos + 1)
    pos += 10
    if iflags & 0x40:
        raise ValueError("interlaced GIF not supported")
    if iflags & 0x80:
        raise ValueError("local color table not supported")
    if palette is None:
        raise ValueError("GIF without a global color table")
    mcs = content[pos]
    pos += 1
    data = bytearray()
    while content[pos]:
        ln = content[pos]
        data += content[pos + 1: pos + 1 + ln]
        pos += 1 + ln
    # --- LZW decode: table indexed by code (clear/eoi slots hold
    # placeholders so dynamic entries land at eoi+1 naturally); width
    # grows at next_code == 2^width, the pair of the encoder's rule ---
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    acc = nbits = di = 0
    prev: bytes | None = None
    out = bytearray()

    def next_sym():
        nonlocal acc, nbits, di
        while nbits < width:
            if di >= len(data):
                return None
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        s = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return s

    while True:
        c = next_sym()
        if c is None or c == eoi:
            break
        if c == clear:
            table, width, prev = list(base), mcs + 1, None
            continue
        if prev is None:
            entry = table[c]
        elif c < len(table):
            entry = table[c]
        else:  # the KwKwK case: code one past the table
            entry = prev + prev[:1]
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    px = np.frombuffer(bytes(out[: w * h]), np.uint8)
    if px.size < w * h:
        raise ValueError("GIF pixel data truncated")
    return palette[px].reshape(h, w)


def decode_image(content: bytes, meta) -> np.ndarray:
    """Image decode. Real BMP ('BM' magic) and PNG (8-byte signature)
    streams take the stdlib parsers above; PIL handles other formats when
    importable; otherwise the STUB path interprets ``content`` as raw
    grayscale bytes of the declared (height, width) — deterministic,
    shape-correct, codec-free.

    Magic-sniff guard: raw stub bytes can START with a codec magic by
    chance (the 2-byte 'BM' prefix hits ~1/65k random streams), so a
    parse failure on magic-matched content falls back to the stub UNLESS
    the metadata explicitly declares the format — then the content is a
    genuinely corrupt file and the error must surface."""
    fmt = (meta.get("format") or "") if meta is not None else ""
    if content[:2] == b"BM":
        try:
            return decode_bmp(content)
        except Exception:
            if fmt == "bmp":
                raise
    if content[:8] == PNG_MAGIC:
        try:
            return decode_png(content)
        except Exception:
            if fmt == "png":
                raise
    if content[:4] == b"GIF8":
        try:
            return decode_gif(content)
        except Exception:
            if fmt == "gif":
                raise
    try:  # pragma: no cover - PIL not in container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)).convert("L"))
    except ImportError:
        w, h = meta["width"], meta["height"]
        arr = np.frombuffer(content[: w * h], dtype=np.uint8)
        if arr.size < w * h:
            arr = np.pad(arr, (0, w * h - arr.size))
        return arr.reshape(h, w)


def decode_audio(content: bytes, meta) -> np.ndarray:
    """Audio decode: a real RIFF/WAVE stream takes the stdlib ``wave``
    parser (PCM-16, channel 0 of interleaved frames); anything else is
    the raw int16-PCM little-endian stub (real path for other formats:
    soundfile/ffmpeg)."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(bytes(content)), "rb") as wv:
                nch = wv.getnchannels()
                if wv.getsampwidth() != 2:
                    raise ValueError("only PCM-16 WAV supported")
                raw = wv.readframes(wv.getnframes())
            return np.frombuffer(raw, dtype="<i2")[::nch]
        except Exception:
            # same sniff guard as decode_image: magic-matched stub bytes
            # fall back; declared-wav content surfaces the real error
            fmt = (meta.get("format") or "") if meta is not None else ""
            if fmt == "wav":
                raise
    return np.frombuffer(content[: (len(content) // 2) * 2], dtype="<i2")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (the stub-visible math; PIL's
    resampling replaces it in production)."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


# -- Spark stages -----------------------------------------------------------

RESIZED_DDL = (
    "media_id bigint, content binary, "
    "media_meta struct<width:int, height:int, sample_rate:int, "
    "n_frames:int, format:string>"
)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Image resize stage: decode → nearest-neighbor resize → raw bytes
    out, metadata updated. Non-image rows are filtered JVM-side first so
    the Python stage only sees relevant bytes (column+row pruning before
    the Arrow hop)."""
    import pandas as pd

    imgs = media.where(F.col("kind") == "image")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.media_meta
                img = decode_image(bytes(row.content), meta)
                res = resize_nearest(img, out_w, out_h)
                out.append(
                    {
                        "media_id": row.media_id,
                        "content": res.astype(np.uint8).tobytes(),
                        "media_meta": {
                            "width": out_w,
                            "height": out_h,
                            "sample_rate": None,
                            "n_frames": None,
                            "format": "raw8",
                        },
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "content", "media_meta"])

    return imgs.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=RESIZED_DDL
    )


FRAME_DDL = (
    "media_id bigint, frame_idx int, content binary, width int, height int"
)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: one output ROW per kept frame (row-multiplying
    mapInPandas — the batch shape the real ffmpeg-backed version uses)."""
    import pandas as pd

    vids = media.where(F.col("kind") == "video")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.media_meta
                w, h, nf = meta["width"], meta["height"], meta["n_frames"]
                raw = bytes(row.content)
                for fi in range(0, nf, every_n):
                    frame = raw[fi * w * h : (fi + 1) * w * h]
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": fi,
                            "content": frame,
                            "width": w,
                            "height": h,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "content", "width", "height"]
            )

    return vids.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=FRAME_DDL
    )


AUDIO_FEAT_DDL = (
    "media_id bigint, n_samples int, rms double, zero_crossings int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction (RMS, zero-crossing count) over PCM —
    real numpy math on the stub decode; an MFCC/fbank impl slots into the
    same stage."""
    import pandas as pd

    auds = media.where(F.col("kind") == "audio")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                samples = decode_audio(bytes(row.content), row.media_meta)
                x = samples.astype(np.float64)
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                out.append(
                    {
                        "media_id": row.media_id,
                        "n_samples": int(x.size),
                        "rms": round(rms, 6),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_samples", "rms", "zero_crossings"]
            )

    return auds.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=AUDIO_FEAT_DDL
    )


EMBED_DDL = "media_id bigint, embedding array<float>"


def byte_embedding(media: DataFrame, dim: int = 64) -> DataFrame:
    """Content embedding from raw bytes: hashed byte-trigram counts folded
    into ``dim`` buckets, L2-normalized. Deterministic and model-free —
    the stand-in for a CLIP/CLAP encoder with the identical column contract
    (composable with operators/similarity.py for cross-modal dedup)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                raw = np.frombuffer(bytes(row.content), dtype=np.uint8)
                vec = np.zeros(dim, dtype=np.float64)
                if raw.size >= 3:
                    tri = (
                        raw[:-2].astype(np.int64) * 65536
                        + raw[1:-1].astype(np.int64) * 256
                        + raw[2:]
                    )
                    np.add.at(vec, tri % dim, 1.0)
                n = np.linalg.norm(vec)
                if n > 0:
                    vec /= n
                out.append(
                    {"media_id": row.media_id,
                     "embedding": vec.astype(np.float32).tolist()}
                )
            yield pd.DataFrame(out, columns=["media_id", "embedding"])

    return media.select("media_id", "content").mapInPandas(run, schema=EMBED_DDL)


AHASH_DDL = "media_id bigint, ahash bigint"


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash per image (aHash): resize to 8×8, bit j
    (row-major, j = y·8+x) set iff pixel ≥ the image's mean — the
    image-dedup analogue of SimHash, robust to rescaling/re-encoding
    noise the byte fingerprint is blind to. Same mapInPandas stage shape
    as ``resize_images`` (decode stubbed, plumbing and hash math real);
    bit 63 wraps into the int64 sign bit so the signature is an ordinary
    BIGINT column both engines compare exactly.

    Mean = sum/64.0 is exact in double (sum ≤ 16320, divisor a power of
    two), so the ≥-mean bit is deterministic cross-engine.
    """
    import pandas as pd

    imgs = media.where(F.col("kind") == "image")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(bytes(row.content), row.media_meta)
                res = resize_nearest(img, 8, 8).astype(np.int64).ravel()
                mean = res.sum() / 64.0
                h = np.uint64(0)
                for j in range(64):
                    if res[j] >= mean:
                        h |= np.uint64(1) << np.uint64(j)
                out.append({"media_id": row.media_id,
                            "ahash": int(h.astype(np.int64))})
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return imgs.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=AHASH_DDL
    )


def image_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs from aHash signatures — reuses the SimHash
    16-bit banding. At the default ``max_hamming ≤ 3`` the pigeonhole
    guarantees completeness (≤3 differing bits leave ≥1 of the 4 bands
    intact, so every qualifying pair shares a band); wider thresholds
    keep the same plan but trade recall like any banded LSH. One banded
    equi self-join, never all-pairs."""
    from incubator_stormcrawler_spark.operators.dedup import (
        simhash_band_candidates,
    )

    sig = hashes.select(
        F.col("media_id").alias("doc_id"), F.col("ahash").alias("simhash")
    )
    cand = simhash_band_candidates(sig)
    hamming = F.bit_count(
        F.col("s1").bitwiseXOR(F.col("s2"))
    )
    return (
        cand.where(hamming <= max_hamming)
        .select(
            F.col("doc1").alias("media1"),
            F.col("doc2").alias("media2"),
            hamming.cast("int").alias("hamming"),
        )
    )


# -- real-codec roundtrip fixtures & stats (r8) -------------------------------
# The corpora below hold GENUINE BMP/WAV streams whose pixel/sample values
# come from a closed-form formula, so a SQL oracle can recompute the exact
# integral statistics WITHOUT parsing bytes — a green driver row then
# proves the real encode → decode → stats path end to end (format headers,
# row padding, bottom-up order, RIFF framing), not just the plumbing.

def synthesize_bmp_corpus(spark: SparkSession, n: int = 20) -> DataFrame:
    """n real 24-bit BMP images; pixel(x, y) = (7x + 13y + 31*id) % 256,
    width 5 + id%4 (hits every 4-byte row-padding case), height 4 + id%3."""
    rows = []
    for i in range(n):
        w, h = 5 + i % 4, 4 + i % 3
        ys, xs = np.mgrid[0:h, 0:w]
        img = ((7 * xs + 13 * ys + 31 * i) % 256).astype(np.uint8)
        rows.append(
            (i, "image", bytearray(encode_bmp(img)), (w, h, None, None, "bmp"))
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), MEDIA_SCHEMA_DDL
    )


def synthesize_png_corpus(spark: SparkSession, n: int = 20) -> DataFrame:
    """n real 8-bit grayscale PNGs; pixel(x, y) = (5x + 11y + 29*id) % 256,
    width 6 + id%5, height 5 + id%2 — the zlib/unfilter twin of the BMP
    corpus."""
    rows = []
    for i in range(n):
        w, h = 6 + i % 5, 5 + i % 2
        ys, xs = np.mgrid[0:h, 0:w]
        img = ((5 * xs + 11 * ys + 29 * i) % 256).astype(np.uint8)
        rows.append(
            (i, "image", bytearray(encode_png(img)), (w, h, None, None, "png"))
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), MEDIA_SCHEMA_DDL
    )


def synthesize_gif_corpus(spark: SparkSession, n: int = 20) -> DataFrame:
    """n real GIF89a images (genuine variable-width LZW streams);
    pixel(x, y) = (3x + 17y + 23*id) % 256, width 24 + id%5, height
    18 + id%4 — ≥432 px each, so EVERY image's code stream genuinely
    crosses the 9→10-bit width boundary (verified: next_code reaches
    ≥513 on all 20; the r9 corpus topped out at ~330 and never widened —
    the variable-width bit-unpacking case the codec exists to exercise)."""
    rows = []
    for i in range(n):
        w, h = 24 + i % 5, 18 + i % 4
        ys, xs = np.mgrid[0:h, 0:w]
        img = ((3 * xs + 17 * ys + 23 * i) % 256).astype(np.uint8)
        rows.append(
            (i, "image", bytearray(encode_gif(img)), (w, h, None, None, "gif"))
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), MEDIA_SCHEMA_DDL
    )


def synthesize_wav_corpus(spark: SparkSession, n: int = 20) -> DataFrame:
    """n real RIFF/WAVE PCM-16 clips; sample(t) = (t*(3+id)) % 2048 − 1024,
    256 + 16*(id%5) samples at 8 kHz."""
    rows = []
    for i in range(n):
        cnt = 256 + 16 * (i % 5)
        t = np.arange(cnt)
        samples = ((t * (3 + i)) % 2048 - 1024).astype("<i2")
        rows.append(
            (
                i,
                "audio",
                bytearray(encode_wav(samples)),
                (None, None, 8000, None, "wav"),
            )
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), MEDIA_SCHEMA_DDL
    )


IMAGE_STATS_DDL = (
    "media_id bigint, width int, height int, n_pixels bigint, "
    "pixel_sum bigint, weighted_sum bigint"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Exact integral image statistics after decode: pixel count/sum and
    the position-weighted checksum sum(v * (x + w*y)) — one changed pixel
    ANYWHERE changes it, so it certifies decode fidelity bit-for-bit."""
    import pandas as pd

    imgs = media.where(F.col("kind") == "image")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                img = decode_image(bytes(row.content), row.media_meta).astype(
                    np.int64
                )
                h, w = img.shape
                ys, xs = np.mgrid[0:h, 0:w]
                out.append(
                    {
                        "media_id": row.media_id,
                        "width": w,
                        "height": h,
                        "n_pixels": int(img.size),
                        "pixel_sum": int(img.sum()),
                        "weighted_sum": int((img * (xs + w * ys)).sum()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "pixel_sum", "weighted_sum",
                ],
            )

    return imgs.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=IMAGE_STATS_DDL
    )


AUDIO_STATS_DDL = (
    "media_id bigint, n_samples bigint, sample_sum bigint, "
    "abs_sum bigint, weighted_sum bigint"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Exact integral audio statistics after decode (integer twins of
    ``audio_features``'s float RMS/ZCR): sum, |sum|, and the
    position-weighted checksum sum(s * t)."""
    import pandas as pd

    auds = media.where(F.col("kind") == "audio")

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                s = decode_audio(bytes(row.content), row.media_meta).astype(
                    np.int64
                )
                t = np.arange(s.size)
                out.append(
                    {
                        "media_id": row.media_id,
                        "n_samples": int(s.size),
                        "sample_sum": int(s.sum()),
                        "abs_sum": int(np.abs(s).sum()),
                        "weighted_sum": int((s * t).sum()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_samples", "sample_sum",
                    "abs_sum", "weighted_sum",
                ],
            )

    return auds.select("media_id", "content", "media_meta").mapInPandas(
        run, schema=AUDIO_STATS_DDL
    )
