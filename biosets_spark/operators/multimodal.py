"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

No reference counterpart (BASELINE.json extension surface). Design:

- payload: plain ``binary`` column (Parquet BYTE_ARRAY — splittable,
  column-pruned, predicate-skipped like any other column);
- metadata: sibling struct column ``{modality, mime, width, height,
  duration_ms, sample_rate}`` so filters (e.g. width > 512) push down
  WITHOUT touching the (huge) payload bytes;
- compute: decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` generators. Since r6, UNCOMPRESSED
  container formats decode for real with stdlib-only parsers (BMP and
  binary PPM/PGM images -> dims + channel means; PCM WAV audio ->
  sample rate / duration / RMS; PNG via stdlib zlib since r8).
  Compressed codecs (JPEG/WebP, MP3,
  H.264) genuinely require PIL/soundfile/pyav — absent from this
  container — and stay behind an import-gated NotImplementedError
  (or the deterministic fake in test mode). The Spark-side plumbing —
  schemas, batch iteration, partition sizing — is real and tested
  either way.

Scale note: payload columns dominate I/O. Keep them in their own
parquet column (never inside a struct with hot columns), set
``spark.sql.files.maxPartitionBytes`` so a partition holds a bounded
number of payloads, and always select metadata-only projections when
the query doesn't decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col, lit

MEDIA_META_TYPE = T.StructType([
    T.StructField("modality", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_media_metadata(
    df: DataFrame,
    payload_col: str,
    modality: str,
    mime: str,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Attach the typed metadata struct for an opaque payload column."""
    return df.withColumn(
        meta_col,
        F.struct(
            lit(modality).alias("modality"),
            lit(mime).alias("mime"),
            lit(None).cast("int").alias("width"),
            lit(None).cast("int").alias("height"),
            lit(None).cast("long").alias("duration_ms"),
            lit(None).cast("int").alias("sample_rate"),
        ),
    )


# ---------------------------------------------------------------------
# stdlib decoders for UNCOMPRESSED container formats (r6). The original
# decode stub covered every format; compressed codecs (JPEG/WebP,
# MP3/FLAC, H.264) genuinely need PIL/soundfile/pyav — absent from this
# container, still import-gated below. But BMP, PPM/PGM, and WAV-PCM
# are struct-packed headers + raw samples: decodable with stdlib only,
# so for those the real path now actually decodes.
# ---------------------------------------------------------------------

def _valueerror_surface(fn):
    """Every decoder's documented error contract is ValueError; a
    truncated payload must never escape as struct.error/IndexError
    from unpack_from/byte-walk depths (r8 review — decode_gif and
    decode_png already had dedicated wrappers; this harmonizes the
    rest)."""
    import functools
    import struct as _s

    @functools.wraps(fn)
    def wrapped(raw: bytes):
        try:
            return fn(raw)
        except (IndexError, _s.error) as exc:
            raise ValueError(
                f"truncated or corrupt payload ({fn.__name__}): {exc}"
            ) from exc

    return wrapped


@_valueerror_surface
def decode_bmp(raw: bytes):
    """Uncompressed 24/32-bit BI_RGB Windows bitmap ->
    (width, height, mean_r, mean_g, mean_b). Stdlib-only."""
    import struct as _s

    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = _s.unpack_from("<I", raw, 10)[0]
    hdr_size = _s.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    width, height = _s.unpack_from("<ii", raw, 18)
    bpp = _s.unpack_from("<H", raw, 28)[0]
    compression = _s.unpack_from("<I", raw, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (got bpp={bpp})")
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    import numpy as np

    px = np.frombuffer(
        raw, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * nch].reshape(height, width, nch)
    if flip:
        px = px[::-1]
    # BMP stores BGR(A)
    b, g, r = (px[..., 0], px[..., 1], px[..., 2])
    return width, height, float(r.mean()), float(g.mean()), float(b.mean())


@_valueerror_surface
def decode_pnm(raw: bytes):
    """Binary PPM (P6) / PGM (P5) ->
    (width, height, mean_r, mean_g, mean_b). Stdlib-only."""
    import numpy as np

    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":  # comment to end of line
            pos = raw.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        if start == pos:  # header ran out before 3 numeric fields
            raise ValueError("truncated PNM header")
        try:
            fields.append(int(raw[start:pos]))
        except ValueError:
            raise ValueError(
                f"corrupt PNM header token {raw[start:pos]!r}") from None
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    nch = 3 if raw[:2] == b"P6" else 1
    px = np.frombuffer(raw, dtype=np.uint8, count=width * height * nch,
                       offset=pos).reshape(height, width, nch)
    if nch == 1:
        m = float(px.mean())
        return width, height, m, m, m
    return (width, height, float(px[..., 0].mean()),
            float(px[..., 1].mean()), float(px[..., 2].mean()))


@_valueerror_surface
def decode_tiff(raw: bytes):
    """Uncompressed strip-layout baseline TIFF (8-bit grayscale or
    RGB, either endianness) -> (width, height, mean_r, mean_g,
    mean_b). Stdlib+numpy only; compressed TIFF (LZW/deflate/JPEG-in-
    TIFF) raises the gated error like every other compressed codec."""
    import struct as _s

    import numpy as np

    if raw[:4] == b"II*\x00":
        bo = "<"
    elif raw[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    ifd_off = _s.unpack_from(bo + "I", raw, 4)[0]
    n_entries = _s.unpack_from(bo + "H", raw, ifd_off)[0]
    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def values(pos):
        typ, count = _s.unpack_from(bo + "HI", raw, pos + 2)
        if typ not in _TYPE_SIZE:
            raise ValueError(f"unsupported TIFF field type {typ}")
        size = _TYPE_SIZE[typ] * count
        off = pos + 8 if size <= 4 else _s.unpack_from(bo + "I", raw, pos + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(_s.unpack_from(bo + str(count) + fmt, raw, off))

    tags = {}
    for i in range(n_entries):
        pos = ifd_off + 2 + 12 * i
        tag = _s.unpack_from(bo + "H", raw, pos)[0]
        if tag in (256, 257, 258, 259, 262, 273, 277, 278, 279):
            tags[tag] = values(pos)
    # required baseline tags raise the decoder's documented error
    # surface (ValueError), never a bare KeyError from executor depths
    missing = [t for t in (256, 257, 273) if t not in tags]
    if missing:
        raise ValueError(f"TIFF missing required IFD tag(s) {missing}")
    w, h = tags[256][0], tags[257][0]
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise ValueError(
            f"only uncompressed TIFF (compression={compression}); "
            "LZW/deflate/JPEG strips need PIL"
        )
    nch = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * nch)
    if any(b != 8 for b in bits) or nch not in (1, 3):
        raise ValueError("only 8-bit grayscale/RGB TIFF supported")
    offsets = tags[273]
    counts = tags.get(279, [w * h * nch])
    data = b"".join(raw[o:o + c] for o, c in zip(offsets, counts))
    px = np.frombuffer(data, dtype=np.uint8,
                       count=w * h * nch).reshape(h, w, nch)
    photometric = tags.get(262, [1])[0]
    if photometric == 0:  # WhiteIsZero: invert
        px = 255 - px
    if nch == 1:
        m = float(px.mean())
        return w, h, m, m, m
    return (w, h, float(px[..., 0].mean()),
            float(px[..., 1].mean()), float(px[..., 2].mean()))


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list:
    """GIF-variant LZW -> list of palette indices. Codes are packed
    LSB-first at variable width (min+1 .. 12 bits); the clear code
    resets the dictionary, and width grows when the next free code
    would not fit the current width. Pure stdlib."""
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    out: list = []
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width = reset()
                prev = None
                continue
            if code == end:
                return out[:n_pixels]
            if prev is None:
                if code >= len(table):
                    raise ValueError(
                        "corrupt GIF LZW stream (first code out of range)")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out[:n_pixels]
    return out[:n_pixels]


def decode_gif(raw: bytes):
    """First frame of a GIF87a/89a -> (width, height, mean_r, mean_g,
    mean_b). Full LZW (variable code width, clear/KwKwK cases) and
    interlace handling in stdlib-only Python — the same
    no-external-deps posture as sources/avro_py.py. Means are over the
    frame's palette-mapped RGB pixels. Raises ValueError (never
    IndexError/struct.error) on any truncated or corrupt payload."""
    import struct as _s

    try:
        return _decode_gif_impl(raw)
    except (IndexError, _s.error) as exc:
        # block-walk past EOF / short header on a truncated payload:
        # keep the decoder's single documented error surface
        raise ValueError(f"truncated or corrupt GIF: {exc}") from exc


def _decode_gif_impl(raw: bytes):
    import struct as _s

    import numpy as np

    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _aspect = _s.unpack_from("<HHBBB", raw, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(raw, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _left, _top, w, h, iflags = _s.unpack_from("<HHHHB", raw, pos)
        pos += 9
        table = gct
        if iflags & 0x80:  # local color table overrides
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(raw, dtype=np.uint8, count=3 * n,
                                  offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = raw[pos]
        pos += 1
        chunks = []
        while raw[pos]:
            sz = raw[pos]
            chunks.append(raw[pos + 1:pos + 1 + sz])
            pos += 1 + sz
        pos += 1
        idx = np.array(
            _gif_lzw_decode(b"".join(chunks), min_code, w * h),
            dtype=np.int64,
        )
        if len(idx) < w * h:
            raise ValueError("truncated GIF pixel data")
        if len(idx) and int(idx.max()) >= len(table):
            raise ValueError(
                f"GIF palette index {int(idx.max())} out of range "
                f"(color table has {len(table)} entries)")
        px = table[idx].reshape(h, w, 3)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                    np.arange(2, h, 4), np.arange(1, h, 2)])
            deinterlaced = np.empty_like(px)
            deinterlaced[order] = px
            px = deinterlaced
        return (int(w), int(h), float(px[..., 0].mean()),
                float(px[..., 1].mean()), float(px[..., 2].mean()))
    raise ValueError("GIF contains no image frame")


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(data: bytes, pos: int, n_rows: int, rowbytes: int,
                  bpp: int) -> tuple[bytes, int]:
    """Reverse PNG row filters (None/Sub/Up/Average/Paeth) over
    ``n_rows`` scanlines starting at ``data[pos]``; each scanline is a
    1-byte filter type + ``rowbytes`` of filtered bytes. Returns the
    reconstructed bytes and the stream position after the last row.
    Sub/Up are numpy-vectorized (per-lane cumsum / row add); Average
    and Paeth carry a left+up dependency and run per byte."""
    import numpy as np

    # validate BEFORE allocating: a corrupt IHDR can declare absurd
    # dimensions the actual (bounded) IDAT stream can never satisfy
    need = n_rows * (1 + rowbytes)
    if len(data) - pos < need:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((n_rows, rowbytes), dtype=np.uint8)
    for r in range(n_rows):
        ftype = data[pos]
        pos += 1
        row = np.frombuffer(data, dtype=np.uint8, count=rowbytes,
                            offset=pos).copy()
        pos += rowbytes
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: per-lane cumulative sum (mod 256)
            lanes = row[: rowbytes - rowbytes % bpp].reshape(-1, bpp)
            row[: lanes.size] = np.cumsum(
                lanes, axis=0, dtype=np.uint64).astype(np.uint8).ravel()
            for i in range(lanes.size, rowbytes):  # ragged tail (none in practice)
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if r:
                row += out[r - 1]
        elif ftype == 3:  # Average
            prev = out[r - 1] if r else np.zeros(rowbytes, dtype=np.uint8)
            rl = row.tolist()
            pl = prev.tolist()
            for i in range(rowbytes):
                a = rl[i - bpp] if i >= bpp else 0
                rl[i] = (rl[i] + ((a + pl[i]) >> 1)) & 0xFF
            row = np.asarray(rl, dtype=np.uint8)
        elif ftype == 4:  # Paeth
            prev = out[r - 1] if r else np.zeros(rowbytes, dtype=np.uint8)
            rl = row.tolist()
            pl = prev.tolist()
            for i in range(rowbytes):
                a = rl[i - bpp] if i >= bpp else 0
                c = pl[i - bpp] if i >= bpp else 0
                rl[i] = (rl[i] + _png_paeth(a, pl[i], c)) & 0xFF
            row = np.asarray(rl, dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = row
    return out.tobytes(), pos


def _png_samples(rows: bytes, w: int, h: int, depth: int, channels: int,
                 rowbytes: int):
    """Reconstructed scanline bytes -> (h, w, channels) uint8 samples.
    16-bit samples are downscaled to their high byte; 1/2/4-bit
    samples (gray or palette index, always single-channel) are
    unpacked MSB-first. Palette indices are NOT scaled here."""
    import numpy as np

    b = np.frombuffer(rows, dtype=np.uint8).reshape(h, rowbytes)
    if depth == 8:
        return b[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        # big-endian sample pairs; high byte ~ value/257 rounding-free
        return b[:, : 2 * w * channels].reshape(h, w, channels, 2)[..., 0]
    per_byte = 8 // depth
    shifts = np.arange(per_byte - 1, -1, -1, dtype=np.uint8) * depth
    vals = (b[:, :, None] >> shifts) & ((1 << depth) - 1)
    return vals.reshape(h, -1)[:, :w].reshape(h, w, 1)


# Adam7 interlace pass layout: (x_start, y_start, x_step, y_step)
_PNG_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(raw: bytes):
    """PNG -> (width, height, mean_r, mean_g, mean_b), stdlib-only
    (``zlib`` inflate + per-row unfilter), the same no-external-deps
    posture as decode_gif/sources/avro_py.py. Supports all five color
    types (gray, RGB, palette, gray+alpha, RGBA), bit depths
    1/2/4/8/16 (16-bit downscaled to 8), and Adam7 interlace. Alpha
    channels are ignored in the means (straight RGB over all pixels).
    Raises ValueError (never IndexError/struct.error/zlib.error) on
    truncated or corrupt payloads."""
    import struct as _s
    import zlib

    try:
        return _decode_png_impl(raw)
    except (IndexError, _s.error, zlib.error) as exc:
        raise ValueError(f"truncated or corrupt PNG: {exc}") from exc


def _decode_png_impl(raw: bytes):
    import struct as _s
    import zlib

    import numpy as np

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte = 8, None, None
    idat: list[bytes] = []
    while pos + 8 <= len(raw):
        length, ctype = _s.unpack_from(">I4s", raw, pos)
        body = raw[pos + 8: pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + body + crc (crc unchecked)
        if ctype == b"IHDR":
            ihdr = _s.unpack_from(">IIBBBBB", body, 0)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8,
                                 count=len(body) - len(body) % 3).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    if not idat:
        raise ValueError("PNG missing IDAT chunk")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if w == 0 or h == 0:
        raise ValueError("PNG has zero dimensions")
    if comp != 0 or filt != 0:
        raise ValueError(f"unknown PNG compression/filter method ({comp}/{filt})")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ct}")
    valid_depths = (1, 2, 4, 8, 16) if ct in (0, 3) else (8, 16)
    if depth not in valid_depths or (ct == 3 and depth == 16):
        raise ValueError(f"invalid PNG bit depth {depth} for color type {ct}")
    if ct == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if w * h > (1 << 26):
        raise ValueError(
            f"PNG dimensions {w}x{h} exceed the 67M-pixel decode cap "
            "(decompression-bomb guard)")
    bpp = max(1, channels * depth // 8)

    def rb(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if interlace == 0:
        expected = h * (1 + rb(w))
    elif interlace == 1:
        expected = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                expected += ph * (1 + rb(pw))
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    # bounded inflate: never materialize more than the declared image
    # needs, whatever the compressed stream claims (zip-bomb guard)
    dco = zlib.decompressobj()
    data = dco.decompress(b"".join(idat), expected)
    if len(data) < expected:
        raise ValueError("truncated PNG pixel data")

    if interlace == 0:
        rows, end = _png_unfilter(data, 0, h, rb(w), bpp)
        px = _png_samples(rows, w, h, depth, channels, rb(w))
    else:
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _png_unfilter(data, off, ph, rb(pw), bpp)
            px[y0::dy, x0::dx] = _png_samples(rows, pw, ph, depth,
                                              channels, rb(pw))

    if ct == 3:
        idx = px[..., 0]
        if int(idx.max()) >= len(plte):
            raise ValueError(
                f"PNG palette index {int(idx.max())} out of range "
                f"(PLTE has {len(plte)} entries)")
        rgb = plte[idx]
    elif ct in (0, 4):
        gray = px[..., 0]
        if depth < 8:
            gray = (gray.astype(np.uint16) * 255 //
                    ((1 << depth) - 1)).astype(np.uint8)
        rgb = np.repeat(gray[..., None], 3, axis=2)
    else:  # RGB / RGBA: drop alpha if present
        rgb = px[..., :3]
    return (int(w), int(h), float(rgb[..., 0].mean()),
            float(rgb[..., 1].mean()), float(rgb[..., 2].mean()))


@_valueerror_surface
def decode_wav(raw: bytes):
    """PCM WAV -> (sample_rate, n_channels, duration_ms, rms).
    Stdlib-only (RIFF walk + int16/uint8 sample math)."""
    import struct as _s

    import numpy as np

    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, sz = raw[pos:pos + 4], _s.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = _s.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(
            f"only PCM 8/16-bit WAV (fmt={audio_fmt}, bits={bits}); "
            "compressed audio needs soundfile/pyav"
        )
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype("float64")
    else:
        samples = np.frombuffer(data, dtype="u1").astype("float64") - 128.0
    n_frames = len(samples) // max(n_ch, 1)
    duration_ms = int(n_frames * 1000 // rate) if rate else 0
    rms = float(np.sqrt((samples * samples).mean())) if len(samples) else 0.0
    return rate, n_ch, duration_ms, rms


@_valueerror_surface
def decode_jpeg_dims(raw: bytes):
    """JPEG -> (width, height, n_components) from a header-only SOF
    marker scan — NO codec needed (r8 verdict gap #1: a real user hits
    JPEG first; the dominant metadata case is dimensions, which live
    in the frame header, not the entropy-coded stream). Walks the
    marker segments from SOI to the first SOFn (baseline C0/C1,
    progressive C2, lossless C3, differential/arithmetic C5-CF except
    DHT C4, JPG C8, DAC CC) and reads precision/height/width/
    components; raises ValueError before SOS if no frame header —
    the full-decode path still needs PIL and stays import-gated."""
    import struct as _s

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    _SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker desync at offset {pos}")
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        seg_len = _s.unpack_from(">H", raw, pos + 2)[0]
        if seg_len < 2:
            raise ValueError(f"invalid segment length {seg_len}")
        if marker in _SOF:
            if seg_len < 8:
                raise ValueError("truncated SOF segment")
            _precision, h, w, n_comp = _s.unpack_from(">BHHB", raw, pos + 4)
            if w == 0 or h == 0:
                raise ValueError("JPEG frame with zero dimension")
            return int(w), int(h), int(n_comp)
        if marker == 0xDA:  # SOS: frame header must precede scan data
            break
        pos += 2 + seg_len
    raise ValueError("no SOF frame header found before scan/EOF")


@_valueerror_surface
def decode_webp_dims(raw: bytes):
    """WebP -> (width, height, variant) header-only: RIFF walk to the
    first VP8 (lossy: frame tag at chunk start), VP8L (lossless:
    14-bit packed dims), or VP8X (extended: 24-bit canvas) chunk.
    Dimension fields live in the container header, so no codec."""
    import struct as _s

    if raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        sz = _s.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8:pos + 8 + sz]
        if cid == b"VP8 ":
            # frame tag (3) + start code 9D 01 2A + 16-bit w/h (14 used)
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("truncated/invalid VP8 frame header")
            w, h = _s.unpack_from("<HH", body, 6)
            return (w & 0x3FFF), (h & 0x3FFF), "vp8"
        if cid == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("truncated/invalid VP8L header")
            bits = _s.unpack_from("<I", body, 1)[0]
            return ((bits & 0x3FFF) + 1,
                    ((bits >> 14) & 0x3FFF) + 1, "vp8l")
        if cid == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X header")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h, "vp8x"
        pos += 8 + sz + (sz & 1)
    raise ValueError("no VP8/VP8L/VP8X chunk found")


@_valueerror_surface
def decode_flac_info(raw: bytes):
    """FLAC -> (sample_rate, n_channels, bits_per_sample, n_samples)
    from the mandatory STREAMINFO metadata block — header-only, no
    codec (the FLAC container spec REQUIRES STREAMINFO first, so one
    34-byte parse covers every conformant file)."""
    if raw[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    if len(raw) < 8 + 34:
        raise ValueError("truncated FLAC header")
    btype = raw[4] & 0x7F
    blen = int.from_bytes(raw[5:8], "big")
    if btype != 0 or blen < 34:
        raise ValueError("first FLAC metadata block is not STREAMINFO")
    # STREAMINFO bit layout after the 10 min/max block/frame-size
    # bytes: sample rate (20) | channels-1 (3) | bits-1 (5) |
    # total samples (36) packed big-endian in 8 bytes
    packed = int.from_bytes(raw[8 + 10:8 + 18], "big")
    sample_rate = packed >> 44
    n_channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    n_samples = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError("FLAC STREAMINFO with zero sample rate")
    return int(sample_rate), int(n_channels), int(bits), int(n_samples)


_MP3_BITRATE_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                     128, 160, 192, 224, 256, 320, 0)
_MP3_BITRATE_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64,
                     80, 96, 112, 128, 144, 160, 0)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


@_valueerror_surface
def decode_mp3_info(raw: bytes):
    """MP3 -> (sample_rate, n_channels, bitrate_kbps, n_frames)
    header-only: skip any ID3v2 tag, find the first Layer-III frame
    sync, decode its header fields, and read the Xing/Info frame
    count when the encoder wrote one (n_frames = 0 means no Xing tag
    — CBR duration then follows from file size / bitrate). Decoding
    audio samples still needs pyav and stays import-gated."""
    pos = 0
    if raw[:3] == b"ID3" and len(raw) >= 10:
        # syncsafe 28-bit tag size
        sz = ((raw[6] & 0x7F) << 21 | (raw[7] & 0x7F) << 14
              | (raw[8] & 0x7F) << 7 | (raw[9] & 0x7F))
        pos = 10 + sz
    end = min(len(raw) - 4, pos + 64 * 1024)
    while pos <= end:
        if raw[pos] == 0xFF and (raw[pos + 1] & 0xE0) == 0xE0:
            version = (raw[pos + 1] >> 3) & 0x3   # 3=MPEG1, 2=MPEG2, 0=2.5
            layer = (raw[pos + 1] >> 1) & 0x3     # 1 = Layer III
            br_idx = (raw[pos + 2] >> 4) & 0xF
            sr_idx = (raw[pos + 2] >> 2) & 0x3
            mode = (raw[pos + 3] >> 6) & 0x3
            if version != 1 and layer == 1 and sr_idx != 3 and br_idx not in (0, 15):
                table = _MP3_BITRATE_V1L3 if version == 3 else _MP3_BITRATE_V2L3
                sample_rate = _MP3_RATES[version][sr_idx]
                bitrate = table[br_idx]
                n_channels = 1 if mode == 3 else 2
                n_frames = 0
                # Xing/Info header sits after the side info
                side = (17 if mode == 3 else 32) if version == 3 else \
                       (9 if mode == 3 else 17)
                tag_at = pos + 4 + side
                tag = raw[tag_at:tag_at + 4]
                if tag in (b"Xing", b"Info") and raw[tag_at + 7] & 0x1:
                    n_frames = int.from_bytes(
                        raw[tag_at + 8:tag_at + 12], "big")
                return sample_rate, n_channels, bitrate, n_frames
        pos += 1
    raise ValueError("no MPEG Layer-III frame sync found")


@_valueerror_surface
def decode_mp4_info(raw: bytes):
    """MP4/ISO-BMFF -> (major_brand, duration_ms, width, height)
    header-only: walk the top-level box tree to ftyp (brand) and
    moov/mvhd (timescale+duration, version 0 and 1), then the first
    trak/tkhd carrying a non-zero visual size (16.16 fixed point).
    width/height are 0 for audio-only files. Frame decode still
    needs pyav and stays import-gated."""
    import struct as _s

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            sz = _s.unpack_from(">I", raw, pos)[0]
            typ = raw[pos + 4:pos + 8]
            hdr = 8
            if sz == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("truncated largesize box")
                sz = _s.unpack_from(">Q", raw, pos + 8)[0]
                hdr = 16
            elif sz == 0:  # box extends to end of enclosing scope
                sz = end - pos
            if sz < hdr or pos + sz > end:
                raise ValueError(f"invalid box size {sz} at {pos}")
            yield typ, pos + hdr, pos + sz
            pos += sz

    brand, duration_ms, width, height = None, 0, 0, 0
    moov = None
    for typ, body, bend in walk(0, len(raw)):
        if typ == b"ftyp":
            brand = raw[body:body + 4].decode("latin-1")
        elif typ == b"moov":
            moov = (body, bend)
    if brand is None:
        raise ValueError("not an ISO-BMFF payload (no ftyp box)")
    if moov is None:
        raise ValueError("no moov box (streaming-fragmented file?)")
    for typ, body, bend in walk(*moov):
        if typ == b"mvhd":
            ver = raw[body]
            if ver == 1:
                scale, dur = _s.unpack_from(">IQ", raw, body + 4 + 16)
            else:
                scale, dur = _s.unpack_from(">II", raw, body + 4 + 8)
            duration_ms = int(dur * 1000 // scale) if scale else 0
        elif typ == b"trak" and not width:
            for t2, b2, _e2 in walk(body, bend):
                if t2 == b"tkhd":
                    off = b2 + 4 + (32 if raw[b2] == 1 else 20) + 52
                    w_fx, h_fx = _s.unpack_from(">II", raw, off)
                    if w_fx and h_fx:
                        width, height = w_fx >> 16, h_fx >> 16
    return brand, duration_ms, width, height


def _decode_image(payload: bytes, fake: bool):
    if fake:
        # deterministic fake: "decode" = payload length pseudo-pixels
        return (len(payload) % 640 + 1, len(payload) % 480 + 1)
    if payload[:2] == b"BM":
        w, h, *_ = decode_bmp(payload)
        return (w, h)
    if payload[:2] in (b"P5", b"P6"):
        w, h, *_ = decode_pnm(payload)
        return (w, h)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, *_ = decode_gif(payload)
        return (w, h)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        w, h, *_ = decode_tiff(payload)
        return (w, h)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, *_ = decode_png(payload)
        return (w, h)
    if payload[:2] == b"\xff\xd8":
        w, h, _n = decode_jpeg_dims(payload)
        return (w, h)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        w, h, _v = decode_webp_dims(payload)
        return (w, h)
    raise NotImplementedError(
        "full pixel decode for compressed codecs requires PIL/opencv, "
        "not installed in this environment; BMP, binary PPM/PGM, GIF, "
        "PNG and uncompressed TIFF decode natively, JPEG/WebP "
        "DIMENSIONS parse header-only via decode_jpeg_dims/"
        "decode_webp_dims, or pass fake_decode=True for the "
        "deterministic stub"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract pipeline over binary image payloads.

    Real plumbing: Arrow-batched mapInPandas with an explicit output
    schema; the decode call itself is stubbed (see module docstring).
    Output: (id, width, height, n_bytes, phash64) — phash is a
    deterministic content hash standing in for a perceptual hash.
    """
    import hashlib

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("phash64", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, nb, ph = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                # real-decode: a NULL/empty payload carries nothing to
                # decode — skip it (extract_image_stats contract)
                # rather than aborting the stage on the format gate;
                # fake mode keeps emitting its deterministic stub row
                if not raw and not fake_decode:
                    continue
                w, h = _decode_image(raw, fake_decode)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
                ph.append(int.from_bytes(hashlib.md5(raw).digest()[:8], "big", signed=True))
            yield pd.DataFrame({id_col: ids, "width": ws, "height": hs, "n_bytes": nb, "phash64": ph})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)


def _decode_compressed_image(raw: bytes):
    """Real decode for compressed codecs (JPEG/WebP/...): import-gated
    on PIL — the gate is an IMPORT ATTEMPT, so an environment with
    Pillow installed gets the real pixels (proven by the
    skip-unless-installed pytest in tests/test_multimodal_gates.py)
    and one without gets the documented NotImplementedError."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "compressed image decode requires PIL/opencv"
        ) from e
    import io

    import numpy as np

    img = Image.open(io.BytesIO(raw)).convert("RGB")
    a = np.asarray(img, dtype=np.float64)
    return (img.width, img.height,
            float(a[..., 0].mean()), float(a[..., 1].mean()),
            float(a[..., 2].mean()))


def _decode_video_frames(raw: bytes, id_val, every_n: int = 1):
    """Real keyframe sampling: import-gated on pyav. Yields
    (id, frame_no, frame_key) per sampled frame — frame_key is the
    md5 of the decoded RGB plane, so identical content keys
    identically regardless of container timestamps."""
    try:
        import av
    except ImportError as e:
        raise NotImplementedError(
            "video decode requires pyav; not installed"
        ) from e
    import hashlib
    import io

    out = []
    with av.open(io.BytesIO(raw)) as container:
        n = 0
        for frame in container.decode(video=0):
            if n % every_n == 0:
                rgb = frame.to_ndarray(format="rgb24")
                out.append((id_val, n,
                            hashlib.md5(rgb.tobytes()).hexdigest()[:12]))
            n += 1
    return out


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    fake_decode: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    'frame' (stub: every n-th kilobyte becomes a fake frame key).
    Demonstrates the 1->N mapInPandas expansion shape used by real
    frame extraction."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_key", T.StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, fns, fks = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                if not fake_decode:
                    for vid, fn, fk in _decode_video_frames(raw, i):
                        ids.append(vid)
                        fns.append(fn)
                        fks.append(fk)
                    continue
                for fn in range(max(1, len(raw) // every_n_bytes)):
                    ids.append(i)
                    fns.append(fn)
                    fks.append(hashlib.md5(raw[fn * every_n_bytes:(fn + 1) * every_n_bytes]).hexdigest()[:12])
            yield pd.DataFrame({id_col: ids, "frame_no": fns, "frame_key": fks})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode + feature-extract over binary audio payloads: one row per
    payload with (id, sample_rate, n_channels, duration_ms, rms,
    n_bytes). PCM WAV decodes natively (decode_wav, stdlib-only);
    compressed audio raises the import-gated error per payload batch;
    NULL/empty payloads are skipped (no output row). Same Arrow-batched
    mapInPandas shape as extract_image_features."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    (id_col, "sample_rate", "n_channels", "duration_ms",
                     "rms", "n_bytes")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    continue  # null payloads carry nothing to decode
                raw = bytes(payload)
                rate, n_ch, dur, rms = decode_wav(raw)
                rows[id_col].append(i)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(n_ch)
                rows["duration_ms"].append(dur)
                rows["rms"].append(rms)
                rows["n_bytes"].append(len(raw))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)


def extract_image_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full real-decode image statistics for natively decodable
    payloads (BMP / binary PPM / PGM / GIF / PNG / uncompressed TIFF):
    (id, width, height, mean_r, mean_g, mean_b, n_bytes). Compressed
    payloads raise the gated error — filter on the metadata struct's
    mime first at scale; NULL/empty payloads are skipped (no output
    row)."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    (id_col, "width", "height", "mean_r", "mean_g",
                     "mean_b", "n_bytes")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    continue  # null payloads carry nothing to decode
                raw = bytes(payload)
                if raw[:2] == b"BM":
                    w, h, mr, mg, mb = decode_bmp(raw)
                elif raw[:2] in (b"P5", b"P6"):
                    w, h, mr, mg, mb = decode_pnm(raw)
                elif raw[:6] in (b"GIF87a", b"GIF89a"):
                    w, h, mr, mg, mb = decode_gif(raw)
                elif raw[:4] in (b"II*\x00", b"MM\x00*"):
                    w, h, mr, mg, mb = decode_tiff(raw)
                elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                    w, h, mr, mg, mb = decode_png(raw)
                else:
                    w, h, mr, mg, mb = _decode_compressed_image(raw)
                rows[id_col].append(i)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(mr)
                rows["mean_g"].append(mg)
                rows["mean_b"].append(mb)
                rows["n_bytes"].append(len(raw))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)
