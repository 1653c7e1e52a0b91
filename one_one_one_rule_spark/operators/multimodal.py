"""Multimodal columns: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas``.
The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec step is STUBBED behind an
import-try (image/audio libraries are not in this container) with a
deterministic fake, clearly tagged in the ``backend`` output column.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("backend", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def media_kind(key):
    """The modality cycle (image / audio / video by ``key % 3``) — the ONE
    owner of the kind rule, shared by ``synthesize_media`` and the
    multimodal curation plan so the label and the image-gate predicate
    (``doc_id % 3 == 0`` in ``synthesize_png_images``) cannot diverge.

    ``pmod`` (not ``%``): Spark's ``%`` keeps the dividend's sign, so a
    negative key would index 0 (error) or from-the-end — the helper is
    shared API and must be total over ALL integer keys, not just the
    nonnegative doc_ids of the current callers (round-10 ADVICE)."""
    return F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(key, F.lit(3)) + 1).cast("int"),
    )


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: payload is the
    utf-8 encoding of the text (a stand-in byte stream), kind cycles by
    doc_id, metadata struct is derived arithmetically. The byte-column
    plumbing (binary type, metadata struct) is exactly what a real
    image/audio ingest produces."""
    k = F.col("doc_id")
    return docs.select(
        k.alias("media_id"),
        media_kind(k).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (16 + k % 32).cast("int").alias("width"),
            (16 + (k * 7) % 32).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (1 + k % 24).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_backend():
    """Backend label for payloads no real decoder recognizes. Always
    'stub': the fallback features ARE the deterministic byte-mean stub
    whatever libraries happen to be importable — labeling by mere
    importability would make the output column environment-dependent and
    misstate which code produced the features. A genuine third-party
    decode path (Pillow/cv2) would slot in as another recognized format
    in ``extract_features`` with its own honest label, exactly like the
    stdlib BMP/PPM path ('stdlib') does."""
    return "stub"


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: decode_image PNG contract cap (16.7M px = ~50 MB raw): bounds every
#: allocation the decoder makes against IHDR-declared dimensions.
_PNG_MAX_PIXELS = 1 << 24

#: Cap for UNTRUSTED payload paths (extract_features / resize /
#: frame-sample over arbitrary binary columns): the Average/Paeth
#: unfilters are inherently sequential recurrences (interpreted
#: per-byte), so the pixel cap bounds CPU as well as allocation —
#: 256k px ≈ 0.8M worst-case loop iterations, sub-second per payload,
#: vs minutes at the 16.7M-px allocation cap. Feature extraction /
#: thumbnail resize never needs more resolution than this; trusted
#: fixture decode keeps the full cap.
_PNG_MAX_PIXELS_UNTRUSTED = 1 << 18


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _encode_png_raw(a, ctype: int, plte: bytes | None = None) -> bytes:
    """Shared encoder body: ``a`` is (h, w) for color types 0/3 or
    (h, w, 3) for type 2; filter 0 on every scanline, one IDAT chunk."""
    import struct
    import zlib

    h, w = a.shape[0], a.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw, 9)) + _png_chunk(
        b"IEND", b""
    )


def encode_png(img) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib + struct): 8-bit RGB (color
    type 2), no interlace, filter 0 on every scanline, one IDAT chunk.
    Produces spec-valid files any external viewer opens; used both as the
    fixture generator for the strict decoder below and as a sink-side
    encoder for exporting decoded frames."""
    import numpy as np

    a = np.ascontiguousarray(img, dtype=np.uint8)
    return _encode_png_raw(a, 2)


def encode_png_gray(img) -> bytes:
    """8-bit grayscale (color type 0) PNG from an (h, w) uint8 array."""
    import numpy as np

    a = np.ascontiguousarray(img, dtype=np.uint8)
    return _encode_png_raw(a, 0)


def encode_png_palette(indices, palette) -> bytes:
    """8-bit palette (color type 3) PNG: ``indices`` is (h, w) uint8,
    ``palette`` an (n, 3) uint8 array (n <= 256) written as the PLTE
    chunk."""
    import numpy as np

    a = np.ascontiguousarray(indices, dtype=np.uint8)
    p = np.ascontiguousarray(palette, dtype=np.uint8)
    return _encode_png_raw(a, 3, plte=p.tobytes())


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int = 3):
    """Reverse PNG scanline filtering (types 0-4) for 8-bit samples with
    ``bpp`` bytes per pixel (3 = RGB, 1 = grayscale / palette indices);
    returns an (h, w*bpp) uint8 array or None on an undefined filter
    type. Filters 0/1/2 are fully vectorized — Sub's left-recurrence is
    a per-channel-lane cumulative sum, and uint8 cumsum wraps mod 256,
    which is exactly the spec's arithmetic. Average/Paeth carry a
    floor-div / branch through the recurrence (no closed form), so they
    stay per-byte loops — callers on untrusted paths bound that CPU via
    ``_PNG_MAX_PIXELS_UNTRUSTED``."""
    import numpy as np

    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line_u8 = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += 1 + stride
        if ftype == 0:
            out[y] = line_u8
            continue
        if ftype == 1:  # Sub: + left — cumsum per bpp lane, mod-256 wrap
            out[y] = np.cumsum(
                line_u8.reshape(w, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
            continue
        if ftype == 2:  # Up — elementwise, uint8 wrap
            out[y] = line_u8 + out[y - 1] if y else line_u8
            continue
        line = line_u8.astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
    return out


def decode_image(payload: bytes, max_pixels: int = _PNG_MAX_PIXELS):
    """REAL image decode with the stdlib only — no third-party codec.

    Supports three raster formats parsed with nothing beyond
    struct/zlib/numpy:

    * BMP, BITMAPINFOHEADER, 24-bit uncompressed (bottom-up or top-down),
      4-byte-aligned rows, BGR -> RGB;
    * PPM binary (``P6``), maxval 255, ``#`` comments allowed;
    * PNG (round 6, widened round 7): 8-bit non-interlaced in three
      color types — truecolor RGB (2), grayscale (0, replicated to RGB
      on output), and palette (3, PLTE-mapped to RGB with strict
      index-bounds checking) — full chunk walk with CRC verification on
      every chunk, multi-IDAT concatenation, zlib inflate bounded BEFORE
      allocation, and scanline unfiltering for all five spec filter
      types; the decompressed stream must measure EXACTLY h*(1+w*bpp)
      bytes and the final chunk must be IEND closing the file at its
      last byte. For color type 3 exactly one PLTE must precede IDAT
      (length a multiple of 3, 1..256 entries) and every pixel index
      must be < the entry count; for type 0 a PLTE is rejected (spec:
      PLTE must not appear for grayscale); for type 2 a well-formed
      PLTE is a legal suggested palette and is ignored.

    ``max_pixels`` bounds the decoded w*h (allocation AND the
    CPU of the sequential Average/Paeth unfilter loops); untrusted
    payload paths pass ``_PNG_MAX_PIXELS_UNTRUSTED``.

    Returns an (H, W, 3) uint8 RGB array, or None when the payload is not
    a byte-exact instance of either format. Validation is STRICT — magic,
    declared sizes, and pixel-data length must all agree with the actual
    byte count — so arbitrary binary/text payloads (e.g. the synthesized
    UTF-8 media table) never false-positive into the decode path and the
    media_feature_knn hash gate is unchanged."""
    import struct

    import numpy as np

    if len(payload) >= 54 and payload[:2] == b"BM":
        (file_size,) = struct.unpack_from("<I", payload, 2)
        (data_off,) = struct.unpack_from("<I", payload, 10)
        (hdr_size,) = struct.unpack_from("<I", payload, 14)
        if file_size != len(payload) or hdr_size < 40:
            return None
        if data_off < 14 + hdr_size:  # pixel data may not overlap headers
            return None
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        absh = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        if data_off + row_bytes * absh > len(payload):
            return None
        rows = (
            np.frombuffer(payload, np.uint8, row_bytes * absh, data_off)
            .reshape(absh, row_bytes)[:, : w * 3]
            .reshape(absh, w, 3)
        )
        if h > 0:  # positive height = bottom-up row order
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR -> RGB

    if payload[:8] == _PNG_SIG:
        import zlib

        pos, w, ctype = len(_PNG_SIG), None, None
        idat = b""
        idat_seen = False  # buffer truthiness would miss a 0-length IDAT
        idat_done = False  # an ancillary chunk after the run closes it
        plte = None
        ended = False
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body_end = pos + 8 + length
            if body_end + 4 > len(payload):
                return None  # chunk runs past the file
            body = payload[pos + 8 : body_end]
            (crc,) = struct.unpack_from(">I", payload, body_end)
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                return None  # corrupt chunk
            if w is None:
                if tag != b"IHDR" or length != 13:
                    return None  # IHDR must come first
                w, h, bitd, ctype, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if (
                    bitd != 8 or ctype not in (0, 2, 3) or comp != 0
                    or filt != 0 or interlace != 0 or w == 0 or h == 0
                ):
                    return None  # 8-bit gray/RGB/palette, non-interlaced
                if w * h > max_pixels:
                    # decoder contract cap: a lying IHDR (e.g. 20000 x
                    # 20000 over a 1 MB IDAT of compressed zeros) must
                    # not size ANY allocation — untrusted payloads flow
                    # here from extract_features / decode_video
                    return None
            elif tag == b"PLTE":
                if (
                    ctype == 0  # spec: no PLTE for grayscale
                    or plte is not None  # at most one PLTE
                    or idat_seen  # PLTE must precede the first IDAT
                    or length == 0
                    or length % 3
                    or length > 768
                ):
                    return None
                plte = body
            elif tag == b"IDAT":
                if idat_done:
                    # spec: IDAT chunks must be consecutive WITH EACH
                    # OTHER — an IDAT after the run was closed by an
                    # ancillary chunk is a malformed splice
                    return None
                idat_seen = True
                idat += body
            elif tag == b"IEND":
                if length != 0 or body_end + 4 != len(payload):
                    return None  # IEND must close the file exactly
                ended = True
                break
            elif idat_seen:
                # a chunk between the IDAT run and IEND: ANCILLARY
                # chunks (bit 5 of the first type byte set — tEXt, tIME,
                # zTXt...) are spec-legal there and merely CLOSE the run
                # (libpng commonly writes tIME after IDAT); a CRITICAL
                # chunk here (IHDR/PLTE — uppercase first letter) is
                # misplaced and malformed. Order-constrained ancillary
                # tags the spec requires BEFORE the first IDAT (tRNS,
                # gAMA, cHRM, sBIT, sRGB) are accepted here too — this
                # decoder ignores all of them, so a misplaced one cannot
                # change the pixels; if tRNS support is ever added, the
                # post-IDAT position must start rejecting these tags
                if not (tag[0] & 0x20):
                    return None
                idat_done = True
            pos = body_end + 4
        if w is None or not ended or not idat:
            return None
        if ctype == 3 and plte is None:
            return None  # palette image without a PLTE
        bpp = 3 if ctype == 2 else 1
        expected = h * (1 + w * bpp)
        # bound the inflate at expected+1 bytes: a bomb payload (valid
        # CRCs, IHDR declaring huge dims or an IDAT inflating past the
        # declared size) costs at most expected+1 bytes of output, never
        # an unbounded allocation — this path eats untrusted payloads
        try:
            dec = zlib.decompressobj()
            raw = dec.decompress(idat, expected + 1)
        except zlib.error:
            return None
        if len(raw) != expected or dec.unconsumed_tail or dec.decompress(
            b"", 1
        ):
            return None  # stream must measure exactly h*(1+w*bpp)
        flat = _png_unfilter(raw, w, h, bpp)
        if flat is None:
            return None
        if ctype == 2:
            return flat.reshape(h, w, 3)
        if ctype == 0:  # grayscale -> replicate to RGB
            return np.repeat(flat.reshape(h, w, 1), 3, axis=2)
        lut = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(flat.max()) >= len(lut):
            return None  # palette index out of PLTE bounds
        return lut[flat.reshape(h, w)]

    if payload[:2] == b"P6":
        idx, fields = 2, []
        while len(fields) < 3 and idx < len(payload):
            while idx < len(payload) and payload[idx : idx + 1].isspace():
                idx += 1
            if payload[idx : idx + 1] == b"#":
                while idx < len(payload) and payload[idx : idx + 1] != b"\n":
                    idx += 1
                continue
            start = idx
            while idx < len(payload) and payload[idx : idx + 1].isdigit():
                idx += 1
            if idx == start:
                return None
            fields.append(int(payload[start:idx]))
        if (
            len(fields) < 3
            or idx >= len(payload)
            or not payload[idx : idx + 1].isspace()
        ):
            return None
        idx += 1  # single whitespace separates header from pixel data
        w, h, maxval = fields
        if maxval != 255 or w <= 0 or h <= 0:
            return None
        if len(payload) - idx != w * h * 3:
            return None
        return (
            np.frombuffer(payload, np.uint8, w * h * 3, idx)
            .reshape(h, w, 3)
            .copy()
        )

    return None


def image_features(img, dim: int = 8):
    """Deterministic dim-width feature vector from decoded RGB pixels:
    [mean_r, mean_g, mean_b, mean_all, min_all, max_all, w/(w+h),
    h/(w+h)], channel stats scaled to [0,1] — exact rational arithmetic
    over uint8 sums, so run-to-run and partition-order independent."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(-1, 3).astype("float64")
    base = [
        float(flat[:, 0].mean() / 255.0),
        float(flat[:, 1].mean() / 255.0),
        float(flat[:, 2].mean() / 255.0),
        float(flat.mean() / 255.0),
        float(flat.min() / 255.0),
        float(flat.max() / 255.0),
        w / (w + h),
        h / (w + h),
    ]
    return (base + [0.0] * dim)[:dim]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Per row, a REAL stdlib decode is tried first (``decode_image``: 24-bit
    BMP / binary PPM / 8-bit-RGB PNG — strict byte-exact validation, so
    non-image payloads never enter the path) and its pixels feed
    ``image_features``
    (backend='stdlib'). Unrecognized payloads fall back to the
    deterministic stub: feature[j] = mean of payload bytes at positions
    ≡ j (mod dim), scaled to [0,1] (backend='stub' — the fallback is
    always the stub; see ``_decode_backend``). Batch shape, schema, and
    partition-parallel execution are identical on every path.
    """
    fallback = _decode_backend()

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            nbytes = []
            backends = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                nbytes.append(len(arr))
                # magic-byte probe on a tiny slice BEFORE any full-buffer
                # copy: the common case (non-image payload) pays nothing
                head = bytes(payload[:8])
                img = (
                    decode_image(payload, _PNG_MAX_PIXELS_UNTRUSTED)
                    if head[:2] in (b"BM", b"P6") or head == _PNG_SIG
                    else None
                )
                if img is not None:
                    feats.append(image_features(img, dim))
                    backends.append("stdlib")
                    continue
                backends.append(fallback)
                if len(arr) == 0:
                    feats.append([0.0] * dim)
                    continue
                pads = (-len(arr)) % dim
                a = np.pad(arr, (0, pads)).reshape(-1, dim).astype("float64")
                feats.append((a.mean(axis=0) / 255.0).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "backend": backends,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video rows — pure Spark plumbing: explode the
    sampled frame-index sequence from metadata (a real implementation swaps
    the payload slice in; the row multiplication pattern is the same)."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )


# ---------------------------------------------------------------------------
# Audio tier (round 5b): real stdlib WAV codec — encode AND strict decode
# ---------------------------------------------------------------------------

WAV_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("energy", LongType()),
        StructField("backend", StringType()),
    ]
)


def _wav_samples(media_id: int, n: int):
    """The deterministic PCM16 test signal for one media row: the exact
    formula is mirrored literally in the DuckDB oracle SQL, so the
    encode→parse round trip is what the hash gate actually proves."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return (
        ((media_id * 31 + i * 17) * 2654435761) % 65536 - 32768
    ).astype(np.int16)


def synthesize_wav(docs: DataFrame) -> DataFrame:
    """Deterministic RIFF/WAVE (PCM, 16-bit, mono, 16 kHz) payloads for the
    audio-kind rows (doc_id % 3 == 1, matching ``synthesize_media``'s kind
    cycle): a REAL byte-valid WAV container around the deterministic
    signal, built Arrow-batched on the executors — the ingest half of the
    audio codec tier."""
    audio = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("media_id"),
        (64 + F.col("doc_id") % 64).cast("int").alias("n_samples"),
    )

    def fn(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid, n in zip(pdf["media_id"], pdf["n_samples"]):
                pcm = _wav_samples(int(mid), int(n)).tobytes()
                payloads.append(
                    b"RIFF"
                    + struct.pack("<I", 36 + len(pcm))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(pcm))
                    + pcm
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["audio"] * len(payloads),
                    "payload": payloads,
                }
            )

    return audio.mapInPandas(
        fn, schema="media_id bigint, kind string, payload binary"
    )


def decode_wav(payload: bytes):
    """REAL stdlib-only WAV decode: RIFF/WAVE container walk, PCM
    (format 1), 16-bit mono. Strict — magic, declared RIFF size, fmt
    fields, and data-chunk length must all agree with the byte count, so
    arbitrary payloads never false-positive (same contract as
    ``decode_image``). Returns np.int16 samples or None."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 44:
        return None
    head = bytes(payload[:12])  # tiny copy so memoryview inputs compare
    if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size != len(payload) - 8:
        return None
    pos, fmt_ok, data = 12, False, None
    while pos + 8 <= len(payload):
        cid = bytes(payload[pos : pos + 4])
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            return None
        if cid == b"fmt " and csize >= 16:
            afmt, nch, _sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt_ok = afmt == 1 and nch == 1 and bits == 16
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # RIFF chunks are word-aligned
    if not fmt_ok or data is None or len(data) % 2:
        return None
    return np.frombuffer(data, dtype="<i2")


def wav_media_stats_arrow(media: DataFrame) -> DataFrame:
    """Per-media WAV stats over the ZERO-COPY Arrow path: ``mapInArrow``
    hands the executor raw ``pyarrow.RecordBatch``es, so the binary
    payload column is read straight out of the Arrow buffer with no
    pandas Series materialization — the preferred batch shape for opaque
    media columns, where pandas conversion would copy every payload
    once per pass for no benefit. Same strict stdlib ``decode_wav`` as
    the mapInPandas tier; emits exact int64 Σs² energy plus the sum of
    the raw little-endian PCM payload BYTES, so the hash gate proves
    byte-level container parsing, not just sample-level decoding.
    Invalid payloads are dropped (quarantine-sink class). Map-only: at
    100 TB payloads never leave their partition."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            mid_col = batch.column(batch.schema.get_field_index("media_id"))
            pay_col = batch.column(batch.schema.get_field_index("payload"))
            # true zero-copy: slice each payload as a memoryview over the
            # Arrow data buffer via the offsets vector — no .as_py()
            # bytes materialization, no pandas Series. decode_wav is
            # buffer-protocol clean (struct.unpack_from + np.frombuffer),
            # so the only copies are the int64 upcasts the math needs.
            off_np = (
                np.int64
                if pa.types.is_large_binary(pay_col.type)
                else np.int32
            )
            bufs = pay_col.buffers()
            offsets = np.frombuffer(bufs[1], dtype=off_np)[
                pay_col.offset : pay_col.offset + len(pay_col) + 1
            ]
            data = memoryview(bufs[2]) if bufs[2] is not None else None
            ids = mid_col.to_numpy(zero_copy_only=False)
            valid = pay_col.is_valid().to_numpy(zero_copy_only=False)
            mids, ns, eng, bsum = [], [], [], []
            for j in range(batch.num_rows):
                if data is None or not valid[j]:
                    continue  # NULL payload -> quarantine (dropped)
                s = decode_wav(data[offsets[j] : offsets[j + 1]])
                if s is None:
                    continue
                u = s.astype(np.int64)
                raw = s.view(np.uint8).astype(np.int64)
                mids.append(int(ids[j]))
                ns.append(len(s))
                eng.append(int((u * u).sum()))
                bsum.append(int(raw.sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(mids, pa.int64()),
                    pa.array(ns, pa.int32()),
                    pa.array(eng, pa.int64()),
                    pa.array(bsum, pa.int64()),
                    pa.array(["arrow"] * len(mids), pa.string()),
                ],
                names=[
                    "media_id",
                    "n_samples",
                    "energy",
                    "byte_sum",
                    "backend",
                ],
            )

    return media.mapInArrow(
        fn,
        schema="media_id bigint, n_samples int, energy bigint,"
        " byte_sum bigint, backend string",
    )


def wav_frame_energy(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Frame-level energy extraction over WAV payloads — the audio
    analogue of ``extract_features``: Arrow-batched ``mapInPandas``, one
    strict stdlib decode per row, per-frame Σs² as exact int64 (16-bit
    samples keep any realistic frame far inside the budget). Rows whose
    payload is not a byte-valid PCM16 mono WAV are dropped (a production
    pipeline would route them to a quarantine sink)."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mids, fidx, cnts, eng = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s = (
                    decode_wav(bytes(payload))
                    if payload is not None
                    else None
                )
                if s is None:
                    continue
                sq = s.astype(np.int64) ** 2
                for f in range(0, len(s), frame_len):
                    chunk = sq[f : f + frame_len]
                    mids.append(mid)
                    fidx.append(f // frame_len)
                    cnts.append(len(chunk))
                    eng.append(int(chunk.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n_samples": pd.Series(cnts, dtype="int32"),
                    "energy": pd.Series(eng, dtype="int64"),
                    "backend": pd.Series(
                        ["stdlib"] * len(mids), dtype="object"
                    ),
                }
            )

    return media.mapInPandas(fn, schema=WAV_ENERGY_SCHEMA)


# ---------------------------------------------------------------------------
# Video tier (round 6): real frame container around the real PNG codec —
# the frame-sample operation of the multimodal design, now with an actual
# decode step instead of the deterministic fake
# ---------------------------------------------------------------------------

#: magic of the fixture video container: ``VID1`` + ``<IHH`` header
#: (n_frames, width, height), then per frame ``<I`` byte length + a full
#: PNG file. Simple by construction, but every parse step is strict and
#: every frame decode is the REAL stdlib PNG path (CRC-verified chunks,
#: inflate, unfilter) — the same contract as the WAV tier: the oracle
#: knows only the pixel FORMULA, so a hash match proves the whole
#: encode -> container -> parse -> PNG-decode pipeline byte-correct.
VIDEO_MAGIC = b"VID1"

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("backend", StringType()),
    ]
)


def _video_frame(media_id: int, f: int, w: int, h: int):
    """The deterministic RGB test frame for (media row, frame index): the
    exact formula is mirrored literally in the DuckDB oracle SQL
    (queries.py:media_video_frame_stats), so the codec round trip is what
    the hash gate actually proves."""
    import numpy as np

    y = np.arange(h, dtype=np.int64).reshape(h, 1, 1)
    x = np.arange(w, dtype=np.int64).reshape(1, w, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, 3)
    return (
        (media_id * 31 + f * 29 + y * 17 + x * 13 + c * 7) % 256
    ).astype(np.uint8)


def encode_video(media_id: int, n_frames: int, w: int, h: int) -> bytes:
    """Build one container: header + length-prefixed REAL PNG frames
    (``encode_png`` — spec-valid files any external viewer opens)."""
    import struct

    frames = []
    for f in range(n_frames):
        png = encode_png(_video_frame(media_id, f, w, h))
        frames.append(struct.pack("<I", len(png)) + png)
    return VIDEO_MAGIC + struct.pack("<IHH", n_frames, w, h) + b"".join(frames)


def synthesize_video(docs: DataFrame) -> DataFrame:
    """Deterministic video containers for the video-kind rows
    (doc_id % 3 == 2, matching ``synthesize_media``'s kind cycle), built
    Arrow-batched on the executors — the ingest half of the video tier.
    Frame counts and dimensions vary per row (4-8 frames, 8-12 x 6-8 px)
    so the sampler sees ragged containers, not one fixed shape."""
    vids = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 5).cast("int").alias("n_frames"),
        (8 + F.col("doc_id") % 5).cast("int").alias("w"),
        (6 + F.col("doc_id") % 3).cast("int").alias("h"),
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_video(int(m), int(n), int(w), int(h))
                for m, n, w, h in zip(
                    pdf["media_id"], pdf["n_frames"], pdf["w"], pdf["h"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["video"] * len(payloads),
                    "payload": payloads,
                }
            )

    return vids.mapInPandas(
        fn, schema="media_id bigint, kind string, payload binary"
    )


def decode_video(payload: bytes, max_pixels: int = _PNG_MAX_PIXELS):
    """STRICT container walk: magic, header, every frame's length prefix
    in bounds, every frame a byte-valid PNG of exactly the declared
    (h, w, 3) shape, and the last frame must end at the container's last
    byte. Returns [(frame_idx, rgb array), ...] or None — arbitrary
    payloads never false-positive (same contract as decode_image /
    decode_wav). ``max_pixels`` flows through to each frame's PNG
    decode (untrusted paths pass _PNG_MAX_PIXELS_UNTRUSTED)."""
    import struct

    if payload is None or len(payload) < 12:
        return None
    if bytes(payload[:4]) != VIDEO_MAGIC:
        return None
    n_frames, w, h = struct.unpack_from("<IHH", payload, 4)
    if n_frames == 0 or w == 0 or h == 0:
        return None
    pos, out = 12, []
    for f in range(n_frames):
        if pos + 4 > len(payload):
            return None
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + ln > len(payload):
            return None
        img = decode_image(payload[pos : pos + ln], max_pixels)
        if img is None or img.shape != (h, w, 3):
            return None
        out.append((f, img))
        pos += ln
    if pos != len(payload):
        return None  # trailing junk after the declared last frame
    return out


def video_sampled_frame_stats(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling over video payloads — the video analogue of
    ``wav_frame_energy``: Arrow-batched ``mapInPandas``, one strict
    container parse + real PNG decode per row, keep every ``every``-th
    frame, emit exact int64 pixel sums. Rows whose payload is not a
    byte-valid container are dropped (quarantine-sink class). Map-only:
    at 100 TB payloads never leave their partition, and sampling cuts
    the decoded volume by the sampling factor BEFORE anything shuffles."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mids, fidx, nf, ws, hs, ps = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_video(
                    bytes(payload) if payload is not None else None,
                    _PNG_MAX_PIXELS_UNTRUSTED,
                )
                if frames is None:
                    continue
                for f, img in frames:
                    if f % every:
                        continue
                    mids.append(mid)
                    fidx.append(f)
                    nf.append(len(frames))
                    hs.append(img.shape[0])
                    ws.append(img.shape[1])
                    ps.append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n_frames": pd.Series(nf, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sum": pd.Series(ps, dtype="int64"),
                    "backend": pd.Series(
                        ["stdlib"] * len(mids), dtype="object"
                    ),
                }
            )

    return media.mapInPandas(fn, schema=VIDEO_FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("backend", StringType()),
    ]
)


def _image_pixels(media_id: int, w: int, h: int):
    """Deterministic RGB test image for one media row (the image-kind
    analogue of ``_video_frame``): the formula is mirrored literally in
    the DuckDB oracle SQL, so the encode -> PNG-decode -> resize chain is
    what the hash gate proves."""
    import numpy as np

    y = np.arange(h, dtype=np.int64).reshape(h, 1, 1)
    x = np.arange(w, dtype=np.int64).reshape(1, w, 1)
    c = np.arange(3, dtype=np.int64).reshape(1, 1, 3)
    return ((media_id * 37 + y * 19 + x * 11 + c * 5) % 256).astype(
        np.uint8
    )


def synthesize_png_images(docs: DataFrame) -> DataFrame:
    """Deterministic REAL PNG payloads for the image-kind rows
    (doc_id % 3 == 0, matching ``synthesize_media``'s kind cycle),
    built Arrow-batched on the executors; dimensions vary per row
    (9-16 x 7-12 px) so the resizer sees ragged inputs."""
    imgs = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"),
        (9 + F.col("doc_id") % 8).cast("int").alias("w"),
        (7 + F.col("doc_id") % 6).cast("int").alias("h"),
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_png(_image_pixels(int(m), int(w), int(h)))
                for m, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    return imgs.mapInPandas(
        fn, schema="media_id bigint, kind string, payload binary"
    )


def resize_nearest(img, dst_w: int, dst_h: int):
    """Nearest-neighbor resize with PURE INTEGER index mapping:
    out[y, x] = in[y * src_h // dst_h, x * src_w // dst_w] — the exact
    floor-div convention the oracle mirrors, so resized pixels are
    bit-identical across engines (no float scale factors, no rounding
    mode to disagree on)."""
    import numpy as np

    src_h, src_w = img.shape[0], img.shape[1]
    ys = (np.arange(dst_h, dtype=np.int64) * src_h) // dst_h
    xs = (np.arange(dst_w, dtype=np.int64) * src_w) // dst_w
    return img[ys][:, xs]


def resize_image_stats(
    media: DataFrame, dst_w: int = 8, dst_h: int = 8
) -> DataFrame:
    """The RESIZE leg of the multimodal design (decode / feature-extract /
    resize / frame-sample): Arrow-batched ``mapInPandas``, one strict
    stdlib decode per row (``decode_image`` — real PNG/BMP/PPM), then a
    nearest-neighbor integer resize to (dst_w, dst_h) and an exact int64
    pixel sum of the RESIZED image. Rows whose payload is not a
    byte-valid image are dropped (quarantine-sink class). Map-only:
    payloads never leave their partition, and the resize bounds the
    downstream feature volume to dst_w*dst_h*3 bytes per row whatever
    the source dimensions — the normalization step every image training
    pipeline runs before batching."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            mids, sws, shs, ps = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = (
                    decode_image(bytes(payload), _PNG_MAX_PIXELS_UNTRUSTED)
                    if payload is not None
                    else None
                )
                if img is None:
                    continue
                small = resize_nearest(img, dst_w, dst_h)
                mids.append(mid)
                shs.append(img.shape[0])
                sws.append(img.shape[1])
                ps.append(int(small.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "src_w": pd.Series(sws, dtype="int32"),
                    "src_h": pd.Series(shs, dtype="int32"),
                    "dst_w": pd.Series([dst_w] * len(mids), dtype="int32"),
                    "dst_h": pd.Series([dst_h] * len(mids), dtype="int32"),
                    "pixel_sum": pd.Series(ps, dtype="int64"),
                    "backend": pd.Series(
                        ["stdlib"] * len(mids), dtype="object"
                    ),
                }
            )

    return media.mapInPandas(fn, schema=RESIZE_SCHEMA)
