"""Multimodal column plumbing: binary payloads + typed metadata + batched
Python feature extraction.

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages. Two decode
backends exist:

- :func:`decode_image_features` — REAL pure-Python codecs: binary PPM
  and uncompressed 24-bit BMP (header + pixel parsing), and GIF87a/89a
  including full LZW decompression (:func:`_lzw_decode` — variable-width
  codes, clear/EOI, the KwKwK case; round-trip-pinned against an
  independent encoder). Malformed payloads quarantine via a status
  column.
- :func:`decode_features` — a clearly-marked deterministic fake standing
  in for the formats that genuinely need libraries this container lacks
  (JPEG/PNG entropy coding, audio/video). Every Spark-side piece around
  it is real and tested: the schema contract, the batch iterator shape,
  partition sizing, and the pandas-UDF signature; swapping
  ``_fake_decode`` for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` moderate and repartition before the
Python stage so each Arrow batch holds bounded bytes, not bounded rows of
unbounded size. Metadata-only predicates (format, size bands) stay
JVM-side and prune before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbench_agentic_data_pipeline_spark.catalog import load_table
from tbench_agentic_data_pipeline_spark.registry import query

if TYPE_CHECKING:
    import pandas as pd

# Feature schema produced by the decode stage — the stable contract between
# the Python backend and everything downstream.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("fake_duration_ms", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: the document text bytes stand in for an
    encoded media payload, with a typed metadata struct alongside."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        (F.col("doc_id") % 3 == 0).alias("keyframe_hint"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("media_meta"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder — deterministic arithmetic on the payload in place of a
    real media decode. A real deployment replaces this one function with
    PIL / torchaudio / pyav; everything around it is production-shaped.
    Raises nothing: decode failures in production should be caught and
    surfaced as a status column, never crash the stage."""
    n = len(payload)
    return n, n % 640, (n // 640) % 480, n * 10


def decode_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """The batched Python stage: Arrow-fed pandas batches in, feature
    frame out. ``partitions`` bounds per-task payload volume (repartition
    BEFORE the Python boundary, so executors stream bounded batches)."""
    if partitions is not None:
        media = media.repartition(partitions)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": [d[0] for d in decoded],
                    "fake_width": [d[1] for d in decoded],
                    "fake_height": [d[2] for d in decoded],
                    "fake_duration_ms": [d[3] for d in decoded],
                    "decoder": "fake-v0",
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real image decode: pure-Python PPM (P6) and BMP (24-bit) parsers
# ---------------------------------------------------------------------------
# The container has no imaging libraries, but these two formats need none:
# both are header + raw pixel bytes. This backend parses ACTUAL image
# bytes — width/height from the header, per-channel means from the pixel
# array — so the decode stage validates real byte layouts, not arithmetic
# stand-ins. Compressed formats (JPEG/PNG) remain the declared stub
# territory; a real deployment swaps _decode_image's dispatch for PIL.

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("status", T.StringType()),
    ]
)


def _ppm_raster(buf: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) down to (width, height, raw RGB raster):
    ASCII header ``P6 <w> <h> <maxval>`` (whitespace-separated, ``#``
    comments allowed) then one raw RGB triplet per pixel, row-major
    top-down. Shared by the feature extractor and the resize backend."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates header from raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    px = buf[pos : pos + n]
    if len(px) != n:
        raise ValueError(f"truncated raster: {len(px)} of {n} bytes")
    return w, h, px


def _encode_ppm(w: int, h: int, px: bytes) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + px


def _parse_ppm(buf: bytes) -> tuple[str, int, int, float, float, float]:
    """PPM feature extraction: dims + per-channel means."""
    w, h, px = _ppm_raster(buf)
    if w * h == 0:
        return "ppm", w, h, 0.0, 0.0, 0.0
    sums = [0, 0, 0]
    for c in range(3):
        sums[c] = sum(px[c::3])
    return "ppm", w, h, *(s / (w * h) for s in sums)


def _parse_bmp(buf: bytes) -> tuple[str, int, int, float, float, float]:
    """Uncompressed 24-bit BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER
    (40 B); BGR pixel rows bottom-up, each padded to a 4-byte boundary.
    Negative biHeight means top-down — means are row-order-invariant so
    both orientations share this path."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} "
            f"compression={compression})"
        )
    abs_h = abs(h)
    stride = ((w * 3) + 3) & ~3
    need = stride * abs_h
    raster = buf[data_off : data_off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: {len(raster)} of {need} bytes")
    if w * abs_h == 0:
        return "bmp", w, abs_h, 0.0, 0.0, 0.0
    sums = [0, 0, 0]  # accumulate as B,G,R then swap on return
    for row in range(abs_h):
        line = raster[row * stride : row * stride + w * 3]
        for c in range(3):
            sums[c] += sum(line[c::3])
    n = w * abs_h
    return "bmp", w, abs_h, sums[2] / n, sums[1] / n, sums[0] / n


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-variant LZW decompression: variable code width starting at
    ``min_code_size + 1`` (max 12 bits), codes packed LSB-first, CLEAR
    resets the table, END terminates. Pure Python — the point is a REAL
    compressed-format decode path with zero dependencies; throughput for
    production GIFs would come from PIL, but the logic here is complete
    and spec-correct (pinned by round-trip against an independent
    encoder)."""
    clear = 1 << min_code_size
    end = clear + 1
    bitpos = 0
    nbits = len(data) * 8

    def read_code(size: int) -> int | None:
        nonlocal bitpos
        if bitpos + size > nbits:
            return None
        v = 0
        for i in range(size):
            v |= ((data[bitpos >> 3] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        return v

    out = bytearray()
    # The initial table exists BEFORE any code is read: the spec only
    # recommends (not requires) a leading CLEAR, so streams that start
    # with a literal root code must decode.
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    code_size = min_code_size + 1
    next_code = end + 1
    prev: bytes | None = None
    while len(out) < expected:
        code = read_code(code_size)
        if code is None:
            break
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError(f"LZW stream starts with unknown code {code}")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW code {code}")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError(f"LZW underrun: {len(out)} of {expected} pixels")
    return bytes(out[:expected])


def _gif_frames(buf: bytes):
    """Iterate a GIF87a/89a's image blocks, yielding (w, h, rgb_raster)
    per frame — each frame decoded as its OWN raster (no inter-frame
    compositing of disposal methods/offsets; honest scope for feature
    extraction and frame sampling, documented). Extensions are skipped
    block-correctly; interlaced frames are rejected."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = buf[10]
    pos = 13
    gct = None
    if packed >> 7:
        n = 2 ** ((packed & 7) + 1)
        gct = buf[pos : pos + 3 * n]
        pos += 3 * n
    seen = False
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x21:  # extension: label byte then sub-blocks
            pos += 2
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            w = int.from_bytes(buf[pos + 5 : pos + 7], "little")
            h = int.from_bytes(buf[pos + 7 : pos + 9], "little")
            ipacked = buf[pos + 9]
            pos += 10
            table = gct
            if ipacked >> 7:  # local color table wins
                n = 2 ** ((ipacked & 7) + 1)
                table = buf[pos : pos + 3 * n]
                pos += 3 * n
            if (ipacked >> 6) & 1:
                raise ValueError("interlaced GIF unsupported")
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = buf[pos]
            pos += 1
            data = bytearray()
            while pos < len(buf) and buf[pos] != 0:
                n = buf[pos]
                data += buf[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1  # block terminator
            idx = _lzw_decode(bytes(data), min_code, w * h)
            n_colors = len(table) // 3
            rgb = bytearray(w * h * 3)
            for j, i in enumerate(idx):
                if i >= n_colors:
                    # a short table[o:o+3] slice would silently SHRINK
                    # the raster and misalign every later pixel — this
                    # is corrupt data, not a decodable image
                    raise ValueError(
                        f"pixel index {i} outside {n_colors}-color table"
                    )
                o = 3 * i
                rgb[3 * j : 3 * j + 3] = table[o : o + 3]
            seen = True
            yield w, h, bytes(rgb)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    if not seen:
        raise ValueError("no image data in GIF")


def _parse_gif(buf: bytes) -> tuple[str, int, int, float, float, float]:
    """GIF feature extraction: dims + channel means of the FIRST frame
    (animations: frame 0)."""
    w, h, rgb = next(iter(_gif_frames(buf)))
    if w * h == 0:
        return "gif", w, h, 0.0, 0.0, 0.0
    n_px = w * h
    return (
        "gif", w, h,
        sum(rgb[0::3]) / n_px, sum(rgb[1::3]) / n_px, sum(rgb[2::3]) / n_px,
    )


def _decode_image(payload: bytes) -> dict:
    """Dispatch on magic bytes; failures become a status value, never an
    exception — a 100 TB scan must quarantine bad payloads, not die on
    row 10^11."""
    try:
        p = bytes(payload)
        if p[:2] == b"P6":
            fmt, w, h, r, g, b = _parse_ppm(p)
        elif p[:2] == b"BM":
            fmt, w, h, r, g, b = _parse_bmp(p)
        elif p[:4] == b"GIF8":
            fmt, w, h, r, g, b = _parse_gif(p)
        else:
            return {
                "format": "unknown", "width": 0, "height": 0,
                "mean_r": 0.0, "mean_g": 0.0, "mean_b": 0.0,
                "status": "error:unrecognized magic bytes",
            }
        return {
            "format": fmt, "width": w, "height": h,
            "mean_r": r, "mean_g": g, "mean_b": b, "status": "ok",
        }
    except Exception as e:  # noqa: BLE001 — status column, not a crash
        return {
            "format": "unknown", "width": 0, "height": 0,
            "mean_r": 0.0, "mean_g": 0.0, "mean_b": 0.0,
            "status": f"error:{e}",
        }


def decode_image_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Real-codec twin of :func:`decode_features`: same Arrow-batched
    ``mapInPandas`` plumbing (bounded batches, metadata predicates prune
    JVM-side first), with header+pixel parsing of actual PPM/BMP bytes in
    place of the arithmetic stub."""
    if partitions is not None:
        media = media.repartition(partitions)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = [_decode_image(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows)
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64").to_numpy())
            yield out

    return media.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


@query(
    "mm_image_codec",
    survey="X4,X5,S4",
    oracle="""
        WITH raster AS (
            -- pad to exactly 48 bytes: documents shorter than one 4x4
            -- raster exist at sf0.1 (7 of 5000)
            SELECT doc_id, rpad(substr(text, 1, 48), 48, ' ') AS bytes
            FROM documents
        ),
        px AS (
            SELECT d.doc_id,
                   ord(substr(d.bytes, CAST(1 + 3 * t.i AS INT), 1)) AS r,
                   ord(substr(d.bytes, CAST(2 + 3 * t.i AS INT), 1)) AS g,
                   ord(substr(d.bytes, CAST(3 + 3 * t.i AS INT), 1)) AS b
            FROM raster d
            CROSS JOIN range(16) AS t(i)
        )
        SELECT doc_id,
               'ppm'                 AS format,
               CAST(4 AS BIGINT)     AS width,
               CAST(4 AS BIGINT)     AS height,
               ROUND(AVG(r) * (1 + 5e-13), 4) AS mean_r,
               ROUND(AVG(g) * (1 + 5e-13), 4) AS mean_g,
               ROUND(AVG(b) * (1 + 5e-13), 4) AS mean_b,
               'ok'                  AS status
        FROM px
        GROUP BY doc_id
    """,
)
def mm_image_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec decode end-to-end: encode each document's first 48
    bytes (space-padded — sub-48-char docs exist at sf0.1) as a genuine
    binary-PPM payload (header + raw RGB raster,
    4×4) JVM-side, then run the actual PPM parser through the Arrow
    ``mapInPandas`` decode stage. The oracle recomputes width/height and
    per-channel byte means from the SAME text bytes with SQL string ops
    (ASCII corpus: chars == bytes), so a green row proves the Python
    stage parsed real encoded bytes — header offsets, channel
    interleave, raster length — not stand-in arithmetic. Reference
    parity: SURVEY §2.9 X4/X5 external-action shape with the side-effect
    replaced by a pure codec."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit(b"P6\n4 4\n255\n"),
        F.encode(F.rpad(F.substring("text", 1, 48), 48, " "), "UTF-8"),
    )
    media = docs.select("doc_id", payload.alias("payload"))
    feats = decode_image_features(media)
    return feats.select(
        "doc_id",
        "format",
        "width",
        "height",
        F.round(F.col("mean_r") * (1 + F.lit(5e-13)), 4).alias("mean_r"),
        F.round(F.col("mean_g") * (1 + F.lit(5e-13)), 4).alias("mean_g"),
        F.round(F.col("mean_b") * (1 + F.lit(5e-13)), 4).alias("mean_b"),
        "status",
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _resize_ppm(buf: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of a binary PPM, re-encoded as P6.
    Source pixel for output (x, y) is (⌊x·w/out_w⌋, ⌊y·h/out_h⌋) — the
    standard NN mapping, exact for integer up/down factors."""
    w, h, px = _ppm_raster(buf)
    if w == 0 or h == 0:
        raise ValueError("cannot resize an empty image")
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = (y * h) // out_h
        row = sy * w * 3
        o = y * out_w * 3
        for x in range(out_w):
            sx = (x * w) // out_w
            s = row + sx * 3
            out[o : o + 3] = px[s : s + 3]
            o += 3
    return _encode_ppm(out_w, out_h, bytes(out))


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("bits", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def _parse_wav(buf: bytes) -> dict:
    """RIFF/WAVE with PCM samples (format 1, 8 or 16 bit): chunk-walk to
    ``fmt `` and ``data``, then compute frame count, duration and RMS
    amplitude (integer thousandths of full scale — engine-stable, no
    float repr in the contract). Chunks are skipped block-correctly
    (word-aligned), so LIST/INFO metadata doesn't confuse the parse."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {cid!r}: {len(body)} of {size}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
    bytes_per_frame = channels * bits // 8
    if bytes_per_frame == 0 or len(data) % bytes_per_frame:
        raise ValueError("data chunk not frame-aligned")
    n_frames = len(data) // bytes_per_frame
    # RMS over all samples; 8-bit PCM is unsigned midpoint-128, 16-bit
    # signed little-endian. Integer accumulation → exact.
    acc = 0
    n_samples = n_frames * channels
    if bits == 8:
        for b in data:
            v = b - 128
            acc += v * v
        full = 127.0
    else:
        import array

        samples = array.array("h")
        samples.frombytes(data)
        if __import__("sys").byteorder == "big":  # pragma: no cover
            samples.byteswap()
        for v in samples:
            acc += v * v
        full = 32767.0
    rms_milli = (
        0 if n_samples == 0 else int(round((acc / n_samples) ** 0.5 / full * 1000))
    )
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1000) // rate if rate else 0,
        "rms_milli": rms_milli,
    }


def decode_audio_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Audio twin of :func:`decode_image_features`: real RIFF/PCM WAV
    parsing through the same Arrow ``mapInPandas`` plumbing, failures
    quarantined via status."""
    if partitions is not None:
        media = media.repartition(partitions)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for p in pdf["payload"]:
                try:
                    d = _parse_wav(bytes(p))
                    d["status"] = "ok"
                except Exception as e:  # noqa: BLE001 — quarantine
                    d = {
                        "sample_rate": 0, "channels": 0, "bits": 0,
                        "n_frames": 0, "duration_ms": 0, "rms_milli": 0,
                        "status": f"error:{e}",
                    }
                rows.append(d)
            out = pd.DataFrame(rows)
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64").to_numpy())
            yield out

    return media.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


RESIZE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize stage for PPM payloads: parse → nearest-neighbor
    resample → re-encode, inside the same Arrow ``mapInPandas`` plumbing
    as the stub (which remains the backend for formats needing PIL/cv2).
    Failures quarantine via the status column with the original payload
    passed through untouched — downstream can route them to a
    reprocessing queue instead of losing the row."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "payload": [], "out_width": [],
                   "out_height": [], "status": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    # bytes() INSIDE the try: a NULL payload must
                    # quarantine like any other bad row, not kill the job
                    p = bytes(payload)
                    resized = _resize_ppm(p, width, height)
                    ow, oh, status = width, height, "ok"
                except Exception as e:  # noqa: BLE001 — quarantine row
                    p = b"" if payload is None else bytes(payload)
                    resized, ow, oh = p, 0, 0
                    status = f"error:{e}"
                out["doc_id"].append(int(doc_id))
                out["payload"].append(resized)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["status"].append(status)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, RESIZE_IMAGE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage (STUB backend): real deployments call PIL/cv2 here;
    the stub truncates/pads the payload to width*height bytes so output
    size invariants are testable. Batch shape, schema contract and
    metadata pass-through are the production-shaped parts."""
    target = width * height

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            resized = [
                bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": resized,
                    "out_width": width,
                    "out_height": height,
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),  # re-encoded as P6 PPM
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def frame_sample_gif(media: DataFrame, stride: int = 1) -> DataFrame:
    """REAL frame sampling for animated GIFs: decode every ``stride``-th
    frame (full LZW per frame) and emit it re-encoded as a binary PPM —
    the 1→N explode shape of video keyframe sampling with an actual
    decoder behind it. Payloads that fail to parse yield ONE quarantine
    row (frame_idx -1, original payload) so failures stay visible
    downstream. Frames are decoded as independent rasters — no
    inter-frame compositing (disposal/offsets), which is the documented
    scope; pyav/ffmpeg replace this one stage for real video
    containers."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame": [],
                   "width": [], "height": [], "status": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = b"" if payload is None else bytes(payload)
                try:
                    for i, (w, h, rgb) in enumerate(_gif_frames(p)):
                        if i % stride:
                            continue
                        out["doc_id"].append(int(doc_id))
                        out["frame_idx"].append(i)
                        out["frame"].append(_encode_ppm(w, h, rgb))
                        out["width"].append(w)
                        out["height"].append(h)
                        out["status"].append("ok")
                except Exception as e:  # noqa: BLE001 — quarantine row
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(-1)
                    out["frame"].append(p)
                    out["width"].append(0)
                    out["height"].append(0)
                    out["status"].append(f"error:{e}")
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, GIF_FRAME_SCHEMA)


def frame_sample_stub(media: DataFrame, stride: int, frame_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage (STUB backend): emit every ``stride``-th
    ``frame_bytes`` window of the payload as one frame row — the 1→N
    explode shape of real video sampling (pyav keyframe iteration), with
    deterministic fake frames. Row count = ceil(len/ (stride*frame_bytes))."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                for i, off in enumerate(range(0, len(p), stride * frame_bytes)):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame"].append(p[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


@query(
    "mm_decode_features",
    survey="X4,X5,S4",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT)              AS byte_len,
               CAST(strlen(text) % 640 AS BIGINT)        AS fake_width,
               CAST((strlen(text) // 640) % 480 AS BIGINT) AS fake_height,
               CAST(strlen(text) * 10 AS BIGINT)         AS fake_duration_ms,
               'fake-v0'                                  AS decoder
        FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline end-to-end: text→binary payload + typed
    metadata, then the Arrow-batched ``mapInPandas`` decode stage. The
    oracle reproduces the fake decoder's arithmetic from ``strlen(text)``
    (ASCII corpus: chars == bytes), proving the Python stage computes on
    the actual payload bytes — the external-action pattern of SURVEY.md
    §2.9 X4/X5 with the side-effect swapped for a pure stub."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return decode_features(media)
