"""Media operators: decode, byte-level feature extraction, frame
sampling — Arrow-batched pandas over mapInPandas.

Every function here keeps the 100 TB contract: content bytes cross the
Arrow boundary once per partition batch, Python handles whole columns
(numpy over concatenated buffers), and outputs are narrow typed rows —
no per-row UDF calls, no driver collection.

Pixel decode dispatches through multimodal/codecs.py: PPM/PGM/BMP,
PNG (stdlib-zlib DEFLATE + the five scanline unfilters), GIF
(variable-width LZW + interlace unweave) and baseline JPEG (Huffman +
matrix IDCT) decode in pure Python — the strict path is fully
executable and oracle-tested on generated fixtures; the variants the
native codecs gate (arithmetic/12-bit JPEG, lossy-VP8 WebP) route
through PIL when present and otherwise raise the honest
NotImplementedError this container has always raised.
The codecs module registers itself for cloudpickle BY-VALUE shipping,
so the closures below may call it on bare-session workers.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_orders_spark.multimodal.codecs import decode_image as _decode_image
from etl_orders_spark.multimodal.codecs import resize_nearest as _resize_nearest
from etl_orders_spark.multimodal.codecs import sniff_format as _sniff_format

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


MEDIA_STATS_SCHEMA = (
    "media_id long, kind string, n_bytes long, mean_byte double, byte_entropy double"
)


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction per media row: size, mean byte
    value, Shannon entropy of the byte histogram. Deterministic and
    codec-free — the feature-store stage of a media pipeline."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                arr = np.frombuffer(content, dtype=np.uint8)
                if arr.size == 0:
                    out.append((mid, kind, 0, 0.0, 0.0))
                    continue
                hist = np.bincount(arr, minlength=256).astype(np.float64)
                p = hist[hist > 0] / arr.size
                entropy = float(-(p * np.log2(p)).sum())
                out.append((mid, kind, int(arr.size), float(arr.mean()), entropy))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "mean_byte", "byte_entropy"]
            )

    return media.select("media_id", "kind", "content").mapInPandas(batches, MEDIA_STATS_SCHEMA)


def media_fingerprints(media: DataFrame) -> DataFrame:
    """Exact-dup fingerprint over content bytes — pure JVM (md5 on
    binary), no Python at all; the dedup key for media at any scale."""
    return media.select(
        "media_id", "kind", F.md5("content").alias("fp"), F.length("content").alias("n_bytes")
    )


DECODED_SCHEMA = "media_id long, width int, height int, n_pixels long, decoded boolean"


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode stage for image rows. strict=True performs the REAL
    pixel decode (codecs.decode_image): PPM/PGM/BMP decode in pure
    Python and emit their TRUE dimensions (taken from the decoded
    array, authoritative over metadata) with decoded=true; compressed
    formats raise NotImplementedError when no codec library is
    installed (the honest failure in this container) and ValueError
    when the bytes aren't a recognizable image. strict=False emits
    metadata-derived shape rows with decoded=false — keeping
    downstream plumbing exercisable on undecodable payloads."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                if strict:
                    arr = _decode_image(bytes(content))  # by-value pickled module
                    ah, aw = arr.shape[:2]
                    rows.append((mid, aw, ah, aw * ah, True))
                    continue
                w = int(w) if pd.notna(w) else 0
                h = int(h) if pd.notna(h) else 0
                rows.append((mid, w, h, w * h, False))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_pixels", "decoded"]
            )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "content", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return imgs.mapInPandas(batches, DECODED_SCHEMA)


PIXEL_FEATURES_SCHEMA = (
    "media_id long, fmt string, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long, mean_rgb_milli long"
)


def pixel_features(media: DataFrame) -> DataFrame:
    """Feature extraction from REAL decoded pixels: per-channel integer
    sums and a floor-divided milli-mean over all samples — exact
    integer arithmetic end to end, so the output is bit-stable across
    partitionings and carries a DuckDB value-hash oracle on the
    generated fixtures (plans/media_queries.py). Decode + numpy
    channel sums happen per Arrow batch; only the narrow feature row
    crosses back."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                arr = _decode_image(raw)  # by-value pickled module
                h, w = arr.shape[:2]
                s = arr.astype("int64").sum(axis=(0, 1))  # (sum_r, sum_g, sum_b)
                n = w * h
                mean_milli = int(s.sum()) * 1000 // (3 * n)
                rows.append(
                    (mid, _sniff_format(raw), w, h, n, int(s[0]), int(s[1]), int(s[2]), mean_milli)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "fmt", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b", "mean_rgb_milli",
                ],
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(batches, PIXEL_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate long, n_samples long, sum_abs long, "
    "peak long, zero_crossings long"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Feature extraction from REAL decoded PCM audio: per-clip sample
    count, integer sum of absolute amplitudes, peak amplitude, and
    sign-change (zero-crossing) count — all exact integer arithmetic
    over codecs.decode_wav output, so the row is bit-stable and
    carries a DuckDB value-hash oracle on the generated fixtures.
    Crossings are PER CHANNEL: for each channel, count frames t >= 1
    where sign(s[t-1] < 0) differs from sign(s[t] < 0), then sum the
    channels — never across the interleaved stream, where a frame
    boundary between unrelated channels would register phantom
    crossings (ADVICE r4). Amplitude sums/peaks flatten across
    channels (order-free, so interleaving is irrelevant there)."""
    from etl_orders_spark.multimodal.codecs import decode_wav as _decode_wav

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, rate = _decode_wav(bytes(content))  # (n, channels)
                flat = samples.reshape(-1).astype(np.int64)
                neg = samples < 0  # (n, channels)
                zc = (
                    int((neg[1:] != neg[:-1]).sum()) if samples.shape[0] > 1 else 0
                )
                rows.append(
                    (
                        mid,
                        rate,
                        int(flat.size),
                        int(np.abs(flat).sum()),
                        int(np.abs(flat).max()) if flat.size else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples", "sum_abs",
                    "peak", "zero_crossings",
                ],
            )

    clips = media.filter(F.col("kind") == "audio").select("media_id", "content")
    return clips.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


FRAME_STATS_SCHEMA = (
    "media_id long, frame_idx long, n_frames long, width long, height long, "
    "sum_luma long, mean_luma_milli long"
)


def video_frame_stats(media: DataFrame, every_n: int = 2, max_frames: int = 8) -> DataFrame:
    """REAL video frame sampling: decode the uncompressed stream
    (codecs.decode_y4m), keep every ``every_n``-th frame up to
    ``max_frames``, and emit exact integer luma features per sampled
    frame. This is the fan-out stage a 100 TB video pipeline runs
    before any model sees pixels — one input row becomes
    ceil(n_frames / every_n) output rows, streamed through Arrow
    batches, never the driver. Compressed containers raise the honest
    codec gate from decode_y4m."""
    from etl_orders_spark.multimodal.codecs import decode_y4m as _decode_y4m

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, _ = _decode_y4m(bytes(content))
                nf, h, w = frames.shape
                for idx in list(range(0, nf, every_n))[:max_frames]:
                    luma = frames[idx].astype("int64")
                    s = int(luma.sum())
                    rows.append((mid, idx, nf, w, h, s, s * 1000 // (w * h)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "n_frames", "width", "height",
                    "sum_luma", "mean_luma_milli",
                ],
            )

    vids = media.filter(F.col("kind") == "video").select("media_id", "content")
    return vids.mapInPandas(batches, FRAME_STATS_SCHEMA)


DHASH_SCHEMA = "media_id long, dhash_hi long, dhash_lo long"


def dhash_images(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels (the
    classic dHash: gray, resize to 9x8 with the exact floor mapping,
    compare each pixel to its right neighbor -> 64 bits). Robust to
    re-encoding and small perturbations — the media twin of SimHash
    for text. Emitted as two non-negative 32-bit halves in longs
    (rows 0-3 -> dhash_hi, rows 4-7 -> dhash_lo; bit i = y*8 + x) so
    hamming distance is pure JVM arithmetic downstream:
    bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b). Gray =
    (r + g + b) // 3 in exact integers; gray-then-resize equals
    resize-then-gray because nearest-neighbor sampling commutes with
    per-pixel maps — which is what lets the DuckDB oracle re-derive
    every bit from the generator's pixel law."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = _decode_image(bytes(content))
                gray = arr.astype("int64").sum(axis=2) // 3
                g = _resize_nearest(gray, 9, 8)
                bits = (g[:, 1:] > g[:, :-1]).flatten()  # i = y*8 + x
                hi = sum(int(b) << i for i, b in enumerate(bits[:32]))
                lo = sum(int(b) << i for i, b in enumerate(bits[32:]))
                rows.append((mid, hi, lo))
            yield pd.DataFrame(rows, columns=["media_id", "dhash_hi", "dhash_lo"])

    imgs = media.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(batches, DHASH_SCHEMA)


DHASH_STATS_SCHEMA = (
    "media_id long, dhash_hi long, dhash_lo long, "
    "n_pixels long, sum_gray long, sumsq_gray long"
)


def dhash_pixel_stats(media: DataFrame) -> DataFrame:
    """ONE decode pass emitting BOTH the perceptual dHash and the
    exact integer gray-pixel stats (sum, sum of squares) — the fused
    form the media-prep pipeline wants at 100 TB: decode is the
    dominant cost, so every per-image signal (dedup hash, quality
    stats, features) should ride a single Arrow pass. Gray and the
    dHash bits follow dhash_images' exact laws; the variance test
    downstream is all-integer (n*sumsq - sum^2 > 0), so the quality
    gate mirrors into SQL with no FP."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = _decode_image(bytes(content))
                gray = arr.astype("int64").sum(axis=2) // 3
                g = _resize_nearest(gray, 9, 8)
                bits = (g[:, 1:] > g[:, :-1]).flatten()  # i = y*8 + x
                hi = sum(int(b) << i for i, b in enumerate(bits[:32]))
                lo = sum(int(b) << i for i, b in enumerate(bits[32:]))
                rows.append(
                    (mid, hi, lo, int(gray.size), int(gray.sum()),
                     int((gray * gray).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "dhash_hi", "dhash_lo",
                         "n_pixels", "sum_gray", "sumsq_gray"],
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(batches, DHASH_STATS_SCHEMA)


FRAME_DHASH_SCHEMA = "media_id long, frame_idx long, dhash_hi long, dhash_lo long"

FRAME_DHASH_STATS_SCHEMA = (
    "media_id long, frame_idx long, dhash_hi long, dhash_lo long, "
    "n_pixels long, sum_luma long, sumsq_luma long"
)


def video_frame_dhash_stats(
    media: DataFrame, every_n: int = 2, max_frames: int = 8
) -> DataFrame:
    """ONE decode pass emitting BOTH the per-sampled-frame perceptual
    dHash and the exact integer full-resolution luma stats (sum, sum
    of squares) — the video twin of dhash_pixel_stats: decode
    dominates at 100 TB, so the dedup hash and the quality signal must
    ride the same Arrow pass. dHash follows video_frame_dhash's exact
    laws (floor-map 9x8 resize, right-neighbor bits); the stats feed
    the all-integer static-clip gate (min over frames of
    n*sumsq - sum^2 > 0), so the whole quality semantics mirror into
    SQL with no FP."""
    from etl_orders_spark.multimodal.codecs import decode_y4m as _decode_y4m

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, _ = _decode_y4m(bytes(content))
                nf = frames.shape[0]
                for idx in list(range(0, nf, every_n))[:max_frames]:
                    luma = frames[idx].astype("int64")
                    g = _resize_nearest(luma, 9, 8)
                    bits = (g[:, 1:] > g[:, :-1]).flatten()  # i = y*8 + x
                    hi = sum(int(b) << i for i, b in enumerate(bits[:32]))
                    lo = sum(int(b) << i for i, b in enumerate(bits[32:]))
                    rows.append(
                        (mid, idx, hi, lo, int(luma.size), int(luma.sum()),
                         int((luma * luma).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "dhash_hi", "dhash_lo",
                         "n_pixels", "sum_luma", "sumsq_luma"],
            )

    vids = media.filter(F.col("kind") == "video").select("media_id", "content")
    return vids.mapInPandas(batches, FRAME_DHASH_STATS_SCHEMA)


def video_frame_dhash(
    media: DataFrame, every_n: int = 2, max_frames: int = 8
) -> DataFrame:
    """Per-frame perceptual dHash for video rows: decode the
    uncompressed stream (codecs.decode_y4m), keep every ``every_n``-th
    frame up to ``max_frames``, and dHash each sampled LUMA frame with
    exactly the image convention (floor-map resize to 9x8, right-
    neighbor bits, two 32-bit halves in longs; dhash_images). Luma is
    already gray, so the gray step is identity. This is the fan-out
    stage of video near-dup — one row per sampled frame, 2 longs each,
    streamed through Arrow batches; a billion-video corpus's dedup
    state is a few hundred GB spread over the fleet, never pixels."""
    from etl_orders_spark.multimodal.codecs import decode_y4m as _decode_y4m

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, _ = _decode_y4m(bytes(content))
                nf = frames.shape[0]
                for idx in list(range(0, nf, every_n))[:max_frames]:
                    g = _resize_nearest(frames[idx].astype("int64"), 9, 8)
                    bits = (g[:, 1:] > g[:, :-1]).flatten()  # i = y*8 + x
                    hi = sum(int(b) << i for i, b in enumerate(bits[:32]))
                    lo = sum(int(b) << i for i, b in enumerate(bits[32:]))
                    rows.append((mid, idx, hi, lo))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "dhash_hi", "dhash_lo"]
            )

    vids = media.filter(F.col("kind") == "video").select("media_id", "content")
    return vids.mapInPandas(batches, FRAME_DHASH_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms long, frame_bytes binary"


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    timestamp. Without a codec the frame payload is a deterministic
    byte slice keyed by the frame index (clearly fake pixels, real
    fan-out shape: this is the explode that multiplies row counts at
    scale, so it must stream through Arrow batches, never the driver).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content, dur in zip(pdf["media_id"], pdf["content"], pdf["duration_ms"]):
                n = min(int(dur) // every_ms + 1, max_frames) if pd.notna(dur) else 0
                step = max(1, len(content) // max(n, 1))
                for i in range(n):
                    sl = content[i * step : i * step + 16]
                    rows.append((mid, i, i * every_ms, bytes(sl)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms", "frame_bytes"])

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.mapInPandas(batches, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, src_w int, src_h int, out_w int, out_h int, resized boolean, thumb binary"
)


def resize_images(media: DataFrame, max_side: int = 64, strict: bool = False) -> DataFrame:
    """Thumbnail resize for image rows: scale so the longer side equals
    ``max_side`` (never upscale), exact integer aspect-ratio
    arithmetic throughout.

    strict=True is the REAL pipeline: decode (codecs.decode_image —
    pure Python for PPM/PGM/BMP, PIL for compressed formats when
    present, the honest NotImplementedError otherwise), geometry from
    the DECODED dimensions (authoritative over metadata), exact
    floor-mapped nearest-neighbor resample (codecs.resize_nearest),
    thumb = the resized RGB pixels (out_w*out_h*3 bytes),
    resized=true. The whole strict path carries a DuckDB value-hash
    oracle on generated fixtures (plans/media_queries.py).

    strict=False keeps the codec-free plumbing exercisable on
    undecodable payloads: geometry from declared metadata, thumb = a
    deterministic byte subsample of the source content sized to the
    target pixel count (clearly fake pixels, real Arrow batch shape
    and memory profile), resized=false."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def geometry(w: int, h: int) -> tuple[int, int]:
            if max(w, h) <= max_side:
                return w, h
            if w >= h:
                return max_side, max(1, (h * max_side) // w)
            return max(1, (w * max_side) // h), max_side

        for pdf in it:
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                if strict:
                    arr = _decode_image(bytes(content))  # by-value pickled module
                    ah, aw = arr.shape[:2]
                    ow, oh = geometry(aw, ah)
                    thumb = _resize_nearest(arr, ow, oh)
                    rows.append((mid, aw, ah, ow, oh, True, thumb.tobytes()))
                    continue
                # null metadata dims plan as 0x0 (same pd.notna guard
                # as decode_images — int(NaN) would kill the worker)
                w = int(w) if pd.notna(w) else 0
                h = int(h) if pd.notna(h) else 0
                ow, oh = geometry(w, h)
                arr = np.frombuffer(content, dtype=np.uint8)
                n_out = max(1, ow * oh)
                idx = (np.arange(n_out, dtype=np.int64) * max(arr.size, 1)) // n_out
                thumb = arr[np.minimum(idx, max(arr.size - 1, 0))] if arr.size else np.zeros(
                    n_out, dtype=np.uint8
                )
                rows.append((mid, w, h, ow, oh, False, thumb.tobytes()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "src_w", "src_h", "out_w", "out_h", "resized", "thumb"],
            )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id",
        "content",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return imgs.mapInPandas(batches, RESIZED_SCHEMA)

SPECTRAL_SCHEMA = "media_id long, n_fft long, n_frames long, dominant_bin long"


def audio_spectral_features(media: DataFrame, n_fft: int = 256) -> DataFrame:
    """Frequency-domain feature extraction from REAL decoded PCM: frame
    channel 0 into non-overlapping ``n_fft`` windows, rFFT each, sum
    magnitudes across frames, and emit the dominant frequency bin —
    the minimal spectral fingerprint (tuning detection, tone/DTMF
    classification, bandwidth audits) a media pipeline extracts before
    any model sees audio. numpy's pocketfft runs per Arrow batch; only
    integer rows cross back, and the output is an ARGMAX — bit-stable
    across platforms for any input whose spectrum has a separated peak
    (the fixture law plants exact-bin tones, so the DuckDB twin states
    the answer in closed form without computing an FFT). Clips shorter
    than one window emit n_frames = 0 and dominant_bin = -1 rather
    than a worker error."""
    from etl_orders_spark.multimodal.codecs import decode_wav as _decode_wav

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, _ = _decode_wav(bytes(content))  # (n, channels)
                ch0 = samples[:, 0].astype(np.float64)
                n_frames = ch0.size // n_fft
                if n_frames == 0:
                    rows.append((mid, n_fft, 0, -1))
                    continue
                frames = ch0[: n_frames * n_fft].reshape(n_frames, n_fft)
                mag = np.abs(np.fft.rfft(frames, axis=1)).sum(axis=0)
                rows.append((mid, n_fft, n_frames, int(mag.argmax())))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_fft", "n_frames", "dominant_bin"]
            )

    clips = media.filter(F.col("kind") == "audio").select("media_id", "content")
    return clips.mapInPandas(batches, SPECTRAL_SCHEMA)
