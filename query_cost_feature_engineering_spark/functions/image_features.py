"""Per-image featurizers — the engine's analog of the reference's A4 layer.

Semantic graft (SURVEY.md §7.1, citing /root/reference file:line):

- ``with_basics``       ↔ ``get_basics`` (tpch_utils_knob.py:60-61): the
  3-slot numeric prefix [w, h, nbytes] plus the format one-hot
  (↔ ``get_rel_one_hot``, tpch_utils_knob.py:64-67).
- ``with_image_features`` ↔ ``get_rel_attr_one_hot`` masked min/med/max
  statistics (tpch_utils_knob.py:76-86): per-channel min/median/max of the
  *decoded* pixels + an 8-bin grayscale histogram. This is the only Python
  step in the pipeline and runs as one Arrow-batched scalar pandas UDF
  (input_hint: "no per-row Python" — per-element codec work happens inside
  the Arrow batch, the accepted vectorized-UDF pattern).
- ``with_phash_bits``   ↔ ``get_index_one_hot`` identity bits
  (tpch_utils_knob.py:70-73): 64 bit-columns unpacked from the stored
  ``phash`` int64 entirely JVM-side (shiftright/bitand — no UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from query_cost_feature_engineering_spark.codecs import decode_image, to_gray

STAT_COLS = [
    "px_min_r", "px_min_g", "px_min_b",
    "px_med_r", "px_med_g", "px_med_b",
    "px_max_r", "px_max_g", "px_max_b",
]
HIST_BINS = 8
HIST_COLS = [f"hist_{i}" for i in range(HIST_BINS)]
DECODE_COLS = STAT_COLS + HIST_COLS + ["px_mean"]

_DECODE_SCHEMA = T.StructType(
    [T.StructField(c, T.DoubleType()) for c in DECODE_COLS]
)

FMTS = ["png", "jpeg"]


def decode_stats_pandas(
    data: pd.Series, fmt: pd.Series, on_error: str = "fail"
) -> pd.DataFrame:
    """Pure-pandas decode+stats core — shared by the Spark UDF and the
    golden single-process oracle (tests compare them with allclose).

    ``on_error='null'``: web-scale corpora always contain corrupt payloads;
    rows that fail to decode get all-NaN stats instead of failing the task
    (mirrors the reference's salvage-parser try/except discipline,
    tpch_utils_knob.py:414-433)."""
    out = np.empty((len(data), len(DECODE_COLS)), dtype=np.float64)
    for i, (b, f) in enumerate(zip(data, fmt)):
        try:
            arr = decode_image(bytes(b), f)
        except Exception:
            if on_error == "fail":
                raise
            out[i, :] = np.nan
            continue
        flat = arr.reshape(-1, 3)  # stay uint8: min/max/median need no cast
        gray = to_gray(arr).ravel()
        hist = np.bincount(gray >> 5, minlength=HIST_BINS).astype(np.float64)
        out[i, 0:3] = flat.min(axis=0)
        n = flat.shape[0]
        for c in range(3):
            # exact uint8 median from a bincount (O(n), no sort); averages
            # the two middle order statistics exactly like np.median
            cum = np.cumsum(np.bincount(flat[:, c], minlength=256))
            lo = int(np.searchsorted(cum, (n - 1) // 2 + 1))
            hi = int(np.searchsorted(cum, n // 2 + 1))
            out[i, 3 + c] = (lo + hi) / 2.0
        out[i, 6:9] = flat.max(axis=0)
        out[i, 9 : 9 + HIST_BINS] = hist / gray.size
        out[i, 9 + HIST_BINS] = gray.mean()
    return pd.DataFrame(out, columns=DECODE_COLS)


@F.pandas_udf(_DECODE_SCHEMA)
def _decode_stats_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    return decode_stats_pandas(data, fmt)


@F.pandas_udf(_DECODE_SCHEMA)
def _decode_stats_tolerant_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    return decode_stats_pandas(data, fmt, on_error="null")


def with_image_features(
    df: DataFrame, bytes_col: str = "bytes", on_error: str = "fail"
) -> DataFrame:
    """Append decoded-pixel statistic columns; drops the heavy binary column
    afterwards so downstream shuffles never carry image payloads.
    ``on_error='null'`` adds a ``decode_ok`` flag and null stats for
    undecodable rows instead of failing the job."""
    udf = _decode_stats_udf if on_error == "fail" else _decode_stats_tolerant_udf
    df = df.withColumn("_px", udf(F.col(bytes_col), F.col("fmt")))
    # single withColumns pass — chained withColumn is O(n²) in the analyzer
    out = df.withColumns({c: F.col(f"_px.{c}") for c in DECODE_COLS}).drop("_px")
    if on_error != "fail":
        out = out.withColumn("decode_ok", F.col("px_mean").isNotNull())
    return out


def with_basics(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """[w, h, nbytes] + format one-hot — all JVM-side expressions."""
    cols = {"nbytes": F.length(F.col(bytes_col)).cast("double")}
    for f in FMTS:
        cols[f"fmt_{f}"] = F.when(F.col("fmt") == f, 1.0).otherwise(0.0)
    return df.withColumns(cols)


def with_phash_bits(df: DataFrame, phash_col: str = "phash") -> DataFrame:
    """Unpack the 64-bit perceptual hash into bit columns JVM-side."""
    return df.withColumns(
        {
            f"ph_{i}": F.shiftright(F.col(phash_col), 63 - i)
            .bitwiseAND(F.lit(1))
            .cast("double")
            for i in range(64)
        }
    )


def phash_bits_pandas(phash: pd.Series) -> pd.DataFrame:
    """Golden-oracle twin of ``with_phash_bits``."""
    v = phash.to_numpy().astype(np.int64).view(np.uint64)
    cols = {
        f"ph_{i}": ((v >> np.uint64(63 - i)) & np.uint64(1)).astype(np.float64)
        for i in range(64)
    }
    return pd.DataFrame(cols)


# ---------------------------------------------------------------------------
# Sharpness / blur detection (variance-of-Laplacian + Tenengrad)
# ---------------------------------------------------------------------------
# The standard image-curation sharpness gate (Pech-Pacheco et al. 2000;
# used by every large-scale image-dataset pipeline to drop blurred or
# low-detail frames before training). All arithmetic is INTEGER until
# one final float division of two exactly-representable values, so the
# distributed UDF and the independent pure-Python fixture oracle match
# bit-for-bit regardless of traversal order:
#
#   lap        = N+S+E+W - 4*center          (interior pixels only)
#   lap_var    = (n*sum(lap^2) - sum(lap)^2) / n^2
#   tenengrad  = sum(gx^2 + gy^2) / n        (central differences)
#
# Bounds: |lap| <= 1020, lap^2 <= 1.05e6, n <= 62*62 for the 64px cap,
# so every integer sum stays far below 2^53 and the numerators are
# exact in float64.

SHARP_COLS = ["dec_w", "dec_h", "lap_var", "tenengrad"]

_SHARP_SCHEMA = T.StructType(
    [
        T.StructField("dec_w", T.IntegerType()),
        T.StructField("dec_h", T.IntegerType()),
        T.StructField("lap_var", T.DoubleType()),
        T.StructField("tenengrad", T.DoubleType()),
    ]
)


def sharpness_stats_pandas(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Vectorized (numpy-shift) sharpness core — the Spark-side half.

    The fixture oracle (golden.ensure_blur_fixture) recomputes the same
    integer sums with an explicit per-pixel Python loop — an independent
    implementation of the math; only the codec decode is shared (the
    fixture-oracle convention documented in FIXTURES.md). Images with
    fewer than 3 rows or columns have no interior and emit 0.0."""
    n_rows = len(data)
    dec_w = np.empty(n_rows, np.int32)
    dec_h = np.empty(n_rows, np.int32)
    lap_var = np.empty(n_rows, np.float64)
    teng = np.empty(n_rows, np.float64)
    for i, (b, f) in enumerate(zip(data, fmt)):
        arr = decode_image(bytes(b), f)
        h, w = arr.shape[:2]
        dec_w[i], dec_h[i] = w, h
        lap_var[i], teng[i] = _sharpness_ints(arr)
    return pd.DataFrame(
        {"dec_w": dec_w, "dec_h": dec_h, "lap_var": lap_var, "tenengrad": teng}
    )


def _sharpness_ints(arr: np.ndarray) -> tuple[float, float]:
    """(lap_var, tenengrad) of one decoded array — the shared
    vectorized integer-sum core (sharpness UDF + curation capstone)."""
    g = to_gray(arr).astype(np.int64)
    h, w = g.shape
    if h < 3 or w < 3:
        return 0.0, 0.0
    c = g[1:-1, 1:-1]
    lap = g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:] - 4 * c
    n = lap.size
    s = int(lap.sum())
    ss = int((lap * lap).sum())
    gx = g[1:-1, 2:] - g[1:-1, :-2]
    gy = g[2:, 1:-1] - g[:-2, 1:-1]
    teng = float(int((gx * gx + gy * gy).sum())) / float(n)
    return float(n * ss - s * s) / float(n * n), teng


@F.pandas_udf(_SHARP_SCHEMA)
def _sharpness_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    return sharpness_stats_pandas(data, fmt)


def with_sharpness(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Append sharpness columns; map-only, one Arrow batch pass, bytes
    dropped before any downstream exchange (the flagship decode idiom)."""
    df = df.withColumn("_sh", _sharpness_udf(F.col(bytes_col), F.col("fmt")))
    return df.withColumns(
        {c: F.col(f"_sh.{c}") for c in SHARP_COLS}
    ).drop("_sh", bytes_col)


# ---------------------------------------------------------------------------
# Uniform-border (letterbox / pillarbox) detection
# ---------------------------------------------------------------------------
# The crop gate image-curation pipelines run before training: detect
# constant-color margins (scanner beds, letterboxed video stills, ad
# padding) and emit the content crop box. Semantics (identical on both
# oracle sides, exact — no tolerance): a row is border iff every pixel
# equals ITS OWN first pixel (self-anchored, so a bottom-only or
# right-only border is still found); border_t/b (l/r) are the
# leading/trailing runs of such rows (cols, anchored on their row-0
# pixel). A fully-uniform image is all border: t=h, b=0, l=w, r=0.

BORDER_COLS = ["img_w", "img_h", "border_t", "border_b", "border_l", "border_r"]

_BORDER_SCHEMA = T.StructType(
    [T.StructField(c, T.IntegerType()) for c in BORDER_COLS]
)


def _run_len(mask: np.ndarray) -> int:
    """Length of the leading True run."""
    return int(mask.size if mask.all() else np.argmin(mask))


def _border_runs(arr: np.ndarray) -> tuple[int, int, int, int]:
    """(t, b, l, r) self-anchored uniform runs — the shared vectorized
    detector core (border_stats_pandas + the curation capstone).

    Degenerate all-border cases are normalized so the crop box is
    empty but never negative: all rows uniform -> (h, 0, w, 0); all
    columns uniform (vertical stripes — every column constant while
    some row is not) -> (0/b from rows, l=w, r=0)."""
    h, w = arr.shape[:2]
    rows_u = (arr == arr[:, :1, :]).all(axis=(1, 2))
    if rows_u.all():
        return h, 0, w, 0
    cols_u = (arr == arr[:1, :, :]).all(axis=(0, 2))
    l = _run_len(cols_u)
    r = 0 if l == w else _run_len(cols_u[::-1])
    return (_run_len(rows_u), _run_len(rows_u[::-1]), l, r)


def border_stats_pandas(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Vectorized border detector — the Spark-side half; the fixture
    oracle (golden.ensure_border_fixture) recounts the runs with
    explicit per-pixel Python loops."""
    out = np.empty((len(data), len(BORDER_COLS)), dtype=np.int32)
    for i, (b, f) in enumerate(zip(data, fmt)):
        arr = decode_image(bytes(b), f)
        h, w = arr.shape[:2]
        t, bt, l, r = _border_runs(arr)
        out[i] = (w, h, t, bt, l, r)
    return pd.DataFrame(out, columns=BORDER_COLS)


@F.pandas_udf(_BORDER_SCHEMA)
def _border_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    return border_stats_pandas(data, fmt)


def with_border_stats(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Append border columns; map-only, payload dropped afterwards."""
    df = df.withColumn("_bd", _border_udf(F.col(bytes_col), F.col("fmt")))
    return df.withColumns(
        {c: F.col(f"_bd.{c}") for c in BORDER_COLS}
    ).drop("_bd", bytes_col)


# ---------------------------------------------------------------------------
# Curation capstone core: sharpness + border crop + phash-of-content
# ---------------------------------------------------------------------------
# ONE decode per image serving all three gates — the reason the engine
# fuses metrics into a single Arrow pass (decode dominates; a second
# pass would double the pipeline's hot cost). The perceptual hash is
# computed on the CROPPED content, so a letterboxed copy hashes
# identically to its original and dedups against it — raw-byte or
# full-frame phash dedup would miss it.

CURATION_COLS = [
    "dec_w", "dec_h", "border_t", "border_b", "border_l", "border_r",
    "crop_w", "crop_h", "lap_var", "crop_phash",
]

_CURATION_SCHEMA = T.StructType(
    [T.StructField(c, T.IntegerType()) for c in CURATION_COLS[:8]]
    + [
        T.StructField("lap_var", T.DoubleType()),
        T.StructField("crop_phash", T.LongType()),
    ]
)


def curation_stats_pandas(
    data: pd.Series, fmt: pd.Series, on_error: str = "fail"
) -> pd.DataFrame:
    """``on_error='null'``: web corpora always contain corrupt payloads
    — undecodable rows emit NaN lap_var / zero dims instead of failing
    the task (the with_image_features salvage discipline); callers
    derive ``decode_ok`` from ``lap_var`` nullness."""
    from query_cost_feature_engineering_spark.codecs import phash64

    n_rows = len(data)
    out = {c: np.zeros(n_rows, np.int32) for c in CURATION_COLS[:8]}
    lap_var = np.empty(n_rows, np.float64)
    ph = np.zeros(n_rows, np.int64)
    for i, (b, f) in enumerate(zip(data, fmt)):
        try:
            arr = decode_image(bytes(b), f)
        except Exception:
            if on_error == "fail":
                raise
            lap_var[i] = np.nan
            continue
        h, w = arr.shape[:2]
        t, bt, l, r = _border_runs(arr)
        crop = arr[t : h - bt, l : w - r]
        ch, cw = crop.shape[:2]
        if ch == 0 or cw == 0:
            lap_var[i], ph[i] = 0.0, 0
        else:
            lap_var[i] = _sharpness_ints(crop)[0]
            ph[i] = phash64(crop)
        for c, v in zip(
            CURATION_COLS[:8], (w, h, t, bt, l, r, cw, ch)
        ):
            out[c][i] = v
    out["lap_var"] = lap_var
    out["crop_phash"] = ph
    return pd.DataFrame(out)


@F.pandas_udf(_CURATION_SCHEMA)
def _curation_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    return curation_stats_pandas(data, fmt)


@F.pandas_udf(_CURATION_SCHEMA)
def _curation_tolerant_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    return curation_stats_pandas(data, fmt, on_error="null")


def with_curation_stats(
    df: DataFrame, bytes_col: str = "bytes", on_error: str = "fail"
) -> DataFrame:
    """Append the fused gate columns; map-only, payload dropped.
    ``on_error='null'`` adds a ``decode_ok`` flag; corrupt rows carry
    NULL lap_var (never sharp, never a dedup winner) instead of
    failing the job."""
    udf = _curation_udf if on_error == "fail" else _curation_tolerant_udf
    df = df.withColumn("_cu", udf(F.col(bytes_col), F.col("fmt")))
    out = df.withColumns(
        {c: F.col(f"_cu.{c}") for c in CURATION_COLS}
    ).drop("_cu", bytes_col)
    if on_error != "fail":
        # the UDF's NaN sentinel arrives as NULL (Arrow's from_pandas
        # NaN->null semantics), so test nullness, not isnan
        ok = F.col("lap_var").isNotNull() & ~F.isnan("lap_var")
        out = out.withColumn("decode_ok", ok).withColumn(
            "lap_var", F.when(F.col("decode_ok"), F.col("lap_var"))
        )
    return out
