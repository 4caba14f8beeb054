"""Single-process pandas/NumPy golden oracle (FIXTURES.md F3).

Independent re-implementation of the full feature semantics the Spark plan
computes — used by the test suite as ground truth (`numpy.allclose` per
entity × timestamp). Mirrors the role of the reference's vectorizers
(tpch_utils_knob.py:60-210) as the semantic contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from query_cost_feature_engineering_spark.functions.image_features import (
    decode_stats_pandas,
    phash_bits_pandas,
)
from query_cost_feature_engineering_spark.operators.windows import SESSION_GAP_S
from query_cost_feature_engineering_spark.sources.images import VOCAB


def golden_features(images: pd.DataFrame) -> pd.DataFrame:
    """Flat golden feature columns, sorted by (entity_id, ts, image_id)."""
    df = images.copy()
    df["nbytes"] = df["bytes"].map(len).astype(float)
    for f in ("png", "jpeg"):
        df[f"fmt_{f}"] = (df["fmt"] == f).astype(float)
    px = decode_stats_pandas(df["bytes"], df["fmt"])
    df = pd.concat([df.reset_index(drop=True), px], axis=1)
    df = pd.concat([df, phash_bits_pandas(df["phash"])], axis=1)

    toks = df["caption"].str.split()
    df["token_count"] = toks.map(len).astype(float)
    for w in VOCAB:
        df[f"tok_{w}"] = toks.map(lambda t, w=w: float(sum(x == w for x in t)))

    df = df.sort_values(["entity_id", "ts", "image_id"], kind="mergesort")
    g = df.groupby("entity_id", sort=False)
    for k in (1, 2):
        df[f"lag{k}_px_mean"] = g["px_mean"].shift(k)
        df[f"lead{k}_px_mean"] = g["px_mean"].shift(-k)
    sparse = df["px_mean"].where(df["fmt"] == "png")
    df["bf_png_mean"] = sparse.groupby(df["entity_id"], sort=False).ffill()
    df["roll3_px_mean"] = g["px_mean"].transform(
        lambda s: s.rolling(3, min_periods=1).mean()
    )
    gap = g["ts"].diff().dt.total_seconds()
    new_session = gap.isna() | (gap > SESSION_GAP_S)
    df["session_id"] = new_session.groupby(df["entity_id"], sort=False).cumsum()
    df["session_id"] = df["session_id"].astype("int64")

    from query_cost_feature_engineering_spark.operators.snapshot import (
        expanding_linear_fit_pandas,
    )

    df["snap_slope"], df["snap_intercept"] = expanding_linear_fit_pandas(
        df, "nbytes", "px_mean"
    )
    return df.drop(columns=["bytes", "caption"]).reset_index(drop=True)


def ensure_stream_features_fixture(
    n: int = 2000, n_entities: int = 60, seed: int = 44
) -> str:
    """Write (once) the expected stream_image_features rows as parquet —
    the DuckDB-visible mirror of the streaming query's synthetic input
    (same generator, same seed). The pure-pandas side recomputes the
    stateless featurize stage (decode stats share the exact NumPy core
    the Arrow UDF runs, so doubles are bit-identical); the driver's hash
    compare then checks the whole file-stream → micro-batch → sink path
    end to end. Same digest-keyed atomic-write pattern as the plan-node
    fixture (sources/logs.ensure_plan_nodes_fixture)."""
    import hashlib
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from query_cost_feature_engineering_spark.sources.images import (
        generate_images_pandas,
    )

    imgs = generate_images_pandas(n, n_entities, seed)
    px = decode_stats_pandas(imgs["bytes"], imgs["fmt"])
    out = pd.DataFrame(
        {
            "image_id": imgs["image_id"].astype(str),
            "entity_id": imgs["entity_id"].astype("int64"),
            "ts": imgs["ts"],
            "fmt": imgs["fmt"].astype(str),
            "token_count": imgs["caption"]
            .str.split()
            .map(len)
            .astype("int64"),
            "px_mean": px["px_mean"].to_numpy(dtype=np.float64),
            "nbytes": imgs["bytes"].map(len).astype("float64"),
        }
    )
    key = hashlib.md5(out.to_csv(index=False).encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), "qcfe_fixtures")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"stream_feats_{key}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
        os.replace(tmp, path)
    return path
