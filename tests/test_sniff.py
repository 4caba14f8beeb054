"""mapInArrow format sniffing vs golden, including mislabeled rows."""

from __future__ import annotations

from query_cost_feature_engineering_spark.functions.multimodal import (
    sniff_formats,
)


def test_sniff_detects_mislabeled_rows(spark, images_pdf):
    pdf = images_pdf.head(40).copy().reset_index(drop=True)
    # mislabel two rows and corrupt one
    fmt = pdf["fmt"].copy()
    fmt.iloc[1] = "jpeg" if pdf["fmt"].iloc[1] == "png" else "png"
    fmt.iloc[7] = "jpeg" if pdf["fmt"].iloc[7] == "png" else "png"
    pdf["fmt"] = fmt
    col = pdf["bytes"].copy()
    col.iloc[13] = b"\x00\x01garbage"
    pdf["bytes"] = col

    out = (
        sniff_formats(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("media_id")
    )
    bad = set(out.index[~out["fmt_ok"]])
    assert bad == {pdf["image_id"].iloc[i] for i in (1, 7, 13)}
    assert out.loc[pdf["image_id"].iloc[13], "sniffed_fmt"] == "unknown"
    ok = out[out["fmt_ok"]]
    assert (ok["sniffed_fmt"] == ok["declared_fmt"]).all()


def test_ablation_query_registry(spark):
    from query_cost_feature_engineering_spark.queries import (
        greedy_ablation_lineitem,
    )

    out = greedy_ablation_lineitem(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 5
    assert set(out["status"]) <= {"kept", "dropped"}
    assert (out["status"] == "kept").sum() >= 1
    # deterministic: second run returns the identical selection
    out2 = greedy_ablation_lineitem(spark, "/root/testdata/sf0.001").toPandas()
    assert out.equals(out2)
