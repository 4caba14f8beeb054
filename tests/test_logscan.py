"""Log-salvage source (A1/A2 analog) vs a pure-python golden parse."""

from __future__ import annotations

import json

from query_cost_feature_engineering_spark.sources.logs import (
    generate_console_log,
    per_node_samples,
    read_plans_from_log,
)


def _golden_parse(path):
    plans = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        plans.append(json.loads(line.rstrip("+")))
    return plans


def test_logscan_matches_golden(spark, tmp_path):
    path = str(tmp_path / "console.log")
    generate_console_log(path, n_plans=150, seed=61)
    golden = _golden_parse(path)

    parsed = read_plans_from_log(spark, path).toPandas()
    assert len(parsed) == len(golden)
    got = sorted(
        zip(parsed["node_type"], parsed["actual_rows"], parsed["n_children"])
    )
    want = sorted(
        (p["Node Type"], p["Actual Rows"], len(p["Plans"])) for p in golden
    )
    assert got == want

    # A5 sample collection: parents + children, zero-row nodes dropped
    samples = per_node_samples(read_plans_from_log(spark, path)).toPandas()
    want_n = sum(
        (1 if p["Actual Rows"] > 0 else 0)
        + sum(1 for k in p["Plans"] if k["Actual Rows"] > 0)
        for p in golden
    )
    assert len(samples) == want_n
    assert (samples["actual_rows"] > 0).all()
