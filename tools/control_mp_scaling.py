"""Control experiment: raw-Python multiprocessing scaling of the decode
kernel, NO Spark involved.

Purpose: separate "does the engine scale?" from "does this host scale?".
The sandbox VM shows host CPU steal and all-core frequency scaling; this
embarrassingly-parallel control measures the machine's own ceiling for the
identical decode+stats kernel the Spark pipeline runs. If Spark's measured
speedup matches this control's, the engine adds no scaling penalty.

    python tools/control_mp_scaling.py [img_parquet_dir] [procs ...]
"""

from __future__ import annotations

import json
import sys
import time
from multiprocessing import Pool
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def work(chunk):
    import pandas as pd

    from query_cost_feature_engineering_spark.functions.image_features import (
        decode_stats_pandas,
    )

    df = pd.DataFrame(chunk, columns=["bytes", "fmt"])
    decode_stats_pandas(df["bytes"], df["fmt"])
    return len(df)


def main() -> None:
    import pyarrow.parquet as pq

    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qcfe_scaling/images"
    procs_list = [int(p) for p in sys.argv[2:]] or [1, 2, 8, 32]

    t = pq.read_table(src, columns=["bytes", "fmt"]).to_pandas()
    data = list(zip(t["bytes"].tolist(), t["fmt"].tolist()))
    chunks = [data[i::64] for i in range(64)]

    out = {"n_images": len(data), "throughput": {}}
    for procs in procs_list:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            with Pool(procs) as p:
                n = sum(p.map(work, chunks))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["throughput"][procs] = round(n / best, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
