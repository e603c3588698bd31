"""sf1 -> sf3 scaling exponents for the co-purchase graph family
(r10 verdict item 5): copurchase_triangles was the suite's
fastest-growing op at the sf1 soak (11.35x on 10x data — inside the
degree-ordered O(m^1.5) envelope but the one to watch). This probe
times B95/B93/B113 at the sf1 and sf3 tiers (scripts/make_sf1.py,
SOAK_COPIES=10/30), reports the per-op growth exponent
ln(t3/t1)/ln(3), and profiles the oriented out-degree skew that
bounds the wedge work.

Note the tier construction: copies are key-shifted disjoint universes,
so graph STRUCTURE per copy is constant and the m^1.5 bound predicts
LINEAR total growth (exponent ~1). An exponent drifting above ~1.5
would mean the plan is paying super-linearly for something the
algorithm doesn't require (sort pressure, skew) — the salting/
bucketing fallback documented in SURVEY §6 would then apply.

Usage: python scripts/graph_scale_probe.py [sf1_dir sf3_dir]
Writes SOAK_r11_graph.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cdk_serverless_data_lake_sandbox_spark.operators.graph import (  # noqa: E402
    copurchase_edges,
)
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

OPS = ["copurchase_pagerank", "copurchase_triangles", "copurchase_trend"]


def degree_profile(spark, sf_dir: str) -> dict:
    """Oriented out-degree skew: the quantity that bounds per-node
    wedge expansion in the triangle plan."""
    edges = copurchase_edges(spark, sf_dir)
    dd = edges.select(F.col("src").alias("dn"), F.col("src_deg").alias("dst_deg")).distinct()
    oriented = (
        edges.join(dd, edges.dst == dd.dn)
        .where(
            (F.col("src_deg") < F.col("dst_deg"))
            | ((F.col("src_deg") == F.col("dst_deg")) & (F.col("src") < F.col("dst")))
        )
        .select("src")
    )
    outdeg = oriented.groupBy("src").agg(F.count("*").alias("d"))
    stats = outdeg.agg(
        F.count("*").alias("n_nodes"),
        F.max("d").alias("max_outdeg"),
        F.expr("percentile_approx(d, 0.99)").alias("p99_outdeg"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    ).collect()[0]
    n_edges = edges.count()
    return {
        "n_edges": n_edges,
        "n_nodes": int(stats.n_nodes),
        "max_oriented_outdeg": int(stats.max_outdeg),
        "p99_oriented_outdeg": int(stats.p99_outdeg),
        "n_wedges": int(stats.n_wedges),
    }


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    sf3 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx30"
    spark = get_spark(app_name="graph-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out: dict = {"tiers": {}, "ops": {}}
    for label, d in (("sf1", sf1), ("sf3", sf3)):
        out["tiers"][label] = {"dir": d, **degree_profile(spark, d)}
        for name in OPS:
            qs[name](spark, d).write.format("noop").mode("overwrite").save()  # warm
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out["ops"].setdefault(name, {})[label] = round(best, 3)
            print(f"{label} {name}: {best:.2f}s", flush=True)
    for name, t in out["ops"].items():
        t["exponent_sf1_to_sf3"] = round(math.log(t["sf3"] / t["sf1"]) / math.log(3), 3)
    w1, w3 = out["tiers"]["sf1"]["n_wedges"], out["tiers"]["sf3"]["n_wedges"]
    out["wedge_growth_on_3x_data"] = round(w3 / w1, 3)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SOAK_r11_graph.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
