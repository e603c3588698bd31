"""Capture explain('formatted') for named queries into plans/r12/.

Usage: python scripts/capture_plans.py <suffix> <query> [query ...]
Writes plans/r12/<query>_<suffix>.txt at sf0.1 with the repo session
(same conditions as the committed *_before.txt captures).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries
from cdk_serverless_data_lake_sandbox_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r12/{name}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(txt)
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
