"""Cross-SF oracle parity: verify queries hash-exact at SFs the driver
gate never runs (it uses sf0.01 only) — the r4 discipline for newly
added oracle-backed operators, a STANDING ROTATION since r10 (r9
verdict item 4).

Modes:
  python scripts/xsf_check.py SF_DIR [name ...]
      one-SF spot check (original form; default sweep = recently
      touched ops).
  python scripts/xsf_check.py --rotate N --round R [--out XSF_rR.json]
      grade the N stalest oracle-backed ops at BOTH sf0.001 and
      sf0.1. Staleness = never-xsf-checked first (ordered by the
      _VERIFY_FIRST discipline: this round's touched ops, then oldest
      official driver grade), then oldest xsf round from prior
      XSF_r*.json artifacts. Writes a JSON artifact recording per-op
      verdicts + the round, which future rotations read back as the
      staleness ledger.

Ops whose sf0.1 leg is excluded by name (quadratic OUTPUT on the
saturated synthetic corpus, or a minutes-scale oracle replay) run the
sf0.001 leg only, with the reason recorded — never silently.
"""

from __future__ import annotations

import glob
import json
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from cdk_serverless_data_lake_sandbox_spark.catalog import ALL_TABLES  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)
from tests.compare import assert_frames_match  # noqa: E402

# Default one-SF sweep: the operators whose ORACLES or hot paths
# changed most recently.
DEFAULT_SWEEP = [
    "dhash_band_scoring",
    "afp_band_scoring",
    "framehash_jaccard_scoring",
    "bitext_margin_mining_lsh",
    "bootstrap_ci_doclen",
    "ann_topk_arrow",
    "copurchase_pagerank",
    "copurchase_kcore",
]

# sf0.1 exclusions (named, reasoned — the scale_soak EXCLUDED
# precedent). These run the sf0.001 leg only.
SF01_EXCLUDED = {
    "dedup_ngram_jaccard": "pair OUTPUT quadratic on saturated synthetic vocab (oracle side re-enumerates it)",
    "containment_dedup": "pair OUTPUT quadratic on saturated synthetic vocab (oracle side re-enumerates it)",
    "near_dup_edit_distance": "inherits the saturated jaccard pair stage (r7 probe >580s at sf1-scale)",
    "near_dup_review_sample": "inherits the saturated jaccard pair stage",
    "near_dup_keep_best": "inherits the saturated jaccard pair stage",
    "near_dup_source_matrix": "inherits the saturated jaccard pair stage",
    "dedup_components": "inherits the saturated jaccard pair stage",
    "dup_cluster_sizes": "inherits the saturated jaccard pair stage",
    "bpe_tokenize_stats": "oracle replays the full batched BPE trainer in DuckDB — minutes-scale at sf0.1",
    "bpe_train": "oracle replays the full batched BPE trainer in DuckDB — minutes-scale at sf0.1",
    "bitext_margin_mining": "deliberate-quadratic exact baseline; grid is 100x at sf0.1 on both engines",
}

SF_SMALL = "/root/testdata/sf0.001"
SF_LARGE = "/root/testdata/sf0.1"


def _make_session() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _make_duck(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _check(spark, con, qs, ors, name: str, sf: str) -> str:
    try:
        spdf = qs[name](spark, sf).toPandas()
        odf = con.execute(ors[name]).fetchdf()
        assert_frames_match(spdf, odf, name)
        return f"ok ({len(spdf)} rows)"
    except Exception as e:  # noqa: BLE001
        return f"FAIL: {str(e)[:300]}"


def _last_xsf_round() -> dict[str, int]:
    """Per-op newest xsf round across all prior XSF_r*.json ledgers."""
    seen: dict[str, int] = {}
    for path in glob.glob("XSF_r*.json"):
        try:
            with open(path) as fh:
                art = json.load(fh)
        except Exception:  # noqa: BLE001
            continue
        for op, rec in art.get("results", {}).items():
            r = rec.get("round", 0)
            seen[op] = max(seen.get(op, 0), r)
    return seen


def rotate(n: int, rnd: int, out: str) -> int:
    qs, ors = all_queries(), all_oracles()
    last = _last_xsf_round()
    # all_queries() is already _VERIFY_FIRST-ordered (touched, then
    # stalest official grade); stable-sort by xsf staleness on top so
    # never-xsf-checked ops keep that order and previously-checked
    # ones rotate oldest-first behind them
    candidates = [name for name in qs if name in ors]
    picked = sorted(candidates, key=lambda name: last.get(name, -1))[:n]

    spark = _make_session()
    cons = {sf: _make_duck(sf) for sf in (SF_SMALL, SF_LARGE)}
    results: dict[str, dict] = {}
    failed = 0
    for name in picked:
        rec: dict = {"round": rnd}
        rec["sf0.001"] = _check(spark, cons[SF_SMALL], qs, ors, name, SF_SMALL)
        if name in SF01_EXCLUDED:
            rec["sf0.1"] = f"excluded: {SF01_EXCLUDED[name]}"
        else:
            rec["sf0.1"] = _check(spark, cons[SF_LARGE], qs, ors, name, SF_LARGE)
        bad = any(str(v).startswith("FAIL") for v in rec.values())
        failed += bad
        results[name] = rec
        print(f"  {'FAIL' if bad else 'OK  '} {name}: "
              f"{rec['sf0.001']} | {rec['sf0.1']}", flush=True)
    # MERGE into an existing artifact (late-round ops graded after the
    # main rotation land in the same round file instead of clobbering
    # it — r10 review finding)
    prior: dict = {}
    try:
        with open(out) as fh:
            prior = json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    merged = {**prior.get("results", {}), **results}
    art = {
        "_meta": {
            "round": rnd,
            "picked": len(merged),
            "failed": failed,
            "note": "stalest-first cross-SF oracle parity rotation; "
                    "sf0.001 + sf0.1 legs per op (sf0.1 exclusions "
                    "named inline)",
        },
        "results": merged,
    }
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"{len(picked) - failed} ok, {failed} failed -> {out}", flush=True)
    return 1 if failed else 0


def spot(sf: str, names: list[str]) -> int:
    qs, ors = all_queries(), all_oracles()
    spark = _make_session()
    con = _make_duck(sf)
    failed = 0
    for name in names:
        verdict = _check(spark, con, qs, ors, name, sf)
        failed += verdict.startswith("FAIL")
        print(f"  {verdict.split()[0].upper():4s} {name}: {verdict}", flush=True)
    print(f"{len(names) - failed} ok, {failed} failed at {sf}", flush=True)
    return 1 if failed else 0


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--rotate":
        n = int(args[1])
        rnd = 0
        out = None
        rest = args[2:]
        while rest:
            if rest[0] == "--round":
                rnd = int(rest[1]); rest = rest[2:]
            elif rest[0] == "--out":
                out = rest[1]; rest = rest[2:]
            else:
                raise SystemExit(f"unknown arg {rest[0]}")
        sys.exit(rotate(n, rnd, out or f"XSF_r{rnd:02d}.json"))
    sys.exit(spot(args[0], args[1:] or DEFAULT_SWEEP))


if __name__ == "__main__":
    main()
