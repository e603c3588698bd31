"""Mechanical 2x-of-baseline gate check (BASELINE.md).

Usage: python scripts/baseline_check.py BENCH_rNN.json [--factor 2.0]

Reads the shared-20 baseline embedded in BASELINE.md (the
BASELINE_JSON comment block) and the given bench artifact (either the
raw driver capture with a JSON line inside "tail", or bench.py's own
stdout line), then reports the shared-20 ratio and any per-query line
exceeding the factor. Exit code 0 = within gate, 1 = over.
"""

from __future__ import annotations

import json
import os
import re
import sys


def load_baseline() -> dict:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "BASELINE.md")).read()
    m = re.search(r"<!-- BASELINE_JSON\n(.*?)\nBASELINE_JSON -->", text, re.S)
    if not m:
        raise SystemExit("BASELINE.md has no BASELINE_JSON block")
    return json.loads(m.group(1))


def load_extended() -> dict:
    """Headline positions 21+: standing per-query baselines from each
    query's first carried BENCH round (r9). Absent block -> empty."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "BASELINE.md")).read()
    m = re.search(r"<!-- EXTENDED_JSON\n(.*?)\nEXTENDED_JSON -->", text, re.S)
    return json.loads(m.group(1)) if m else {"queries": {}}


def load_bench(path: str) -> dict:
    d = json.load(open(path))
    if "queries" not in d:
        tail = d.get("tail", "")
        m = re.search(r'\{"metric".*', tail)
        if m:
            d = json.loads(m.group(0).strip())
        else:
            # Known damage mode (BENCH_r10.json): the driver keeps only
            # the LAST 2000 chars of stdout, so an over-long final line
            # arrives with its head cut off mid-"metric".  The rest of
            # the object is intact JSON — re-attach a synthetic head at
            # the first complete key and parse.  bench.py now keeps the
            # line under budget (MAX_LINE), so this is recovery for old
            # artifacts, not the expected path.
            mv = re.search(r'"value":.*', tail)
            if not mv:
                raise SystemExit(f"{path}: no bench JSON line found")
            d = json.loads(('{"metric": "headline_total_sec", ' + mv.group(0)).strip())
    # r11 capture-size contract: extended-headline queries (positions
    # 21+) arrive under "ext" keyed by bench.EXT_ALIAS short names;
    # expand them back to full names so gating below is name-based.
    if d.get("ext"):
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from bench import EXT_ALIAS

        rev = {a: full for full, a in EXT_ALIAS.items()}
        unknown = sorted(set(d["ext"]) - set(rev))
        if unknown:
            raise SystemExit(f"{path}: unknown ext aliases {unknown}")
        d["queries"] = {**d["queries"], **{rev[a]: v for a, v in d["ext"].items()}}
    return d


def main() -> None:
    # argparse so both `--factor 2.5 BENCH.json` and
    # `BENCH.json --factor 2.5` parse (the old hand-rolled filter left
    # the space-separated value in the positional args — ADVICE r6)
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("bench", help="BENCH_rNN.json or bench.py stdout capture")
    ap.add_argument("--factor", type=float, default=2.0)
    # Absolute per-query noise floor (r11): same-code cross-boot swings
    # of +0.5 s have been recorded on sub-second queries
    # (bootstrap_ci_doclen old-rev 0.546 s on the r9 boot vs 1.05 s on
    # the r11 boot, one-boot probe HEAD/old = 1.006) while the
    # shared-20 TOTAL moved only 3%.  A pure ratio gate on a 0.5 s
    # query therefore fires on boot noise; the floor makes the
    # per-query gate `now > factor*baseline + slack`.  The shared-20
    # total-ratio gate is unchanged — it is the primary gate and is
    # noise-averaged by construction.
    ap.add_argument("--abs-slack", type=float, default=0.4)
    ns = ap.parse_args()
    factor = ns.factor
    slack = ns.abs_slack
    base = load_baseline()
    ext = load_extended()
    bench = load_bench(ns.bench)
    shared = {k: v for k, v in bench["queries"].items() if k in base["queries"]}
    missing = sorted(set(base["queries"]) - set(shared))
    total = round(sum(shared.values()), 3)
    ratio = round(total / base["shared20_total_sec"], 3)
    over = {
        k: (v, base["queries"][k], round(v / base["queries"][k], 2))
        for k, v in shared.items()
        if v > factor * base["queries"][k] + slack
    }
    # extended headline queries (positions 21+): per-query gate only —
    # they have no cross-round-stable total. Queries the bench did not
    # carry are reported, and ANY measured-vs-baseline excursion past
    # the factor fails the gate like a shared-20 one.
    # ext coverage is informational (a shared-20-only capture stays
    # valid — the r7 contract); measured excursions still fail the gate
    ext_missing = sorted(set(ext["queries"]) - set(bench["queries"]))
    over.update(
        {
            k: (bench["queries"][k], b, round(bench["queries"][k] / b, 2))
            for k, b in ext["queries"].items()
            if k in bench["queries"] and bench["queries"][k] > factor * b + slack
        }
    )
    # a bench artifact that did not measure every baseline query can
    # never pass the gate mechanically — a truncated run would
    # otherwise "pass" by summing almost nothing
    # per-query excursions (shared-20 and extended) fail the gate, as
    # documented; cross-boot noise appeals go through the one-boot probe
    within = ratio <= factor and not missing and not over
    print(
        json.dumps(
            {
                "shared20_total_sec": total,
                "baseline_total_sec": base["shared20_total_sec"],
                "ratio": ratio,
                "gate_factor": factor,
                "abs_slack_sec": slack,
                "within_gate": within,
                "missing": missing,
                "extended_missing": ext_missing,
                "per_query_over_factor": {
                    k: {"now": a, "baseline": b, "ratio": r}
                    for k, (a, b, r) in sorted(over.items())
                },
            }
        )
    )
    sys.exit(0 if within else 1)


if __name__ == "__main__":
    main()
