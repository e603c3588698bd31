"""Order-insensitive DataFrame comparison mirroring the driver's
correctness gate (row count + column names + sorted value equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: column mismatch {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        # The driver's value hash is dtype-sensitive: an int64 Spark column
        # vs a float64 oracle column hash-mismatches even when every value
        # compares equal (1 == 1.0). Mirror that strictness for numeric
        # kinds so a dtype divergence can't pass locally and fail the gate.
        a_num = pd.api.types.is_numeric_dtype(a[c])
        b_num = pd.api.types.is_numeric_dtype(b[c])
        if a_num and b_num:
            a_kind = "f" if pd.api.types.is_float_dtype(a[c]) else "i"
            b_kind = "f" if pd.api.types.is_float_dtype(b[c]) else "i"
            assert a_kind == b_kind, (
                f"{name}: col {c!r} dtype kind mismatch: spark "
                f"{a[c].dtype} vs oracle {b[c].dtype} (driver hash would fail)"
            )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            both_nan = pd.isna(av) & pd.isna(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = np.where(~eq)[0][:5]
                diffs = [(i, av[i], bv[i]) for i in bad]
                raise AssertionError(f"{name}: float col {c!r} differs at {diffs}")
        else:
            av_s = pd.Series(av).astype("object")
            bv_s = pd.Series(bv).astype("object")
            both_null = pd.isna(av_s) & pd.isna(bv_s)
            neq = ~((av_s == bv_s).fillna(False) | both_null)
            if neq.any():
                i = int(np.where(neq)[0][0])
                raise AssertionError(
                    f"{name}: col {c!r} differs at row {i}: {av_s[i]!r} vs {bv_s[i]!r}"
                )
