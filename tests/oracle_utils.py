"""Mirror of the driver's DuckDB-oracle comparison: row count + schema
(column names) + order-insensitive exact value equality, columns sorted by
name before comparing."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if isinstance(out[c].dtype, pd.DatetimeTZDtype):
            out[c] = out[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif out[c].dtype == object:
            # unify decimal.Decimal and friends
            try:
                out[c] = pd.to_numeric(out[c])
            except (ValueError, TypeError):
                out[c] = out[c].astype(str)
    out = out[sorted(out.columns)]
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = ""):
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        assert ka == kb, (
            f"{name}.{c}: dtype kind mismatch {a[c].dtype} vs {b[c].dtype} "
            "(driver hashing may be dtype-sensitive — cast the oracle)"
        )
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            exact = (av == bv) | both_nan
            if not exact.all():
                close = np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
                bad = np.where(~exact)[0][:5]
                detail = [(i, av[i], bv[i]) for i in bad]
                if close.all():
                    raise AssertionError(
                        f"{name}.{c}: values CLOSE but not exact (driver hash "
                        f"would fail): {detail}"
                    )
                raise AssertionError(f"{name}.{c}: value mismatch: {detail}")
        else:
            eq = (a[c].isna() & b[c].isna()) | (a[c] == b[c])
            assert eq.all(), (
                f"{name}.{c}: mismatch at rows "
                f"{[(i, a[c].iloc[i], b[c].iloc[i]) for i in list(np.where(~eq)[0][:5])]}"
            )
