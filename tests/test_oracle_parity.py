"""Every registry query with an oracle must match DuckDB at sf0.001 —
the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pandas as pd
import pytest

from ecom_etl_proj_spark.plans import registry
from tests.conftest import SF_DIR

ORACLES = registry.oracle_sql()
QUERIES = registry.queries()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_col(s: pd.Series) -> pd.Series:
        if pd.api.types.is_float_dtype(s):
            return s.round(6)
        if pd.api.types.is_datetime64_any_dtype(s):
            return s.astype("datetime64[us]")
        return s

    out = df.apply(norm_col)
    return out.sort_values(by=list(out.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = normalize(QUERIES[name](spark, SF_DIR).toPandas())
    odf = normalize(duck.execute(ORACLES[name]).fetchdf())
    assert list(sdf.columns) == list(odf.columns), f"{name}: column mismatch"
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    pd.testing.assert_frame_equal(
        sdf.astype(str), odf.astype(str), check_dtype=False, obj=name
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
