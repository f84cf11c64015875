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


def test_every_query_has_full_oracle():
    """Since r6 every registered query carries a full DuckDB oracle —
    there is no rows-only tier. This replaces the old parametrized
    rows-only runner (whose parameter set became permanently empty and
    showed up as a confusing perpetual skip): if a future query is
    registered without an oracle, this fails loudly instead of silently
    weakening the gate."""
    assert set(QUERIES) == set(ORACLES), (
        f"queries without oracle: {sorted(set(QUERIES) - set(ORACLES))}; "
        f"oracles without query: {sorted(set(ORACLES) - set(QUERIES))}"
    )
