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


def test_embedding_oracle_dim_convention():
    """Every embedding-family oracle unrolls vectors with a hard-coded
    ``range(1, 65)`` (the ENGINE is dimension-agnostic via posexplode /
    size(embedding), but DuckDB's list unrolls are pinned to the
    corpus's 64-dim convention so they constant-fold). A corpus with a
    different dim would pass the engine yet silently mis-verify (r14
    ADVICE) — this guard makes that loud: it asserts the testdata
    corpora actually carry 64-dim embeddings, at every SF present."""
    import glob
    import os

    import pyarrow.parquet as pq

    checked = 0
    for path in sorted(
        glob.glob("/root/testdata/sf*/embeddings.parquet")
    ):
        first = pq.read_table(path, columns=["embedding"]).column(
            "embedding"
        )[0]
        assert len(first) == 64, (
            f"{path}: embedding dim {len(first)} != 64 — the oracle"
            " family's range(1, 65) unrolls (registry.py, 19 sites)"
            " no longer match this corpus; re-derive them from the"
            " new dim before trusting parity"
        )
        checked += 1
    assert checked > 0, "no testdata embeddings found to check"
