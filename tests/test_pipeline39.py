"""Tests for pipeline39: observe() metrics match a second-pass aggregate
and are produced by the SAME job as the main query."""

from __future__ import annotations

import pandas as pd
import pytest

from messikinesisprovider_spark.operators.pipeline39 import observed_metrics_audit

SF = "/root/testdata/sf0.001"


def test_observed_metrics_match_pandas(spark):
    [row] = observed_metrics_audit(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert row["n_rows"] == len(ev)
    assert row["n_null_value"] == int(ev["value"].isna().sum())
    assert row["n_null_user"] == int(ev["user_id"].isna().sum())
    v6 = (ev["value"].fillna(0) * 10**6).round().astype("int64")
    assert row["value_sum"] == pytest.approx(float(v6.sum()) / 1e6, rel=1e-12)
    assert row["n_types"] == ev.loc[ev["value"].notna(), "event_type"].nunique()
