"""Text-operator guard tests (ADVICE r7)."""

from __future__ import annotations


def test_linear_score_ragged_vector_raises(spark):
    """ADVICE r7: a feature vector whose length differs from the weight
    vector must fail loudly (zip_with would otherwise NULL-pad and the
    logit — and downstream keep verdicts — silently become NULL)."""
    import pytest

    from etl_pipline_ibrd_loan_system_spark.operators.textstats import linear_score

    good = spark.createDataFrame([(1, [1, 2, 3])], ["id", "v"])
    row = linear_score(good, "v", [10, 20, 30], 100.0).collect()[0]
    assert row.logit == (10 + 40 + 90) / 100.0

    bad = spark.createDataFrame([(1, [1, 2])], ["id", "v"])
    with pytest.raises(Exception, match="dimension drift"):
        linear_score(bad, "v", [10, 20, 30], 100.0).collect()
