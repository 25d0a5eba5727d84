"""exchange_metering: the opt-in measured-volume counters must see the
rows entering a keyed exchange and the combined output, and must be a
no-op outside the scope."""

import pandas as pd


def test_metering_counts_rows(ray_session):
    import ray.data as rd

    from biomedical_ner_ray.stages.exchange import (
        exchange_metering,
        keyed_exchange,
    )

    df = pd.DataFrame({"k": [1, 2, 3, 4] * 25, "v": range(100)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    with exchange_metering() as snapshot:
        out = keyed_exchange(
            rd.from_pandas(df), ["k"], combine, 4, label="t"
        ).to_pandas()
        counters = snapshot()
    assert len(out) == 4
    assert counters["t"]["rows_in"] == 100
    assert counters["t"]["rows_out"] == 4
    assert counters["t"]["bytes_in"] > 0

    # outside the scope: no meter, no counters, exchange still works
    out2 = keyed_exchange(rd.from_pandas(df), ["k"], combine, 4).to_pandas()
    assert len(out2) == 4
