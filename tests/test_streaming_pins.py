"""x17's watermark-staircase pin, provably ARMED.

Round-7/8 verdicts noted the x17 runtime pin "goes quiet" when the
fixture cannot guarantee batch-2 drops (guaranteed_b2_drops == 0 makes
the third trip-wire vacuous).  These tests close that gap two ways:

1. Unit-drive the extracted check (`_x17_check_progress`) with synthetic
   StreamingQueryProgress shapes and prove each of the three trip-wires
   actually raises (batch composition, early enforcement, slow
   propagation) and that the measured-good shape passes.
2. Run the full x17 query end-to-end on a fixture ENGINEERED so the
   batch-2 drop guarantee is provably positive (chunk-2 rows sit hours
   behind chunk-0's max timestamp).  On that fixture a zero-drop batch 2
   would raise — so a clean completion + oracle hash match proves the
   pin was armed, not quiet.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import dock_financial_data_pipelines_spark as engine
from dock_financial_data_pipelines_spark.streaming.streams import (
    _x17_check_progress,
)
from tests._compare import compare_frames

engine.load_all()


def _progress(inputs, drops):
    return [
        {
            "numInputRows": n,
            "stateOperators": [{"numRowsDroppedByWatermark": d}],
        }
        for n, d in zip(inputs, drops)
    ]


class TestX17PinTripwires:
    CHUNKS = [12, 11, 10, 9]

    def test_good_shape_passes(self):
        _x17_check_progress(
            self._p([0, 0, 3, 5]), self.CHUNKS, guaranteed_b2_drops=2
        )

    def _p(self, drops):
        return _progress(self.CHUNKS, drops)

    def test_batch_composition_violation_raises(self):
        # two chunk files coalesced into one micro-batch
        with pytest.raises(RuntimeError, match="one micro-batch per chunk"):
            _x17_check_progress(
                _progress([23, 10, 9], [0, 0, 0]), self.CHUNKS, 2
            )

    def test_early_enforcement_violation_raises(self):
        # Spark enforcing the watermark in batch 1 (no one-batch lag)
        with pytest.raises(RuntimeError, match="batches 0-1 dropped"):
            _x17_check_progress(self._p([0, 4, 3, 5]), self.CHUNKS, 2)

    def test_slow_propagation_violation_raises(self):
        # batch 2 dropped nothing although the data guarantees drops
        with pytest.raises(RuntimeError, match="batch 2 dropped 0 rows"):
            _x17_check_progress(self._p([0, 0, 0, 5]), self.CHUNKS, 2)

    def test_quiet_mode_only_when_no_guarantee(self):
        # same zero-drop batch 2 passes ONLY under a zero guarantee —
        # the documented quiet mode for cardinality-starved fixtures
        _x17_check_progress(self._p([0, 0, 0, 5]), self.CHUNKS, 0)

    def test_zero_row_batches_ignored(self):
        p = self._p([0, 0, 3, 5])
        p.insert(2, {"numInputRows": 0, "stateOperators": [{}]})
        _x17_check_progress(p, self.CHUNKS, 2)


@pytest.fixture(scope="module")
def engineered_sf_dir(tmp_path_factory):
    """events.parquet where every chunk-2 row (event_id % 4 == 2) sits
    ~4 h behind chunk 0's max timestamp: its 5-min window end is far
    below (c0_max - 10 min - 1 s), so the k-2 staircase GUARANTEES
    batch-2 drops and the x17 pin cannot go quiet."""
    base = pd.Timestamp("2024-03-01 12:00:00")
    rows = []
    for eid in range(48):
        chunk, k = eid % 4, eid // 4
        if chunk == 2:
            ts = base + pd.Timedelta(seconds=30 * k)  # hours-old stragglers
        else:
            # recent chunks span ~4 h in 20-min steps so plenty of 5-min
            # windows end below the final watermark and actually EMIT in
            # append mode (a tight cluster would finalize nothing and
            # the end-to-end assertion below would be vacuous)
            ts = base + pd.Timedelta(hours=4, seconds=1200 * k + 13 * chunk)
        rows.append(
            {
                "event_id": eid,
                "ts": ts,
                "user_id": eid % 7,
                "event_type": "click",
                "value": float(eid),
                "props": "{}",
            }
        )
    d = tmp_path_factory.mktemp("x17_armed")
    pdf = pd.DataFrame(rows)
    con = duckdb.connect()
    con.register("ev", pdf)
    con.execute(
        f"COPY (SELECT * FROM ev) TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    return str(d)


def test_x17_pin_armed_end_to_end(spark, engineered_sf_dir):
    # 1) prove the guarantee bound is positive on this fixture, with the
    #    same arithmetic x17 uses (window end <= c0_max - 600 - 1)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(engineered_sf_dir, 'events.parquet')}'"
    )
    bound = con.execute(
        """
        WITH c AS (SELECT ts, event_id % 4 AS chunk FROM events),
        m AS (SELECT CAST(epoch(max(ts)) AS BIGINT) AS c0_max
              FROM c WHERE chunk = 0)
        SELECT count(*) FROM c, m
        WHERE chunk = 2
          AND CAST(floor(epoch(ts) / 300) * 300 + 300 AS BIGINT)
              <= c0_max - 600 - 1
        """
    ).fetchone()[0]
    assert bound == 12, f"fixture must guarantee drops, bound={bound}"

    # 2) the query completes — on this fixture a quiet pin is impossible:
    #    zero batch-2 drops would have raised inside the progress hook
    fn = engine.QUERIES["x17_stream_late_data_drop"]
    spark_pdf = fn(spark, engineered_sf_dir).toPandas()
    assert len(spark_pdf) > 0

    # 3) and the staircase-replay oracle still hash-matches end-to-end
    oracle_pdf = con.execute(
        engine.ORACLES["x17_stream_late_data_drop"]
    ).df()
    compare_frames(spark_pdf, oracle_pdf, "x17_armed")
