"""Job driver: skip-if-done, retry, and idempotent-rerun semantics
(the reference's Airflow task policies restated at job granularity —
REPORT:21-22 retries, :172 replace=True, :229 catchup/max_active_runs)."""

from __future__ import annotations

import json
import os

import pytest

from dock_financial_data_pipelines_spark import driver


def test_run_publishes_day_partition_and_marker(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_out")
    res = driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out)
    assert not res.skipped and res.attempts == 1 and res.rows > 0
    assert os.path.isdir(os.path.join(out, "report_date=2024-01-05"))
    marker = json.load(open(driver._marker(out, "2024-01-05")))
    assert marker["rows"] == res.rows


def test_second_run_skips_via_marker(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_out")
    driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out)
    res2 = driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out)
    assert res2.skipped


def test_forced_rerun_is_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_out")
    r1 = driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out)
    r2 = driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out, force=True)
    assert r2.rows == r1.rows  # dynamic overwrite replaced, not appended
    total = spark.read.parquet(out).where("report_date = '2024-01-05'").count()
    assert total == r1.rows


def test_reruns_other_day_leaves_first_day_intact(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_out")
    r1 = driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out)
    driver.run_job(spark, "daily_events", sf_dir, "2024-01-06", out)
    kept = spark.read.parquet(out).where("report_date = '2024-01-05'").count()
    assert kept == r1.rows


def test_retries_absorb_transient_failures(spark, sf_dir, tmp_path, monkeypatch):
    out = str(tmp_path / "bal_out")
    calls = {"n": 0}
    real = driver.JOBS["daily_events"]

    def flaky(spark_, sf, day):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient executor loss")
        return real(spark_, sf, day)

    monkeypatch.setitem(driver.JOBS, "daily_events", flaky)
    res = driver.run_job(spark, "daily_events", sf_dir, "2024-01-05", out, retries=3)
    assert res.attempts == 3 and res.rows > 0


def test_retries_exhausted_reraises(spark, sf_dir, tmp_path, monkeypatch):
    def always_fail(spark_, sf, day):
        raise RuntimeError("hard failure")

    monkeypatch.setitem(driver.JOBS, "daily_events", always_fail)
    with pytest.raises(RuntimeError, match="hard failure"):
        driver.run_job(
            spark, "daily_events", sf_dir, "2024-01-05",
            str(tmp_path / "x"), retries=1,
        )


def test_balance_report_job_runs(spark, sf_dir, tmp_path):
    out = str(tmp_path / "bal")
    res = driver.run_job(spark, "balance_report", sf_dir, "1998-12-31", out)
    assert res.rows > 0
    pdf = (
        spark.read.parquet(out)
        .where("report_date = '1998-12-31'")
        .limit(5)
        .toPandas()
    )
    assert {"custkey", "mktsegment", "acctbal"} <= set(pdf.columns)


def test_sweep_rotation_self_updates():
    """The registry order must adapt to driver verdicts automatically:
    never-checked SQL-oracled queries first, rows-only next, upgrade
    re-runs (rows-only verdict but an oracle now exists) next, verified
    last — and when a simulated new CORRECTNESS round lands, its names
    demote without any manual list edit. Round-3 regression: this test
    hardcoded r01+r02 while the runtime globs CORRECTNESS_r*.json, so
    it broke the moment r03 landed; it now uses the runtime's loader."""
    import dock_financial_data_pipelines_spark as engine

    engine.load_all()
    verified, hash_verified, _last_round = engine._load_driver_verdicts()

    curated = set(engine._SWEEP_FIRST) | set(engine._SWEEP_LAST)

    def classes(names, ver, hv):
        out = []
        for n in names:
            if n not in ver:
                if n not in curated:
                    out.append(3)  # new registration: behind the plan
                else:
                    out.append(0 if n in engine.ORACLES else 1)
            elif n not in hv and n in engine.ORACLES:
                out.append(2)
            else:
                out.append(4)
        return out

    try:
        order = list(engine.QUERIES)
        cls = classes(order, verified, hash_verified)
        assert cls == sorted(cls), "classes must be contiguous 0..4 blocks"
        n0 = cls.count(0)
        head = min(n0, 50)
        assert cls[:head] == [0] * head, "budget head must be oracled backlog"

        # Upgrade slot: any query whose only driver rows are rows-only
        # but which now carries an oracle must outrank hash-green
        # re-runs (a3_approx_count_distinct after round 3).
        upgrades = [n for n in order if classes([n], verified, hash_verified) == [2]]
        if "a3_approx_count_distinct" not in verified:
            pass  # not yet driver-checked at all; class 0/1 covers it
        elif "a3_approx_count_distinct" not in hash_verified:
            assert "a3_approx_count_distinct" in upgrades

        # Simulate the next round's verdicts landing (as full hash
        # verdicts): the head names must demote and any remaining
        # backlog must surface.
        fake = verified | set(order[:50])
        fake_hash = hash_verified | set(order[:50])
        engine._reorder_registry(fake, fake_hash)
        order2 = list(engine.QUERIES)
        cls2 = classes(order2, fake, fake_hash)
        assert cls2 == sorted(cls2)
        n_backlog = sum(1 for c in cls2 if c < 4)
        assert not set(order2[:n_backlog]) & fake_hash, "verified names must demote"
    finally:
        engine._reorder_registry()  # restore the real order for other tests


def test_sweep_lists_reference_registered_queries():
    """A typo in _SWEEP_FIRST/_SWEEP_LAST silently deprioritizes the
    intended query (unknown names sort as 'uncurated'); catch it."""
    import dock_financial_data_pipelines_spark as engine

    engine.load_all()
    unknown = [
        n
        for n in engine._SWEEP_FIRST + engine._SWEEP_LAST
        if n not in engine.QUERIES
    ]
    assert unknown == [], f"sweep lists name unregistered queries: {unknown}"


def test_sweep_head_is_fully_oracled():
    """The committed plan promises the driver 50 hash-checkable slots."""
    import dock_financial_data_pipelines_spark as engine

    engine.load_all()
    head = list(engine.QUERIES)[:50]
    missing = [n for n in head if n not in engine.ORACLES]
    assert missing == [], f"sweep head entries without oracles: {missing}"


def test_backfill_catchup_true_replays_every_day(spark, sf_dir, tmp_path):
    out = str(tmp_path / "bf_out")
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    first = driver.backfill(spark, "daily_events", sf_dir, days, out)
    assert [r.day for r in first] == days
    assert not any(r.skipped for r in first)
    # double-replay == single-replay: every day skips on its marker,
    # published partitions untouched
    counts1 = {
        str(r["report_date"]): r["count"]
        for r in spark.read.parquet(out).groupBy("report_date")
        .count().collect()
    }
    second = driver.backfill(spark, "daily_events", sf_dir, days, out)
    assert all(r.skipped for r in second)
    counts2 = {
        str(r["report_date"]): r["count"]
        for r in spark.read.parquet(out).groupBy("report_date")
        .count().collect()
    }
    assert counts1 == counts2 and set(counts1) == set(days)


def test_backfill_no_catchup_runs_only_latest(spark, sf_dir, tmp_path):
    out = str(tmp_path / "bf_out")
    days = ["2024-01-02", "2024-01-01", "2024-01-03"]  # unsorted input
    res = driver.backfill(
        spark, "daily_events", sf_dir, days, out, catchup=False
    )
    assert [r.day for r in res] == ["2024-01-03"]
    got = sorted(
        str(r["report_date"])
        for r in spark.read.parquet(out).select("report_date")
        .distinct().collect()
    )
    assert got == ["2024-01-03"]


def test_backfill_cli_mode(sf_dir, tmp_path):
    """--backfill-start/--backfill-end drive the same path through
    main(); one JSON line per day."""
    import io
    from contextlib import redirect_stdout

    out = str(tmp_path / "bf_cli")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = driver.main([
            "--job", "daily_events", "--sf-dir", sf_dir, "--out", out,
            "--backfill-start", "2024-01-01",
            "--backfill-end", "2024-01-02",
            "--retries", "0", "--retry-delay", "0",
        ])
    assert rc == 0
    lines = [json.loads(x) for x in buf.getvalue().strip().splitlines()]
    assert [x["day"] for x in lines] == ["2024-01-01", "2024-01-02"]
    assert all(not x["skipped"] for x in lines)
