"""Multi-day event merge tests (main_analyze.py equivalent)."""

import datetime

import numpy as np
import pandas as pd
import pytest

from meteor_scatter_tpu.apps.merge import (
    detections_per_day,
    detections_per_hour,
    hour_day_matrix,
    merge_event_csvs,
    render_html_report,
    render_plots,
)
from meteor_scatter_tpu.io.events_csv import OutputDetection, write_event_csv


def write_day(path, day, hours):
    dets = []
    for h, n in hours.items():
        for i in range(n):
            t0 = datetime.datetime.combine(day, datetime.time(h, i, 0))
            dets.append(
                OutputDetection(
                    t_start=h * 3600.0 + i,
                    t_stop=h * 3600.0 + i + 1,
                    dur_s=1.0,
                    dB=10.0,
                    utc_start=t0,
                    utc_stop=t0 + datetime.timedelta(seconds=1),
                )
            )
    write_event_csv(path, dets)


def test_merge_and_aggregations(tmp_path):
    d1 = datetime.date(2026, 8, 1)
    d2 = datetime.date(2026, 8, 2)
    p1 = str(tmp_path / "a.csv")
    p2 = str(tmp_path / "b.csv")
    write_day(p1, d1, {0: 3, 5: 2})
    write_day(p2, d2, {5: 4})

    df = merge_event_csvs([p1, p2])
    assert len(df) == 9
    per_day = detections_per_day(df)
    assert per_day[pd.Timestamp(d1)] == 5
    assert per_day[pd.Timestamp(d2)] == 4
    per_hour = detections_per_hour(df)
    assert per_hour[pd.Timestamp("2026-08-01 05:00")] == 2
    mat = hour_day_matrix(df)
    assert mat.loc[d1, 0] == 3
    assert mat.loc[d2, 5] == 4
    assert mat.shape[1] == 24


def test_render_plots(tmp_path):
    p1 = str(tmp_path / "a.csv")
    write_day(p1, datetime.date(2026, 8, 1), {3: 2, 12: 1})
    df = merge_event_csvs([p1])
    written = render_plots(df, str(tmp_path / "out"))
    assert len(written) == 3
    import os

    for w in written:
        assert os.path.getsize(w) > 0


def test_render_html_report(tmp_path):
    d1 = datetime.date(2026, 8, 1)
    d2 = datetime.date(2026, 8, 2)
    p1 = str(tmp_path / "a.csv")
    p2 = str(tmp_path / "b.csv")
    write_day(p1, d1, {0: 3, 5: 2})
    write_day(p2, d2, {5: 4})
    df = merge_event_csvs([p1, p2])
    out = render_html_report(df, str(tmp_path / "report.html"))
    html = open(out).read()
    # self-contained: no external scripts/stylesheets
    assert "http://" not in html and "https://" not in html
    assert "<script" in html and "<svg" in html
    # hour bars carry hover tooltips with the counts
    assert "Detektionen pro Stunde" in html
    assert "05:00 UTC: <b>4</b>" in html  # heatmap cell for day 2 hour 5
    # one bar per hour bucket + one per day bucket, each with a tooltip handler
    assert html.count('class="bar"') == len(detections_per_hour(df)) + len(
        detections_per_day(df)
    )
    assert html.count("onmousemove") >= len(detections_per_hour(df))
