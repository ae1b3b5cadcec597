"""Multi-day event CSV analysis — re-design of `dsp/src/main_analyze.py`.

Merges per-day event CSVs produced by the batch analyzer
(`main.py:640-658` schema: t_start,t_stop,dur_s,dB,utc_start,utc_stop),
coerces UTC timestamps, and renders detections-per-hour, per-day, and a
date×hour heatmap (`main_analyze.py:14-188`).

Usage::

    python -m meteor_scatter_tpu.apps.merge out_*.csv --out-dir plots/
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import List, Optional

import numpy as np
import pandas as pd


def merge_event_csvs(paths: List[str]) -> pd.DataFrame:
    """Concat + UTC coercion + sort (main_analyze.py:14-45)."""
    frames = []
    for p in paths:
        try:
            frames.append(pd.read_csv(p))
        except Exception as e:  # noqa: BLE001 — skip unreadable files
            print(f"Error loading {p}: {e}")
    if not frames:
        raise ValueError("no event CSVs could be loaded")
    df = pd.concat(frames, ignore_index=True)
    df["utc_start"] = pd.to_datetime(df["utc_start"], errors="coerce")
    df["utc_stop"] = pd.to_datetime(df["utc_stop"], errors="coerce")
    df = df.dropna(subset=["utc_start"]).sort_values("utc_start").reset_index(drop=True)
    return df


def detections_per_hour(df: pd.DataFrame) -> pd.Series:
    return df.groupby(df["utc_start"].dt.floor("h")).size()


def detections_per_day(df: pd.DataFrame) -> pd.Series:
    return df.groupby(df["utc_start"].dt.floor("D")).size()


def hour_day_matrix(df: pd.DataFrame) -> pd.DataFrame:
    """date × hour count matrix for the heatmap (main_analyze.py:153-188)."""
    tmp = pd.DataFrame(
        {"date": df["utc_start"].dt.date, "hour": df["utc_start"].dt.hour}
    )
    mat = tmp.groupby(["date", "hour"]).size().unstack(fill_value=0)
    return mat.reindex(columns=range(24), fill_value=0)


def render_plots(df: pd.DataFrame, out_dir: str) -> List[str]:
    """Bar charts + heatmap; requires matplotlib (present in this image),
    degrades to CSV dumps without it."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    per_hour = detections_per_hour(df)
    per_day = detections_per_day(df)
    mat = hour_day_matrix(df)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        for name, obj in [("per_hour", per_hour), ("per_day", per_day), ("heatmap", mat)]:
            p = os.path.join(out_dir, f"{name}.csv")
            obj.to_csv(p)
            written.append(p)
        return written

    fig, ax = plt.subplots(figsize=(12, 6))
    per_hour.plot.bar(ax=ax, color="skyblue")
    ax.set_xlabel("UTC (Datum + Stunde)")
    ax.set_ylabel("Anzahl der Detektionen")
    ax.set_title("Detektionen pro Stunde")
    ax.set_xticklabels([d.strftime("%Y-%m-%d %H:%M") for d in per_hour.index],
                       rotation=45, ha="right")
    fig.tight_layout()
    p = os.path.join(out_dir, "per_hour.png")
    fig.savefig(p, dpi=150)
    plt.close(fig)
    written.append(p)

    fig, ax = plt.subplots(figsize=(12, 6))
    per_day.plot.bar(ax=ax, color="steelblue")
    ax.set_xlabel("Datum")
    ax.set_ylabel("Anzahl der Detektionen")
    ax.set_title("Detektionen pro Tag")
    ax.set_xticklabels([d.strftime("%Y-%m-%d") for d in per_day.index], rotation=45, ha="right")
    fig.tight_layout()
    p = os.path.join(out_dir, "per_day.png")
    fig.savefig(p, dpi=150)
    plt.close(fig)
    written.append(p)

    fig, ax = plt.subplots(figsize=(14, max(4, 0.4 * len(mat))))
    im = ax.imshow(mat.values, aspect="auto", cmap="viridis")
    ax.set_xticks(range(24))
    ax.set_yticks(range(len(mat)))
    ax.set_yticklabels([d.strftime("%Y-%m-%d") for d in mat.index])
    ax.set_xlabel("Stunde (UTC)")
    ax.set_title("Detektionen: Datum × Stunde")
    fig.colorbar(im, ax=ax, label="Anzahl")
    fig.tight_layout()
    p = os.path.join(out_dir, "heatmap.pdf")
    fig.savefig(p)
    plt.close(fig)
    written.append(p)
    return written


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("csvs", nargs="+", help="event CSV files or globs")
    p.add_argument("--out-dir", default="analysis")
    args = p.parse_args(argv)

    paths: List[str] = []
    for pattern in args.csvs:
        paths.extend(sorted(glob.glob(pattern)))
    df = merge_event_csvs(paths)
    print(f"Merged {len(paths)} files -> {len(df)} detections "
          f"({df['utc_start'].min()} .. {df['utc_start'].max()})")
    written = render_plots(df, args.out_dir)
    for w in written:
        print("wrote", w)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
