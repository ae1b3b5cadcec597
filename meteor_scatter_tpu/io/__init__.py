"""Host-side I/O: WAV ingest, CSV ledgers, event exports, image export.

Device code produces event tensors; everything here stays in Python on the
host, mirroring the reference's filesystem contracts byte-for-byte (daily
``YYYYMMDD.csv`` with ``Timestamp;Anzahl;Kritisch`` header, event CSVs,
Audacity label files, per-event spectrogram images)."""

from meteor_scatter_tpu.io.wavio import read_wav, write_wav, stream_wav_blocks  # noqa: F401
from meteor_scatter_tpu.io.ledger import HourlyLedger  # noqa: F401
from meteor_scatter_tpu.io.events_csv import (  # noqa: F401
    OutputDetection,
    write_audacity_labels,
    write_event_csv,
    events_to_detections,
)
from meteor_scatter_tpu.io.png import write_png, colorize  # noqa: F401
