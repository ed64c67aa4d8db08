"""Wall-clock throughput meter.

Field-compatible with the reference's progress meter (reference tools.py:24-64):
``speed_ela``/``speed_delta`` in units/s, elapsed/delta time strings with the
sub-second part stripped, so `.kin.json` provenance fields (``creation_speed``,
``creation_duration``) carry the same shapes of values.
"""

from __future__ import annotations

import datetime


class Timer:
    def __init__(self) -> None:
        self.time_begin = datetime.datetime.now()
        self.time_last = self.time_begin
        self.val_last = 0
        self.val_delta = 0
        self.time_ela = datetime.timedelta(seconds=0)
        self.time_delta = datetime.timedelta(seconds=0)
        self.time_ela_s = "none"
        self.time_delta_s = "none"
        self.speed_ela = 0
        self.speed_delta = 0

    @property
    def time_delta_seconds(self) -> float:
        return (datetime.datetime.now() - self.time_last).total_seconds()

    def update(self, val: int) -> None:
        now = datetime.datetime.now()
        self.time_ela = now - self.time_begin
        self.time_delta = now - self.time_last
        self.time_ela_s = str(self.time_ela).split(".", 2)[0]
        self.time_delta_s = str(self.time_delta).split(".", 2)[0]
        self.val_delta = val - self.val_last
        ela_s = self.time_ela.total_seconds()
        dlt_s = self.time_delta.total_seconds()
        self.speed_ela = int(val // ela_s) if ela_s > 0 else 0
        self.speed_delta = int(self.val_delta // dlt_s) if dlt_s > 0 else 0
        self.time_last = now
        self.val_last = val

    def __str__(self) -> str:
        return (
            f"ela   time {self.time_ela_s} val {self.val_last:15,d} speed {self.speed_ela:15,d}\n"
            f"delta time {self.time_delta_s} val {self.val_delta:15,d} speed {self.speed_delta:15,d}"
        )
