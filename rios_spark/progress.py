"""Progress callbacks (SURVEY.md U5) — the cuiprogress analogue.

RIOS reports percent-done through a progress object handed to
``applier.apply`` (rios/cuiprogress.py; wired in rios/applier.py via
controls.progress). Spark already tracks task completion centrally, so
the re-expression is a poller over ``SparkContext.statusTracker()``: a
daemon thread samples (completed, total) tasks across active jobs and
invokes the user callback — no instrumentation inside kernels, no
per-task overhead, works for ANY action (write, collect, count).

Usage::

    with ProgressMonitor(spark, cb) as _:
        df.write.parquet(...)

where ``cb(completed_tasks, total_tasks, pct)``. ``cui_progress``
prints a RIOS-style percent line.
"""

from __future__ import annotations

import sys
import threading
import time
from typing import Callable

ProgressCallback = Callable[[int, int, float], None]


def cui_progress(completed: int, total: int, pct: float) -> None:
    """Print-style callback, like rios.cuiprogress.CUIProgressBar."""
    sys.stdout.write(f"\r{pct:5.1f}% ({completed}/{total} tasks)")
    sys.stdout.flush()


class ProgressMonitor:
    """Polls the Spark status tracker while the body runs.

    The callback fires at most once per ``poll`` seconds and once more
    at exit with the final counts. Tasks are summed over every job that
    becomes active while the monitor is alive (a single DataFrame
    action can spawn several jobs — e.g. AQE re-planning)."""

    def __init__(self, spark, callback: ProgressCallback = cui_progress, poll: float = 0.5):
        self._sc = spark.sparkContext
        self._cb = callback
        self._poll = poll
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seen_stages: set[int] = set()

    def _sample(self) -> tuple[int, int]:
        tracker = self._sc.statusTracker()
        done = total = 0
        for jid in tracker.getActiveJobsIds():
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                self._seen_stages.add(sid)
        for sid in self._seen_stages:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is None:
                continue
            # Skipped stages (reused shuffle output, AQE re-planning)
            # report numTasks > 0 but never run a task — counting them
            # inflates the denominator so 100% is unreachable. Only
            # stages that show activity participate in the ratio.
            ran = (
                sinfo.numActiveTasks > 0
                or sinfo.numCompletedTasks > 0
                or sinfo.numFailedTasks > 0
            )
            if not ran:
                continue
            total += sinfo.numTasks
            done += min(sinfo.numCompletedTasks, sinfo.numTasks)
        return done, total

    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            done, total = self._sample()
            if total > 0:
                self._cb(done, total, 100.0 * done / total)

    def __enter__(self) -> "ProgressMonitor":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        done, total = self._sample()
        if total > 0:
            self._cb(done, total, 100.0 * done / total)
