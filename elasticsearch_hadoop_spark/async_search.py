"""Async search — the ``_async_search`` veneer over background Spark jobs.

ES async search submits a query, returns an id immediately, and lets the
caller poll: ``POST /idx/_async_search`` -> ``GET _async_search/<id>`` ->
``DELETE _async_search/<id>`` (cancel).  The engine analogue: Spark
supports concurrent job submission from multiple threads of one session,
and per-thread *job groups* make cancellation real — ``DELETE`` maps to
``SparkContext.cancelJobGroup``, which interrupts the running stages, not
just forgets the handle.

Faithful subset:

- ``submit`` takes the result-building DataFrame (or a zero-arg callable
  returning one, evaluated on the worker thread) and an optional
  ``wait_for_completion_timeout`` — if the job finishes inside the
  window the response is complete on first return, exactly ES's
  short-circuit.
- ``get`` polls; ``is_running``/``is_partial`` flip to False once the
  collect lands.  Partial *results* (per-shard progressive aggs) are not
  simulated — while running, the response carries no rows (documented
  deviation; ES itself only guarantees partials for some query shapes).
- ``keep_on_completion=False`` stores nothing once the complete
  response has been handed out — whether that happens inside submit's
  wait window or at the first ``get`` that observes completion (ES's
  contract; time-based expiry is the caller's cron:
  ``expire(older_than, now)``).

Results are capped at ``max_rows`` (default 10k, the ES hit-window
spirit): an async *search* returns a page, not an unbounded collect —
at 100 TB an uncapped driver-side collect is the bug, so the cap is
load-bearing, not cosmetic.
"""

from __future__ import annotations

import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class AsyncSearchError(ValueError):
    pass


class AsyncSearch:
    """Registry of in-flight/completed async searches for one session."""

    def __init__(self, spark: SparkSession, max_workers: int = 4):
        self._spark = spark
        self._pool = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="async-search"
        )
        self._lock = threading.Lock()
        self._searches: dict[str, dict] = {}
        self._seq = 0

    # ------------------------------------------------------------ submit
    def submit(
        self,
        query: DataFrame | Callable[[], DataFrame],
        *,
        wait_for_completion_timeout: float = 0.0,
        keep_on_completion: bool = True,
        max_rows: int = 10_000,
    ) -> dict:
        """``POST _async_search``: launch the collect on a pool thread
        under a cancellable job group; return the id (and the full
        response already, if it completes inside the wait window)."""
        with self._lock:
            self._seq += 1
            sid = f"as-{self._seq}-{os.urandom(4).hex()}"
        entry: dict = {
            "id": sid,
            "submitted_at": time.time(),
            "done": threading.Event(),
            "rows": None,
            "schema": None,
            "error": None,
            "keep": keep_on_completion,
        }
        with self._lock:
            self._searches[sid] = entry

        def run():
            sc = self._spark.sparkContext
            # thread-local: group only this search's jobs; interrupt on
            # cancel so DELETE stops running stages
            sc.setJobGroup(sid, f"async search {sid}", interruptOnCancel=True)
            try:
                df = query() if callable(query) else query
                rows = df.limit(max_rows).collect()
                entry["rows"] = [r.asDict(recursive=True) for r in rows]
                entry["schema"] = df.columns
            except Exception as e:  # surfaced via status/get, like ES
                entry["error"] = str(e)
            finally:
                sc.setJobGroup("", "")
                entry["done"].set()

        entry["future"] = self._pool.submit(run)
        if wait_for_completion_timeout > 0:
            entry["done"].wait(wait_for_completion_timeout)
        out = self._render(entry)
        if entry["done"].is_set() and not keep_on_completion:
            # the complete response is being returned right now; ES's
            # keep_on_completion=false stores nothing past this point
            with self._lock:
                self._searches.pop(sid, None)
        return out

    # ------------------------------------------------------------- reads
    def _entry(self, sid: str) -> dict:
        with self._lock:
            e = self._searches.get(sid)
        if e is None:
            raise AsyncSearchError(f"no such async search {sid!r}")
        return e

    def _render(self, entry: dict) -> dict:
        running = not entry["done"].is_set()
        out = {
            "id": entry["id"],
            "is_running": running,
            "is_partial": running,
            "start_time": entry["submitted_at"],
        }
        if not running:
            if entry["error"] is not None:
                out["error"] = entry["error"]
            else:
                out["response"] = {
                    "columns": entry["schema"],
                    "rows": entry["rows"],
                    "total": len(entry["rows"]),
                }
        return out

    def status(self, sid: str) -> dict:
        """``GET _async_search/status/<id>``: flags only, no payload."""
        e = self._entry(sid)
        return {
            "id": sid,
            "is_running": not e["done"].is_set(),
            "is_partial": not e["done"].is_set(),
        }

    def get(self, sid: str, wait_for_completion_timeout: float | None = None) -> dict:
        """``GET _async_search/<id>`` with the optional wait window."""
        e = self._entry(sid)
        if wait_for_completion_timeout:
            e["done"].wait(wait_for_completion_timeout)
        out = self._render(e)
        if e["done"].is_set() and not e["keep"]:
            with self._lock:
                self._searches.pop(sid, None)
        return out

    # ----------------------------------------------------------- cancel
    def delete(self, sid: str) -> dict:
        """``DELETE _async_search/<id>``: cancel the search and drop the
        stored response.  A QUEUED search (pool busy, worker thread not
        started) is cancelled at the future, where cancelJobGroup cannot
        reach it yet; a RUNNING one is cancelled at the job group, which
        interrupts its stages."""
        e = self._entry(sid)
        if not e["done"].is_set():
            e["future"].cancel()
            self._spark.sparkContext.cancelJobGroup(sid)
        with self._lock:
            self._searches.pop(sid, None)
        return {"id": sid, "acknowledged": True}

    def expire(self, older_than_seconds: float, now: float | None = None) -> list[str]:
        """Drop completed responses older than the horizon (the caller's
        cron replaces ES's keep_alive expiry service)."""
        now = time.time() if now is None else now
        dropped = []
        with self._lock:
            for sid, e in list(self._searches.items()):
                if e["done"].is_set() and (
                    now - e["submitted_at"] >= older_than_seconds
                ):
                    self._searches.pop(sid)
                    dropped.append(sid)
        return dropped
