"""Watcher-style alerting — ES Watcher semantics over batch/micro-batch.

ES Watcher runs a scheduled watch: an *input* (a search), a *condition*
over the search payload, and *actions* when the condition holds:

    PUT _watcher/watch/errors
    {"trigger":   {"schedule": {"interval": "5m"}},
     "input":     {"search": {"request": {"indices": ["logs-*"],
                    "body": {"query": {"term": {"level": "error"}}}}}},
     "condition": {"compare": {"ctx.payload.hits.total": {"gte": 10}}},
     "actions":   {"store": {"index": {"index": "alerts"}}}}

Spark-first mapping: there is no server scheduler — the *tick* is an
explicit call the caller schedules (a cron, or a Structured Streaming
``foreachBatch``).  Two evaluation paths:

- ``execute_watch(watch, frames, ...)`` — one watch, full fidelity:
  the input search compiles through query_dsl (+ optional aggs through
  aggs_dsl), the condition reads the payload, and the ``index`` action
  appends the alert document to a catalog index.  The analogue of
  ``POST _watcher/watch/_execute``.
- ``run_watches(docs, watches, min_hits_col=...)`` — the scale path: MANY
  watches evaluated in ONE pass over the batch via the percolator
  (operators.percolate): each doc is labeled with every matching watch
  id inside a single codegen projection, then one hash-agg counts hits
  per watch and applies each watch's min-hits threshold.  At 100 TB this
  is the only shape that works — per-watch scans would be O(watches)
  passes over the data.

``trigger.schedule`` is honored by ``due_watches`` (pure bookkeeping over
a last-fire-time map) so a caller's cron can ask "which watches are due
at t?" — the engine never sleeps or spawns threads itself.  ``now`` is an
explicit parameter everywhere; ticks are deterministic and testable.

Throttling: pass ``state`` (a mutable dict the caller persists) to
``execute_watch`` — a fired action records its fire time under
``(watch_id, action_name)`` and an action carrying ``throttle_period``
is suppressed (recorded as ``"throttled": True``, not executed) inside
the window, exactly ES's per-action throttling.  ``due_watches`` shares
the same caller-persisted-state idiom for schedules.

State durability (ES keeps watch status in the ``.watcher`` index):
``load_watcher_state`` / ``save_watcher_state`` round-trip the state
dict through a catalog index, so throttle windows and acks survive
process restarts.  ``ack_watch`` implements ``_watcher/watch/_ack``:
an acked action is suppressed (``"acked": True``) on every firing until
the watch's condition evaluates FALSE, which resets the ack — ES's
``awaits_successful_execution`` reset rule.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.aggs_dsl import compile_aggs
from elasticsearch_hadoop_spark.operators.percolate import percolate
from elasticsearch_hadoop_spark.query_dsl import compile_query


class WatcherError(ValueError):
    pass


def parse_interval(v) -> float:
    from elasticsearch_hadoop_spark.durations import parse_duration

    return parse_duration(v, WatcherError)


def due_watches(watches: dict[str, dict], state: dict[str, float],
                now: float) -> list[str]:
    """Which watch ids are due at ``now`` given each watch's
    ``trigger.schedule.interval`` and the last-fire map ``state``."""
    due = []
    for wid, w in watches.items():
        interval = parse_interval(
            ((w.get("trigger") or {}).get("schedule") or {}).get("interval", 0)
        )
        if now - state.get(wid, float("-inf")) >= interval:
            due.append(wid)
    return due


def _payload_get(payload: dict, path: str) -> Any:
    """Resolve ``ctx.payload.hits.total``-style dotted paths."""
    if not path.startswith("ctx.payload."):
        raise WatcherError(f"compare paths must start with ctx.payload.: {path!r}")
    cur: Any = payload
    for part in path[len("ctx.payload."):].split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            raise WatcherError(f"payload has no {path!r}")
    return cur


_OPS = {
    "eq": lambda a, b: a == b,
    "not_eq": lambda a, b: a != b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
}


def _condition_met(condition: dict | None, payload: dict) -> bool:
    if not condition or "always" in condition:
        return True
    if "never" in condition:
        return False
    if "compare" in condition:
        comp = condition["compare"]
        if len(comp) != 1:
            raise WatcherError("compare takes exactly one path")
        (path, spec), = comp.items()
        value = _payload_get(payload, path)
        for op, rhs in spec.items():
            fn = _OPS.get(op)
            if fn is None:
                raise WatcherError(f"unsupported compare op {op!r}")
            if not fn(value, rhs):
                return False
        return True
    raise WatcherError(f"unsupported condition {sorted(condition)!r}")


_ACK = "#ack"  # state-key suffix marking an acknowledged action


def ack_watch(state: dict, watch_id: str, actions: list[str]) -> None:
    """``PUT _watcher/watch/<id>/_ack/<actions>``: suppress the listed
    actions on future firings until the watch condition next evaluates
    false (execute_watch clears the ack then, per ES)."""
    for a in actions:
        state[f"{watch_id}/{a}{_ACK}"] = True


def load_watcher_state(catalog, index: str = "watcher_state") -> dict:
    """Load the caller-persisted watcher state from a catalog index
    (columns ``key``/``last_fire``/``acked`` — the engine's ``.watcher``
    analogue).  ONLY a missing index maps to empty state (first run);
    any other read failure propagates — silently wiping the state would
    re-fire every throttled/acked alert."""
    from elasticsearch_hadoop_spark.catalog import IndexNotFoundError

    try:
        rows = catalog.read_index(index).collect()
    except (FileNotFoundError, IndexNotFoundError):
        # typed missing-index signal (not message-text matching): only a
        # genuinely absent index is a first run
        return {}
    state: dict = {}
    for r in rows:
        if r["last_fire"] is not None:
            state[r["key"]] = float(r["last_fire"])
        if r["acked"]:
            state[f"{r['key']}{_ACK}"] = True
    return state


def save_watcher_state(catalog, state: dict, index: str = "watcher_state") -> None:
    """Persist the state dict (overwrite — the state is tiny: one row per
    (watch, action))."""
    base: dict[str, dict] = {}
    for k, v in state.items():
        if k.endswith(_ACK):
            base.setdefault(k[: -len(_ACK)], {})["acked"] = True
        else:
            base.setdefault(k, {})["last"] = float(v)
    rows = [
        (k, spec.get("last"), bool(spec.get("acked", False)))
        for k, spec in sorted(base.items())
    ]
    spark = catalog.spark
    catalog.write_index(
        spark.createDataFrame(rows, "key string, last_fire double, acked boolean"),
        index,
        mode="overwrite",
        id_col="key",
    )


def execute_watch(
    watch: dict,
    frames: dict[str, DataFrame] | None = None,
    catalog=None,
    *,
    max_hits: int = 10,
    now: float | None = None,
    state: dict | None = None,
) -> dict:
    """``POST _watcher/watch/_execute``: run the input search, evaluate
    the condition, and (when met) run actions.  Returns the execution
    record: ``{"condition_met", "payload", "actions"}``.

    The input search resolves each entry of ``indices`` through
    ``frames`` first, then ``catalog.read_index`` (wildcards/aliases
    included).  ``body.query`` compiles to a pushed-down predicate;
    ``body.aggs`` (optional) runs through the aggs-DSL compiler and
    lands in ``payload["aggregations"]`` as collected rows.  ``hits``
    carries ``total`` (a count, computed without collecting data) and at
    most ``max_hits`` sample rows.

    Actions (subset): ``index`` appends one alert document per firing to
    the named catalog index (requires ``catalog``); ``logging`` renders
    its text with ``{{ctx.payload.*}}`` templates and returns it.  Both
    are returned in the record; unknown actions raise.  ``state`` (a
    caller-persisted dict) + a per-action ``throttle_period`` suppress
    re-fires inside the window and stamp fire times at ``now``."""
    req = ((watch.get("input") or {}).get("search") or {}).get("request")
    if not req:
        raise WatcherError("watch needs input.search.request")
    indices = req.get("indices")
    if not indices:
        raise WatcherError("input.search.request needs indices")
    parts = []
    for idx in indices:
        if frames and idx in frames:
            parts.append(frames[idx])
        elif catalog is not None:
            parts.append(catalog.read_index(idx))
        else:
            raise WatcherError(f"unknown index {idx!r} (no catalog given)")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    body = req.get("body") or {}
    if body.get("query"):
        df = df.filter(compile_query(body["query"]))
    total = df.count()
    payload: dict[str, Any] = {
        "hits": {
            "total": total,
            "hits": [r.asDict(recursive=True) for r in df.limit(max_hits).collect()],
        }
    }
    if body.get("aggs") or body.get("aggregations"):
        agg_df = compile_aggs(df, {"aggs": body.get("aggs") or body["aggregations"]})
        payload["aggregations"] = [
            r.asDict(recursive=True) for r in agg_df.collect()
        ]
    met = _condition_met(watch.get("condition"), payload)
    record: dict[str, Any] = {"condition_met": met, "payload": payload,
                              "actions": []}
    watch_id = str(watch.get("id", ""))
    if not met:
        # ES resets action acks once the condition evaluates false
        if state is not None:
            for k in [
                k for k in state
                if k.startswith(f"{watch_id}/") and k.endswith(_ACK)
            ]:
                del state[k]
        return record
    import time as _time

    now = _time.time() if now is None else now
    for name, action in (watch.get("actions") or {}).items():
        action = dict(action)
        # per-action meta keys sit NEXT TO the action type in ES bodies
        throttle = action.pop("throttle_period", None)
        action.pop("condition", None)  # per-action conditions unsupported
        if len(action) != 1:
            raise WatcherError(
                f"action {name!r} must carry exactly one action type, "
                f"got {sorted(action)}"
            )
        (akind, acfg), = action.items()
        if state is not None and state.get(f"{watch_id}/{name}{_ACK}"):
            record["actions"].append(
                {"name": name, "type": akind, "acked": True}
            )
            continue
        if throttle is not None and state is not None:
            key = f"{watch_id}/{name}"
            last = state.get(key)
            if last is not None and now - last < parse_interval(throttle):
                record["actions"].append(
                    {"name": name, "type": akind, "throttled": True}
                )
                continue
        if akind == "index":
            if catalog is None:
                raise WatcherError(f"action {name!r}: index action needs a catalog")
            alert = {
                "watch_id": str(watch.get("id", name)),
                "hits_total": total,
                "payload_json": json.dumps(payload, default=str, sort_keys=True),
            }
            spark = df.sparkSession
            catalog.write_index(
                spark.createDataFrame(
                    [tuple(alert.values())],
                    "watch_id string, hits_total long, payload_json string",
                ),
                acfg["index"],
                mode="append",
            )
            record["actions"].append(
                {"name": name, "type": "index", "index": acfg["index"]}
            )
            if state is not None:
                state[f"{watch_id}/{name}"] = now
        elif akind == "logging":
            text = str(acfg.get("text", ""))
            rendered = re.sub(
                r"\{\{\s*(ctx\.payload\.[A-Za-z0-9_.]+)\s*\}\}",
                lambda m: str(_payload_get(payload, m.group(1))),
                text,
            )
            record["actions"].append(
                {"name": name, "type": "logging", "text": rendered}
            )
            if state is not None:
                state[f"{watch_id}/{name}"] = now
        else:
            raise WatcherError(f"unsupported action type {akind!r}")
    return record


def run_watches(
    docs: DataFrame,
    watches: DataFrame,
    *,
    query_col: str = "query",
    id_col: str = "_id",
    min_hits_col: str | None = None,
) -> DataFrame:
    """The percolator scale path: evaluate EVERY watch's query against a
    batch in one pass.  ``watches`` rows carry the query-DSL JSON in
    ``query_col``, the watch id in ``id_col``, and (optionally) a
    per-watch minimum hit count in ``min_hits_col`` (default 1).

    Returns one row per watch that fired: ``watch_id``, ``hit_count``.
    Shape: one codegen projection labels each doc with every matching
    watch (operators.percolate), one hash-agg counts per watch, one
    broadcast join applies thresholds — no per-watch scans."""
    hits = percolate(
        docs, watches, query_col=query_col, query_id_col=id_col, keep_cols=[]
    )
    counts = hits.groupBy(F.col("matched_query").alias("watch_id")).agg(
        F.count(F.lit(1)).alias("hit_count")
    )
    if min_hits_col is None:
        return counts.filter(F.col("hit_count") >= 1)
    thresholds = watches.select(
        F.col(id_col).cast("string").alias("watch_id"),
        F.coalesce(F.col(min_hits_col), F.lit(1)).alias("__min_hits"),
    )
    return (
        counts.join(F.broadcast(thresholds), "watch_id")
        .filter(F.col("hit_count") >= F.col("__min_hits"))
        .drop("__min_hits")
    )
