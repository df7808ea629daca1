"""SLM — snapshot lifecycle policies over the catalog's snapshot API.

ES registers a policy and a server-side scheduler runs it:

    PUT _slm/policy/nightly
    {"schedule": "0 30 1 * * ?", "name": "<nightly-{now/d}>",
     "repository": "backups",
     "config": {"indices": "logs-*"},
     "retention": {"expire_after": "30d", "min_count": 5, "max_count": 50}}

Spark-first mapping (same discipline as ilm.py: upstream schedules
server-side; here the *tick* is an explicit, idempotent library call the
caller schedules — a cron, an Airflow task, a streaming micro-batch):

- ``execute_slm_policy(catalog, name, now)`` = ES ``POST
  _slm/policy/<name>/_execute`` — snapshot every index matching
  ``config.indices`` into the policy's repository under the resolved
  snapshot name (the ``<prefix-{now/d}>`` date-math subset, formatted
  from the EXPLICIT ``now``; a trailing epoch suffix keeps multiple
  executions per day unique, where ES appends a UUID).
- ``slm_retention_tick(catalog, name, now)`` = the retention run ES
  schedules nightly: drop snapshots older than ``expire_after``, never
  below ``min_count``, and trim the oldest above ``max_count`` — ES's
  documented precedence (min_count wins over expire_after; max_count
  trims regardless of age).

Policy state (per-policy snapshot history with taken_at stamps) persists
next to the catalog's ILM policies, so ticks are idempotent and
re-runnable; ``now`` is an explicit parameter everywhere so every
decision is deterministic and testable.  The snapshots themselves are
``catalog.snapshot_index`` output — at 100 TB each execution copies only
the policy's matched indices, and retention deletes whole snapshot
directories without reading a row.

Upstream parity: the public _slm API (policy body fields, execute,
retention rules); history/stats endpoints are rendered by
``get_slm_policy`` returning the recorded executions.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from elasticsearch_hadoop_spark.ilm import parse_age


class SlmError(ValueError):
    pass


_NAME_RE = re.compile(r"^<(.*)\{now/d\}(.*)>$")


def _state_path(catalog) -> str:
    return os.path.join(catalog.root, "_slm.json")


def _load(catalog) -> dict:
    p = _state_path(catalog)
    if not os.path.exists(p):
        return {"policies": {}}
    with open(p) as fh:
        return json.load(fh)


def _save(catalog, state: dict) -> None:
    p = _state_path(catalog)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, p)


def validate_slm_policy(policy: dict) -> dict:
    for key in ("name", "repository"):
        if key not in policy:
            raise SlmError(f"SLM policy needs {key!r}")
    nm = policy["name"]
    # reject-don't-approximate (the ilm.validate_policy discipline): a
    # date-math name this engine can't resolve must fail at PUT time,
    # not mint a literal '<nightly-{now/M}>' directory at execute time
    if (nm.startswith("<") or nm.endswith(">")) and not _NAME_RE.match(nm):
        raise SlmError(
            f"unsupported date-math snapshot name {nm!r} — only the "
            "<prefix-{now/d}-suffix> form is implemented"
        )
    ret = policy.get("retention", {})
    unknown = set(ret) - {"expire_after", "min_count", "max_count"}
    if unknown:
        raise SlmError(f"unknown retention keys {sorted(unknown)}")
    if "expire_after" in ret:
        parse_age(ret["expire_after"])  # raises on junk
    mn = int(ret.get("min_count", 0))
    mx = ret.get("max_count")
    if mx is not None and int(mx) < max(mn, 1):
        raise SlmError(f"max_count {mx} below min_count {mn}")
    return policy


def put_slm_policy(catalog, name: str, policy: dict) -> None:
    """ES ``PUT _slm/policy/<name>``."""
    validate_slm_policy(policy)
    state = _load(catalog)
    prior = state["policies"].get(name, {})
    state["policies"][name] = {
        "policy": policy,
        "snapshots": prior.get("snapshots", []),
    }
    _save(catalog, state)


def get_slm_policy(catalog, name: str) -> dict:
    """ES ``GET _slm/policy/<name>`` — the policy plus its recorded
    executions (the history/stats rendering)."""
    state = _load(catalog)
    if name not in state["policies"]:
        raise SlmError(f"no SLM policy {name!r}")
    return state["policies"][name]


def resolve_snapshot_name(pattern: str, now: float) -> str:
    """The ``<prefix-{now/d}>`` date-math subset: format ``now`` (UTC) as
    yyyy.MM.dd inside the angle brackets; a plain name passes through.
    The epoch-seconds suffix keeps one execution per second unique
    (ES appends a UUID for the same reason)."""
    m = _NAME_RE.match(pattern)
    stamp = time.strftime("%Y.%m.%d", time.gmtime(now))
    if m:
        return f"{m.group(1)}{stamp}{m.group(2)}-{int(now)}"
    return pattern


def execute_slm_policy(catalog, name: str, now: float | None = None) -> dict:
    """ES ``POST _slm/policy/<name>/_execute``: snapshot every matched
    index under the resolved name; records taken_at for retention."""
    now = time.time() if now is None else float(now)
    state = _load(catalog)
    if name not in state["policies"]:
        raise SlmError(f"no SLM policy {name!r}")
    entry = state["policies"][name]
    policy = entry["policy"]
    snapshot = resolve_snapshot_name(policy["name"], now)
    pattern = (policy.get("config") or {}).get("indices", "*")
    indices = catalog.resolve_pattern(pattern)
    if not indices:
        raise SlmError(f"policy {name!r}: no indices match {pattern!r}")
    # all-or-nothing across the matched indices: a half-written snapshot
    # with no history entry would be invisible to retention AND block a
    # same-name retry forever — clean up what this call created, re-raise.
    # The cleanup must include the IN-FLIGHT index, not just `done`: the
    # parquet write creates repo/<snapshot>/<idx>/ before it finishes, so
    # a raise mid-write leaves a partial directory that would make a
    # same-`now` retry (the advertised idempotent-tick pattern) hit
    # IndexExistsError forever.  But ONLY when that directory did not
    # exist before the call — an obstruction created by someone else
    # (snapshot_index's own exists-check raise) is not ours to delete.
    manifests, done = [], []
    in_flight, pre_existing = None, False
    try:
        for idx in indices:
            in_flight = os.path.join(policy["repository"], snapshot, idx)
            pre_existing = os.path.exists(in_flight)
            manifests.append(
                catalog.snapshot_index(idx, policy["repository"], snapshot)
            )
            done.append(idx)
        # the history append is INSIDE the guarded region: a _save
        # failure after every snapshot succeeded would otherwise leave
        # dirs with no history entry — invisible to retention AND
        # blocking a same-name retry, the exact wedged state the cleanup
        # exists to prevent (the in-memory `entry` mutation is harmless:
        # state reloads from disk on every call)
        entry["snapshots"].append({"snapshot": snapshot, "taken_at": now})
        _save(catalog, state)
    except Exception:
        for idx in done:
            shutil.rmtree(
                os.path.join(policy["repository"], snapshot, idx),
                ignore_errors=True,
            )
        if in_flight is not None and not pre_existing:
            shutil.rmtree(in_flight, ignore_errors=True)
        # drop the snapshot-named parent too if the cleanup emptied it —
        # a failed tick that is never retried with the same `now` must
        # not accumulate junk dirs in the repository (rmdir refuses a
        # non-empty dir, so foreign content is safe)
        try:
            os.rmdir(os.path.join(policy["repository"], snapshot))
        except OSError:
            pass
        raise
    return {"snapshot_name": snapshot, "indices": indices, "manifests": manifests}


def slm_retention_tick(catalog, name: str, now: float | None = None) -> list[str]:
    """The retention run: returns the deleted snapshot names.  Rules in
    ES's documented precedence — ``expire_after`` ages snapshots out but
    ``min_count`` always keeps the newest N; ``max_count`` trims the
    oldest beyond N regardless of age."""
    now = time.time() if now is None else float(now)
    state = _load(catalog)
    if name not in state["policies"]:
        raise SlmError(f"no SLM policy {name!r}")
    entry = state["policies"][name]
    policy, snaps = entry["policy"], entry["snapshots"]
    ret = policy.get("retention", {})
    if not ret or not snaps:
        return []
    snaps = sorted(snaps, key=lambda s: (s["taken_at"], s["snapshot"]))
    mn = int(ret.get("min_count", 0))
    mx = ret.get("max_count")
    expire = parse_age(ret["expire_after"]) if "expire_after" in ret else None

    drop: list[dict] = []
    keep = list(snaps)
    if expire is not None:
        aged = [s for s in keep if now - s["taken_at"] > expire]
        # min_count wins: never age out below the newest min_count
        can_drop = max(0, len(keep) - mn)
        drop.extend(aged[:can_drop])
        keep = [s for s in keep if s not in drop]
    if mx is not None and len(keep) > int(mx):
        extra = len(keep) - int(mx)
        drop.extend(keep[:extra])
        keep = keep[extra:]

    repo = policy["repository"]
    for s in drop:
        target = os.path.join(repo, s["snapshot"])
        shutil.rmtree(target, ignore_errors=True)
    entry["snapshots"] = keep
    _save(catalog, state)
    return [s["snapshot"] for s in drop]
