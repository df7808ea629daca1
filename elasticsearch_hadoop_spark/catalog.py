"""The "index" abstraction — reference-parity core (SURVEY.md §7 step 1).

The reference (elasticsearch-hadoop) plumbs Spark to Elasticsearch indices:
``EsSparkSQL.esDF(name, query)`` reads, ``df.saveToEs(name, cfg)`` writes
(SURVEY.md §3.1/§3.2; upstream ``spark/sql-20/.../sql/DefaultSource.scala``,
``mr/.../rest/RestRepository.java`` — path-level citations per SURVEY.md §0).
Here an *index* is a managed Parquet directory: Spark-native columnar storage
replaces the document store, and Catalyst replaces the connector's pushdown
planner (scan A1, projection A2, filter A3 are native; see SURVEY.md §2.A).

Parity map (reference op -> this module):

- A5 bulk sink w/ op types          -> ``write_index(operation=...)``
  (``index``/``create``/``update``/``upsert``/``delete`` — the ES ``_bulk``
  op types, ``es.write.operation`` in ConfigurationOptions.java)
- A6 id/routing extraction          -> ``id_col`` / ``routing_col`` become
  materialized ``_id`` / ``_routing`` columns (FieldExtractor parity)
- A7 dynamic index routing          -> ``index_pattern="logs-{field}"`` or
  ``"{field|date:yyyy-MM-dd}"`` -> ``_index`` column + ``partitionBy``
  (AbstractIndexExtractor / IndexFormatter parity)
- A8 schema discovery               -> parquet is self-describing; field
  include/exclude via ``fields=`` on read (es.read.field.include parity)
- A10 count                         -> ``count_index`` (``_count`` parity)
- A11 scripted upsert               -> ``on_match={"col": Column}`` Spark
  expressions instead of painless scripts (UpdateBulkFactory parity)
- SaveMode semantics (§3.2 step 1)  -> mode="append"/"overwrite" (truncate
  parity)/"error"/"ignore"
- ``_metadata`` column (§1.1)       -> ``read_index(metadata=True)`` adds a
  MapType(String,String) column with _id/_index (es.read.metadata parity)
- es.query on read (§2.B)           -> ``query=`` accepts the ES query-DSL
  JSON subset compiled by ``query_dsl.compile_query``

Scale notes (100 TB):
- Merge ops (update/upsert/delete/create-conflict-check) are hash joins on
  ``_id`` — the only shuffle is on the merge key, and the incoming batch is
  broadcast when small (Spark AQE decides).  The commit is
  write-new-directory + atomic rename: coarse but correct single-writer
  semantics.  A production deployment swaps the commit layer for Delta/
  Iceberg ``MERGE INTO`` (same join shape, finer-grained file rewrite);
  nothing above the commit changes.
- ``index_pattern`` routing writes with ``partitionBy(_index)`` -> Hive-style
  directory layout, so per-index reads are partition-pruned scans.
- Append never reads existing data: blind parquet append, no shuffle.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark import txn
from elasticsearch_hadoop_spark.durations import parse_duration
from elasticsearch_hadoop_spark.query_dsl import compile_query

_PATTERN_RE = re.compile(r"\{([A-Za-z0-9_.]+)(\|date:([^}]+))?\}")

# Java SimpleDateFormat tokens used by the reference's IndexFormatter are a
# subset compatible with Spark's date_format patterns (yyyy MM dd HH mm ss).
VALID_OPERATIONS = ("index", "create", "update", "upsert", "delete")
VALID_MODES = ("append", "overwrite", "error", "ignore")


def _merge_schema_json(stored: dict, new_schema) -> dict:
    """Union a stored schema-JSON with a newly written frame's schema BY
    FIELD NAME: stored fields keep their position and type (an ES mapping
    conflict keeps the first mapping), new fields append in their frame
    order.  Used only for _meta bookkeeping (rollover's empty-generation
    schema); data reads still resolve their own schema from the files."""
    fields = list(stored.get("fields", []))
    seen = {f["name"] for f in fields}
    for f in new_schema.jsonValue()["fields"]:
        if f["name"] not in seen:
            fields.append(f)
            seen.add(f["name"])
    return {**stored, "fields": fields}


class IndexExistsError(RuntimeError):
    """mode="error" target already exists (SaveMode.ErrorIfExists parity)."""


class IndexNotFoundError(ValueError):
    """ES 404 index_not_found_exception: an exact index/alias name does
    not exist.  Subclasses ValueError so pre-existing ``except
    ValueError`` handlers keep working; catch THIS type (not the message
    text) to branch on missing-index."""


class DocumentConflictError(RuntimeError):
    """operation="create" hit existing _ids (ES 409 version_conflict parity)."""


class DocumentMissingError(RuntimeError):
    """operation="update" for _ids not present (ES 404 on update parity)."""


class Catalog:
    """Managed parquet indices under a root directory.

    ``transactional=True`` switches the commit layer from the single-writer
    atomic directory swap to the optimistic-concurrency manifest log in
    ``txn.py`` (Delta-protocol core: immutable uuid data dirs + O_EXCL
    version-file claims).  Concurrent blind appends always both land
    (manifest-union retry, no data rewrite); concurrent merge/upsert/
    delete_by_query rewrites retry their read-modify-write against the
    winner's snapshot — ES's server-side concurrent-bulk-writer semantics,
    re-expressed as a commit protocol (SURVEY.md §2.A A5)."""

    def __init__(self, spark: SparkSession, root: str, transactional: bool = False):
        self.spark = spark
        self.root = root
        self.transactional = transactional
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- PIT state
    # The PIT registry is persisted under the root (like the alias map and
    # the watcher state) so a pit_id opened through one Catalog instance is
    # readable through ANY instance over the same root within keep_alive —
    # ES's server-side PIT locality, not per-client state.
    def _pits_path(self) -> str:
        return os.path.join(self.root, "_pits.json")

    def _read_pits(self) -> dict:
        try:
            with open(self._pits_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"seq": 0, "pits": {}}

    def _write_pits(self, state: dict) -> None:
        # atomic replace: a concurrent reader sees the old or the new
        # registry, never a torn file
        tmp = f"{self._pits_path()}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._pits_path())

    def _mutate_pits(self, fn):
        """Run ``fn(state) -> (result, dirty)`` under an O_EXCL lock file
        so concurrent Catalog instances can't mint duplicate seq nonces or
        lose each other's open/extend/close updates; the write happens
        only when ``fn`` reports dirty, via atomic-replace.

        Unlike the txn layer's claim files (one-shot version claims that
        are never released), a mutex must recover from a dead holder: a
        lock older than ~5 s is broken as stale — registry mutations are
        milliseconds, so an old lock means its holder was killed
        mid-operation.  The break has a narrow TOCTOU window (two
        breakers racing a fresh re-acquire) accepted as a documented
        tradeoff: the alternative is pid-liveness probing for a registry
        whose entries are themselves keep-alive-expiring hints."""
        import time as _time

        lock = f"{self._pits_path()}.lock"
        for _ in range(500):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    if _time.time() - os.path.getmtime(lock) > 5.0:
                        os.unlink(lock)  # stale: holder died mid-operation
                        continue
                except FileNotFoundError:
                    continue  # released (or another breaker won): retry now
                _time.sleep(0.01)
        else:
            raise TimeoutError(f"could not acquire PIT registry lock {lock}")
        try:
            state = self._read_pits()
            result, dirty = fn(state)
            if dirty:
                self._write_pits(state)
            return result
        finally:
            try:
                # unlink only OUR lock: if we stalled >5 s and a waiter
                # broke it and re-created the path, the inode differs —
                # removing the waiter's fresh lock would admit a third
                # mutator mid-mutation
                if os.fstat(fd).st_ino == os.stat(lock).st_ino:
                    os.unlink(lock)
            except FileNotFoundError:
                pass  # broken as stale while we stalled >5 s holding it
            finally:
                os.close(fd)

    # ---------------------------------------------------------------- paths
    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}._meta.json")

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def list_indices(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, d))
        )

    def drop_index(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)
        if os.path.exists(self._meta_path(name)):
            os.remove(self._meta_path(name))

    def _read_meta(self, name: str) -> dict:
        try:
            with open(self._meta_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_meta(self, name: str, meta: dict) -> None:
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f)

    # --------------------------------------------------------------- aliases
    def _aliases_path(self) -> str:
        return os.path.join(self.root, "_aliases.json")

    def _read_aliases(self) -> dict[str, list[str]]:
        try:
            with open(self._aliases_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def put_alias(
        self, alias: str, *indices: str, filter: str | dict | None = None
    ) -> None:
        """ES alias parity: an alias names one or more indices; reads
        through the alias union them (exactly like a comma-list resource).
        Re-pointing an alias is atomic (single JSON rewrite), which is the
        ES blue/green reindex idiom (`_aliases` swap).

        ``filter``: ES FILTERED alias — a query-DSL body applied to every
        read through the alias (the tenant-view idiom); it compiles to a
        Column predicate at read time, so it pushes down into each target
        scan like any query."""
        if not indices:
            raise ValueError("alias needs at least one index")
        for n in indices:
            if not self.exists(n):
                raise ValueError(f"alias target {n!r} does not exist")
        aliases = self._read_aliases()
        if filter is not None:
            if isinstance(filter, str):
                filter = json.loads(filter)
            compile_query(filter)  # fail at declaration, not first read
            aliases[alias] = {"indices": list(indices), "filter": filter}
        else:
            aliases[alias] = list(indices)
        with open(self._aliases_path(), "w") as f:
            json.dump(aliases, f)

    @staticmethod
    def _alias_entry(aliases: dict, part: str) -> tuple[list[str], dict | None]:
        v = aliases[part]
        if isinstance(v, dict):
            return list(v.get("indices", [])), v.get("filter")
        return list(v), None

    def delete_alias(self, alias: str) -> None:
        aliases = self._read_aliases()
        aliases.pop(alias, None)
        with open(self._aliases_path(), "w") as f:
            json.dump(aliases, f)

    def delete_by_query(self, name: str, query: str | dict) -> int:
        """_delete_by_query parity (the reference's SaveMode.Overwrite path
        truncates via delete-by-query — RestRepository truncate/delete, per
        SURVEY.md §3.2). Rewrites the index keeping only non-matching rows;
        returns the number deleted. One scan + one write, no driver-side
        row handling."""
        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"delete_by_query takes a single index, got {names}")
        (idx,) = names
        pred = compile_query(query)
        # before/kept counts ride the rewrite job as Observation metrics
        # (CollectMetrics accumulators) — previously two EXTRA full-scan
        # count jobs bracketed the write; at scale that tripled the I/O of
        # every delete_by_query.  A transactional retry re-invokes build,
        # so each invocation gets fresh Observations; the committed result
        # is the last pair.
        obs: list[tuple[Observation, Observation]] = []

        def build(df: DataFrame) -> DataFrame:
            if df is None:
                raise ValueError(f"index {idx!r} has no committed data")
            o_in, o_out = Observation(), Observation()
            obs.append((o_in, o_out))
            d = df.observe(o_in, F.count(F.lit(1)).alias("n"))
            return d.filter(~pred | pred.isNull()).observe(
                o_out, F.count(F.lit(1)).alias("n")
            )

        self._commit_build(idx, [], build)
        o_in, o_out = obs[-1]
        return o_in.get["n"] - o_out.get["n"]

    def stats_index(self, name: str) -> dict:
        """_stats parity: per-index doc count, store size in bytes, field
        names.  Doc count is answered from parquet footer metadata (the
        aggregate-pushdown path — no data read), store size from the
        filesystem; neither scans rows."""
        out: dict[str, dict] = {}
        for idx in self.resolve_pattern(name):
            path = self.path(idx)
            size = 0
            for root, _dirs, files in os.walk(path):
                size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            df = self._read_files(idx)
            out[idx] = {
                "doc_count": df.count(),
                "store_bytes": size,
                "fields": df.columns,
            }
        return out

    def update_by_query(
        self, name: str, query: str | dict, set_exprs: dict[str, Column]
    ) -> int:
        """_update_by_query parity: apply ``set_exprs`` (column -> Column
        expression over the existing row, the painless-script analogue) to
        every document matching ``query``; returns the match count.  One
        scan + one rewrite — the non-matching rows pass through untouched,
        no row-at-a-time path."""
        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"update_by_query takes a single index, got {names}")
        (idx,) = names
        pred = compile_query(query)
        # matched count rides the rewrite job as an Observation metric on
        # the PRE-update rows (pred must see the old values) — previously a
        # separate full-scan count job ran before the rewrite.  Fresh
        # Observation per build invocation (transactional retry re-invokes).
        obs: list[Observation] = []

        def build(df: DataFrame) -> DataFrame:
            if df is None:
                raise ValueError(f"index {idx!r} has no committed data")
            o = Observation()
            obs.append(o)
            out = df.observe(o, F.count(F.when(pred, F.lit(1))).alias("n"))
            for col_name, expr in set_exprs.items():
                out = out.withColumn(
                    col_name, F.when(pred, expr).otherwise(F.col(col_name))
                )
            return out

        self._commit_build(idx, [], build)
        return obs[-1].get["n"]

    def reindex(
        self,
        source: str,
        dest: str,
        query: str | dict | None = None,
        transform=None,
        mode: str = "overwrite",
        id_col: str | None = None,
    ) -> int:
        """_reindex parity: copy ``source`` (any resource pattern — comma
        lists, wildcards, aliases) into ``dest``, optionally filtered by a
        query-DSL ``query`` and reshaped by ``transform`` (DataFrame ->
        DataFrame — the ingest-pipeline analogue, A12: transformations are
        just DataFrame ops pre-write).  Returns the number of documents
        written.  Composes scan pushdown + the bulk write path; the typical
        blue/green flow is reindex -> put_alias swap."""
        df = self.read_index(source, query=query)
        if transform is not None:
            df = transform(df)
        self.write_index(df, dest, mode=mode, id_col=id_col)
        return self.count_index(dest)

    # -------------------------------------------------------------- rollover
    def rollover(
        self,
        alias: str,
        max_docs: int | None = None,
        max_age_seconds: float | None = None,
        dry_run: bool = False,
        now: float | None = None,
    ) -> dict:
        """ES `_rollover`: when the alias's WRITE index (its last target)
        meets any condition, create the next generation (``name-000002``
        style) and atomically extend the alias.  Reads through the alias
        keep seeing every generation (alias union); writes via
        ``write_alias`` land in the newest.  The doc-count condition uses
        the parquet-footer count fast path — no scan; age comes from index
        meta (creation-stamped here) with dir-ctime fallback.

        This is the time-partitioning idiom at 100 TB: generations bound
        per-index size so compaction/vacuum/Z-order work on bounded
        units, and pattern reads prune whole generations."""
        aliases = self._read_aliases()
        targets = aliases.get(alias)
        if not targets:
            raise ValueError(f"rollover: alias {alias!r} does not exist")
        if isinstance(targets, dict):
            # ES likewise refuses: a write/rollover alias must be plain
            raise ValueError(f"rollover: alias {alias!r} is filtered; rollover needs a plain alias")
        current = targets[-1]
        m = re.match(r"^(.*)-(\d{6})$", current)
        if not m:
            raise ValueError(
                f"rollover: write index {current!r} must end in -NNNNNN"
            )
        conditions: dict[str, bool] = {}
        docs = self.count_index(current)
        if max_docs is not None:
            conditions["max_docs"] = docs >= max_docs
        if max_age_seconds is not None:
            meta = self._read_meta(current)
            created = meta.get("created_at") or os.path.getctime(self.path(current))
            # `now` makes age checks deterministic for testable ILM ticks
            ref = time.time() if now is None else now
            conditions["max_age"] = (ref - created) >= max_age_seconds
        if not conditions:
            raise ValueError("rollover needs max_docs and/or max_age_seconds")
        rolled = any(conditions.values())
        new_index = f"{m.group(1)}-{int(m.group(2)) + 1:06d}"
        if rolled and not dry_run:
            # the old generation's schema: from its _meta when the write
            # path recorded it (zero Spark work), else inferred from files
            # (spark.read.parquet pays a footer job per call)
            cur_meta = self._read_meta(current)
            if cur_meta.get("schema"):
                from pyspark.sql.types import StructType

                schema = StructType.fromJson(cur_meta["schema"])
            else:
                schema = self.read_index(current).schema
            self._create_empty_index(new_index, schema)
            aliases[alias] = [*targets, new_index]
            with open(self._aliases_path(), "w") as f:
                json.dump(aliases, f)
        return {
            "rolled_over": rolled and not dry_run,
            "dry_run": dry_run,
            "old_index": current,
            "new_index": new_index if rolled else None,
            "conditions": conditions,
            "docs": docs,
        }

    def _create_empty_index(self, name: str, schema) -> None:
        """Create an index as pure METADATA — empty directory + the Spark
        schema persisted in ``_meta`` — exactly like ES, where index
        creation touches no data nodes' segments.  The old shape wrote a
        zero-row parquet file through a full Spark job (~0.7s each, paid
        on EVERY rollover); ``_read_files`` special-cases the empty dir by
        rebuilding the frame from the stored schema.  Index templates
        resolve here like any new-index creation (write_index parity)."""
        os.makedirs(self.path(name), exist_ok=True)
        meta = self._read_meta(name)
        meta.update(
            {
                "created_at": time.time(),
                "updated_at": time.time(),
                "schema": schema.jsonValue(),
            }
        )
        tpl = self._match_template(name)
        if tpl is not None:
            t = self._resolve_template(tpl)
            settings = t.get("settings") or {}
            pipeline = settings.get("index.default_pipeline") or settings.get(
                "default_pipeline"
            )
            sort_field = settings.get("index.sort.field") or settings.get("sort.field")
            if pipeline:
                meta["default_pipeline"] = pipeline
            if sort_field:
                meta["index_sort"] = sort_field
            if t.get("mappings") is not None and "mappings" not in meta:
                meta["mappings"] = t["mappings"]
        self._write_meta(name, meta)

    def write_alias(self, df: DataFrame, alias: str, **kwargs) -> None:
        """Write through a rollover alias: documents land in the alias's
        WRITE index (its newest target)."""
        targets = self._read_aliases().get(alias)
        if not targets:
            raise ValueError(f"write_alias: alias {alias!r} does not exist")
        if isinstance(targets, dict):
            raise ValueError(
                f"write_alias: alias {alias!r} is filtered; writes need a plain alias"
            )
        self.write_index(df, targets[-1], **kwargs)

    # ---------------------------------------------------------------- write
    def write_index(
        self,
        df: DataFrame,
        name: str,
        mode: str = "append",
        operation: str = "index",
        id_col: str | None = None,
        routing_col: str | None = None,
        index_pattern: str | None = None,
        on_match: dict[str, Column] | None = None,
        max_records_per_file: int | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bounds: dict[str, tuple[float, float]] | None = None,
    ) -> None:
        """Write ``df`` into index ``name`` (saveToEs parity, SURVEY.md §3.2).

        ``operation`` mirrors es.write.operation: ``index`` = last-write-wins
        on ``_id`` (requires id_col to dedupe within+against the target;
        without id_col it is a plain append), ``create`` = insert-only
        (conflict -> DocumentConflictError), ``update`` = change existing
        only (missing -> DocumentMissingError), ``upsert`` = update-or-
        insert, ``delete`` = remove matching ``_id``s.  ``on_match`` maps
        column -> Column expression applied to matched rows (scripted-update
        parity, A11): expressions see the existing row's columns plus the
        incoming row's values prefixed ``_new_``.  ``max_records_per_file``
        bounds output file sizes (the bulk-batch-size analogue at the
        storage layer; SCALE.md knobs) — essential when a partitionBy key
        concentrates rows.  ``sort_by`` sorts rows within each output task
        before writing: parquet row-group min/max stats on the sorted
        columns become tight, so later range filters skip whole row groups
        (the poor-man's clustering key; at 100 TB this is the difference
        between scanning a time range and scanning the table).
        """
        if mode not in VALID_MODES:
            raise ValueError(f"mode must be one of {VALID_MODES}, got {mode!r}")
        if operation not in VALID_OPERATIONS:
            raise ValueError(f"operation must be one of {VALID_OPERATIONS}, got {operation!r}")
        if operation in ("update", "upsert", "delete") and id_col is None:
            raise ValueError(f"operation={operation!r} requires id_col")

        target = self.path(name)
        existed = self.exists(name)
        prior_meta = self._read_meta(name) if existed else {}
        if existed and mode == "error":
            raise IndexExistsError(name)
        if existed and mode == "ignore":
            return
        if existed:
            # belt: the commit layer re-checks, but failing before the
            # ingest pipeline / sort work is the better error surface.
            # AFTER the mode=="ignore" return — SaveMode.Ignore against a
            # CCR follower is the documented no-op, not an error (r8 advice)
            self._assert_not_follower(name, prior_meta)

        # index templates (ES _index_template): a NEW index resolves the
        # highest-priority matching template at creation and PERSISTS the
        # resolved index.default_pipeline / index.sort into its _meta;
        # every later write re-reads them from _meta and applies them
        # again — in ES, index.default_pipeline runs on EVERY indexing
        # request to the index, not just the first batch (ADVICE r4).
        tpl_mappings = None
        pipeline_name = prior_meta.get("default_pipeline")
        sort_field = prior_meta.get("index_sort")
        if not existed:
            tpl = self._match_template(name)
            if tpl is not None:
                t = self._resolve_template(tpl)  # composed_of merged in
                settings = t.get("settings") or {}
                pipeline_name = settings.get(
                    "index.default_pipeline"
                ) or settings.get("default_pipeline")
                sort_field = settings.get("index.sort.field") or settings.get(
                    "sort.field"
                )
                tpl_mappings = t.get("mappings")
        if pipeline_name:
            from elasticsearch_hadoop_spark.ingest import compile_pipeline

            df = compile_pipeline(self.get_pipeline(pipeline_name))(df)
        if sort_field and not sort_by and not zorder_by:
            sort_by = sort_field if isinstance(sort_field, list) else [sort_field]

        if sort_by and zorder_by:
            raise ValueError("sort_by and zorder_by are mutually exclusive")
        out = df
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)

        # multi-dimensional clustering: every output file covers a small
        # hyper-rectangle of the zorder_by columns, so range filters on
        # ANY of them skip whole files/row-groups (operators/zorder.py —
        # the multi-column upgrade of sort_by's single-column stats).
        # Applied to the FINAL written frame: clustering the incoming
        # batch before a merge would be destroyed by the merge's joins.
        def cluster(frame: DataFrame) -> DataFrame:
            if not zorder_by:
                return frame
            from elasticsearch_hadoop_spark.operators.zorder import zorder

            # zorder_bounds skips the operator's own (min, max) scan when the
            # caller already computed covering bounds (one scan instead of two)
            return zorder(frame, zorder_by, bounds=zorder_bounds)
        if id_col is not None:
            out = out.withColumn("_id", F.col(id_col).cast("string"))
        if routing_col is not None:
            out = out.withColumn("_routing", F.col(routing_col).cast("string"))
        if index_pattern is not None:
            out = out.withColumn("_index", format_index_pattern(index_pattern))

        partition_cols = ["_index"] if index_pattern is not None else []

        if mode == "overwrite" or not existed:
            # truncate-then-write parity; also the create path
            self._commit_build(
                name, partition_cols, lambda _existing: cluster(out),
                max_records_per_file=max_records_per_file, needs_existing=False,
            )
        elif operation in ("index", "create", "update", "upsert", "delete"):
            if id_col is None and operation == "index":
                # plain append, no identity: blind parquet append, no read.
                # Transactional mode publishes via manifest-union retry —
                # concurrent appends both land, no data rewrite on a race.
                self._append_files(cluster(out), name, partition_cols, max_records_per_file)
            else:
                final = out
                checks: list = []

                def merge_build(existing: DataFrame | None) -> DataFrame:
                    if existing is None:
                        # index dir exists but holds no committed data (a
                        # first write that crashed after init_log): merge
                        # against an empty snapshot — upsert/index insert
                        # everything, update raises DocumentMissingError,
                        # delete is a no-op — instead of crashing on None.
                        existing = self.spark.createDataFrame([], final.schema)
                    return cluster(
                        self._merge(existing, final, operation, on_match, checks=checks)
                    )

                self._commit_build(
                    name,
                    partition_cols,
                    merge_build,
                    max_records_per_file=max_records_per_file,
                    # update's missing-_id contract is enforced from the
                    # merge job's own Observation metrics (zero extra scans),
                    # AFTER the build wrote but BEFORE the commit publishes —
                    # a failure leaves the index untouched, like the old
                    # pre-check.  checks[-1] is the latest build invocation's
                    # closure (a transactional retry re-invokes build).
                    validate=(lambda: checks[-1]()) if operation == "update" else None,
                )

        # merge (not replace) the meta: created_at (rollover/data-stream
        # age) and template mappings must survive later writes
        meta = self._read_meta(name)
        meta.update(
            {
                "id_col": id_col,
                "routing_col": routing_col,
                "index_pattern": index_pattern,
                "updated_at": time.time(),
            }
        )
        # keep the index's Spark schema in _meta (ES keeps the mapping in
        # cluster state): overwrite/create set it outright; appends/merges
        # union new fields in by name (first type wins, like an ES mapping
        # conflict).  rollover reads it instead of paying a per-call
        # schema-inference Spark job on the old generation.
        if mode == "overwrite" or not existed:
            meta["schema"] = out.schema.jsonValue()
        elif meta.get("schema"):
            meta["schema"] = _merge_schema_json(meta["schema"], out.schema)
        if tpl_mappings is not None and "mappings" not in meta:
            meta["mappings"] = tpl_mappings
        if pipeline_name:
            meta["default_pipeline"] = pipeline_name
        if sort_field:
            meta["index_sort"] = sort_field
        self._write_meta(name, meta)

    def _merge(
        self,
        existing: DataFrame,
        incoming: DataFrame,
        operation: str,
        on_match: dict[str, Column] | None,
        checks: list | None = None,
    ) -> DataFrame:
        """Hash-join merge on _id.  Incoming batch is usually the small side
        -> AQE broadcasts it; existing data shuffles at most once on _id.
        ``existing`` is the snapshot the commit layer resolved — under the
        transactional log a lost race re-invokes this against the winner's
        snapshot (optimistic MERGE INTO).

        ``operation="update"``'s missing-_id check rides the merge job
        itself: the merge joins already touch every (incoming, existing)
        id pair, so Observation metrics on those joins count the misses
        for free, and the appended ``checks`` closure (run by the commit
        layer post-write, pre-publish) raises DocumentMissingError from
        the counts.  The old shape ran a separate pre-check join job —
        at scale that doubled the update's join I/O."""
        # last occurrence wins within the incoming batch (bulk-order parity)
        w_id = incoming
        if operation != "delete":
            w_id = dedupe_last(incoming, "_id")

        if operation == "delete":
            ids = w_id.select("_id").distinct()
            return existing.join(ids, on="_id", how="left_anti")

        if operation == "create":
            conflicts = w_id.join(existing.select("_id"), on="_id", how="left_semi")
            n = conflicts.limit(1).count()
            if n:
                some = [r["_id"] for r in conflicts.select("_id").limit(5).collect()]
                raise DocumentConflictError(f"create conflicts on _id, e.g. {some}")
            return existing.unionByName(w_id, allowMissingColumns=True)

        def missing_check(get_missing):
            """Closure for the commit layer: read the merge job's metrics;
            on a miss, fetch example ids with a query on the error path
            only (the happy path never runs a second join job)."""

            def check():
                n = get_missing()
                if n:
                    missing = w_id.join(
                        existing.select("_id"), on="_id", how="left_anti"
                    )
                    some = [
                        r["_id"] for r in missing.select("_id").limit(5).collect()
                    ]
                    raise DocumentMissingError(
                        f"update for missing _id ({n} total), e.g. {some}"
                    )

            if checks is not None:
                checks.append(check)

        # update / upsert
        if on_match:
            # scripted update (A11): matched rows = existing row + _new_* cols
            new_side = w_id.select(
                F.col("_id"), *[F.col(c).alias(f"_new_{c}") for c in w_id.columns if c != "_id"]
            )
            if operation == "update":
                # misses counted with a left-join presence marker riding this
                # same plan.  The count is EXACT even when blind appends left
                # duplicate _ids in `existing`: duplicates fan out only the
                # MATCHED marker rows, never the null-marker (missing) rows —
                # unlike the old o_in - o_match subtraction, whose inner-join
                # fan-out could mask a real miss or raise a spurious one.
                # dropDuplicates collapses the fan-out back to one row per
                # incoming id (copies are identical) so the merge join below
                # keeps its one-match-per-existing-row semantics.
                o_miss = Observation()
                new_side = (
                    new_side.join(
                        existing.select("_id").withColumn("__ex", F.lit(True)),
                        on="_id",
                        how="left",
                    )
                    .observe(
                        o_miss, F.count(F.when(F.col("__ex").isNull(), 1)).alias("n")
                    )
                    .dropDuplicates(["_id"])
                    .drop("__ex")
                )
            matched = existing.join(new_side, on="_id", how="inner")
            for col_name, expr in on_match.items():
                matched = matched.withColumn(col_name, expr)
            matched = matched.select(existing.columns)
            if operation == "update":
                missing_check(lambda: o_miss.get["n"])
            untouched = existing.join(w_id.select("_id"), on="_id", how="left_anti")
            result = untouched.unionByName(matched)
            if operation == "upsert":
                inserts = w_id.join(existing.select("_id"), on="_id", how="left_anti")
                result = result.unionByName(inserts, allowMissingColumns=True)
            return result

        # whole-document replace (ES index/upsert semantics)
        untouched = existing.join(w_id.select("_id"), on="_id", how="left_anti")
        if operation == "update":
            # left-join + presence marker instead of left_semi: same join
            # shape and cost, but the pre-join rows can carry an Observation
            # that counts the misses the filter drops
            o_miss = Observation()
            marked = w_id.join(
                existing.select("_id").withColumn("__ex", F.lit(True)),
                on="_id",
                how="left",
            ).observe(o_miss, F.count(F.when(F.col("__ex").isNull(), 1)).alias("n"))
            # duplicate _ids in `existing` (blind appends) fan the marker
            # join out; collapse to ONE replacement per incoming doc (the
            # old left_semi's guarantee) — copies are identical rows
            replacements = (
                marked.filter(F.col("__ex").isNotNull())
                .dropDuplicates(["_id"])
                .drop("__ex")
            )
            missing_check(lambda: o_miss.get["n"])
        else:  # index / upsert: all incoming docs land
            replacements = w_id
        return untouched.unionByName(replacements, allowMissingColumns=True)

    def _writer(self, df: DataFrame, partition_cols: list[str], max_records_per_file):
        writer = df.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        return writer

    def _assert_not_follower(self, name: str, meta: dict | None = None) -> None:
        """ES: a CCR follower index rejects every write/rewrite until
        unfollowed.  Enforced at the commit layer so delete_by_query /
        update_by_query / compact_index and future callers can't mutate a
        follower (their local rewrite would silently be discarded by the
        next ccr_poll manifest swap anyway)."""
        meta = self._read_meta(name) if meta is None else meta
        if "ccr_leader_root" in meta:
            raise ValueError(
                f"{name!r} is a CCR follower (read-only) — unfollow_index first"
            )

    def _commit_build(
        self,
        name: str,
        partition_cols: list[str],
        build,
        max_records_per_file: int | None = None,
        needs_existing: bool = True,
        validate=None,
    ) -> None:
        """Derive-and-replace commit: ``build(existing_df_or_None)`` returns
        the index's new full contents.

        Non-transactional: read once, write a temp dir, atomic swap (exactly
        the old single-writer _commit).  Transactional: write the result to
        an immutable uuid data dir and claim the next manifest version; if
        another writer won the race, re-run ``build`` against the winner's
        snapshot and try again (txn.commit_replace's optimistic loop).

        ``validate`` (when given) runs after the build's write job finishes
        but BEFORE the result becomes visible (pre-swap / pre-publish) — the
        hook that lets contract checks ride the write job's own Observation
        metrics instead of paying a separate pre-check job; a raise aborts
        the commit with the index untouched."""
        self._assert_not_follower(name)
        target = self.path(name)
        if not self.transactional:
            existing = (
                self._read_files(name) if needs_existing and self.exists(name) else None
            )
            self._commit(build(existing), name, partition_cols, replace=True,
                         max_records_per_file=max_records_per_file,
                         validate=validate)
            return
        txn.adopt(target)  # pre-existing plain data becomes committed v1
        version, dirs = txn.latest(target)

        def produce(dirs_: list[str]) -> str:
            existing = self._read_dirs(dirs_) if (needs_existing and dirs_) else None
            out = build(existing)
            d = txn.new_data_dir(target)
            self._writer(out, partition_cols, max_records_per_file).parquet(d)
            if validate is not None:
                try:
                    validate()
                except Exception:
                    # uncommitted uuid dir: invisible to readers; drop it
                    # eagerly rather than waiting for vacuum
                    shutil.rmtree(d, ignore_errors=True)
                    raise
            return d

        txn.commit_replace(target, version, produce(dirs), recompute=produce)

    def _append_files(
        self,
        df: DataFrame,
        name: str,
        partition_cols: list[str],
        max_records_per_file: int | None = None,
    ) -> None:
        """Blind append.  Transactional mode writes a complete uuid data dir
        first, then publishes it with a manifest-union claim — a lost race
        retries only the (tiny) manifest write, never the data."""
        self._assert_not_follower(name)
        target = self.path(name)
        if not self.transactional:
            writer = df.write.mode("append")
            if max_records_per_file:
                writer = writer.option("maxRecordsPerFile", max_records_per_file)
            if partition_cols:
                writer = writer.partitionBy(*partition_cols)
            writer.parquet(target)
            return
        txn.adopt(target)  # pre-existing plain data becomes committed v1
        d = txn.new_data_dir(target)
        self._writer(df, partition_cols, max_records_per_file).parquet(d)
        txn.commit_append(target, d)

    def compact_index(self, name: str, target_files: int | None = None) -> None:
        """Compact an index's data into ``target_files`` files (default:
        session shuffle parallelism).  On a transactional index this is
        just a REPLACE commit whose build coalesces the union — concurrent
        appends that land mid-compaction win the race and the compaction
        retries over the enlarged snapshot, so nothing is lost.  The
        100 TB housekeeping op: manifest length and small-file count reset
        to O(1) without blocking writers."""
        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"compact_index takes a single index, got {names}")
        n = target_files or int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        # preserve dynamic-routing Hive layout: a routed index compacted
        # flat would lose partition-pruned reads permanently
        partition_cols = ["_index"] if self._read_meta(names[0]).get("index_pattern") else []

        def build(df: DataFrame) -> DataFrame:
            if df is None:
                raise ValueError(f"index {names[0]!r} has no committed data to compact")
            return df.coalesce(n)

        self._commit_build(names[0], partition_cols, build)

    # ------------------------------------------------- shrink / split / clone
    def _data_file_count(self, name: str) -> int:
        """The index's LIVE parquet data-file count — the shard-count
        analogue (ES _shrink/_split arithmetic runs on primary shard
        counts; here a 'shard' is one parquet file, the parallel-read
        unit).  On a transactional index only the latest manifest's dirs
        count: superseded versions retained for time travel are dead
        weight, not shards."""
        path = self.path(name)
        if txn.is_transactional(path):
            _, dirs = txn.latest(path)
            roots = dirs
        else:
            roots = [path]
        n = 0
        for r in roots:
            for root, _dirs, files in os.walk(r):
                n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    def _resize_index(
        self, source: str, target: str, target_shards: int, kind: str
    ) -> dict:
        names = self.resolve_pattern(source)
        if len(names) != 1:
            raise ValueError(f"_{kind} takes a single source index, got {names}")
        src = names[0]
        if self.exists(target):
            raise IndexExistsError(f"target index {target!r} already exists")
        if target_shards < 1:
            raise ValueError(f"target shards must be >= 1, got {target_shards}")
        src_shards = max(1, self._data_file_count(src))
        if kind == "shrink" and src_shards % target_shards != 0:
            raise ValueError(
                f"_shrink target shard count {target_shards} must be a factor "
                f"of the source's {src_shards}"
            )
        if kind == "split" and target_shards % src_shards != 0:
            raise ValueError(
                f"_split target shard count {target_shards} must be a multiple "
                f"of the source's {src_shards}"
            )
        # read the RAW stored files (incl. materialized _id/_routing/
        # _index metadata columns — read_index would strip them) and write
        # the target directly: ES _shrink/_split copy segments verbatim,
        # so neither index templates, default pipelines, nor id dedupe may
        # touch the data (write_index would apply all three to a new
        # index).  The target is a plain single-swap index either way; a
        # transactional source contributes its LIVE manifest only.
        df = self._read_files(src)
        meta = self._read_meta(src)
        # shrink merges without a shuffle (ES hard-links segments into
        # fewer shards); split re-hashes rows across more files
        out = df.coalesce(target_shards) if kind == "shrink" else df.repartition(target_shards)
        # preserve dynamic-routing Hive layout, like compact_index
        partition_cols = ["_index"] if meta.get("index_pattern") else []
        self._writer(out, partition_cols, None).parquet(self.path(target))
        # ES copies index settings (minus shard count) to the target —
        # but NOT follower identity: a resize target is a plain index, so
        # the ccr_* keys are stripped (copying them would mint a target
        # that refuses all writes and that ccr_poll tries to sync over
        # non-transactional parquet; ES likewise requires unfollow before
        # resizing a follower)
        if meta:
            tmeta = {k: v for k, v in meta.items() if not k.startswith("ccr_")}
            tmeta["resized_from"] = src
            self._write_meta(target, tmeta)
        return {
            "source": src,
            "target": target,
            "source_shards": src_shards,
            "target_shards": target_shards,
        }

    def shrink_index(self, source: str, target: str, target_shards: int = 1) -> dict:
        """ES ``POST /<src>/_shrink/<dst>``: rewrite into FEWER data files
        (target must be a factor of the source's file count).  Uses
        coalesce — a merge without a shuffle, the Spark analogue of ES's
        hard-link segment move.  Settings/_meta copy over; returns the
        shard arithmetic."""
        return self._resize_index(source, target, target_shards, "shrink")

    def split_index(self, source: str, target: str, target_shards: int) -> dict:
        """ES ``POST /<src>/_split/<dst>``: rewrite into MORE data files
        (target must be a multiple of the source's count) — a round-robin
        repartition, the analogue of ES's hash-split of each shard."""
        return self._resize_index(source, target, target_shards, "split")

    def clone_index(self, source: str, target: str) -> dict:
        """ES ``POST /<src>/_clone/<dst>``: byte-identical copy with the
        same layout (ES clones via hard links; copytree is the portable
        analogue — no rows are read or rewritten)."""
        names = self.resolve_pattern(source)
        if len(names) != 1:
            raise ValueError(f"_clone takes a single source index, got {names}")
        src = names[0]
        if self.exists(target):
            raise IndexExistsError(f"target index {target!r} already exists")
        shutil.copytree(self.path(src), self.path(target))
        meta = self._read_meta(src)
        if meta:
            # same follower-identity strip as _resize_index: the clone is a
            # plain index (ES: unfollow before clone), not a second follower
            self._write_meta(
                target, {k: v for k, v in meta.items() if not k.startswith("ccr_")}
            )
        shards = self._data_file_count(src)
        return {
            "source": src,
            "target": target,
            "source_shards": shards,
            "target_shards": shards,
        }

    def read_index_version(self, name: str, version: int) -> DataFrame:
        """Time travel on a transactional index: the index exactly as of
        committed ``version`` (the ES snapshot / point-in-time analogue —
        a reader pins a manifest and is immune to concurrent rewrites).
        Valid until vacuum_index sweeps the superseded data dirs; the
        retention window (txn.vacuum) is therefore also the time-travel
        horizon, exactly as in Delta."""
        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"time travel takes a single index, got {names}")
        path = self.path(names[0])
        if not txn.is_transactional(path):
            raise ValueError(f"index {names[0]!r} is not transactional")
        dirs = txn.manifest_at(path, version)
        if not dirs:
            raise ValueError(f"version {version} of {names[0]!r} is empty")
        return self._read_dirs(dirs)

    def open_point_in_time(
        self, name: str, keep_alive: str = "5m", now: float | None = None
    ) -> str:
        """ES ``POST /<index>/_pit?keep_alive=...`` — pin the index's
        CURRENT committed version so searches through the PIT see a
        frozen snapshot regardless of concurrent writes.  Returns an
        opaque id (base64 of index+version).  Requires a transactional
        index: the manifest log IS the snapshot mechanism (default
        single-swap indexes have no pinnable versions).  ``keep_alive``
        bounds the id's life from ``now`` (explicit like the watcher's —
        deterministic and testable); every ``pit_read`` with a
        keep_alive EXTENDS it, exactly ES's touch-to-extend rule.  The
        time-travel horizon caveat of read_index_version applies: a
        vacuum inside the window invalidates the pinned dirs."""
        import base64
        import time as _time

        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"a PIT pins a single index, got {names}")
        path = self.path(names[0])
        if not txn.is_transactional(path):
            raise ValueError(f"index {names[0]!r} is not transactional")
        version, _ = txn.latest(path)
        now = _time.time() if now is None else now
        # a per-open nonce keeps every _pit open a DISTINCT context (ES
        # semantics) — without it two PITs on the same snapshot would
        # share one registry entry and close/extend each other
        from elasticsearch_hadoop_spark.durations import parse_duration

        def _open(state: dict):
            state["seq"] += 1
            pit_id = base64.b64encode(
                json.dumps(
                    {"index": names[0], "version": version, "n": state["seq"]}
                ).encode()
            ).decode()
            state["pits"][pit_id] = now + parse_duration(keep_alive)
            return pit_id, True

        return self._mutate_pits(_open)

    def pit_read(
        self,
        pit_id: str,
        keep_alive: str | None = None,
        now: float | None = None,
    ) -> DataFrame:
        """Read the snapshot a PIT pins.  Expired or closed ids raise
        (ES's search_context_missing); a ``keep_alive`` extends the id
        from ``now``."""
        import base64
        import time as _time

        now = _time.time() if now is None else now

        if keep_alive is None:
            # lock-free fast path: atomic-replace writes mean a plain read
            # sees a consistent registry; a live, unexpired entry needs no
            # reap and no extension, so N concurrent readers paging one
            # PIT never serialize on the lock or rewrite the registry
            expiry = self._read_pits()["pits"].get(pit_id)
            if expiry is not None and now <= expiry:
                ref = json.loads(base64.b64decode(pit_id))
                return self.read_index_version(ref["index"], ref["version"])

        def _touch(state: dict):
            expiry = state["pits"].get(pit_id)
            if expiry is None or now > expiry:
                # reap the expired entry; dirty only if there was one
                return False, state["pits"].pop(pit_id, None) is not None
            if keep_alive is not None:
                from elasticsearch_hadoop_spark.durations import parse_duration

                state["pits"][pit_id] = now + parse_duration(keep_alive)
                return True, True
            return True, False

        if not self._mutate_pits(_touch):
            raise ValueError("point in time expired or closed (search_context_missing)")
        ref = json.loads(base64.b64decode(pit_id))
        return self.read_index_version(ref["index"], ref["version"])

    def close_point_in_time(self, pit_id: str) -> bool:
        """ES ``DELETE /_pit`` — returns whether the id was open."""

        def _close(state: dict):
            was_open = state["pits"].pop(pit_id, None) is not None
            return was_open, was_open

        return self._mutate_pits(_close)

    def index_history(self, name: str) -> list[dict]:
        """The commit log as data: one dict per committed version
        (version, ts, replace?, #dirs) — DESCRIBE HISTORY parity."""
        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"history takes a single index, got {names}")
        return txn.history(self.path(names[0]))

    def vacuum_index(self, name: str, min_age_seconds: float = 3600.0) -> list[str]:
        """Sweep data directories no manifest references (losing writers,
        superseded replace snapshots), skipping dirs younger than the
        retention window — see txn.vacuum.  No-op on non-transactional
        indices."""
        names = self.resolve_pattern(name)
        out: list[str] = []
        for idx in names:
            if txn.is_transactional(self.path(idx)):
                out.extend(txn.vacuum(self.path(idx), min_age_seconds))
        return out

    @staticmethod
    def _single_write_job(paths: list[str]) -> bool:
        """True when every data file under ``paths`` carries the SAME
        part-file job UUID — i.e. one Spark write job produced them all.
        One job writes one schema, so the mergeSchema footer-merge job
        (a distributed footer read launched at PLANNING time, one extra
        Spark job per read) is provably redundant and the single-footer
        fast path is exact.  Any unrecognized filename or a second UUID
        returns False — the reader then keeps full mergeSchema semantics
        (ES dynamic-mapping drift parity for multi-commit appends).  The
        driver-side listing is the same walk Spark's file index performs
        at planning anyway."""
        uuids: set[str] = set()
        for p in paths:
            for root, _dirs, files in os.walk(p):
                for f in files:
                    if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                        continue
                    m = re.match(r"part-\d+-([0-9a-f]{8}(?:-[0-9a-f]{4}){3}-[0-9a-f]{12})", f)
                    if m is None:
                        return False
                    uuids.add(m.group(1))
                    if len(uuids) > 1:
                        return False
        return True

    def _read_dirs(self, dirs: list[str]) -> DataFrame:
        reader = self.spark.read
        if not self._single_write_job(dirs):
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    def _read_files(self, idx: str) -> DataFrame:
        """One resolved index's current contents: the latest manifest's data
        dirs when the index is transactional, else the plain directory.
        mergeSchema either way (ES dynamic-mapping drift parity — see
        _read_resolved) unless every file came from one write job, where
        the single-footer read is provably identical (_single_write_job)."""
        path = self.path(idx)
        if txn.is_transactional(path):
            _, dirs = txn.latest(path)
            if not dirs:
                raise ValueError(f"index {idx!r} has no committed data")
            return self._read_dirs(dirs)
        if not os.listdir(path):
            # metadata-only index (fresh rollover generation): rebuild the
            # empty frame from the schema _create_empty_index persisted —
            # StructType.fromJson round-trips the Spark schema exactly
            meta = self._read_meta(idx)
            if meta.get("schema"):
                from pyspark.sql.types import StructType

                return self.spark.createDataFrame(
                    [], StructType.fromJson(meta["schema"])
                )
        return self._read_dirs([path])

    def _commit(
        self,
        df: DataFrame,
        name: str,
        partition_cols: list[str],
        replace: bool,
        max_records_per_file: int | None = None,
        validate=None,
    ) -> None:
        """Write to a temp dir, atomically swap in (single-writer commit).
        The transactional path never routes here — see _commit_build.
        ``validate`` runs between the temp write and the swap — see
        _commit_build."""
        target = self.path(name)
        tmp = os.path.join(self.root, f".tmp-{name}-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)
        if validate is not None:
            try:
                validate()
            except Exception:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
        old = None
        if os.path.exists(target):
            old = os.path.join(self.root, f".old-{name}-{uuid.uuid4().hex[:8]}")
            os.rename(target, old)
        os.rename(tmp, target)
        if old:
            shutil.rmtree(old, ignore_errors=True)

    # ----------------------------------------------------------------- read
    def read_index(
        self,
        name: str,
        query: str | dict | None = None,
        fields: list[str] | None = None,
        exclude_fields: list[str] | None = None,
        metadata: bool = False,
    ) -> DataFrame:
        """esDF parity (SURVEY.md §3.1).  ``query`` is the ES query-DSL JSON
        subset (compiled to Column predicates -> Catalyst pushes them to the
        parquet scan); ``fields``/``exclude_fields`` mirror
        es.read.field.include/exclude (A2/A8); ``metadata=True`` appends the
        ``_metadata`` map column (es.read.metadata parity, §1.1).

        ``name`` accepts the reference's multi-resource syntax
        (``mr/.../rest/Resource.java`` parsing, per SURVEY.md §0 path
        citations): a comma list (``"a,b"``) and/or ``*`` wildcards
        (``"logs-*"``).  Multi-index reads union per-index scans by column
        name with missing columns nulled (ES indices may drift schemas);
        each branch stays an independent parquet scan, so Catalyst still
        pushes filters/pruning into every branch — the union adds no
        shuffle."""
        df = self._read_resolved(name)
        if query is not None:
            query = self._resolve_terms_lookups(query)
            query = self._resolve_indexed_shapes(query)
            df = df.filter(compile_query(query))
        meta_cols = [c for c in ("_id", "_index", "_routing") if c in df.columns]
        if metadata and meta_cols:
            df = df.withColumn(
                "_metadata",
                F.create_map(
                    *[x for c in meta_cols for x in (F.lit(c), F.col(c).cast("string"))]
                ),
            )
        if fields:
            keep = list(fields) + (["_metadata"] if metadata else [])
            df = df.select(*[c for c in keep if c in df.columns or c == "_metadata"])
        elif exclude_fields:
            df = df.drop(*[c for c in exclude_fields if c in df.columns])
        if not metadata:
            df = df.drop(*[c for c in meta_cols if c in df.columns])
        return df

    def resolve_pattern(self, name: str) -> list[str]:
        """Expand the comma/wildcard resource syntax to managed index names.
        An exact part naming an alias expands to the alias's target
        indices (ES resolves aliases the same way)."""
        return [n for n, _ in self._resolve_parts(name)]

    def _resolve_parts(self, name: str) -> list[tuple[str, dict | None]]:
        """The resolution core: (index, alias_filter) pairs.  A filtered
        alias carries its query-DSL body to every target it expands to;
        plain names/wildcards carry None."""
        import fnmatch

        aliases = self._read_aliases()
        # per-index resolved filter: None = unfiltered.  An index reached
        # BOTH unfiltered (direct name/wildcard, or a plain alias) and
        # through a filtered alias stays unfiltered — the direct request
        # already returns every doc, and ES's union of shard results never
        # narrows it.  Two DIFFERENT filtered aliases over one index keep
        # the first (documented: split such reads into separate calls).
        resolved: dict[str, dict | None] = {}
        order: list[str] = []

        def _add(idx: str, flt: dict | None) -> None:
            if idx not in resolved:
                resolved[idx] = flt
                order.append(idx)
            elif flt is None:
                resolved[idx] = None

        for part in (p.strip() for p in name.split(",")):
            if not part:
                continue
            if part in aliases:
                targets, flt = self._alias_entry(aliases, part)
                for t in targets:
                    _add(t, flt)
            elif "*" in part or "?" in part:
                for m in sorted(fnmatch.filter(self.list_indices(), part)):
                    _add(m, None)
            elif not self.exists(part):
                # ES answers 404 for an unknown exact index/alias name
                raise IndexNotFoundError(f"no such index or alias: {part!r}")
            else:
                _add(part, None)
        if not order:
            raise ValueError(f"no index matches resource {name!r}")
        return [(idx, resolved[idx]) for idx in order]

    def _read_resolved(self, name: str) -> DataFrame:
        # mergeSchema: ES dynamic-mapping parity — a blind append may add
        # fields, and without it Spark takes ONE file's footer (listing-order
        # dependent: the new column can silently vanish). Cost is one footer
        # read per file at planning; an index with millions of files should
        # persist its schema in _meta and pass it explicitly instead.
        pairs = self._resolve_parts(name)
        if len(pairs) == 1:
            n, flt = pairs[0]
            df = self._read_files(n)
            # filtered alias: the stored query-DSL body compiles per read
            # and pushes into the target's scan like any predicate
            return df.filter(compile_query(flt)) if flt is not None else df
        parts = []
        for n, flt in pairs:
            df = self._read_files(n)
            if flt is not None:
                df = df.filter(compile_query(flt))
            if "_index" not in df.columns:
                df = df.withColumn("_index", F.lit(n))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # ES terms-lookup caps the fetched list (index.max_terms_count);
    # enforced here too so a fat lookup doc cannot balloon the compiled
    # isin predicate
    MAX_TERMS_COUNT = 65536

    def terms_lookup(self, index: str, doc_id: str, path: str) -> list:
        """Fetch the term list for a terms-lookup query (`terms` with
        {"index", "id", "path"}): the ``path`` array of ONE document.
        A one-row collect bounded by MAX_TERMS_COUNT — the list then
        compiles to an isin predicate that pushes down to the scan, which
        is exactly how ES executes the lookup (fetch once, rewrite to a
        plain terms query)."""
        df = self.read_index(index, metadata=True)
        if "_id" not in df.columns:
            raise ValueError(f"terms lookup index {index!r} has no _id column")
        rows = (
            df.filter(F.col("_id").cast("string") == str(doc_id))
            .select(path)
            .limit(1)
            .collect()
        )
        if not rows:
            raise DocumentMissingError(f"terms lookup doc {doc_id!r} in {index!r}")
        val = rows[0][0]
        terms = [v for v in (val if isinstance(val, list) else [val]) if v is not None]
        if len(terms) > self.MAX_TERMS_COUNT:
            raise ValueError(
                f"terms lookup {index!r}/{doc_id!r}.{path} has {len(terms)} "
                f"terms (> max_terms_count {self.MAX_TERMS_COUNT})"
            )
        return terms

    def _resolve_terms_lookups(self, q):
        """Pre-pass over an ES query body: replace every terms-lookup
        clause ({"terms": {field: {"index","id","path"}}}) with the
        fetched term list, anywhere in the clause tree (bool arms,
        nested, constant_score...).  Plain clauses pass through
        untouched, so compile_query never needs catalog access."""
        if isinstance(q, str):
            s = q.strip()
            if not s.startswith("{"):
                return q
            q = json.loads(s)
        if not isinstance(q, dict):
            return q
        out = {}
        for k, v in q.items():
            if k == "terms" and isinstance(v, dict):
                new_v = {}
                for fld, spec in v.items():
                    if isinstance(spec, dict) and {"index", "id", "path"} <= set(spec):
                        new_v[fld] = self.terms_lookup(
                            spec["index"], spec["id"], spec["path"]
                        )
                    else:
                        new_v[fld] = spec
                out[k] = new_v
            elif isinstance(v, dict):
                out[k] = self._resolve_terms_lookups(v)
            elif isinstance(v, list):
                out[k] = [
                    self._resolve_terms_lookups(x) if isinstance(x, dict) else x
                    for x in v
                ]
            else:
                out[k] = v
        return out

    def indexed_shape(self, index: str, doc_id: str, path: str) -> dict:
        """Fetch the query geometry for a ``geo_shape`` ``indexed_shape``
        clause: the ``path`` field of ONE document in a shapes index —
        stored either as a GeoJSON-ish string or a struct/map row.  Like
        terms_lookup, this is a one-row bounded collect followed by a
        rewrite to the inline-``shape`` form, which is exactly how ES
        executes it (fetch the geometry once, then run a normal shape
        query)."""
        df = self.read_index(index, metadata=True)
        if "_id" not in df.columns:
            raise ValueError(f"indexed_shape index {index!r} has no _id column")
        rows = (
            df.filter(F.col("_id").cast("string") == str(doc_id))
            .select(path)
            .limit(1)
            .collect()
        )
        if not rows:
            raise DocumentMissingError(
                f"indexed_shape doc {doc_id!r} in {index!r}"
            )
        val = rows[0][0]
        if isinstance(val, str):
            val = json.loads(val)
        elif hasattr(val, "asDict"):
            val = val.asDict(recursive=True)
        if not isinstance(val, dict) or "type" not in val:
            raise ValueError(
                f"indexed_shape {index!r}/{doc_id!r}.{path} is not a shape "
                f"object (needs a 'type'): {type(val).__name__}"
            )
        return val

    def _resolve_indexed_shapes(self, q):
        """Pre-pass twin of _resolve_terms_lookups for ``geo_shape``
        clauses carrying ``indexed_shape`` ({"index","id","path"}):
        replace each with the fetched inline ``shape`` anywhere in the
        clause tree, so compile_query never needs catalog access."""
        if isinstance(q, str):
            s = q.strip()
            if not s.startswith("{"):
                return q
            q = json.loads(s)
        if not isinstance(q, dict):
            return q
        out = {}
        for k, v in q.items():
            if k == "geo_shape" and isinstance(v, dict):
                new_v = {}
                for fld, spec in v.items():
                    if isinstance(spec, dict) and isinstance(
                        spec.get("indexed_shape"), dict
                    ):
                        ref = spec["indexed_shape"]
                        shape = self.indexed_shape(
                            ref["index"], ref["id"], ref["path"]
                        )
                        new_v[fld] = {
                            **{kk: vv for kk, vv in spec.items()
                               if kk != "indexed_shape"},
                            "shape": shape,
                        }
                    else:
                        new_v[fld] = spec
                out[k] = new_v
            elif isinstance(v, dict):
                out[k] = self._resolve_indexed_shapes(v)
            elif isinstance(v, list):
                out[k] = [
                    self._resolve_indexed_shapes(x) if isinstance(x, dict) else x
                    for x in v
                ]
            else:
                out[k] = v
        return out

    # above this many data files the driver-side footer loop loses to the
    # distributed count job — shard/generation sizing (rollover, compact)
    # keeps real indices far below it
    _FOOTER_COUNT_MAX_FILES = 256

    def count_index(self, name: str, query: str | dict | None = None) -> int:
        """_count parity (A10).  The unfiltered count of plain (unfiltered-
        alias) targets is answered from parquet footer row counts read on
        the DRIVER — exactly ES's shard-stats doc count, zero Spark jobs
        (the count job, even footer-stats-pushed, costs 2-3 AQE jobs /
        ~1 s of scheduling per call, and rollover conditions pay it on
        every write).  Filtered counts and odd layouts fall back to the
        scan path."""
        if query is None:
            n = self._footer_count(name)
            if n is not None:
                return n
        return self.read_index(name, query=query).count()

    def _footer_count(self, name: str) -> int | None:
        """Driver-side row count from parquet footers, or None when the
        fast path does not apply (filtered alias, too many files, or any
        unreadable footer).  Walks exactly the files a Spark read would:
        txn-committed dirs for transactional indices, the plain directory
        otherwise, skipping '_'/'.'-prefixed entries (invisible to parquet
        readers too, so the two paths count the same files)."""
        try:
            pairs = self._resolve_parts(name)
        except Exception:
            return None  # let the slow path raise its own typed error
        if any(flt is not None for _, flt in pairs):
            return None
        import pyarrow.parquet as pq

        total = 0
        n_files = 0
        for idx, _ in pairs:
            path = self.path(idx)
            if txn.is_transactional(path):
                _, dirs = txn.latest(path)
                if not dirs:
                    return None  # slow path raises "no committed data"
            else:
                if not os.listdir(path) and self._read_meta(idx).get("schema"):
                    continue  # metadata-only empty generation: 0 rows
                dirs = [path]
            idx_files = 0
            for d in dirs:
                for root, subdirs, files in os.walk(d):
                    subdirs[:] = [s for s in subdirs if not s.startswith(("_", "."))]
                    for f in files:
                        if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                            continue
                        n_files += 1
                        idx_files += 1
                        if n_files > self._FOOTER_COUNT_MAX_FILES:
                            return None
                        try:
                            total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                        except Exception:
                            return None
            if idx_files == 0:
                # a data-less plain dir: the scan path would raise its
                # schema-inference error — don't silently answer 0
                return None
        return total

    def snapshot_index(self, name: str, repo: str, snapshot: str) -> dict:
        """ES ``_snapshot``: a point-in-time copy of the index into a
        repository directory.  The committed row set materializes as
        parquet under ``repo/<snapshot>/<name>/data`` (for a
        transactional index that is exactly the latest committed
        version — in-flight writers are invisible by construction), and
        the index ``_meta`` travels with it.  Returns the snapshot
        manifest.  Restore is ``restore_index``; snapshots are immutable
        once taken (re-snapshotting the same name raises, like ES's
        unique snapshot names)."""
        dest = os.path.join(repo, snapshot, name)
        if os.path.exists(dest):
            raise IndexExistsError(f"snapshot {snapshot!r} of {name!r} exists")
        df = self._read_resolved(name)
        df.write.parquet(os.path.join(dest, "data"))
        meta = self._read_meta(name)
        manifest = {"index": name, "snapshot": snapshot, "meta": meta}
        os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "_snapshot.json"), "w") as fh:
            json.dump(manifest, fh)
        return manifest

    def restore_index(
        self, repo: str, snapshot: str, name: str, rename_to: str | None = None
    ) -> None:
        """ES ``_restore``: materialize a snapshot as a (new) index.  The
        target must not exist — ES likewise refuses to restore over an
        open index; pass ``rename_to`` for the rename-on-restore pattern.
        The restored index is a plain commit; a transactional catalog
        adopts it into the manifest log on its next transactional write
        (txn.adopt's append-union publication)."""
        src = os.path.join(repo, snapshot, name)
        if not os.path.exists(os.path.join(src, "_snapshot.json")):
            raise ValueError(f"no snapshot {snapshot!r} of {name!r} in {repo!r}")
        target = rename_to or name
        if self.exists(target):
            raise IndexExistsError(
                f"index {target!r} exists — restore with rename_to, like ES"
            )
        df = self.spark.read.parquet(os.path.join(src, "data"))
        df.write.parquet(self.path(target))
        with open(os.path.join(src, "_snapshot.json")) as fh:
            manifest = json.load(fh)
        if manifest.get("meta"):
            self._write_meta(target, manifest["meta"])

    def list_snapshots(self, repo: str) -> list[dict]:
        """ES GET _snapshot/<repo>/_all: the repository's snapshot
        manifests."""
        out = []
        if not os.path.isdir(repo):
            return out
        for snap in sorted(os.listdir(repo)):
            sdir = os.path.join(repo, snap)
            if not os.path.isdir(sdir):
                continue
            for idx in sorted(os.listdir(sdir)):
                mpath = os.path.join(sdir, idx, "_snapshot.json")
                if os.path.exists(mpath):
                    with open(mpath) as fh:
                        out.append(json.load(fh))
        return out

    # ------------------------------------------------------------------ CCR
    def follow_index(
        self, leader: "Catalog", leader_index: str, follower_index: str | None = None
    ) -> dict:
        """ES CCR ``PUT /<follower>/_ccr/follow``: bootstrap a follower of
        a transactional leader index and record the leader pointer in the
        follower's _meta; ``ccr_poll`` pulls subsequent changes.

        The unit of replication is the leader's manifest version: data
        dirs are immutable once committed (txn.py), so a sync copies only
        the dirs the follower doesn't have yet and commits a follower
        manifest naming the leader's live set — the same shape as ES
        CCR's file-based bootstrap + incremental op shipping, without a
        row ever being rewritten.  Leader REPLACE commits (merges,
        compactions) replicate as manifest swaps; superseded dirs on the
        follower become vacuum-able, like on the leader.

        Followers are read-only (ES: a follower index rejects writes) —
        ``write_index`` refuses; ``unfollow_index`` converts one to a
        regular index."""
        follower_index = follower_index or leader_index
        lpath = leader.path(leader_index)
        if not txn.is_transactional(lpath):
            raise ValueError(
                "follow_index needs a transactional leader — the manifest "
                "log IS the replication protocol"
            )
        if self.exists(follower_index):
            raise IndexExistsError(follower_index)
        os.makedirs(self.path(follower_index), exist_ok=True)
        txn.init_log(self.path(follower_index))
        meta = leader._read_meta(leader_index)
        meta.update(
            {
                "ccr_leader_root": leader.root,
                "ccr_leader_index": leader_index,
                "ccr_leader_version": 0,
            }
        )
        self._write_meta(follower_index, meta)
        return self.ccr_poll(follower_index)

    def ccr_poll(self, follower_index: str) -> dict:
        """Sync the follower to the leader's latest committed version.
        Idempotent; returns ``{"leader_version", "follower_version",
        "synced"}`` where synced is False when already current."""
        import shutil

        meta = self._read_meta(follower_index)
        if "ccr_leader_root" not in meta:
            raise ValueError(f"{follower_index!r} is not a CCR follower")
        lpath = os.path.join(meta["ccr_leader_root"], meta["ccr_leader_index"])
        fpath = self.path(follower_index)
        lv, ldirs = txn.latest(lpath)
        if lv == meta["ccr_leader_version"]:
            return {
                "leader_version": lv,
                "follower_version": txn.latest(fpath)[0],
                "synced": False,
            }
        froot = txn.data_root(fpath)
        os.makedirs(froot, exist_ok=True)
        for d in ldirs:
            tgt = os.path.join(froot, os.path.basename(d.rstrip("/")))
            if not os.path.isdir(tgt):
                # immutable-once-committed: a dir is copied at most once
                # across the follower's lifetime, incremental by design.
                # Copy to a private temp name and rename into place so a
                # killed/concurrent poll never leaves a half-copied dir
                # that a later poll would treat as complete — txn.py's
                # "data dirs are complete before the manifest claim"
                # invariant must hold on the follower too.
                tmp = f"{tgt}.tmp.{uuid.uuid4().hex[:8]}"
                shutil.copytree(d, tmp)
                try:
                    os.rename(tmp, tgt)
                except OSError:
                    # another poll renamed its copy first — identical
                    # content (immutable source), drop ours
                    shutil.rmtree(tmp, ignore_errors=True)
        fv = txn.latest(fpath)[0] + 1
        if txn.try_commit(
            fpath, fv, ldirs, meta={"replace": True, "ccr_leader_version": lv}
        ):
            meta["ccr_leader_version"] = lv
        else:
            # a concurrent poll won the claim — adopt the WINNER's leader
            # version (it may be older or newer than ours; stamping our
            # own lv could mark leader data as synced that the committed
            # manifest does not contain)
            fv = txn.latest(fpath)[0]
            lv = txn.manifest_body(fpath, fv).get("ccr_leader_version", 0)
            meta["ccr_leader_version"] = lv
        self._write_meta(follower_index, meta)
        return {"leader_version": lv, "follower_version": fv, "synced": True}

    def unfollow_index(self, follower_index: str) -> None:
        """ES ``POST /<index>/_ccr/unfollow``: convert the follower into a
        regular (writable) index by dropping the leader pointer."""
        meta = self._read_meta(follower_index)
        if "ccr_leader_root" not in meta:
            raise ValueError(f"{follower_index!r} is not a CCR follower")
        for k in ("ccr_leader_root", "ccr_leader_index", "ccr_leader_version"):
            meta.pop(k, None)
        self._write_meta(follower_index, meta)

    # ----------------------------------------------------------- templates
    def _templates_path(self) -> str:
        return os.path.join(self.root, "_index_templates.json")

    def _read_templates(self) -> dict:
        try:
            with open(self._templates_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _component_templates_path(self) -> str:
        return os.path.join(self.root, "_component_templates.json")

    def _read_component_templates(self) -> dict:
        try:
            with open(self._component_templates_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def put_component_template(self, name: str, body: dict) -> None:
        """ES ``_component_template``: a reusable settings/mappings block
        an index template composes via ``composed_of``.  Resolution
        follows ES: components merge in ``composed_of`` order, the index
        template's own ``template`` wins last."""
        if not isinstance(body, dict) or "template" not in body:
            raise ValueError("component template needs a template: {...} block")
        comps = self._read_component_templates()
        comps[name] = body
        with open(self._component_templates_path(), "w") as f:
            json.dump(comps, f)

    def _resolve_template(self, body: dict) -> dict:
        """Merge composed_of component templates under the index
        template's own block (settings shallow-merge, mappings.properties
        shallow-merge — later wins, exactly ES's composition order)."""
        merged_settings: dict = {}
        merged_props: dict = {}
        comps = self._read_component_templates()
        for cname in body.get("composed_of", []):
            if cname not in comps:
                raise ValueError(f"unknown component template {cname!r}")
            t = comps[cname].get("template") or {}
            merged_settings.update(t.get("settings") or {})
            merged_props.update((t.get("mappings") or {}).get("properties") or {})
        own = body.get("template") or {}
        merged_settings.update(own.get("settings") or {})
        merged_props.update((own.get("mappings") or {}).get("properties") or {})
        out: dict = {}
        if merged_settings:
            out["settings"] = merged_settings
        if merged_props:
            out["mappings"] = {"properties": merged_props}
        return out

    def put_index_template(self, name: str, body: dict) -> None:
        """ES ``_index_template``: index_patterns + priority + a template
        of settings/mappings, optionally ``composed_of`` component
        templates (merged in order, the template's own block last).
        Resolved when write_index CREATES a matching index and persisted
        into the index ``_meta``; from then on ``index.default_pipeline``
        runs the registered ingest pipeline over EVERY batch written to
        that index (ES applies it per indexing request, not per index
        creation), ``index.sort.field`` stays the write sort (row-group-
        stats clustering), and ``mappings`` persist for ``get_mapping``."""
        if not isinstance(body, dict) or not body.get("index_patterns"):
            raise ValueError("index template needs index_patterns: [...]")
        resolved = self._resolve_template(body)  # validates composed_of
        settings = resolved.get("settings") or {}
        pname = settings.get("index.default_pipeline") or settings.get(
            "default_pipeline"
        )
        if pname:
            self.get_pipeline(pname)  # fail at declaration if unregistered
        templates = self._read_templates()
        templates[name] = body
        with open(self._templates_path(), "w") as f:
            json.dump(templates, f)

    def delete_index_template(self, name: str) -> None:
        templates = self._read_templates()
        templates.pop(name, None)
        with open(self._templates_path(), "w") as f:
            json.dump(templates, f)

    def _match_template(self, index_name: str) -> dict | None:
        import fnmatch

        best, best_prio, best_name = None, None, None
        for tname, body in self._read_templates().items():
            for pat in body.get("index_patterns", []):
                if fnmatch.fnmatch(index_name, pat):
                    prio = int(body.get("priority", 0))
                    # ES picks the highest priority; ties break by name
                    # for determinism (ES rejects ambiguous ties)
                    if (
                        best_prio is None
                        or prio > best_prio
                        or (prio == best_prio and str(tname) < str(best_name))
                    ):
                        best, best_prio, best_name = body, prio, tname
                    break
        return best

    def get_mapping(self, name: str) -> dict:
        """GET <index>/_mapping: the template-applied (or put) mapping, else
        a mapping inferred from the parquet schema (dynamic-mapping
        analogue)."""
        meta = self._read_meta(name)
        if meta.get("mappings"):
            return meta["mappings"]
        schema = self._read_files(name).schema
        type_map = {
            "string": "keyword", "bigint": "long", "int": "integer",
            "double": "double", "float": "float", "boolean": "boolean",
            "timestamp": "date", "binary": "binary",
        }
        return {
            "properties": {
                f.name: {"type": type_map.get(f.dataType.simpleString(), "object")}
                for f in schema.fields
            }
        }

    def field_caps(self, pattern: str) -> dict:
        """ES ``GET <pattern>/_field_caps?fields=*``: per-field capability
        map merged across every index the pattern resolves (wildcards,
        comma lists, aliases — same resolver as read_index).  Shape
        matches ES: ``{"indices": [...], "fields": {field: {type:
        {"type", "searchable", "aggregatable"[, "indices"]}}}}`` — the
        per-type ``indices`` list appears only on CONFLICTING fields
        (ES omits it when all indices agree).  Types come from each
        index's mapping (template-applied or schema-inferred via
        get_mapping), so the answer needs no data read — a pure metadata
        pass, O(#indices) not O(rows).  Everything here is searchable;
        ES's text-fields-not-aggregatable rule is applied to ``text``
        mappings."""
        indices = sorted(
            {idx for idx, _flt in self._resolve_parts(pattern)}
        )
        fields: dict[str, dict[str, dict]] = {}
        per_type_indices: dict[tuple[str, str], list[str]] = {}
        for idx in indices:
            props = (self.get_mapping(idx) or {}).get("properties", {})
            for fname, spec in props.items():
                ftype = spec.get("type", "object")
                caps = fields.setdefault(fname, {})
                if ftype not in caps:
                    caps[ftype] = {
                        "type": ftype,
                        "searchable": True,
                        "aggregatable": ftype != "text",
                    }
                per_type_indices.setdefault((fname, ftype), []).append(idx)
        # a field is conflicting when its types differ across indices OR
        # it is absent from some index that has the field under another
        # type; per ES, agreed fields carry no indices list
        for fname, caps in fields.items():
            if len(caps) > 1:
                for ftype, cap in caps.items():
                    cap["indices"] = per_type_indices[(fname, ftype)]
        return {"indices": indices, "fields": fields}

    # ----------------------------------------------------------- pipelines
    def _pipelines_path(self) -> str:
        return os.path.join(self.root, "_pipelines.json")

    def put_pipeline(self, name: str, body: dict | list) -> None:
        """PUT _ingest/pipeline/<name>: register a pipeline for
        default_pipeline template settings (and ad-hoc reuse).  Compiled
        once at declaration so a bad pipeline fails here, not on the
        first write through a template."""
        from elasticsearch_hadoop_spark.ingest import compile_pipeline

        compile_pipeline(body)
        try:
            with open(self._pipelines_path()) as f:
                pipelines = json.load(f)
        except FileNotFoundError:
            pipelines = {}
        pipelines[name] = body
        with open(self._pipelines_path(), "w") as f:
            json.dump(pipelines, f)

    def get_pipeline(self, name: str) -> dict | list:
        try:
            with open(self._pipelines_path()) as f:
                pipelines = json.load(f)
        except FileNotFoundError:
            pipelines = {}
        if name not in pipelines:
            raise ValueError(f"no such ingest pipeline: {name!r}")
        return pipelines[name]

    # ---------------------------------------------------------------- data streams
    def _data_streams_path(self) -> str:
        return os.path.join(self.root, "_data_streams.json")

    def _read_data_streams(self) -> dict:
        try:
            with open(self._data_streams_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def downsample_index(
        self,
        source: str,
        target: str,
        fixed_interval: str,
        *,
        timestamp_col: str = "@timestamp",
        dimensions: list[str] | None = None,
        metrics: dict[str, str] | None = None,
    ) -> None:
        """ES ``POST /<source>/_downsample/<target>`` — the TSDS rollup:
        aggregate a time-series index into one document per
        (time bucket, dimensions), with per-metric summaries:

        - ``gauge`` metrics keep ``<m>.min / <m>.max / <m>.sum /
          <m>.value_count`` (flattened here to ``<m>_min`` etc. — the
          engine's columnar rendering of ES's aggregate_metric_double);
        - ``counter`` metrics keep ``<m>_last`` (the latest value in the
          bucket, ES's last_value), ordered by the timestamp; timestamp
          ties break by the metric value (max), deterministically.

        The bucket timestamp floors to ``fixed_interval`` (same epoch
        arithmetic as the aggs-DSL date_histogram).  In ES the dimensions
        and metric kinds come from time_series_dimension /
        time_series_metric MAPPINGS; this schema-less catalog takes them
        as parameters.

        Scale: this is the aggregate-once / query-forever pattern — one
        partial-aggregated shuffle on (dimensions, bucket) writes an
        index ~interval/resolution times smaller; downstream queries
        read the downsampled index and never rescan the raw series.  ES
        applies the same downsampling in ILM; compose with
        apply_lifecycle by downsampling a rolled-over generation."""
        metrics = metrics or {}
        bad = [k for k, v in metrics.items() if v not in ("gauge", "counter")]
        if bad:
            raise ValueError(
                f"downsample metrics must be gauge|counter, got {bad}"
            )
        secs = int(parse_duration(fixed_interval))
        if secs <= 0:
            raise ValueError(f"bad fixed_interval {fixed_interval!r}")
        df = self.read_index(source)
        dims = list(dimensions or [])
        # floor, not cast-truncation: a negative epoch (pre-1970 series)
        # must bucket DOWN, matching the aggs-DSL date_histogram arithmetic
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(timestamp_col)) / secs).cast("long")
            * secs
        ).alias(timestamp_col)
        aggs: list[Column] = [F.count(F.lit(1)).alias("_doc_count")]
        for m, kind in metrics.items():
            if kind == "gauge":
                aggs += [
                    F.min(m).alias(f"{m}_min"),
                    F.max(m).alias(f"{m}_max"),
                    F.sum(m).alias(f"{m}_sum"),
                    F.count(m).alias(f"{m}_value_count"),
                ]
            else:
                # counter -> last value in the bucket by timestamp; ties
                # on the timestamp break by the metric value itself (max),
                # so the result is layout-independent — a bare max_by
                # would flip between partition evaluation orders
                aggs.append(
                    F.max_by(
                        m, F.struct(F.col(timestamp_col), F.col(m))
                    ).alias(f"{m}_last")
                )
        out = df.groupBy(bucket, *[F.col(d) for d in dims]).agg(*aggs)
        self.write_index(out, target, mode="overwrite")

    def create_data_stream(self, name: str) -> None:
        """ES data stream: an append-only, timestamp-bearing stream backed
        by ``.ds-<name>-NNNNNN`` generation indices behind an alias named
        like the stream.  The first write creates generation 000001 (ES
        creates backing indices lazily from the template too); rollover
        bounds per-generation size so vacuum/compact/Z-order work on
        bounded units and pattern reads prune whole generations."""
        streams = self._read_data_streams()
        if name in streams:
            raise IndexExistsError(f"data stream {name!r} exists")
        if self.exists(name) or name in self._read_aliases():
            raise IndexExistsError(f"{name!r} is already an index/alias")
        streams[name] = {"created_at": time.time()}
        with open(self._data_streams_path(), "w") as f:
            json.dump(streams, f)

    def write_data_stream(
        self, df: DataFrame, name: str, max_docs_per_generation: int | None = None
    ) -> dict:
        """Append a batch to a data stream (ES only allows op_type=create
        on streams — no updates/deletes, hence no id/operation kwargs
        here).  ``@timestamp`` is required, like ES.  When
        ``max_docs_per_generation`` is set, a rollover check runs after
        the write (the ILM hot-phase analogue)."""
        if name not in self._read_data_streams():
            raise ValueError(f"no such data stream: {name!r}")
        if "@timestamp" not in df.columns:
            raise ValueError("data stream writes require an @timestamp column")
        aliases = self._read_aliases()
        if name not in aliases:
            backing = f".ds-{name}-000001"
            self.write_index(df, backing)
            meta = self._read_meta(backing)
            meta["created_at"] = time.time()
            self._write_meta(backing, meta)
            self.put_alias(name, backing)
        else:
            self.write_alias(df, name)
        if max_docs_per_generation is not None:
            return self.rollover(name, max_docs=max_docs_per_generation)
        return {"rolled_over": False}

    def data_stream_stats(self, name: str) -> dict:
        """GET _data_stream/<name>/_stats: generations + per-backing doc
        counts (footer-stats counts, no scan)."""
        if name not in self._read_data_streams():
            raise ValueError(f"no such data stream: {name!r}")
        targets = self._read_aliases().get(name, [])
        return {
            "data_stream": name,
            "generations": len(targets),
            "backing_indices": [
                {"index": t, "docs_count": self.count_index(t)} for t in targets
            ],
        }

    def delete_data_stream(self, name: str) -> None:
        """DELETE _data_stream/<name>: removes the backing indices too,
        exactly like ES."""
        streams = self._read_data_streams()
        if name not in streams:
            raise ValueError(f"no such data stream: {name!r}")
        for t in self._read_aliases().get(name, []):
            self.drop_index(t)
        self.delete_alias(name)
        streams.pop(name)
        with open(self._data_streams_path(), "w") as f:
            json.dump(streams, f)

    def cat_indices(self) -> list[dict]:
        """ES ``GET _cat/indices``: one row per managed index — name,
        docs.count, store.size (bytes on disk) — from footer stats and a
        directory walk, no data scan."""
        out = []
        for n in self.list_indices():
            size = 0
            for root, _dirs, files in os.walk(self.path(n)):
                size += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
            out.append(
                {"index": n, "docs_count": self.count_index(n), "store_bytes": size}
            )
        return out

    def sql_query(self, sql: str, pattern: str = "*") -> DataFrame:
        """ES SQL (`_sql` endpoint) veneer: every managed index matching
        ``pattern`` registers as a temp view (dots/dashes mapped to
        underscores — reference the mapped name, or backtick the
        original), then the statement runs through Spark SQL.  ES SQL's
        grammar is an ANSI subset, so the statement itself passes
        through; Catalyst plans it with the same pushdown/pruning as the
        DataFrame API — there is no second engine.  (ES doubles quotes
        for identifiers; Spark uses backticks — the one documented
        dialect difference.)"""
        for n in self.resolve_pattern(pattern):
            view = re.sub(r"[^A-Za-z0-9_]", "_", n)
            self.read_index(n).createOrReplaceTempView(view)
        return self.spark.sql(sql)

    @staticmethod
    def _sql_order_fields(sql: str) -> list[tuple[str, bool]]:
        """Parse the statement's top-level ``ORDER BY`` into
        ``[(column, ascending)]`` — the keyset a SQL cursor pages on.
        Depth-0 scan only (an ORDER BY inside a subquery doesn't order
        the result set); string literals AND quoted identifiers
        (double-quoted, backticked) are blanked first so quoted content
        can't fake tokens or desynchronize the paren depth.  LIMIT/OFFSET
        at the top level are rejected: ``fetch_size`` owns the page
        size."""
        blanked = re.sub(
            r"'[^']*'|\"[^\"]*\"|`[^`]*`",
            lambda m: " " * len(m.group(0)),
            sql,
        )
        depth, pos, limited = 0, -1, False
        for m in re.finditer(
            r"\(|\)|\bORDER\s+BY\b|\bLIMIT\b|\bOFFSET\b", blanked, flags=re.I
        ):
            t = m.group(0)
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif depth == 0:
                if t.upper() in ("LIMIT", "OFFSET"):
                    limited = True
                else:
                    pos = m.end()
        if limited:
            raise ValueError(
                "cursor paging owns the page size — remove the top-level "
                "LIMIT/OFFSET and use fetch_size"
            )
        if pos < 0:
            raise ValueError(
                "cursor paging needs a top-level ORDER BY ending in a "
                "unique key (the ES SQL fetch_size contract: without a "
                "total order, page boundaries are undefined)"
            )
        # split the ORDER BY tail on the BLANKED text (quoted spans are
        # spaces there) and slice the ORIGINAL sql by those offsets — a
        # raw split would break a backtick-quoted sort column that
        # contains a comma mid-identifier
        items, start = [], pos
        for i in range(pos, len(blanked)):
            if blanked[i] == ",":
                items.append(sql[start:i])
                start = i + 1
        items.append(sql[start:])
        fields: list[tuple[str, bool]] = []
        for item in items:
            im = re.match(
                r"^\s*(?:([A-Za-z_][A-Za-z0-9_.]*)|`([^`]+)`)\s*(ASC|DESC)?\s*$",
                item,
                flags=re.I,
            )
            if not im:
                raise ValueError(
                    f"cursor paging needs plain `col [ASC|DESC]` sort items "
                    f"(the keyset must be re-filterable), got {item.strip()!r}"
                )
            fields.append(
                (im.group(1) or im.group(2), (im.group(3) or "ASC").upper() != "DESC")
            )
        return fields

    def sql_page(
        self,
        sql: str | None = None,
        *,
        fetch_size: int = 1000,
        cursor: str | None = None,
        pattern: str = "*",
        columnar: bool | None = None,
    ) -> dict:
        """ES SQL cursor paging: ``POST /_sql {"query":..., "fetch_size":N}``
        then ``POST /_sql {"cursor": ...}`` continuations.  Returns
        ``{"columns": [{name, type}], "rows": [[...]], "cursor": id|None}``
        — ``cursor`` is None once the result set is exhausted (ES stops
        returning one).

        Where ES keeps a server-side scroll context per cursor, this
        engine's cursor is STATELESS: an opaque token encoding the
        statement, the ORDER BY keyset, and the last row's key values.
        Each page re-plans as keyset filter + TakeOrderedAndProject — the
        deep-pagination shape that stays O(page) at 100 TB, where ES's own
        cursor degrades to context memory and OFFSET would re-sort the
        prefix.  Consequences, both documented: the statement needs a
        top-level ORDER BY ending in a unique key whose columns appear in
        the projection, and pages see live data (pin a PIT /
        read_index_version first for frozen paging — the same advice ES
        gives for search_after without a PIT).

        Cursor key values round-trip through JSON: keep keyset columns to
        long/int/string/double/bool (dates serialize as strings and come
        back as string literals — Spark's implicit cast compares them
        correctly against timestamp columns, but prefer epoch numbers in
        the keyset).

        ``columnar=True`` (ES's ``"columnar": true``) renders each page
        column-major — ``"values": [[col1...], [col2...]]`` instead of
        ``"rows"`` — and the mode persists through the cursor like ES's
        does; passing an explicit ``columnar`` on a continuation that
        DISAGREES with the cursor's mode raises, also like ES.  A pure
        response-shape transpose: the plan is identical."""
        import base64

        if cursor is not None:
            if sql is not None:
                raise ValueError("pass either sql or cursor, not both")
            state = json.loads(base64.b64decode(cursor))
            sql, pattern = state["sql"], state["pattern"]
            fetch_size = state["fetch_size"]
            fields = [(f, bool(a)) for f, a in state["fields"]]
            after = state["after"]
            stored = bool(state.get("columnar", False))
            if columnar is not None and bool(columnar) != stored:
                raise ValueError(
                    "columnar mismatch: this cursor was minted with "
                    f"columnar={stored} (ES likewise rejects a changed "
                    "columnar setting mid-scroll)"
                )
            columnar = stored
        else:
            if sql is None:
                raise ValueError("sql_page needs a statement or a cursor")
            fields = self._sql_order_fields(sql)
            after = None
            columnar = bool(columnar)
        fetch_size = int(fetch_size)
        if fetch_size <= 0:
            raise ValueError(f"fetch_size must be positive, got {fetch_size}")
        df = self.sql_query(sql, pattern)
        # Spark resolves identifiers case-insensitively; the keyset
        # bookkeeping must too (resolve each sort item to the actual
        # output column name once, use it everywhere)
        by_lower = {c.lower(): c for c in df.columns}
        missing = [f for f, _ in fields if f.lower() not in by_lower]
        if missing:
            raise ValueError(
                f"cursor keyset columns {missing} must appear in the "
                "statement's projection (the next-page filter needs them)"
            )
        fields = [(by_lower[f.lower()], asc) for f, asc in fields]
        from elasticsearch_hadoop_spark.search import lexicographic_after

        # F.col parses a dot as struct access — a quoted identifier like
        # `a.b` must stay backtick-escaped when building Columns (the raw
        # name is still what Row access and the cursor state use)
        def q(f: str) -> str:
            return f"`{f}`" if "." in f else f

        page = df
        if after is not None:
            # null_aware: NULL key values page at Spark's default sort
            # position (asc first / desc last) instead of NULL-comparing
            # out of every later page
            page = page.filter(
                lexicographic_after(
                    [(q(f), asc) for f, asc in fields], after, null_aware=True
                )
            )
        order = [F.col(q(f)).asc() if asc else F.col(q(f)).desc() for f, asc in fields]
        rows = page.orderBy(*order).limit(fetch_size).collect()
        next_cursor = None
        if len(rows) == fetch_size:
            state = {
                "sql": sql,
                "pattern": pattern,
                "fetch_size": fetch_size,
                "fields": [[f, asc] for f, asc in fields],
                "after": [rows[-1][f] for f, _ in fields],
                "columnar": columnar,
            }
            next_cursor = base64.b64encode(
                json.dumps(state, default=str).encode()
            ).decode()
        out = {
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in df.schema.fields
            ],
            "cursor": next_cursor,
        }
        if columnar:
            out["values"] = [
                [r[i] for r in rows] for i in range(len(df.columns))
            ]
        else:
            out["rows"] = [list(r) for r in rows]
        return out

    def sql_close_cursor(self, cursor: str) -> dict:
        """ES ``POST /_sql/close``.  Cursors here are stateless tokens —
        there is no server context to free — so close only validates the
        token and reports success (API parity for callers that always
        close)."""
        import base64

        json.loads(base64.b64decode(cursor))  # raises on a malformed token
        return {"succeeded": True}

    def read_index_stream(
        self, name: str, query: str | dict | None = None, schema=None
    ) -> DataFrame:
        """Streaming read of a managed index: new parquet files appended to
        the index path become micro-batches (Structured Streaming file
        source — the readStream symmetry to the A9 sink). Structured
        Streaming requires a fixed schema; default = the index's current
        one. ``query`` compiles to a Column predicate exactly as in
        read_index, so per-batch filtering inherits pushdown.

        Works with blind-append writes (write_index without id_col);
        merge-based operations rewrite files in place, which a file stream
        will not re-read — use the esdocs streaming sink for those.
        Transactional indices stream from the ``_stream`` publish farm
        (txn.enable_streaming): every commit hard-links its
        manifest-referenced data dirs there, so the stream sees exactly the
        committed set — never an in-flight writer's or crashed job's dir
        from the raw ``_data`` pool (those are orphans vacuum deletes, and
        rows delivered from them would silently diverge from batch reads).
        That only holds for APPEND-ONLY logs — a REPLACE commit (overwrite,
        merge ops, delete/update_by_query, compact_index) writes a full new
        snapshot dir that a file stream would re-deliver as duplicates of
        every already-streamed row, so a log with any replace commit is
        refused (same rule as the non-transactional caveat above, enforced
        instead of just documented)."""
        names = self.resolve_pattern(name)
        if len(names) != 1:
            raise ValueError(f"streaming read supports a single index, got {names}")
        path = self.path(names[0])

        def _default_schema():
            # the write path records the index schema in _meta — zero Spark
            # work; fall back to file inference (one footer job) otherwise
            meta = self._read_meta(names[0])
            if meta.get("schema"):
                from pyspark.sql.types import StructType

                return StructType.fromJson(meta["schema"])
            return self._read_files(names[0]).schema

        if txn.is_transactional(path):
            if txn.has_replace_commit(path):
                raise ValueError(
                    f"index {names[0]!r} has replace commits in its log; a file "
                    "stream would re-deliver replaced snapshots as duplicates — "
                    "use the esdocs streaming sink for merge-style pipelines"
                )
            if schema is None:
                schema = _default_schema()
            stream_path = os.path.join(txn.enable_streaming(path), "*")
        else:
            if schema is None:
                schema = _default_schema()
            stream_path = path
        df = self.spark.readStream.schema(schema).parquet(stream_path)
        if query is not None:
            df = df.filter(compile_query(query))
        return df

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: list[str],
        num_buckets: int,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Persist an index as a bucketed table (hash-partitioned into
        ``num_buckets`` files by ``bucket_cols``, optionally sorted within
        buckets). This is the 100 TB co-located-join path referenced from
        the join corpus: two tables bucketed the same way on the join key
        are joined with ZERO shuffle (verified in tests/test_skew_bucket.py
        by asserting no Exchange in the plan).

        Bucketing metadata lives in the session catalog (saveAsTable with
        an explicit path -> external table at the index's managed path);
        read back with ``read_bucketed`` — a plain parquet read of the same
        path works too but loses the bucket metadata and re-shuffles."""
        table = self._table_name(name)
        writer = df.write.format("parquet").option("path", self.path(name)).mode(mode)
        writer = writer.bucketBy(num_buckets, *bucket_cols)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(table)
        self._write_meta(
            name,
            {"bucket_cols": bucket_cols, "num_buckets": num_buckets, "table": table},
        )

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed index through the session catalog (keeps the
        bucket-distribution metadata Catalyst needs to elide shuffles)."""
        return self.spark.table(self._table_name(name))

    def _table_name(self, name: str) -> str:
        import re as _re

        return "esidx_" + _re.sub(r"[^A-Za-z0-9_]", "_", name)


def ccs_read(
    clusters: dict[str, Catalog],
    resource: str,
    query: str | dict | None = None,
) -> DataFrame:
    """ES cross-cluster search: ``cluster:index`` resource parts resolved
    against a map of named catalogs (the remote-cluster registry
    analogue).  A part without a cluster prefix resolves in the
    ``"local"`` catalog, like ES.  Per-cluster reads stay independent
    scans (pushdown per branch, exactly the multi-index union story) and
    union by name with a ``_cluster`` column — which is how ES tags CCS
    hits (``_index`` = ``cluster:index``)."""
    if not clusters:
        raise ValueError("ccs_read needs at least one cluster")
    parts: list[tuple[str, str]] = []
    for p in (x.strip() for x in resource.split(",")):
        if not p:
            continue
        if ":" in p:
            cluster, pattern = p.split(":", 1)
        else:
            cluster, pattern = "local", p
        if cluster not in clusters:
            raise ValueError(f"unknown cluster {cluster!r} in {p!r}")
        parts.append((cluster, pattern))
    if not parts:
        raise ValueError(f"no resource parts in {resource!r}")
    frames = []
    for cluster, pattern in parts:
        df = clusters[cluster].read_index(pattern, query=query)
        frames.append(df.withColumn("_cluster", F.lit(cluster)))
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2, allowMissingColumns=True)
    return out


def dedupe_last(df: DataFrame, key: str) -> DataFrame:
    """Last-write-wins within a batch on ``key`` (ES bulk ordering parity).
    Uses a monotonically-increasing ordinal as the tiebreak; max_by keeps it
    a single hash aggregate (no window sort)."""
    ordered = df.withColumn("_ord", F.monotonically_increasing_id())
    cols = [c for c in df.columns if c != key]
    agg = ordered.groupBy(key).agg(
        *[F.max_by(F.col(c), F.col("_ord")).alias(c) for c in cols]
    )
    return agg.select(df.columns)


def format_index_pattern(pattern: str) -> Column:
    """Compile ``"logs-{field}"`` / ``"{field|date:yyyy-MM-dd}"`` into a
    Column (A7: AbstractIndexExtractor/IndexFormatter parity)."""
    pieces: list[Column] = []
    pos = 0
    for m in _PATTERN_RE.finditer(pattern):
        if m.start() > pos:
            pieces.append(F.lit(pattern[pos : m.start()]))
        field, _, datefmt = m.groups()
        col = F.col(field)
        if datefmt:
            pieces.append(F.date_format(col, datefmt))
        else:
            pieces.append(col.cast("string"))
        pos = m.end()
    if pos < len(pattern):
        pieces.append(F.lit(pattern[pos:]))
    if not pieces:
        return F.lit(pattern)
    return F.concat(*pieces) if len(pieces) > 1 else pieces[0]
