"""``acid_cdf`` — the commit-log ACID table's change feed as a REAL
Structured Streaming source (r8, VERDICT r7 #1)::

    register_acid_cdf(spark)
    changes = (spark.readStream.format("acid_cdf")
               .option("path", "/data/orders_acid")
               .option("startingVersion", 0)
               .load())
    # schema: <table columns> + _change_type STRING + _commit_version BIGINT

r7's :class:`~als_hadoop_spark.streaming.cdf_source.CdfFollower` proved
the CDC loop but had to be driven by a hand-rolled poll loop; this
module hands triggers, offset checkpointing, replay, and backpressure
to Structured Streaming itself — the same move Delta makes with
``spark.readStream.format("delta").option("readChangeFeed", "true")``
(public Delta CDF docs). The offset IS the table's log version, exactly
the pattern the repo's generator source already proved
(sources/generator.py:171 — initialOffset / latestOffset /
offset-ranged deterministic partitions).

Scale design:

- PLANNING (driver): ``partitions(start, end)`` reads ONLY the commit
  JSONs in ``(start, end]`` — KBs per version, never data — and emits
  one ``InputPartition`` PER CHANGE FILE, so a commit that touched 400
  files fans out as 400 executor tasks like any parquet scan.
- READ (executor): each partition reads its one parquet file with
  pyarrow, stamps ``_change_type`` / ``_commit_version``, and aligns to
  the stream schema (missing columns → NULL, additive widening → cast)
  — Arrow batches end-to-end, no Python rows.
- REPLAY: commit JSONs and staged data files are immutable, so
  ``partitions(start, end)`` is deterministic — a failed or restarted
  micro-batch re-reads exactly its bytes (the exactly-once source
  contract; the sink side is ``stream_maintain_rollup``'s txn-stamped
  fold).
- CHANGE DERIVATION is file-local by construction: append → added
  files tagged ``insert``; overwrite → removed files tagged ``delete``
  plus added files tagged ``insert``; MERGE/DELETE replay their staged
  ``_acid_cdc/`` sidecar (which carries precise pre/post images).
  A MERGE/DELETE committed WITHOUT ``cdf=True`` needs a multiset diff
  across files — not expressible as independent file reads — so
  planning raises and names the fix (same posture as Delta, where CDF
  streaming requires ``delta.enableChangeDataFeed`` at write time).

Limitations (all raise loudly at planning, never wrong answers):
schema-op commits (rename/drop/widen) in the streamed range require a
stream restart (Delta parity); vacuumed change files below the
retention horizon; log versions cleaned below ``startingVersion``.

Everything is defined inside :func:`build_acid_cdf_source` so
cloudpickle ships the classes BY VALUE (a module-level class pickles by
reference and dies on executors without this package on PYTHONPATH —
the established discipline of sources/generator.py:47). For the same
reason the class touches NOTHING from this package: the log parsing it
needs (list versions, read entry JSONs, replay live files) is ~30 lines
of json/os against the documented on-disk format (sources/acid.py:87
``_acid_log/<version>.json`` with add/remove/cdc/schema_op actions).
"""

from __future__ import annotations

#: extra columns every change row carries (Delta CDF naming)
CDF_COLS = (("_change_type", "string"), ("_commit_version", "bigint"))


def build_acid_cdf_source():
    """Return the AcidCdfSource class (function-local so cloudpickle
    serializes it by value to executors)."""
    from dataclasses import dataclass, field

    import pyarrow as pa
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    LOG_DIR = "_acid_log"

    def _versions(path: str) -> list[int]:
        import os

        log_dir = os.path.join(path, LOG_DIR)
        if not os.path.isdir(log_dir):
            return []
        return sorted(
            int(n[:-5])
            for n in os.listdir(log_dir)
            if n.endswith(".json")
            and not n.endswith(".checkpoint.json")
            and n[:-5].isdigit()
        )

    def _entry(path: str, v: int) -> dict:
        """Parsed commit entry, with the bounded torn-read retry
        (sources/acid.py ``_load_entry_retry`` twin): entries published
        by the r9 writers are complete-on-visibility (link publish), so
        the retry only fires against a pre-r9 writer mid-write."""
        import json
        import os
        import time

        p = os.path.join(path, LOG_DIR, f"{v:010d}.json")
        for i in range(50):
            try:
                with open(p) as f:
                    return json.load(f)
            except json.JSONDecodeError:
                if i == 49:
                    raise
                time.sleep(0.01)

    @dataclass
    class ChangeFile(InputPartition):
        path: str | None  # absolute parquet path; None = planned-empty
        tag: str | None  # insert/delete, or None (file carries the tag)
        version: int
        schema: object = field(default=None)  # pa.Schema of the stream

    class AcidCdfStreamReader(DataSourceStreamReader):
        def __init__(self, options, schema):
            from pyspark.sql.pandas.types import to_arrow_schema

            self.path = options.get("path")
            if not self.path:
                raise ValueError("acid_cdf: option 'path' is required")
            self.starting = int(options.get("startingVersion", 0))
            #: per-batch version cap (r10, VERDICT r9 #7): pyspark's
            #: DataSourceStreamReader lacks SupportsTriggerAvailableNow
            #: AND ReadLimit, so Trigger.AvailableNow falls back to ONE
            #: batch over everything available — a month-long backlog
            #: becomes one giant batch. latestOffset() therefore admits
            #: at most this many versions past the highest offset the
            #: runtime has shown us (Spark re-plans the checkpointed
            #: batch via partitions() BEFORE asking latestOffset on a
            #: restart — probed behavior, gated in
            #: tests/test_streaming.py — so the floor is always known
            #: when it matters). A backlog of N commits drains in
            #: ceil(N/cap) AvailableNow runs, each exactly-once.
            self.max_versions = int(
                options.get("maxversionsperbatch")
                or options.get("maxVersionsPerBatch")
                or 256
            )
            if self.max_versions < 1:
                raise ValueError(
                    "acid_cdf: maxVersionsPerBatch must be >= 1"
                )
            #: highest offset version the runtime has revealed —
            #: through partitions() (planning/replay) or commit()
            self._floor: int | None = None
            self._schema = to_arrow_schema(schema)
            #: highest version verified schema-op-free (schema ops are
            #: append-only facts: once commits <= N are known clean,
            #: the next batch scans only (N, hi] — without this the
            #: guard re-read EVERY retained commit JSON per micro-batch,
            #: O(total commits) small-file reads on long-lived tables).
            #: None = the full check (incl. checkpoint) hasn't run yet.
            self._clean_upto: int | None = None
            #: bounded memo of parsed commit entries (immutable JSONs);
            #: the guard and the partition loop share reads through it
            self._entries: dict[int, dict] = {}

        def _entry_cached(self, v: int) -> dict:
            hit = self._entries.get(v)
            if hit is None:
                hit = _entry(self.path, v)
                if len(self._entries) >= 4096:
                    for k in list(self._entries)[:1024]:
                        del self._entries[k]
                self._entries[v] = hit
            return hit

        def initialOffset(self) -> dict:
            return {"version": self.starting - 1}

        def latestOffset(self) -> dict:
            vs = _versions(self.path)
            head = vs[-1] if vs else self.starting - 1
            floor = (
                self._floor if self._floor is not None else self.starting - 1
            )
            return {"version": min(head, floor + self.max_versions)}

        def partitions(self, start: dict, end: dict):
            import os

            lo, hi = int(start["version"]), int(end["version"])
            # the runtime's start/end are authoritative — ratchet the
            # admission floor so the NEXT latestOffset caps relative to
            # real progress (incl. a restart's re-planned batch)
            known = max(lo, hi)
            if self._floor is None or known > self._floor:
                self._floor = known
            retained = set(_versions(self.path))
            missing = [v for v in range(lo + 1, hi + 1) if v not in retained]
            if missing:
                raise ValueError(
                    f"acid_cdf: commit JSON(s) {missing[:5]} in range "
                    f"({lo}, {hi}] are below the retained-log horizon "
                    "(cleanup_log removed them) — restart the stream "
                    "with a higher startingVersion"
                )
            # refuse schema-evolved tables at PLANNING even when the
            # user supplied an explicit schema (bypassing schema()'s
            # own refusal): an overwrite in range can remove files
            # written before a rename, and aligning their OLD physical
            # names to the stream schema would silently emit NULL
            # columns — wrong rows, not an error. AcidTable's
            # table_changes applies per-file-epoch schema ops; this
            # source refuses until it does the same.
            check_from = (
                self._clean_upto + 1 if self._clean_upto is not None else 0
            )
            evolved = any(
                check_from <= v <= hi
                and self._entry_cached(v).get("schema_op")
                for v in retained
            )
            if not evolved and self._clean_upto is None:
                # first batch only: a cleaned prefix may hide its
                # schema ops inside the covering checkpoint — consult
                # it too (later batches extend from _clean_upto, which
                # already subsumes the checkpointed history)
                import json

                try:
                    with open(
                        os.path.join(self.path, LOG_DIR, "_last_checkpoint")
                    ) as f:
                        cp = int(json.load(f)["version"])
                    with open(
                        os.path.join(
                            self.path, LOG_DIR, f"{cp:010d}.checkpoint.json"
                        )
                    ) as f:
                        evolved = bool(json.load(f)["state"].get("schema_ops"))
                except (OSError, ValueError, KeyError):
                    pass
            if evolved:
                raise ValueError(
                    "acid_cdf: table has schema-change commits — "
                    "streaming reads of schema-evolved tables are not "
                    "supported (aligning pre-rename files to the stream "
                    "schema would silently NULL their columns); use "
                    "AcidTable.table_changes (per-file-epoch mapping) "
                    "or restart after compacting with OPTIMIZE so files "
                    "carry current names"
                )
            self._clean_upto = max(self._clean_upto or -1, hi)
            parts: list[ChangeFile] = []
            for v in range(lo + 1, hi + 1):
                e = self._entry_cached(v)
                op = e.get("operation")
                adds = [a["path"] for a in e.get("add", [])]
                removes = e.get("remove", [])
                if op == "optimize" or (not adds and not removes):
                    continue  # dataChange=false / metadata-only
                if e.get("cdc"):
                    files = [(p, None) for p in e["cdc"]]
                elif not removes:  # append / pure-add
                    files = [(p, "insert") for p in adds]
                elif op == "overwrite":
                    files = [(p, "delete") for p in removes]
                    files += [(p, "insert") for p in adds]
                else:
                    raise ValueError(
                        f"acid_cdf: version {v} is a {op} committed "
                        "without a CDC sidecar — its change set is a "
                        "cross-file multiset diff, which a streaming "
                        "file read cannot express. Write MERGE/DELETE "
                        "with cdf=True to stream this table."
                    )
                for rel, tag in files:
                    ap = os.path.join(self.path, rel)
                    if not os.path.exists(ap):
                        raise ValueError(
                            f"acid_cdf: change file {rel} of version "
                            f"{v} was vacuumed away — restart above "
                            "the vacuum horizon"
                        )
                    parts.append(ChangeFile(ap, tag, v, self._schema))
            return parts or [ChangeFile(None, None, -1, self._schema)]

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq

            target: pa.Schema = partition.schema
            if partition.path is None:  # planned-empty range
                yield pa.RecordBatch.from_arrays(
                    [pa.nulls(0, f.type) for f in target],
                    schema=target,
                )
                return
            tbl = pq.read_table(partition.path)
            n = tbl.num_rows
            cols = []
            for f in target:
                if f.name == "_commit_version":
                    cols.append(
                        pa.array([partition.version] * n, pa.int64())
                    )
                elif f.name == "_change_type" and (
                    f.name not in tbl.column_names
                ):
                    cols.append(pa.array([partition.tag] * n, pa.string()))
                elif f.name in tbl.column_names:
                    # additive widening: cast the file's physical type
                    # to the stream's (int→bigint, float→double)
                    cols.append(tbl.column(f.name).cast(f.type))
                else:
                    # column added to the table after this file: NULL
                    cols.append(pa.nulls(n, f.type))
            yield from pa.Table.from_arrays(cols, schema=target).to_batches()

        def commit(self, end: dict) -> None:
            # log JSONs/data files are immutable; nothing to free —
            # but the committed offset is floor knowledge
            v = int(end.get("version", -1))
            if self._floor is None or v > self._floor:
                self._floor = v

    class AcidCdfSource(DataSource):
        """``spark.readStream.format("acid_cdf")`` — module docstring."""

        @classmethod
        def name(cls) -> str:
            return "acid_cdf"

        def schema(self):
            # table columns (unified across live files' footers — the
            # additive-widening read) + the two CDF columns; driver-side
            # metadata reads only
            import os

            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            path = self.options.get("path")
            if not path:
                raise ValueError("acid_cdf: option 'path' is required")
            # checkpoint-aware live-set replay (r8): cleanup_log'd
            # prefixes stay readable — load the newest checkpoint's
            # live set, replay only the suffix
            live: dict[str, bool] = {}
            schema_ops = False
            start = 0
            try:
                with open(
                    os.path.join(path, LOG_DIR, "_last_checkpoint")
                ) as f:
                    import json as _json

                    cp = int(_json.load(f)["version"])
                with open(
                    os.path.join(
                        path, LOG_DIR, f"{cp:010d}.checkpoint.json"
                    )
                ) as f:
                    st = _json.load(f)["state"]
                live = dict.fromkeys(st.get("live", {}), True)
                schema_ops = bool(st.get("schema_ops"))
                start = cp + 1
            except (OSError, ValueError, KeyError):
                pass
            for v in _versions(path):
                if v < start:
                    continue
                e = _entry(path, v)
                for p in e.get("remove", []):
                    live.pop(p, None)
                for a in e.get("add", []):
                    live[a["path"]] = True
                schema_ops = schema_ops or bool(e.get("schema_op"))
            if schema_ops:
                raise ValueError(
                    "acid_cdf: table has schema-op commits (rename/"
                    "drop/widen) — pass an explicit schema via "
                    ".schema(...) matching snapshot() at the latest "
                    "version"
                )
            if not live:
                raise ValueError(
                    "acid_cdf: table has no live data to derive a "
                    "schema from — start the stream after the first "
                    "commit or pass .schema(...) explicitly"
                )
            footers = [
                pq.read_schema(os.path.join(path, f)) for f in sorted(live)
            ]
            unified = pa.unify_schemas(footers, promote_options="permissive")
            fields = [f for f in unified if f.name != "_change_type"]
            # prefer_timestamp_ntz: same NTZ round-trip contract as the
            # acid format reader (naive footer time ≠ UTC instant)
            struct = from_arrow_schema(
                pa.schema(fields), prefer_timestamp_ntz=True
            )
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in struct.fields
            )
            # keep in sync with module-level CDF_COLS (inlined here so
            # the by-value-pickled class references no module globals)
            return f"{ddl}, _change_type string, _commit_version bigint"

        def streamReader(self, schema) -> DataSourceStreamReader:
            return AcidCdfStreamReader(self.options, schema)

    return AcidCdfSource


def register_acid_cdf(spark) -> None:
    """Register the change-feed stream source under format name
    ``acid_cdf`` (idempotent — re-registration replaces)."""
    spark.dataSource.register(build_acid_cdf_source())
