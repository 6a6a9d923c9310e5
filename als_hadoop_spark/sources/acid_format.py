"""``format("acid")`` — the commit-log ACID table as a REGISTERED Spark
batch source AND sink (r8)::

    register_acid_format(spark)
    df.write.format("acid").mode("append").save("/data/orders_acid")
    df.write.format("acid").mode("overwrite").save("/data/orders_acid")
    spark.read.format("acid").load("/data/orders_acid")          # latest
    spark.read.format("acid").option("version", 3).load(...)      # travel
    stream.writeStream.format("acid").option("checkpointLocation", c) \
        .start("/data/orders_acid")   # exactly-once streaming appends

Until now the table was driven through the :class:`AcidTable` Python
API; this module makes it an idiomatic Spark format, completing the
extension-API trilogy (batch source ``ratings_gen``, stream source
``acid_cdf``, and now a transactional batch source+sink).

Why the DataSource WRITER API fits a log-commit table exactly: Spark's
commit protocol — executors each ``write()`` their partition and return
a picklable ``WriterCommitMessage``; the driver calls ``commit()`` with
ALL messages only if every task succeeded, else ``abort()`` — is
precisely the two-phase shape the ACID log needs. Executors write
parquet files STRAIGHT INTO the table directory (safe: files the log
does not name are invisible to every reader by construction,
sources/acid.py module docstring) and send back {file name, footer
stats}; the driver's ``commit()`` publishes them in ONE O_EXCL log
entry. A failed job leaves only unreferenced files for vacuum; there
is no torn state to clean.

Scale design:

- WRITE: data never moves after the task writes it — no staging
  rename pass, no driver IO; per-file [min, max] stats are computed
  executor-side from the in-memory Arrow table and travel in the
  commit message (KBs), so the log entry carries pruning stats with
  ZERO extra reads.
- READ: planning replays the log (KBs of JSON) and emits one
  InputPartition per live file; ``pushFilters`` prunes ENTIRE FILES at
  planning time from the log's per-file stats — the same skip the
  ``snapshot_where`` API gives, now triggered by an ordinary
  ``.filter()`` on the DataFrame (partial pushdown: Spark re-checks
  rows). Schema evolution (rename/drop/widen) applies per file epoch,
  matching ``AcidTable._assemble``.
- IDEMPOTENT WRITES: ``.option("txnAppId", a).option("txnVersion", n)``
  stamps the commit (the Delta recipe); a replayed micro-batch whose
  (app, version) is already in the log SKIPS the commit and removes
  its orphaned files — exactly-once from an at-least-once caller.

Deliberate refusals (loud errors, never silent wrongness): writing to
a table with CHECK constraints (validation needs a Spark-side scan of
the staged rows — use ``AcidTable.append``, which validates before
publishing); ``mode("overwrite")`` racing a concurrent commit raises
CommitConflict (same contract as ``AcidTable.overwrite``).

Classes are built inside :func:`build_acid_format_source` so
cloudpickle ships them BY VALUE (the sources/generator.py:47
discipline), and reference nothing from this package — the log
parsing they need is self-contained json/os against the documented
on-disk format (sources/acid.py:87).
"""

from __future__ import annotations


def build_acid_format_source(with_pushdown: bool = True):
    """Return the AcidFormatSource class (function-local so cloudpickle
    serializes it by value to executors). ``with_pushdown=False`` omits
    the ``pushFilters`` override for sessions where
    ``spark.sql.python.filterPushdown.enabled`` cannot be turned on
    (Spark refuses a reader that declares pushdown while the flag is
    off — the sources/generator.py:47 precedent)."""
    from dataclasses import dataclass, field

    import pyarrow as pa
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
        LessThanOrEqual,
        WriterCommitMessage,
    )

    LOG_DIR = "_acid_log"

    # ---- self-contained log parsing (mirrors sources/acid.py format)

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
        import json
        import os

        with open(os.path.join(path, LOG_DIR, f"{v:010d}.json")) as f:
            return json.load(f)

    def _state(path: str, version=None) -> dict:
        """Replayed {live: {file: {stats, added}}, schema_ops,
        constraints, txns} at ``version`` (default latest) —
        CHECKPOINT-AWARE like AcidTable._compute_state: load the newest
        ``_last_checkpoint`` at-or-below the target and replay only the
        log suffix, so format reads/commits stay O(interval) on
        long-lived tables and cleanup_log'd prefixes remain readable.
        Raises clearly on a true log gap (files removed out of band)."""
        import json
        import os

        vs = _versions(path)
        if version is not None:
            vs = [v for v in vs if v <= int(version)]
        live: dict = {}
        ops: list = []
        cons: dict = {}
        txns: dict = {}
        start = 0
        try:
            with open(os.path.join(path, LOG_DIR, "_last_checkpoint")) as f:
                cp = int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            cp = None
        if cp is not None and (version is None or cp <= int(version)):
            try:
                with open(
                    os.path.join(path, LOG_DIR, f"{cp:010d}.checkpoint.json")
                ) as f:
                    st = json.load(f)["state"]
                live = dict(st.get("live", {}))
                ops = list(st.get("schema_ops", []))
                cons = dict(st.get("constraints", {}))
                txns = dict(st.get("txns", {}))
                start = cp + 1
            except (OSError, KeyError, json.JSONDecodeError):
                start = 0  # corrupt/missing checkpoint: full replay
        vs = [v for v in vs if v >= start]
        if vs and vs[0] != start:
            raise ValueError(
                f"acid format: replay should start at {start} but the "
                f"earliest retained commit at-or-after it is {vs[0]} — "
                "the prefix was cleaned without a covering checkpoint "
                "or log files were removed out of band; read through "
                "AcidTable for the race-retry path"
            )
        if vs and vs != list(range(vs[0], vs[-1] + 1)):
            raise ValueError(
                "acid format: non-contiguous commit log in replay "
                f"range starting {vs[0]} — log files were removed out "
                "of band"
            )
        for v in vs:
            e = _entry(path, v)
            for p in e.get("remove", []):
                live.pop(p, None)
            for a in e.get("add", []):
                live[a["path"]] = {"stats": a.get("stats") or {}, "added": v}
            op = e.get("schema_op")
            if op:
                ops.append({"v": v, **op})
            c = e.get("constraint")
            if c:
                cons[c["name"]] = c["expr"]
            t = e.get("txn")
            if t and "app" in t:
                txns[t["app"]] = max(
                    int(txns.get(t["app"], -1)), int(t.get("batch", -1))
                )
        return {
            "live": live,
            "schema_ops": ops,
            "constraints": cons,
            "txns": txns,
        }

    def _physical_name(col: str, added: int, ops: list) -> str:
        name = col
        for op in reversed(ops):
            if op["v"] > added and op.get("op") == "rename" and op["new"] == name:
                name = op["old"]
        return name

    def _footer_stats_of(table: "pa.Table") -> dict:
        """[min, max] per JSON-scalar column of the IN-MEMORY Arrow
        table the task is about to write — no file re-read."""
        import pyarrow.compute as pc

        out = {}
        for f in table.schema:
            if not (
                pa.types.is_integer(f.type)
                or pa.types.is_floating(f.type)
                or pa.types.is_string(f.type)
                or pa.types.is_boolean(f.type)
            ):
                continue
            col = table.column(f.name)
            if col.null_count == len(col):
                continue
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if isinstance(mn, (int, float, str, bool)):
                out[f.name] = [mn, mx]
        return out

    # ------------------------------------------------------- reader

    @dataclass
    class LiveFile(InputPartition):
        path: str  # absolute parquet path
        ops: tuple  # schema ops applicable to this file, oldest first
        schema: object = field(default=None)  # target pa.Schema

    class AcidReader(DataSourceReader):
        def __init__(self, options, schema):
            from pyspark.sql.pandas.types import to_arrow_schema

            self.path = options.get("path")
            if not self.path:
                raise ValueError("acid format: option 'path' is required")
            v = options.get("version")
            self.version = int(v) if v is not None else None
            self._arrow_schema = to_arrow_schema(schema)
            self._bounds: dict = {}  # col -> [lo, hi]

        def _push_filters(self, filters):
            for f in filters:
                attr = getattr(f, "attribute", None)
                if not (isinstance(attr, tuple) and len(attr) == 1):
                    yield f
                    continue
                col = attr[0]
                val = getattr(f, "value", None)
                if not isinstance(val, (int, float, str, bool)):
                    yield f
                    continue
                b = self._bounds.setdefault(col, [None, None])
                if isinstance(f, EqualTo):
                    b[0] = val if b[0] is None else max(b[0], val)
                    b[1] = val if b[1] is None else min(b[1], val)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    b[0] = val if b[0] is None else max(b[0], val)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    b[1] = val if b[1] is None else min(b[1], val)
                # partial pushdown: files are pruned here, Spark still
                # re-checks every row (exact contract — also covers the
                # strict/non-strict inequality difference)
                yield f

        def partitions(self):
            import os

            st = _state(self.path, self.version)
            ops = st["schema_ops"]
            parts = []
            for fname in sorted(st["live"]):
                action = st["live"][fname]
                skip = False
                for col, (lo, hi) in self._bounds.items():
                    phys = _physical_name(col, action["added"], ops)
                    s = action["stats"].get(phys)
                    if s is None or s[0] is None or s[1] is None:
                        continue  # no stats: keep the file
                    mn, mx = s
                    try:
                        if (lo is not None and mx < lo) or (
                            hi is not None and mn > hi
                        ):
                            skip = True
                            break
                    except TypeError:
                        continue  # cross-type compare: keep the file
                if skip:
                    continue
                ap = os.path.join(self.path, fname)
                if not os.path.exists(ap):
                    raise ValueError(
                        f"acid format: live file {fname} was vacuumed "
                        "away — the table is damaged below the vacuum "
                        "horizon"
                    )
                applicable = tuple(
                    {k: op[k] for k in op if k != "v"}
                    for op in ops
                    if op["v"] > action["added"]
                )
                parts.append(LiveFile(ap, applicable, self._arrow_schema))
            # Spark requires >= 1 partition; an empty table (or a fully
            # pruned scan) yields a zero-row partition
            return parts or [LiveFile("", (), self._arrow_schema)]

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq

            target: pa.Schema = partition.schema
            if not partition.path:
                yield pa.RecordBatch.from_arrays(
                    [pa.nulls(0, f.type) for f in target], schema=target
                )
                return
            tbl = pq.read_table(partition.path)
            # apply this file's schema-op epoch (rename/drop/widen),
            # matching AcidTable._assemble semantics
            for op in partition.ops:
                if op.get("op") == "rename" and op["old"] in tbl.column_names:
                    tbl = tbl.rename_columns(
                        [
                            op["new"] if c == op["old"] else c
                            for c in tbl.column_names
                        ]
                    )
                elif op.get("op") == "drop" and op["col"] in tbl.column_names:
                    tbl = tbl.drop_columns([op["col"]])
                # widen: the cast-to-target below covers it
            n = tbl.num_rows
            cols = []
            for f in target:
                if f.name in tbl.column_names:
                    cols.append(tbl.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            yield from pa.Table.from_arrays(cols, schema=target).to_batches()

    if with_pushdown:
        AcidReader.pushFilters = AcidReader._push_filters

    # ------------------------------------------------------- writer

    @dataclass
    class AddFile(WriterCommitMessage):
        path: str  # relative file name inside the table dir
        stats: dict

    class AcidWriter(DataSourceArrowWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("acid format: option 'path' is required")
            self.overwrite = overwrite
            app = options.get("txnappid") or options.get("txnAppId")
            ver = options.get("txnversion") or options.get("txnVersion")
            self.txn = (
                {"app": app, "batch": int(ver)}
                if app is not None and ver is not None
                else None
            )

        def write(self, iterator):
            import os
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq

            batches = [b for b in iterator if b.num_rows]
            if not batches:
                return AddFile("", {})  # empty partition: nothing staged
            tbl = pa.Table.from_batches(batches)
            name = f"w-{uuid.uuid4().hex}.parquet"
            os.makedirs(self.path, exist_ok=True)
            # write STRAIGHT into the table dir: unreferenced files are
            # invisible to readers until commit() publishes them
            pq.write_table(tbl, os.path.join(self.path, name))
            return AddFile(name, _footer_stats_of(tbl))

        def _cleanup(self, messages):
            import os

            for m in messages:
                if m is not None and m.path:
                    try:
                        os.remove(os.path.join(self.path, m.path))
                    except OSError:
                        pass

        def commit(self, messages):
            import json
            import os

            adds = [
                {"path": m.path, "stats": m.stats}
                for m in messages
                if m is not None and m.path
            ]
            st = _state(self.path)
            if st["constraints"]:
                self._cleanup(messages)
                raise ValueError(
                    "acid format: table has CHECK constraints "
                    f"({sorted(st['constraints'])}); the format writer "
                    "cannot validate rows at commit time — write through "
                    "AcidTable.append, which validates before publishing"
                )
            if self.txn is not None and st["txns"].get(
                self.txn["app"], -1
            ) >= int(self.txn["batch"]):
                # idempotent replay: this (app, batch) already committed
                self._cleanup(messages)
                return
            if self.overwrite:
                entry = {
                    "operation": "overwrite",
                    "add": adds,
                    "remove": sorted(st["live"]),
                }
            else:
                entry = {"operation": "append", "add": adds}
            if self.txn is not None:
                entry["txn"] = self.txn
            base = max(_versions(self.path), default=-1)
            log_dir = os.path.join(self.path, LOG_DIR)
            os.makedirs(log_dir, exist_ok=True)
            for _ in range(10):
                v = base + 1
                try:
                    fd = os.open(
                        os.path.join(log_dir, f"{v:010d}.json"),
                        os.O_WRONLY | os.O_CREAT | os.O_EXCL,
                    )
                except FileExistsError:
                    if self.overwrite:
                        self._cleanup(messages)
                        raise RuntimeError(
                            "acid format: CommitConflict — table changed "
                            "during overwrite; re-run on the new state"
                        ) from None
                    # blind append: rebase onto the new head — unless
                    # the interleaved commit added constraints (then
                    # this unvalidated write must not land) or already
                    # committed our txn
                    st2 = _state(self.path)
                    if st2["constraints"]:
                        self._cleanup(messages)
                        raise ValueError(
                            "acid format: a CHECK constraint was "
                            "committed concurrently; write through "
                            "AcidTable.append to validate"
                        ) from None
                    if self.txn is not None and st2["txns"].get(
                        self.txn["app"], -1
                    ) >= int(self.txn["batch"]):
                        self._cleanup(messages)
                        return
                    base = max(_versions(self.path), default=-1)
                    continue
                with os.fdopen(fd, "w") as f:
                    json.dump({"version": v, **entry}, f)
                return
            self._cleanup(messages)
            raise RuntimeError(
                "acid format: append lost 10 commit races; retry"
            )

        def abort(self, messages):
            self._cleanup(messages)

    # ------------------------------------------------ streaming sink

    from pyspark.sql.datasource import DataSourceStreamArrowWriter

    class AcidStreamWriter(DataSourceStreamArrowWriter):
        """``writeStream.format("acid")`` — EXACTLY-ONCE streaming
        appends: each micro-batch commits as one log entry stamped
        ``txn={app, batch: batchId}`` (``.option("txnAppId", ...)``,
        default ``acid_stream_sink``). Spark hands ``commit`` the
        batchId, so a replayed micro-batch (restart, retry) finds its
        (app, batch) already in the log, skips the commit, and removes
        its orphaned files — the streaming/acid_ingest.py recipe as a
        REGISTERED sink. Append output mode only: the log is the
        truncation mechanism, not per-batch overwrite."""

        def __init__(self, options, overwrite: bool):
            if overwrite:
                raise ValueError(
                    "acid format: streaming sink supports APPEND output "
                    "mode only (complete/update would truncate the log "
                    "every batch — materialize through maintain_rollup "
                    "instead)"
                )
            self._inner = AcidWriter(options, overwrite=False)
            self._app = (
                options.get("txnappid")
                or options.get("txnAppId")
                or "acid_stream_sink"
            )

        def write(self, iterator):
            return self._inner.write(iterator)

        def commit(self, messages, batchId):
            self._inner.txn = {"app": self._app, "batch": int(batchId)}
            self._inner.commit(messages)

        def abort(self, messages, batchId):
            self._inner.abort(messages)

    # ------------------------------------------------------- source

    class AcidFormatSource(DataSource):
        """``spark.read/write.format("acid")`` — module docstring."""

        @classmethod
        def name(cls) -> str:
            return "acid"

        def schema(self):
            import os

            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            path = self.options.get("path")
            if not path:
                raise ValueError("acid format: option 'path' is required")
            v = self.options.get("version")
            st = _state(path, int(v) if v is not None else None)
            if not st["live"]:
                raise ValueError(
                    "acid format: table has no live data to derive a "
                    "schema from — pass .schema(...) explicitly"
                )
            ops = st["schema_ops"]
            footers = []
            for fname in sorted(st["live"]):
                sch = pq.read_schema(os.path.join(path, fname))
                added = st["live"][fname]["added"]
                fields = []
                widen_types = {
                    "int": pa.int32(),
                    "bigint": pa.int64(),
                    "float": pa.float32(),
                    "double": pa.float64(),
                }
                for f in sch:
                    name = f.name
                    typ = f.type
                    dropped = False
                    for op in ops:
                        if op["v"] <= added:
                            continue
                        if op.get("op") == "rename" and op["old"] == name:
                            name = op["new"]
                        elif op.get("op") == "drop" and op["col"] == name:
                            dropped = True
                            break
                        elif (
                            op.get("op") == "widen"
                            and op["col"] == name
                            and op.get("type") in widen_types
                        ):
                            typ = widen_types[op["type"]]
                    if not dropped:
                        fields.append(pa.field(name, typ))
                footers.append(pa.schema(fields))
            unified = pa.unify_schemas(footers, promote_options="permissive")
            return from_arrow_schema(unified)

        def reader(self, schema) -> DataSourceReader:
            return AcidReader(self.options, schema)

        def writer(self, schema, overwrite: bool):
            return AcidWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            return AcidStreamWriter(self.options, overwrite)

    return AcidFormatSource


def register_acid_format(spark) -> None:
    """Register the transactional table under format name ``acid``,
    enabling Python-source filter pushdown when the session permits
    (without it, reads are identical — only log-stats file pruning at
    planning time is lost)."""
    conf = "spark.sql.python.filterPushdown.enabled"
    try:
        spark.conf.set(conf, "true")
        pushdown = True
    except Exception:
        pushdown = spark.conf.get(conf, "false") == "true"
    spark.dataSource.register(build_acid_format_source(pushdown))
