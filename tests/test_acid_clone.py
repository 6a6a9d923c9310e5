"""RESTORE + SHALLOW CLONE (r10 session-2): zero-copy live-set
rollback and zero-copy table branching, incl. the absolute-path
copy-on-write interaction and both read paths (AcidTable.snapshot and
format("acid"))."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from als_hadoop_spark.sources.acid import AcidTable


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k LONG, v STRING")


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def _parquets(root):
    return {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    }


def test_restore_rolls_back_live_set_without_rewrite(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))          # v0
    t.append(_df(spark, [(3, "c")]))                    # v1
    t.delete(F.col("k") == 1)                           # v2 rewrites v0's file
    want_v1 = _rows(t.snapshot(1))
    files_before = _parquets(t.path)
    v = t.restore(1)
    assert v == 3
    assert _rows(t.snapshot()) == want_v1
    # zero-copy: no parquet was written by the restore itself
    assert _parquets(t.path) == files_before
    # history keeps every epoch: the pre-restore head still time-travels
    assert _rows(t.snapshot(2)) == [(2, "b"), (3, "c")]
    # the untouched v1 file kept its ORIGINAL action (no re-epoch)
    state = t._state()
    assert any(a["added"] == 1 for a in state["live"].values())
    # format("acid") replays the restore entry identically
    from als_hadoop_spark.sources import register_acid_format

    register_acid_format(spark)
    got = spark.read.format("acid").load(t.path)
    assert _rows(got.select("k", "v")) == want_v1


def test_restore_to_current_state_is_a_noop(spark, tmp_path):
    t = AcidTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    assert t.restore(0) == 0
    assert t.latest_version() == 0


def test_restore_refuses_reepoch_and_vacuumed(spark, tmp_path):
    # re-epoch: the restored file predates a rename committed later
    t = AcidTable(spark, str(tmp_path / "a"))
    t.append(_df(spark, [(1, "a")]))                    # v0
    t.overwrite(_df(spark, [(2, "b")]))                 # v1 removes v0's file
    t.rename_column("v", "w")                           # v2
    with pytest.raises(ValueError, match="re-epoch"):
        t.restore(0)
    # vacuumed: the file to re-add is physically gone
    u = AcidTable(spark, str(tmp_path / "b"))
    u.append(_df(spark, [(1, "a")]))                    # v0
    u.overwrite(_df(spark, [(2, "b")]))                 # v1
    u.vacuum(retention_hours=0)                         # sweeps v0's file
    with pytest.raises(ValueError, match="vacuumed"):
        u.restore(0)


def test_clone_is_zero_copy_and_isolated(spark, tmp_path):
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    src.append(_df(spark, [(3, "c")]))
    src.set_constraint("k_pos", "k > 0")
    want = _rows(src.snapshot())
    dst = src.clone(str(tmp_path / "dst"))
    assert _rows(dst.snapshot()) == want
    assert _parquets(dst.path) == set()                 # zero-copy
    assert dst.constraints() == {"k_pos": "k > 0"}      # carried over
    # a write to the clone NEVER touches the source
    dst.delete(F.col("k") == 1)                         # copy-on-write
    assert _rows(dst.snapshot()) == [(2, "b"), (3, "c")]
    assert _rows(src.snapshot()) == want                # source intact
    # clone vacuum walks only its own root: shared files survive
    dst.vacuum(retention_hours=0)
    assert _rows(src.snapshot()) == want
    # and the clone reads through format("acid") too (absolute paths)
    from als_hadoop_spark.sources import register_acid_format

    register_acid_format(spark)
    got = spark.read.format("acid").load(dst.path)
    assert _rows(got.select("k", "v")) == [(2, "b"), (3, "c")]


def test_clone_preserves_schema_epochs(spark, tmp_path):
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]))                  # pre-rename file
    src.rename_column("v", "w")
    src.append(
        spark.createDataFrame([(2, "b")], "k LONG, w STRING")
    )                                                   # post-rename file
    want = sorted((r["k"], r["w"]) for r in src.snapshot().collect())
    dst = src.clone(str(tmp_path / "dst"))
    assert sorted((r["k"], r["w"]) for r in dst.snapshot().collect()) == want


def test_clone_refuses_nonempty_dest(spark, tmp_path):
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]))
    other = AcidTable(spark, str(tmp_path / "dst"))
    other.append(_df(spark, [(9, "z")]))
    with pytest.raises(ValueError, match="not empty"):
        src.clone(str(tmp_path / "dst"))


def test_sql_restore_and_shallow_clone_statements(spark, tmp_path):
    from als_hadoop_spark.sql import acid_sql

    p = str(tmp_path / "t")
    t = AcidTable(spark, p)
    t.append(_df(spark, [(1, "a")]))                    # v0
    t.append(_df(spark, [(2, "b")]))                    # v1
    t.delete(F.col("k") == 1)                           # v2
    v = acid_sql(spark, f"RESTORE acid.`{p}` TO VERSION AS OF 1")
    assert v == 3
    assert _rows(t.snapshot()) == [(1, "a"), (2, "b")]
    d = str(tmp_path / "branch")
    out = acid_sql(
        spark, f"CREATE TABLE acid.`{d}` SHALLOW CLONE acid.`{p}`"
    )
    assert out == d
    assert _rows(AcidTable(spark, d).snapshot()) == [(1, "a"), (2, "b")]
    # a malformed clone statement refuses loudly, never half-executes
    with pytest.raises(ValueError, match="unsupported"):
        acid_sql(spark, f"CREATE TABLE acid.`{d}2` DEEP CLONE acid.`{p}`")


def test_restore_and_clone_refuse_future_versions(spark, tmp_path):
    """A typo'd version ABOVE head must fail loudly — _state of a
    nonexistent version replays to head, which would silently no-op
    the restore and mislabel the clone's provenance."""
    t = AcidTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))                    # head = 0
    with pytest.raises(ValueError, match="at version 0"):
        t.restore(30)
    with pytest.raises(ValueError, match="at version 0"):
        t.clone(str(tmp_path / "d"), version=30)


def test_restore_keeps_live_files_across_later_schema_ops(spark, tmp_path):
    """A file that is STILL LIVE in head is kept under its current
    action even when its epoch differs from the target's — a rollback
    must not be spuriously refused by the re-epoch guard (review
    finding): v0 add, v1 remove, v2 restore re-adds, v3 rename; a
    second restore(0) keeps the (live) file and just drops v-later
    files."""
    t = AcidTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))                    # v0
    t.overwrite(_df(spark, [(2, "b")]))                 # v1 removes v0 file
    t.restore(0)                                        # v2 re-adds it
    t.rename_column("v", "w")                           # v3
    t.append(spark.createDataFrame([(9, "z")], "k LONG, w STRING"))  # v4
    v = t.restore(0)                                    # drop the v4 file
    assert v == 5
    assert sorted((r["k"], r["w"]) for r in t.snapshot().collect()) == [
        (1, "a")
    ]


def test_pmi_null_text_contributes_nothing(spark):
    """NULL text rows must not surface a NULL token in the derived
    unigram counts (review finding) — the bigram explode yields zero
    rows for them, so the doc-final count must too; with the bug the
    NULL doc inflates n_uni and shifts every PMI value."""
    import math

    from als_hadoop_spark.operators import ngrams

    # one doc of 11 tokens: (x,y)×5, (y,x)×5 bigrams; x=6, y=5 → n_uni
    # must be 11 (the NULL doc would make it 12), n_bg = 10
    docs = spark.createDataFrame(
        [(1, "x y x y x y x y x y x"), (2, None)], "doc_id LONG, text STRING"
    )
    got = {
        (r["tok_a"], r["tok_b"]): r["pmi"]
        for r in ngrams.pmi_bigrams(docs).collect()
    }
    expect_xy = round(math.log((5 / 10) / ((6 / 11) * (5 / 11))), 6)
    expect_yx = round(math.log((5 / 10) / ((5 / 11) * (6 / 11))), 6)
    assert got == {("x", "y"): expect_xy, ("y", "x"): expect_yx}


def test_clone_normalizes_nonnormalized_source_root(spark, tmp_path):
    """Shared-file log keys must be NORMALIZED absolute paths (post-r10
    advice): a clone of a table opened via a non-normalized root (e.g.
    /a/sub/../src) must store keys matching _rel_file's os.path.abspath
    output, or a later copy-on-write in the clone fails to de-reference
    the shared file and silently duplicates rows."""
    real = str(tmp_path / "src")
    src = AcidTable(spark, real)
    src.append(_df(spark, [(1, "a"), (2, "b")]))
    os.makedirs(str(tmp_path / "x"), exist_ok=True)
    weird = str(tmp_path / "x" / ".." / "src")  # normalizes to real
    dst = AcidTable(spark, weird).clone(str(tmp_path / "dst"))
    # every shared-file key is already normalized
    for e in dst.history():
        for a in e.get("add", []):
            assert a["path"] == os.path.normpath(a["path"])
    # copy-on-write de-references the shared file: no duplicate rows
    dst.delete(F.col("k") == 1)
    assert _rows(dst.snapshot()) == [(2, "b")]
    assert _rows(src.snapshot()) == [(1, "a"), (2, "b")]


def test_rel_file_keeps_dotdot_prefixed_basename_relative(tmp_path):
    """A file literally named ``..foo.parquet`` inside the root is a
    RELATIVE key; only true outside-the-root paths go absolute."""
    from als_hadoop_spark.sources.acid import _rel_file

    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    inside = os.path.join(root, "..foo.parquet")
    assert _rel_file(root, inside) == "..foo.parquet"
    outside = os.path.join(str(tmp_path), "other", "f.parquet")
    assert os.path.isabs(_rel_file(root, outside))


def test_restore_reverifies_readds_after_commit(spark, tmp_path, monkeypatch):
    """A VACUUM racing between restore's existence check and its commit
    leaves the restored version dangling — the post-commit re-verify
    must surface that loudly instead of reporting success (post-r10
    advice)."""
    t = AcidTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))                    # v0
    old = t._replay()
    t.overwrite(_df(spark, [(2, "b")]))                 # v1 removes v0's file
    orig = AcidTable._try_commit

    def racing_commit(self, version, entry):
        ok = orig(self, version, entry)
        if ok and entry.get("operation") == "restore":
            for p in old:  # simulate the concurrent vacuum winning
                os.remove(os.path.join(self.path, p))
        return ok

    monkeypatch.setattr(AcidTable, "_try_commit", racing_commit)
    with pytest.raises(RuntimeError, match="concurrent VACUUM"):
        t.restore(0)


def test_source_vacuum_protects_registered_clone(spark, tmp_path):
    """Clone-safe VACUUM (r11): the clone registers a marker in the
    source's log; a source vacuum keeps every file the clone's pinned
    version reads — even after the source overwrites them away —
    and force=True reproduces the unprotected sweep."""
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]).coalesce(1))
    clone = src.clone(str(tmp_path / "clone"))
    src.overwrite(_df(spark, [(9, "z")]))  # pinned files now non-live
    swept = src.vacuum(retention_hours=0.0)
    assert swept == [], "clone-pinned files must survive the vacuum"
    assert _rows(clone.snapshot()) == [(1, "a"), (2, "b")]
    # force=True strands the clone (the documented Delta behavior)
    swept = src.vacuum(retention_hours=0.0, force=True)
    assert swept, "force must sweep the non-live files"
    with pytest.raises(Exception):
        clone.snapshot().collect()


def test_clone_marker_self_cleans_when_clone_deleted(spark, tmp_path):
    import shutil

    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]).coalesce(1))
    src.clone(str(tmp_path / "clone"))
    src.overwrite(_df(spark, [(2, "b")]))
    shutil.rmtree(str(tmp_path / "clone"))
    swept = src.vacuum(retention_hours=0.0)
    assert swept, "a deleted clone must stop protecting files"
    assert src._registered_clones() == []


def test_source_vacuum_protects_clone_dv_sidecars(spark, tmp_path):
    """A clone of a masked table reads the source's DV sidecars by
    absolute path — the source vacuum must keep the sidecars its
    registered clones reference, even when the source itself has
    materialized them away."""
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1))
    src.set_property("deletionVectors", "true")
    src.delete("k >= 8")
    clone = src.clone(str(tmp_path / "clone"))
    src.optimize(target_files=1)  # source: masks materialized, refs gone
    swept = src.vacuum(retention_hours=0.0)
    assert _rows(clone.snapshot()) == [(i, f"v{i}") for i in range(8)], swept


def test_clone_refuses_vacuumed_source_files(spark, tmp_path):
    """r11 review: cloning a version whose files are below the vacuum
    horizon must refuse loudly (the restore contract), not hand back a
    clone that fails on first read — and the refusal must not leave a
    protection marker behind."""
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]).coalesce(1))
    src.overwrite(_df(spark, [(2, "b")]))
    src.vacuum(retention_hours=0.0)  # v0's file is gone
    with pytest.raises(ValueError, match="was vacuumed"):
        src.clone(str(tmp_path / "c"), version=0)
    assert src._registered_clones() == []


def test_clone_marker_registered_before_commits(spark, tmp_path):
    """r11 review: the marker must be down BEFORE the clone's commits
    so a racing source vacuum cannot sweep the referenced files
    mid-clone."""
    src = AcidTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]).coalesce(1))
    seen = []
    orig = AcidTable._clone_body

    def spy(self, dest, dest_path, state, src_v):
        seen.append(os.path.exists(self._marker_path(dest_path)))
        return orig(self, dest, dest_path, state, src_v)

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(AcidTable, "_clone_body", spy)
        src.clone(str(tmp_path / "c"))
    finally:
        mp.undo()
    assert seen == [True]
