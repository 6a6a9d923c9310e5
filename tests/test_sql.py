"""SQL front door: every driver table registered as a temp view and
queried through ``spark.sql`` — the declarative surface a reference
user migrating to this engine writes directly (SURVEY §3: our
"lifecycle" IS Spark SQL's parse→analyze→optimize→execute)."""

from __future__ import annotations

from als_hadoop_spark.sources import load, register_views
from als_hadoop_spark.sources.tables import read_json


def test_sql_over_registered_views(spark, sf_dir):
    register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name
        ORDER BY rev DESC
        LIMIT 5
        """
    ).collect()
    assert 0 < len(got) <= 5
    revs = [r["rev"] for r in got]
    assert revs == sorted(revs, reverse=True)


def test_sql_window_and_cte(spark, sf_dir):
    register_views(spark, sf_dir)
    rows = spark.sql(
        """
        WITH ranked AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
            FROM events
        )
        SELECT COUNT(*) AS n FROM ranked WHERE rn = 1
        """
    ).collect()
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert rows[0]["n"] == n_users


def test_read_json_with_schema(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "meta": {"w": 10, "tags": ["a", "b"]}}\n'
        '{"id": 2, "meta": {"w": 20, "tags": []}}\n'
    )
    df = read_json(
        spark, str(p), "id LONG, meta STRUCT<w: INT, tags: ARRAY<STRING>>"
    )
    rows = {r["id"]: (r["meta"]["w"], list(r["meta"]["tags"])) for r in df.collect()}
    assert rows == {1: (10, ["a", "b"]), 2: (20, [])}
