"""CLI entry point (python -m als_hadoop_spark): the switch-over
surface for a reference user — `als` runs the reference workflow from
a ratings CSV and prints one RMSE (the reference's rmse.txt contract),
`query`/`list` expose the registered engine surface."""

from __future__ import annotations

from als_hadoop_spark.__main__ import main


def test_cli_list_enumerates_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= 130
    names = {ln.split("\t")[0] for ln in out}
    assert {"q_filter", "q_acid_merge", "q_als_fit_predict"} <= names


def test_cli_query_runs_and_shows(spark, capsys):
    assert main(["query", "q_filter", "--sf-dir", "/root/testdata/sf0.001", "-n", "3"]) == 0
    out = capsys.readouterr().out
    assert "l_orderkey" in out
    assert main(["query", "no_such_query"]) == 2


def test_cli_als_prints_reference_rmse(spark, tmp_path, capsys):
    """Tiny but learnable ratings CSV (block-structured preferences):
    the CLI must print exactly one parseable RMSE line, like the
    reference's rmse.txt."""
    rows = []
    for u in range(24):
        for i in range(24):
            if (u + i) % 3 == 0:
                continue  # held-out-ish sparsity
            rows.append(f"{u},{i},{5.0 if (u // 12) == (i // 12) else 1.0}")
    csv = tmp_path / "ratings.csv"
    csv.write_text("\n".join(rows) + "\n")
    assert main(["als", str(csv)]) == 0
    out = capsys.readouterr().out.strip()
    rmse = float(out)
    assert 0.0 <= rmse < 2.5
