"""CLI parity (reference cli.py init wizard + templates/main.tpl.py):
non-interactive bootstrap, template rendering for every processing
option, and end-to-end execution of a generated script."""

import json
import os
import subprocess
import sys

from dataflows_spark import cli


def test_render_compiles_for_every_option():
    for proc in list(cli.PROCESSING) + [[]]:
        for output in cli.OUTPUTS:
            answers = {
                "input": "file",
                "input_url": "/tmp/data.csv",
                "format": "csv",
                "processing": [proc] if isinstance(proc, str) else proc,
                "output": output,
                "title": "My Test Flow",
                "slug": "my_test_flow",
                "output_url": "jdbc:derby:x",
                "output_db_table": "t",
            }
            src = cli.render(answers)
            compile(src, "<generated>", "exec")  # must be valid Python


def test_slugify():
    assert cli.slugify("My Flow! 2024") == "my_flow_2024"
    assert cli.slugify("---") == "flow"


def test_init_and_run_end_to_end(tmp_path):
    """`init data.csv --no-run` writes a runnable script; `run` executes
    it through a real SparkSession and dumps a package."""
    csv = tmp_path / "cities.csv"
    csv.write_text("city,pop\na,10\nb,20\n")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        answers = {
            "input": "file",
            "input_url": str(csv),
            "format": "csv",
            "processing": [],
            "output": "dp_parquet",
            "title": "cities flow",
        }
        filename = cli.init(answers=answers, run=False)
        assert filename == "cities_flow.py"
        src = open(filename).read()
        assert "build_session" in src and "dump_to_path" in src

        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(cli.__file__)))
        env["SPARK_GRAFT_CPUS"] = "4"
        out = subprocess.run(
            [sys.executable, filename], env=env, capture_output=True, text=True, timeout=300
        )
        assert out.returncode == 0, out.stderr[-2000:]
        manifest = json.load(open(tmp_path / "out_cities_flow" / "datapackage.json"))
        assert manifest["resources"] == ["cities_flow"]
    finally:
        os.chdir(cwd)


def test_ask_multi_parsing(monkeypatch):
    """Multi-select: empty input selects NONE (not the first option),
    comma-separated indices and names parse, junk is ignored."""
    answers = iter(["", "1,3", "sort, filter, 99, junk"])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    assert cli._ask_multi("p", cli.PROCESSING) == []
    keys = list(cli.PROCESSING)
    assert cli._ask_multi("p", cli.PROCESSING) == [keys[0], keys[2]]
    assert cli._ask_multi("p", cli.PROCESSING) == ["sort", "filter"]
