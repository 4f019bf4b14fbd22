"""Pipeline-bootstrap CLI — the counterpart of the reference's
``dataflows init`` wizard (reference ``dataflows/cli.py:1-249`` +
``templates/main.tpl.py``), re-expressed stdlib-only (argparse +
``input()`` + f-string template instead of click/inquirer/jinja2,
which aren't part of this engine's dependency set).

Usage::

    python -m dataflows_spark init                # interactive wizard
    python -m dataflows_spark init data.csv       # bootstrap from a path
    python -m dataflows_spark init https://…/x.csv
    python -m dataflows_spark run my_flow.py      # execute a pipeline

``init`` writes a runnable ``<slug>.py`` Flow script wired to THIS
engine (SparkSession via ``build_session``, parquet-first outputs) and
optionally runs it immediately — same UX contract as the reference
wizard. The generated script is plain code the user owns and edits.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

FORMATS = ["csv", "tsv", "json", "ndjson", "parquet", "orc", "xlsx", "xls", "ods", "gsheet", "xml", "geojson"]

#: reference PROCESSING menu (cli.py:19-27) → this engine's operators
PROCESSING = {
    "sort": "Sort all rows by key",
    "filter": "Filter according to column values",
    "find_replace": "Search & replace values in the data",
    "delete_fields": "Delete some columns",
    "set_type": "Normalize and validate numbers, dates and other types",
    "unpivot": "Un-pivot the data",
    "custom": "Custom row-by-row processing",
}

OUTPUTS = {
    "print": "Just print the data",
    "list": "As a Python list",
    "dp_csv": "A CSV file (in a data package)",
    "dp_csv_zip": "A CSV file (in a zipped data package)",
    "dp_json": "A JSON file (in a data package)",
    "dp_parquet": "A parquet data package (scale default)",
    "sql": "An SQL database (JDBC)",
}


def slugify(title: str) -> str:
    s = re.sub(r"[^a-z0-9]+", "_", title.lower()).strip("_")
    return s or "flow"


def _detect_format(url: str) -> str | None:
    if "docs.google.com/spreadsheets" in url:
        return "gsheet"
    ext = os.path.splitext(url.split("?")[0])[1].lstrip(".").lower()
    return ext if ext in FORMATS else None


def render(answers: dict) -> str:
    """Generated-script template (reference ``templates/main.tpl.py``
    re-targeted at dataflows_spark)."""
    slug = answers["slug"]
    fmt = answers.get("format")
    processing = answers.get("processing", [])
    output = answers.get("output", "print")
    input_kind = answers.get("input", "file")

    load_args = [repr(answers.get("input_url", "PATH_OR_URL"))]
    if input_kind == "sql":
        load_args = [repr(answers.get("input_url")), f"dbtable={answers.get('input_db_table')!r}"]
    elif fmt:
        load_args.append(f"format={fmt!r}")
        if fmt in ("xlsx", "xls", "ods") and answers.get("sheet"):
            load_args.append(f"sheet={answers.get('sheet')!r}")
    stages = [f"        load({', '.join(load_args)}, name={slug!r}),"]

    if "sort" in processing:
        stages.append("        sort_rows('{field_name}'),  # format string or list of field names")
    if "filter" in processing:
        stages.append("        filter_rows(condition='field_name > 0'),  # SQL predicate, equals=/not_equals= or a callable")
    if "find_replace" in processing:
        stages.append(
            "        find_replace([{'name': 'field_name', 'patterns': "
            "[{'find': 're-pattern', 'replace': 'replacement'}]}]),"
        )
    if "delete_fields" in processing:
        stages.append("        delete_fields(['field_name']),")
    if "set_type" in processing:
        stages.append(
            "        set_type('field_name', type='number'),  # Table Schema types; "
            "on_error='raise'|'drop'|'clear'"
        )
    if "unpivot" in processing:
        stages.append("        unpivot(unpivot_fields, extra_keys, extra_value),")
    if "custom" in processing:
        stages.append("        my_custom_processing,")

    out_dir = f"out_{slug}"
    if output in ("print",):
        stages.append("        printer(),")
    elif output == "dp_csv":
        stages.append(f"        dump_to_path({out_dir!r}, format='csv'),")
    elif output == "dp_csv_zip":
        stages.append(f"        dump_to_zip({slug + '.zip'!r}, format='csv'),")
    elif output == "dp_json":
        stages.append(f"        dump_to_path({out_dir!r}, format='json'),")
    elif output == "dp_parquet":
        stages.append(f"        dump_to_path({out_dir!r}),")
    elif output == "sql":
        stages.append(
            f"        dump_to_sql({{{answers.get('output_db_table', 'table')!r}: "
            f"{{'resource-name': {slug!r}}}}}, engine={answers.get('output_url', 'jdbc:...')!r}),"
        )

    custom_fn = (
        '''

def my_custom_processing(row):
    # Modify the row dict here (runs vectorized via Arrow batches)
    # ...
    return row
'''
        if "custom" in processing
        else ""
    )
    tail = (
        "    results, pkg, stats = flow.results(spark)\n    print(results[0][:10])"
        if output == "list"
        else "    _, stats = flow.process(spark)\n    print(stats)"
    )
    return f'''"""{answers.get("title", slug)} — generated by `dataflows_spark init`."""
from dataflows_spark import (
    Flow, build_session, load, printer, sort_rows, filter_rows, find_replace,
    delete_fields, set_type, unpivot, dump_to_path, dump_to_zip, dump_to_sql,
    update_package,
)
{custom_fn}

def {slug}(spark):
    flow = Flow(
{chr(10).join(stages)}
        update_package(name={slug!r}, title={answers.get("title", slug)!r}),
    )
{tail}


if __name__ == "__main__":
    spark = build_session(app_name={slug!r})
    {slug}(spark)
'''


def _ask(prompt: str, choices: dict | None = None, default: str | None = None) -> str:
    if choices:
        keys = list(choices)
        for i, k in enumerate(keys, 1):
            print(f"  {i}. {choices[k]}")
        raw = input(f"{prompt} [1-{len(keys)}]: ").strip()
        try:
            return keys[int(raw) - 1]
        except (ValueError, IndexError):
            return default or keys[0]
    raw = input(f"{prompt}: ").strip()
    return raw or (default or "")


def _ask_multi(prompt: str, choices: dict) -> list[str]:
    """Comma-separated multi-select; empty input = none (a bare int()
    on the raw string would crash on '1,3' and silently pick the first
    option on '' — round-3 review finding #2)."""
    keys = list(choices)
    for i, k in enumerate(keys, 1):
        print(f"  {i}. {choices[k]}")
    raw = input(f"{prompt} [e.g. 1,3; empty for none]: ").strip()
    out: list[str] = []
    for part in raw.split(","):
        part = part.strip()
        if not part:
            continue
        try:
            idx = int(part) - 1
            if 0 <= idx < len(keys) and keys[idx] not in out:
                out.append(keys[idx])
        except ValueError:
            if part in choices and part not in out:
                out.append(part)
    return out


def init(arg: str = "interactive", run: bool = True, answers: dict | None = None) -> str:
    """Bootstrap a pipeline script; returns the written filename."""
    if answers is None:
        if arg != "interactive":
            answers = {
                "input": "remote" if arg.startswith(("http://", "https://")) else "file",
                "input_url": arg,
                "title": os.path.basename(arg.split("?")[0]) or arg,
                "processing": [],
                "output": "print",
                "format": _detect_format(arg),
            }
        else:
            print("Hi there! dataflows_spark will bootstrap a processing flow.\n")
            answers = {}
            answers["input_url"] = _ask("Path / URL / JDBC string of your data")
            answers["input"] = (
                "remote"
                if answers["input_url"].startswith(("http://", "https://"))
                else "sql"
                if answers["input_url"].startswith("jdbc:")
                else "file"
            )
            answers["format"] = _detect_format(answers["input_url"]) or _ask(
                f"Source format ({'/'.join(FORMATS)})", default="csv"
            )
            if answers["input"] == "sql":
                answers["input_db_table"] = _ask("Database table to extract")
            answers["processing"] = _ask_multi("Processing steps", PROCESSING)
            answers["output"] = _ask("Where should the output go", OUTPUTS, default="print")
            if answers["output"] == "sql":
                answers["output_url"] = _ask("JDBC connection string")
                answers["output_db_table"] = _ask("Target table name")
            answers["title"] = _ask("Title for this flow", default="my flow")
    answers.setdefault("slug", slugify(answers.get("title", "flow")))
    filename = f"{answers['slug']}.py"
    with open(filename, "w") as out:
        print(f"Writing processing code into {filename}")
        out.write(render(answers))
    if run:
        run_script(filename)
    return filename


def run_script(filename: str) -> int:
    """Execute a generated pipeline (the ``spark-submit`` analog for
    local dev: same interpreter, package on PYTHONPATH)."""
    print(f"Running {filename}")
    env = dict(os.environ)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, filename], env=env)
    return proc.returncode


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dataflows_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_init = sub.add_parser("init", help="bootstrap a processing pipeline script")
    p_init.add_argument("arg", nargs="?", default="interactive")
    p_init.add_argument("--no-run", action="store_true", help="write the script but don't execute it")
    p_run = sub.add_parser("run", help="execute a pipeline script")
    p_run.add_argument("script")
    ns = parser.parse_args(argv)
    if ns.cmd == "init":
        init(ns.arg, run=not ns.no_run)
        return 0
    return run_script(ns.script)


if __name__ == "__main__":
    sys.exit(main())
