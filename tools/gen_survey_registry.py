#!/usr/bin/env python
"""Regenerate SURVEY.md §2's registry inventory table (VERDICT r8 item 5).

Introspects the live registry: key → defining file:line → oracle kind →
newest driver CORRECTNESS round. Prints the markdown table to stdout;
paste between the SURVEY markers. tests/test_invariants.py::
test_survey_registry_table_matches_registry keeps SURVEY in sync.
"""
from __future__ import annotations

import glob
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from t_mobile_data_fnt_etl_pipeline_aws_spark.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)


def newest_rounds() -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        for key in json.load(open(path)):
            newest[key] = max(newest.get(key, 0), rnd)
    return newest


def rows() -> list[tuple[str, str, str, str]]:
    queries, oracles, newest = all_queries(), all_oracles(), newest_rounds()
    out = []
    for key, fn in sorted(queries.items()):
        src = inspect.unwrap(fn)
        mod = src.__module__.split("t_mobile_data_fnt_etl_pipeline_aws_spark.", 1)[-1]
        loc = f"{mod.replace('.', '/')}.py:{src.__code__.co_firstlineno}"
        kind = "SQL" if key in oracles else "rows-only"
        seen = newest.get(key)
        out.append((key, loc, kind, f"r{seen}" if seen else "— (new)"))
    return out


def table() -> str:
    lines = ["| key | defined at | oracle | newest driver row |", "|---|---|---|---|"]
    lines += [f"| `{key}` | `{loc}` | {kind} | {seen} |" for key, loc, kind, seen in rows()]
    return "\n".join(lines)


def main() -> None:
    if "--write" in sys.argv:
        # Replace the block between the SURVEY markers in place — the
        # round-12 failure mode was "regenerated but never pasted".
        path = os.path.join(REPO, "SURVEY.md")
        text = open(path).read()
        begin, end = "<!-- registry-table:begin -->", "<!-- registry-table:end -->"
        head, rest = text.split(begin, 1)
        _, tail = rest.split(end, 1)
        open(path, "w").write(head + begin + "\n" + table() + "\n" + end + tail)
        n = len(rows())
        print(f"SURVEY.md registry table rewritten: {n} keys")
    else:
        print(table())


if __name__ == "__main__":
    main()
