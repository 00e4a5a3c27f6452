"""Convert a pytest junitxml report into the checked-in PYTEST_r{N}.json
artifact (summary counts, failed test ids, per-file test counts).

Usage:  python -m pytest tests/ -q --junitxml=/tmp/pytest.xml
        python tools/junit_to_json.py /tmp/pytest.xml PYTEST_r07.json
"""
import json
import sys
import xml.etree.ElementTree as ET
from collections import Counter


def classname_to_path(cls: str) -> str:
    """Map a junit classname to its source file: keep every dotted
    package component, drop trailing class names (components that do
    not look like a module, i.e. CamelCase test classes).
    'tests.test_x' -> 'tests/test_x.py';
    'tests.sub.test_z' -> 'tests/sub/test_z.py';
    'tests.test_x.TestY' -> 'tests/test_x.py'."""
    if not cls:
        return "?"
    parts = cls.split(".")
    while parts and parts[-1][:1].isupper():
        parts = parts[:-1]
    return "/".join(parts) + ".py" if parts else "?"


def main() -> int:
    xml_path, out_path = sys.argv[1], sys.argv[2]
    root = ET.parse(xml_path).getroot()
    suite = root.find("testsuite") if root.tag == "testsuites" else root
    if suite is None:
        raise SystemExit(f"{xml_path}: no <testsuite> element (empty report?)")
    summary = {
        "tests": int(suite.get("tests", 0)),
        "errors": int(suite.get("errors", 0)),
        "failures": int(suite.get("failures", 0)),
        "skipped": int(suite.get("skipped", 0)),
        "time_sec": round(float(suite.get("time", 0)), 1),
    }
    failed, per_file = [], Counter()
    for case in suite.iter("testcase"):
        cls = case.get("classname", "")
        per_file[classname_to_path(cls)] += 1
        if case.find("failure") is not None or case.find("error") is not None:
            failed.append(f"{cls}::{case.get('name')}")
    out = {
        "summary": summary,
        "failed": failed,
        "per_file_counts": dict(sorted(per_file.items())),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
