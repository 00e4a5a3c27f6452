"""Convert a pytest junitxml report into the checked-in PYTEST_r{N}.json
artifact (summary counts, failed test ids, per-file test counts).

Usage:  python -m pytest tests/ -q --junitxml=/tmp/pytest.xml
        python tools/junit_to_json.py /tmp/pytest.xml PYTEST_r07.json
"""
import json, sys
import xml.etree.ElementTree as ET
from collections import Counter

xml_path, out_path = sys.argv[1], sys.argv[2]
root = ET.parse(xml_path).getroot()
suite = root.find("testsuite") if root.tag == "testsuites" else root
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
    per_file["tests/" + cls.split(".")[-1] + ".py" if cls else "?"] += 1
    if case.find("failure") is not None or case.find("error") is not None:
        failed.append(f"{cls}::{case.get('name')}")
out = {"summary": summary, "failed": failed, "per_file_counts": dict(sorted(per_file.items()))}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(summary))
