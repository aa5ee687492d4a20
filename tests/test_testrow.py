"""TestRow port fidelity: byte-for-byte vs the reference generator.

tests/golden/testrow_1000.csv is the raw output of the reference's
own generator (`perl -It -MTestRow -e 'TestRow::csv(1000)'` in
/root/reference) captured once; the port must reproduce it exactly.
"""

from __future__ import annotations

import os

from dbitool_spark import testrow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "testrow_1000.csv")


def test_csv_matches_reference_golden():
    mine = testrow.csv_lines(1000)
    golden = open(GOLDEN).read().splitlines()
    assert len(mine) == len(golden)
    for i, (a, b) in enumerate(zip(mine, golden)):
        assert a == b, f"line {i}: {a!r} != {b!r}"


def test_check_self_consistency():
    # mirrors the reference's _test (48 rows, check each)
    for r in testrow.rows(48):
        testrow.check(r)


def test_check_detects_corruption():
    r = list(testrow.row(7))
    r[4] = "deadbeef"
    try:
        testrow.check(tuple(r))
    except AssertionError:
        return
    raise AssertionError("corrupted row passed check()")


def test_ndjson_and_json_shapes():
    nd = testrow.ndjson_lines(3)
    assert len(nd) == 3 and nd[0].startswith('{"row":"0"')
    doc = testrow.json_doc(3)
    assert doc.startswith("[{") and doc.endswith("}]")
