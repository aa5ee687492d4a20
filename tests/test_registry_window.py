"""Mechanical checks of the registry rotation policy
(plans/registry.py docstring) — the invariants the round audit
verifies by hand, turned into CI:

- WINDOW CLOCK: no entry goes more than 2 rounds without a driver
  correctness row, i.e. every registered entry is either in the
  driver's 50-slot window (head of registration order — it gets its
  row THIS round) or present in the newest CORRECTNESS_r*.json (it
  got one LAST round).
- ROWS-ONLY SET: empty since r13 — every registered entry has a
  DuckDB oracle (the former exception pair ann_topk_lsh/ann_topk_ivf
  retired into the oracle-backed ann_topk_planted_hits).
"""

from __future__ import annotations

import glob
import json
import os

from dbitool_spark.plans import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WINDOW = 50  # driver cap, observed CORRECTNESS_r01-r08


def _latest_correctness() -> dict:
    files = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS_r*.json present — driver artifacts missing"
    with open(files[-1]) as fh:
        return json.load(fh)


def test_every_entry_within_two_round_window():
    names = list(registry.queries())
    head = set(names[:_WINDOW])
    last_round = set(_latest_correctness())
    overdue = [n for n in names if n not in head and n not in last_round]
    assert overdue == [], (
        "entries overdue a driver row (not in the 50-slot window and "
        f"absent from the newest CORRECTNESS record): {overdue} — rotate "
        "them into the head or merge them per the registry ledger"
    )


def test_rows_only_set_is_empty():
    qs = set(registry.queries())
    oracles = set(registry.oracle_sql())
    assert qs - oracles == set(), (
        "every registered entry must carry a DuckDB oracle (the "
        "rows-only exception set was zeroed in r13), got "
        f"{sorted(qs - oracles)}"
    )


def test_registry_has_no_duplicate_registrations():
    # register() last-wins silently on a duplicated name; a copy-paste
    # slip during rotation would drop an entry without any error
    from dbitool_spark.plans import registry as r

    assert len(r.queries()) == len(set(r.queries())), "duplicate names"
    # the window must actually be full enough to matter: fewer entries
    # than the window means the rotation bookkeeping degenerated
    assert len(r.queries()) >= _WINDOW
