"""Driver-gate rotation policy: the first 50 registry entries are what
the driver checks, so ordering IS coverage. These tests pin the policy
without Spark: re-check-due queries (never green, failed, or module
edited since last green) lead, and within that front the stalest
verification debt wins a slot."""

from __future__ import annotations

import housing_crawler_spark.all_queries as aq


def test_recheck_due_queries_lead() -> None:
    names = list(aq.REGISTRY)
    eff = [aq._effective_green(n) for n in names]
    front_end = sum(1 for e in eff if e == 0)
    assert all(e == 0 for e in eff[:front_end])
    assert all(e > 0 for e in eff[front_end:])


def test_front_orders_stalest_raw_green_first() -> None:
    names = list(aq.REGISTRY)
    front = [n for n in names if aq._effective_green(n) == 0]
    raws = [aq._LAST.get(n, 0) for n in front]
    assert raws == sorted(raws), (
        "within the re-check front, never-checked then oldest-green-but-"
        "edited must come before recently-green-but-edited"
    )


def test_verified_tail_orders_oldest_green_first() -> None:
    names = list(aq.REGISTRY)
    tail = [aq._effective_green(n) for n in names if aq._effective_green(n) > 0]
    assert tail == sorted(tail)


def test_gate_debt_fits_gate() -> None:
    """Hygiene policy (all_queries.py docstring): the set of queries
    owed a driver row must fit one round's gate, so no query is ever
    more than 2 rounds stale-while-edited. If this fails, stop adding
    or editing query modules until the gate drains."""
    debt = aq.gate_debt()
    assert len(debt) <= aq.GATE_SLOTS, (
        f"{len(debt)} queries owe a driver row but the gate re-checks "
        f"only {aq.GATE_SLOTS}/round; overflow would wait 2+ rounds: "
        f"{debt[aq.GATE_SLOTS:]}"
    )


def test_edited_module_resets_green(monkeypatch) -> None:
    """A query whose defining module changed since its stamped
    fingerprint must report effective green 0 even with a green row."""
    greened = [n for n in aq.REGISTRY if aq._effective_green(n) > 0 and n in aq._FPS]
    if not greened:  # fresh clone with no ledger: nothing to test
        return
    name = greened[0]
    assert aq._effective_green(name) == aq._LAST[name]
    monkeypatch.setitem(aq._FPS, name, "0" * 16)
    assert aq._effective_green(name) == 0
