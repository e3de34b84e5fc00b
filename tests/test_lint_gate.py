"""The plan-lint attribution gate, INSIDE pytest.

Round-8 postmortem: tools/lint_all.py lived outside the test suite, so
the round's final commit shipped with two unattributed scale-killer
warnings and a red gate at HEAD. This test makes that failure mode
structurally impossible — every lint_plan warning over the full
registry must carry an (op, kind) justification in
plans/lint_allowlist.py, and a plan that fails to BUILD is a failure
too. Runs the same sweep as tools/lint_all.py (one shared session,
sf0.001 plans).

Warnings themselves are allowed (they are the documented bounded-input
shapes); only UNATTRIBUTED warnings and plan-build errors fail.
"""

from __future__ import annotations


def test_every_lint_warning_is_attributed(spark, sf_dir):
    from tools.lint_all import sweep

    # Lint from a COLD cache, exactly like the tools/lint_all.py CLI:
    # cache entries left by earlier tests in the shared session replace
    # plan subtrees with InMemoryTableScan whose size statistics are
    # unknown, flipping auto-broadcast joins to sort-merge and tripping
    # warning kinds that never occur in the op's real cold plan (seen
    # as a suite-order-dependent flake in rounds 9-10).
    spark.catalog.clearCache()
    clean, warned, errored, unattributed = sweep(spark, sf_dir)
    assert not errored, f"plan build failures: {errored}"
    detail = {
        (name, kind): warned[name]
        for name, kind in unattributed
    }
    assert not unattributed, (
        "lint warnings with no allowlist justification "
        f"(add to plans/lint_allowlist.py): {detail}"
    )
    # the sweep actually covered the registry (sanity against an
    # accidentally-empty ops dict making the gate vacuous)
    assert len(clean) + len(warned) > 400

    # Staleness, INSIDE pytest (round-12): a documented allowlist entry
    # whose warning no longer fires is how a future real regression of
    # the same kind hides behind a dead justification — and a gate that
    # lives only in the tools/ CLI is the round-8 failure mode this
    # file exists to prevent. CACHE_CONDITIONAL entries are exempt here
    # (their cold-fire contract is the next test); everything else must
    # have fired in this cold-cache sweep.
    from my_polars_ai_spark.plans.lint_allowlist import (
        ALLOWLIST,
        CACHE_CONDITIONAL,
        kind_of,
    )

    fired = {
        (name, kind_of(w)) for name, ws in warned.items() for w in ws
    }
    stale = sorted(
        k for k in ALLOWLIST if k not in fired and k not in CACHE_CONDITIONAL
    )
    assert not stale, (
        f"allowlist entries not firing in the cold sweep (prune from "
        f"plans/lint_allowlist.py or move to CACHE_CONDITIONAL with a "
        f"documented reason): {stale}"
    )


def test_cache_conditional_entries_fire_cold(spark, sf_dir):
    """Round-12 staleness contract: every CACHE_CONDITIONAL allowlist
    entry must (a) point at a real ALLOWLIST justification and (b)
    actually fire against a COLD cache — conditional entries are
    exempt from the warm-sweep staleness gate in tools/lint_all.py,
    so this is what keeps them from rotting."""
    from my_polars_ai_spark.operators import all_ops
    from my_polars_ai_spark.plans.guardrails import lint_plan
    from my_polars_ai_spark.plans.lint_allowlist import (
        ALLOWLIST,
        CACHE_CONDITIONAL,
        kind_of,
    )

    assert CACHE_CONDITIONAL, "set removed? drop this test with it"
    ops = all_ops()
    for name, kind in sorted(CACHE_CONDITIONAL):
        assert (name, kind) in ALLOWLIST, (name, kind)
        spark.catalog.clearCache()
        warnings = lint_plan(ops[name].fn(spark, sf_dir))
        assert any(kind_of(w) == kind for w in warnings), (
            f"{name} [{kind}] no longer fires even cold — prune it from "
            f"CACHE_CONDITIONAL and ALLOWLIST"
        )
