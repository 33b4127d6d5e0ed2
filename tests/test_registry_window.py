"""Guards on the driver verification window (VERDICT r01 item 5).

The correctness driver hash-checks only the first ``_DRIVER_WINDOW``
registry entries, so the window composition is a contract: every slot
must be oracle-checkable and every high-value query must sit inside it.
These tests fail the build if a future registration silently pushes a
§2 operator or a hash-checked twin past the window.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

WINDOW = entry_mod._DRIVER_WINDOW

# queries the judge explicitly required inside the window (VERDICT r01)
REQUIRED_IN_WINDOW = {
    # hash-checked LSH/ANN twins
    "dedup_minhash_poly",
    "dedup_simhash_poly",
    "dedup_incremental_lsh",
    "embedding_ivf_sqlcheck",
    "embedding_near_dup_sqlcheck",
    "embedding_ann_sqlcheck",
    # temporal trio
    "join_asof_backward",
    "join_range_interval",
    "scd2_order_status",
    # flagships
    "upsert_merge",
    "star_schema_build",
    "curation_pipeline",
    "q3_shipping_priority",
    "dq_expectations",
    # §2 coverage representatives
    "scan_project_filter",
    "incremental_slice",
    "scalar_part_suite",
    "scalar_to_usd",
    "scalar_entity_type",
    "scalar_try_cast_dirty",
    "dim_date_full",
    "json_extract_agg",
    "json_flatten_struct",
    "profile_catalog",
    "profile_orders",
    "profile_report_json",
    "surrogate_key_dim",
    "sort_limit_topk",
    "agg_grouping_sets",
    "join_inner_fk_agg",
    "join_left_null_retention",
    "join_self_dual_role",
    "join_named_key_left",
}


def test_window_is_exactly_the_curated_list():
    names = list(entry_mod.queries())
    assert names[:WINDOW] == entry_mod._WINDOW_ORDER


def test_every_window_slot_has_an_oracle():
    names = list(entry_mod.queries())[:WINDOW]
    oracles = entry_mod.oracle_sql()
    missing = [n for n in names if n not in oracles or not oracles[n].strip()]
    assert not missing, f"window slots without oracle SQL: {missing}"


def test_required_queries_inside_window():
    head = set(list(entry_mod.queries())[:WINDOW])
    missing = REQUIRED_IN_WINDOW - head
    assert not missing, f"required queries outside the driver window: {missing}"


def test_no_oracle_queries_have_checked_twins():
    """Every registered query either has an oracle or a documented
    bit-identical twin that is oracle-checked inside the window."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    head = set(list(qs)[:WINDOW])
    for name in qs:
        if name in oracles:
            continue
        twin = entry_mod._NO_ORACLE_TWINS.get(name)
        assert twin is not None, f"{name} has no oracle and no documented twin"
        assert twin in oracles, f"twin {twin} of {name} has no oracle"
        assert twin in head, f"twin {twin} of {name} is outside the driver window"


def test_window_names_unique():
    assert len(set(entry_mod._WINDOW_ORDER)) == len(entry_mod._WINDOW_ORDER)


def test_window_outputs_are_canonicalizer_safe(spark, sf_dir):
    """Every window query must emit only scalar columns: the driver's
    pandas canonicalizer sorts/hashes row tuples and crashes on
    array/map/struct/binary cells (r01 lost profile_catalog and
    text_winnow_fingerprints to exactly this). Serialize complex
    outputs to strings (array_join / to_json) before returning."""
    from pyspark.sql import types as T

    qs = entry_mod.queries()
    offenders = []
    for name in list(qs)[:WINDOW]:
        df = qs[name](spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
            ):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"non-scalar window outputs: {offenders}"
