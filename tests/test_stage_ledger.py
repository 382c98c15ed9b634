"""1:1 disposition ledgers for the reference's cut / dedup / hashmap test
suites — the same cannot-rot discipline as test_extract_parity.EXTRACT_LEDGER
and test_join_parity_ref: every reference test name is enumerated with where
this repo pins it ("file:<test module>.<test>") or why it cannot run here
("skip:<reason>", all gpkg/fiona/geopandas inputs needing GDAL).

Mode note: the reference's ``shared_paths_*``-prefixed variants pass
``shared_coords=False`` explicitly, which IS the reference default
(topology.py:116) — they are re-runs of the default-mode cases with equal or
finer assertions, so they map to the same ported tests (which assert the
union: exact junction coordinates, duplicate-pair counts, shared-arc counts,
final arc counts).
"""

import os
import re

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REF_TESTS = "/root/reference/tests"

CUT_LEDGER = {
    "test_cut_exact_duplicate_lines_ABC_ABC_no_cuts":
        "file:test_stage_parity.test_cut_exact_duplicate_lines_no_cuts",
    "test_cut_reversed_duplicate_lines_ABC_CBA_no_cuts":
        "file:test_stage_parity.test_cut_reversed_duplicate_lines_no_cuts",
    "test_cut_overlapping_rings_are_cut":
        "file:test_stage_parity2.test_cut_overlapping_rings_are_cut",
    "test_cut_border_egypt_sudan": "skip:gpkg fixture (GDAL)",
    "test_cut_nybb_fast_split": "skip:gpkg fixture (GDAL)",
    "test_cut_many_junctions":
        "file:test_fixture_parity.test_cut_mesh2d_canary_11010",
    "test_cut_super_function_cut":
        "file:test_stage_parity2.test_cut_super_function_adjacent_squares_gc",
    "test_cut_geomcol_multipolygon_polygon":
        "file:test_stage_parity.test_cut_geomcol_multipolygon_polygon_bk8",
    "test_cut_junctions_coords":
        "file:test_fixture_parity.test_cut_alb_grc_shared_coords_3",
    "test_cut_linemerge_multilinestring":
        "file:test_stage_parity.test_cut_linemerge_multilinestring_12_segments",
    "test_cut_exact_duplicate_rings_ABCA_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_duplicate_rings_no_cuts [exact]",
    "test_cut_reversed_rings_ABCA_ACBA_no_cuts":
        "file:test_stage_parity.test_cut_duplicate_rings_no_cuts [reversed]",
    "test_cut_rotated_duplicates_rings_BCAB_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_duplicate_rings_no_cuts [rotated]",
    "test_cut_ring_ABCA_line_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_ring_and_line_no_cuts [exact]",
    "test_cut_ring_BCAB_line_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_ring_and_line_no_cuts [ring rotated]",
    "test_cut_ring_ABCA_line_BCAB_no_cuts":
        "file:test_stage_parity.test_cut_ring_and_line_no_cuts [line rotated]",
    # shared_paths_* = explicit shared_coords=False = the default mode the
    # ported tests already run (see module docstring)
    "test_cut_shared_paths_linemerge_multilinestring":
        "file:test_stage_parity.test_cut_linemerge_multilinestring_12_segments",
    "test_cut_shared_paths_exact_duplicate_rings_ABCA_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_duplicate_rings_no_cuts [exact]",
    "test_cut_shared_paths_reversed_rings_ABCA_ACBA_no_cuts":
        "file:test_stage_parity.test_cut_duplicate_rings_no_cuts [reversed]",
    "test_cut_shared_paths_rotated_duplicates_rings_BCAB_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_duplicate_rings_no_cuts [rotated]",
    "test_cut_shared_paths_ring_ABCA_line_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_ring_and_line_no_cuts [exact]",
    "test_cut_shared_paths_ring_BCAB_line_ABCA_no_cuts":
        "file:test_stage_parity.test_cut_ring_and_line_no_cuts [ring rotated]",
    "test_cut_shared_paths_ring_ABCA_line_BCAB_no_cuts":
        "file:test_stage_parity.test_cut_ring_and_line_no_cuts [line rotated]",
    "test_cut_low_prequantize":
        "file:test_stage_parity.test_cut_low_prequantize_africa",
    "test_cut_extra_points_no_cuts":
        "file:test_stage_parity.test_cut_extra_points_no_cuts",
    "test_cut_extra_points_cut":
        "file:test_stage_parity.test_cut_extra_points_cut",
    "test_cut_extra_points_other_line_cut":
        "file:test_stage_parity.test_cut_extra_points_other_line_cut",
}

DEDUP_LEDGER = {
    "test_dedup_duplicate_rotated_hole_interior":
        "file:test_stage_parity2.test_dedup_duplicate_rotated_hole_interior",
    "test_dedup_two_polygon_reversed_shared_arc":
        "file:test_stage_parity2.test_dedup_two_polygon_reversed_shared_arc",
    "test_dedup_duplicate_polygon_no_junctions":
        "file:test_stage_parity.test_dedup_duplicate_polygon_no_junctions",
    "test_dedup_shared_line_ABCDBE_and_FBCG":
        "file:test_pipeline.test_dedup_shared_line_ABCDBE_and_FBCG",
    "test_dedup_shared_junctions_in_shared_paths": "skip:gpkg fixture (GDAL)",
    "test_dedup_arc_not_shared_arcs_got_deleted": "skip:gpkg fixture (GDAL)",
    "test_dedup_no_shared_paths_in_geoms": "skip:gpkg fixture (GDAL)",
    "test_dedup_super_function":
        "file:test_stage_parity2.test_dedup_super_function_adjacent_squares_gc",
    "test_dedup_array_bk_sarcs_reference":
        "file:test_stage_parity.test_dedup_array_bk_sarcs_crossing_lines",
    "test_dedup_s2_geometries":
        "file:test_stage_parity.test_dedup_s2_multilinestring_rings",
    "test_dedup_linemerge_multilinestring":
        "file:test_stage_parity.test_dedup_linemerge_multilinestring_9_arcs",
    "test_dedup_shared_paths_array_bk_sarcs_reference":
        "file:test_stage_parity.test_dedup_array_bk_sarcs_crossing_lines"
        " (same mode, exact junction coords asserted)",
    "test_dedup_shared_paths_s2_geometries":
        "file:test_stage_parity.test_dedup_s2_multilinestring_rings",
    "test_dedup_shared_paths_linemerge_multilinestring":
        "file:test_stage_parity.test_dedup_linemerge_multilinestring_9_arcs",
    "test_dedup_topology_false":
        "skip:gpkg fixture (GDAL); topology=False semantics pinned in"
        " test_pipeline.test_topology_no_topology_flag on dict input",
    "test_dedup_merge_continuous":
        "file:test_stage_parity.test_dedup_merge_continuous",
    "test_dedup_merge_continuous_shared_path":
        "file:test_stage_parity2.test_dedup_merge_continuous_shared_path",
}

HASHMAP_LEDGER = {
    "test_hashmap_geomcol_multipolygon_polygon":
        "file:test_pipeline.test_hashmap_geomcol_multipolygon_polygon",
    "test_hashmap_backward_polygon":
        "file:test_pipeline.test_hashmap_backward_polygon",
    "test_hashmap_albania_greece":
        "file:test_stage_parity2.test_hashmap_albania_greece_fixture"
        " (geojson fixture of the same two-country subset)",
    "test_hashmap_benin_surrounding_countries": "skip:gpkg fixture (GDAL)",
    "test_hashmap_geom_surrounding_many_geometries":
        "skip:gpkg fixture (GDAL)",
    "test_hashmap_shared_arcs_ordering_issues": "skip:gpkg fixture (GDAL)",
    "test_hashmap_super_function":
        "file:test_stage_parity2.test_hashmap_super_function_signed_arcs",
    "test_hashmap_of_nested_geometrycollection":
        "file:test_stage_parity.test_hashmap_nested_geometrycollection_2_levels",
    "test_hashmap_winding_order_geom_solely_shared_arcs":
        "skip:gpkg fixture (GDAL); winding of solely-shared-arc geoms pinned"
        " in test_postops + naturalearth round-trip equality",
    "test_hashmap_point":
        "file:test_stage_parity.test_hashmap_point_tables",
    "test_hashmap_polygon_point":
        "file:test_stage_parity.test_hashmap_point_tables",
    "test_hashmap_multipoint":
        "file:test_stage_parity.test_hashmap_point_tables",
    "test_hashmap_polygon":
        "file:test_stage_parity.test_hashmap_point_tables",
    "test_hashmap_point_multipoint":
        "file:test_stage_parity.test_hashmap_point_tables",
    "test_hashmap_nested_geometrycollection":
        "file:test_stage_parity.test_hashmap_nested_geometrycollection_in_featurecollection",
    "test_hashmap_polygon_geometrycollection":
        "file:test_stage_parity.test_hashmap_polygon_geometrycollection_mixed",
    "test_hashmap_linestring_polygon":
        "file:test_stage_parity2.test_hashmap_linestring_polygon",
    "test_hashmap_fiona_gpkg_to_dict": "skip:fiona/GDAL reader",
    "test_hashmap_serializing_holes":
        "file:test_stage_parity2.test_hashmap_serializing_holes",
    "test_hashmap_read_multiple_gdf_object_name":
        "skip:geopandas GeoDataFrame input",
}


def _ref_names(fname: str) -> list:
    with open(os.path.join(REF_TESTS, fname)) as f:
        return re.findall(r"^def (test_\w+)", f.read(), re.M)


def _repo_test_names() -> set:
    names = set()
    for fn in os.listdir(TESTS_DIR):
        if fn.startswith("test_") and fn.endswith(".py"):
            with open(os.path.join(TESTS_DIR, fn)) as f:
                for name in re.findall(r"^def (test_\w+)", f.read(), re.M):
                    names.add(f"{fn[:-3]}.{name}")
    return names


def _check(ledger: dict, ref_file: str):
    assert sorted(_ref_names(ref_file)) == sorted(ledger), ref_file
    repo = _repo_test_names()
    for ref, target in ledger.items():
        kind, rest = target.split(":", 1)
        if kind == "file":
            dotted = rest.split(" ")[0]
            assert dotted in repo, f"{ref} -> {dotted} not found"
        else:
            assert kind == "skip" and rest, ref


def test_cut_ledger_enumerates_reference_suite():
    _check(CUT_LEDGER, "test_cut.py")


def test_dedup_ledger_enumerates_reference_suite():
    _check(DEDUP_LEDGER, "test_dedup.py")


def test_hashmap_ledger_enumerates_reference_suite():
    _check(HASHMAP_LEDGER, "test_hashmap.py")
