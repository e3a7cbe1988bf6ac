"""Reference-domain fixtures (FIXTURES.md §A): synthetic alignments /
corporate-manager / API-state tables reproducing the reference's exact
column surface, with deliberate overlap and gaps so every ``_merge``
slice, the F8 key switch, the equity cross join, and the V4 hard gate
are all exercised with hand-computable golden answers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Re-exported for tests: defined in the package so executor workers can
# unpickle references to it (tests/ is not importable on workers).
from graphql_api_etl_spark.sinks.mutations import SpoolMutationClient as SpoolClient  # noqa: F401
from graphql_api_etl_spark.sinks.mutations import read_spool  # noqa: F401

REGIONS = [
    ("Acme / Ada Lovelace", "ada@acme.com", "Equity"),
    ("Acme / Grace Hopper", "grace@acme.com", "Equity"),
    ("Acme / Alan Turing", "alan@acme.com", "Franchise"),
]

# (district, region_idx, dm, dm_email)
DISTRICTS = [
    ("D-North", 0, "Nora Manager", "Nora@Acme.com "),  # case+space → normalize
    ("D-South", 0, "Sam Manager", "sam@acme.com"),
    ("D-East", 1, "Eve Manager", "eve@acme.com"),
    ("D-West", 2, "Wes Manager", "wes@acme.com"),
]

# (location, unit, district_idx, address, city, state, zip)
LOCATIONS = [
    ("Store Alpha", 101.0, 0, "1 Main St", "Springfield", "WA", "98101.0"),
    ("Store Bravo", 102.0, 0, "2 Oak Ave", "Portland", "OR", "97201-4321"),
    ("Store Charlie", 103.0, 1, "3 Pine Rd", "Boise", "ID", "83701.0"),
    ("Store Delta", 104.0, 2, "4 Elm Blvd", "Reno", "NV", "89501.0"),
    ("Store Echo", 105.0, 3, "5 Fir Ln", "Bend", "OR", "97701.0"),
    ("Store Foxtrot", 106.0, 3, None, "Eugene", "OR", "junk"),  # null addr, junk zip
]

# API locations: Alpha..Delta exist (matched), Echo/Foxtrot missing
# (left_only → loaded in pass 1), Zombie exists only in the API
# (right_only → deprecated report).
API_LOCATIONS = [
    ("locA", "Store Alpha", "101"),
    ("locB", "Store Bravo", "102"),
    ("locC", "Store Charlie", "103"),
    ("locD", "Store Delta", "104"),
    ("locZ", "Store Zombie", "999"),
]

# API users: every supervisor + DM + two corporate managers + one
# API-only straggler. (V4 requires all file emails present.)
API_USERS = [
    ("u-ada", "ada@acme.com"),
    ("u-grace", "grace@acme.com"),
    ("u-alan", "alan@acme.com"),
    ("u-nora", "nora@acme.com"),
    ("u-sam", "sam@acme.com"),
    ("u-eve", "eve@acme.com"),
    ("u-wes", "wes@acme.com"),
    ("u-corp1", "corp1@acme.com"),
    ("u-corp2", "corp2@acme.com"),
    ("u-straggler", "ghost@acme.com"),
]

CORPORATE_MANAGERS = ["Corp1@Acme.com", "corp2@acme.com", "unknown@nowhere.com"]


def alignments_df(spark: SparkSession) -> DataFrame:
    rows = []
    for loc, unit, d_idx, addr, city, state, zipc in LOCATIONS:
        district, dm, dm_email = DISTRICTS[d_idx][0], DISTRICTS[d_idx][2], DISTRICTS[d_idx][3]
        region, sup_email, franchise = REGIONS[DISTRICTS[d_idx][1]]
        # Ada's supervisor email is null in the file → P5 backfill path
        sup = None if region == "Acme / Ada Lovelace" else sup_email
        rows.append(
            (region, district, loc, unit, addr, city, state, zipc, dm, dm_email, sup, franchise)
        )
    # one row with null Location — dropped by F1 (ETL:257)
    rows.append(
        ("Acme / Alan Turing", "D-West", None, 999.0, None, None, None, None, "X", "x@a.com", "alan@acme.com", "Franchise")
    )
    df = spark.createDataFrame(
        rows,
        "region_supervisor string, district string, location string, unit double, "
        "address string, city string, state string, zip_code string, dm string, "
        "dm_email string, supervisor_email string, franchise_or_equity string",
    )
    return df.na.drop(subset=["district", "region_supervisor", "location", "unit"])


def corporate_managers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(m,) for m in CORPORATE_MANAGERS], "corporate_managers string")


def api_locations_df(spark: SparkSession, remote_ids: bool = True, extra=()) -> DataFrame:
    rows = [
        ("c%d" % i, nid, name, rid if remote_ids else "", "grp-x", False, "D-?")
        for i, (nid, name, rid) in enumerate(list(API_LOCATIONS) + list(extra))
    ]
    return spark.createDataFrame(
        rows,
        "cursor string, node_id string, node_name string, node_remoteId string, "
        "node_hierarchyGroup_id string, node_hierarchyGroup_isTop boolean, "
        "node_hierarchyGroup_name string",
    )


def api_users_df(spark: SparkSession, drop_emails: tuple[str, ...] = ()) -> DataFrame:
    rows = [
        (nid, email, email.split("@")[0].title(), "Fixture")
        for nid, email in API_USERS
        if email not in drop_emails
    ]
    return spark.createDataFrame(
        rows, "node_id string, node_email string, node_firstName string, node_lastName string"
    )


def api_hierarchy_groups_df(spark: SparkSession) -> DataFrame:
    """Groups mirroring build_hierarchy's output: one per region (top)
    and one per district (child) — except D-West is ABSENT (outdated-
    district report) and one orphan group exists only in the API."""
    rows = []
    for i, (region, _, _) in enumerate(REGIONS):
        rows.append((f"cur{i}", f"grp-r{i}", True, region, "", None))
    for j, (district, r_idx, _, _) in enumerate(DISTRICTS):
        if district == "D-West":
            continue
        rows.append((f"curd{j}", f"grp-d{j}", False, district, "", f"grp-r{r_idx}"))
    rows.append(("curX", "grp-orphan", False, "D-Orphan", "", "grp-r0"))
    return spark.createDataFrame(
        rows,
        "cursor string, node_id string, node_isTop boolean, node_name string, "
        "node_remoteId string, node_parent_id string",
    )
