"""End-to-end reproduction of the reference's actual IMDB flow:

raw TSV assets -> crawler (with header classifier) -> Lake raw zone ->
ETL job (ApplyMapping, TSV->parquet, partitioned write) -> processed
zone -> the Athena named queries (``stacks/demo_stack.py:267-293``):
per-dataset previews and the title_ratings ⋈ title_basics join —
executed verbatim through spark.sql over the Lake's registered views.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import Lake
from cdk_serverless_data_lake_sandbox_spark.operators.etl import tsv_to_parquet_job
from cdk_serverless_data_lake_sandbox_spark.sources.crawler import CsvClassifier, crawl_delimited

_TITLE_BASICS = (
    "tconst\ttitleType\tprimaryTitle\tstartYear\truntimeMinutes\n"
    "tt0000001\tshort\tCarmencita\t1894\t1\n"
    "tt0000002\tshort\tLe clown et ses chiens\t1892\t5\n"
    "tt0000003\tmovie\tPauvre Pierrot\t1892\t45\n"
)
_TITLE_RATINGS = (
    "tconst\taverageRating\tnumVotes\n"
    "tt0000001\t5.7\t2024\n"
    "tt0000003\t6.5\t1931\n"
)
_NAME_BASICS = (
    "nconst\tprimaryName\tbirthYear\tdeathYear\n"
    "nm0000001\tFred Astaire\t1899\t1987\n"
    "nm0000002\tLauren Bacall\t1924\t2014\n"
)


@pytest.fixture()
def assets(tmp_path):
    for name, content in [
        ("title.basics", _TITLE_BASICS),
        ("title.ratings", _TITLE_RATINGS),
        ("name.basics", _NAME_BASICS),
    ]:
        d = tmp_path / "assets" / name
        d.mkdir(parents=True)
        (d / f"{name}.tsv").write_text(content)
    return tmp_path


def test_reference_imdb_flow(spark, assets):
    lake = Lake(spark, str(assets / "lake"))
    lake.add_zone("raw")
    lake.add_zone("processed")

    # crawler pass over every asset folder (demo_stack.py:130-145)
    for ds in ["title.basics", "title.ratings", "name.basics"]:
        df = crawl_delimited(
            spark,
            str(assets / "assets" / ds / f"{ds}.tsv"),
            classifier=CsvClassifier(delimiter="\t"),
        )
        lake.register("raw", f"with_classifier_{ds.replace('.', '_')}", ds, df)

    # the Athena preview named queries (demo_stack.py:267-280)
    for ds in ["title_basics", "title_ratings", "name_basics"]:
        prev = spark.sql(f'SELECT * FROM raw_with_classifier_{ds} LIMIT 10')
        assert prev.count() > 0

    # the Athena join named query, verbatim shape (demo_stack.py:288)
    joined = spark.sql(
        "SELECT raw_with_classifier_title_basics.primaryTitle, "
        "raw_with_classifier_title_ratings.averageRating\n"
        "FROM raw_with_classifier_title_ratings\n"
        "INNER JOIN raw_with_classifier_title_basics "
        "ON raw_with_classifier_title_ratings.tconst = raw_with_classifier_title_basics.tconst"
    ).collect()
    assert {(r.primaryTitle, r.averageRating) for r in joined} == {
        ("Carmencita", 5.7),
        ("Pauvre Pierrot", 6.5),
    }

    # the Glue ETL job on name.basics (withGlueJobForNameBasics)
    out = tsv_to_parquet_job(
        spark,
        str(assets / "assets" / "name.basics" / "name.basics.tsv"),
        str(assets / "lake" / "processed"),
        "name.basics",
        mappings=[
            ("nconst", "string", "nconst", "string"),
            ("primaryName", "string", "primaryName", "string"),
            ("birthYear", "choice", "birthYear", "bigint"),
            ("deathYear", "choice", "deathYear", "bigint"),
        ],
        partition_keys=["birthYear"],
    )
    lake.register(
        "processed", "name_basics", out["partitioned"], spark.read.parquet(out["partitioned"])
    )
    res = spark.sql(
        "SELECT primaryName FROM processed_name_basics WHERE birthYear = 1899"
    ).collect()
    assert [r.primaryName for r in res] == ["Fred Astaire"]


# ----------------------------------------------------- A10 catalog ACL
def test_lake_acl_grant_mask_audit(spark, tmp_path):
    """The IAM-role/bucket-policy analog end-to-end: default-deny,
    zone-wide and table grants, column masking with a stable schema,
    audit rows for allowed AND denied attempts, and durability of the
    grants across Lake.open."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import (
        AccessDenied,
        Lake,
        MASK_PLACEHOLDER,
    )

    lake = Lake(spark, str(tmp_path / "lake"))
    lake.add_zone("processed")
    df = spark.createDataFrame(
        [(1, "alice", 9.5), (2, "bob", 3.25)], "id int, name string, score double"
    )
    path = str(tmp_path / "lake" / "processed" / "users")
    df.write.parquet(path)
    lake.register("processed", "users", path, spark.read.parquet(path))

    # default deny: no grant -> AccessDenied (and an audit row)
    with pytest.raises(AccessDenied):
        lake.read("analyst", "processed", "users")

    # column-scoped grant: ungranted columns masked, schema preserved
    lake.grant("analyst", "processed", "users", columns=["id", "score"])
    got = lake.read("analyst", "processed", "users")
    assert [f.name for f in got.schema.fields] == ["id", "name", "score"]
    rows = {r.id: r for r in got.collect()}
    assert rows[1].name == MASK_PLACEHOLDER and rows[1].score == 9.5
    # principal-scoped view is queryable
    assert (
        spark.sql("SELECT DISTINCT name FROM analyst__processed_users").collect()[0][0]
        == MASK_PLACEHOLDER
    )

    # zone wildcard grant: full read for another principal
    lake.grant("etl", "processed")
    full = lake.read("etl", "processed", "users")
    assert {r.name for r in full.collect()} == {"alice", "bob"}

    # a table not in the zone denies even with the wildcard
    with pytest.raises(AccessDenied):
        lake.read("etl", "processed", "ghost")

    # revoke closes the door again
    lake.revoke("analyst", "processed", "users")
    with pytest.raises(AccessDenied):
        lake.read("analyst", "processed", "users")

    # audit rows landed for every attempt, allowed and denied
    audit = lake.audit_log()
    by = {
        (r.principal, r.allowed): r
        for r in audit.where(F.col("table") == "users").collect()
    }
    assert ("analyst", True) in by and ("analyst", False) in by
    assert ("etl", True) in by
    assert audit.where((F.col("table") == "ghost") & ~F.col("allowed")).count() == 1

    # durability: grants survive reopen in the manifest
    lake2 = Lake.open(spark, str(tmp_path / "lake"))
    masked_again = lake2.read("etl", "processed", "users")
    assert masked_again.count() == 2
    with pytest.raises(AccessDenied):
        lake2.read("analyst", "processed", "users")


def test_lake_acl_masked_nonstring_is_typed_null(spark, tmp_path):
    """Masked non-string columns keep their TYPE (typed NULL), so a
    governed frame unions with an ungoverned one without casts."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import AccessDenied, Lake

    lake = Lake(spark, str(tmp_path / "lake2"))
    lake.add_zone("z")
    df = spark.createDataFrame([(1, 2.5)], "id int, v double")
    path = str(tmp_path / "lake2" / "z" / "t")
    df.write.parquet(path)
    lake.register("z", "t", path, spark.read.parquet(path))
    lake.grant("p", "z", "t", columns=["id"])
    got = lake.read("p", "z", "t")
    assert got.schema["v"].dataType.simpleString() == "double"
    assert got.collect()[0].v is None
    assert isinstance(AccessDenied("x"), Exception)


def test_lake_acl_row_filter_composes_with_masking(spark, tmp_path):
    """Row-level security: a grant's SQL row filter scopes the rows a
    principal sees, is evaluated against TRUE (pre-mask) values even
    when it gates on a column the same grant masks, coexists with
    legacy filter-less grants in one manifest, survives Lake.open, and
    is recorded on the audit row."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import (
        MASK_PLACEHOLDER,
        Lake,
    )

    lake = Lake(spark, str(tmp_path / "lake3"))
    lake.add_zone("z")
    df = spark.createDataFrame(
        [
            (1, "emea", 10.0),
            (2, "emea", 55.0),
            (3, "apac", 99.0),
        ],
        "id int, region string, amount double",
    )
    path = str(tmp_path / "lake3" / "z" / "sales")
    df.write.parquet(path)
    lake.register("z", "sales", path, spark.read.parquet(path))

    # filter gates on `region`, which the grant ALSO masks: the
    # predicate must see true values, the output masked ones
    lake.grant(
        "regional",
        "z",
        "sales",
        columns=["id", "amount"],
        row_filter="region = 'emea' AND amount > 20",
    )
    got = lake.read("regional", "z", "sales").collect()
    assert [r.id for r in got] == [2]
    assert got[0].region == MASK_PLACEHOLDER and got[0].amount == 55.0

    # a legacy (no-filter) grant for another principal still reads all
    lake.grant("etl", "z", "sales")
    assert lake.read("etl", "z", "sales").count() == 3

    # durability: both grant encodings round-trip the JSON manifest
    lake2 = Lake.open(spark, str(tmp_path / "lake3"))
    assert [r.id for r in lake2.read("regional", "z", "sales").collect()] == [2]
    assert lake2.read("etl", "z", "sales").count() == 3

    # the audit trail records which filter governed each read
    audit = lake.audit_log().where("principal = 'regional'")
    assert audit.where("row_filter LIKE '%emea%'").count() >= 1


# ---------------------------------------------------- A11 grok crawler
def test_crawl_grok_types_casts_and_corrupt_hooks(spark, tmp_path):
    """The Glue GrokClassifier analog end-to-end: %{...:field:type}
    tokens compile to ONE anchored regex whose captures become typed
    columns; custom patterns extend the library; the malformed-row
    contract matches crawl_delimited (PERMISSIVE+corrupt_col routes
    raw lines to the DLQ column, bare PERMISSIVE drops them, FAILFAST
    raises at scan time via a distributed raise_error guard)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from cdk_serverless_data_lake_sandbox_spark.sources.crawler import (
        GrokClassifier,
        crawl_grok,
    )

    log = tmp_path / "app.log"
    log.write_text(
        "2026-08-15T10:00:01Z INFO svc-a 200 0.125 handled /api/users\n"
        "2026-08-15T10:00:02Z ERROR svc-b 500 2.5 upstream timeout\n"
        "this line matches nothing\n"
    )
    cls = GrokClassifier(
        grok_pattern=(
            "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{SVC:svc} "
            "%{INT:status:int} %{NUMBER:latency:float} %{GREEDYDATA:msg}"
        ),
        custom_patterns={"SVC": r"svc-\w+"},
    )

    # PERMISSIVE without corrupt_col: unmatched lines dropped
    df = crawl_grok(spark, str(log), cls)
    assert [f.simpleString() for f in df.schema.fields] == [
        "ts:string",
        "level:string",
        "svc:string",
        "status:bigint",
        "latency:double",
        "msg:string",
    ]
    rows = {r.svc: r for r in df.collect()}
    assert set(rows) == {"svc-a", "svc-b"}
    assert rows["svc-b"].status == 500 and rows["svc-b"].latency == 2.5
    assert rows["svc-a"].msg == "handled /api/users"

    # PERMISSIVE + corrupt_col: unmatched line lands raw in the DLQ
    # column, typed fields null
    dlq = crawl_grok(spark, str(log), cls, corrupt_col="_corrupt")
    bad = dlq.where("_corrupt IS NOT NULL").collect()
    assert len(bad) == 1
    assert bad[0]._corrupt == "this line matches nothing"
    assert bad[0].status is None
    assert dlq.count() == 3

    # FAILFAST: the scan raises on the unmatched line
    with pytest.raises(SparkRuntimeException, match="grok: unmatched line"):
        crawl_grok(spark, str(log), cls, mode="FAILFAST").count()
    # ... and runs clean once the bad line is gone
    clean = tmp_path / "clean.log"
    clean.write_text(
        "2026-08-15T10:00:01Z INFO svc-a 200 0.125 ok\n"
    )
    assert crawl_grok(spark, str(clean), cls, mode="FAILFAST").count() == 1

    # corrupt_col keeps the schema in EVERY mode (all-null when the
    # mode filters malformed lines away) — the crawl_delimited parity
    dropm = crawl_grok(
        spark, str(log), cls, mode="DROPMALFORMED", corrupt_col="_corrupt"
    )
    assert "_corrupt" in dropm.columns
    assert dropm.count() == 2
    assert dropm.where("_corrupt IS NOT NULL").count() == 0

    # compile-time validation is loud
    with pytest.raises(ValueError):
        GrokClassifier("%{NO_SUCH:f}").compile()
    with pytest.raises(ValueError):
        GrokClassifier("%{INT:f:hex}").compile()
    with pytest.raises(ValueError):
        GrokClassifier("no fields at all").compile()
    # ... including the silent-corruption traps (review findings):
    # stray capturing group shifting field indexes
    with pytest.raises(ValueError, match="capture-group count"):
        GrokClassifier("(%{WORD:lvl}|-) %{INT:code:int}").compile()
    # duplicate field names -> ambiguous downstream columns
    with pytest.raises(ValueError, match="duplicate"):
        GrokClassifier("%{INT:n:int} %{INT:n:int}").compile()
    # token that misses the \\w+ grammar left unsubstituted
    with pytest.raises(ValueError, match="unsubstituted"):
        GrokClassifier("%{INT:http.status} %{WORD:w}").compile()


def test_crawl_grok_single_text_scan_plan(spark, tmp_path):
    """The grok read is ONE text scan with JVM-side extracts — no
    inference pass, no Python boundary (the 100 TB raw-log contract:
    classification cost == one scan)."""
    from cdk_serverless_data_lake_sandbox_spark.sources.crawler import (
        GrokClassifier,
        crawl_grok,
    )

    log = tmp_path / "x.log"
    log.write_text("1 a\n2 b\n")
    df = crawl_grok(
        spark, str(log), GrokClassifier("%{INT:id:int} %{WORD:w}")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan text") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert [r.id for r in df.orderBy("id").collect()] == [1, 2]
