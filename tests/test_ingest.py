"""Ingest transform tests (reference `proxy/bulk/processor.go`,
`proxy/bulk/indexer.go`): time extraction, drift clamp, tokens map,
fields-pipe JSON projection."""

import json

from pyspark.sql import functions as F

from seqspark.ingest import ingest_docs, project_fields
from seqspark.mapping import Mapping

MAPPING = Mapping(
    {
        "service": "keyword",
        "message": "text",
        "level": "keyword",
    }
)


def make_docs(spark, docs):
    return spark.createDataFrame([(json.dumps(d),) for d in docs], "raw string")


def test_time_extracted_from_timestamp_field(spark):
    ingest_ts = F.to_timestamp(F.lit("2024-01-02 00:00:00"))
    df = make_docs(spark, [{"timestamp": "2024-01-01 12:30:00.123", "service": "a"}])
    row = ingest_docs(df, MAPPING, ingest_ts=ingest_ts).collect()[0]
    assert row["mid"] == 1704112200123


def test_time_fallback_chain_rfc3339(spark):
    ingest_ts = F.to_timestamp(F.lit("2024-01-02 00:00:00"))
    df = make_docs(spark, [{"time": "2024-01-01T15:00:00Z", "service": "a"}])
    row = ingest_docs(df, MAPPING, ingest_ts=ingest_ts).collect()[0]
    assert row["mid"] == 1704121200000


def test_unparseable_time_uses_ingest_time(spark):
    ingest_ts = F.to_timestamp(F.lit("2024-01-02 00:00:00"))
    df = make_docs(spark, [{"timestamp": "not-a-date", "service": "a"}])
    row = ingest_docs(df, MAPPING, ingest_ts=ingest_ts).collect()[0]
    assert row["ts"].strftime("%Y-%m-%d %H:%M:%S") == "2024-01-02 00:00:00"


def test_drift_clamp_old_doc(spark):
    # doc 3 days older than ingest → clamped (allowed drift 24h)
    ingest_ts = F.to_timestamp(F.lit("2024-01-10 00:00:00"))
    df = make_docs(spark, [{"timestamp": "2024-01-07 00:00:00.000", "service": "a"}])
    row = ingest_docs(df, MAPPING, ingest_ts=ingest_ts).collect()[0]
    assert row["ts"].strftime("%Y-%m-%d") == "2024-01-10"


def test_future_clamp(spark):
    ingest_ts = F.to_timestamp(F.lit("2024-01-10 00:00:00"))
    df = make_docs(spark, [{"timestamp": "2024-01-10 00:10:00.000", "service": "a"}])
    row = ingest_docs(df, MAPPING, ingest_ts=ingest_ts).collect()[0]
    assert row["ts"].strftime("%H:%M") == "00:00"


def test_within_drift_kept(spark):
    ingest_ts = F.to_timestamp(F.lit("2024-01-10 00:00:00"))
    df = make_docs(spark, [{"timestamp": "2024-01-09 12:00:00.000", "service": "a"}])
    row = ingest_docs(df, MAPPING, ingest_ts=ingest_ts).collect()[0]
    assert row["ts"].strftime("%Y-%m-%d %H:%M") == "2024-01-09 12:00"


def test_tokens_map_per_mapping(spark):
    df = make_docs(
        spark,
        [{"service": "Auth-API", "message": "Failed to Connect: timeout", "extra": 1}],
    )
    row = ingest_docs(df, MAPPING).collect()[0]
    toks = row["tokens"]
    assert toks["service"] == ["auth-api"]
    assert toks["message"] == ["failed", "to", "connect", "timeout"]
    assert "level" not in toks  # absent field → no entry
    assert "extra" not in toks  # unmapped field → not indexed
    assert row["size"] == len(row["raw"])


def test_docs_search_end_to_end(spark):
    from seqspark import SearchTable

    docs = [
        {"timestamp": "2024-01-01 10:00:00.000", "service": "auth", "message": "login ok"},
        {"timestamp": "2024-01-01 11:00:00.000", "service": "auth", "message": "login failed badly"},
        {"timestamp": "2024-01-01 12:00:00.000", "service": "pay", "message": "charge failed"},
    ]
    ingest_ts = F.to_timestamp(F.lit("2024-01-01 12:00:00"))
    frame = ingest_docs(make_docs(spark, docs), MAPPING, ingest_ts=ingest_ts)
    st = SearchTable.from_docs(frame, MAPPING)
    assert st.search("service:auth").count() == 2
    assert st.search("message:failed").count() == 2
    assert st.search("service:auth and message:failed").count() == 1
    assert st.search("message:fail*").count() == 2
    assert st.search("not service:auth").count() == 1
    assert st.search("_exists_:level").count() == 0
    assert st.search("*").count() == 3


def test_project_fields_keep(spark):
    df = make_docs(spark, [{"a": 1, "b": "x", "c": {"d": 2}}])
    out = df.select(project_fields(F.col("raw"), ["a", "c"]).alias("j")).collect()[0]["j"]
    assert json.loads(out) == {"a": 1, "c": {"d": 2}}


def test_project_fields_except(spark):
    df = make_docs(spark, [{"a": 1, "b": "x", "c": True}])
    out = df.select(
        project_fields(F.col("raw"), ["b"], except_=True).alias("j")
    ).collect()[0]["j"]
    assert json.loads(out) == {"a": 1, "c": True}

def test_user_mapped_original_timestamp_survives_without_clamp(spark):
    # a user-mapped `original_timestamp` field keeps its tokens when the
    # drift clamp does NOT fire; the overwrite applies only to clamped docs
    # (`docs/en/07-long-term-store.md` rewrites the field only on clamp)
    mapping = Mapping({"service": "keyword", "original_timestamp": "keyword"})
    ingest_ts = F.to_timestamp(F.lit("2024-01-10 00:00:00"))
    df = make_docs(
        spark,
        [
            {
                "timestamp": "2024-01-09 12:00:00.000",  # within drift
                "service": "a",
                "original_timestamp": "User-Value",
            }
        ],
    )
    row = ingest_docs(df, mapping, ingest_ts=ingest_ts).collect()[0]
    assert row["tokens"]["original_timestamp"] == ["user-value"]


def test_clamp_overwrites_user_mapped_original_timestamp(spark):
    mapping = Mapping({"service": "keyword", "original_timestamp": "keyword"})
    ingest_ts = F.to_timestamp(F.lit("2024-01-10 00:00:00"))
    df = make_docs(
        spark,
        [
            {
                "timestamp": "2024-01-01 00:00:00.000",  # 9 days old → clamped
                "service": "a",
                "original_timestamp": "User-Value",
            }
        ],
    )
    row = ingest_docs(df, mapping, ingest_ts=ingest_ts).collect()[0]
    toks = row["tokens"]["original_timestamp"]
    assert toks != ["user-value"]  # clamp wins on clamped docs
    assert any(t.startswith("2024-01-01") for t in toks)


def test_ntz_timestamps_read_as_utc_regardless_of_session_tz(spark):
    """from_typed over a TIMESTAMP_NTZ ts column: epochs must equal the
    wall time read as UTC even when the session timezone is not UTC."""
    import datetime as dt

    from pyspark.sql import functions as F

    from seqspark import SearchTable

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.sql(
            "select 1 as id, timestamp_ntz'2026-01-01 00:00:00' as ts "
            "union all "
            # inside New York's 2026 spring-forward gap: a bare cast would
            # shift this one by an extra hour
            "select 2 as id, timestamp_ntz'2026-03-08 02:30:00' as ts"
        )
        st = SearchTable.from_typed(df, {"id": "keyword"}, ts_col="ts", rid_col="id")
        got = {r["id"]: r["m"] for r in
               st.df.select("id", F.unix_millis("ts").alias("m")).collect()}
        assert got[1] == int(
            dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000
        )
        assert got[2] == int(
            dt.datetime(2026, 3, 8, 2, 30, tzinfo=dt.timezone.utc).timestamp() * 1000
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
