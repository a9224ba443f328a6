"""Canonical schemas for the engine (SURVEY.md §1.2).

The reference's data model (Storm tuples + the ``Metadata`` property bag,
``core/src/main/java/org/apache/stormcrawler/Metadata.java:35-44``) maps onto
native Spark SQL types — no custom types needed:

  url              STRING
  content          BINARY
  text             STRING
  metadata         MAP<STRING, ARRAY<STRING>>   (multi-valued, like Metadata)
  status           STRING in {DISCOVERED, FETCHED, FETCH_ERROR, REDIRECTION, ERROR}
  next_fetch_date  TIMESTAMP  (sentinel 2200-01-01 = "never",
                               external/sql/.../StatusUpdaterBolt.java:50)
  key              STRING     politeness partition key (host/domain/IP)
  bucket           INT        pmod(hash(key), n)  (sql/StatusUpdaterBolt.java:157-163)
"""

from __future__ import annotations

from pyspark.sql import types as T

# Status lifecycle enum (core/.../persistence/Status.java:19-34).
STATUS_DISCOVERED = "DISCOVERED"
STATUS_FETCHED = "FETCHED"
STATUS_FETCH_ERROR = "FETCH_ERROR"
STATUS_REDIRECTION = "REDIRECTION"
STATUS_ERROR = "ERROR"
ALL_STATUSES = [
    STATUS_DISCOVERED,
    STATUS_FETCHED,
    STATUS_FETCH_ERROR,
    STATUS_REDIRECTION,
    STATUS_ERROR,
]

# "never refetch" sentinel (external/sql/.../StatusUpdaterBolt.java:50 uses
# 3000-01-01; we use 2200-01-01 because pandas nanosecond timestamps cap at
# 2262-04-11 and the Arrow/pandas comparison path must round-trip it).
NEVER_FETCH_DATE = "2200-01-01 00:00:00"

# Metadata: Map<String, String[]> (Metadata.java:44).
METADATA_TYPE = T.MapType(T.StringType(), T.ArrayType(T.StringType()))

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("next_fetch_date", T.TimestampType(), True),
        T.StructField("metadata", METADATA_TYPE, True),
        T.StructField("key", T.StringType(), True),
        T.StructField("bucket", T.IntegerType(), True),
    ]
)

# Status-stream emission: (url, metadata, status)
# (core/.../bolt/StatusEmitterBolt.java:62-67).
STATUS_UPDATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("metadata", METADATA_TYPE, True),
    ]
)

# Fetcher default-stream output: (url, content, metadata)
# (core/.../bolt/FetcherBolt.java:911-915).
FETCHED_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("metadata", METADATA_TYPE, True),
    ]
)

# Parse output document (parse/ParseData.java:21-24): content+text+metadata.
PARSED_DOC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("metadata", METADATA_TYPE, True),
    ]
)

# Outlink (parse/Outlink.java:21-25): target + anchor + transferred metadata.
OUTLINK_SCHEMA = T.StructType(
    [
        T.StructField("target_url", T.StringType(), False),
        T.StructField("anchor", T.StringType(), True),
        T.StructField("metadata", METADATA_TYPE, True),
    ]
)

# ProtocolResponse (core/.../protocol/ProtocolResponse.java:80-88).
PROTOCOL_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType(), True),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("metadata", METADATA_TYPE, True),
    ]
)
