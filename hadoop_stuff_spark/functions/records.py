"""Parsers for the reference's two record formats (SURVEY.md §1.2,
FIXTURES.md §1.1-1.2) — the latent schemas the reference never declared
(records were opaque strings walked by regex; RecordCount.java:42,
DistributedGrep.java:55). Here they are real StructTypes produced by
one-pass regex/CSV extraction, fully Catalyst-side.

Flow/syslog record (template IngestTest.java:105):
  <24> 2012-06-13T00:25:02 {CGN-SET2}[OLEG ZHURAKOUSKY]: ASP_SFW_DELETE_FLOW:
  proto 7 (TELNET) application: test6, ge-12/0/0.0:156.56.0.124:19972 ->
  156.56.0.125:19973, deleting forward or watch flow 2 ; source address and
  port translate to 156.56.0.126:19974

CDR record (HdfsReadWriteSample.java:112-113): ~34 comma-delimited fields,
timestamps as yyyyMMddHHmmss, empty fields legal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FLOW_PATTERN = (
    r"^<(\d+)> (\S+) \{([^}]*)\}\[([^\]]*)\]: ([^:]+): "
    r"proto (\d+) \(([^)]*)\) application: ([^,]*), "
    r"([^:]+):(\d+\.\d+\.\d+\.\d+):(\d+) -> (\d+\.\d+\.\d+\.\d+):(\d+), "
    r"(.*?) ; source address and port translate to (\d+\.\d+\.\d+\.\d+):(\d+)$"
)

FLOW_FIELDS = [
    ("pri", "int"),
    ("ts", "timestamp"),
    ("set_name", "string"),
    ("user", "string"),
    ("event", "string"),
    ("proto", "int"),
    ("proto_name", "string"),
    ("application", "string"),
    ("interface", "string"),
    ("src_ip", "string"),
    ("src_port", "int"),
    ("dst_ip", "string"),
    ("dst_port", "int"),
    ("message", "string"),
    ("nat_ip", "string"),
    ("nat_port", "int"),
]


def parse_flow_log(col: Column | str, keep_raw: bool = True) -> list[Column]:
    """Parse a raw flow-log line into its 16 typed columns (one regex,
    evaluated once per group by codegen). Non-matching lines yield nulls
    in every field (regexp_extract returns '' on no-match; cast → null),
    preserving the reference's grep-over-anything tolerance."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    if keep_raw:
        out.append(c.alias("raw"))
    for idx, (name, typ) in enumerate(FLOW_FIELDS, start=1):
        extracted = F.regexp_extract(c, FLOW_PATTERN, idx)
        nulled = F.when(extracted == "", None).otherwise(extracted)
        if typ == "timestamp":
            out.append(F.to_timestamp(nulled, "yyyy-MM-dd'T'HH:mm:ss").alias(name))
        elif typ == "int":
            out.append(nulled.cast("int").alias(name))
        else:
            out.append(nulled.alias(name))
    return out


def format_flow_log(
    pri: Column,
    ts: Column,
    set_name: Column,
    user: Column,
    event: Column,
    proto: Column,
    proto_name: Column,
    application: Column,
    interface: Column,
    src_ip: Column,
    src_port: Column,
    dst_ip: Column,
    dst_port: Column,
    message: Column,
    nat_ip: Column,
    nat_port: Column,
) -> Column:
    """Inverse of :func:`parse_flow_log` — renders the reference's exact
    line format (fixture generator for tests/oracles)."""
    return F.concat(
        F.lit("<"), pri.cast("string"), F.lit("> "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit(" {"), set_name, F.lit("}["), user, F.lit("]: "), event, F.lit(": proto "),
        proto.cast("string"), F.lit(" ("), proto_name, F.lit(") application: "),
        application, F.lit(", "), interface, F.lit(":"), src_ip, F.lit(":"),
        src_port.cast("string"), F.lit(" -> "), dst_ip, F.lit(":"), dst_port.cast("string"),
        F.lit(", "), message, F.lit(" ; source address and port translate to "),
        nat_ip, F.lit(":"), nat_port.cast("string"),
    )


# --- CDR ---------------------------------------------------------------

CDR_CORE_FIELDS = [
    ("record_type", "int"),
    ("phone", "string"),
    ("code", "int"),
    ("start_ts", "timestamp"),
    ("end_ts", "timestamp"),
    ("bill_ts_raw", "string"),  # 16-digit, malformed on purpose — keep raw
    ("leg_count", "int"),
    ("src_ip", "string"),
    ("dst_ip", "string"),
]


def parse_cdr(col: Column | str, n_extra: int = 25) -> list[Column]:
    """Parse the ~34-field comma-delimited CDR: 9 typed core fields +
    ``n_extra`` nullable int tail fields (f10..f34; empty fields legal).
    Split once; every field is an array index — one pass, codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ",", -1)

    def fld(i: int) -> Column:
        v = F.element_at(parts, i + 1)
        return F.when(v == "", None).otherwise(v)

    out = []
    for i, (name, typ) in enumerate(CDR_CORE_FIELDS):
        v = fld(i)
        if typ == "timestamp":
            out.append(F.to_timestamp(v, "yyyyMMddHHmmss").alias(name))
        elif typ == "int":
            out.append(v.cast("int").alias(name))
        else:
            out.append(v.alias(name))
    for j in range(n_extra):
        out.append(fld(len(CDR_CORE_FIELDS) + j).cast("int").alias(f"f{10 + j}"))
    return out
