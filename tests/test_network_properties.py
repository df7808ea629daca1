"""Property differentials for the network ingest processors: random
flows vs the Community ID v1 reference implementation, and random
addresses vs Python's ipaddress for CIDR membership."""

from __future__ import annotations

import base64
import hashlib
import ipaddress
import socket
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.ingest import (
    _cidr_match,
    _ipv4_num,
    compile_pipeline,
)


def _ref_community_id(seed, sip, dip, sport, dport, proto):
    s, d = socket.inet_aton(sip), socket.inet_aton(dip)
    if (s, struct.pack("!H", sport)) > (d, struct.pack("!H", dport)):
        s, d, sport, dport = d, s, dport, sport
    msg = (
        struct.pack("!H", seed) + s + d + struct.pack("BB", proto, 0)
        + struct.pack("!HH", sport, dport)
    )
    return "1:" + base64.b64encode(hashlib.sha1(msg).digest()).decode()


_octet = st.integers(min_value=0, max_value=255)
_ip = st.builds(lambda a, b, c, d: f"{a}.{b}.{c}.{d}", _octet, _octet, _octet, _octet)
_port = st.integers(min_value=0, max_value=65535)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    flows=st.lists(
        st.tuples(_ip, _ip, _port, _port,
                  st.sampled_from(["tcp", "udp", "icmp", "sctp"])),
        min_size=1, max_size=8,
    ),
    seed=st.integers(min_value=0, max_value=65535),
)
def test_community_id_matches_reference(spark, flows, seed):
    proto_num = {"icmp": 1, "tcp": 6, "udp": 17, "sctp": 132}
    df = spark.createDataFrame(
        [(i, *f) for i, f in enumerate(flows)],
        "i int, sip string, dip string, sport int, dport int, tr string",
    )
    pipe = compile_pipeline([
        {"community_id": {"source_ip": "sip", "destination_ip": "dip",
                          "source_port": "sport", "destination_port": "dport",
                          "transport": "tr", "seed": seed}},
    ])
    got = {r["i"]: r["community_id"] for r in pipe(df).collect()}
    for i, (sip, dip, sp, dp, tr) in enumerate(flows):
        want = _ref_community_id(seed, sip, dip, sp, dp, proto_num[tr])
        assert got[i] == want, (i, sip, dip, sp, dp, tr, seed)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    ips=st.lists(_ip, min_size=1, max_size=12),
    net=st.tuples(_ip, st.integers(min_value=0, max_value=32)),
)
def test_cidr_match_agrees_with_ipaddress(spark, ips, net):
    cidr = f"{net[0]}/{net[1]}"
    network = ipaddress.ip_network(cidr, strict=False)
    df = spark.createDataFrame([(i, ip) for i, ip in enumerate(ips)],
                               "i int, ip string")
    out = df.select(
        "i", _cidr_match(_ipv4_num(F.col("ip")), cidr).alias("m")
    ).collect()
    got = {r["i"]: r["m"] for r in out}
    for i, ip in enumerate(ips):
        assert got[i] == (ipaddress.ip_address(ip) in network), (ip, cidr)


def _ref_bytes(s: str):
    import re as _re

    m = _re.match(r"^(\d+(?:\.\d+)?)\s*([kKmMgGtTpP]?[bB])$", s.strip())
    if not m:
        return None
    unit = m.group(2).lower()
    factor = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3,
              "tb": 1024**4, "pb": 1024**5}[unit]
    import math

    total = float(m.group(1)) * factor
    if total >= 2**63:  # long overflow -> NULL, the failure value
        return None
    return math.floor(total)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    vals=st.lists(
        st.one_of(
            st.builds(
                lambda n, frac, sp, u: f"{n}{frac}{sp}{u}",
                st.integers(min_value=0, max_value=10**6),
                st.sampled_from(["", ".5", ".25", ".125"]),
                st.sampled_from(["", " ", "  "]),
                st.sampled_from(["b", "B", "kb", "KB", "Kb", "mb", "MB",
                                 "gb", "GB", "tb", "TB", "pb", "PB"]),
            ),
            st.sampled_from(["", "banana", "12", "kb", "1.2.3kb", "-5kb"]),
        ),
        min_size=1, max_size=10,
    ),
)
def test_bytes_processor_matches_reference(spark, vals):
    from elasticsearch_hadoop_spark.ingest import compile_pipeline

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, size string")
    pipe = compile_pipeline([{"bytes": {"field": "size",
                                        "target_field": "nbytes"}}])
    got = {r["i"]: r["nbytes"] for r in pipe(df).collect()}
    for i, v in enumerate(vals):
        assert got[i] == _ref_bytes(v), (v, got[i], _ref_bytes(v))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    vals=st.lists(
        st.one_of(
            _ip,
            st.sampled_from(["999.1.2.3", "1.2.3", "1.2.3.4.5", "",
                             "a.b.c.d", "01.2.3.4", "256.1.1.1"]),
        ),
        min_size=1, max_size=12,
    ),
)
def test_ipv4_num_matches_inet_aton(spark, vals):
    import socket
    import struct

    from elasticsearch_hadoop_spark.ingest import _ipv4_num

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, ip string")
    got = {r["i"]: r["n"]
           for r in df.select("i", _ipv4_num(F.col("ip")).alias("n")).collect()}
    for i, v in enumerate(vals):
        # reference: strict dotted-quad only (inet_aton is laxer — it
        # accepts short forms our column math rejects, so gate on shape)
        parts = v.split(".")
        strict = (
            len(parts) == 4
            and all(p.isdigit() and int(p) <= 255 for p in parts)
        )
        if strict:
            want = struct.unpack("!I", socket.inet_aton(v))[0]
            assert got[i] == want, (v, got[i], want)
        else:
            assert got[i] is None, (v, got[i])


_label = st.text(alphabet="abcdefghij", min_size=1, max_size=6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    hosts=st.lists(
        st.builds(
            lambda labels, tld2: ".".join(labels + ([tld2] if tld2 else [])),
            st.lists(_label, min_size=1, max_size=4),
            st.sampled_from(["co.uk", "com.au", "co.jp", "", "com", "de"]),
        ),
        min_size=1, max_size=10,
    ),
)
def test_registered_domain_matches_reference(spark, hosts):
    from elasticsearch_hadoop_spark.ingest import _TLD2, compile_pipeline

    def ref(host):
        labels = host.split(".")
        n = len(labels)
        tldn = 2 if n >= 3 and ".".join(labels[-2:]) in _TLD2 else 1
        tld = ".".join(labels[-tldn:])
        registered = ".".join(labels[-(tldn + 1):]) if n >= tldn + 1 else None
        sub = ".".join(labels[: n - tldn - 1]) if n > tldn + 1 else None
        return {"domain": host, "registered_domain": registered,
                "top_level_domain": tld, "subdomain": sub}

    df = spark.createDataFrame([(i, h) for i, h in enumerate(hosts)],
                               "i int, host string")
    pipe = compile_pipeline([
        {"registered_domain": {"field": "host", "target_field": "rd"}}])
    got = {r["i"]: r["rd"] for r in
           (x.asDict(recursive=True) for x in pipe(df).collect())}
    for i, h in enumerate(hosts):
        assert got[i] == ref(h), (h, got[i], ref(h))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="abc 0123456789.@-",
            min_size=0, max_size=40,
        ),
        min_size=1, max_size=10,
    ),
)
def test_redact_matches_python_re(spark, texts):
    import re as _re

    from elasticsearch_hadoop_spark.ingest import compile_pipeline

    ip_rx = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    num_rx = r"[+-]?\d+(?:\.\d+)?"

    def ref(t):
        t = _re.sub(ip_rx, "<ip>", t)
        return _re.sub(num_rx, "<n>", t)

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, msg string")
    pipe = compile_pipeline([
        {"redact": {"field": "msg",
                    "patterns": ["%{IP:ip}", "%{NUMBER:n}"]}}])
    got = {r["i"]: r["msg"] for r in pipe(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, got[i], ref(t))
