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
