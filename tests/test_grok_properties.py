"""Property-based differential test of the GROK compiler (`esql._grok_regex`
applied through the ES|QL GROK command): hypothesis composes random
patterns from literal separators and %{CLASS:key[:type]} captures, builds
matching and non-matching inputs, and compares Spark's extraction (Java
regex, find semantics) against Python `re.search` over the identically
composed pattern.  Non-matching rows must yield NULL for every key
(round-5 fix) and typed keys must convert or null out, never crash."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_hadoop_spark.esql import _GROK_PATTERNS, esql

# value generators per grok class (values that the class's regex matches;
# ASCII alphabet — Java regex \d/\w are ASCII-only, unlike Python's
# Unicode default, and ES grok runs on Java regex)
_ASCII = st.characters(min_codepoint=32, max_codepoint=126)
_VALUES = {
    "WORD": st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,5}", fullmatch=True,
                          alphabet=_ASCII),
    "NOTSPACE": st.from_regex(r"[A-Za-z0-9._\-/:=]{1,6}", fullmatch=True,
                              alphabet=_ASCII),
    "NUMBER": st.from_regex(r"[+-]?\d{1,4}(?:\.\d{1,3})?", fullmatch=True,
                            alphabet=_ASCII),
    "INT": st.from_regex(r"[+-]?\d{1,5}", fullmatch=True, alphabet=_ASCII),
    "IP": st.from_regex(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
                        fullmatch=True, alphabet=_ASCII),
}
_SEP = st.sampled_from([" ", " - ", "=", ", ", " | ", "\t"])
_CLASSES = st.sampled_from(list(_VALUES))


@st.composite
def pattern_and_input(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    classes = [draw(_CLASSES) for _ in range(n)]
    seps = [draw(_SEP) for _ in range(n - 1)]
    keys = [f"k{i}" for i in range(n)]
    pattern = ""
    text = ""
    for i, cls in enumerate(classes):
        if i:
            pattern += seps[i - 1]
            text += seps[i - 1]
        pattern += f"%{{{cls}:{keys[i]}}}"
        text += draw(_VALUES[cls])
    return pattern, text, keys


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pi=pattern_and_input(), junk=st.sampled_from(["", "###", "no match here!"]))
def test_grok_matches_python_reference(spark, pi, junk):
    pattern, text, keys = pi
    df = spark.createDataFrame([(0, text), (1, junk)], "rid int, msg string")
    out = {
        r["rid"]: r
        for r in esql(
            f'FROM t | GROK msg "{pattern}" | KEEP rid, ' + ", ".join(keys),
            tables={"t": df},
        ).collect()
    }
    # the Python reference composes the SAME class regexes with escaped
    # literals — semantics must agree with Spark's Java-regex extraction
    rx = ""
    pos = 0
    for m in re.finditer(r"%\{(\w+):(\w+)\}", pattern):
        rx += re.escape(pattern[pos: m.start()]) + f"({_GROK_PATTERNS[m.group(1)]})"
        pos = m.end()
    rx += re.escape(pattern[pos:])
    for rid, s in ((0, text), (1, junk)):
        # re.ASCII mirrors Java's default \d/\w/\S (the engine's regex
        # runtime, and ES grok's) — Python's Unicode classes are wider
        pm = re.search(rx, s, flags=re.ASCII)
        for i, k in enumerate(keys):
            want = pm.group(i + 1) if pm else None
            assert out[rid][k] == want, (
                f"pattern={pattern!r} input={s!r} key={k}: "
                f"spark={out[rid][k]!r} python={want!r}"
            )
