"""ES runtime fields / script_fields — the painless-lite subset.

ES lets a search request define computed fields without reindexing:

    "runtime_mappings": {
        "price_with_tax": {
            "type": "double",
            "script": {"source": "emit(doc['price'].value * 1.19)"}
        }
    }

The reference connector passes such requests through to ES; here the same
JSON compiles to ``withColumn`` expressions, so runtime fields stay inside
whole-stage codegen and are visible to every downstream operator (filters
on them prune like any derived column).

Supported script subset (the same discipline as aggs_dsl's
bucket_script): a single ``emit(<expr>)`` whose body is arithmetic /
comparison / boolean logic plus a small whitelist of functions
(``Math.abs/min/max/floor/ceil/round/sqrt/pow/log``, string
``.length()``, ternary ``cond ? a : b``) over ``doc['field'].value``
references and literals.  Anything else raises — no silent approximation
of painless semantics.  Emitted types follow the declared ``type`` per
the SURVEY.md §1.2 table (keyword/long/double/boolean/date).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOC_REF = re.compile(r"doc\[(['\"])([A-Za-z0-9_.]+)\1\]\.value")
# Unsuffixed decimal literals: painless (and ES|QL) treat `1024.0` as a
# DOUBLE, but Spark SQL parses it as DECIMAL(5,1) — so `n / 1024.0` plans
# as decimal(28,6) and every downstream value diverges from engine
# semantics (Decimal('0.406000') vs 0.406).  Rewrite to Spark's explicit
# double form `1024.0D`.  Exponent forms (1.5e3) are already double in
# Spark and the trailing `e` blocks the match; already-suffixed literals
# (1.5D / 1.5f) are blocked by the \w lookahead.
_FLOAT_LIT = re.compile(r"(?<![\w.])(\d+\.\d+)(?![\w.])")
_STR_SEG = re.compile(r"('[^'\\]*')")


def double_literals(text: str) -> str:
    """Suffix every unsuffixed decimal literal with ``D`` so it plans as
    DOUBLE (painless/ES|QL float-literal semantics), skipping any text
    inside single-quoted string literals."""
    return "".join(
        p if p.startswith("'") else _FLOAT_LIT.sub(r"\1D", p)
        for p in _STR_SEG.split(text)
    )
_EMIT = re.compile(r"^\s*emit\s*\((.*)\)\s*;?\s*$", flags=re.S)
# after doc-ref + function-name substitution the residue must be pure
# expression characters (no quotes/semicolons/backticks/brackets)
_EXPR_OK = re.compile(r"^[\w\s.+\-*/()%,<>=!&|?:]+$")

_FUNCS = {
    "Math.abs": "abs",
    "Math.min": "least",
    "Math.max": "greatest",
    "Math.floor": "floor",
    "Math.ceil": "ceil",
    "Math.round": "round",
    "Math.sqrt": "sqrt",
    "Math.cbrt": "cbrt",
    "Math.pow": "power",
    "Math.log10": "log10",
    "Math.log": "ln",
    "Math.exp": "exp",
    "Math.signum": "signum",
}

_ALLOWED_TOKENS = {
    *[v.lower() for v in _FUNCS.values()],
    "length", "if", "and", "or", "not", "true", "false",
    # String-method rewrites (_rewrite_string_methods)
    "contains", "startswith", "endswith", "lower", "upper", "trim",
    "substr", "instr",
}

# painless String methods -> Spark SQL.  The receiver must be a
# backticked column ref or an already-rewritten function call (paren
# nesting tolerated to depth 4 so chains like
# `s`.trim().toLowerCase().substring(1).contains(...) resolve
# innermost-out across rewrite passes).
_NESTED_ARGS = r"[^()]*"
for _ in range(4):
    _NESTED_ARGS = rf"(?:[^()]|\({_NESTED_ARGS}\))*"
_STR_METHOD_RECEIVER = rf"((?:`[A-Za-z0-9_.]+`)|(?:\w+\({_NESTED_ARGS}\)))"
# top-level comma: not inside a single-quoted string
_ARG_COMMA = re.compile(r",(?=(?:[^']*'[^']*')*[^']*$)")


def _rewrite_string_methods(body: str) -> str:
    """Rewrite painless ``expr.method(args)`` String calls to their Spark
    SQL function forms.  Index-taking methods translate painless 0-based
    positions to SQL 1-based exactly (substring begin -> +1; indexOf's
    missing -> instr 0 - 1 = painless -1).

    Documented divergence: ``substring(begin, end)`` with ``end < begin``
    THROWS in painless (StringIndexOutOfBoundsException) but compiles here
    to ``substr(recv, begin+1, end-begin)`` whose negative length yields
    ``''`` — i.e. the malformed range is silently clamped to empty rather
    than failing the document.  Data-dependent per-row raising has no
    clean Column form; empty-string is the defined behavior."""

    def sub_one(m: re.Match) -> str:
        recv, meth, args = m.group(1), m.group(2), m.group(3).strip()
        parts = [a.strip() for a in _ARG_COMMA.split(args)] if args else []
        if meth in ("contains", "startsWith", "endsWith"):
            if len(parts) != 1:
                raise RuntimeFieldError(f".{meth} takes one argument: {args!r}")
            fn = {"contains": "contains", "startsWith": "startswith",
                  "endsWith": "endswith"}[meth]
            return f"{fn}({recv}, {parts[0]})"
        if meth in ("toLowerCase", "toUpperCase", "trim", "length"):
            if parts:
                raise RuntimeFieldError(f".{meth} takes no arguments: {args!r}")
            fn = {"toLowerCase": "lower", "toUpperCase": "upper",
                  "trim": "trim", "length": "length"}[meth]
            return f"{fn}({recv})"
        if meth == "substring":
            if len(parts) == 1:
                return f"substr({recv}, ({parts[0]}) + 1)"
            if len(parts) == 2:
                return f"substr({recv}, ({parts[0]}) + 1, ({parts[1]}) - ({parts[0]}))"
            raise RuntimeFieldError(f".substring takes 1-2 arguments: {args!r}")
        if meth == "indexOf":
            if len(parts) != 1:
                raise RuntimeFieldError(f".indexOf takes one argument: {args!r}")
            return f"(instr({recv}, {parts[0]}) - 1)"
        raise AssertionError(meth)

    pat = re.compile(
        _STR_METHOD_RECEIVER
        + r"\s*\.\s*(contains|startsWith|endsWith|toLowerCase|toUpperCase|"
        + r"trim|substring|indexOf|length)\s*\(([^()]*)\)"
    )
    # ONE substitution per pass: a single pass's scanner would continue
    # PAST the first rewrite and misread a later still-painless method
    # (`.toLowerCase()`) as an already-SQL receiver.  Loop to fixed point;
    # 16 rewrites per script is far beyond any sane chain.
    for _ in range(16):
        new = pat.sub(sub_one, body, count=1)
        if new == body:
            return new
        body = new
    return body

_TYPES = {
    "keyword": "string",
    "text": "string",
    "long": "bigint",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "timestamp",
}


class RuntimeFieldError(ValueError):
    pass


def compile_script(script: str | dict) -> Column:
    """One painless-lite ``emit(expr)`` -> a Column expression."""
    if isinstance(script, dict):
        script = script.get("source", "")
    m = _EMIT.match(str(script))
    if not m:
        raise RuntimeFieldError(f"script must be a single emit(...): {script!r}")
    body = m.group(1)
    # doc['field'].value -> backticked column reference (BEFORE literal
    # masking: the doc-ref quotes are syntax, not string data)
    body = _DOC_REF.sub(lambda mm: f"`{mm.group(2)}`", body)
    # MASK the remaining string literals before anything else: every
    # rewrite below (boolean operators, Math names, ternary split,
    # method-argument grammar) is textual and would otherwise corrupt or
    # misparse quoted content ('a&&b', 'key:value', '(paren)',
    # 'Math.log') — review r7 finding.  The placeholder keeps its quotes
    # (so quote-aware splitters still see a string) with digits-only
    # content no rewrite can touch.
    lits: list[str] = []

    def _mask(mm: re.Match) -> str:
        lits.append(mm.group(0))
        return f"'\x00{len(lits) - 1}'"

    body = re.sub(r"'[^'\\]*'", _mask, body)
    # .length() on a (column) expression -> length(expr): painless string len
    body = re.sub(r"`([A-Za-z0-9_.]+)`\s*\.\s*length\s*\(\s*\)", r"length(`\1`)", body)
    body = _rewrite_string_methods(body)
    for painless, sql in _FUNCS.items():
        body = body.replace(painless, sql)
    # any method call still in dotted form is one the rewriters could not
    # resolve (unknown method, or arguments too nested for the receiver
    # grammar) — raise the module's typed error instead of letting it
    # leak into F.expr as a phantom routine
    residual_methods = re.search(r"\.\s*[A-Za-z_]\w*\s*\(", body)
    if residual_methods:
        raise RuntimeFieldError(
            f"unsupported or unresolvable method call at "
            f"{residual_methods.group(0)!r} in script: {script!r}"
        )
    # painless boolean operators: Spark SQL parses || as STRING CONCAT and
    # rejects && outright — rewrite to AND/OR (literals are masked)
    body = body.replace("&&", " AND ").replace("||", " OR ")
    # ternary cond ? a : b -> if(cond, a, b).  Only a WHOLE-body ternary is
    # supported: an embedded one would be blindly mangled into invalid SQL,
    # so unbalanced parentheses in any of the three parts reject up front.
    tern = re.split(r"\?|:", body)
    if len(tern) == 3:
        if any(p.count("(") != p.count(")") for p in tern):
            raise RuntimeFieldError(
                f"ternary must be the whole expression (wrap-free): {script!r}"
            )
        body = f"if({tern[0]}, {tern[1]}, {tern[2]})"
    elif len(tern) != 1:
        raise RuntimeFieldError(f"only a single non-nested ternary is supported: {script!r}")
    residue = re.sub(r"'\x00\d+'", "0", re.sub(r"`[A-Za-z0-9_.]+`", "", body))
    # an EMPTY residue is legal: emit(doc['f'].value) — the identity
    # runtime field — leaves nothing once the doc ref is stripped
    if residue and not _EXPR_OK.match(residue):
        raise RuntimeFieldError(f"unsupported script syntax: {script!r}")
    # every bare identifier left must be a whitelisted function/keyword —
    # anything else (params.*, object construction, method calls) rejects
    # rather than leaking into F.expr as a phantom column reference
    stray = [
        t
        for t in re.findall(r"[A-Za-z_][A-Za-z0-9_.]*", residue)
        if t.lower() not in _ALLOWED_TOKENS
    ]
    if stray:
        raise RuntimeFieldError(f"unsupported identifiers {stray} in script: {script!r}")
    # double_literals BEFORE unmasking (no literal content in sight),
    # token whitelist above for the same reason (the D suffix would read
    # as a stray identifier): painless float literals are doubles
    body = double_literals(body)
    return F.expr(re.sub(r"'\x00(\d+)'", lambda mm: lits[int(mm.group(1))], body))


def apply_runtime_mappings(df: DataFrame, mappings: dict) -> DataFrame:
    """Attach every runtime field in an ES ``runtime_mappings`` body.
    Fields may reference previously-declared runtime fields (ES allows
    this) — declaration order wins."""
    out = df
    for name, spec in mappings.items():
        if not isinstance(spec, dict) or "type" not in spec:
            raise RuntimeFieldError(f"runtime field {name!r} needs a type")
        t = _TYPES.get(spec["type"])
        if t is None:
            raise RuntimeFieldError(f"unsupported runtime field type {spec['type']!r}")
        col = compile_script(spec.get("script", "")).cast(t)
        out = out.withColumn(name, col)
    return out
