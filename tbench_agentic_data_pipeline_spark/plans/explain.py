"""Plan inspection helpers (SURVEY.md §4).

A plan that is correct at sf0.01 but wrong-shaped at 100 TB is a bug the
result hash cannot catch, so the shape itself is asserted in tests:
filters pushed into the parquet scan, projections pruned, dimension joins
broadcast, exchange counts bounded. These helpers parse
``explain('formatted')`` output — the same thing a human reviews — and
give tests something to pin.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``explain('formatted')`` output as a string. Captured from the
    public ``DataFrame.explain`` (it only prints) instead of reaching
    into ``_jvm`` — r6: the package now uses NO private JVM APIs
    anywhere (guarded by ``tests/test_plans.py``), so every code path,
    including these diagnostics, works under Spark Connect."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning witness."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count: ``(N) Exchange`` operator entries in the formatted
    plan. BroadcastExchange and ReusedExchange print under their own names
    and are deliberately not counted — broadcasts move dim-sized data and
    reuse moves nothing."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)  # one explain round-trip, two substring tests
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# Array-producing expression heads for the token-array taint walk: a
# derived column stays in the hazard class only while it is still an
# ARRAY built over tokenized text (split / shingle constructions);
# scalars over those arrays (size, hashes, band keys) collapse the
# blow-up and leave the class.
_ARRAY_FNS = frozenset(
    "split array_distinct transform array filter slice concat sort_array "
    "array_sort array_union array_intersect array_except flatten "
    "array_remove array_compact shuffle reverse".split()
)


def _expr_before_as(text: str, as_pos: int) -> str:
    """The balanced expression immediately preceding an ``AS col#id``
    marker inside a bracketed projection list (backward scan stopping at
    an enclosing open bracket or a top-level comma)."""
    depth = 0
    i = as_pos - 1
    while i >= 0:
        c = text[i]
        if c in ")]":
            depth += 1
        elif c in "([":
            if depth == 0:
                break
            depth -= 1
        elif c == "," and depth == 0:
            break
        i -= 1
    return text[i + 1:as_pos].strip()


def _id_in(col_id: str, text: str) -> bool:
    """Boundary-safe column-id containment: ``w#45`` must not match
    inside ``w#455`` (trailing digit) or ``raw#45`` (leading word
    char)."""
    return re.search(rf"(?<!\w){re.escape(col_id)}(?!\d)", text) is not None


def _is_array_expr(expr: str) -> bool:
    """Does this projection expression produce an ARRAY? Head in the
    array-producing set, or a CASE/coalesce wrapper whose branches do
    (the ``shingles(guard_short=True)`` form renders as
    ``CASE WHEN size(...) THEN array_distinct(transform(...)) ELSE``) —
    detected by any array head appearing immediately after THEN/ELSE/
    coalesce(."""
    head = expr.split("(", 1)[0].strip()
    if head in _ARRAY_FNS:
        return True
    return bool(
        re.search(
            r"(?:THEN |ELSE |coalesce\()\s*(?:" + "|".join(_ARRAY_FNS) + r")\(",
            expr,
        )
    )


_EXTRACTOR_RE = re.compile(r"(?<!\w)(?:try_)?element_at\(")


def _mask_literal_extractions(expr: str) -> str:
    """Blank scalar extractions with LITERAL indices — ``element_at(arr,
    3)`` and ``arr#4[0]`` — before the taint walk looks for tainted-id
    references: a fixed number of extracted token SCALARS is not an
    array blow-up, and the ambiguous heads (concat/reverse are string
    functions too) otherwise false-taint scalar string projections that
    merely pick elements out of a tainted array (r10 ADVICE #3:
    ``concat(element_at(w#4, 1), element_at(w#4, 2)) AS s#9`` is a
    string, not a token array). Extractions whose index is NOT a
    literal (``element_at(w#4, x)`` under a transform lambda) are kept:
    that is exactly how shingle arrays are BUILT, and masking them
    would blind the detector to the unguarded inline-shingle form."""
    out: list[str] = []
    pos = 0
    while True:
        m = _EXTRACTOR_RE.search(expr, pos)
        if not m:
            out.append(expr[pos:])
            break
        j, depth = m.end(), 1
        while j < len(expr) and depth:
            if expr[j] == "(":
                depth += 1
            elif expr[j] == ")":
                depth -= 1
            j += 1
        inner = expr[m.end():j - 1]
        # backward scan for the last TOP-LEVEL comma → the index argument
        k, d = len(inner) - 1, 0
        while k >= 0:
            c = inner[k]
            if c in ")]":
                d += 1
            elif c in "([":
                d -= 1
            elif c == "," and d == 0:
                break
            k -= 1
        idx = inner[k + 1:].strip()
        out.append(expr[pos:m.start()])
        if not re.fullmatch(r"-?\d+", idx):
            out.append(expr[m.start():j])  # derived index: keep for taint
        pos = j
    masked = re.sub(r"(?<!\w)\w+#\d+\[\s*-?\d+\s*\]", "", "".join(out))
    # call-result indexing — `split(text#1,  , -1)[0]` (the rendering
    # CollapseProject produces when a once-used split is inlined and
    # GetArrayItem picks a literal element): mask the WHOLE call+index
    # span. Stripping only the [0] would leave a bare split(...) that
    # the seed check reads as a token array. Matches must be re-found
    # after every removal: a removed span can CONTAIN another match
    # (nested `split(split(t)[0])[1]`), whose offsets saved against the
    # pre-removal string would overrun the shrunken one.
    while True:
        removed = False
        # finditer yields left-to-right; reversed gives rightmost-first
        # without a per-restart sort
        for m in reversed(list(re.finditer(r"\)\[\s*-?\d+\s*\]", masked))):
            i, depth = m.start(), 0
            while i >= 0:
                if masked[i] == ")":
                    depth += 1
                elif masked[i] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                i -= 1
            if i < 0:
                continue  # unbalanced fragment: leave untouched (conservative)
            h = i
            while h > 0 and (masked[h - 1].isalnum() or masked[h - 1] in "_."):
                h -= 1
            masked = masked[:h] + masked[m.end():]
            removed = True
            break  # string changed: restart the search on the new string
        if not removed:
            return masked


def token_array_columns(plan: str) -> set[str]:
    """Column ids (``name#id``) holding token/shingle STRING-ARRAYS
    derived from a text column — the broadcast-underestimation hazard
    class (SCALING.md: in-memory token arrays run 30-60× the parquet
    bytes the size estimator sees; numeric arrays ≈1× and stay out).
    Seeds are array-valued projections computed over ``split(`` —
    whether the split is the whole expression, nested inline
    (``array_distinct(transform(split(...)...))``), or behind the
    guarded-shingles CASE — and taint then propagates through
    array-producing heads referencing a tainted id. Scalar consumers
    (size/hash/band keys/explode) collapse the blow-up and leave the
    class."""
    defs = []
    for m in re.finditer(r" AS (\w+#\d+)", plan):
        expr = _expr_before_as(plan, m.start())
        # literal-index element extraction is a scalar consumer: both the
        # seed check and propagation look at the masked form, so picking
        # two tokens out of an array does not drag a string column into
        # the hazard class (r10 ADVICE #3)
        defs.append((expr, _mask_literal_extractions(expr), m.group(1)))
    tainted = {
        col
        for expr, masked, col in defs
        if "split(" in masked
        and (expr.startswith("split(") or _is_array_expr(expr))
    }
    changed = True
    while changed:
        changed = False
        for expr, masked, col in defs:
            if col in tainted:
                continue
            if (
                _is_array_expr(expr)
                and any(_id_in(t, masked) for t in tainted)
            ) or _forwards_tainted(expr, masked, tainted):
                tainted.add(col)
                changed = True
    return tainted


def _split_top_args(s: str) -> list[str]:
    """Split a call's argument list on TOP-LEVEL commas only (nested
    calls/array indexes keep their own commas)."""
    args, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(s[start:i])
            start = i + 1
    args.append(s[start:])
    return [a.strip() for a in args]


def _forwards_tainted(expr: str, masked: str, tainted: set[str]) -> bool:
    """Value-PRESERVING projections that return a tainted array unchanged
    even though their head is not an array producer: an identity rename
    (``w#4 AS w#12`` — Spark inserts exactly these to align Union branch
    attribute ids), a ``coalesce(w#4, ...)`` null-default, a CASE branch
    that returns the array (``THEN w#4`` / ``ELSE w#4``), and an
    array-typed cast. Scalar consumers (``concat_ws(' ', w#4)``,
    ``size(w#4)``) deliberately stay out — only heads that pass the
    VALUE through count, else this would re-open the r10 precision fix."""
    e = expr.strip()
    m = re.fullmatch(r"(\w+#\d+)", e)
    if m:
        return m.group(1) in tainted
    head = e.split("(", 1)[0].strip()
    if head == "coalesce":
        # Only a TOP-LEVEL argument that itself passes the array value
        # through taints — judged per-argument on the masked form, not
        # by a substring scan of the whole expression, or scalar
        # consumers like coalesce(size(w#4), 0) would re-enter the
        # hazard class (r12 ADVICE)
        me = masked.strip()
        if not (me.startswith("coalesce(") and me.endswith(")")):
            return False
        return any(
            _forwards_tainted(a, a, tainted)
            for a in _split_top_args(me[len("coalesce("):-1])
        )
    if head == "cast":
        mc = re.match(r"cast\((\w+#\d+) as array<", e)
        return bool(mc) and mc.group(1) in tainted
    if e.startswith("CASE") or " CASE " in f" {e} ":
        return any(
            re.search(r"(?:THEN|ELSE)\s+" + re.escape(t) + r"(?!\w)", masked)
            for t in tainted
        )
    return False


def token_array_broadcasts(df: DataFrame) -> list[str]:
    """BroadcastExchanges whose build-side INPUT still carries a
    token-array column (``token_array_columns``) scanned from a
    documents-style text table — the plan-level form of the
    ``dedup._verify_join_sides`` hand audit: these are exactly the
    broadcasts whose size the planner underestimates by the token
    blow-up factor. Returns one ``Input [...]`` detail string per
    offending exchange (empty list = plan is clean)."""
    plan = formatted_plan(df)
    tainted = token_array_columns(plan)
    if not tainted:
        return []
    offenders = []
    for m in re.finditer(
        r"^\(\d+\) BroadcastExchange\n(.*?)(?=^\(\d+\) |\Z)", plan, re.M | re.S
    ):
        body = m.group(1)
        inp = re.search(r"Input \[\d+\]: \[([^\n]*)\]", body)
        cols = inp.group(1) if inp else ""
        if any(_id_in(t, cols) for t in tainted):
            offenders.append(cols)
    return offenders


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans (``[codegen id : N]`` markers in formatted
    mode) — fewer/wider is better for scalar pipelines."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
