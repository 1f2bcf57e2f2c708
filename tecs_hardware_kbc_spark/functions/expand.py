"""Implicit-span expansion kernels (pure string logic, Arrow-batched on Spark).

Semantics match the reference's mention "spaces" (see
``hack/transistors/transistor_spaces.py:12-144, 229-327`` and
``hack/opamps/opamp_spaces.py:10-60`` in lukehsiao/tecs-hardware-kbc):

* ``expand_part_range`` — a part span like ``"BC546 thru BC548"`` or
  ``"123X/Y/Z"`` implies a *set* of part numbers; we enumerate numeric and
  single-letter ranges (via difflib 'replace' opcodes), split single slashes
  of equal halves, and swap same-length suffixes onto the base.
* ``normalize_temp_span`` — ``"- 55" -> "-55"``, ``"+ 150" -> None`` (the
  unigram ``150`` is already in the ngram space, so the bigram is dropped),
  ``"150" -> "150"``.
* ``normalize_volt_span`` — ``"40.0" -> "40"``.
* ``normalize_current_span`` — ``"± 2 . 3" -> "±2.3"``.

These are the only kernels in the mention layer that need Python; on Spark
they run as scalar pandas UDFs returning arrays that are ``explode``-d
(UDTF shape), never per-row Python UDFs.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

# "X to Y" / "X ~ Y" / "X -- Y" / unicode dashes — a span that looks like a range.
_RANGE_RE = re.compile(
    r"^(?P<lo>[\w/]+)(?:\s*(\.{3,}|~|-+|to|thru|through"
    r"|‑+|‒+|–+|—+|−+)\s*)(?P<hi>[\w/]+)$",
    re.IGNORECASE | re.UNICODE,
)
# comma/slash separated suffix lists: "123X, Y, Z" / "123X/Y/Z"
_SUFFIX_RE = re.compile(r"(?:,|/)\s*(?P<suffix>[\w\-]+)")
_BASE_RE = re.compile(r"(?P<base>[\w\-]+)(?:,|/)\s*(?P<suffix>[\w\-]+)?")


def _try_int(s: str) -> int | None:
    try:
        return int(s)
    except (TypeError, ValueError):
        return None


def _single_replace_diff(lo: str, hi: str) -> tuple[str, str]:
    """The (lo_fragment, hi_fragment) of the last 'replace' opcode between the
    two endpoint strings; empty strings when an insert/delete breaks the walk.
    """
    lo_diff = hi_diff = ""
    for op, a0, a1, b0, b1 in SequenceMatcher(None, lo, hi).get_opcodes():
        if op == "equal":
            continue
        if op in ("insert", "delete"):
            break
        lo_diff, hi_diff = lo[a0:a1], hi[b0:b1]
    return lo_diff, hi_diff


def _enumerate_range(text: str) -> set[str]:
    """Step 1: expand 'X to Y'-style ranges (or slash halves) of one span."""
    m = _RANGE_RE.search(text)
    if not m:
        out = {text}
        # single slash with equal-length halves implies both halves:
        # "BC337-16/BC338-16" -> {BC337-16, BC338-16, original}
        if text.count("/") == 1:
            left, right = text.split("/")
            if len(left) == len(right):
                out.update((left, right))
        return out

    lo, hi = m.group("lo"), m.group("hi")
    lo_diff, hi_diff = _single_replace_diff(lo, hi)
    expanded: set[str] = set()

    lo_n, hi_n = _try_int(lo_diff), _try_int(hi_diff)
    if lo_n is not None and hi_n is not None and lo_n and hi_n:
        for n in range(lo_n, hi_n + 1):
            expanded.add(lo.replace(lo_diff, str(n)))
    if len(lo_diff) == 1 and len(hi_diff) == 1 and lo_diff.isalpha() and hi_diff.isalpha():
        for code in range(ord(lo_diff), ord(hi_diff) + 1):
            expanded.add(lo.replace(lo_diff, chr(code)))
    return expanded or {text}


def _swap_suffixes(part: str, out: set[str]) -> None:
    """Step 2: 'BC546A/B' -> base BC546A plus BC546B (same-length suffix swap)."""
    first = _BASE_RE.search(part)
    if not first:
        if part and not part.isspace():
            out.add(part)
        return
    base = first.group("base")
    out.add(base)
    if not first.group("suffix"):
        return
    suffix_lens = {len(m.group("suffix")) for m in _SUFFIX_RE.finditer(part)}
    if len(suffix_lens) != 1:
        return
    for m in _SUFFIX_RE.finditer(part):
        suffix = m.group("suffix")
        old = base[-len(suffix):]
        if (suffix.isalpha() and old.isalpha()) or (suffix.isdigit() and old.isdigit()):
            out.add(base[: -len(suffix)] + suffix)


def expand_part_range(text: str) -> list[str]:
    """All part numbers implied by ``text`` (always includes ``text`` itself).

    Deterministic: results are sorted (the reference yields in set order and
    then sorts downstream; we sort here so Spark plans are value-stable).
    """
    final: set[str] = set()
    for part in _enumerate_range(text):
        _swap_suffixes(part, final)
    final.add(text)
    return sorted(final)


_TEMP_RE = re.compile(
    r"^([+\-‐‑‒–—−])?(\s*)(\d+)$", re.UNICODE
)


def normalize_temp_span(span: str) -> str | None:
    """Canonical signed integer for a temperature span; None drops the span.

    ``"- 55" -> "-55"`` (any unicode minus), ``"+ 150" -> None`` (keep only the
    unigram form), ``"+150" -> "150"``, ``"150" -> "150"``; non-matches pass
    through unchanged.
    """
    m = _TEMP_RE.match(span)
    if not m:
        return span
    sign, gap, digits = m.group(1), m.group(2), m.group(3)
    if sign is None:
        return digits
    if sign == "+":
        return None if gap else digits
    return "-" + digits


def normalize_volt_span(span: str) -> str:
    """``"40.0" -> "40"``; everything else unchanged."""
    return span[:-2] if span.endswith(".0") else span


_CURRENT_RE = re.compile(r"^(±)?\s*(\d+)\s*(\.)?\s*(\d*)$")


def normalize_current_span(span: str) -> str:
    """Strip stray internal spaces: ``"± 2 . 3" -> "±2.3"``; else unchanged."""
    m = _CURRENT_RE.match(span)
    if not m:
        return span
    return "".join(g for g in m.groups() if g)
