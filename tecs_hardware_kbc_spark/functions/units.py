"""Unit-carrying quantity normalization (the engine's `quantiphy` stand-in).

The reference normalizes values like ``"1.1 MHz"`` via ``Quantity``
(``hack/opamps/opamp_utils.py:95-98, 162``) and doubles ``±`` currents
(``opamp_utils.py:78-83, 197-207``: a typ current of ``±15 mA`` implies a
total supply swing of ``30 mA`` *and* the literal ``15 mA``). We implement
the same with a plain multiplier map so it can run as a Spark column
expression (``MapType`` lookup), no Python in the hot path.
"""

from __future__ import annotations

import re

# SI multipliers for the unit families the pipeline emits (Hz, A, V, C).
UNIT_MULTIPLIERS: dict[str, float] = {
    "ghz": 1e9,
    "mhz": 1e6,
    "khz": 1e3,
    "hz": 1.0,
    "a": 1.0,
    "ma": 1e-3,
    "ua": 1e-6,
    "µa": 1e-6,
    "μa": 1e-6,
    "a": 1e-6,  # symbol-font mu seen in datasheet PDFs
    "na": 1e-9,
    "v": 1.0,
    "mv": 1e-3,
    "kv": 1e3,
    "c": 1.0,
    "°c": 1.0,
}

_QTY_RE = re.compile(r"^(?P<pm>±)?\s*(?P<mag>-?\d+(?:\.\d+)?)\s*(?P<unit>[^\s\d]+)?$")


def normalize_quantity(span: str, default_unit: str | None = None) -> list[float]:
    """Magnitudes (base SI units) implied by a value span.

    ``"1.1 MHz" -> [1.1e6]``; ``"±15 mA" -> [0.03, 0.015]`` (doubled total
    first, then the literal — matching the reference's ± handling); unknown
    units fall back to the bare magnitude.
    """
    m = _QTY_RE.match(span.strip())
    if not m:
        return []
    mag = float(m.group("mag"))
    unit = (m.group("unit") or default_unit or "").lower()
    mult = UNIT_MULTIPLIERS.get(unit, 1.0)
    value = mag * mult
    if m.group("pm"):
        return [2.0 * value, value]
    return [value]


def format_magnitude(value: float, unit: str) -> str:
    """Render a base-SI magnitude in a target display unit (e.g. kHz, µA),
    mirroring the reference's output rescale at ``hack/opamps/opamps.py:47-49``."""
    mult = UNIT_MULTIPLIERS.get(unit.lower(), 1.0)
    scaled = value / mult
    if scaled == int(scaled):
        return f"{int(scaled)} {unit}"
    return f"{scaled:g} {unit}"
