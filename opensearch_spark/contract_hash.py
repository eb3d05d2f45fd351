"""Driver-hash-parity value serialization — the ONE definition shared by
the in-repo contract test (tests/test_entry_contract.py) and the hostile
window audit (scripts/window_audit.py), so the two checks can never
drift apart.

The driver's correctness gate hashes serialized values, not Python
equality: r4 proved a DuckDB HUGEINT column hash-mismatches a Spark
bigint even when every value compares equal (3 == 3.0, int128 == int64
conflation). ``serialize`` therefore tags each value with its runtime
type so int and float representations of the same magnitude serialize
differently, while canonicalizing representations the engines may
legitimately disagree on (signed zero: ``-0.0 + 0.0`` is ``+0.0`` under
IEEE round-to-nearest, so both zeros serialize as ``f:0.0``).
"""

from __future__ import annotations

import decimal


def serialize(v) -> str:
    """Canonical per-value serialization, split by runtime type."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        return f"f:{round(v, 9) + 0.0!r}"
    if isinstance(v, decimal.Decimal):  # banned at the type layer; loud here
        return f"dec:{v}"
    return f"s:{v}"


def as_multiset(cols, rows):
    """Order-insensitive comparison form: columns sorted by name (the
    driver sorts columns before hashing), rows as a sorted multiset of
    serialized tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(serialize(r[i]) for i in order) for r in rows)
