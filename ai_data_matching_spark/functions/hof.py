"""Expression-level let-binding for native higher-order functions.

Interpreted lambda HOFs (everything built from ``F.transform`` /
``F.filter`` / ``F.aggregate`` — they run outside whole-stage codegen)
re-evaluate any non-lambda subtree referenced inside a lambda body once
PER OUTER ELEMENT, and ``CollapseProject`` undoes the obvious
two-Project workaround by inlining the alias back into the lambda. The
result is silent asymptotic blow-up: a quadratic occurrence count over
an inline array becomes cubic, a per-index slice re-tokenizes the whole
document per position (measured at ~100× wall on real inputs — see
BENCH/BASELINE.md round 4).

``let_bound`` makes the binding part of the expression itself: the value
is wrapped in a single-element array and passed through one
``transform``, whose lambda variable is a bound VALUE — references to it
are O(1) lookups, and no optimizer rule can inline through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bound(value: Column, body) -> Column:
    """Evaluate ``value`` once per row and hand the bound result to
    ``body`` (a ``Column -> Column`` callable) as a lambda variable."""
    return F.element_at(F.transform(F.array(value), body), 1)
