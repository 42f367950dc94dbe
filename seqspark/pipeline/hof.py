"""Expression-level let-binding for higher-order functions.

Catalyst does NOT share outer subexpressions referenced inside a
higher-order-function lambda: every element iteration re-evaluates the
outer expression. ``F.transform(idx, lambda i: F.slice(words_expr, i, k))``
re-runs ``words_expr`` (a split + filter over the whole text) once PER
POSITION — O(n²) per row where O(n) was intended. Measured: shingling a
40k-word document took minutes; let-bound it is milliseconds.

``let(value, body)`` evaluates ``value`` once per row and passes it to
``body`` as a bound lambda variable (lambda variables hold already-
evaluated values), by wrapping it in a one-element array transform:

    let(words_expr, lambda ws: F.transform(idx, lambda i: F.slice(ws, i, k)))

Use it whenever a lambda body references a non-trivial outer expression;
plain column references (``F.col``) are already O(1) and need no binding.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` once per row; ``body`` receives it as a lambda var."""
    return F.element_at(F.transform(F.array(value), body), 1)
