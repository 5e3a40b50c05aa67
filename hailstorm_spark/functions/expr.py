"""Expression combinators for once-per-row evaluation.

Spark has no per-row common-subexpression elimination across the
arguments of higher-order functions: composing column expressions in
Python inlines the full sub-expression at every reference site, so

    F.array(*[F.array_min(F.transform(shingles_expr, h(j))) for j in range(16)])

evaluates ``shingles_expr`` 16 times per row — and if ``shingles_expr``
itself references a tokenization expression per element, the blowup is
multiplicative (measured: ~60 ms/row for a 16-hash MinHash signature
over ~50 tokens, vs ~0.2 ms/row with binding).

``let_`` provides the missing let-binding: it evaluates ``value`` once
per row by placing it in a single-element array and handing the lambda
variable to ``body``. Lambda-variable references are O(1) reads, never
re-evaluations, so ``body`` may reference it freely. The overhead is
one 1-element array allocation per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; ``body`` receives it as a
    lambda variable it can reference any number of times for free."""
    return F.element_at(F.transform(F.array(value), body), 1)
