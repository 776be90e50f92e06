"""Let-binding for Spark column expressions.

Catalyst does NOT common-subexpression-eliminate across higher-order
lambda bodies: an expensive expression (a regexp tokenizer, a norm
aggregate) referenced inside a ``transform``/``filter`` lambda is
re-evaluated once PER ARRAY ELEMENT — turning O(n) work into O(n^2)
per row. Found three times in this repo (LM pair explode, word_ngrams,
l2_normalize; each measured 2.5-4x or worse).

``let_bound(value, body)`` is the shared workaround: a transform over
a singleton array binds ``value`` to a lambda variable — evaluated
once per row — and ``body`` references that cheap variable instead of
the expensive expression. The alternative (projecting the value into a
real column first, as dedup._shingled does) is preferable when the
call site controls the DataFrame; ``let_bound`` is for pure
Column-to-Column helpers that cannot add a projection.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F


def let_bound(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; ``body`` receives it as a
    lambda variable."""
    return F.element_at(F.transform(F.array(value), body), 1)
