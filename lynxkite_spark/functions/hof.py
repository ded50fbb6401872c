"""Higher-order-function helpers shared by the text operators.

Spark HOFs (``transform``/``aggregate``/``filter``) are CodegenFallback:
they evaluate interpreted, with no common-subexpression elimination. An
array subtree referenced inside a per-element lambda is therefore
re-evaluated for EVERY element — a tokenizer used this way turns a
linear pass into O(elements x tokenizer) per row. ``let_array`` is the
let-binding that fixes it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_array(expr: Column, body) -> Column:
    """Evaluate array expression ``expr`` ONCE per row and apply ``body``
    (bound array -> array column) to it.

    Implementation: the array is wrapped as the single element of an
    outer ``transform``, which makes it a lambda VARIABLE inside
    ``body`` — an O(1) slot read per reference instead of a subtree
    re-evaluation per element. ``body`` must return an array (the
    single-element result is flattened back out).
    """
    return F.flatten(F.transform(F.array(expr), body))
