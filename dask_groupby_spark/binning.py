"""Interval binning of group labels (the reference's ``isbin=True`` /
``pd.IntervalIndex`` expected_groups; ref: flox/core.py:803-823 ``np.digitize``
path and flox/core.py:2098-2099).

Semantics mirrored exactly:

- ``closed="right"`` (pd.cut / pd.IntervalIndex default): value ∈ (e[i], e[i+1]]
  → bin i.  ``closed="left"``: [e[i], e[i+1]).
- out-of-bounds and missing label values → no bin (code −1 in the reference,
  flox/core.py:819) → the row is EXCLUDED from results.
- every bin is part of the output domain (empty bins appear with fill_value —
  ref test: flox/tests/test_core.py:1191 ``test_empty_bins``).

Implementation: a flat CASE expression (whole-stage-codegen friendly; the bin
count is planner-side small).  At 100 TB the CASE is evaluated map-side before
the shuffle, so binning adds no extra stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Bins:
    """Bin edges for one grouper, like a ``pd.IntervalIndex`` from edges."""

    edges: tuple
    closed: str = "right"  # "right" → (a, b]; "left" → [a, b)

    def __init__(self, edges: Sequence, closed: str = "right"):
        if closed not in ("right", "left"):
            raise ValueError("closed must be 'right' or 'left'")
        if len(edges) < 2:
            raise ValueError("need at least 2 bin edges")
        object.__setattr__(self, "edges", tuple(edges))
        object.__setattr__(self, "closed", closed)

    @property
    def nbins(self) -> int:
        return len(self.edges) - 1

    def bucket(self, col: Column) -> Column:
        """Map a label column to its 0-based bin index (NULL = out of bounds)."""
        e = self.edges
        expr = F.lit(None).cast("int")
        # build CASE from last bin to first so earlier bins take precedence
        for i in range(self.nbins - 1, -1, -1):
            lo, hi = F.lit(e[i]), F.lit(e[i + 1])
            if self.closed == "right":
                cond = (col > lo) & (col <= hi)
            else:
                cond = (col >= lo) & (col < hi)
            expr = F.when(cond, F.lit(i)).otherwise(expr)
        return expr

    def labels(self) -> list[str]:
        """Human-readable interval labels, pandas-style."""
        out = []
        for i in range(self.nbins):
            lo, hi = self.edges[i], self.edges[i + 1]
            out.append(f"({lo}, {hi}]" if self.closed == "right" else f"[{lo}, {hi})")
        return out

    def expected_codes(self) -> list[int]:
        return list(range(self.nbins))

    def label_expr(self, code: Column) -> Column:
        """Map a 0-based bin-code column to its pandas-style interval label
        (``"(10.0, 20.0]"``) — the output-coordinate form the reference's
        xarray front-end attaches to binned groupers (pd.IntervalIndex
        coords, flox/xarray.py:370-378).  A flat CASE like :meth:`bucket`:
        planner-side small, codegen-friendly, map-side."""
        labels = self.labels()
        expr = F.lit(None).cast("string")
        for i in range(self.nbins - 1, -1, -1):
            expr = F.when(code == F.lit(i), F.lit(labels[i])).otherwise(expr)
        return expr
