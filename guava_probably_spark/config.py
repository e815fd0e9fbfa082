"""Deploy-time knobs (module-level, picklable-safe: read at call time).

PIN_INTERMEDIATES — default for the ``materialize`` parameter of operators
that eagerly ``localCheckpoint`` a BOUNDED intermediate referenced on
multiple plan branches (``pipeline.dedup.exact_jaccard_pairs`` /
``neardup_pairs_minhash``, ``operators.overlap.source_overlap_matrix``).
Spark does not reuse exchanges across MapInArrow/aggregation subtrees, so
without the pin each branch re-derives the corpus-scale upstream (measured
2–4× on the 400k-doc bench corpus).

The trade: a localCheckpoint truncates lineage — losing an executor that
holds checkpoint blocks FAILS the job instead of recomputing it — and the
pinning job runs eagerly at plan-construction time. On dedicated executors
(the common batch-curation deployment) the speedup is free; on PREEMPTIBLE
/ spot executors set ``PIN_INTERMEDIATES = False`` once at startup (or via
the ``GPS_PIN_INTERMEDIATES=0`` environment variable) to restore fully
lazy, lineage-recoverable plans at the multi-derivation cost. Per-call
``materialize=`` arguments still win over the module default.
"""

from __future__ import annotations

import os

PIN_INTERMEDIATES: bool = os.environ.get("GPS_PIN_INTERMEDIATES", "1") not in (
    "0",
    "false",
    "False",
)


def pin_default(materialize: bool | None) -> bool:
    """Resolve a tri-state ``materialize`` argument against the module
    default (``None`` → ``PIN_INTERMEDIATES``)."""
    return PIN_INTERMEDIATES if materialize is None else bool(materialize)
