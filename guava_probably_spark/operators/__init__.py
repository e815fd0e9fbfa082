from .build import (  # noqa: F401
    PARTIAL_SCHEMA,
    build_grouped,
    build_partials,
    collect_sketch,
    tree_merge,
)
from .semijoin import sketch_prune, sketch_semijoin  # noqa: F401
