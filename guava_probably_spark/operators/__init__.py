from .build import (  # noqa: F401
    MULTI_SCHEMA,
    PARTIAL_SCHEMA,
    build_grouped,
    build_partials,
    build_partials_multi,
    collect_sketch,
    collect_sketches_multi,
    tree_merge,
)
from .semijoin import sketch_prune, sketch_semijoin  # noqa: F401
