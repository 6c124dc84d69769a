from .filter import CompareOp, FilterPredicate, FilterSpec  # noqa: F401
from .glyph import GlyphSpec, GlyphType  # noqa: F401
from .pipeline import (  # noqa: F401
    ExecutionMode, Pipeline, PipelineConfig, ProgressInfo, ReductionSpec,
)
