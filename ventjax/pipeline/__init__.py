from ventjax.pipeline.result import StudyMetrics, VentResult
from ventjax.pipeline.analyze import (
    analyze_study,
    analyze_cohort,
    analyze_cohort_grouped,
    make_analyze_fn,
)

__all__ = [
    "StudyMetrics",
    "VentResult",
    "analyze_study",
    "analyze_cohort",
    "analyze_cohort_grouped",
    "make_analyze_fn",
]
