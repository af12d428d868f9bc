"""raptor_spark — a from-scratch PySpark-native feature-engineering
engine with the query semantics of raptor-ml/raptor (reference at
/root/reference, studied for behavior only): declarative feature specs
compiled to DataFrame plans — point-in-time as-of joins, sliding-window
aggregates (exact + bucketed two-phase), lag/lead (keep_previous), gap
sessionization, staleness/validity semantics — plus the training-data
pipeline ops a 100 TB corpus needs (dedup, similarity search, text
analysis).
"""

from .durations import parse_duration_us
from .selector import Selector, parse_selector
from .session import get_spark
from .specs import AggrSpec, FeatureSetSpec, FeatureSpec, KeepPreviousSpec, feature


def get_historical(*args, **kwargs):
    """PIT training-set assembly (lazy import; see plans.historical)."""
    from .plans.historical import get_historical as _gh

    return _gh(*args, **kwargs)


def backfill(*args, **kwargs):
    """Checkpoint-resumable sharded backfill (see backfill module)."""
    from .backfill import backfill as _bf

    return _bf(*args, **kwargs)


__all__ = [
    "AggrSpec",
    "FeatureSetSpec",
    "FeatureSpec",
    "KeepPreviousSpec",
    "Selector",
    "backfill",
    "feature",
    "get_historical",
    "get_spark",
    "parse_duration_us",
    "parse_selector",
]

__version__ = "0.1.0"
