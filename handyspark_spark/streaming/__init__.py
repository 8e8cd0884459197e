"""Event-time windowing + stateful streaming (batch ≡ streaming plans)."""
from .stateful import (drift_from_state, maintain_cms_sketch,
                       maintain_drift_monitor, maintain_hll_sketch,
                       maintain_state_table, running_user_stats)
from .windows import (funnel_counts, session, session_counts, sessionize,
                      sliding, stream_dedup, stream_join, tumbling,
                      with_watermark)

__all__ = ["tumbling", "sliding", "session", "sessionize",
           "session_counts", "with_watermark", "stream_dedup",
           "stream_join", "funnel_counts", "running_user_stats",
           "maintain_state_table", "maintain_cms_sketch",
           "maintain_drift_monitor", "maintain_hll_sketch",
           "drift_from_state"]
