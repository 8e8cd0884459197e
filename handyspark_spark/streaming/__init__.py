"""Event-time windowing + stateful streaming (batch ≡ streaming plans)."""
from .stateful import running_user_stats
from .windows import (funnel_counts, session, session_counts, sessionize,
                      sliding, stream_dedup, stream_join, tumbling,
                      with_watermark)

__all__ = ["tumbling", "sliding", "session", "sessionize",
           "session_counts", "with_watermark", "stream_dedup",
           "stream_join", "funnel_counts", "running_user_stats"]
