from .jobs import stream_tumbling_counts, stream_session_windows  # noqa: F401
