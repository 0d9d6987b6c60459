# Structured Streaming operators; see streaming/events.py
