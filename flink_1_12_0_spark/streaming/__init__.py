"""Structured Streaming tier: sources, watermarks, windows, joins, sinks,
and custom stateful operators (reference: flink-streaming-java +
stream-side exec nodes of the Blink planner)."""
