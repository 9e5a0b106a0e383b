"""Driver-side pipelines: bootstrap, apply, compact, snapshot, verify."""
