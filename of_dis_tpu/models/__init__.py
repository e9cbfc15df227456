"""Flow/stereo model pipelines."""
