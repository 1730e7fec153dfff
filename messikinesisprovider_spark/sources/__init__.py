"""Sources/sinks: the file-backed broker simulator and (gated) real Kinesis."""
