"""Package data: embedded draft-04 meta-schema (reference default.go:5-162)."""
