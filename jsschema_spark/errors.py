"""Engine error types.

The reference wraps parse failures per-keyword (e.g. "invalid field value for
key 'minLength'", reference marshal.go:534-548) — but silently DROPS the
length-keyword errors due to a bug noted in SURVEY.md §2.1. We intentionally
diverge: every malformed keyword raises ``SchemaParseError``.
"""


class SchemaParseError(ValueError):
    """A schema document is malformed (bad keyword type, bad regex, ...)."""


class ResolutionError(ValueError):
    """A ``$ref`` could not be resolved (bad pointer, unknown URI, cycle)."""
