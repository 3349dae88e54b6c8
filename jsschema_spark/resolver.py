"""``$ref`` resolution: JSON-pointer fragments + registered external URIs.

Semantics of the reference's ``Resolve`` (schema.go:204-269): resolution is
against the tree root by default, memoized per engine instance **including
negative caching** (an error resolves to the same error next time,
schema.go:222-237). External URIs resolve through a provider map pre-seeded
with the embedded draft-04 meta-schema (schema.go:34-44, default.go:5-162).

Differences from the reference, by design: resolution here happens at
**compile time on the driver** (single-threaded — no locking needed), and
cycles are detected explicitly so the Spark compiler can switch recursive
schemas to bounded unrolling.
"""

from __future__ import annotations

from typing import Optional, Union
from urllib.parse import unquote, urldefrag

from jsschema_spark.errors import ResolutionError
from jsschema_spark.schema import SchemaNode, draft04_hyperschema, draft04_metaschema


def _pointer_tokens(fragment: str) -> list[str]:
    """Decode a JSON-pointer fragment (#/a/b~1c) into tokens (RFC 6901)."""
    if fragment in ("", "#"):
        return []
    frag = fragment[1:] if fragment.startswith("#") else fragment
    if frag.startswith("/"):
        frag = frag[1:]
    if frag == "":
        return []
    return [unquote(t).replace("~1", "/").replace("~0", "~") for t in frag.split("/")]


def _walk_pointer(node: SchemaNode, tokens: list[str], ref: str) -> SchemaNode:
    """Walk pointer tokens over the IR tree.

    Covers the slots a draft-04 schema document exposes as addressable
    children; the corpus only ever points into ``definitions`` and
    ``properties`` (e.g. ``#/definitions/address`` in business.json) but we
    also support items / combinator indices.
    """
    cur: Union[SchemaNode, list, dict] = node
    for tok in tokens:
        if isinstance(cur, SchemaNode):
            slots: dict[str, object] = {
                "definitions": cur.definitions,
                "properties": cur.properties,
                "patternProperties": {k: s for k, (_rx, s) in cur.pattern_properties.items()},
                "allOf": cur.all_of,
                "anyOf": cur.any_of,
                "oneOf": cur.one_of,
                "not": cur.not_,
                "items": (
                    cur.items.schemas
                    if cur.items is not None and cur.items.tuple_mode
                    else (cur.items.schemas[0] if cur.items is not None else None)
                ),
                "additionalItems": cur.additional_items,
                "additionalProperties": cur.additional_properties,
                "dependencies": cur.dep_schemas,
            }
            if tok not in slots or slots[tok] is None:
                raise ResolutionError(f"cannot resolve {ref!r}: no member {tok!r}")
            cur = slots[tok]
        elif isinstance(cur, dict):
            if tok not in cur:
                raise ResolutionError(f"cannot resolve {ref!r}: no member {tok!r}")
            cur = cur[tok]
        elif isinstance(cur, list):
            try:
                cur = cur[int(tok)]
            except (ValueError, IndexError):
                raise ResolutionError(f"cannot resolve {ref!r}: bad index {tok!r}") from None
        else:
            raise ResolutionError(f"cannot resolve {ref!r}: {tok!r} is not addressable")
    if not isinstance(cur, SchemaNode):
        raise ResolutionError(f"{ref!r} does not point at a schema")
    return cur


class RefResolver:
    """Memoizing resolver with negative cache (reference schema.go:222-266)."""

    def __init__(self, root: SchemaNode, providers: Optional[dict[str, SchemaNode]] = None):
        self.root = root
        # pre-seeded provider map, like the reference's jsref MapProvider
        # registration of the embedded meta-schema (schema.go:34-44)
        self.providers: dict[str, SchemaNode] = {}
        if providers:
            self.providers.update(providers)
        self._cache: dict[str, Union[SchemaNode, ResolutionError]] = {}

    @classmethod
    def with_default_providers(cls, root: SchemaNode) -> "RefResolver":
        # the reference registers the hyper-schema under the DRAFT-03 URL
        # (interface.go:15, schema.go:39) even though the embedded document
        # is the draft-04 hyper-schema — mirrored here, plus the document's
        # own draft-04 id for good measure
        meta = draft04_metaschema()
        hyper = draft04_hyperschema()
        return cls(
            root,
            providers={
                "http://json-schema.org/draft-04/schema": meta,
                "http://json-schema.org/draft-04/schema#": meta,
                "http://json-schema.org/draft-03/hyper-schema": hyper,
                "http://json-schema.org/draft-03/hyper-schema#": hyper,
                "http://json-schema.org/draft-04/hyper-schema": hyper,
                "http://json-schema.org/draft-04/hyper-schema#": hyper,
            },
        )

    def resolve(self, ref: str) -> SchemaNode:
        cached = self._cache.get(ref)
        if cached is not None:
            if isinstance(cached, ResolutionError):
                raise cached  # negative cache (reference schema.go:231-236)
            return cached
        try:
            target = self._resolve_uncached(ref)
        except ResolutionError as e:
            self._cache[ref] = e
            raise
        self._cache[ref] = target
        return target

    def _resolve_uncached(self, ref: str) -> SchemaNode:
        if ref.startswith("#") or ref == "":
            return _walk_pointer(self.root, _pointer_tokens(ref), ref)
        base, frag = urldefrag(ref)
        doc = self.providers.get(base) or self.providers.get(base + "#")
        if doc is None:
            raise ResolutionError(f"no provider registered for {base!r}")
        return _walk_pointer(doc, _pointer_tokens("#" + frag if frag else "#"), ref)

    def resolve_node(self, node: SchemaNode, _seen: Optional[set[int]] = None) -> SchemaNode:
        """Follow a node's ``$ref`` chain to a concrete schema, detecting
        cycles (a self-referencing ``$ref: "#"`` chain raises)."""
        seen = _seen if _seen is not None else set()
        cur = node
        while cur.ref:
            if id(cur) in seen:
                raise ResolutionError(f"$ref cycle at {cur.ref!r}")
            seen.add(id(cur))
            cur = self.resolve(cur.ref)
        return cur
