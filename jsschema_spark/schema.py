"""JSON Schema draft-04 in-memory IR: parser + serializer.

Re-expresses the semantics of the reference's ``Schema`` struct and
``Extract``/``MarshalJSON`` (reference interface.go:85-134,
marshal.go:474-667, marshal.go:738-866) as a Python dataclass tree.

Design notes (parity with the reference, NOT a code port):

* **Tri-state keywords** — "absent" is distinct from "present with zero
  value" (reference interface.go:49-67). We encode absence as ``None``;
  a keyword that is ``None`` emits no predicate and is omitted on
  serialization.
* **additionalItems / additionalProperties** — three states (reference
  marshal.go:590-626): absent or ``true`` ⇒ allow anything (``None`` here),
  literal ``false`` ⇒ forbidden (module sentinel ``FORBIDDEN``), a schema ⇒
  that ``SchemaNode``.
* **items** — list mode (one schema for every element) vs tuple mode
  (positional schemas), decided by the JSON shape (reference
  marshal.go:337-369).
* **dependencies** — property-name form and schema form, split at parse
  time (reference marshal.go:431-459).
* **Unknown keywords** are preserved verbatim in ``extras`` and re-emitted
  on serialization (reference marshal.go:650-660, interface.go:133).
* Regexes (``pattern``, ``patternProperties`` keys) are compiled **at parse
  time** (reference marshal.go:143-169); a bad pattern is a parse error.
* Serialization mirrors the reference's placement rules, including the
  quirk of injecting ``additionalItems: false`` / ``additionalProperties:
  false`` only when the node can be an array / object type (reference
  marshal.go:756-769, 820-833, ``canBeType`` marshal.go:725-735) — pinned
  by the byte-equality round-trip test (reference marshal_test.go:13-65).
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import dataclass, field
from importlib import resources
from typing import Any, Optional, Union

from jsschema_spark.errors import SchemaParseError

# --------------------------------------------------------------------------
# Primitive types (reference interface.go:70-79, primitives.go:23-67)

PRIMITIVE_TYPES = ("array", "boolean", "integer", "null", "number", "object", "string")

# draft-04 format names (reference interface.go:38-45)
KNOWN_FORMATS = ("date-time", "email", "hostname", "ipv4", "ipv6", "uri")


class _Forbidden:
    """Sentinel: ``additionalItems``/``additionalProperties`` was ``false``."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):  # pragma: no cover
        return "FORBIDDEN"


FORBIDDEN = _Forbidden()

Additional = Union[None, _Forbidden, "SchemaNode"]


@dataclass
class ItemSpec:
    """``items`` keyword (reference interface.go:155-158).

    ``tuple_mode=False`` ⇒ ``schemas`` has exactly one entry applied to every
    element; ``tuple_mode=True`` ⇒ positional schemas.
    """

    tuple_mode: bool
    schemas: list["SchemaNode"]


@dataclass
class SchemaNode:
    # identity / metadata (reference interface.go:90-98)
    id: Optional[str] = None
    title: Optional[str] = None
    description: Optional[str] = None
    default: Any = None
    has_default: bool = False
    schema_ref: Optional[str] = None  # $schema
    ref: Optional[str] = None  # $ref
    format: Optional[str] = None

    # type constraint — list of primitive-type names; empty = unconstrained
    types: list[str] = field(default_factory=list)

    # numeric keywords (reference interface.go:100-105)
    multiple_of: Optional[Union[int, float]] = None
    minimum: Optional[Union[int, float]] = None
    maximum: Optional[Union[int, float]] = None
    exclusive_minimum: Optional[bool] = None
    exclusive_maximum: Optional[bool] = None

    # string keywords (reference interface.go:107-110)
    max_length: Optional[int] = None
    min_length: Optional[int] = None
    pattern: Optional[re.Pattern] = None

    # array keywords (reference interface.go:112-117)
    additional_items: Additional = None
    items: Optional[ItemSpec] = None
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: Optional[bool] = None

    # object keywords (reference interface.go:119-126)
    max_properties: Optional[int] = None
    min_properties: Optional[int] = None
    required: list[str] = field(default_factory=list)
    dep_names: dict[str, list[str]] = field(default_factory=dict)
    dep_schemas: dict[str, "SchemaNode"] = field(default_factory=dict)
    properties: dict[str, "SchemaNode"] = field(default_factory=dict)
    additional_properties: Additional = None
    pattern_properties: dict[str, tuple[re.Pattern, "SchemaNode"]] = field(
        default_factory=dict
    )

    # combinators (reference interface.go:128-132)
    enum: Optional[list[Any]] = None
    all_of: list["SchemaNode"] = field(default_factory=list)
    any_of: list["SchemaNode"] = field(default_factory=list)
    one_of: list["SchemaNode"] = field(default_factory=list)
    not_: Optional["SchemaNode"] = None

    definitions: dict[str, "SchemaNode"] = field(default_factory=dict)

    # unknown keywords, round-tripped verbatim (reference interface.go:133)
    extras: dict[str, Any] = field(default_factory=dict)

    # tree plumbing (reference interface.go:86-89) — parent links are wired
    # after parse like applyParentSchema (reference schema.go:78-132)
    parent: Optional["SchemaNode"] = field(default=None, repr=False, compare=False)

    # ------------------------------------------------------------------
    def root(self) -> "SchemaNode":
        """Walk to the tree root (reference schema.go:150-159)."""
        node = self
        while node.parent is not None:
            node = node.parent
        return node

    def scope(self) -> Optional[str]:
        """Nearest ancestor-or-self ``id`` (reference schema.go:283-296)."""
        node = self
        while node is not None:
            if node.id:
                return node.id
            node = node.parent
        return None

    def is_resolved(self) -> bool:
        """reference schema.go:195-197."""
        return not self.ref

    def is_prop_required(self, name: str) -> bool:
        """reference schema.go:273-280."""
        return name in self.required

    def find_by_id(self, schema_id: str) -> Optional["SchemaNode"]:
        """Full-tree id lookup. The reference's findSchemaByID
        (schema.go:161-168) only checks self and direct definitions and is
        marked 'XXX Quite unimplemented' — we walk the whole subtree."""
        if self.id == schema_id:
            return self
        for child in self.children():
            hit = child.find_by_id(schema_id)
            if hit is not None:
                return hit
        return None

    def resolve_url(self, ref: str) -> str:
        """Resolve a (possibly relative) reference URL against the nearest
        ancestor scope (reference ResolveURL schema.go:172-192, BaseURL
        schema.go:135-144)."""
        from urllib.parse import urljoin

        base = self.scope() or ""
        return urljoin(base, ref)

    def children(self):
        """Yield every direct child schema (the 9 child slots the reference
        re-parents in applyParentSchema, reference schema.go:82-132)."""
        for m in (self.definitions, self.properties, self.dep_schemas):
            yield from m.values()
        for _, (_rx, s) in self.pattern_properties.items():
            yield s
        if isinstance(self.additional_items, SchemaNode):
            yield self.additional_items
        if isinstance(self.additional_properties, SchemaNode):
            yield self.additional_properties
        if self.items is not None:
            yield from self.items.schemas
        yield from self.all_of
        yield from self.any_of
        yield from self.one_of
        if self.not_ is not None:
            yield self.not_

    # ------------------------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        """Serialize back to a plain JSON-ready dict, mirroring the
        reference's MarshalJSON placement rules (marshal.go:738-866)."""
        m: dict[str, Any] = {}
        if self.id:
            m["id"] = self.id
        if self.title:
            m["title"] = self.title
        if self.description:
            m["description"] = self.description
        if self.schema_ref:
            m["$schema"] = self.schema_ref
        if self.ref:
            m["$ref"] = self.ref
        if self.required:
            m["required"] = list(self.required)
        if self.enum is not None and len(self.enum) > 0:
            m["enum"] = list(self.enum)
        if len(self.types) == 1:
            m["type"] = self.types[0]
        elif len(self.types) > 1:
            m["type"] = list(self.types)

        # additionalItems: absent/true ⇒ omit unless node can be an array, in
        # which case the reference injects nothing; FORBIDDEN ⇒ emit false
        # only for array-capable nodes (reference marshal.go:756-769)
        if isinstance(self.additional_items, SchemaNode):
            m["additionalItems"] = self.additional_items.to_dict()
        elif self.additional_items is FORBIDDEN and self._can_be_type("array"):
            m["additionalItems"] = False

        if self.pattern is not None:
            m["pattern"] = self.pattern.pattern
        for key, val in (
            ("maxLength", self.max_length),
            ("minLength", self.min_length),
            ("maxItems", self.max_items),
            ("minItems", self.min_items),
            ("maxProperties", self.max_properties),
            ("minProperties", self.min_properties),
        ):
            if val is not None:
                m[key] = val
        if self.unique_items is not None:
            m["uniqueItems"] = self.unique_items
        if self.definitions:
            m["definitions"] = {k: v.to_dict() for k, v in self.definitions.items()}
        if self.items is not None:
            if self.items.tuple_mode:
                m["items"] = [s.to_dict() for s in self.items.schemas]
            else:
                m["items"] = self.items.schemas[0].to_dict()
        if self.properties:
            m["properties"] = {k: v.to_dict() for k, v in self.properties.items()}
        if self.pattern_properties:
            m["patternProperties"] = {
                src: s.to_dict() for src, (_rx, s) in self.pattern_properties.items()
            }
        if self.all_of:
            m["allOf"] = [s.to_dict() for s in self.all_of]
        if self.any_of:
            m["anyOf"] = [s.to_dict() for s in self.any_of]
        if self.one_of:
            m["oneOf"] = [s.to_dict() for s in self.one_of]
        if self.has_default:
            m["default"] = self.default
        if self.format:
            m["format"] = self.format
        if self.minimum is not None:
            m["minimum"] = self.minimum
        if self.exclusive_minimum is not None:
            m["exclusiveMinimum"] = self.exclusive_minimum
        if self.maximum is not None:
            m["maximum"] = self.maximum
        if self.exclusive_maximum is not None:
            m["exclusiveMaximum"] = self.exclusive_maximum

        # additionalProperties mirror of the additionalItems rule
        # (reference marshal.go:820-833)
        if isinstance(self.additional_properties, SchemaNode):
            m["additionalProperties"] = self.additional_properties.to_dict()
        elif self.additional_properties is FORBIDDEN and self._can_be_type("object"):
            m["additionalProperties"] = False

        if self.multiple_of is not None and self.multiple_of != 0:
            m["multipleOf"] = self.multiple_of
        if self.not_ is not None:
            m["not"] = self.not_.to_dict()

        deps: dict[str, Any] = {}
        for pname, dschema in self.dep_schemas.items():
            deps[pname] = dschema.to_dict()
        for pname, dlist in self.dep_names.items():
            deps[pname] = list(dlist)
        if deps:
            m["dependencies"] = deps

        m.update(self.extras)
        return m

    def to_json(self, indent: Optional[int] = 2) -> str:
        """JSON text with lexicographically sorted keys — matches Go's
        ``json.MarshalIndent`` of a map (reference marshal_test.go:56-62)."""
        return json.dumps(self.to_dict(), indent=indent, sort_keys=True, ensure_ascii=False)

    def _can_be_type(self, t: str) -> bool:
        """reference canBeType marshal.go:725-735: no declared type ⇒ any."""
        return not self.types or t in self.types


# --------------------------------------------------------------------------
# Parser (semantics of reference Extract, marshal.go:474-667)


def _err(key: str, why: str) -> SchemaParseError:
    return SchemaParseError(f"invalid value for keyword {key!r}: {why}")


def _take_number(m: dict, key: str):
    if key not in m:
        return None
    v = m[key]
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise _err(key, f"expected number, got {type(v).__name__}")
    return v


def _take_int(m: dict, key: str):
    if key not in m:
        return None
    v = m[key]
    # JSON has no integer type: accept integral floats like the reference's
    # extractInt (marshal.go:28-42) accepts float64 with integral value
    if isinstance(v, bool):
        raise _err(key, "expected integer, got bool")
    if isinstance(v, int):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    raise _err(key, f"expected integer, got {v!r}")


def _take_bool(m: dict, key: str):
    if key not in m:
        return None
    v = m[key]
    if not isinstance(v, bool):
        raise _err(key, f"expected boolean, got {type(v).__name__}")
    return v


def _take_string(m: dict, key: str):
    if key not in m:
        return None
    v = m[key]
    if not isinstance(v, str):
        raise _err(key, f"expected string, got {type(v).__name__}")
    return v


def _take_string_list(m: dict, key: str):
    """Scalar-or-list of strings (reference convertStringList marshal.go:76-94)."""
    if key not in m:
        return None
    v = m[key]
    if isinstance(v, str):
        return [v]
    if isinstance(v, list) and all(isinstance(x, str) for x in v):
        return list(v)
    raise _err(key, "expected string or list of strings")


def _compile_regex(key: str, src: str) -> re.Pattern:
    """Parse-time regex compilation (reference marshal.go:143-169).

    The reference uses Go RE2; we use Python ``re`` at parse/pure-Python
    validation time and Java regex inside Spark ``rlike``. All corpus
    patterns sit in the common subset; semantics are unanchored *search*.
    """
    try:
        return re.compile(src)
    except re.error as e:
        raise _err(key, f"bad regex {src!r}: {e}") from None


def _take_schema(v: Any, key: str) -> "SchemaNode":
    if not isinstance(v, dict):
        raise _err(key, f"expected schema object, got {type(v).__name__}")
    return _extract(v)


def _take_schema_list(m: dict, key: str) -> list["SchemaNode"]:
    """Scalar-or-list of schemas (reference SchemaList.Extract marshal.go:216-248)."""
    if key not in m:
        return []
    v = m[key]
    if isinstance(v, dict):
        return [_extract(v)]
    if isinstance(v, list):
        return [_take_schema(x, key) for x in v]
    raise _err(key, "expected schema or list of schemas")


def _take_schema_map(m: dict, key: str) -> dict[str, "SchemaNode"]:
    """reference extractSchemaMap marshal.go:258-296."""
    if key not in m:
        return {}
    v = m[key]
    if not isinstance(v, dict):
        raise _err(key, "expected object of schemas")
    return {k: _take_schema(sv, key) for k, sv in v.items()}


def _take_types(m: dict, key: str = "type") -> list[str]:
    """String-or-list of primitive type names (reference extractType
    marshal.go:392-429; name validation primitives.go:23-43)."""
    if key not in m:
        return []
    v = m[key]
    names = [v] if isinstance(v, str) else v
    if not isinstance(names, list):
        raise _err(key, "expected string or list of strings")
    out = []
    for name in names:
        if name not in PRIMITIVE_TYPES:
            raise _err(key, f"unknown primitive type {name!r}")
        out.append(name)
    return out


def _take_items(m: dict) -> Optional[ItemSpec]:
    """Tuple-mode detection by JSON shape (reference extractItems
    marshal.go:337-369)."""
    if "items" not in m:
        return None
    v = m["items"]
    if isinstance(v, dict):
        return ItemSpec(tuple_mode=False, schemas=[_extract(v)])
    if isinstance(v, list):
        return ItemSpec(tuple_mode=True, schemas=[_take_schema(x, "items") for x in v])
    raise _err("items", "expected schema or list of schemas")


def _take_additional(m: dict, key: str) -> Additional:
    """Nil-means-forbidden tri-state (reference marshal.go:590-626)."""
    if key not in m:
        return None
    v = m[key]
    if isinstance(v, bool):
        return None if v else FORBIDDEN
    if isinstance(v, dict):
        return _extract(v)
    raise _err(key, "expected boolean or schema")


def _take_dependencies(m: dict) -> tuple[dict[str, list[str]], dict[str, "SchemaNode"]]:
    """Split property-form and schema-form deps (reference marshal.go:431-459)."""
    names: dict[str, list[str]] = {}
    schemas: dict[str, SchemaNode] = {}
    if "dependencies" not in m:
        return names, schemas
    v = m["dependencies"]
    if not isinstance(v, dict):
        raise _err("dependencies", "expected object")
    for pname, dep in v.items():
        if isinstance(dep, list):
            if not all(isinstance(x, str) for x in dep):
                raise _err("dependencies", f"{pname}: list entries must be strings")
            names[pname] = list(dep)
        elif isinstance(dep, dict):
            schemas[pname] = _extract(dep)
        else:
            raise _err("dependencies", f"{pname}: expected list or schema")
    return names, schemas


_KNOWN_KEYS = frozenset(
    {
        "id", "title", "description", "default", "$schema", "$ref", "format",
        "type", "multipleOf", "minimum", "maximum", "exclusiveMinimum",
        "exclusiveMaximum", "maxLength", "minLength", "pattern",
        "additionalItems", "items", "minItems", "maxItems", "uniqueItems",
        "maxProperties", "minProperties", "required", "dependencies",
        "properties", "additionalProperties", "patternProperties", "enum",
        "allOf", "anyOf", "oneOf", "not", "definitions",
    }
)


def _extract(m: dict[str, Any]) -> SchemaNode:
    """The keyword dispatch — semantics of reference Extract
    (marshal.go:474-667), with strict errors where the reference silently
    drops them (SURVEY.md §2.1 quirk note)."""
    if not isinstance(m, dict):
        raise SchemaParseError(f"schema must be a JSON object, got {type(m).__name__}")

    n = SchemaNode()
    n.id = _take_string(m, "id")
    n.title = _take_string(m, "title")
    n.description = _take_string(m, "description")
    n.schema_ref = _take_string(m, "$schema")
    n.ref = _take_string(m, "$ref")
    if "default" in m:
        n.default = m["default"]
        n.has_default = True
    fmt = _take_string(m, "format")
    n.format = fmt  # unknown formats carried verbatim; 6 names predeclared
    n.types = _take_types(m)
    if "enum" in m:
        if not isinstance(m["enum"], list):
            raise _err("enum", "expected list")
        n.enum = list(m["enum"])

    n.multiple_of = _take_number(m, "multipleOf")
    n.minimum = _take_number(m, "minimum")
    n.maximum = _take_number(m, "maximum")
    n.exclusive_minimum = _take_bool(m, "exclusiveMinimum")
    n.exclusive_maximum = _take_bool(m, "exclusiveMaximum")

    n.max_length = _take_int(m, "maxLength")
    n.min_length = _take_int(m, "minLength")
    pat = _take_string(m, "pattern")
    if pat is not None:
        n.pattern = _compile_regex("pattern", pat)

    n.additional_items = _take_additional(m, "additionalItems")
    n.items = _take_items(m)
    n.min_items = _take_int(m, "minItems")
    n.max_items = _take_int(m, "maxItems")
    n.unique_items = _take_bool(m, "uniqueItems")

    n.max_properties = _take_int(m, "maxProperties")
    n.min_properties = _take_int(m, "minProperties")
    n.required = _take_string_list(m, "required") or []
    n.dep_names, n.dep_schemas = _take_dependencies(m)
    n.properties = _take_schema_map(m, "properties")
    n.additional_properties = _take_additional(m, "additionalProperties")
    if "patternProperties" in m:
        v = m["patternProperties"]
        if not isinstance(v, dict):
            raise _err("patternProperties", "expected object")
        # reference extractRegexpToSchemaMap marshal.go:298-335: keys compiled
        n.pattern_properties = {
            src: (_compile_regex("patternProperties", src), _take_schema(sv, "patternProperties"))
            for src, sv in v.items()
        }

    n.all_of = _take_schema_list(m, "allOf")
    n.any_of = _take_schema_list(m, "anyOf")
    n.one_of = _take_schema_list(m, "oneOf")
    if "not" in m:
        n.not_ = _take_schema(m["not"], "not")
    n.definitions = _take_schema_map(m, "definitions")

    n.extras = {k: v for k, v in m.items() if k not in _KNOWN_KEYS}
    return n


def _wire_parents(node: SchemaNode) -> None:
    """reference applyParentSchema schema.go:78-132."""
    for child in node.children():
        child.parent = node
        _wire_parents(child)


def parse_schema(m: dict[str, Any]) -> SchemaNode:
    """Parse a decoded schema document into the IR and wire parent links."""
    node = _extract(m)
    _wire_parents(node)
    return node


def read_string(text: str) -> SchemaNode:
    """reference Read schema.go:59-65."""
    try:
        m = json.loads(text)
    except json.JSONDecodeError as e:
        raise SchemaParseError(f"invalid JSON: {e}") from None
    return parse_schema(m)


def read_file(path: str) -> SchemaNode:
    """reference ReadFile schema.go:48-55."""
    with open(path, "r", encoding="utf-8") as f:
        return read_string(f.read())


# --------------------------------------------------------------------------
# Embedded draft-04 meta-schema (reference default.go:5-162, registered as a
# $ref provider at schema.go:34-44). Loaded lazily, cached process-wide.

DRAFT04_URI = "http://json-schema.org/draft-04/schema"

_metaschema_lock = threading.Lock()
_metaschema_cache: dict[str, Any] = {}


def draft04_metaschema_dict() -> dict[str, Any]:
    with _metaschema_lock:
        if "dict" not in _metaschema_cache:
            text = (
                resources.files("jsschema_spark.data")
                .joinpath("draft04_metaschema.json")
                .read_text(encoding="utf-8")
            )
            _metaschema_cache["dict"] = json.loads(text)
        return _metaschema_cache["dict"]


def draft04_metaschema() -> SchemaNode:
    with _metaschema_lock:
        have = _metaschema_cache.get("node")
    if have is not None:
        return have
    node = parse_schema(draft04_metaschema_dict())
    with _metaschema_lock:
        _metaschema_cache["node"] = node
    return node


# The JSON Hyper-Schema (public json-schema.org document). The reference
# embeds the same document and registers it under the *draft-03* hyper-schema
# URL (interface.go:13-15, default.go:164-340, schema.go:34-44) — we mirror
# that registration and additionally serve the document's own draft-04 id.

HYPERSCHEMA_DRAFT03_URI = "http://json-schema.org/draft-03/hyper-schema"
HYPERSCHEMA_DRAFT04_URI = "http://json-schema.org/draft-04/hyper-schema"


def draft04_hyperschema_dict() -> dict[str, Any]:
    with _metaschema_lock:
        if "hyper_dict" not in _metaschema_cache:
            text = (
                resources.files("jsschema_spark.data")
                .joinpath("draft04_hyperschema.json")
                .read_text(encoding="utf-8")
            )
            _metaschema_cache["hyper_dict"] = json.loads(text)
        return _metaschema_cache["hyper_dict"]


def draft04_hyperschema() -> SchemaNode:
    with _metaschema_lock:
        have = _metaschema_cache.get("hyper_node")
    if have is not None:
        return have
    node = parse_schema(draft04_hyperschema_dict())
    with _metaschema_lock:
        _metaschema_cache["hyper_node"] = node
    return node
