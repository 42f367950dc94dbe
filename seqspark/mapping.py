"""Index mapping: field name → index type(s).

Mirrors the reference mapping semantics (`seq/mapping.go:46-189`,
`docs/en/03-index-types.md`):

- types: ``keyword``, ``text``, ``path``, ``object``, ``tags``, ``nested``,
  ``exists``;
- a field may carry several types; non-default types are addressable through
  implicit ``name.title`` sub-fields (e.g. ``message.keyword``);
- ``auto`` mapping (mapping is None in the reference) indexes every field as
  keyword — here modeled by :class:`AutoMapping`;
- querying an unmapped field is an error (`parser/seqql_filter.go:24-27`);
- the builtin fields ``_all_`` and ``_exists_`` are always mapped.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from .seqql.ast import TOKEN_ALL, TOKEN_EXISTS

MAIN_TYPES = ("keyword", "text", "path")
ALL_TYPES = MAIN_TYPES + ("object", "tags", "nested", "exists")


@dataclass
class FieldMapping:
    name: str
    #: main index type used when the field is queried by its bare name
    main_type: str
    #: title -> type for multi-type fields (`seq/mapping.go:125-166`)
    sub_types: Dict[str, str] = dc_field(default_factory=dict)
    #: max indexed size override (0 = engine default)
    size: int = 0


class Mapping:
    """A compiled mapping: resolves a queried field name to its index type."""

    def __init__(self, fields: Optional[Dict[str, object]] = None):
        self._fields: Dict[str, FieldMapping] = {}
        for name, spec in (fields or {}).items():
            self.add(name, spec)

    def add(self, name: str, spec: object) -> None:
        """``spec`` is a type string ("keyword") or a dict
        ``{"types": [{"type": "keyword", "title": "kw", "size": 0}, ...]}``."""
        if isinstance(spec, str):
            if spec not in ALL_TYPES:
                raise ValueError(f"unknown index type {spec!r} for field {name!r}")
            self._fields[name] = FieldMapping(name, spec)
            return
        if isinstance(spec, FieldMapping):
            self._fields[name] = spec
            return
        types = spec.get("types", [])  # type: ignore[union-attr]
        if not types:
            raise ValueError(f"empty types for field {name!r}")
        main = types[0]
        fm = FieldMapping(name, main["type"], size=int(main.get("size", 0)))
        for t in types[1:]:
            title = t.get("title") or t["type"]
            fm.sub_types[title] = t["type"]
        self._fields[name] = fm

    def fields(self) -> List[FieldMapping]:
        return list(self._fields.values())

    def index_type(self, queried: str) -> Optional[str]:
        """Index type for a queried field name, or None if not indexed.

        Handles builtins, exact names, multi-type ``name.title`` sub-fields
        and dotted paths under an ``object``-typed parent.
        """
        if queried in (TOKEN_ALL, TOKEN_EXISTS):
            return "keyword"
        fm = self._fields.get(queried)
        if fm is not None:
            if fm.main_type in ("object", "nested", "tags"):
                return "keyword"
            if fm.main_type == "exists":
                return "keyword"
            return fm.main_type
        # name.title sub-field of a multi-type mapping
        if "." in queried:
            base, _, title = queried.rpartition(".")
            parent = self._fields.get(base)
            if parent is not None and title in parent.sub_types:
                return parent.sub_types[title]
            # dotted path under object/nested/tags parents: indexed as keyword
            root = queried.split(".", 1)[0]
            rfm = self._fields.get(root)
            if rfm is not None and rfm.main_type in ("object", "nested", "tags"):
                return "keyword"
        return None


class AutoMapping(Mapping):
    """``--mapping=auto``: every field is a keyword
    (reference `proxy/bulk/indexer.go:250-259`, `parser/query_parser.go:21-24`)."""

    def __init__(self) -> None:
        super().__init__({})

    def index_type(self, queried: str) -> Optional[str]:
        return "keyword"
