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
    #: title -> (type, size) for multi-type fields (`seq/mapping.go:125-166`)
    sub_types: Dict[str, tuple] = dc_field(default_factory=dict)
    #: max indexed size override (0 = engine default)
    size: int = 0


class Mapping:
    """A compiled mapping: resolves a queried field name to its index type.

    ``is_auto`` marks the index-all-fields mode (see :class:`AutoMapping`).

    Stored flat with dotted names, exactly like the reference's compiled
    ``seq.Mapping`` (`seq/mapping.go:93-166` convertMapping): an ``object``/
    ``tags``/``nested`` container contributes its own entry plus one dotted
    entry per child (``someobj.nested``), and a multi-type field contributes
    ``name`` (main type) plus ``name.title`` per extra type.
    """

    is_auto = False

    def __init__(self, fields: Optional[Dict[str, object]] = None):
        self._fields: Dict[str, FieldMapping] = {}
        for name, spec in (fields or {}).items():
            self.add(name, spec)

    @classmethod
    def from_yaml_obj(cls, obj: dict) -> "Mapping":
        """Build from the reference's mapping.yaml structure
        (`seq/mapping.go:58-73`):

        .. code-block:: yaml

            mapping-list:
              - name: clientip
                type: keyword
              - name: message
                types: [{type: text}, {title: keyword, type: keyword, size: 18}]
              - name: someobj
                type: object
                mapping-list: [{name: nested, type: keyword}]
        """
        m = cls()
        m._convert(obj.get("mapping-list", []), "")
        if not m._fields:
            raise ValueError("invalid mapping provided")
        return m

    @classmethod
    def from_yaml(cls, text: str) -> "Mapping":
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("PyYAML not available; use from_yaml_obj") from e
        return cls.from_yaml_obj(yaml.safe_load(text))

    def _convert(self, items: list, path: str) -> None:
        for el in items:
            name = el.get("name", "")
            fn = f"{path}.{name}" if path else name
            types = el.get("types") or []
            ftype = el.get("type")
            if types:
                spec_types = [
                    {
                        "type": t["type"],
                        "title": t.get("title", ""),
                        "size": int(t.get("size", 0)),
                    }
                    for t in types
                ]
                self.add(fn, {"types": spec_types})
            elif name:
                self.add(fn, ftype)
            else:
                raise ValueError("mapping entry without name")
            if ftype in ("object", "tags", "nested"):
                self._convert(el.get("mapping-list", []), fn)

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
        # the entry without a title is the main type; titled entries become
        # name.title sub-fields (`seq/mapping.go:127-166`)
        main = next((t for t in types if not t.get("title")), None)
        if main is None:
            raise ValueError(f"no main (untitled) type for field {name!r}")
        # duplicate titles — including a SECOND untitled type — are a
        # mapping error, not last-one-wins (`seq/mapping.go` "duplicate
        # field title in mapping: <name>.<title|_empty_>", pinned by its
        # TestReadMappingError vectors)
        seen: set = set()
        for t in types:
            title = t.get("title") or "_empty_"
            if title in seen:
                raise ValueError(
                    f"duplicate field title in mapping: {name}.{title}"
                )
            seen.add(title)
            if t["type"] not in ALL_TYPES:
                raise ValueError(
                    f"unknown index type {t['type']!r} for field {name!r}"
                )
        fm = FieldMapping(name, main["type"], size=int(main.get("size", 0)))
        for t in types:
            if t.get("title"):
                fm.sub_types[t["title"]] = (t["type"], int(t.get("size", 0)))
        self._fields[name] = fm

    def fields(self) -> List[FieldMapping]:
        return list(self._fields.values())

    def get(self, name: str) -> Optional[FieldMapping]:
        return self._fields.get(name)

    def container_of(self, name: str) -> Optional[tuple]:
        """Nearest ``tags``/``nested`` ancestor of a dotted field, as
        ``(container_name, container_type)``; None when the field is reached
        by a plain JSON path (top-level or under ``object`` parents, which
        need no special extraction)."""
        parts = name.split(".")
        for i in range(len(parts) - 1, 0, -1):
            prefix = ".".join(parts[:i])
            fm = self._fields.get(prefix)
            if fm is not None and fm.main_type in ("tags", "nested"):
                return prefix, fm.main_type
        return None

    def children_of(self, container: str) -> List[FieldMapping]:
        prefix = container + "."
        return [fm for n, fm in self._fields.items() if n.startswith(prefix)]

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
                return parent.sub_types[title][0]
        # undeclared children of object/nested/tags containers are NOT
        # indexed (`proxy/bulk/indexer.go:80-85` skips unmapped fields;
        # querying them is a parse error, `parser/seqql_filter.go:24-27`)
        return None


class AutoMapping(Mapping):
    """``--mapping=auto``: every field is a keyword
    (reference `proxy/bulk/indexer.go:67-76` nil-mapping branch,
    `cmd/seq-db/seq-db.go:297`, `parser/query_parser.go:21-24`).

    Queries resolve ANY field name as keyword; ingest tokenizes every
    top-level JSON field dynamically (see ``make_ingest_transform``'s
    auto branch). Querying a field no document carries returns zero
    results, not an error — exactly the reference's
    ``TestIndexingAllFields`` behavior."""

    is_auto = True

    def __init__(self) -> None:
        super().__init__({})

    def index_type(self, queried: str) -> Optional[str]:
        return "keyword"


class MappingProvider:
    """Live mapping reload (reference `mappingprovider/mapping_provider.go`,
    flags ``--enable-mapping-updates`` / ``--mapping-update-period``,
    default 30 s): a watcher thread periodically re-reads the mapping YAML
    and, when its checksum changes, parses and swaps the mapping
    atomically. Reload failure semantics match the reference's
    ``reloadMapping``:

    - an UNCHANGED checksum costs one file read + hash, no re-parse;
    - an unreadable file or a mapping that fails to parse is logged and
      IGNORED — the previous mapping keeps serving (a bad deploy of the
      mapping file must not take ingest/search down);
    - construction errors DO propagate (`initMapping`): starting with a
      broken mapping is a configuration error, not a transient.

    ``index_all_fields=True`` mirrors ``WithIndexAllFields``: the provider
    always serves :class:`AutoMapping` and never touches the file.

    Subscribers (e.g. a server's cached ingest transform) register a
    zero-arg callback fired after every successful swap.
    """

    def __init__(
        self,
        file_path: Optional[str] = None,
        update_period_s: float = 30.0,
        mapping: Optional[Mapping] = None,
        index_all_fields: bool = False,
    ):
        import hashlib
        import threading

        self._path = file_path
        self._period = update_period_s
        self._lock = threading.RLock()
        self._reload_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._subscribers: List[object] = []
        self._hashlib = hashlib
        self._checksum: Optional[bytes] = None
        if index_all_fields:
            # WithIndexAllFields: GetMapping returns nil in the reference
            # (the auto branch); here the sentinel AutoMapping — the file
            # is never read or watched
            self._mapping: Mapping = AutoMapping()
            self._path = None
        elif mapping is not None:
            # WithMapping: pinned, no initial file read (the watcher still
            # runs if a path was given, like the reference)
            self._mapping = mapping
        else:
            if file_path is None:
                raise ValueError("MappingProvider needs file_path, "
                                 "mapping, or index_all_fields")
            data = open(file_path, "rb").read()
            self._mapping = Mapping.from_yaml(data.decode("utf-8"))
            self._checksum = hashlib.sha256(data).digest()

    def get(self) -> Mapping:
        with self._lock:
            return self._mapping

    def subscribe(self, callback) -> None:
        """``callback()`` fires after every successful mapping swap."""
        with self._lock:
            self._subscribers.append(callback)

    def watch(self) -> "MappingProvider":
        """Start the reload thread (``WatchUpdates``). Idempotent."""
        import threading

        if self._path is None or self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mapping-watcher")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
            self._stop = __import__("threading").Event()

    def _loop(self) -> None:
        while not self._stop.wait(self._period):
            self.reload()

    def reload(self) -> bool:
        """One reload pass; True if the mapping was swapped. Public so
        tests and operators can force a check without waiting a period.
        The whole read-compare-swap is serialized: a concurrent watcher
        tick and manual reload could otherwise interleave so the OLDER
        file content wins the swap (lost update, corrected only at the
        next period)."""
        import logging

        log = logging.getLogger(__name__)
        with self._reload_lock:
            try:
                data = open(self._path, "rb").read()
            except OSError as e:
                log.error("error opening mapping file %s: %s",
                          self._path, e)
                return False
            checksum = self._hashlib.sha256(data).digest()
            if checksum == self._checksum:
                return False
            try:
                new = Mapping.from_yaml(data.decode("utf-8"))
            except Exception as e:  # noqa: BLE001 - must not kill serving
                log.error("read new mapping error from %s: %s",
                          self._path, e)
                return False
            with self._lock:
                self._mapping = new
                self._checksum = checksum
                subs = list(self._subscribers)
        for cb in subs:
            cb()
        log.info("mapping updated from %s", self._path)
        return True
