"""ES-bulk-shaped ingest front end.

Library equivalent of the reference's ``POST /_bulk`` endpoint
(`proxyapi/http_bulk.go:105-266`, `proxyapi/http_server.go:61-85`):

- NDJSON body alternating action lines (``{"index": ...}`` / ``create`` /
  ``delete`` / ``update``) and document lines; action lines are skipped,
  ``delete``/``update`` actions are unsupported (as in the reference, which
  only indexes);
- optional gzip bodies;
- returns per-document statuses plus the extracted raw docs, ready for
  :func:`seqspark.ingest.ingest_docs`;
- a fake ES version banner for shipper compatibility
  (`proxyapi/http_server.go` ``/`` handler).

The request-level parse is driver-side Python (requests are bounded —
the reference caps in-flight bulks at 32); the heavy tokenize/append work
happens distributed in ``ingest_docs``/``DocStore.append``.
"""

from __future__ import annotations

import gzip
import io
import json
from dataclasses import dataclass, field as dc_field
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

#: decompressed-body cap, the same 64 MiB bomb-guard bound the gRPC wire
#: enforces (`seqspark/wire/h2.py` MAX_BODY_BYTES)
MAX_BULK_BODY_BYTES = 64 << 20

#: per-document line cap — reference ``--max-document-size`` default
#: (`cmd/seq-db/flags.go:63`): larger documents are SKIPPED (per-item
#: 413 here; the reference counts a metric), never indexed
MAX_DOCUMENT_SIZE = 128 << 10


class BadBulkRequest(ValueError):
    """Request-shaped bulk error (corrupt gzip, non-UTF-8 bytes, oversized
    body): the transport's 400. Never a backend failure — the ingest
    circuit breaker must not count these (`proxyapi/http_bulk.go` returns
    http.StatusBadRequest for malformed bodies without touching backend
    health)."""

ES_BANNER = {
    "name": "seqspark",
    "cluster_name": "seqspark",
    "version": {"number": "8.9.0"},
    "tagline": "You Know, for Search",
}

_ACTIONS = ("index", "create", "delete", "update")


@dataclass
class BulkResult:
    docs: List[str] = dc_field(default_factory=list)
    items: List[dict] = dc_field(default_factory=list)
    errors: bool = False

    def response(self) -> dict:
        """ES-shaped bulk response body."""
        return {"errors": self.errors, "items": self.items}


def parse_bulk_body(
    body: bytes,
    gzipped: bool = False,
    max_document_size: int = MAX_DOCUMENT_SIZE,
) -> BulkResult:
    """Parse an ES-bulk NDJSON body into raw document strings.

    Mirrors `proxyapi/http_bulk.go:150-260` handleESBulkRequest: walk the
    lines, each action line announces what follows; ``index``/``create``
    consume the next line as a document; ``delete``/``update`` are rejected
    per-item; non-object docs error per-item.
    """
    if gzipped:
        import zlib

        try:
            body = gzip.GzipFile(fileobj=io.BytesIO(body)).read(
                MAX_BULK_BODY_BYTES + 1
            )
        except (OSError, EOFError, zlib.error) as e:
            # zlib.error is NOT an OSError: a body with a valid gzip
            # header but corrupt deflate data raises it directly
            raise BadBulkRequest(f"corrupt gzip body: {e}") from None
        if len(body) > MAX_BULK_BODY_BYTES:
            raise BadBulkRequest(
                f"decompressed bulk body exceeds {MAX_BULK_BODY_BYTES} bytes"
            )
    res = BulkResult()
    try:
        text = body.decode("utf-8")
    except UnicodeDecodeError as e:
        raise BadBulkRequest(f"bulk body is not UTF-8: {e}") from None
    # single pass over the RAW line sequence (one json.loads per line):
    # blank lines are skipped only when EXPECTING an action line — the
    # line immediately after a doc-consuming action IS the document, and
    # a blank there means the shipper's framing is misaligned (the
    # reference's errWrongProtocol "empty document after action line",
    # `proxyapi/http_bulk.go:207-209`, pinned by its TestScanLines)
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # trailing newline
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        i += 1
        if not line.strip():
            continue  # blank while expecting an action: skipped
        if len(line.encode("utf-8")) > max_document_size:
            # reference --max-document-size: an oversized ACTION line is a
            # protocol error (`http_bulk.go:228-230` isPrefix)
            raise BadBulkRequest("action line is too long")
        try:
            action_obj = json.loads(line)
        except json.JSONDecodeError:
            res.items.append({"index": {"status": 400, "error": "malformed action"}})
            res.errors = True
            continue
        if not isinstance(action_obj, dict) or len(action_obj) != 1:
            res.items.append({"index": {"status": 400, "error": "malformed action"}})
            res.errors = True
            continue
        action = next(iter(action_obj))
        if action not in _ACTIONS:
            res.items.append({"index": {"status": 400, "error": f"unknown action {action}"}})
            res.errors = True
            continue
        if action == "delete":
            # delete carries no doc line
            res.items.append({action: {"status": 400, "error": "unsupported action"}})
            res.errors = True
            continue
        # every other action consumes the IMMEDIATE next line as its doc
        if i >= n:
            res.items.append({action: {"status": 400, "error": "missing document"}})
            res.errors = True
            break
        doc_line = lines[i]
        i += 1
        if not doc_line.strip():
            raise BadBulkRequest("empty document after action line")
        if action == "update":
            res.items.append({action: {"status": 400, "error": "unsupported action"}})
            res.errors = True
            continue
        if len(doc_line.encode("utf-8")) > max_document_size:
            # oversized documents are SKIPPED, never indexed — the
            # reference drops them with a metric (`http_bulk.go:195-205`);
            # the ES-shaped response carries a per-item 413 here
            res.items.append({action: {
                "status": 413,
                "error": f"document exceeds max-document-size {max_document_size}",
            }})
            res.errors = True
            continue
        try:
            doc = json.loads(doc_line)
        except json.JSONDecodeError:
            res.items.append({action: {"status": 400, "error": "malformed document"}})
            res.errors = True
            continue
        if not isinstance(doc, dict):
            # reference: errNotAnObject (`proxy/bulk/processor.go:62`)
            res.items.append({action: {"status": 400, "error": "not an object"}})
            res.errors = True
            continue
        res.docs.append(doc_line)
        res.items.append({action: {"status": 201}})
    return res


def bulk_to_df(spark: SparkSession, result: BulkResult) -> Optional[DataFrame]:
    """Raw-doc DataFrame from a parsed bulk, ready for ``ingest_docs``.

    Built from a pyarrow Table, not a Python tuple list: the Arrow path
    plans to a LocalTableScan with no pickled-RDD round trip, an ~10×
    cheaper driver step that is paid once per bulk on the hot ingest
    path."""
    if not result.docs:
        return None
    import pyarrow as pa

    table = pa.table({"raw": pa.array(result.docs, type=pa.string())})
    return spark.createDataFrame(table)
