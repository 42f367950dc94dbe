"""api.StoreApi gRPC service — the reference's INTERNAL proxy→store
wire protocol (`api/storeapi/store_api.proto`,
`storeapi/grpc_search.go` / `grpc_fetch.go` / `store_api.go`) served
over the same stdlib h2 stack as the public seqproxyapi transport.

Until r13 the engine implemented the storeapi SEMANTICS (search
lifecycle, fetch filters, async resume) but only exposed them through
the public proxy surface; this module closes the wire gap so a drill
can ship BULKS over gRPC and kill the process mid-flight — the one
crash surface the r12 drill left untested (HTTP bulk shares the engine
but not the framing code).

Semantics mapping (documented adaptations, wire shape unchanged):

- ``Bulk``: the reference's ``docs``/``metas`` carry its proprietary
  binary doc+meta packing from the proxy ingestor; here they carry
  newline-delimited JSON (docs = one JSON doc per line, metas unused
  except for count validation). The handler feeds the SAME group-commit
  append path as HTTP `_bulk` (``SeqSparkServer.bulk``), so an acked
  Bulk has identical durability: rows are parquet on disk before the
  Empty response is sent.
- ``Search``: ``from``/``to`` are MID units (epoch millis, the
  reference's seq.MID). Hits return as ``id_sources`` (mid/rid pairs +
  the hex seq-id as hint); aggregations map onto the store
  ``Agg.agg_histogram`` histograms (count→total, sum/min/max→their
  field + total, avg→sum+total so the caller divides, like the
  reference's proxy-side merge; quantile→samples), timeseries onto
  ``Agg.timeseries`` bins.
- ``StartAsyncSearch`` honors the CALLER-supplied ``search_id`` (the
  proxy generates it in the reference) and persists the job through the
  same ``AsyncSearcher`` the restart drill resumes.
- ``Fetch`` streams one ``BinaryData`` per requested hex seq-id, in
  request order, honoring ``fields_filter`` allow/block lists
  (`storeapi/grpc_fetch.go:170-216`).
- ``Status`` returns ``oldest_time`` from the store status.
"""

from __future__ import annotations

import json
from typing import Iterator

from .grpcapi import seq_id_parse, seq_id_str
from .wire import storeapi as sa
from .wire.grpc import (
    GrpcError,
    GrpcServer,
    INTERNAL,
    INVALID_ARGUMENT,
    Method,
    NOT_FOUND,
)
from .wire.seqproxy import ms_to_ts


class StoreGrpc:
    """StoreApi front end bound to a :class:`~seqspark.server.SeqSparkServer`
    core (like :class:`~seqspark.grpcapi.SeqProxyGrpc`, construct the
    core unstarted if only this transport is wanted)."""

    def __init__(self, core, host: str = "127.0.0.1", port: int = 0,
                 tls_cert=None, tls_key=None):
        self.core = core
        m = lambda fn, req, resp, streaming=False: Method(
            fn, req, resp, server_streaming=streaming
        )
        self._server = GrpcServer(
            {
                f"{sa.SERVICE}/Bulk": m(self.bulk, sa.BULK_REQUEST, sa.EMPTY),
                f"{sa.SERVICE}/Search": m(
                    self.search, sa.SEARCH_REQUEST, sa.SEARCH_RESPONSE
                ),
                f"{sa.SERVICE}/StartAsyncSearch": m(
                    self.start_async,
                    sa.START_ASYNC_SEARCH_REQUEST,
                    sa.START_ASYNC_SEARCH_RESPONSE,
                ),
                f"{sa.SERVICE}/FetchAsyncSearchResult": m(
                    self.fetch_async,
                    sa.FETCH_ASYNC_SEARCH_RESULT_REQUEST,
                    sa.FETCH_ASYNC_SEARCH_RESULT_RESPONSE,
                ),
                f"{sa.SERVICE}/Fetch": m(
                    self.fetch, sa.FETCH_REQUEST, sa.BINARY_DATA,
                    streaming=True,
                ),
                f"{sa.SERVICE}/Status": m(
                    self.status, sa.STATUS_REQUEST, sa.STATUS_RESPONSE
                ),
            },
            host=host, port=port, tls_cert=tls_cert, tls_key=tls_key,
        )

    @property
    def port(self):
        return self._server.port

    def start(self) -> "StoreGrpc":
        self._server.start()
        return self

    def stop(self) -> None:
        self._server.stop()

    # ------------------------------------------------------------- helpers

    @staticmethod
    def _dialect(metadata: dict):
        hdr = metadata.get("use-seq-ql")
        if hdr is None:
            return None
        return "seqql" if hdr.strip().lower() in ("1", "t", "true") else "legacy"

    def _hreq(self, req: dict, metadata: dict) -> dict:
        hreq = {
            "query": req.get("query") or "*",
            "from_ms": req.get("from"),
            "to_ms": req.get("to"),
            # `storeapi/grpc_search.go:95` limit := size + offset — a
            # zero size means ZERO docs (the proxy's aggs-only searches),
            # not a server-chosen page default
            "size": int(req.get("size") or 0),
            "offset": int(req.get("offset") or 0),
            "order": sa.ORDER.get(int(req.get("order") or 0), "desc"),
        }
        d = self._dialect(metadata)
        if d:
            hreq["dialect"] = d
        return hreq

    @staticmethod
    def _agg_reqs(aggs) -> list:
        out = []
        for a in aggs or ():
            func = sa.AGG_FUNC.get(int(a.get("func") or 0))
            if func is None:
                raise GrpcError(INVALID_ARGUMENT, "unknown agg func")
            e = {"func": func, "field": a.get("field") or ""}
            if a.get("group_by"):
                e["group_by"] = a["group_by"]
            if a.get("quantiles"):
                e["quantiles"] = list(a["quantiles"])
            if a.get("interval"):
                e["interval_ms"] = int(a["interval"])
            out.append(e)
        return out

    @staticmethod
    def _hist_of(func: str, r: dict) -> dict:
        """One complex-search agg bucket row (mid_ms/name/value/
        not_exists/q*) -> store Histogram: the field the reference's
        proxy merge reads for this func, plus the counts."""
        h: dict = {"not_exists": int(r.get("not_exists") or 0)}
        v = r.get("value")
        fv = 0.0 if v is None or v != v else float(v)
        if func in ("count", "unique"):
            h["total"] = int(fv)
        elif func == "sum":
            h["sum"] = fv
        elif func == "min":
            h["min"] = fv
        elif func == "max":
            h["max"] = fv
        elif func == "avg":
            # callers divide sum/total (proxy-side merge semantics); the
            # engine computed the final value, so ship it as sum with
            # total=1 — the division reproduces it exactly
            h["sum"] = fv
            h["total"] = 1
        elif func == "quantile":
            qkeys = sorted(
                (k for k in r if k.startswith("q") and k[1:].isdigit()),
                key=lambda k: int(k[1:]),
            )
            h["samples"] = [
                0.0 if r[k] is None else float(r[k]) for k in qkeys
            ]
        return h

    def _response_proto(self, resp: dict, agg_reqs: list) -> dict:
        out: dict = {
            "id_sources": [
                {
                    "id": {"mid": int(d["mid"]),
                           "rid": int(d["rid"]) & (1 << 64) - 1},
                    "hint": seq_id_str(d["mid"], d["rid"]),
                }
                for d in resp.get("docs", ())
            ],
        }
        if resp.get("total") is not None:
            out["total"] = int(resp["total"])
        aggs_out = []
        for spec, rows in zip(agg_reqs, resp.get("aggs", ())):
            agg: dict = {"agg_histogram": [], "timeseries": []}
            func = spec["func"]
            total_ne = 0
            for r in rows:
                total_ne += int(r.get("not_exists") or 0)
                if r.get("mid_ms") is not None:
                    agg["timeseries"].append({
                        "label": ("" if r.get("name") is None
                                  else str(r["name"])),
                        "ts": ms_to_ts(int(r["mid_ms"])),
                        "hist": self._hist_of(func, r),
                    })
                else:
                    agg["agg_histogram"].append({
                        "key": ("" if r.get("name") is None
                                else str(r["name"])),
                        "value": self._hist_of(func, r),
                    })
            agg["not_exists"] = total_ne
            aggs_out.append(agg)
        if aggs_out:
            out["aggs"] = aggs_out
        hist = resp.get("histogram")
        if hist:
            out["histogram"] = [
                {"key": int(ms), "value": int(cnt)}
                for ms, cnt in sorted((int(k), v) for k, v in hist.items())
            ]
        if resp.get("partial_response"):
            out["errors"] = ["partial response: cold tier unreachable"]
        return out

    # ------------------------------------------------------------- methods

    def bulk(self, req: dict, metadata: dict) -> dict:
        docs = req.get("docs") or b""
        lines = [ln for ln in bytes(docs).split(b"\n") if ln.strip()]
        count = int(req.get("count") or 0)
        if count and count != len(lines):
            raise GrpcError(
                INVALID_ARGUMENT,
                f"count={count} but docs carries {len(lines)} lines",
            )
        if not lines:
            return {}
        body = b"\n".join(b'{"index": {}}\n' + ln for ln in lines)
        resp = self.core.bulk(body, gzipped=False)
        if resp.get("errors"):
            first = next(
                (it["index"].get("error") for it in resp.get("items", ())
                 if it.get("index", {}).get("error")),
                "bulk failed",
            )
            raise GrpcError(INTERNAL, str(first))
        return {}

    def search(self, req: dict, metadata: dict) -> dict:
        hreq = self._hreq(req, metadata)
        agg_reqs = self._agg_reqs(req.get("aggs"))
        hreq["with_total"] = bool(req.get("with_total"))
        try:
            if agg_reqs or req.get("interval"):
                hreq["aggs"] = agg_reqs
                if req.get("interval"):
                    hreq["hist_interval_ms"] = int(req["interval"])
                resp = self.core.complex(hreq)
            else:
                resp = self.core.search(hreq)
        except (ValueError, KeyError) as e:
            raise GrpcError(INVALID_ARGUMENT, str(e)) from None
        return self._response_proto(resp, agg_reqs)

    def start_async(self, req: dict, metadata: dict) -> dict:
        sid = req.get("search_id") or ""
        if not sid:
            raise GrpcError(INVALID_ARGUMENT, "search_id must be provided")
        hreq = {
            "query": req.get("query") or "*",
            "from_ms": req.get("from"),
            "to_ms": req.get("to"),
            "with_total": True,
            "order": sa.ORDER.get(int(req.get("order") or 0), "desc"),
            "aggs": self._agg_reqs(req.get("aggs")),
        }
        if req.get("histogram_interval"):
            hreq["hist_interval_ms"] = int(req["histogram_interval"])
        d = self._dialect(metadata)
        if d:
            hreq["dialect"] = d
        req_json = json.dumps(hreq)
        try:
            self.core._async.start(
                req_json, self.core._async_factory(req_json), job_id=sid
            )
        except ValueError as e:
            raise GrpcError(INVALID_ARGUMENT, str(e)) from None
        return {}

    def fetch_async(self, req: dict, metadata: dict) -> dict:
        sid = req.get("search_id") or ""
        hreq = {
            "search_id": sid,
            "with_docs": bool(req.get("with_docs")),
            "offset": int(req.get("offset") or 0),
        }
        if int(req.get("size") or 0) > 0:
            hreq["size"] = int(req["size"])
        try:
            res = self.core.async_fetch(hreq)
        except KeyError:
            raise GrpcError(NOT_FOUND, f"unknown search_id {sid!r}") from None
        out: dict = {
            "done": bool(res.get("done")),
            "expiration": ms_to_ts(res.get("expiration_ms")),
        }
        meta = json.loads(self.core._async.status(sid).get("query") or "{}")
        aggs_back = []
        for a in meta.get("aggs") or ():
            rev = {v: k for k, v in sa.AGG_FUNC.items()}
            e = {"field": a.get("field", ""), "func": rev[a["func"]]}
            if a.get("group_by"):
                e["group_by"] = a["group_by"]
            if a.get("quantiles"):
                e["quantiles"] = a["quantiles"]
            if a.get("interval_ms"):
                e["interval"] = int(a["interval_ms"])
            aggs_back.append(e)
        if aggs_back:
            out["aggs"] = aggs_back
        if meta.get("hist_interval_ms"):
            out["histogram_interval"] = int(meta["hist_interval_ms"])
        if res.get("done") and "response" in res:
            out["response"] = self._response_proto(
                res["response"], meta.get("aggs") or [])
        return out

    def fetch(self, req: dict, metadata: dict) -> Iterator[dict]:
        ids = list(req.get("ids") or ())
        ids += [h["id"] for h in req.get("ids_with_hints") or () if h.get("id")]
        try:
            pairs = [seq_id_parse(s) for s in ids]
        except ValueError as e:
            raise GrpcError(INVALID_ARGUMENT, str(e)) from None
        hreq: dict = {"ids": [[m, r] for m, r in pairs]}
        ff = req.get("fields_filter")
        if ff and ff.get("fields"):
            hreq["fields"] = list(ff["fields"])
            # proto allow_list=True means "keep only these"; the HTTP
            # core's "except" flag is the block-list direction
            hreq["except"] = not ff.get("allow_list")
        resp = self.core.fetch(hreq)
        by_id = {(d["mid"], d["rid"]): d["data"] for d in resp.get("docs", ())}
        for m, r in pairs:
            data = by_id.get((m, r))
            yield {"data": (data if isinstance(data, (bytes, bytearray))
                            else (data or "").encode())}

    def status(self, req: dict, metadata: dict) -> dict:
        st = self.core.status()
        out: dict = {}
        if st.get("oldest_ms") is not None:
            out["oldest_time"] = ms_to_ts(int(st["oldest_ms"]))
        return out
