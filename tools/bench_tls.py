"""gRPC transport microbench: h2c vs h2-over-TLS — what the TLS
handshake + record layer + the `_SerializedTLSSocket` serialization
shim cost, measured instead of assumed.

Deliberately NO Spark: the service is a pure-Python echo (unary) and a
100-message stream, so per-call engine cost (hundreds of ms of query
work that drowned the first version of this tool in warm-up ordering
bias) cannot contaminate the transport delta. Each transport is
measured twice, alternating (h2c, tls, h2c, tls); the second pass of
each overwrites the first, so warm-up lands in pass 1 for both equally.

Usage: python tools/bench_tls.py [--n 2000] [--threads 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqspark.wire import grpc as g  # noqa: E402
from seqspark.wire.pb import Field  # noqa: E402

REQ = {1: Field("name", "string"), 2: Field("n", "int64"),
       3: Field("vals", "double", repeated=True)}
RESP = {1: Field("echo", "string"), 2: Field("sum", "double")}


def measure(make_channel, n: int, threads: int) -> dict:
    # setup timed on a fresh channel (includes the TLS handshake)
    t0 = time.perf_counter()
    ch = make_channel()
    setup_ms = (time.perf_counter() - t0) * 1000
    req = {"name": "x" * 200, "n": 3, "vals": [1.0, 2.0]}
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        ch.unary("/t.S/Echo", req, REQ, RESP)
        lat.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    got = list(ch.server_streaming(
        "/t.S/Stream", {"name": "s", "n": 100, "vals": []}, REQ, RESP))
    stream_ms = (time.perf_counter() - t0) * 1000
    assert len(got) == 100
    errs: list = []

    def worker():
        try:
            for _ in range(n // threads):
                ch.unary("/t.S/Echo", req, REQ, RESP)
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    conc = time.perf_counter() - t0
    ch.close()
    total = (n // threads) * threads
    return {
        "setup_ms": round(setup_ms, 2),
        "unary_p50_us": round(statistics.median(lat) * 1e6, 1),
        "unary_p99_us": round(sorted(lat)[int(len(lat) * 0.99) - 1] * 1e6, 1),
        "stream100_ms": round(stream_ms, 2),
        "concurrent_qps": round(total / conc, 1),
        "concurrent_errors": len(errs),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    def echo(req, md):
        return {"echo": req["name"], "sum": float(req["n"])}

    def stream(req, md):
        for i in range(req["n"]):
            yield {"echo": f"{req['name']}-{i}", "sum": float(i)}

    methods = {
        "/t.S/Echo": g.Method(echo, REQ, RESP),
        "/t.S/Stream": g.Method(stream, REQ, RESP, server_streaming=True),
    }
    tmp = tempfile.mkdtemp(prefix="tlsbench_")
    cert, key = os.path.join(tmp, "c.pem"), os.path.join(tmp, "k.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "2", "-subj",
         "/CN=localhost", "-addext",
         "subjectAltName=DNS:localhost,IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    plain = g.GrpcServer(methods).start()
    tls = g.GrpcServer(methods, tls_cert=cert, tls_key=key).start()

    def mk_h2c():
        return g.GrpcChannel("127.0.0.1", plain.port)

    def mk_tls():
        return g.GrpcChannel("127.0.0.1", tls.port, tls_ca=cert,
                             server_hostname="localhost")

    out = {"metric": "seqspark_grpc_tls_overhead", "n": args.n,
           "threads": args.threads}
    # alternate: pass 1 warms interpreter-level costs, pass 2 reported
    for kind, mk in (("h2c", mk_h2c), ("tls", mk_tls),
                     ("h2c", mk_h2c), ("tls", mk_tls)):
        out[kind] = measure(mk, args.n, args.threads)
    print(json.dumps(out))
    plain.stop()
    tls.stop()


if __name__ == "__main__":
    main()
