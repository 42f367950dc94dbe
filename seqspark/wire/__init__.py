"""Pure-stdlib wire protocols: protobuf, HPACK, HTTP/2, gRPC.

The container ships no grpcio/protobuf/h2 wheels, so the gRPC transport
parity layer (reference `api/seqproxyapi/v1/seq_proxy_api.proto` served
by `proxyapi/grpc_v1.go`) is implemented from the public specs:

- :mod:`seqspark.wire.pb`     — protobuf wire format
  (https://protobuf.dev/programming-guides/encoding/);
- :mod:`seqspark.wire.hpack`  — RFC 7541 header compression;
- :mod:`seqspark.wire.h2`     — RFC 9113 HTTP/2 framing + flow control
  (h2c prior-knowledge, the insecure-channel mode gRPC clients use
  in-cluster);
- :mod:`seqspark.wire.grpc`   — the gRPC-over-HTTP/2 protocol
  (https://github.com/grpc/grpc/blob/master/doc/PROTOCOL-HTTP2.md):
  message framing, status codes, trailers;
- :mod:`seqspark.wire.seqproxy` — seqproxyapi.v1 message descriptors.

This is a transport layer only — every RPC lands on the same engine
methods the HTTP server uses (:mod:`seqspark.grpcapi`).

Interop validation, honestly stated: the container ships no external
gRPC client, so gRPC-layer conformance is established by (a) the RFC
7541 appendix C vectors byte-for-byte (Huffman table, integer coding,
dynamic-table request sequences), (b) protocol-rule tests (flow-control
windows and SETTINGS deltas, CONTINUATION reassembly, stream-id
ordering, frame size limits, gRPC framing/trailers/status/deadline/gzip
semantics), and (c) loopback e2e through this package's own client. The
HTTP/2 + HPACK layers additionally have REAL third-party interop
coverage: ``java.net.http.HttpClient`` (the JDK's independent
implementation, reached through the Spark JVM) drives the server via
the RFC 7540 §3.2 h2c Upgrade and native h2 streams — its
Huffman-coded headers decoded here, our frames consumed there
(``tests/test_wire.py::test_java_httpclient_interop``).
"""
