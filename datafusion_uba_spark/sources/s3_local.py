"""In-process S3 test double: the MinIO role, stdlib-only.

The reference proves its object-store source against a MinIO container
started by testcontainers (tests/test_with_minio.rs:30-70). This
sandbox can start neither containers nor servers with external
dependencies — but the S3 REST subset the source actually touches
(PutObject, GetObject incl. Range, ListObjectsV2 with continuation)
is a public spec, so this module implements it on
``http.server.ThreadingHTTPServer`` with an in-memory object map.

It is a CONFORMANCE double, not a mock: every request's AWS SigV4
signature is RE-DERIVED server-side from the configured credentials
and the actual request bytes (canonical request, string-to-sign,
signing-key chain — the same published algorithm the client follows)
and rejected with 403 on mismatch, and PutObject bodies are checked
against the signed x-amz-content-sha256. A client whose signing is
wrong in any byte fails here the way it would against AWS/MinIO.

Used by tests/test_s3a.py's pure-Python path and by the
``s3_nation_agg`` registry row (which starts a process-cached
instance, uploads the parquet twin, and reads back through
sources.s3_py.read_parquet_s3_py under the driver hash gate).
"""

from __future__ import annotations

import hashlib
import hmac
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from datafusion_uba_spark.sources.s3_py import signing_key

_NS = "http://s3.amazonaws.com/doc/2006-03-01/"


class LocalS3Server:
    """In-memory, SigV4-verifying S3 endpoint on 127.0.0.1:<ephemeral>."""

    def __init__(
        self,
        access_key: str = "test-access",
        secret_key: str = "test-secret",
        region: str = "us-east-1",
        page_size: int = 1000,
    ):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.page_size = page_size
        self.objects: dict[tuple[str, str], bytes] = {}
        # wire accounting for tests: the row-group pruning proof
        # asserts bytes_served << object size on a filtered ranged
        # read (the reference pins pruning at test_with_minio.rs:88)
        self.stats = {
            "get_requests": 0,
            "ranged_requests": 0,
            "bytes_served": 0,
            # per-key GetObject counts: partition-pruning tests assert
            # a pruned object's key never appears here at all
            "keys_fetched": {},
        }
        self._lock = threading.Lock()
        # in-flight multipart uploads: id -> {bucket, key, parts{n: bytes}}
        self.uploads: dict[str, dict] = {}
        # transient-failure injection: each queued HTTP code answers
        # exactly one request (after draining its body, so keep-alive
        # stays coherent) — lets tests exercise the client's
        # SlowDown/5xx retry-with-backoff path deterministically
        self.fail_queue: list[int] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # silence request logging
                pass

            def _deny(self, code: int, msg: str) -> None:
                body = msg.encode()
                self.send_response(code)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _verify(self, body: bytes) -> bool:
                auth = self.headers.get("Authorization", "")
                if not auth.startswith("AWS4-HMAC-SHA256 "):
                    return False
                parts = dict(
                    p.strip().split("=", 1)
                    for p in auth[len("AWS4-HMAC-SHA256 "):].split(",")
                )
                cred = parts.get("Credential", "").split("/")
                if len(cred) != 5 or cred[0] != outer.access_key:
                    return False
                _ak, date, region, service, _term = cred
                signed = parts.get("SignedHeaders", "").split(";")
                given_sig = parts.get("Signature", "")
                payload_hash = self.headers.get("x-amz-content-sha256", "")
                # the signed content hash must match the actual body
                if hashlib.sha256(body).hexdigest() != payload_hash:
                    return False
                split = urllib.parse.urlsplit(self.path)
                canon_uri = urllib.parse.quote(
                    urllib.parse.unquote(split.path) or "/", safe="/"
                )
                q = urllib.parse.parse_qsl(
                    split.query, keep_blank_values=True
                )
                canon_query = "&".join(
                    f"{urllib.parse.quote(k, safe='-_.~')}="
                    f"{urllib.parse.quote(v, safe='-_.~')}"
                    for k, v in sorted(q)
                )
                canon_headers = "".join(
                    f"{h}:{(self.headers.get(h) or '').strip()}\n"
                    for h in signed
                )
                canon_request = "\n".join(
                    (
                        self.command,
                        canon_uri,
                        canon_query,
                        canon_headers,
                        ";".join(signed),
                        payload_hash,
                    )
                )
                string_to_sign = "\n".join(
                    (
                        "AWS4-HMAC-SHA256",
                        self.headers.get("x-amz-date", ""),
                        f"{date}/{region}/{service}/aws4_request",
                        hashlib.sha256(
                            canon_request.encode()
                        ).hexdigest(),
                    )
                )
                want = hmac.new(
                    signing_key(outer.secret_key, date, region, service),
                    string_to_sign.encode(),
                    hashlib.sha256,
                ).hexdigest()
                return hmac.compare_digest(want, given_sig)

            def _bucket_key(self) -> tuple[str, str]:
                path = urllib.parse.unquote(
                    urllib.parse.urlsplit(self.path).path
                ).lstrip("/")
                bucket, _, key = path.partition("/")
                return bucket, key

            def _query(self) -> dict[str, str]:
                return dict(
                    urllib.parse.parse_qsl(
                        urllib.parse.urlsplit(self.path).query,
                        keep_blank_values=True,
                    )
                )

            def _injected(self) -> bool:
                with outer._lock:
                    code = (
                        outer.fail_queue.pop(0)
                        if outer.fail_queue
                        else None
                    )
                if code is None:
                    return False
                self._deny(
                    code, "SlowDown" if code == 503 else "InjectedError"
                )
                return True

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                if self._injected():
                    return
                if not self._verify(body):
                    return self._deny(403, "SignatureDoesNotMatch")
                bucket, key = self._bucket_key()
                if not bucket or not key:
                    return self._deny(400, "InvalidRequest")
                q = self._query()
                if "partNumber" in q and "uploadId" in q:
                    # UploadPart: stash under the in-flight upload and
                    # answer with the part's ETag (md5, quoted — the
                    # real S3 contract complete() validates against).
                    # Real S3 bounds part numbers to 1..10000 at PUT
                    # time (InvalidArgument) — the double must, or a
                    # client bug passes here and fails on AWS.
                    if not (1 <= int(q["partNumber"]) <= 10_000):
                        return self._deny(400, "InvalidArgument")
                    with outer._lock:
                        up = outer.uploads.get(q["uploadId"])
                        if up is None or up["bucket"] != bucket or (
                            up["key"] != key
                        ):
                            return self._deny(404, "NoSuchUpload")
                        up["parts"][int(q["partNumber"])] = body
                    etag = f'"{hashlib.md5(body).hexdigest()}"'
                    self.send_response(200)
                    self.send_header("ETag", etag)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                with outer._lock:
                    outer.objects[(bucket, key)] = body
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                if self._injected():
                    return
                if not self._verify(body):
                    return self._deny(403, "SignatureDoesNotMatch")
                bucket, key = self._bucket_key()
                if not bucket or not key:
                    return self._deny(400, "InvalidRequest")
                q = self._query()
                if "uploads" in q:  # CreateMultipartUpload
                    import uuid

                    upload_id = uuid.uuid4().hex
                    with outer._lock:
                        outer.uploads[upload_id] = {
                            "bucket": bucket, "key": key, "parts": {},
                        }
                    from xml.sax.saxutils import escape

                    resp = (
                        f'<?xml version="1.0" encoding="UTF-8"?>'
                        f'<InitiateMultipartUploadResult xmlns="{_NS}">'
                        f"<Bucket>{escape(bucket)}</Bucket>"
                        f"<Key>{escape(key)}</Key>"
                        f"<UploadId>{upload_id}</UploadId>"
                        f"</InitiateMultipartUploadResult>"
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/xml")
                    self.send_header("Content-Length", str(len(resp)))
                    self.end_headers()
                    self.wfile.write(resp)
                    return
                if "uploadId" in q:  # CompleteMultipartUpload
                    import xml.etree.ElementTree as _ET

                    with outer._lock:
                        up = outer.uploads.get(q["uploadId"])
                    if up is None or up["bucket"] != bucket or (
                        up["key"] != key
                    ):
                        return self._deny(404, "NoSuchUpload")
                    try:
                        root = _ET.fromstring(body)
                    except _ET.ParseError:
                        return self._deny(400, "MalformedXML")
                    # tolerate both bare and namespaced part XML (our
                    # client sends bare; boto3 namespaces it)
                    want: list[tuple[int, str]] = []
                    for part in root:
                        fields = {
                            c.tag.rsplit("}", 1)[-1]: (c.text or "")
                            for c in part
                        }
                        want.append(
                            (
                                int(fields["PartNumber"]),
                                fields["ETag"].strip(),
                            )
                        )
                    if not want:
                        # real S3: "You must specify at least one part"
                        # — an empty <Part> list must not pass the
                        # order check vacuously and materialize an
                        # empty object (r17 second review)
                        return self._deny(400, "InvalidRequest")
                    nums = [n for n, _ in want]
                    if any(not (1 <= n <= 10_000) for n in nums):
                        return self._deny(400, "InvalidArgument")
                    if nums != sorted(set(nums)):
                        # real S3 rejects duplicate or non-ascending
                        # part lists — the double must too
                        return self._deny(400, "InvalidPartOrder")
                    with outer._lock:
                        parts = up["parts"]
                        for num, etag in want:
                            if num not in parts:
                                return self._deny(400, "InvalidPart")
                            have = f'"{hashlib.md5(parts[num]).hexdigest()}"'
                            if etag.strip('"') != have.strip('"'):
                                return self._deny(400, "InvalidPart")
                        blob = b"".join(
                            parts[num] for num, _ in sorted(want)
                        )
                        outer.objects[(bucket, key)] = blob
                        del outer.uploads[q["uploadId"]]
                    from xml.sax.saxutils import escape

                    resp = (
                        f'<?xml version="1.0" encoding="UTF-8"?>'
                        f'<CompleteMultipartUploadResult xmlns="{_NS}">'
                        f"<Key>{escape(key)}</Key>"
                        f"</CompleteMultipartUploadResult>"
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/xml")
                    self.send_header("Content-Length", str(len(resp)))
                    self.end_headers()
                    self.wfile.write(resp)
                    return
                return self._deny(400, "InvalidRequest")

            def do_DELETE(self):
                if self._injected():
                    return
                if not self._verify(b""):
                    return self._deny(403, "SignatureDoesNotMatch")
                bucket, key = self._bucket_key()
                q = self._query()
                if "uploadId" in q:  # AbortMultipartUpload
                    with outer._lock:
                        up = outer.uploads.get(q["uploadId"])
                        if up is None or up["bucket"] != bucket or (
                            up["key"] != key
                        ):
                            return self._deny(404, "NoSuchUpload")
                        del outer.uploads[q["uploadId"]]
                    self.send_response(204)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                return self._deny(400, "InvalidRequest")

            def do_GET(self):
                if self._injected():
                    return
                if not self._verify(b""):
                    return self._deny(403, "SignatureDoesNotMatch")
                bucket, key = self._bucket_key()
                if key:  # GetObject
                    with outer._lock:
                        data = outer.objects.get((bucket, key))
                    if data is None:
                        return self._deny(404, "NoSuchKey")
                    rng = self.headers.get("range") or self.headers.get(
                        "Range"
                    )
                    code = 200
                    if rng and rng.startswith("bytes="):
                        # RFC 9110 §14.1.2: "lo-hi", open-ended "lo-",
                        # and suffix "-n" (final n bytes); an
                        # unsatisfiable range is 416
                        lo, _, hi = rng[6:].partition("-")
                        if lo == "":
                            n = int(hi)
                            if n == 0:
                                return self._deny(416, "RangeNotSatisfiable")
                            data = data[-n:]
                        else:
                            start = int(lo)
                            if start >= len(data):
                                return self._deny(416, "RangeNotSatisfiable")
                            end = int(hi) if hi else len(data) - 1
                            data = data[start : end + 1]
                        code = 206
                    with outer._lock:
                        outer.stats["get_requests"] += 1
                        outer.stats["ranged_requests"] += int(code == 206)
                        outer.stats["bytes_served"] += len(data)
                        outer.stats["keys_fetched"][key] = (
                            outer.stats["keys_fetched"].get(key, 0) + 1
                        )
                    self.send_response(code)
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                # ListObjectsV2
                q = self._query()
                if q.get("list-type") != "2":
                    return self._deny(400, "only ListObjectsV2 supported")
                prefix = q.get("prefix", "")
                after = q.get("continuation-token", "")
                with outer._lock:
                    keys = sorted(
                        k
                        for b, k in outer.objects
                        if b == bucket and k.startswith(prefix) and k > after
                    )
                    page = keys[: outer.page_size]
                    truncated = len(keys) > len(page)
                    sizes = {
                        k: len(outer.objects[(bucket, k)]) for k in page
                    }
                from xml.sax.saxutils import escape

                items = "".join(
                    f"<Contents><Key>{escape(k)}</Key>"
                    f"<Size>{sizes[k]}</Size></Contents>"
                    for k in page
                )
                nxt = (
                    f"<NextContinuationToken>{escape(page[-1])}"
                    f"</NextContinuationToken>"
                    if truncated
                    else ""
                )
                body = (
                    f'<?xml version="1.0" encoding="UTF-8"?>'
                    f'<ListBucketResult xmlns="{_NS}">'
                    f"<IsTruncated>{str(truncated).lower()}</IsTruncated>"
                    f"{items}{nxt}</ListBucketResult>"
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/xml")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def endpoint(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()
