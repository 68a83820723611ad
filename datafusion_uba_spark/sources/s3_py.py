"""Pure-Python S3 object-store source (SigV4 + ListObjectsV2 + GET).

The reference proves its object-store path with a MinIO integration
test: register an S3 listing table with a ``.parquet`` suffix filter
and run the retention queries over it (tests/test_with_minio.rs:72-92).
Spark's equivalent fast path is the ``s3a://`` Hadoop connector —
configured by ``session.configure_s3a`` — but the hadoop-aws jars
cannot be installed in this sandbox, so through r15 that capability
was code with an env-gated skip (SURVEY §2 S3, "partial/untested").

The S3 REST API itself, though, is a small PUBLIC specification (AWS
Signature Version 4 signing, ListObjectsV2, ranged GetObject), all
implementable with the standard library. This module is the
dependency-free face, the avro_py precedent applied to the object
store:

- ``sign_v4`` implements AWS SigV4 header signing exactly per the
  published algorithm (canonical request -> string-to-sign -> derived
  signing key -> hex HMAC), so the path is conformance-testable: the
  in-process server (sources/s3_local.py) RE-DERIVES the signature
  server-side and rejects mismatches, which a hand-rolled mock that
  ignores auth would never catch.
- ``S3Client`` speaks ListObjectsV2 (XML, continuation tokens),
  GetObject (with optional Range), PutObject, over plain
  ``urllib`` — works against AWS, MinIO, or the local test double;
  endpoint-style addressing (path-style URLs, the MinIO default).
- ``read_parquet_s3_py(spark, ...)`` is the reference's listing-table
  scan re-expressed: the DRIVER lists keys under the prefix and
  applies the extension filter (cheap metadata, like the reference's
  ListingTable resolution), then the keys are distributed and each
  TASK fetches its objects and decodes parquet from bytes via
  pyarrow — one object per task unit, no shuffle, corpus bytes never
  touch the driver.

Production guidance stays unchanged: use the jar-backed s3a connector
when the classpath allows (pushdown into footers, multipart ranged
reads). This path is the in-sandbox proof of the object-store
semantics and a genuinely useful escape hatch for control-plane-sized
reads on jar-less clients.
"""

from __future__ import annotations

import concurrent.futures
import datetime
import hashlib
import hmac
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

# --- AWS Signature Version 4 (public spec) -------------------------------------


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def signing_key(
    secret_key: str, date: str, region: str, service: str = "s3"
) -> bytes:
    """kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    service), "aws4_request") — the published derivation chain."""
    k = _hmac(("AWS4" + secret_key).encode("utf-8"), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign_v4(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    service: str = "s3",
    amz_date: str | None = None,
) -> dict[str, str]:
    """Return ``headers`` plus x-amz-date, x-amz-content-sha256, and
    the SigV4 Authorization header for this request.

    The URL's path must already be in canonical (single
    percent-encoded) form — it is used VERBATIM as the SigV4
    canonical URI, the botocore convention: the bytes on the wire are
    the bytes that were signed, so client and server can never
    disagree about encoding. ``S3Client`` quotes object keys once
    when building the path."""
    parsed = urllib.parse.urlsplit(url)
    if amz_date is None:
        amz_date = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        )
    date = amz_date[:8]
    payload_hash = hashlib.sha256(payload).hexdigest()
    out = dict(headers)
    out["host"] = parsed.netloc
    out["x-amz-date"] = amz_date
    out["x-amz-content-sha256"] = payload_hash

    # canonical request: METHOD \n canonical-uri \n canonical-query \n
    # canonical-headers \n signed-headers \n payload-hash
    canon_uri = parsed.path or "/"
    q = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
    canon_query = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}="
        f"{urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(q)
    )
    signed_names = sorted(h.lower() for h in out)
    canon_headers = "".join(
        f"{h}:{str(out[next(k for k in out if k.lower() == h)]).strip()}\n"
        for h in signed_names
    )
    signed_headers = ";".join(signed_names)
    canon_request = "\n".join(
        (
            method.upper(),
            canon_uri,
            canon_query,
            canon_headers,
            signed_headers,
            payload_hash,
        )
    )
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        (
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canon_request.encode("utf-8")).hexdigest(),
        )
    )
    sig = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign.encode("utf-8"),
        hashlib.sha256,
    ).hexdigest()
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={sig}"
    )
    return out


# --- minimal S3 client ----------------------------------------------------------


class S3Client:
    """Path-style S3 client over urllib: list/get/put, SigV4-signed.

    Transient failures retry with capped exponential backoff + full
    jitter (the published AWS guidance): HTTP 429/500/502/503/504 —
    notably S3's ``503 SlowDown``, which a wide scan (every executor
    of a 1000-node cluster hitting one prefix) WILL see — and
    connection-level errors (reset, timeout). Every attempt re-signs
    (fresh ``x-amz-date``, so a long backoff never walks out of
    SigV4's clock window). Other 4xx raise immediately — they are
    deterministic (auth, missing key, bad request) and retrying them
    only hides the bug. All verbs retry on these codes, matching the
    AWS SDK retry policy (CreateMultipartUpload/Complete included —
    a 5xx leaves server state unknown either way, and Complete's
    200-with-Error-body case is handled separately by the caller)."""

    _RETRYABLE = frozenset({429, 500, 502, 503, 504})

    def __init__(
        self,
        endpoint: str,
        access_key: str,
        secret_key: str,
        region: str = "us-east-1",
        max_retries: int = 4,
        retry_base_sleep: float = 0.25,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.max_retries = max_retries
        self.retry_base_sleep = retry_base_sleep

    def _attempt(
        self,
        method: str,
        url: str,
        body: bytes,
        extra_headers: dict | None,
        want_headers: bool,
    ):
        headers = sign_v4(
            method,
            url,
            extra_headers or {},
            body,
            self.access_key,
            self.secret_key,
            self.region,
        )
        req = urllib.request.Request(
            url,
            data=body if method in ("PUT", "POST") else None,
            method=method,
        )
        for k, v in headers.items():
            if k.lower() != "host":  # urllib sets Host itself
                req.add_header(k, v)
        with urllib.request.urlopen(req, timeout=60) as resp:
            data = resp.read()
            if want_headers:
                return data, dict(resp.headers)
            return data

    def _request(
        self,
        method: str,
        path: str,
        query: str = "",
        body: bytes = b"",
        extra_headers: dict | None = None,
        want_headers: bool = False,
    ):
        import random
        import time

        url = f"{self.endpoint}{path}" + (f"?{query}" if query else "")
        if method in ("PUT", "POST") and body:
            # urllib defaults bodies to x-www-form-urlencoded, which
            # WSGI servers (moto/werkzeug) parse as a form and drop
            # from request.data — declare the real content type
            extra_headers = {
                "content-type": "application/octet-stream",
                **(extra_headers or {}),
            }
        for attempt in range(self.max_retries + 1):
            try:
                return self._attempt(
                    method, url, body, extra_headers, want_headers
                )
            except urllib.error.HTTPError as e:
                if (
                    e.code not in self._RETRYABLE
                    or attempt == self.max_retries
                ):
                    raise
            except (urllib.error.URLError, ConnectionError, TimeoutError):
                if attempt == self.max_retries:
                    raise
            # full jitter: sleep U(0, base * 2^attempt), capped
            time.sleep(
                random.random()
                * min(self.retry_base_sleep * (2 ** attempt), 10.0)
            )

    @staticmethod
    def _object_path(bucket: str, key: str) -> str:
        # one canonical percent-encoding: the wire path IS the SigV4
        # canonical URI (spaces, '#', '?', '=', unicode in keys all
        # survive; raw '#'/'?' would otherwise truncate the URL path)
        return f"/{bucket}/{urllib.parse.quote(key, safe='/')}"

    def put_object(self, bucket: str, key: str, body: bytes) -> None:
        self._request("PUT", self._object_path(bucket, key), body=body)

    def get_object(
        self, bucket: str, key: str, byte_range: tuple[int, int] | None = None
    ) -> bytes:
        extra = (
            {"range": f"bytes={byte_range[0]}-{byte_range[1]}"}
            if byte_range
            else None
        )
        return self._request(
            "GET", self._object_path(bucket, key), extra_headers=extra
        )

    def list_objects(self, bucket: str, prefix: str = "") -> list[tuple[str, int]]:
        """ListObjectsV2 with continuation: [(key, size), ...]."""
        out: list[tuple[str, int]] = []
        token: str | None = None
        while True:
            q = "list-type=2&prefix=" + urllib.parse.quote(prefix, safe="")
            if token:
                q += "&continuation-token=" + urllib.parse.quote(token, safe="")
            data = self._request("GET", f"/{bucket}", query=q)
            root = ET.fromstring(data)
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag[: root.tag.index("}") + 1]
            for c in root.findall(f"{ns}Contents"):
                out.append(
                    (
                        c.find(f"{ns}Key").text,
                        int(c.find(f"{ns}Size").text),
                    )
                )
            trunc = root.find(f"{ns}IsTruncated")
            if trunc is None or trunc.text != "true":
                return out
            token = root.find(f"{ns}NextContinuationToken").text

    # --- multipart upload (the public three-call protocol) ---------------

    def create_multipart_upload(self, bucket: str, key: str) -> str:
        data = self._request(
            "POST", self._object_path(bucket, key), query="uploads"
        )
        root = ET.fromstring(data)
        ns = root.tag[: root.tag.index("}") + 1] if root.tag.startswith("{") else ""
        return root.find(f"{ns}UploadId").text

    def upload_part(
        self, bucket: str, key: str, upload_id: str, part_number: int,
        body: bytes,
    ) -> str:
        """Returns the part's ETag (needed by complete)."""
        q = (
            f"partNumber={part_number}&uploadId="
            + urllib.parse.quote(upload_id, safe="")
        )
        _, headers = self._request(
            "PUT",
            self._object_path(bucket, key),
            query=q,
            body=body,
            want_headers=True,
        )
        etag = {k.lower(): v for k, v in headers.items()}.get("etag")
        if not etag:
            raise ValueError("UploadPart response carried no ETag")
        return etag

    def complete_multipart_upload(
        self, bucket: str, key: str, upload_id: str,
        parts: list[tuple[int, str]],
    ) -> None:
        """``parts``: [(part_number, etag), ...] in ascending order.

        Real S3 can answer CompleteMultipartUpload with HTTP 200 OK
        whose BODY is an <Error> document (documented AWS behavior
        for failures detected mid-completion) — the response body is
        therefore parsed and such an error raised, never swallowed."""
        body = (
            "<CompleteMultipartUpload>"
            + "".join(
                f"<Part><PartNumber>{n}</PartNumber>"
                f"<ETag>{etag}</ETag></Part>"
                for n, etag in parts
            )
            + "</CompleteMultipartUpload>"
        ).encode()
        resp = self._request(
            "POST",
            self._object_path(bucket, key),
            query="uploadId=" + urllib.parse.quote(upload_id, safe=""),
            body=body,
        )
        try:
            root = ET.fromstring(resp)
        except ET.ParseError:
            return  # non-XML 200 body: treat as success
        if root.tag.rsplit("}", 1)[-1] == "Error":
            raise OSError(
                "CompleteMultipartUpload returned 200 with an Error "
                f"body: {resp[:500]!r}"
            )

    def abort_multipart_upload(
        self, bucket: str, key: str, upload_id: str
    ) -> None:
        """AbortMultipartUpload: frees the in-flight upload's parts
        (real S3 bills stored parts until aborted)."""
        self._request(
            "DELETE",
            self._object_path(bucket, key),
            query="uploadId=" + urllib.parse.quote(upload_id, safe=""),
        )

    def put_object_multipart(
        self,
        bucket: str,
        key: str,
        body: bytes,
        part_size: int = 64 * 1024 * 1024,
        aws_limits: bool = True,
        max_concurrency: int = 8,
    ) -> None:
        """Upload via the multipart protocol when the body exceeds one
        part (single PutObject is capped at 5 GB on real S3 and moves
        the whole object in one request either way); bodies that fit
        one part fall back to plain PutObject.

        ``aws_limits`` enforces real S3's constraints up front so a
        doomed upload fails BEFORE any bytes cross the wire: non-final
        parts >= 5 MiB, at most 10,000 parts. Disable only against
        test endpoints. On any failure after CreateMultipartUpload the
        in-flight upload is ABORTED before re-raising — orphaned parts
        accrue storage charges on real S3.

        Parts upload concurrently on a bounded thread pool
        (``max_concurrency``, r17 verdict #5) — UploadPart is
        order-independent on the wire (each request names its
        PartNumber; only the CompleteMultipartUpload manifest must be
        ascending, which is re-sorted here after the pool drains), and
        ``_request`` holds no shared mutable state, so threads are
        safe. On a part failure the pool's context exit WAITS for
        in-flight parts before AbortMultipartUpload runs — no part PUT
        ever races the abort."""
        if len(body) <= part_size:
            return self.put_object(bucket, key, body)
        n_parts = -(-len(body) // part_size)
        if aws_limits:
            if part_size < 5 * 1024 * 1024:
                raise ValueError(
                    f"part_size {part_size} is below real S3's 5 MiB "
                    "minimum for non-final parts (EntityTooSmall at "
                    "complete time); pass aws_limits=False only for "
                    "test endpoints"
                )
            if n_parts > 10_000:
                raise ValueError(
                    f"{n_parts} parts exceeds real S3's 10,000-part "
                    "cap; raise part_size"
                )
        upload_id = self.create_multipart_upload(bucket, key)
        try:
            offsets = list(enumerate(range(0, len(body), part_size), start=1))

            def _one(item: tuple[int, int]) -> tuple[int, str]:
                i, off = item
                return i, self.upload_part(
                    bucket, key, upload_id, i, body[off : off + part_size]
                )

            with concurrent.futures.ThreadPoolExecutor(
                max_workers=max(1, min(max_concurrency, len(offsets)))
            ) as pool:
                # completion order is arbitrary; the manifest must be
                # ascending by part number
                parts = sorted(pool.map(_one, offsets))
            self.complete_multipart_upload(bucket, key, upload_id, parts)
        except BaseException:
            try:
                self.abort_multipart_upload(bucket, key, upload_id)
            except Exception:
                pass  # the original failure is the one to surface
            raise


class S3RangedFile:
    """Seekable read-only file over S3 ranged GETs — the object-store
    half of the reference's row-group pruning claim
    (test_with_minio.rs:88): hand this to ``pyarrow.parquet`` and the
    reader fetches the FOOTER via ranged reads, evaluates row-group
    min/max statistics against the pushed filters, and requests only
    the byte ranges of surviving row groups — the corpus bytes that
    lose the predicate never cross the wire. At 100 TB that is the
    difference between scanning a column band and downloading the
    lake.

    Implements the file protocol pyarrow needs (read/seek/tell/size,
    binary mode). A small LRU block cache (``cache_blocks`` most
    recent fetched ranges) serves any read fully contained in an
    already-fetched range from memory — in particular pyarrow's
    64 KB speculative FOOTER tail stays resident, so metadata
    re-reads and column chunks that happen to fall inside the tail
    never re-cross the wire. The cache only ever DEDUPLICATES
    fetches; it never pads a request, so bytes moved are <= the
    uncached path, while ``request_count`` (ranged GETs actually
    issued) drops. Remaining cost model: one GET per projected
    column chunk outside cached ranges — at 100 TB prefer few, large
    row groups (128 MB+) so requests stay O(row groups), and the
    jar-backed s3a connector where the classpath allows."""

    def __init__(
        self,
        client: "S3Client",
        bucket: str,
        key: str,
        size: int,
        cache_blocks: int = 4,
    ):
        self._c = client
        self._bucket = bucket
        self._key = key
        self._size = size
        self._pos = 0
        self.closed = False
        self.mode = "rb"
        self.request_count = 0
        self._cache_blocks = max(0, cache_blocks)
        self._cache: list[tuple[int, bytes]] = []  # LRU, newest last
        # the footer cache: a block reaching EOF (pyarrow's 64 KB
        # speculative tail) is PINNED, not LRU'd — metadata re-reads
        # and column chunks inside the tail stay off the wire
        self._tail: tuple[int, bytes] | None = None

    def size(self) -> int:
        return self._size

    def tell(self) -> int:
        return self._pos

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def seek(self, offset: int, whence: int = 0) -> int:
        base = (0, self._pos, self._size)[whence]
        self._pos = max(0, base + offset) if whence else max(0, offset)
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        if n == 0 or self._pos >= self._size:
            return b""
        end = min(self._pos + n, self._size)
        if self._tail is not None:
            start, blob = self._tail
            if start <= self._pos and end <= start + len(blob):
                data = blob[self._pos - start : end - start]
                self._pos = end
                return data
        for i, (start, blob) in enumerate(self._cache):
            if start <= self._pos and end <= start + len(blob):
                # fully inside a cached range: serve locally (LRU bump)
                self._cache.append(self._cache.pop(i))
                data = blob[self._pos - start : end - start]
                self._pos = end
                return data
        data = self._c.get_object(
            self._bucket, self._key, byte_range=(self._pos, end - 1)
        )
        self.request_count += 1
        if self._cache_blocks:
            if self._tail is None and self._pos + len(data) >= self._size:
                self._tail = (self._pos, data)
            else:
                self._cache.append((self._pos, data))
                del self._cache[: -self._cache_blocks]
        self._pos += len(data)
        return data

    def close(self) -> None:
        self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# --- Spark face ------------------------------------------------------------------


def _hive_partition_values(key: str, prefix: str) -> dict[str, str]:
    """Parse ``name=value`` directory segments between the listing
    prefix and the object basename (the Hive layout the reference's
    listing tables resolve — setup.rs:86-118 partitioned dirs,
    test_with_minio.rs:89-92 listing options). Values are
    percent-decoded the way Hive writers escape them."""
    rel = key[len(prefix):] if key.startswith(prefix) else key
    out: dict[str, str] = {}
    for seg in rel.split("/")[:-1]:
        name, eq, val = seg.partition("=")
        if eq and name:
            out[name] = urllib.parse.unquote(val)
    return out


def _coerce_like(raw: str, like):
    """Cast a raw partition string to the type of a filter operand."""
    if isinstance(like, bool):
        return raw.lower() in ("true", "t", "1")
    if isinstance(like, int):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    if isinstance(like, datetime.datetime):
        # TypeError, not ValueError: a timestamp operand is a type-level
        # misuse of the API, distinct from a partition VALUE failing to
        # parse (which _partition_pred_holds maps to exact three-valued
        # semantics below)
        raise TypeError(
            "timestamp partition predicates are unsupported (timestamps "
            "have no hive key round trip)"
        )
    if isinstance(like, datetime.date):
        return datetime.date.fromisoformat(raw)
    return raw


def _partition_pred_holds(raw: str, op: str, val) -> bool:
    if raw == HIVE_NULL_PARTITION:
        # SQL three-valued logic: a NULL partition value satisfies no
        # predicate (not even != / not-in), matching Spark's own
        # partition pruning over __HIVE_DEFAULT_PARTITION__ dirs
        return False
    if op in ("in", "not in"):
        vals = list(val)
        like = vals[0] if vals else ""
        try:
            hit = _coerce_like(raw, like) in vals
        except ValueError:
            # a value that does not parse as the operand type cannot
            # EQUAL any operand — exact for membership (see below)
            hit = False
        return hit if op == "in" else not hit
    try:
        typed = _coerce_like(raw, val)
    except ValueError as e:
        # Foreign layouts can mix parsable and unparsable values under
        # one column (r17 second review: this aborted the whole read).
        # Equality is decidable without the parse — an unparsable value
        # is never equal to the typed operand, and always unequal — so
        # = / != stay EXACT. Ordering is genuinely undefined for such a
        # value: raise, with the offending raw value named (the read
        # loop adds the object key).
        if op in ("=", "=="):
            return False
        if op == "!=":
            return True
        raise ValueError(
            f"partition value {raw!r} does not parse as the "
            f"{op!r}-predicate operand's type "
            f"({type(val).__name__}): {e}"
        ) from e
    if op in ("=", "=="):
        return typed == val
    if op == "!=":
        return typed != val
    if op == "<":
        return typed < val
    if op == "<=":
        return typed <= val
    if op == ">":
        return typed > val
    if op == ">=":
        return typed >= val
    raise ValueError(f"unsupported partition filter op {op!r}")


# Hive's directory name for a NULL partition value
HIVE_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"

_PART_CASTERS = {
    "tinyint": int,
    "smallint": int,
    "int": int,
    "bigint": int,
    "float": float,
    "double": float,
    "boolean": lambda raw: raw.lower() in ("true", "t", "1"),
    "string": str,
    "date": lambda raw: datetime.date.fromisoformat(raw),
}

# write-side formatters: partition values flow through pandas, where
# nullable ints drift to float64 — format by the SPARK type so keys
# read back exactly (int64 5 -> "5", never "5.0")
_PART_FORMATTERS = {
    "tinyint": lambda v: str(int(v)),
    "smallint": lambda v: str(int(v)),
    "int": lambda v: str(int(v)),
    "bigint": lambda v: str(int(v)),
    "float": lambda v: repr(float(v)),
    "double": lambda v: repr(float(v)),
    "boolean": lambda v: str(bool(v)).lower(),
    "string": str,
    "date": str,
}


def _infer_part_type(raws: list[str]):
    """Infer a Spark type for a Hive partition column from its raw
    directory values (the ``schema=None`` read path). Through r17
    only long-vs-string was tried, so date and boolean partitions
    written by ``write_parquet_s3_py`` read back as strings — a
    silent write/read round-trip asymmetry (r17 second review).
    Now every type the write face formats is recognized: long,
    boolean (the literal true/false Hive spelling), date (ISO),
    double — in that order, string as the fallback. tinyint/smallint
    widths still widen to long (the directory name does not record
    width); pass an explicit schema to pin them. All-NULL columns
    infer string (no evidence — Spark's own convention)."""
    from pyspark.sql import types as T

    def _all(parse) -> bool:
        try:
            for r in raws:
                parse(r)
            return True
        except ValueError:
            return False

    if not raws:
        return T.StringType()
    if _all(int):
        return T.LongType()
    if all(r in ("true", "false") for r in raws):
        return T.BooleanType()
    if _all(datetime.date.fromisoformat):
        return T.DateType()
    if _all(float):
        return T.DoubleType()
    return T.StringType()


def _spark_schema_from_arrow(arrow_schema):
    """pyarrow schema -> Spark StructType WITHOUT the pandas round
    trip (which drifted dtypes: nullable ints -> float64, date32 ->
    object). Tz-less parquet timestamps map to TimestampNTZType —
    value fidelity over session-zone reinterpretation, the same
    NTZ-only stance as avro_py."""
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)


def write_parquet_s3_py(
    df,
    endpoint: str,
    bucket: str,
    prefix: str,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    partition_by: list[str] | None = None,
    part_size: int = 64 * 1024 * 1024,
    aws_limits: bool = True,
) -> int:
    """Distributed parquet write to S3 without the s3a jars: each
    task encodes its partition (or hive sub-group) to parquet bytes
    and issues ONE signed PutObject — the write-side complement of
    ``read_parquet_s3_py``, so the jar-less path round-trips.

    ``partition_by``: Hive-partitioned key layout — within each task,
    rows group by the partition columns and each group uploads to
    ``prefix + col1=v1/col2=v2/part-<task>-<i>.parquet`` (values
    percent-encoded the way Hive writers escape them; the partition
    columns are DROPPED from the file, exactly what
    ``hive_partitioning=True`` reconstructs on read). Object names
    carry the task partition id, so a retried task overwrites its own
    objects instead of duplicating them (PutObject is atomic
    last-writer-wins).

    Returns the number of objects written. One object per task per
    partition-value combination — repartition by the partition
    columns first if many tasks would otherwise each hold a sliver
    of every partition. Objects over ``part_size`` upload via the
    MULTIPART protocol (Create/UploadPart/Complete), so the 5 GB
    single-PutObject cap on real S3 never binds; parts except the
    last must be >= 5 MiB on real S3, which the 64 MB default
    honors."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    cols = [f.name for f in df.schema.fields]
    part_cols = list(partition_by or [])
    missing = [c for c in part_cols if c not in cols]
    if missing:
        raise ValueError(f"partition_by columns {missing} not in {cols}")
    # partition values must survive the key round trip: validate the
    # types against what read_parquet_s3_py can reconstruct, and
    # format by SPARK type (pandas drifts nullable ints to float64 —
    # int64 5 must key as "5", never "5.0")
    part_fmt = {}
    for c in part_cols:
        simple = df.schema[c].dataType.simpleString()
        if simple not in _PART_FORMATTERS:
            raise ValueError(
                f"partition_by column {c!r}: type {simple!r} has no "
                "hive key round trip (supported: "
                f"{sorted(_PART_FORMATTERS)})"
            )
        part_fmt[c] = _PART_FORMATTERS[simple]
    data_cols = [c for c in cols if c not in part_cols]
    # the files carry the EXACT Spark types: pandas drifts nullable
    # ints to float64 en route through Arrow batches, so every group
    # is cast back through the arrow schema derived from the input
    # Spark schema before encoding (the same no-pandas-drift contract
    # as the read side's inference)
    by_name = {f.name: f for f in df.schema.fields}
    data_arrow_schema = to_arrow_schema(
        T.StructType([by_name[c] for c in data_cols])
    )
    ep, ak, sk, rg, bkt = endpoint, access_key, secret_key, region, bucket

    def _upload(batches):
        import io as _io

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        c = S3Client(ep, ak, sk, rg)
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if part_cols:
            groups = list(pdf.groupby(part_cols, dropna=False, sort=True))
        else:
            groups = [((), pdf)]
        n = 0
        for i, (vals, g) in enumerate(groups):
            if not isinstance(vals, tuple):
                vals = (vals,)
            segs = ""
            for col, v in zip(part_cols, vals):
                if pd.isna(v):
                    # Hive's null-partition directory name; the read
                    # face maps it back to NULL. NOTE: float NaN is
                    # indistinguishable from NULL once Arrow hands
                    # pandas a float64 column — both land here (the
                    # usual advice stands: don't partition by floats)
                    raw = HIVE_NULL_PARTITION
                else:
                    formatted = part_fmt[col](v)
                    if formatted == HIVE_NULL_PARTITION:
                        raise ValueError(
                            f"partition value for {col!r} equals the "
                            f"reserved null token {HIVE_NULL_PARTITION!r}"
                            " — it would read back as NULL"
                        )
                    raw = urllib.parse.quote(formatted, safe="")
                segs += f"{col}={raw}/"
            buf = _io.BytesIO()
            pq.write_table(
                pa.Table.from_pandas(
                    g[data_cols],
                    schema=data_arrow_schema,
                    preserve_index=False,
                ),
                buf,
            )
            c.put_object_multipart(
                bkt,
                f"{prefix}{segs}part-{pid:05d}-{i:04d}.parquet",
                buf.getvalue(),
                part_size=part_size,
                aws_limits=aws_limits,
            )
            n += 1
        yield pd.DataFrame({"n_objects": [n]})

    manifest = df.select(*cols).mapInPandas(_upload, "n_objects long")
    return int(
        manifest.agg({"n_objects": "sum"}).collect()[0][0] or 0
    )


def read_parquet_s3_py(
    spark,
    endpoint: str,
    bucket: str,
    prefix: str,
    access_key: str,
    secret_key: str,
    schema=None,
    suffix: str = ".parquet",
    region: str = "us-east-1",
    tasks: int | None = None,
    columns: list[str] | None = None,
    filters=None,
    hive_partitioning: bool = False,
):
    """The reference's S3 listing table (test_with_minio.rs:87-92)
    without the s3a jars: driver-side ListObjectsV2 + extension
    filter, then the matched keys distribute and each task reads its
    objects via pyarrow.

    ``schema``: Spark schema (StructType or DDL) — when None, the
    driver derives it from the FIRST object's parquet FOOTER via
    ranged reads (the metadata tail only, never the object body) and
    converts the pyarrow schema to a Spark schema directly, so the
    inferred and explicit paths cannot drift on dtypes. Pass it
    explicitly in production. ``tasks`` bounds the repartition width
    (defaults to the number of objects, one task per object). The
    listing itself is driver-side metadata, O(objects) strings — the
    same centralization as the reference's ListingTable resolution;
    in a millions-of-objects regime, paginate prefixes into separate
    reads or materialize the listing into its own DataFrame first.

    ``columns`` / ``filters`` (pyarrow DNF tuples, e.g.
    ``[("id", "<", 500)]``) switch each task from a whole-object GET
    to RANGED reads through ``S3RangedFile``: pyarrow fetches the
    footer, prunes row groups on their min/max statistics against the
    filters, and requests only the surviving byte ranges — the
    object-store row-group pruning the reference pins at
    test_with_minio.rs:88. Filters here are task-side pruning hints
    (exact re-filtering still applies row-level inside pyarrow);
    ``schema`` must then describe the PROJECTED columns.

    ``hive_partitioning``: resolve ``name=value`` directory segments
    under the prefix into PARTITION COLUMNS (the reference's
    partitioned listing-table layout, setup.rs:86-118). Partition
    predicates in ``filters`` (a flat AND list) prune the KEY LIST on
    the driver BEFORE any GetObject — a pruned partition costs zero
    requests — and the remaining filters go to pyarrow for row-group
    pruning inside surviving objects. Partition values are cast to
    the schema's declared types executor-side."""
    from pyspark.sql import types as T

    client = S3Client(endpoint, access_key, secret_key, region)
    objs = [
        (k, sz) for k, sz in client.list_objects(bucket, prefix)
        if k.endswith(suffix)
    ]
    if not objs:
        raise ValueError(
            f"no {suffix!r} objects under s3://{bucket}/{prefix} "
            f"at {endpoint}"
        )

    part_cols: list[str] = []
    data_filters = filters
    if hive_partitioning:
        if filters is not None and filters and isinstance(filters[0], list):
            raise ValueError(
                "hive_partitioning splits partition predicates out of "
                "a flat AND filter list; OR-of-AND (list-of-lists) "
                "filters are not supported with it"
            )
        raw_parts = {k: _hive_partition_values(k, prefix) for k, _ in objs}
        col_sets = {tuple(sorted(p)) for p in raw_parts.values()}
        if len(col_sets) != 1:
            raise ValueError(
                f"inconsistent hive partition layouts under "
                f"s3://{bucket}/{prefix}: {sorted(col_sets)}"
            )
        part_cols = sorted(col_sets.pop())
        part_filters = [
            f for f in (filters or []) if f[0] in part_cols
        ]
        data_filters = [
            f for f in (filters or []) if f[0] not in part_cols
        ] or None
        if part_filters:

            def _holds(k: str, c: str, op: str, v) -> bool:
                try:
                    return _partition_pred_holds(raw_parts[k][c], op, v)
                except ValueError as e:
                    raise ValueError(
                        f"pruning s3://{bucket}/{k}: column {c!r}: {e}"
                    ) from e

            objs = [
                (k, sz)
                for k, sz in objs
                if all(_holds(k, c, op, v) for c, op, v in part_filters)
            ]
            if not objs:
                raise ValueError(
                    "all partitions pruned by "
                    f"{part_filters} under s3://{bucket}/{prefix}"
                )

    data_columns = columns
    if columns is not None and part_cols:
        # an EMPTY list is meaningful here (only partition columns
        # requested — tasks then read just the footer row count), so
        # never collapse it to the no-projection None
        data_columns = [c for c in columns if c not in part_cols]

    if schema is None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        first_key, first_size = objs[0]
        pf = pq.ParquetFile(
            S3RangedFile(client, bucket, first_key, first_size)
        )
        arrow_schema = pf.schema_arrow
        if data_columns is not None:
            arrow_schema = pa.schema(
                [arrow_schema.field(c) for c in data_columns]
            )
        schema = _spark_schema_from_arrow(arrow_schema)
        emit_parts = (
            part_cols
            if columns is None
            else [c for c in part_cols if c in columns]
        )
        for c in emit_parts:
            raws = [
                raw_parts[k][c]
                for k, _ in objs
                if raw_parts[k][c] != HIVE_NULL_PARTITION
            ]
            schema = schema.add(
                T.StructField(c, _infer_part_type(raws), True)
            )
    elif isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    # typed partition values per key, in schema field order; only the
    # partition columns the output schema names are emitted (pruning
    # above still used them all)
    part_map: dict[str, dict] | None = None
    if part_cols:
        by_name = {f.name: f for f in schema.fields}
        emit_parts = [c for c in part_cols if c in by_name]
        casters = {}
        for c in emit_parts:
            simple = by_name[c].dataType.simpleString()
            if simple not in _PART_CASTERS:
                raise ValueError(
                    f"partition column {c!r}: unsupported type {simple!r}"
                )
            casters[c] = _PART_CASTERS[simple]

        def _cast_part(c: str, key: str):
            raw = raw_parts[key][c]
            if raw == HIVE_NULL_PARTITION:
                return None
            try:
                return casters[c](raw)
            except (ValueError, TypeError) as e:
                raise ValueError(
                    f"partition value {raw!r} for column {c!r} (key "
                    f"{key!r}) does not parse as the schema's "
                    f"{by_name[c].dataType.simpleString()}: {e}"
                ) from e

        part_map = {
            k: {c: _cast_part(c, k) for c in emit_parts}
            for k, _ in objs
        }
        if data_columns is None and columns is None:
            data_columns = [
                f.name for f in schema.fields if f.name not in part_cols
            ]

    out_names = [f.name for f in schema.fields]

    key_df = spark.createDataFrame(
        objs, "key string, size long"
    ).repartition(min(tasks or len(objs), len(objs)))

    # plain values close over the executors-side fetch (no client
    # object in the closure: urllib + hashlib re-import per worker)
    ep, ak, sk, rg, bkt = endpoint, access_key, secret_key, region, bucket
    ranged = columns is not None or filters is not None

    def _fetch(batches):
        import io as _io

        import pandas as _pd
        import pyarrow.parquet as pq

        c = S3Client(ep, ak, sk, rg)
        for pdf in batches:
            for key, size in zip(pdf["key"], pdf["size"]):
                if ranged:
                    src = S3RangedFile(c, bkt, key, int(size))
                else:
                    src = _io.BytesIO(c.get_object(bkt, key))
                tbl = pq.read_table(
                    src, columns=data_columns, filters=data_filters
                )
                if part_map is not None and tbl.num_columns == 0:
                    # partition-columns-only projection: arrow drops
                    # the row count on to_pandas of a 0-column table,
                    # so build the frame from num_rows directly (the
                    # RangeIndex keeps the count even when the
                    # projection is empty — a pure count query)
                    out = _pd.DataFrame(
                        index=_pd.RangeIndex(tbl.num_rows)
                    )
                    for col, val in part_map[key].items():
                        out[col] = val
                    yield out[out_names]
                    continue
                out = tbl.to_pandas()
                if part_map is not None:
                    for col, val in part_map[key].items():
                        out[col] = val
                    out = out[out_names]
                yield out

    return key_df.mapInPandas(_fetch, schema)
