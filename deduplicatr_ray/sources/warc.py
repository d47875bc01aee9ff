"""WARC source: Common Crawl's native container format -> pages rows.

The input_hint's pages table (url, warc_ts, html, text, lang) is what a
crawl LOOKS like after ingest; this module is the ingest itself — ISO
28500 WARC/1.0-1.1 record framing (version line, CRLF-terminated named
headers, Content-Length body, CRLF CRLF separator), per-record gzip
members (the Common Crawl layout: a .warc.gz is a concatenation of one
gzip member per record — stdlib ``gzip`` decodes the concatenation),
and the embedded HTTP response split (``application/http;
msgtype=response`` bodies carry status line + headers + payload).

Parallelism grain is ONE FILE PER TASK (``read_binary_files`` ->
``flat-map`` parse), matching how Common Crawl ships data: ~1 GiB
.warc.gz files in 100-file segments, so a 100 TB crawl is ~100k files =
~100k independent parse tasks — no intra-file record splitting needed
at that shape (gzip members make byte-offset splits possible, but the
file grain already saturates any cluster this engine targets; a
follow-on repartition rebalances when files are skewed).

``build_warc`` synthesises valid WARC bytes deterministically so tests
and fixtures need no external data.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """CRLF-separated ``Name: value`` lines -> dict (names lowercased).
    No header folding (obsolete in WARC practice)."""
    out: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {line[:40]!r}")
        out[k.decode("latin-1").strip().lower()] = v.decode(
            "latin-1"
        ).strip()
    return out


def _next_record(buf: bytes, off: int) -> tuple[dict[str, str], bytes, int]:
    """Parse one WARC record at ``off`` -> (headers, body, next offset).
    Raises ``ValueError`` on framing corruption."""
    n = len(buf)
    # tolerate extra record separators / trailing CRLFs
    while off < n and buf[off : off + 2] == _CRLF:
        off += 2
    if off >= n:
        return {}, b"", n  # clean end-of-buffer sentinel (empty headers)
    eol = buf.find(_CRLF, off)
    if eol < 0:
        raise ValueError("truncated WARC version line")
    version = buf[off:eol]
    if not version.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record at offset {off}: {version[:20]!r}")
    hdr_end = buf.find(_CRLF + _CRLF, eol)
    if hdr_end < 0:
        raise ValueError("truncated WARC header block")
    headers = _parse_headers(buf[eol + 2 : hdr_end])
    try:
        clen = int(headers["content-length"])
    except (KeyError, ValueError):
        raise ValueError("WARC record without valid Content-Length") from None
    body_start = hdr_end + 4
    body_end = body_start + clen
    if body_end > n:
        raise ValueError("WARC body overruns file")
    return headers, buf[body_start:body_end], body_end


def iter_warc_records(buf: bytes):
    """Yield (headers_dict, body_bytes) per WARC record in ``buf``
    (uncompressed). Raises ``ValueError`` on framing corruption."""
    off = 0
    while off < len(buf):
        headers, body, off = _next_record(buf, off)
        if headers:
            yield headers, body


def iter_warc_records_tolerant(buf: bytes):
    """Like :func:`iter_warc_records` but SALVAGES past framing
    corruption: on a bad record it resyncs at the next ``CRLF WARC/``
    boundary and keeps going — so one malformed record in a 1 GiB
    Common Crawl file costs one record, not ~150k pages. Yields
    (headers, body, ok) where a single ``ok=False`` marker precedes the
    resync (callers count it)."""
    off = 0
    n = len(buf)
    while off < n:
        try:
            headers, body, off = _next_record(buf, off)
        except ValueError:
            yield {}, b"", False
            nxt = buf.find(_CRLF + b"WARC/", off)
            if nxt < 0:
                return
            off = nxt + 2
            continue
        if headers:
            yield headers, body, True


def split_http_response(body: bytes) -> tuple[int, bytes]:
    """``application/http; msgtype=response`` record body ->
    (status_code, payload bytes after the HTTP header block)."""
    status, payload, _ct = split_http_response_full(body)
    return status, payload


def split_http_response_full(body: bytes) -> tuple[int, bytes, str | None]:
    """Like :func:`split_http_response` but also returns the HTTP
    Content-Type header value (None when absent) — the transport-level
    charset source for ``transcode=True`` ingest. The payload is the
    DECODED entity body: chunked transfer framing is removed and
    gzip/deflate Content-Encoding is decompressed (see
    :func:`decode_http_payload`)."""
    status, payload, headers = split_http_response_headers(body)
    return status, payload, headers.get("content-type")


def split_http_response_headers(
    body: bytes,
) -> tuple[int, bytes, dict[str, str]]:
    """HTTP response message -> (status, decoded payload, headers dict).

    Header parsing is TOLERANT (malformed lines are skipped) — crawled
    servers emit junk header lines, and we only consume content-type /
    transfer-encoding / content-encoding. The returned payload has
    chunked framing removed and gzip/deflate decompressed; on framing
    or stream corruption the raw bytes are kept (crawl posture: a
    mis-encoded page should degrade to garbage TEXT, never kill the
    record — same fallback shape as warcio's ChunkedDataReader)."""
    sep = body.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("HTTP response without header terminator")
    status_line = body[: body.find(_CRLF)]
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"malformed HTTP status line {status_line[:40]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(
            f"malformed HTTP status code {parts[1][:10]!r}"
        ) from None
    headers: dict[str, str] = {}
    for line in body[:sep].split(_CRLF)[1:]:
        k, s, v = line.partition(b":")
        if not s or not k.strip():
            continue  # tolerate junk lines in crawled responses
        name = k.strip().decode("latin-1").lower()
        if name not in headers:  # first value wins (proxy-duplicated)
            headers[name] = v.strip().decode("latin-1", "replace")
    return status, decode_http_payload(headers, body[sep + 4 :]), headers


def _dechunk(raw: bytes) -> bytes:
    """Remove ``Transfer-Encoding: chunked`` framing. Raises
    ``ValueError`` on malformed chunk headers; tolerates a TRUNCATED
    final chunk (keeps the partial data — common in crawl captures cut
    off mid-transfer)."""
    out: list[bytes] = []
    off = 0
    n = len(raw)
    while True:
        eol = raw.find(_CRLF, off)
        if eol < 0:
            if off >= n:
                break  # clean end without last-chunk marker: accept
            raise ValueError("truncated chunk size line")
        size_tok = raw[off:eol].split(b";", 1)[0].strip()  # drop extensions
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"malformed chunk size {size_tok[:16]!r}") from None
        if size == 0:
            break  # last-chunk; trailers (if any) are discarded
        start = eol + 2
        end = start + size
        if end > n:
            out.append(raw[start:n])  # truncated capture: keep partial
            break
        out.append(raw[start:end])
        off = end + 2  # skip chunk-data CRLF
    return b"".join(out)


def _gunzip_tolerant(raw: bytes) -> bytes:
    """Decompress a gzip (wbits=31) or zlib/deflate stream, keeping
    whatever decompressed before a truncation/corruption point. Raises
    ``ValueError`` only when NOTHING decodes."""
    import zlib

    for wbits in (31, -15, 15):  # gzip, raw deflate, zlib
        d = zlib.decompressobj(wbits)
        try:
            out = d.decompress(raw)
        except zlib.error:
            continue
        if out or d.eof:
            return out + (d.flush() if d.eof else b"")
    raise ValueError("undecodable compressed entity body")


def decode_http_payload(headers: dict[str, str], raw: bytes) -> bytes:
    """Entity-body decoding for crawled HTTP responses: de-chunk
    (``Transfer-Encoding: chunked``), then decompress
    (``Content-Encoding: gzip|x-gzip|deflate``). WARC response records
    capture the HTTP message AS RECEIVED, so both layers appear in real
    Common Crawl data; skipping them feeds chunk-size hex lines or gzip
    bytes to the text extractor.

    Failure posture is KEEP RAW: corrupt chunk framing or an
    undecodable stream returns the bytes unchanged (the downstream
    extractor treats them as opaque text), because at crawl scale a
    mis-declared header is routine and must not abort the record. Other
    codings (``br``, ``zstd``) have no stdlib decoder here and pass
    through raw."""
    te = headers.get("transfer-encoding", "").lower()
    if "chunked" in te:
        try:
            raw = _dechunk(raw)
        except ValueError:
            return raw  # warcio-style: first bad chunk header -> raw
    ce = headers.get("content-encoding", "").strip().lower()
    if ce in ("gzip", "x-gzip", "deflate"):
        try:
            raw = _gunzip_tolerant(raw)
        except ValueError:
            pass  # mis-declared encoding: keep raw bytes
    return raw


def _warc_date_us(value: str) -> int:
    """WARC-Date (ISO 8601 ``...Z``) -> microseconds since epoch."""
    dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    return int(dt.timestamp() * 1_000_000)


def _gunzip_members_tolerant(buf: bytes) -> bytes:
    """Inflate a concatenation of gzip members, SKIPPING corrupt members
    by resyncing at the next gzip magic. Linear: fixed-size chunks feed
    each ``decompressobj`` (never the whole remaining tail), and resync
    uses ``bytes.find``. Returns the concatenated good members — in the
    Common Crawl member-per-record layout a skipped member is exactly
    one skipped record, and the record-level parser handles any partial
    boundary damage."""
    return b"".join(
        data for data, _off, _len in _iter_gzip_members(buf, salvage=True)
    )


def _iter_gzip_members(buf: bytes, *, salvage: bool = False):
    """Yield ``(inflated_bytes, offset, compressed_length)`` per gzip
    member — the byte spans a CDX index records and a range request
    fetches. Linear: fixed-size chunks feed each ``decompressobj``
    (never the whole remaining tail). ``salvage=True`` resyncs at the
    next gzip magic past a corrupt member; ``False`` raises
    ``ValueError`` on the first one."""
    import zlib

    pos = 0
    n = len(buf)
    CHUNK = 1 << 20
    while pos < n:
        if buf[pos : pos + 3] != b"\x1f\x8b\x08":
            if not salvage:
                raise ValueError(f"not a gzip member at offset {pos}")
            nxt = buf.find(b"\x1f\x8b\x08", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        d = zlib.decompressobj(31)
        mpos = pos
        member: list[bytes] = []
        try:
            while mpos < n and not d.eof:
                member.append(d.decompress(buf[mpos : mpos + CHUNK]))
                mpos += CHUNK
            if not d.eof:
                raise ValueError("truncated gzip member")
        except (zlib.error, ValueError) as e:
            if not salvage:
                raise ValueError(f"corrupt gzip member: {e}") from None
            nxt = buf.find(b"\x1f\x8b\x08", pos + 3)
            if nxt < 0:
                return
            pos = nxt
            continue
        end = min(mpos, n) - len(d.unused_data)
        yield b"".join(member), pos, end - pos
        pos = end


def warc_bytes_to_pages(
    buf: bytes, *, transcode: bool = False, bad_records: str = "raise"
) -> pa.Table:
    """One WARC/WET file's bytes (gzip members or plain) -> PAGES-shaped
    Arrow table.

    ``WARC-Type: response`` records with an HTTP 200 become html rows
    (``text`` null — extraction is the downstream stage). ``WARC-Type:
    conversion`` records — the Common Crawl WET layout, text/plain
    bodies — become text rows directly (``html`` null; the extractor's
    non-null-text passthrough keeps them byte-identical). ``lang`` is
    ``"und"`` (no language metadata exists at the container level).

    ``bad_records="raise"`` (default) propagates the first corruption as
    ``ValueError`` — right when a retry/alert is wanted. ``"skip"``
    SALVAGES: corrupt gzip members are resynced at the next member
    magic, malformed records at the next ``WARC/`` boundary, and a
    record whose own HTTP/date fields are broken is dropped alone — so
    one bad record costs one record, not the ~150k pages of a 1 GiB
    Common Crawl file."""
    if bad_records not in ("raise", "skip"):
        raise ValueError(f"bad_records must be raise|skip, got {bad_records!r}")
    salvage = bad_records == "skip"
    if buf[:2] == b"\x1f\x8b":
        # GzipFile streams the concatenated members LINEARLY;
        # gzip.decompress() re-slices the whole remaining buffer once
        # per member, which is quadratic in member count — a real CC
        # file has one member per record (~25k-150k), where that costs
        # minutes per file (measured 24 s vs 0.3 s on a 25k-member
        # fixture)
        import zlib

        if salvage:
            buf = _gunzip_members_tolerant(buf)
        else:
            try:
                buf = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
            except (OSError, EOFError, zlib.error) as e:  # member corruption
                raise ValueError(f"corrupt gzip stream: {e}") from e
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    if salvage:
        records = (
            (h, b) for h, b, ok in iter_warc_records_tolerant(buf) if ok
        )
    else:
        records = iter_warc_records(buf)
    for headers, body in records:
        try:
            # compute EVERY row value before ANY append — a ValueError
            # mid-record (HTTP status line, WARC-Date) must not leave
            # the column lists desynced in salvage mode
            wtype = headers.get("warc-type")
            if wtype == "response":
                ctype = headers.get("content-type", "")
                http_ct: str | None = None
                if ctype.startswith("application/http"):
                    status, payload, http_ct = split_http_response_full(body)
                    if status != 200:
                        continue
                else:
                    payload = body  # resource-style record: body IS payload
                if transcode:
                    # charset repair at ingest: HTTP Content-Type is only
                    # available HERE, so this is where the WHATWG sniff gets
                    # its transport hint (functions/charset.py)
                    from ..functions.charset import to_utf8

                    payload, _cs = to_utf8(payload, http_ct)
                row_html, row_text = payload, None
            elif wtype == "conversion":  # WET: body is extracted text
                row_html = None
                row_text = body.decode("utf-8", errors="replace")
            else:
                continue
            row_ts = _warc_date_us(
                headers.get("warc-date", "1970-01-01T00:00:00Z")
            )
        except ValueError:
            if not salvage:
                raise
            continue  # record-local damage: drop just this record
        htmls.append(row_html)
        texts.append(row_text)
        urls.append(headers.get("warc-target-uri", ""))
        ts.append(row_ts)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["und"] * len(urls), pa.string()),
        }
    )


def read_warc(
    paths: str | list[str],
    *,
    task_memory: int = 512 * 2**20,
    on_error: str = "raise",
    transcode: bool = False,
):
    """WARC file(s) -> PAGES-schema ``ray.data.Dataset``.

    ``on_error="raise"`` (default) fails the partition task on a
    corrupt file — right for checkpointed runs where a retry is cheap
    and silence is worse; Arrow's C++ reader inflates the .gz stream
    inline. ``"skip"`` drops unparseable files and keeps the run
    flowing — the 100 TB posture where one bad file must not stall a
    crawl-scale job; the file bytes are read RAW inside the
    parse task (pyarrow filesystem, no compression inference) so gzip
    corruption surfaces in OUR parse (as ``ValueError``, catchable per
    file) instead of killing Arrow's read task. ``"salvage"`` goes one
    grain finer: good records inside a damaged file are KEPT (corrupt
    gzip members resync at the next member magic, malformed records at
    the next ``WARC/`` boundary) — one flipped byte costs one record,
    not a whole ~1 GiB file; only a file that yields nothing parseable
    is dropped.

    ``read_binary_files`` gives one row per file; the parse is a
    stateless map with ONE TASK PER FILE — the Common Crawl parallelism
    grain (see module docstring). Two things guarantee that grain:

    * ``override_num_blocks=len(files)`` — Ray's size heuristic would
      otherwise coalesce gz-small files into a handful of blocks and
      serialize the parse;
    * an explicit ``memory`` reservation on the parse task — a
      .warc.gz inflates ~3x plus the Arrow table, so the reservation is
      honest backpressure on a packed node, AND distinct remote args
      keep the parse from being FUSED with a downstream
      ``map_batches(batch_size=1024)``, which would bundle 1024 file
      rows (at CC scale: a terabyte of payload) into one task —
      measured 3.3x wall on a 32-file fixture before the split.

    ``transcode=True`` rewrites every response payload to clean UTF-8 at
    parse time via the WHATWG charset sniff (``functions/charset.py``) —
    the HTTP Content-Type transport hint only exists here, so ingest is
    the one place the full browser sniff order can run.

    A directory is filtered to WARC-like extensions first (crawl dirs
    carry manifests and checksum files alongside the records). Feed the
    result straight into ``extract_stage``."""
    import os

    import ray.data as rd

    exts = (".warc", ".warc.gz", ".wet", ".wet.gz")
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith(exts)
        )
        if not paths:
            raise ValueError("directory contains no .warc/.wet files")
    if on_error not in ("raise", "skip", "salvage"):
        raise ValueError(f"unknown on_error mode {on_error!r}")
    n_files = len(paths) if isinstance(paths, list) else None
    if on_error in ("skip", "salvage"):
        # read raw bytes inside the task: Arrow's extension-based gzip
        # inference cannot be turned off through read_binary_files
        # (compression=None means "detect"), and a corrupt member would
        # otherwise kill the C++ read task where no per-file handler
        # can run
        path_list = list(paths) if isinstance(paths, list) else [paths]
        items = rd.from_items(
            path_list, override_num_blocks=len(path_list)
        )

        def parse_paths(batch: pa.Table) -> pa.Table:
            from pyarrow import fs as pafs

            tables = []
            for p in batch["item"].to_pylist():
                try:
                    filesystem, fpath = pafs.FileSystem.from_uri(p)
                except pa.ArrowInvalid:
                    filesystem, fpath = pafs.LocalFileSystem(), p
                try:
                    # compression=None: Arrow's 'detect' default would
                    # inflate the .gz inline and a corrupt member would
                    # raise OSError HERE, before our member-resync parse
                    # ever sees the bytes
                    with filesystem.open_input_stream(
                        fpath, compression=None
                    ) as f:
                        raw = f.readall()
                    tables.append(
                        warc_bytes_to_pages(
                            raw,
                            transcode=transcode,
                            bad_records=(
                                "skip" if on_error == "salvage" else "raise"
                            ),
                        )
                    )
                except (ValueError, OSError):
                    continue  # corrupt/unreadable file: drop, keep going
            return (
                pa.concat_tables(tables)
                if tables
                else warc_bytes_to_pages(b"")
            )

        return items.map_batches(
            parse_paths,
            batch_format="pyarrow",
            batch_size=None,
            memory=task_memory,
        )

    files = rd.read_binary_files(
        paths, **({"override_num_blocks": n_files} if n_files else {})
    )

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            warc_bytes_to_pages(
                b.as_py() if hasattr(b, "as_py") else b, transcode=transcode
            )
            for b in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else warc_bytes_to_pages(b"")

    return files.map_batches(
        parse,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        memory=task_memory,
    )


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime pinned to 0)."""
    bio = io.BytesIO()
    with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0) as f:
        f.write(raw)
    return bio.getvalue()


def warc_record_bytes(
    headers: list[tuple[str, str]], body: bytes
) -> bytes:
    """Serialize one WARC/1.0 record (Content-Length appended)."""
    head = b"WARC/1.0" + _CRLF
    for k, v in headers + [("Content-Length", str(len(body)))]:
        head += f"{k}: {v}".encode() + _CRLF
    return head + _CRLF + body + _CRLF + _CRLF


def build_warc(
    records: list[dict],
    *,
    gzip_per_record: bool = True,
    warcinfo: bool = True,
) -> bytes:
    """Deterministic WARC bytes for fixtures/tests. Each record dict:
    ``{"url": str, "date": str ISO-Z, "html": bytes, "status": int}``
    (a response record), or ``{"url": ..., "text": str}`` (a WET-style
    conversion record with a text/plain body).
    ``gzip_per_record=True`` produces the Common Crawl member-per-record
    layout (mtime pinned to 0 so output is byte-deterministic)."""

    def _gz(raw: bytes) -> bytes:
        return _gzip_member(raw) if gzip_per_record else raw

    _record = warc_record_bytes

    out = []
    if warcinfo:
        info = b"software: deduplicatr-ray-fixture\r\n"
        out.append(
            _gz(
                _record(
                    [
                        ("WARC-Type", "warcinfo"),
                        ("WARC-Date", "2020-01-01T00:00:00Z"),
                        ("Content-Type", "application/warc-fields"),
                    ],
                    info,
                )
            )
        )
    for r in records:
        if "revisit_of" in r:  # crawler-side dedup record (WARC 1.1)
            import hashlib as _hl

            digest = r.get(
                "digest", _hl.sha256(r.get("payload", b"")).hexdigest()
            )
            http = (
                b"HTTP/1.1 304 Not Modified" + _CRLF + _CRLF
            )
            out.append(
                _gz(
                    _record(
                        [
                            ("WARC-Type", "revisit"),
                            ("WARC-Target-URI", r["url"]),
                            (
                                "WARC-Date",
                                r.get("date", "2020-01-01T00:00:00Z"),
                            ),
                            ("WARC-Refers-To-Target-URI", r["revisit_of"]),
                            ("WARC-Payload-Digest", f"sha256:{digest}"),
                            (
                                "Content-Type",
                                "application/http; msgtype=response",
                            ),
                        ],
                        http,
                    )
                )
            )
            continue
        if "text" in r:  # WET-style conversion record
            out.append(
                _gz(
                    _record(
                        [
                            ("WARC-Type", "conversion"),
                            ("WARC-Target-URI", r["url"]),
                            (
                                "WARC-Date",
                                r.get("date", "2020-01-01T00:00:00Z"),
                            ),
                            ("Content-Type", "text/plain"),
                        ],
                        r["text"].encode("utf-8"),
                    )
                )
            )
            continue
        status = int(r.get("status", 200))
        entity = r["html"]
        extra = b""
        ce = r.get("content_encoding")  # "gzip" | "deflate" | None
        if ce == "gzip":
            bio = io.BytesIO()
            with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0) as f:
                f.write(entity)
            entity = bio.getvalue()
            extra += b"Content-Encoding: gzip" + _CRLF
        elif ce == "deflate":
            import zlib

            entity = zlib.compress(entity)
            extra += b"Content-Encoding: deflate" + _CRLF
        if r.get("chunked"):
            # split into two chunks to exercise multi-chunk reassembly
            mid = max(1, len(entity) // 2)
            body = b""
            for part in (entity[:mid], entity[mid:]):
                if part:
                    body += f"{len(part):x}".encode() + _CRLF + part + _CRLF
            entity = body + b"0" + _CRLF + _CRLF
            extra += b"Transfer-Encoding: chunked" + _CRLF
        else:
            extra += f"Content-Length: {len(entity)}".encode() + _CRLF
        http = (
            f"HTTP/1.1 {status} OK".encode()
            + _CRLF
            + b"Content-Type: "
            + r.get("http_content_type", "text/html").encode("latin-1")
            + _CRLF
            + extra
            + _CRLF
            + entity
        )
        out.append(
            _gz(
                _record(
                    [
                        ("WARC-Type", "response"),
                        ("WARC-Target-URI", r["url"]),
                        ("WARC-Date", r.get("date", "2020-01-01T00:00:00Z")),
                        (
                            "Content-Type",
                            "application/http; msgtype=response",
                        ),
                    ],
                    http,
                )
            )
        )
    return b"".join(out)


def utc_iso(ts_us: int) -> str:
    """Microseconds since epoch -> WARC-Date string (ISO 8601 Z)."""
    return (
        datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    )


# ---------------------------------------------------------------------------
# CDX indexing (Common Crawl's random-access sidecar) + record fetch
# ---------------------------------------------------------------------------

_CDX_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("record_type", pa.string()),
        ("status", pa.int32()),
        ("mime", pa.string()),
        ("digest_sha256", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)


def warc_cdx_records(buf: bytes, *, bad_records: str = "raise") -> pa.Table:
    """One WARC file's bytes -> CDX-style index rows: per response /
    conversion record (CDX keeps non-200s — redirects and 404s are
    queryable history), the byte span a range request fetches plus a
    content digest.

    * ``offset``/``length`` address the RECORD's gzip member in the
      member-per-record Common Crawl layout (exactly what
      ``fetch_warc_record`` re-reads), or the record's own byte span in
      a plain .warc.
    * ``digest_sha256`` hashes the DECODED entity payload (after
      chunked/Content-Encoding removal) — the dedup-across-crawls key:
      two captures of identical content collide here without any text
      extraction.
    * ``mime`` is the HTTP Content-Type up to its parameters; for
      conversion (WET) records the WARC-level Content-Type.

    ``bad_records="skip"`` applies the same salvage posture as
    :func:`warc_bytes_to_pages`."""
    import hashlib

    if bad_records not in ("raise", "skip"):
        raise ValueError(f"bad_records must be raise|skip, got {bad_records!r}")
    salvage = bad_records == "skip"
    spans: list[tuple[bytes, int, int]]
    if buf[:2] == b"\x1f\x8b":
        spans = list(_iter_gzip_members(buf, salvage=salvage))
    else:
        spans = [(buf, 0, len(buf))]
    cols: dict[str, list] = {k.name: [] for k in _CDX_SCHEMA}
    for data, base_off, base_len in spans:
        gz = base_len != len(buf) or buf[:2] == b"\x1f\x8b"
        off = 0
        n = len(data)
        while off < n:
            start = off
            while start < n and data[start : start + 2] == _CRLF:
                start += 2
            try:
                headers, body, off = _next_record(data, start)
            except ValueError:
                if not salvage:
                    raise
                nxt = data.find(_CRLF + b"WARC/", start)
                if nxt < 0:
                    break
                off = nxt + 2
                continue
            if not headers:
                break
            try:
                wtype = headers.get("warc-type")
                if wtype == "response":
                    ctype = headers.get("content-type", "")
                    status: int | None = None
                    mime: str | None = None
                    if ctype.startswith("application/http"):
                        status, payload, http_headers = (
                            split_http_response_headers(body)
                        )
                        ct = http_headers.get("content-type")
                        if ct:
                            mime = ct.split(";")[0].strip().lower()
                    else:
                        payload = body
                        mime = ctype.split(";")[0].strip().lower() or None
                elif wtype == "conversion":
                    status, payload = None, body
                    mime = (
                        headers.get("content-type", "")
                        .split(";")[0]
                        .strip()
                        .lower()
                        or None
                    )
                elif wtype == "revisit":
                    # a crawler's own dedup record: no payload stored,
                    # the digest names the earlier capture (WARC 1.1
                    # §6.7.2) — indexed so digest joins see EVERY
                    # capture of the content, stored or not
                    _algo, _, hexd = headers.get(
                        "warc-payload-digest", ""
                    ).rpartition(":")
                    if not hexd:
                        raise ValueError("revisit record without digest")
                    digest_hex = hexd.lower()
                    status, mime = None, None
                    if body[:5] == b"HTTP/":
                        try:
                            status, _p, _h = split_http_response_headers(
                                body
                            )
                        except ValueError:
                            pass
                else:
                    continue  # warcinfo/request/metadata: not indexed
                if wtype != "revisit":
                    digest_hex = hashlib.sha256(payload).hexdigest()
                row_ts = _warc_date_us(
                    headers.get("warc-date", "1970-01-01T00:00:00Z")
                )
            except ValueError:
                if not salvage:
                    raise
                continue
            cols["url"].append(headers.get("warc-target-uri", ""))
            cols["warc_ts"].append(row_ts)
            cols["record_type"].append(wtype)
            cols["status"].append(status)
            cols["mime"].append(mime)
            cols["digest_sha256"].append(digest_hex)
            # gz: the member span (what a range request must fetch to
            # inflate); plain: the record's own span
            cols["offset"].append(base_off if gz else base_off + start)
            cols["length"].append(base_len if gz else off - start)
    return pa.table(cols, schema=_CDX_SCHEMA)


def warc_cdx_index(
    paths: str | list[str],
    *,
    task_memory: int = 512 * 2**20,
    on_error: str = "raise",
):
    """WARC file(s) -> CDX index ``Dataset`` (``_CDX_SCHEMA`` +
    ``filename``): the sidecar that makes a 100 TB crawl randomly
    accessible — dedup-by-digest across crawls, url lookups, and
    single-record fetches (``fetch_warc_record``) without re-parsing
    whole files. One task per file, raw-byte reads (same grain and
    fusion-blocking ``memory`` reservation as :func:`read_warc`);
    ``on_error``: raise | skip (drop corrupt files) | salvage (keep
    good records)."""
    import os

    import ray.data as rd

    exts = (".warc", ".warc.gz", ".wet", ".wet.gz")
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith(exts)
        )
        if not paths:
            raise ValueError("directory contains no .warc/.wet files")
    if on_error not in ("raise", "skip", "salvage"):
        raise ValueError(f"unknown on_error mode {on_error!r}")
    path_list = [paths] if isinstance(paths, str) else list(paths)
    items = rd.from_items(path_list, override_num_blocks=len(path_list))

    def index_paths(batch: pa.Table) -> pa.Table:
        from pyarrow import fs as pafs

        tables = []
        for p in batch["item"].to_pylist():
            try:
                filesystem, fpath = pafs.FileSystem.from_uri(p)
            except pa.ArrowInvalid:
                filesystem, fpath = pafs.LocalFileSystem(), p
            try:
                with filesystem.open_input_stream(
                    fpath, compression=None
                ) as f:
                    raw = f.readall()
                t = warc_cdx_records(
                    raw,
                    bad_records="skip" if on_error == "salvage" else "raise",
                )
            except (ValueError, OSError):
                if on_error == "raise":
                    raise
                continue
            tables.append(
                t.append_column(
                    "filename",
                    pa.array([os.path.basename(p)] * len(t), pa.string()),
                )
            )
        if tables:
            return pa.concat_tables(tables)
        empty = warc_cdx_records(b"")
        return empty.append_column(
            "filename", pa.array([], pa.string())
        )

    return items.map_batches(
        index_paths,
        batch_format="pyarrow",
        batch_size=None,
        memory=task_memory,
    )


def fetch_warc_record(
    path: str, offset: int, length: int, *, transcode: bool = False
) -> pa.Table:
    """Random access: read ONE record's byte span (a CDX row's
    ``offset``/``length``) and parse just that — the consumer side of
    ``warc_cdx_index``, reading ``length`` bytes instead of the ~1 GiB
    file. Returns a PAGES-shaped table (usually one row)."""
    from pyarrow import fs as pafs

    try:
        filesystem, fpath = pafs.FileSystem.from_uri(path)
    except pa.ArrowInvalid:
        filesystem, fpath = pafs.LocalFileSystem(), path
    with filesystem.open_input_file(fpath) as f:
        raw = f.read_at(length, offset)
    return warc_bytes_to_pages(raw, transcode=transcode)


def cdx_dedup_against(new_index, old_index, **kwargs):
    """Cross-crawl dedup WITHOUT touching page content: mark each row of
    a new crawl's CDX index whose entity digest already appears in a
    prior crawl's index (``dup_of_prior`` bool — the verdict column is
    the deliverable: dup rows become revisit records / skip-fetch lists,
    new rows get stored). Digests cover revisit records too, so a
    capture deduped BY THE CRAWLER still counts as prior content.

    Exchange shape = ``stages.relational.mark_membership``: the old
    side reduces to distinct digests (at CC scale ~64 GB per billion
    distinct pages — broadcast below the key budget, hash left-outer
    join past it); the new index streams row-local either way."""
    from ..stages.relational import mark_membership

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"digest_prior": b["digest_sha256"]})

    old = old_index.map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True
    )
    return mark_membership(
        new_index,
        old,
        on="digest_sha256",
        right_on="digest_prior",
        flag="dup_of_prior",
        **kwargs,
    )


def compact_warc(
    paths: str | list[str],
    old_index,
    out_dir: str,
    *,
    task_memory: int = 512 * 2**20,
    bad_records: str = "raise",
    broadcast_budget: int | None = None,
):
    """Storage-level crawl dedup (the Heritrix revisit pattern): rewrite
    each WARC file under ``out_dir``, KEEPING records whose entity
    digest is new and REPLACING responses whose content a prior crawl
    already stores with a WARC 1.1 revisit record (same url/date, the
    digest named in ``WARC-Payload-Digest``) — a ~200-byte stub instead
    of the page. CDX over the compacted file still lists every capture
    with its true digest, so lookups and cross-crawl joins are
    unaffected; only the bytes are gone.

    Kept records are copied BYTE-VERBATIM (the original gzip member in
    the member-per-record layout), so compaction never re-encodes
    stored content. Already-revisit/warcinfo/other records pass through
    verbatim too.

    The prior-crawl digest set is broadcast once via ``ray.put`` —
    compaction is a per-record membership probe, so it requires the
    distinct-digest set under the broadcast budget (env
    ``GRAFT_JOIN_BCAST_MAX``, default 5M ≈ one 40 MB string array per
    64-hex digests... measured ~450 MB at 5M python-free numpy
    unicode). Past that, shard the OLD INDEX by digest prefix and run
    one compact_warc per shard — the verdict is per-record independent,
    so sharding is exact. Raises ``ValueError`` when over budget.

    Output: one ``<name>`` file per input under ``out_dir`` (same
    basename; written atomically via rename so a re-run skips finished
    files — resume at the file grain) plus a manifest ``Dataset`` row
    per file: (filename, n_records, n_stored, n_revisit, bytes_in,
    bytes_out)."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    exts = (".warc", ".warc.gz", ".wet", ".wet.gz")
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith(exts)
        )
        if not paths:
            raise ValueError("directory contains no .warc/.wet files")
    if bad_records not in ("raise", "skip"):
        raise ValueError(f"bad_records must be raise|skip, got {bad_records!r}")
    budget = broadcast_budget
    if budget is None:
        budget = int(os.environ.get("GRAFT_JOIN_BCAST_MAX", 5_000_000))
    from ..stages.relational import pull_columns

    digests_ds = old_index.map_batches(
        lambda b: b.select(["digest_sha256"])
        .group_by("digest_sha256")
        .aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n_digests = digests_ds.count()
    if n_digests > budget:
        raise ValueError(
            f"prior-crawl digest set ({n_digests}) exceeds the broadcast "
            f"budget ({budget}); shard the old index by digest prefix and "
            "compact per shard"
        )
    (raw_keys,) = pull_columns(digests_ds, ["digest_sha256"], drop_null=True)
    ref = ray.put(np.unique(raw_keys))
    os.makedirs(out_dir, exist_ok=True)
    path_list = [paths] if isinstance(paths, str) else list(paths)
    items = rd.from_items(path_list, override_num_blocks=len(path_list))
    salvage = bad_records == "skip"

    def compact_one(p: str, keys: np.ndarray) -> dict:
        from pyarrow import fs as pafs

        try:
            filesystem, fpath = pafs.FileSystem.from_uri(p)
        except pa.ArrowInvalid:
            filesystem, fpath = pafs.LocalFileSystem(), p
        with filesystem.open_input_stream(fpath, compression=None) as f:
            buf = f.readall()
        out_path = os.path.join(out_dir, os.path.basename(p))
        gz = buf[:2] == b"\x1f\x8b"
        if gz:
            spans = list(_iter_gzip_members(buf, salvage=salvage))
        else:
            spans = [(buf, 0, len(buf))]
        out = bytearray()
        n_records = n_stored = n_revisit = 0
        for data, base_off, base_len in spans:
            # collect the member's records first: a kept SINGLE-record
            # member is copied byte-verbatim (the CC layout), while a
            # multi-record member re-emits each record from its exact
            # uncompressed byte slice (one new member per record)
            recs: list[tuple[bytes, dict[str, str], bytes]] = []
            off = 0
            n = len(data)
            while off < n:
                start = off
                while start < n and data[start : start + 2] == _CRLF:
                    start += 2
                if start >= n:
                    break
                try:
                    headers, body, off = _next_record(data, start)
                except ValueError:
                    if not salvage:
                        raise
                    nxt = data.find(_CRLF + b"WARC/", start)
                    if nxt < 0:
                        break
                    off = nxt + 2
                    continue
                if not headers:
                    break
                recs.append((data[start:off], headers, body))
            for slice_bytes, headers, body in recs:
                n_records += 1
                dup = False
                if headers.get("warc-type") == "response":
                    try:
                        ctype = headers.get("content-type", "")
                        if ctype.startswith("application/http"):
                            _s, payload, _h = split_http_response_headers(
                                body
                            )
                        else:
                            payload = body
                        import hashlib

                        d = hashlib.sha256(payload).hexdigest()
                        i = int(np.searchsorted(keys, d))
                        dup = i < len(keys) and keys[i] == d
                    except ValueError:
                        if not salvage:
                            raise
                        dup = False  # unparseable response: keep bytes
                if dup:
                    stub = warc_record_bytes(
                        [
                            ("WARC-Type", "revisit"),
                            (
                                "WARC-Target-URI",
                                headers.get("warc-target-uri", ""),
                            ),
                            (
                                "WARC-Date",
                                headers.get(
                                    "warc-date", "1970-01-01T00:00:00Z"
                                ),
                            ),
                            ("WARC-Payload-Digest", f"sha256:{d}"),
                            (
                                "Content-Type",
                                "application/http; msgtype=response",
                            ),
                        ],
                        b"HTTP/1.1 304 Not Modified" + _CRLF + _CRLF,
                    )
                    out += _gzip_member(stub) if gz else stub
                    n_revisit += 1
                else:
                    if gz and len(recs) == 1:
                        out += buf[base_off : base_off + base_len]
                    elif gz:
                        out += _gzip_member(slice_bytes + _CRLF + _CRLF)
                    else:
                        # the slice ends at body_end; restore the spec's
                        # record separator
                        out += slice_bytes + _CRLF + _CRLF
                    n_stored += 1
        tmp = f"{out_path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(out))
        os.replace(tmp, out_path)
        return {
            "filename": os.path.basename(p),
            "n_records": n_records,
            "n_stored": n_stored,
            "n_revisit": n_revisit,
            "bytes_in": len(buf),
            "bytes_out": len(out),
        }

    def compact_paths(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        rows = []
        for p in batch["item"].to_pylist():
            out_path = os.path.join(out_dir, os.path.basename(p))
            if os.path.exists(out_path):
                continue  # resume: finished file, skip
            rows.append(compact_one(p, keys))
        cols = [
            "filename", "n_records", "n_stored", "n_revisit",
            "bytes_in", "bytes_out",
        ]
        if not rows:
            return pa.table(
                {
                    "filename": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in cols
                        if c != "filename"
                    },
                }
            )
        return pa.table({c: [r[c] for r in rows] for c in cols})

    return items.map_batches(
        compact_paths,
        batch_format="pyarrow",
        batch_size=None,
        memory=task_memory,
    )


def write_wet(
    pages,
    out_dir: str,
    *,
    software: str = "deduplicatr-ray",
    gzip_per_record: bool = True,
):
    """PAGES/docs Dataset (rows with ``url``, ``text``; extracted) ->
    Common Crawl WET layout under ``out_dir``: one ``part-NNNNN.wet.gz``
    per input block, each a warcinfo record + one ``conversion``
    (text/plain) record per row. The write side of the WET support in
    :func:`warc_bytes_to_pages` — a text release another CC consumer
    (or this engine) can re-ingest byte-identically.

    Shape: one file per block via ``map_batches(batch_size=None)`` with
    a monotonically assigned part index — no driver materialization,
    files appear as blocks finish; atomic rename per file so re-runs
    never expose partial output. ``warc_ts`` (when present) becomes each
    record's WARC-Date. Returns a manifest Dataset (filename, n_records,
    n_bytes)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = "wet.gz" if gzip_per_record else "wet"

    class _Writer:
        def __init__(self):
            self._ctr = 0

        def __call__(self, batch: pa.Table) -> pa.Table:
            import uuid

            recs = []
            has_ts = "warc_ts" in batch.column_names
            ts = batch["warc_ts"].to_pylist() if has_ts else None
            for i, (u, t) in enumerate(
                zip(batch["url"].to_pylist(), batch["text"].to_pylist())
            ):
                if t is None:
                    continue
                r = {"url": u or "", "text": t}
                if ts is not None and ts[i] is not None:
                    r["date"] = utc_iso(
                        int(ts[i].timestamp() * 1_000_000)
                        if hasattr(ts[i], "timestamp")
                        else int(ts[i])
                    )
                recs.append(r)
            buf = build_warc(
                recs, gzip_per_record=gzip_per_record, warcinfo=True
            )
            # block-unique name: writer actors are fused per-task, so a
            # uuid component keeps parallel tasks collision-free while
            # the counter keeps one writer's output ordered
            name = f"part-{uuid.uuid4().hex[:12]}-{self._ctr:05d}.{ext}"
            self._ctr += 1
            tmp = os.path.join(out_dir, f".{name}.tmp")
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, os.path.join(out_dir, name))
            return pa.table(
                {
                    "filename": pa.array([name], pa.string()),
                    "n_records": pa.array([len(recs)], pa.int64()),
                    "n_bytes": pa.array([len(buf)], pa.int64()),
                }
            )

    return pages.map_batches(
        _Writer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        concurrency=(1, 8),
    )


def write_cdxj(index, out_dir: str, *, gzip_shards: bool = True):
    """CDX index Dataset -> SURT-sorted CDXJ shards under ``out_dir``
    (the publishable form of the sidecar: ``<surt> <14-digit ts>
    {json}`` lines, gzipped) plus a ``cluster.idx``-style manifest
    Dataset (filename, n_records, first_key, last_key).

    Shape: one distributed ``sort("surt")`` (Ray's range partitioning
    makes blocks DISJOINT key ranges), then one file per block with the
    block's key range recorded in the manifest — global order lives in
    the manifest like Common Crawl's cluster.idx, so shard filenames
    never need a global counter and no driver materialization
    happens."""
    import json as _json
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = "cdxj.gz" if gzip_shards else "cdxj"

    from ..functions.urls import surt_of

    def add_surt(b: pa.Table) -> pa.Table:
        return b.append_column("surt", surt_of(b["url"]))

    keyed = index.map_batches(
        add_surt, batch_format="pyarrow", zero_copy_batch=True
    ).sort("surt")

    def write_shard(b: pa.Table) -> pa.Table:
        import uuid

        if len(b) == 0:
            return pa.table(
                {
                    "filename": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "first_key": pa.array([], pa.string()),
                    "last_key": pa.array([], pa.string()),
                }
            )
        lines = []
        cols = b.to_pydict()
        for i in range(len(b)):
            ts_us = cols["warc_ts"][i]
            ts14 = (
                ts_us.strftime("%Y%m%d%H%M%S")
                if hasattr(ts_us, "strftime")
                else "19700101000000"
            )
            rec = {
                "url": cols["url"][i],
                "digest": cols["digest_sha256"][i],
                "mime": cols["mime"][i],
                "status": cols["status"][i],
                "offset": cols["offset"][i],
                "length": cols["length"][i],
            }
            if "filename" in cols:
                rec["filename"] = cols["filename"][i]
            lines.append(
                f"{cols['surt'][i]} {ts14} "
                + _json.dumps(rec, sort_keys=True)
            )
        payload = ("\n".join(lines) + "\n").encode()
        if gzip_shards:
            payload = _gzip_member(payload)
        name = f"cdx-{uuid.uuid4().hex[:12]}.{ext}"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "filename": pa.array([name], pa.string()),
                "n_records": pa.array([len(b)], pa.int64()),
                "first_key": pa.array([cols["surt"][0]], pa.string()),
                "last_key": pa.array([cols["surt"][-1]], pa.string()),
            }
        )

    return keyed.map_batches(
        write_shard,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


_TITLE_RE = None  # compiled lazily (module import stays regex-free)


def _page_title(html: bytes) -> str | None:
    global _TITLE_RE
    if _TITLE_RE is None:
        import re

        _TITLE_RE = re.compile(
            rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL
        )
    m = _TITLE_RE.search(html or b"")
    if not m:
        return None
    t = m.group(1).decode("utf-8", "replace").strip()
    return " ".join(t.split()) or None


def write_wat(
    paths: str | list[str],
    out_dir: str,
    *,
    task_memory: int = 512 * 2**20,
    bad_records: str = "raise",
):
    """WARC file(s) -> Common-Crawl-style WAT sidecars under
    ``out_dir``: per response record one ``metadata`` record
    (``application/json`` body) carrying what crawl analytics read
    WITHOUT the payload — url, date, status, mime, entity digest +
    length, selected HTTP headers, outlinks (resolved absolute urls via
    ``stages/linkgraph.links_from_html``) and the page title. One task
    per input file, output ``<name>.wat.gz`` mirrors the input basename
    (atomic rename = file-grain resume, like ``compact_warc``).
    Returns a manifest Dataset (filename, n_records, n_links,
    bytes_out). ``bad_records="skip"`` applies the salvage posture."""
    import hashlib
    import json as _json
    import os

    import ray.data as rd

    exts = (".warc", ".warc.gz")
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith(exts)
        )
        if not paths:
            raise ValueError("directory contains no .warc files")
    if bad_records not in ("raise", "skip"):
        raise ValueError(f"bad_records must be raise|skip, got {bad_records!r}")
    salvage = bad_records == "skip"
    os.makedirs(out_dir, exist_ok=True)
    path_list = [paths] if isinstance(paths, str) else list(paths)
    items = rd.from_items(path_list, override_num_blocks=len(path_list))

    def wat_one(p: str) -> dict:
        from pyarrow import fs as pafs

        from ..stages.linkgraph import links_from_html

        try:
            filesystem, fpath = pafs.FileSystem.from_uri(p)
        except pa.ArrowInvalid:
            filesystem, fpath = pafs.LocalFileSystem(), p
        with filesystem.open_input_stream(fpath, compression=None) as f:
            buf = f.readall()
        if buf[:2] == b"\x1f\x8b":
            buf = (
                _gunzip_members_tolerant(buf)
                if salvage
                else gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
            )
        records = (
            ((h, b) for h, b, ok in iter_warc_records_tolerant(buf) if ok)
            if salvage
            else iter_warc_records(buf)
        )
        out = bytearray()
        n_records = n_links = 0
        for headers, body in records:
            if headers.get("warc-type") != "response":
                continue
            try:
                ctype = headers.get("content-type", "")
                if ctype.startswith("application/http"):
                    status, payload, http_headers = (
                        split_http_response_headers(body)
                    )
                else:
                    status, payload, http_headers = None, body, {}
                url = headers.get("warc-target-uri", "")
                links = links_from_html(url, payload)
                meta = {
                    "url": url,
                    "date": headers.get("warc-date"),
                    "status": status,
                    "mime": (
                        http_headers.get("content-type", "")
                        .split(";")[0]
                        .strip()
                        .lower()
                        or None
                    ),
                    "digest_sha256": hashlib.sha256(payload).hexdigest(),
                    "entity_length": len(payload),
                    "headers": {
                        k: v
                        for k, v in http_headers.items()
                        if k
                        in (
                            "server",
                            "content-type",
                            "content-encoding",
                            "transfer-encoding",
                            "last-modified",
                        )
                    },
                    "links": links,
                    "title": _page_title(payload),
                }
            except ValueError:
                if not salvage:
                    raise
                continue
            n_records += 1
            n_links += len(links)
            stub = warc_record_bytes(
                [
                    ("WARC-Type", "metadata"),
                    ("WARC-Target-URI", url),
                    (
                        "WARC-Date",
                        headers.get("warc-date", "1970-01-01T00:00:00Z"),
                    ),
                    ("Content-Type", "application/json"),
                ],
                _json.dumps(meta, sort_keys=True).encode(),
            )
            out += _gzip_member(stub)
        base = os.path.basename(p)
        for ext in (".warc.gz", ".warc"):
            if base.endswith(ext):
                base = base[: -len(ext)]
                break
        name = f"{base}.wat.gz"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(bytes(out))
        os.replace(tmp, os.path.join(out_dir, name))
        return {
            "filename": name,
            "n_records": n_records,
            "n_links": n_links,
            "bytes_out": len(out),
        }

    def wat_paths(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["item"].to_pylist():
            base = os.path.basename(p)
            for ext in (".warc.gz", ".warc"):
                if base.endswith(ext):
                    base = base[: -len(ext)]
                    break
            if os.path.exists(os.path.join(out_dir, f"{base}.wat.gz")):
                continue  # resume: finished file
            rows.append(wat_one(p))
        cols = ["filename", "n_records", "n_links", "bytes_out"]
        if not rows:
            return pa.table(
                {
                    "filename": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_links": pa.array([], pa.int64()),
                    "bytes_out": pa.array([], pa.int64()),
                }
            )
        return pa.table({c: [r[c] for r in rows] for c in cols})

    return items.map_batches(
        wat_paths,
        batch_format="pyarrow",
        batch_size=None,
        memory=task_memory,
    )


def read_wat(paths: str | list[str], *, task_memory: int = 512 * 2**20):
    """WAT file(s) -> Dataset of parsed metadata rows (url, date,
    status, mime, digest_sha256, entity_length, n_links, links, title).
    The consumer side of :func:`write_wat` — link-graph and digest
    passes run from the ~20x-smaller sidecar without touching page
    payloads."""
    import json as _json
    import os

    import ray.data as rd

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith((".wat", ".wat.gz"))
        )
        if not paths:
            raise ValueError("directory contains no .wat files")
    path_list = [paths] if isinstance(paths, str) else list(paths)
    items = rd.from_items(path_list, override_num_blocks=len(path_list))

    def parse(batch: pa.Table) -> pa.Table:
        from pyarrow import fs as pafs

        cols = {
            "url": [], "date": [], "status": [], "mime": [],
            "digest_sha256": [], "entity_length": [], "n_links": [],
            "links": [], "title": [],
        }
        for p in batch["item"].to_pylist():
            try:
                filesystem, fpath = pafs.FileSystem.from_uri(p)
            except pa.ArrowInvalid:
                filesystem, fpath = pafs.LocalFileSystem(), p
            with filesystem.open_input_stream(fpath, compression=None) as f:
                buf = f.readall()
            if buf[:2] == b"\x1f\x8b":
                buf = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
            for headers, body in iter_warc_records(buf):
                if headers.get("warc-type") != "metadata":
                    continue
                m = _json.loads(body)
                cols["url"].append(m.get("url"))
                cols["date"].append(m.get("date"))
                cols["status"].append(m.get("status"))
                cols["mime"].append(m.get("mime"))
                cols["digest_sha256"].append(m.get("digest_sha256"))
                cols["entity_length"].append(m.get("entity_length"))
                cols["n_links"].append(len(m.get("links") or []))
                cols["links"].append(m.get("links") or [])
                cols["title"].append(m.get("title"))
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "date": pa.array(cols["date"], pa.string()),
                "status": pa.array(cols["status"], pa.int32()),
                "mime": pa.array(cols["mime"], pa.string()),
                "digest_sha256": pa.array(cols["digest_sha256"], pa.string()),
                "entity_length": pa.array(cols["entity_length"], pa.int64()),
                "n_links": pa.array(cols["n_links"], pa.int64()),
                "links": pa.array(cols["links"], pa.list_(pa.string())),
                "title": pa.array(cols["title"], pa.string()),
            }
        )

    return items.map_batches(
        parse, batch_format="pyarrow", batch_size=None, memory=task_memory
    )
